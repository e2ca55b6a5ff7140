# %%
"""C-Eval validation accuracy — the reference protocol
(/root/reference/examples/evaluations/ceval.py:22-64): one forward per
question, argmax over the logits of the four choice tokens "A"/"B"/"C"/"D"
at the last position, with the reference's exact prompt templates:

  direct (default):  "[Round 1]\n\n问：{q}\n\n答：正确的选项是："
  --cot:             two passes — generate thoughts from the think template
                     at temperature 0.5, then score the final template
                     (reference ceval.py:23-26,39-44)

Rows may carry the THUDM evaluation-set fields (`inputs_pretokenized`,
int `label`) or the raw C-Eval fields (`question`/`A`-`D`/`answer`); the
pretokenized text is rebuilt from the raw fields when absent.
"""
import argparse
from collections import defaultdict

parser = argparse.ArgumentParser()
parser.add_argument("--model", default="../models/chatglm2-6b-int4g32")
parser.add_argument("--ceval-dir", required=True)
parser.add_argument("--dtype", default=None)
parser.add_argument("--cot", action="store_true",
                    help="chain-of-thought 2-pass evaluation")
args = parser.parse_args()

import jax
import jax.numpy as jnp
from tqdm.auto import tqdm

from chatglm_q_tpu.loader import load_model_and_tokenizer
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.serving.decoder import GLMDecoder
from examples.evaluations.data import load_ceval_val

config, params, tokenizer = load_model_and_tokenizer(args.model, args.dtype)
mc = config.model_config
dtype = config.activation_dtype

rows = load_ceval_val(args.ceval_dir)
assert rows, f"no C-Eval val rows under {args.ceval_dir}"

choice_ids = [tokenizer[c] for c in ("A", "B", "C", "D")]

# exact reference templates (ceval.py:23-25)
think_template = "[Round 1]\n\n问：{}\n\n答："
final_template = "[Round 1]\n\n问：{}\n\n答：{}\n综上所述，正确的选项是："
direct_template = "[Round 1]\n\n问：{}\n\n答：正确的选项是："


def question_text(row):
    """`inputs_pretokenized` when present (THUDM eval set), else rebuilt."""
    if "inputs_pretokenized" in row:
        return row["inputs_pretokenized"]
    choices = "".join(f"\n{c}. {row[c]}" for c in ("A", "B", "C", "D") if c in row)
    return f"{row.get('question', '')}{choices}\n答案："


def row_label(row):
    if "label" in row:
        return int(row["label"])
    return "ABCD".index(row["answer"]) if row.get("answer") in tuple("ABCD") else -1


fwd = jax.jit(lambda p, ids: M.forward(p, mc, ids, quant_type=config.quant_type,
                                       dtype=dtype)[1])

decoder = None
if args.cot:
    decoder = GLMDecoder(config, params, tokenizer)

per_cat = defaultdict(lambda: [0, 0])
correct = total = 0
for row in tqdm(rows):
    question = question_text(row)
    if args.cot:
        thoughts = ""
        for text in decoder.generate(think_template.format(question),
                                     temperature=0.5):
            thoughts = text
        prompt = final_template.format(question, thoughts)
    else:
        prompt = direct_template.format(question)
    ids = tokenizer.encode(prompt)
    logits = fwd(params, jnp.asarray([ids]))[0, -1]
    pred = int(jnp.argmax(jnp.asarray([logits[c] for c in choice_ids])))
    ok = pred == row_label(row)
    cat = row.get("subject", "unknown")
    per_cat[cat][0] += ok
    per_cat[cat][1] += 1
    correct += ok
    total += 1

print(f"overall: {correct}/{total} = {correct/total:.4f}")
for cat, (c, t) in sorted(per_cat.items()):
    print(f"  {cat}: {c}/{t} = {c/t:.4f}")
