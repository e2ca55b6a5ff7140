# %%
"""C-Eval validation accuracy — the exact reference protocol
(/root/reference/examples/evaluations/ceval.py:22-77): direct template, one
forward per question, argmax over the logits of the four choice tokens
"A"/"B"/"C"/"D" at the last position; per-category report.
"""
import argparse
from collections import defaultdict

parser = argparse.ArgumentParser()
parser.add_argument("--model", default="../models/chatglm2-6b-int4g32")
parser.add_argument("--ceval-dir", required=True)
parser.add_argument("--dtype", default=None)
args = parser.parse_args()

import jax
import jax.numpy as jnp
from tqdm.auto import tqdm

from chatglm_q_tpu.loader import load_model_and_tokenizer
from chatglm_q_tpu.models import chatglm2 as M
from examples.evaluations.data import load_ceval_val

config, params, tokenizer = load_model_and_tokenizer(args.model, args.dtype)
mc = config.model_config
dtype = config.activation_dtype

rows = load_ceval_val(args.ceval_dir)
assert rows, f"no C-Eval val rows under {args.ceval_dir}"

choice_ids = [tokenizer[c] for c in ("A", "B", "C", "D")]

# direct-answer template (reference ceval.py:22-33)
def build_prompt(row):
    q = row["question"]
    choices = "".join(f"\n{c}. {row[c]}" for c in ("A", "B", "C", "D"))
    return f"{q}{choices}\n答案："

fwd = jax.jit(lambda p, ids: M.forward(p, mc, ids, quant_type=config.quant_type,
                                       dtype=dtype)[1])

per_cat = defaultdict(lambda: [0, 0])
correct = total = 0
for row in tqdm(rows):
    ids = tokenizer.encode(build_prompt(row))
    logits = fwd(params, jnp.asarray([ids]))[0, -1]
    pred = "ABCD"[int(jnp.argmax(jnp.asarray([logits[c] for c in choice_ids])))]
    ok = pred == row.get("answer", "")
    cat = row.get("subject", "unknown")
    per_cat[cat][0] += ok
    per_cat[cat][1] += 1
    correct += ok
    total += 1

print(f"overall: {correct}/{total} = {correct/total:.4f}")
for cat, (c, t) in sorted(per_cat.items()):
    print(f"  {cat}: {c}/{t} = {c/t:.4f}")
