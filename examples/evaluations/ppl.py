# %%
"""Perplexity evaluation — the EXACT reference protocol
(/root/reference/examples/evaluations/ppl.py:12-45): C-Eval val
`inputs_pretokenized` texts, batch 20, left-padded, labels −100 on pads,
ppl = exp(mean of per-batch mean losses).  Reproducing this protocol is what
makes the BASELINE.md ppl deltas comparable.
"""
import argparse
import math

parser = argparse.ArgumentParser()
parser.add_argument("--model", default="../models/chatglm2-6b-int4g32")
parser.add_argument("--ceval-dir", default=None)
parser.add_argument("--calib-file", default=None)
parser.add_argument("--batch-size", type=int, default=20)
parser.add_argument("--dtype", default=None, help="float32/float16/bfloat16")
args = parser.parse_args()

import jax
import jax.numpy as jnp
from tqdm.auto import tqdm

from chatglm_q_tpu.loader import load_model_and_tokenizer
from chatglm_q_tpu.models import chatglm2 as M
from examples.evaluations.data import load_calibration_texts

config, params, tokenizer = load_model_and_tokenizer(args.model, args.dtype)
mc = config.model_config
from chatglm_q_tpu.config import dtype_from_name
dtype = dtype_from_name(args.dtype) if args.dtype else config.activation_dtype

texts = load_calibration_texts(
    calib_file=args.calib_file, ceval_dir=args.ceval_dir, num_prompts=10**9
)

# %%
fwd = jax.jit(lambda p, ids, mask, labels: M.forward(
    p, mc, ids, attention_mask=mask, labels=labels,
    quant_type=config.quant_type, dtype=dtype)[0])

losses = []
for i in tqdm(range(0, len(texts), args.batch_size)):
    batch = texts[i : i + args.batch_size]
    enc = tokenizer(batch, padding=True, return_tensors="jax", return_labels=True)
    loss = fwd(params, enc["input_ids"], enc["attention_mask"], enc["labels"])
    losses.append(float(loss))

ppl = math.exp(sum(losses) / len(losses))
print(f"ppl: {ppl:.6f}")
