# %%
"""GPTQ int4g32 quantization of ChatGLM2-6B.

Re-creates /root/reference/examples/quantize_gptq/int4g32.py: calibration =
200 prompts, batch 20, seed 42 (:7-31), layer-pipelined Hessian
accumulation and quantization (:56-86; functional taps instead of hooks),
fp16-activation int4g32 output config (:107-110).

Calibration text: C-Eval val `inputs_pretokenized` when available locally
(the reference's source — needs the dataset on disk; no network here), else
a local text file via --calib-file (one prompt per line).
"""
import argparse
import random

parser = argparse.ArgumentParser()
parser.add_argument("--source", default="../models/chatglm2-6b-safe")
parser.add_argument("--target", default="../models/chatglm2-6b-int4g32")
parser.add_argument("--calib-file", default=None,
                    help="text file with one calibration prompt per line")
parser.add_argument("--ceval-dir", default=None,
                    help="local C-Eval dataset dir (val split jsonl)")
parser.add_argument("--num-prompts", type=int, default=200)
parser.add_argument("--batch-size", type=int, default=20)
args = parser.parse_args()

# %%
from chatglm_q_tpu.loader import load_model_and_tokenizer, save_model_and_tokenizer
from chatglm_q_tpu.quant.calibrate import gptq_quantize_model
from examples.evaluations.data import load_calibration_texts

config, params, tokenizer = load_model_and_tokenizer(args.source, "float32")

texts = load_calibration_texts(
    calib_file=args.calib_file, ceval_dir=args.ceval_dir,
    num_prompts=args.num_prompts, seed=42,
)

# %% batch + tokenize (reference batches 20, left-pad; :26-31)
batches = []
for i in range(0, len(texts), args.batch_size):
    enc = tokenizer(texts[i : i + args.batch_size], padding=True, return_tensors="jax")
    batches.append((enc["input_ids"], enc["attention_mask"]))

# %% layer-pipelined GPTQ
qparams = gptq_quantize_model(
    params, config.model_config, batches, "int4g32", print_loss=True
)

config.quant_type = "int4g32"
config.torch_dtype = "float16"
save_model_and_tokenizer(args.target, config, qparams, tokenizer)
print(f"saved → {args.target}")
