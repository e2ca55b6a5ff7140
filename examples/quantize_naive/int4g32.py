# %%
"""Whole-model naive (RTN) int4g32 quantization.

Re-creates /root/reference/examples/quantize_naive/int4g32.py:10-36 with the
functional driver (quant/rtn.py) instead of a named_modules setattr walk.
"""
import argparse

parser = argparse.ArgumentParser()
parser.add_argument("--source", default="../models/chatglm2-6b-safe")
parser.add_argument("--target", default="../models/chatglm2-6b-int4g32")
args = parser.parse_args()

from chatglm_q_tpu.loader import load_model_and_tokenizer, save_model_and_tokenizer
from chatglm_q_tpu.quant.rtn import rtn_quantize_model

config, params, tokenizer = load_model_and_tokenizer(args.source, "float32")
qparams = rtn_quantize_model(params, config.model_config, "int4g32")

config.quant_type = "int4g32"
config.torch_dtype = "float16"
save_model_and_tokenizer(args.target, config, qparams, tokenizer)
print(f"saved → {args.target}")
