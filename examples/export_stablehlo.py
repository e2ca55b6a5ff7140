# %%
"""AOT export of the decode step to a portable serialized artifact.

The reference's ONNX export (examples/onnx/export.py) has no TPU meaning;
its *role* — a portable serialized compute graph of the 1-token decode step
with KV-cache inputs/outputs (export.py:37-52) — maps to `jax.export`
(StableHLO).  The exported artifact can be reloaded and invoked without the
Python model code, or compiled by any StableHLO consumer.

The reference's merge_data.py (≤2 GiB external-data packing) is unnecessary:
jax.export serializes weights separately from the graph by design (weights
stay in the checkpoint; the artifact captures only the computation).
"""
import argparse

parser = argparse.ArgumentParser()
parser.add_argument("--model", default=None, help="checkpoint dir; default: tiny random model")
parser.add_argument("--out", default="decode_step.stablehlo")
parser.add_argument("--batch", type=int, default=1)
parser.add_argument("--cache-len", type=int, default=2048)
args = parser.parse_args()

import jax
import jax.numpy as jnp
from jax import export as jexport

from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M

if args.model:
    from chatglm_q_tpu.loader import load_model_and_tokenizer

    cfg, params, _ = load_model_and_tokenizer(args.model, load_tokenizer=False)
    config, quant_type = cfg.model_config, cfg.quant_type
    dtype = cfg.activation_dtype
else:
    config = ChatGLM2Config(
        hidden_size=256, inner_hidden_size=512, head_hidden_size=32,
        num_multi_query_groups=2, num_attention_heads=8, num_layers=2,
        vocab_size=1024, max_sequence_length=256,
    )
    params = M.init_params(jax.random.PRNGKey(0), config, "int4g32", jnp.float32)
    quant_type, dtype = "int4g32", jnp.bfloat16

rt = TpuRuntimeConfig()
cache = M.init_kv_cache(config, args.batch, args.cache_len, dtype)
ids = jnp.zeros((args.batch,), jnp.int32)


# the exported signature uses raw arrays (jax.export cannot serialize
# custom pytree node types like KVCache without extra registration; the
# KV state maps onto the reference's 28×2 named KV inputs/outputs,
# examples/onnx/export.py:37-52)
def decode_fn(params, ids, k, v, lengths):
    logits, new_cache = M.decode_step(
        params, config, ids, M.KVCache(k=k, v=v, lengths=lengths),
        quant_type, dtype, rt,
    )
    return logits, new_cache.k, new_cache.v, new_cache.lengths


exported = jexport.export(jax.jit(decode_fn))(
    params, ids, cache.k, cache.v, cache.lengths
)
data = exported.serialize()
with open(args.out, "wb") as f:
    f.write(data)
print(f"exported decode step → {args.out} ({len(data)/1e6:.1f} MB)")

# %% round-trip check
reloaded = jexport.deserialize(data)
logits, k2, v2, l2 = reloaded.call(params, ids, cache.k, cache.v, cache.lengths)
print("reload OK:", logits.shape, l2)
