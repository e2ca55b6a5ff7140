"""Whole-model naive (RTN) quantization.

Functional equivalent of the reference's quantize_naive scripts
(/root/reference/examples/quantize_naive/int8.py and int4g32.py:10-36),
which walk ``named_modules`` and setattr-swap each Linear/Embedding: here
the float param tree is mapped to a quantized tree in one pass (stacked
layer tensors are vmapped over the layer axis).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ChatGLM2Config
from ..ops import quant as Q

_LINEAR_KEYS = ("q_proj", "kv_proj", "o_proj", "w_in_h", "w_in_gate", "w_out")


def _quantize_linear(p: dict, quant_type: str, stacked: bool) -> dict:
    fn = (
        Q.quantize_linear_int8 if quant_type == "int8" else Q.quantize_linear_int4
    )
    w = p["weight"]
    if stacked:
        out = jax.vmap(lambda wl: fn(wl))(w.astype(jnp.float32))
    else:
        out = fn(w.astype(jnp.float32))
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def rtn_quantize_model(
    params: dict, config: ChatGLM2Config, quant_type: str
) -> dict:
    """Float param tree (quant_type='none') → quantized tree."""
    assert quant_type in ("int8", "int4g32")
    emb_fn = (
        Q.quantize_embedding_int8
        if quant_type == "int8"
        else Q.quantize_embedding_int4
    )
    layers = dict(params["layers"])
    for k in _LINEAR_KEYS:
        q = _quantize_linear(params["layers"][k], quant_type, stacked=True)
        if k in ("w_in_h", "w_in_gate"):
            # N-pad to match w_out's K storage (zero columns are exact no-ops)
            q = jax.vmap(lambda p: Q.pad_linear_n(p, quant_type))(q)
        layers[k] = q
    return {
        "word_embedding": emb_fn(params["word_embedding"]["weight"].astype(jnp.float32)),
        "layers": layers,
        "final_ln": params["final_ln"],
        "lm_head": Q.lmhead_pad(
            _quantize_linear(params["lm_head"], quant_type, stacked=False),
            quant_type,
        ),
    }
