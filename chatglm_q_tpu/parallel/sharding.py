"""GSPMD sharding layout for the ChatGLM2 param tree and KV cache.

The reference is strictly single-device (SURVEY.md §2: no torch.distributed
anywhere); this module is the new first-class TPU component mandated by the
north star (BASELINE.json): tensor-parallel sharding of the *packed
quantized* weights via ``NamedSharding``/``PartitionSpec`` over a
(data, model) mesh, with XLA GSPMD inserting the ICI collectives.

Layout (megatron-style, chosen so every shard boundary respects the packed
int4 representation — nibble pairs and group-32 scales pack along K, so
K-sharding is legal whenever K/tp is a multiple of 32; N-sharding is always
legal):

  q_proj, w_in_h, w_in_gate : N-sharded ("model")   — column parallel
  o_proj, w_out             : K-sharded ("model")   — row parallel (psum)
  kv_proj                   : replicated            — only 2 MQA KV groups
                              (256-wide kv heads; cheaper to compute
                              redundantly than to all-gather)
  lm_head                   : N-sharded over the vocab
  word_embedding, norms     : replicated
  KV cache                  : batch-sharded over "data", replicated over
                              "model" (it is produced by the replicated
                              kv_proj)
  activations               : batch over "data"

The fused-projection split into q|kv and h|gate tensors (models/chatglm2.py)
exists precisely so these specs never slice across a semantic boundary of
the reference's fused weights (model.py:111, :194).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ChatGLM2Config

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_model, (len(devices), n_data, n_model)
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def default_mesh_shape(n_devices: int, config: Optional[ChatGLM2Config] = None,
                       quant_type: str = "none"):
    """Pick (data, model) for n devices: prefer model-parallel up to the
    head count, then data-parallel.  With ``quant_type``, only tp values
    every packed/sharded dim actually divides are returned (int4g32's
    group-32-aligned K shards — the 6B inner dim 13696 caps tp at 4), so
    callers can trust the default without re-checking."""
    config = config or ChatGLM2Config()
    tp = 1
    for cand in (8, 4, 2, 1):
        if (n_devices % cand == 0
                and config.num_attention_heads % cand == 0
                and tp_divisibility_ok(config, cand, quant_type)):
            tp = cand
            break
    return n_devices // tp, tp


def _linear_pspec(shard: Optional[str], stacked: bool, quant_type: str) -> dict:
    """PartitionSpecs for one linear param dict.

    shard: "n" (column parallel), "k" (row parallel), None (replicated).
    Tensors (with optional leading L when stacked):
      none/int8 weight (K, N); int4 weight (K/2, N); int8 scale (N,);
      int4 scale (G, N); bias (N,).
    """
    Lax = (None,) if stacked else ()
    n_spec = P(*Lax, None, MODEL_AXIS)
    k_spec = P(*Lax, MODEL_AXIS, None)
    rep2 = P(*Lax, None, None)
    rep1 = P(*Lax, None)

    if shard == "n":
        w = n_spec
        scale8 = P(*Lax, MODEL_AXIS)
        scale4 = n_spec
        bias = P(*Lax, MODEL_AXIS)
    elif shard == "k":
        w = k_spec
        scale8 = rep1
        scale4 = k_spec  # int4 scale (G, N) shards its G (K-group) dim
        bias = rep1
    else:
        w = rep2
        scale8 = rep1
        scale4 = rep2
        bias = rep1

    d = {"weight": w}
    if quant_type == "int8":
        d["weight_scale"] = scale8
    elif quant_type == "int4g32":
        d["weight_scale"] = scale4
    d["__bias__"] = bias
    return d


def param_pspecs(config: ChatGLM2Config, quant_type: str, params: dict) -> dict:
    """PartitionSpec pytree matching ``params`` (same structure)."""

    def fill(spec: dict, actual: dict) -> dict:
        out = {}
        for k in actual:
            out[k] = spec["__bias__"] if k == "bias" else spec[k]
        return out

    layers = params["layers"]
    specs_layers = {
        "attn_ln": {"weight": P(None, None)},
        "ffn_ln": {"weight": P(None, None)},
        "q_proj": fill(_linear_pspec("n", True, quant_type), layers["q_proj"]),
        "kv_proj": fill(_linear_pspec(None, True, quant_type), layers["kv_proj"]),
        "o_proj": fill(_linear_pspec("k", True, quant_type), layers["o_proj"]),
        "w_in_h": fill(_linear_pspec("n", True, quant_type), layers["w_in_h"]),
        "w_in_gate": fill(_linear_pspec("n", True, quant_type), layers["w_in_gate"]),
        "w_out": fill(_linear_pspec("k", True, quant_type), layers["w_out"]),
    }
    emb_spec = {"weight": P(None, None)}
    if quant_type != "none":
        emb_spec["weight_scale"] = P(None) if quant_type == "int8" else P(None, None)
    return {
        "word_embedding": emb_spec,
        "layers": specs_layers,
        "final_ln": {"weight": P(None)},
        "lm_head": fill(_linear_pspec("n", False, quant_type), params["lm_head"]),
    }


def kv_cache_pspecs(shard_t: bool = False):
    """KVCache (k, v, lengths) specs for the (L, B, G, T, D) layout: batch
    over the data axis; with ``shard_t`` the sequence dim additionally
    shards over the model axis (each chip holds T/tp of the cache — the
    long-context KV-bandwidth fix; see
    ops/pallas_attention.flash_attention_decode_kv_tsharded)."""
    from ..models.chatglm2 import KVCache

    t_ax = MODEL_AXIS if shard_t else None
    return KVCache(
        k=P(None, DATA_AXIS, None, t_ax, None),
        v=P(None, DATA_AXIS, None, t_ax, None),
        lengths=P(DATA_AXIS),
    )


def paged_kv_pspecs(shard_model: bool = False):
    """PagedKVCache specs for the (L, NP, G, P, D) pool: physical pages
    shard over the data axis (each data shard owns NP/n_data pages — pool
    memory scales down with dp), page table and lengths shard their batch
    dim.  Pairs with the per-group page allocator
    (serving/dist_engine.DistributedPagedServingEngine), which keeps every
    row's pages on its owning shard, and with
    ops/pallas_attention.flash_attention_decode_paged_sharded.

    With ``shard_model`` the page dim shards over the flattened
    (data, model) axes — per-chip pool HBM ÷ tp again, logical page j on
    model chip j % tp (the phase-aware allocator's layout), decode via
    flash_attention_decode_paged_msharded."""
    from ..models.paged_kv import PagedKVCache

    pool_ax = (DATA_AXIS, MODEL_AXIS) if shard_model else DATA_AXIS
    return PagedKVCache(
        k_pool=P(None, pool_ax, None, None, None),
        v_pool=P(None, pool_ax, None, None, None),
        page_table=P(DATA_AXIS, None),
        lengths=P(DATA_AXIS),
    )


def shard_params(params: dict, mesh: Mesh, config: ChatGLM2Config, quant_type: str):
    """device_put the tree with its NamedShardings."""
    specs = param_pspecs(config, quant_type, params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def tp_divisibility_ok(config: ChatGLM2Config, tp: int, quant_type: str) -> bool:
    """Check every sharded dim divides by tp (int4: K shards must stay
    nibble-pair and group-32 aligned)."""
    qs, I, V = config.q_size, config.inner_hidden_size, config.vocab_size
    if any(d % tp for d in (qs, I, V, config.num_attention_heads)):
        return False
    if quant_type == "int4g32":
        if (qs // tp) % 32 or (I // tp) % 32:
            return False
    return True
