"""Tensor-parallel quantized linears with the FUSED Pallas kernels.

Under GSPMD, `pallas_call` has no partitioning rules, so tensor-parallel
programs previously dequantized with the jnp fallback — XLA materializes
the dequantized bf16 weights (up to 4× the int4 HBM traffic), forfeiting
the quantized format's bandwidth advantage on every chip.  This module
runs the SAME fused kernels per shard under `shard_map`, with the Megatron
placement the param specs already define (parallel/sharding.py):

* ``col`` (q_proj / w_in / lm_head): weight N-sharded over the model
  axis, activations replicated over it → output N-sharded.  No
  communication.  (kv_proj is NOT col — it is replicated, mode "rep".)
* ``row`` (o_proj/w_out): weight K-sharded, activations K-sharded (they
  arrive that way from the preceding col-parallel layer), local fused
  matmul → one ``psum`` over the model axis → replicated output.

The int8 per-N scale commutes with the K-psum (applied per shard before
the sum); the int4 per-group scales are K-local by construction
(group-32-aligned shards, sharding.py).  Forward-only: the serving
engines never differentiate through this path (training keeps the GSPMD
route).  Reference anchor: this is the TPU-native analog of scaling the
reference's single-device Triton kernels (int4/triton_ops.py:26-139)
across chips, which the reference cannot do at all.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .sharding import DATA_AXIS, MODEL_AXIS


def tp_quant_linear(x2, params, quant_type, rt, mode):
    """x2 (M, K) @ dequant(sharded weights) under shard_map.

    ``mode``: "col", "row", or "rep" (replicated weights — e.g. kv_proj,
    whose 512-wide output is cheaper to recompute per chip than to shard;
    the shard_map still matters because a bare Mosaic call cannot be
    partitioned under a mesh at all).  Returns the (M, N_global) result
    with the matching output sharding, or None when the config cannot take
    this path (tp == 1, unsupported quant type, or indivisible dims) — the
    caller falls back to the standard dispatch.
    """
    mesh = rt.mesh
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    tp = sizes.get(MODEL_AXIS, 1)
    if tp == 1 or quant_type not in ("int8", "int4g32"):
        return None
    if quant_type == "int8" and rt.dynamic_int8 and mode == "row":
        # per-shard dynamic activation quantization over a K-slice computes
        # DIFFERENT per-row scales than the single-device kernel (full-K
        # rows) — the psum of partials would be a third numerics mode, and
        # silently declining would only defer to a confusing Mosaic
        # partitioning error on hardware.  Refuse loudly on every platform.
        raise ValueError(
            "dynamic_int8 + tp_pallas is unsupported for row-parallel "
            "linears (per-shard activation scales change the numerics); "
            "use weight-only int8 under tp_pallas, or dynamic_int8 "
            "without tp_pallas.")
    M = x2.shape[0]
    n_data = sizes.get(DATA_AXIS, 1)
    data = DATA_AXIS if (DATA_AXIS in sizes and M % n_data == 0) else None

    w = params["weight"]
    s = params["weight_scale"]
    # divisibility of the sharded dims (storage dims; int4 packed rows)
    if mode == "col":
        if w.shape[1] % tp or (quant_type == "int4g32" and s.shape[1] % tp):
            return None
        w_spec = P(None, MODEL_AXIS)
        s_spec = P(MODEL_AXIS) if quant_type == "int8" else P(None, MODEL_AXIS)
        x_spec = P(data, None)
        out_spec = P(data, MODEL_AXIS)
    elif mode == "row":
        kdiv = 2 * w.shape[0] if quant_type == "int4g32" else w.shape[0]
        if kdiv % tp or (quant_type == "int4g32" and s.shape[0] % tp):
            return None
        # storage K may exceed the activation's logical K (kernel-alignment
        # padding, ops/quant.py int4_storage_k — padding rows sit at the
        # GLOBAL end of K).  Pad x GLOBALLY before sharding: per-shard
        # padding would misalign activation columns against weight rows on
        # every shard but the last (silent corruption).
        if x2.shape[1] < kdiv:
            x2 = jnp.pad(x2, ((0, 0), (0, kdiv - x2.shape[1])))
        elif x2.shape[1] != kdiv:
            return None
        # NOTE: the per-shard K (kdiv/tp) may lose the 256-multiple
        # alignment the global storage had (6B w_out: 13824/4 = 3456) —
        # the grid kernel's masked-final-block path handles it exactly;
        # the cost is longer Mosaic compiles for those shards (mitigated
        # by client-side compile mode / the AOT gate, which compiles them).
        w_spec = P(MODEL_AXIS, None)
        s_spec = P(None) if quant_type == "int8" else P(MODEL_AXIS, None)
        x_spec = P(data, MODEL_AXIS)
        out_spec = P(data, None)
    else:  # rep: replicated weights, computed identically on every chip
        w_spec = P(None, None)
        s_spec = P(None) if quant_type == "int8" else P(None, None)
        x_spec = P(data, None)
        out_spec = P(data, None)

    from jax import shard_map

    from ..ops import pallas_matmul as PM
    from ..ops.linear import _pad_x_to_storage

    def local(x_l, w_l, s_l):
        if quant_type == "int4g32":
            xp = _pad_x_to_storage(x_l, w_l)
            y = PM.int4_matmul_auto(xp, w_l, s_l)
        else:
            xp = x_l
            if w_l.shape[0] > xp.shape[1]:
                xp = jnp.pad(xp, ((0, 0), (0, w_l.shape[0] - xp.shape[1])))
            y = None
            if rt.dynamic_int8:
                # exact here: col/rep shards see the FULL K row, so the
                # per-row activation scales match the single-device kernel
                y = PM.int8_dyn_matmul_pallas(xp, w_l, s_l)
            if y is None:
                y = PM.int8_matmul_pallas(xp, w_l, s_l)
        if mode == "row":
            y = jax.lax.psum(y, MODEL_AXIS)
        return y

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(x_spec, w_spec, s_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    return fn(x2, w, s)
