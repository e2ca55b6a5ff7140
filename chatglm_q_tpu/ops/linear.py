"""Quantized/dense linear ops with custom VJP (grad w.r.t. activations only).

Re-creates the role of the reference's ``DynamicQuantizeMatMul`` autograd
functions (int8/qlinear.py:19-75, int4/qlinear.py:36-72): forward is a fused
dequant+matmul (Pallas kernel on TPU, pure-jnp fallback elsewhere), backward
propagates a gradient only to the activation via the transposed dequant+matmul,
and the quantized weights/scales receive no gradient — so a model with frozen
quantized weights can still be tuned through (the reference's
"tune-through-quantized-layers" capability).

The jnp fallback is simultaneously the CPU path and the Pallas test oracle,
mirroring the reference's Triton→torch fallback switch (int8/qlinear.py:6-16).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import TpuRuntimeConfig
from . import quant as Q

_DEFAULT_RT = TpuRuntimeConfig()


class StackedWeight(NamedTuple):
    """A quantized-weight leaf kept STACKED over layers: ``stack`` is the
    full (L, ...) array and ``idx`` the layer to use.

    The serving layer-scan passes these instead of per-layer slices so the
    Pallas kernels can DMA blocks of layer ``idx`` straight from the
    stacked array (pallas_matmul.*_idx).  XLA-slicing the stack per layer
    materializes a full-weight copy as the custom-call operand — measured
    at ~35% of the int4 decode step (docs/RESULTS.md round 4)."""

    stack: jax.Array
    idx: jax.Array  # scalar int32


def _float0_zeros(x):
    return np.zeros(x.shape, jax.dtypes.float0)


def _use_pallas(flags) -> bool:
    return flags[0]


def _dynamic_int8(flags) -> bool:
    return len(flags) > 2 and flags[2]


# int4-dyn dispatch ceiling: the group-32 s8 dots win at M 1-64 (+12-30%
# measured) and lose from M=128 up (spec verify chunks, prefill) — see
# docs/RESULTS.md round 5.  int8-dyn has no such ceiling (full-bk dots).
_INT4_DYN_M_MAX = 64


# ---------------------------------------------------------------------------
# int8: y = x @ (w * scale[None, :])   with w int8 (K, N), scale (N,)
# ---------------------------------------------------------------------------

def _int8_matmul_fallback(x, w, scale):
    wd = w.astype(x.dtype) * scale.astype(x.dtype)
    return x @ wd


def _int8_matmul_t_fallback(g, w, scale):
    wd = w.astype(g.dtype) * scale.astype(g.dtype)
    return g @ wd.T


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def int8_matmul(flags, x, w, scale):
    """x (M, K) float @ dequant(w (Ks, N) int8, scale (N,)) → (M, N).

    Storage Ks may exceed logical K (zero-row kernel-alignment padding);
    activations are zero-padded to match.
    """
    if x.shape[1] < w.shape[0]:
        x = jnp.pad(x, ((0, 0), (0, w.shape[0] - x.shape[1])))
    if _use_pallas(flags):
        from . import pallas_matmul as PM

        if _dynamic_int8(flags):
            out = PM.int8_dyn_matmul_pallas(x, w, scale)
            if out is not None:
                return out
        # int8_matmul_pallas consults the autotune table internally
        return PM.int8_matmul_pallas(x, w, scale)
    return _int8_matmul_fallback(x, w, scale)


def _int8_matmul_fwd(flags, x, w, scale):
    return int8_matmul(flags, x, w, scale), (x, w, scale)


def _int8_matmul_bwd(flags, res, g):
    x, w, scale = res
    if _use_pallas(flags):
        from . import pallas_matmul as PM

        gx = PM.int8_matmul_t_pallas(g, w, scale)
    else:
        gx = _int8_matmul_t_fallback(g, w, scale)
    gx = gx[:, : x.shape[1]]  # strip storage padding
    return gx.astype(x.dtype), _float0_zeros(w), jnp.zeros_like(scale)


int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


# ---------------------------------------------------------------------------
# int4g32: y = x @ unpack(packed (K//2, N), scale (G, N))
# ---------------------------------------------------------------------------

def _int4_matmul_fallback(x, packed, scale):
    wd = Q.unpack_int4_tpu(packed, scale).astype(x.dtype)
    return x @ wd


def _int4_matmul_t_fallback(g, packed, scale):
    wd = Q.unpack_int4_tpu(packed, scale).astype(g.dtype)
    return g @ wd.T


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def int4_matmul(flags, x, packed, scale):
    """x (M, K) float @ dequant(packed (Ks//2, N) uint8 tpu-order, scale (G, N)).

    The storage Ks may exceed the logical K (kernel-alignment padding, see
    ops/quant.py int4_storage_k); activation columns are zero-padded to
    match (padded weight rows dequantize to 0, so the result is exact).
    """
    xp = _pad_x_to_storage(x, packed)
    if _use_pallas(flags):
        from . import pallas_matmul as PM

        if _dynamic_int8(flags) and x.shape[0] <= _INT4_DYN_M_MAX:
            # dynamic activation quantization extends to int4 layers: s8×s8
            # MXU group dots, no float dequant (measured motivation:
            # docs/RESULTS.md round 5, the b≥32 int8-over-int4 crossover).
            # Small-M only: the group-32 dots underuse the MXU as M grows —
            # measured wins at M 1-64 (+12-30%), losses at M=128 (spec
            # verify chunks −8%) and prefill M (7.2k vs 12.1k tok/s).
            out = PM.int4_dyn_matmul_pallas(xp, packed, scale)
            if out is not None:
                return out
        return PM.int4_matmul_auto(xp, packed, scale)
    return _int4_matmul_fallback(xp, packed, scale)


def _pad_x_to_storage(x, packed):
    Ks = packed.shape[0] * 2
    if x.shape[1] < Ks:
        x = jnp.pad(x, ((0, 0), (0, Ks - x.shape[1])))
    return x


def _int4_matmul_fwd(flags, x, packed, scale):
    return int4_matmul(flags, x, packed, scale), (x, packed, scale)


def _int4_matmul_bwd(flags, res, g):
    x, packed, scale = res
    if _use_pallas(flags):
        from . import pallas_matmul as PM

        gx = PM.int4_matmul_t_pallas(g, packed, scale)
    else:
        gx = _int4_matmul_t_fallback(g, packed, scale)
    gx = gx[:, : x.shape[1]]  # strip storage padding
    return gx.astype(x.dtype), _float0_zeros(packed), jnp.zeros_like(scale)


int4_matmul.defvjp(_int4_matmul_fwd, _int4_matmul_bwd)


# ---------------------------------------------------------------------------
# Stacked (layer-indexed) forward dispatch — serving scan only, no VJP
# (serving never differentiates; grads would flow through the sliced
# fallback anyway)
# ---------------------------------------------------------------------------


def _int4_matmul_stacked(flags, x, w: StackedWeight, s: StackedWeight):
    tiled = w.stack.ndim == 4  # (L, N/bn, K/2, bn) serving layout
    Ks = (w.stack.shape[2] if tiled else w.stack.shape[1]) * 2
    if x.shape[1] < Ks:
        x = jnp.pad(x, ((0, 0), (0, Ks - x.shape[1])))
    if _use_pallas(flags):
        from . import pallas_matmul as PM

        if _dynamic_int8(flags) and x.shape[0] <= _INT4_DYN_M_MAX:
            # small-M only — see int4_matmul
            out = PM.int4_dyn_matmul_pallas_idx(x, w.stack, s.stack, w.idx)
            if out is not None:
                return out
        out = PM.int4_matmul_auto_idx(x, w.stack, s.stack, w.idx)
        if out is not None:
            return out
    if tiled:
        p2, s2 = Q.untile_int4_stack_layer(w.stack, s.stack, w.idx)
        return _int4_matmul_fallback(x, p2, s2)
    return _int4_matmul_fallback(x, w.stack[w.idx], s.stack[s.idx])


def _int8_matmul_stacked(flags, x, w: StackedWeight, s: StackedWeight):
    Ks = w.stack.shape[1]
    if x.shape[1] < Ks:
        x = jnp.pad(x, ((0, 0), (0, Ks - x.shape[1])))
    if _use_pallas(flags):
        from . import pallas_matmul as PM

        if _dynamic_int8(flags):
            out = PM.int8_dyn_matmul_pallas_idx(x, w.stack, s.stack, w.idx)
            if out is not None:
                return out
        else:
            out = PM.int8_matmul_pallas_idx(x, w.stack, s.stack, w.idx)
            if out is not None:
                return out
    if _use_pallas(flags):  # odd shapes: slice + non-indexed kernels
        from . import pallas_matmul as PM

        ws, ss = w.stack[w.idx], s.stack[s.idx]
        if _dynamic_int8(flags):
            out = PM.int8_dyn_matmul_pallas(x, ws, ss)
            if out is not None:
                return out
        return PM.int8_matmul_pallas(x, ws, ss)
    return _int8_matmul_fallback(x, w.stack[w.idx], s.stack[s.idx])


# ---------------------------------------------------------------------------
# Unified linear entry point
# ---------------------------------------------------------------------------

def quant_linear(
    x: jax.Array,
    params: dict,
    quant_type: str,
    rt: TpuRuntimeConfig = _DEFAULT_RT,
    tp_mode: str | None = None,
) -> jax.Array:
    """Apply a (possibly quantized) linear layer to ``x (..., K)``.

    ``params`` layouts (see ops/quant.py):
      none:    {"weight": (K, N) float, "bias"?}
      int8:    {"weight": (K, N) int8, "weight_scale": (N,), "bias"?}
      int4g32: {"weight": (K//2, N) uint8 tpu-order, "weight_scale": (G, N), "bias"?}

    Dense weights are cast to the activation dtype at call time, matching the
    reference's master-weight behavior (model.py:76-82).
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    flags = (rt.pallas_enabled(), rt.decode_m_threshold, rt.dynamic_int8)

    if (tp_mode is not None and rt.tp_pallas and rt.mesh is not None
            and rt.pallas_enabled() and quant_type != "none"):
        # tensor-parallel FUSED kernels per shard (parallel/tp_linear.py) —
        # the GSPMD fallback below dequantizes in XLA, which materializes
        # the bf16 weights.  Forward-only (serving); None = config cannot
        # take this path, fall through to the standard dispatch.
        from ..parallel.tp_linear import tp_quant_linear

        y = tp_quant_linear(x2, params, quant_type, rt, tp_mode)
        if y is not None:
            bias = params.get("bias")
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y.reshape(*lead, y.shape[-1])
        # None: config cannot take the TP path — standard dispatch below

    stacked = isinstance(params["weight"], StackedWeight)
    if quant_type == "none":
        y = x2 @ params["weight"].astype(x.dtype)
    elif quant_type == "int8":
        fn = _int8_matmul_stacked if stacked else int8_matmul
        y = fn(flags, x2, params["weight"], params["weight_scale"])
    elif quant_type == "int4g32":
        fn = _int4_matmul_stacked if stacked else int4_matmul
        y = fn(flags, x2, params["weight"], params["weight_scale"])
    else:
        raise NotImplementedError(f"quant_type {quant_type!r}")

    bias = params.get("bias")
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.reshape(*lead, y.shape[-1])


def quant_embedding_lookup(
    params: dict, ids: jax.Array, quant_type: str, dtype=jnp.float32
) -> jax.Array:
    """Embedding lookup across quant types (int4: per-token nibble unpack,
    int4/qlinear.py:122-130)."""
    if quant_type == "none":
        return params["weight"][ids].astype(dtype)
    if quant_type == "int8":
        return Q.embedding_lookup_int8(params, ids, dtype)
    if quant_type == "int4g32":
        return Q.embedding_lookup_int4(params, ids, dtype)
    raise NotImplementedError(f"quant_type {quant_type!r}")
