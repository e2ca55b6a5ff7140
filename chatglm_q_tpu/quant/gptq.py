"""GPTQ (Hessian-based) weight quantization in JAX.

Re-creates the reference's ``GPTQLinearQuantizer`` numerics
(/root/reference/chatglm_q/int8/quantizer.py:55-164 and
int4/quantizer.py:78-196; original algorithm: Frantar et al.,
arXiv:2210.17323) as pure functions:

* Hessian accumulation with the running-average rescale
  ``H *= n/(n+m); H += (2/(n+m)) XᵀX`` (int8/quantizer.py:85-89) — a jitted
  update, replacing torch forward hooks with functional activation taps.
* Damped Cholesky inverse then upper-Cholesky of H⁻¹
  (int8/quantizer.py:109-113) via ``jax.scipy`` / ``jnp.linalg``.
* Block-128 column sweep with in-block error feedback
  ``W[:, j:] −= err · Hinv[j, j:]`` and the cross-block update
  (int8/quantizer.py:117-142), as a ``lax.fori_loop`` over columns inside a
  host loop over blocks.
* int8: scale fixed up-front from the naive per-channel pass
  (int8/quantizer.py:100); int4g32: a fresh scale computed at every
  group-of-32 boundary *during* the sweep (int4/quantizer.py:155-158).

Weights here are (N out, K in) to mirror the reference's sweep exactly;
converters at the bottom adapt to this package's K-major param dicts.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import quant as Q


# ---------------------------------------------------------------------------
# Hessian accumulation (replaces forward hooks)
# ---------------------------------------------------------------------------

def init_hessian(k: int) -> tuple[jax.Array, jax.Array]:
    return jnp.zeros((k, k), jnp.float32), jnp.zeros((), jnp.float32)


@jax.jit
def accumulate_hessian(hessian, n_samples, x):
    """x: (..., K) activations feeding the linear; returns updated (H, n).

    Matches int8/quantizer.py:74-89 (running average with ``√(2/n)``-scaled
    outer products).
    """
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    m = x2.shape[0]
    new_n = n_samples + m
    hessian = hessian * (n_samples / new_n) + (2.0 / new_n) * (x2.T @ x2)
    return hessian, new_n


# ---------------------------------------------------------------------------
# Shared sweep machinery
# ---------------------------------------------------------------------------

def _prepare_hinv(hessian, weight_nk, percdamp):
    """Dead-column handling, damping, and the upper-Cholesky of H⁻¹
    (int8/quantizer.py:102-113)."""
    K = hessian.shape[0]
    diag = jnp.diag(hessian)
    dead = diag == 0
    hessian = hessian.at[jnp.arange(K), jnp.arange(K)].set(
        jnp.where(dead, 1.0, diag)
    )
    weight_nk = jnp.where(dead[None, :], 0.0, weight_nk)

    damp = percdamp * jnp.mean(jnp.diag(hessian))
    hessian = hessian.at[jnp.arange(K), jnp.arange(K)].add(damp)

    chol = jnp.linalg.cholesky(hessian)
    # torch.cholesky_inverse: H⁻¹ from the lower factor.  The solve runs in
    # COLUMN SLABS under lax.map: a single K×K triangular solve at w_out's
    # K=13696 made XLA materialize ~600 MB dynamic-update-slice temps per
    # step and killed the TPU compile (round-4 r4_gptq_pipeline.err); slab
    # identity columns are built by iota comparison so the K×K identity is
    # never materialized either.
    CH = min(1024, K)
    n_slabs = -(-K // CH)
    rows = jnp.arange(K)

    def slab(j0):
        rhs = (rows[:, None] == (j0 + jnp.arange(CH))[None, :]).astype(
            hessian.dtype)
        return jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)

    slabs = jax.lax.map(slab, jnp.arange(n_slabs) * CH)    # (S, K, CH)
    inv_l = jnp.moveaxis(slabs, 0, 1).reshape(K, n_slabs * CH)[:, :K]
    hinv = inv_l.T @ inv_l
    # torch.linalg.cholesky(H⁻¹, upper=True) returns U = chol(H⁻¹)ᵀ
    # (upper-triangular, H⁻¹ = Uᵀ U) — int8/quantizer.py:113
    upper = jnp.linalg.cholesky(hinv).T
    return hessian, weight_nk, upper


@partial(jax.jit, static_argnames=("blocksize",))
def _sweep_int8(weight_nk, hinv_u, scale_n, blocksize=128):
    """Column sweep with fixed per-row scale (int8/quantizer.py:117-142)."""
    N, K = weight_nk.shape

    def col_body(j, state):
        wblk, qblk, eblk, lblk, hblk = state
        w = jax.lax.dynamic_slice(wblk, (0, j), (N, 1))[:, 0]
        d = hblk[j, j]
        qv = jnp.clip(jnp.round(w / scale_n), -127, 127)
        qd = scale_n * qv
        err = (w - qd) / d
        loss = (w - qd) ** 2 / d**2
        row = jax.lax.dynamic_slice(hblk, (j, 0), (1, hblk.shape[1]))[0]
        mask = jnp.arange(hblk.shape[1]) >= j
        wblk = wblk - jnp.where(mask[None, :], err[:, None] * row[None, :], 0.0)
        qblk = jax.lax.dynamic_update_slice(qblk, qd[:, None], (0, j))
        eblk = jax.lax.dynamic_update_slice(eblk, err[:, None], (0, j))
        lblk = jax.lax.dynamic_update_slice(lblk, loss[:, None], (0, j))
        return wblk, qblk, eblk, lblk, hblk

    weight = weight_nk.astype(jnp.float32)
    grid = jnp.zeros_like(weight)
    losses = jnp.zeros_like(weight)
    for i1 in range(0, K, blocksize):
        i2 = min(i1 + blocksize, K)
        bs = i2 - i1
        wblk = weight[:, i1:i2]
        hblk = hinv_u[i1:i2, i1:i2]
        qblk = jnp.zeros_like(wblk)
        eblk = jnp.zeros_like(wblk)
        lblk = jnp.zeros_like(wblk)
        wblk, qblk, eblk, lblk, _ = jax.lax.fori_loop(
            0, bs, col_body, (wblk, qblk, eblk, lblk, hblk)
        )
        grid = grid.at[:, i1:i2].set(qblk)
        losses = losses.at[:, i1:i2].set(lblk / 2)
        weight = weight.at[:, i2:].add(-(eblk @ hinv_u[i1:i2, i2:]))
    return grid, losses


@partial(jax.jit, static_argnames=("blocksize", "groupsize"))
def _sweep_int4(weight_nk, hinv_u, blocksize=128, groupsize=32):
    """Column sweep with per-group rescale at every group boundary
    (int4/quantizer.py:142-172)."""
    N, K = weight_nk.shape
    assert blocksize % groupsize == 0 and K % groupsize == 0

    def col_body(j, state):
        wblk, qblk, eblk, lblk, scale_cur, scales_blk, hblk = state

        def new_scale(_):
            blk = jax.lax.dynamic_slice(wblk, (0, j), (N, groupsize))
            w_max = jnp.max(jnp.abs(blk), axis=1)
            return jnp.clip(w_max / Q.MAX_Q_INT4, min=1e-10)

        at_boundary = (j % groupsize) == 0
        scale_cur = jax.lax.cond(at_boundary, new_scale, lambda _: scale_cur, None)
        scales_blk = jax.lax.cond(
            at_boundary,
            lambda sb: jax.lax.dynamic_update_slice(
                sb, scale_cur[None, :], (j // groupsize, 0)
            ),
            lambda sb: sb,
            scales_blk,
        )

        w = jax.lax.dynamic_slice(wblk, (0, j), (N, 1))[:, 0]
        d = hblk[j, j]
        qv = jnp.clip(jnp.round(w / scale_cur), -Q.MAX_Q_INT4, Q.MAX_Q_INT4)
        qd = scale_cur * qv
        err = (w - qd) / d
        loss = (w - qd) ** 2 / d**2  # int4/quantizer.py:163
        row = jax.lax.dynamic_slice(hblk, (j, 0), (1, hblk.shape[1]))[0]
        mask = jnp.arange(hblk.shape[1]) >= j
        wblk = wblk - jnp.where(mask[None, :], err[:, None] * row[None, :], 0.0)
        qblk = jax.lax.dynamic_update_slice(qblk, qd[:, None], (0, j))
        eblk = jax.lax.dynamic_update_slice(eblk, err[:, None], (0, j))
        lblk = jax.lax.dynamic_update_slice(lblk, loss[:, None], (0, j))
        return wblk, qblk, eblk, lblk, scale_cur, scales_blk, hblk

    weight = weight_nk.astype(jnp.float32)
    grid = jnp.zeros_like(weight)
    losses = jnp.zeros_like(weight)
    all_scales = []
    for i1 in range(0, K, blocksize):
        i2 = min(i1 + blocksize, K)
        bs = i2 - i1
        wblk = weight[:, i1:i2]
        hblk = hinv_u[i1:i2, i1:i2]
        qblk = jnp.zeros_like(wblk)
        eblk = jnp.zeros_like(wblk)
        lblk = jnp.zeros_like(wblk)
        scales_blk = jnp.zeros((bs // groupsize, N), jnp.float32)
        state = (wblk, qblk, eblk, lblk, jnp.ones((N,), jnp.float32),
                 scales_blk, hblk)
        wblk, qblk, eblk, lblk, _, scales_blk, _ = jax.lax.fori_loop(
            0, bs, col_body, state)
        grid = grid.at[:, i1:i2].set(qblk)
        losses = losses.at[:, i1:i2].set(lblk / 2)
        all_scales.append(scales_blk)
        weight = weight.at[:, i2:].add(-(eblk @ hinv_u[i1:i2, i2:]))
    scales = jnp.concatenate(all_scales, axis=0)  # (K/groupsize, N)
    return grid, scales, losses


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def _check_hinv(hinv_u):
    """Reference guard (int8/quantizer.py:115): a numerically non-PSD
    Hessian makes cholesky return NaN, which would silently quantize the
    layer to garbage — abort with a diagnostic instead (eager call site,
    one scalar fetch)."""
    if bool(jnp.isnan(hinv_u).any()):
        raise FloatingPointError(
            "GPTQ Hessian Cholesky produced NaN (non-PSD after damping) — "
            "raise percdamp or check the calibration activations")


def gptq_quantize_int8(weight_nk, hessian, blocksize=128, percdamp=0.01):
    """Returns (grid_weight (N, K) f32 on the int8 grid, scale (N,), mean
    quant loss) — reference int8/quantizer.py:94-149."""
    _, scale = _naive_scale_int8(weight_nk)
    hessian, weight_nk, hinv_u = _prepare_hinv(hessian, weight_nk, percdamp)
    _check_hinv(hinv_u)
    grid, losses = _sweep_int8(weight_nk, hinv_u, scale, blocksize)
    return grid, scale, float(jnp.mean(losses))


def gptq_quantize_int4(weight_nk, hessian, blocksize=128, groupsize=32, percdamp=0.01):
    """Returns (grid_weight (N, K) f32, scales (K/groupsize, N), mean quant
    loss) — reference int4/quantizer.py:117-181 (losses at :163/:170)."""
    hessian, weight_nk, hinv_u = _prepare_hinv(hessian, weight_nk, percdamp)
    _check_hinv(hinv_u)
    grid, scales, losses = _sweep_int4(weight_nk, hinv_u, blocksize, groupsize)
    return grid, scales, float(jnp.mean(losses))


def debug_mse(debug_input, weight_nk, grid_nk) -> float:
    """The reference's ``debug_loss`` (int8/quantizer.py:144-146): MSE between
    the float layer's output and the grid weight's output on the last
    calibration activations."""
    x = debug_input.reshape(-1, debug_input.shape[-1]).astype(jnp.float32)
    ref = x @ weight_nk.astype(jnp.float32).T
    got = x @ grid_nk.T
    return float(jnp.mean((got - ref) ** 2))


def _naive_scale_int8(weight_nk):
    w = weight_nk.astype(jnp.float32)
    w_max = jnp.max(jnp.abs(w), axis=1)
    scale = jnp.clip(w_max / Q.MAX_Q_INT8, min=1e-10)
    q = jnp.clip(jnp.round(w / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


def gptq_linear_params_int8(w_kn, hessian, bias=None, blocksize=128,
                            percdamp=0.01, debug_input=None):
    """K-major in-memory int8 param dict from GPTQ (reference
    int8/quantizer.py:151-164).  With ``debug_input`` returns
    ``(params, quant_loss, debug_loss)`` — the reference's ``pring_loss``
    diagnostics (int8/quantizer.py:152-156)."""
    grid, scale, quant_loss = gptq_quantize_int8(w_kn.T, hessian, blocksize, percdamp)
    q = jnp.clip(jnp.round(grid / scale[:, None]), -127, 127).astype(jnp.int8)
    p = {"weight": Q.pad_int8_weight(q.T), "weight_scale": scale}
    if bias is not None:
        p["bias"] = bias
    if debug_input is None:
        return p
    return p, quant_loss, debug_mse(debug_input, w_kn.T, grid)


def gptq_linear_params_int4(w_kn, hessian, bias=None, blocksize=128,
                            groupsize=32, percdamp=0.01, debug_input=None):
    """K-major in-memory int4g32 param dict from GPTQ (reference
    int4/quantizer.py:183-196).  With ``debug_input`` returns
    ``(params, quant_loss, debug_loss)`` (int4/quantizer.py:184-188)."""
    grid, scales, quant_loss = gptq_quantize_int4(w_kn.T, hessian, blocksize, groupsize, percdamp)
    # quantize_with_scale on the (K, N) transpose (int4/quantizer.py:193)
    qgrid = Q.quantize_with_scale_int4(grid.T, scales)
    packed, scales_p = Q.pad_packed_int4(Q.pack_int4_tpu(qgrid), scales)
    p = {"weight": packed, "weight_scale": scales_p.astype(Q.SCALE_DTYPE)}
    if bias is not None:
        p["bias"] = bias
    if debug_input is None:
        return p
    return p, quant_loss, debug_mse(debug_input, w_kn.T, grid)
