"""Pure-MXU pass-rate floor at decode M: is batch-1 decode bound by
systolic-array PASSES (m=8 uses 8/128 rows, but a pass over (K, 128·mxus)
costs the same K cycles regardless of m)?

Weights stay VMEM-RESIDENT (constant index map — Pallas fetches a block
once and reuses it across sequential grid steps), so the measured time is
compute only: no HBM DMA in the loop.  Chains R dots per kernel program and
slope-times whole kernels.

Modes:
  bf16_m8 / bf16_m128 / bf16_m256 — bf16 MXU dots at several M
  s8_m8 / s8_m128                 — int8×int8→int32 MXU dots (v5e spec
                                    claims 2× int8 MAC rate; if true, an
                                    integer decode path halves the pass
                                    floor)
  bf16_m8_n512 / bf16_m8_k512     — pass-shape sensitivity

Usage: python benchmarks/mxu_floor.py [mode ...]
"""
import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chatglm_q_tpu.utils.timing import force, slope_time_auto

R = 64  # dots per kernel program (amortizes program launch)

MODES = {
    # name: (m, k, n, dtype)
    "bf16_m8": (8, 2048, 1024, "bf16"),
    "bf16_m32": (32, 2048, 1024, "bf16"),
    "bf16_m128": (128, 2048, 1024, "bf16"),
    "bf16_m256": (256, 2048, 1024, "bf16"),
    "s8_m8": (8, 2048, 1024, "s8"),
    "s8_m128": (128, 2048, 1024, "s8"),
    "bf16_m8_n512": (8, 2048, 512, "bf16"),
    "bf16_m8_k512": (8, 512, 1024, "bf16"),
}


def _kernel(x_ref, w_ref, o_ref, acc_ref, *, dtype):
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if dtype == "s8":
        d = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_ref[...] += d
    else:
        acc_ref[...] += jnp.dot(x_ref[...], w_ref[...],
                                preferred_element_type=jnp.float32)

    @pl.when(r == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def run_mode(name):
    m, k, n, dt = MODES[name]
    if dt == "s8":
        x = jax.random.randint(jax.random.PRNGKey(0), (m, k), -127, 128, jnp.int8)
        w = jax.random.randint(jax.random.PRNGKey(1), (k, n), -127, 128, jnp.int8)
        odt, adt = jnp.int32, jnp.int32
    else:
        x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16) * 0.01
        odt, adt = jnp.bfloat16, jnp.float32

    call = pl.pallas_call(
        functools.partial(_kernel, dtype=dt),
        grid=(R,),
        in_specs=[
            pl.BlockSpec((m, k), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, n), lambda r: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
        scratch_shapes=[pltpu.VMEM((m, n), adt)],
    )

    @jax.jit
    def chain(x, w, reps):
        def outer(_, x):
            y = call(x, w)
            if dt == "s8":
                return jnp.clip(y >> 8, -127, 127).astype(jnp.int8)[:, :k] \
                    if n >= k else jnp.pad(
                        jnp.clip(y >> 8, -127, 127).astype(jnp.int8),
                        ((0, 0), (0, k - n)))
            y = (y * 1e-2).astype(jnp.bfloat16)
            return y[:, :k] if n >= k else jnp.pad(y, ((0, 0), (0, k - n)))

        return jax.lax.fori_loop(0, reps, outer, x).astype(jnp.float32).sum()

    per_call = slope_time_auto(lambda r: force(chain(x, w, r)), 2, 8) / R
    macs = m * k * n
    passes_cycles = k * (n / 128)  # single-MXU output-stationary model
    print(json.dumps({
        "mode": name, "us_per_dot": round(per_call * 1e6, 2),
        "eff_tops": round(macs * 2 / per_call / 1e12, 2),
        "cycles_at_940MHz": int(per_call * 940e6),
        "model_cycles_1mxu": int(passes_cycles),
        "implied_mxus": round(passes_cycles / (per_call * 940e6), 2),
    }), flush=True)


# ---------------------------------------------------------------------------
# Attribution kit: per-stage costs with VMEM-RESIDENT inputs (no DMA), plus
# a direct DMA/compute overlap probe.  BK×BN matches the production decode
# tile; every mode accumulates into acc_ref so nothing is dead-code'd.
# ---------------------------------------------------------------------------

BK, BN, GB = 2048, 1024, 64
M8 = 8


def _attr_kernel(x_ref, p_ref, w_ref, s_ref, o_ref, acc_ref, *, mode):
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    if mode == "dot_resident":
        acc_ref[...] += jnp.dot(x, w_ref[...],
                                preferred_element_type=jnp.float32)
    elif mode == "conv_dot":
        q = pltpu.bitcast(p_ref[...], jnp.int4)
        acc_ref[...] += jnp.dot(x, q.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
    elif mode == "conv_i8_dot":
        # int4 → int8 convert + ONE big s8×s8 MXU dot (the integer path's
        # per-element work; x arrives pre-quantized int8)
        q = pltpu.bitcast(p_ref[...], jnp.int4)
        d = jax.lax.dot_general(x, q.astype(jnp.int8),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        acc_ref[...] += d.astype(jnp.float32)
    elif mode == "scale_dot":
        w = w_ref[...]
        s = s_ref[...].astype(jnp.bfloat16)
        w = (w.reshape(GB, 32, BN) * s[:, None, :]).reshape(BK, BN)
        acc_ref[...] += jnp.dot(x, w, preferred_element_type=jnp.float32)
    elif mode == "grouped_dots":
        w = w_ref[...]
        s = s_ref[...].astype(jnp.float32)
        total = jnp.zeros_like(acc_ref)
        for g in range(GB):
            pg = jnp.dot(x[:, 32 * g:32 * (g + 1)], w[32 * g:32 * (g + 1)],
                         preferred_element_type=jnp.float32)
            total += pg * s[g][None, :]
        acc_ref[...] += total
    elif mode == "grouped_dots_nodequant":
        # the 64 small dots alone (no scale mul): small-dot launch overhead
        w = w_ref[...]
        total = jnp.zeros_like(acc_ref)
        for g in range(GB):
            total += jnp.dot(x[:, 32 * g:32 * (g + 1)],
                             w[32 * g:32 * (g + 1)],
                             preferred_element_type=jnp.float32)
        acc_ref[...] += total
    elif mode == "full_grouped":
        # convert + grouped partial dots + partial scales (the production
        # grouped scheme's compute, weights resident)
        q = pltpu.bitcast(p_ref[...], jnp.int4)
        w = q.astype(jnp.bfloat16)
        s = s_ref[...].astype(jnp.float32)
        total = jnp.zeros_like(acc_ref)
        for g in range(GB):
            pg = jnp.dot(x[:, 32 * g:32 * (g + 1)], w[32 * g:32 * (g + 1)],
                         preferred_element_type=jnp.float32)
            total += pg * s[g][None, :]
        acc_ref[...] += total
    elif mode == "s8_grouped":
        # integer path: per-group s8 partial dots, scales on i32 partials
        q = pltpu.bitcast(p_ref[...], jnp.int4)
        w8 = q.astype(jnp.int8)
        s = s_ref[...].astype(jnp.float32)
        total = jnp.zeros_like(acc_ref)
        for g in range(GB):
            pg = jax.lax.dot_general(
                x[:, 32 * g:32 * (g + 1)], w8[32 * g:32 * (g + 1)],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            total += pg.astype(jnp.float32) * s[g][None, :]
        acc_ref[...] += total
    elif mode == "overlap_probe":
        # w blocks STREAM over the grid (r-indexed DMA) while the compute
        # uses only the resident weights: serial = dma + dot, overlapped =
        # max(dma, dot).  p_ref block changes every step.
        acc_ref[...] += jnp.dot(x, w_ref[...],
                                preferred_element_type=jnp.float32)
        acc_ref[...] += p_ref[:1, :BN].astype(jnp.int32).sum().astype(
            jnp.float32) * 1e-9

    @pl.when(r == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


ATTR_MODES = ("dot_resident", "conv_dot", "conv_i8_dot", "scale_dot",
              "grouped_dots", "grouped_dots_nodequant", "full_grouped",
              "s8_grouped", "overlap_probe")


def run_attr(name, rsteps=64):
    s8 = name in ("conv_i8_dot", "s8_grouped")
    if s8:
        x = jax.random.randint(jax.random.PRNGKey(0), (M8, BK), -127, 128,
                               jnp.int8)
    else:
        x = jax.random.normal(jax.random.PRNGKey(0), (M8, BK), jnp.bfloat16)
    # overlap_probe streams 64 distinct packed blocks; others keep 1 resident
    nblk = rsteps if name == "overlap_probe" else 1
    p = jax.random.bits(jax.random.PRNGKey(1), (nblk * BK // 2, BN), jnp.uint8)
    w = jax.random.normal(jax.random.PRNGKey(2), (BK, BN), jnp.bfloat16) * 0.01
    s = jnp.full((GB, BN), 0.01, jnp.bfloat16)

    call = pl.pallas_call(
        functools.partial(_attr_kernel, mode=name),
        grid=(rsteps,),
        in_specs=[
            pl.BlockSpec((M8, BK), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK // 2, BN),
                         (lambda r: (r, 0)) if name == "overlap_probe"
                         else (lambda r: (0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, BN), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M8, BN), lambda r: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M8, BN), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M8, BN), jnp.float32)],
    )

    @jax.jit
    def chain(x, p, w, s, reps):
        def outer(_, c):
            y = call(c[0], p, w, s)
            if s8:
                nxt = jnp.clip(
                    y.astype(jnp.int32) >> 8, -127, 127).astype(jnp.int8)
            else:
                nxt = (y * 1e-2).astype(jnp.bfloat16)
            return (jnp.pad(nxt, ((0, 0), (0, BK - BN))),)

        return jax.lax.fori_loop(0, reps, outer, (x,))[0].astype(
            jnp.float32).sum()

    per_step = slope_time_auto(
        lambda r: force(chain(x, p, w, s, r)), 2, 8) / rsteps
    print(json.dumps({
        "mode": name, "us_per_block": round(per_step * 1e6, 2),
        "block": f"{BK}x{BN}",
    }), flush=True)


# ---------------------------------------------------------------------------
# 3-D-grid overlap matrix: the SAME grouped compute and the SAME (1, N/bn,
# K/bk) grid as the production kernel, with each factor toggled — resident
# vs streamed weights, dimension_semantics on/off, strided vs contiguous
# source layout.  Distinguishes per-call overhead / stride-slow DMA /
# 3-D-grid serialization.
# ---------------------------------------------------------------------------

K3, N3 = 4096, 4096  # qo_proj decode shape


def _g3_kernel(x_ref, p_ref, s_ref, o_ref, acc_ref, *, compute):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if compute == "grouped":
        q = pltpu.bitcast(p_ref[...], jnp.int4)
        w = q.astype(jnp.bfloat16)
        bk, bn = w.shape
        s = s_ref[...].astype(jnp.float32)
        x = x_ref[...]
        total = jnp.zeros_like(acc_ref)
        for g in range(bk // 32):
            pg = jnp.dot(x[:, 32 * g:32 * (g + 1)], w[32 * g:32 * (g + 1)],
                         preferred_element_type=jnp.float32)
            total += pg * s[g][None, :]
        acc_ref[...] += total
    else:  # dma-only
        acc_ref[...] += p_ref[:1, :].astype(jnp.int32).sum(
            keepdims=True).astype(jnp.float32) * 1e-9

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def run_grid3d(name):
    # name: grid3d_{stream|resident|contig}_{grouped|dma}[_nosem]
    parts = name.split("_")
    src, compute = parts[1], parts[2]
    nosem = name.endswith("_nosem")
    bk, bn = 2048, 1024
    x = jax.random.normal(jax.random.PRNGKey(0), (M8, K3), jnp.bfloat16)
    if src == "contig":
        # pre-tiled (nb, K/2, bn): each block one contiguous span
        p = jax.random.bits(jax.random.PRNGKey(1),
                            (N3 // bn, K3 // 2, bn), jnp.uint8)
        wspec = pl.BlockSpec((1, bk // 2, bn), lambda m, n, k: (n, k, 0),
                             memory_space=pltpu.VMEM)
        s = jnp.full((N3 // bn, K3 // 32, bn), 0.01, jnp.bfloat16)
        sspec = pl.BlockSpec((1, bk // 32, bn), lambda m, n, k: (n, k, 0),
                             memory_space=pltpu.VMEM)
    else:
        p = jax.random.bits(jax.random.PRNGKey(1), (K3 // 2, N3), jnp.uint8)
        idx = (lambda m, n, k: (0, 0)) if src == "resident" \
            else (lambda m, n, k: (k, n))
        wspec = pl.BlockSpec((bk // 2, bn), idx, memory_space=pltpu.VMEM)
        s = jnp.full((K3 // 32, N3), 0.01, jnp.bfloat16)
        sidx = (lambda m, n, k: (0, 0)) if src == "resident" \
            else (lambda m, n, k: (k, n))
        sspec = pl.BlockSpec((bk // 32, bn), sidx, memory_space=pltpu.VMEM)

    def kern(x_ref, p_ref, s_ref, o_ref, acc_ref):
        if src == "contig":
            _g3_kernel(x_ref, p_ref.at[0], s_ref.at[0], o_ref, acc_ref,
                       compute=compute)
        else:
            _g3_kernel(x_ref, p_ref, s_ref, o_ref, acc_ref, compute=compute)

    cp = {} if nosem else {"compiler_params": pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"))}
    call = pl.pallas_call(
        kern,
        grid=(1, N3 // bn, K3 // bk),
        in_specs=[
            pl.BlockSpec((M8, bk), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            wspec, sspec,
        ],
        out_specs=pl.BlockSpec((M8, bn), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M8, N3), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M8, bn), jnp.float32)],
        **cp,
    )

    Lw = 8

    @jax.jit
    def chain(x, ps, ss, reps):
        def outer(_, c):
            def body(cx, wl):
                pi, si = wl
                y = call(cx, pi, si)
                return (y * 1e-2).astype(jnp.bfloat16)[:, :K3], None

            cx, _ = jax.lax.scan(body, c, (ps, ss))
            return cx

        return jax.lax.fori_loop(0, reps, outer, x).astype(jnp.float32).sum()

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 2)
        ps = jax.random.bits(ks[0], (Lw,) + p.shape, jnp.uint8)
        ss = jnp.full((Lw,) + s.shape, 0.01, jnp.bfloat16)
        return ps, ss

    ps, ss = gen(jax.random.PRNGKey(3))
    jax.block_until_ready((ps, ss))
    per_call = slope_time_auto(lambda r: force(chain(x, ps, ss, r)), 2, 8) / Lw
    print(json.dumps({"mode": name,
                      "us_per_call": round(per_call * 1e6, 2)}), flush=True)


GRID3D_MODES = ("grid3d_stream_grouped", "grid3d_stream_grouped_nosem",
                "grid3d_resident_grouped", "grid3d_stream_dma",
                "grid3d_contig_grouped", "grid3d_contig_dma")


if __name__ == "__main__":
    args = sys.argv[1:]
    names = args or (list(MODES) + list(ATTR_MODES))
    for name in names:
        try:
            if name.startswith("grid3d"):
                run_grid3d(name)
            elif name in ATTR_MODES:
                run_attr(name)
            else:
                run_mode(name)
        except Exception as e:
            print(json.dumps({"mode": name, "error": repr(e)[:300]}), flush=True)
