"""Dequant-formulation lab: find the cheapest EXACT int4g32 dequant on the
v5e VPU, measured in the production 3-D streaming grid.

Round-4 attribution (benchmarks/logs/grid3d.out, attr_kit.out): decode
matmuls are COMPUTE-bound with DMA fully overlapped; the int4→bf16 convert
costs ~2.0 us per (2048, 1024) block ≈ 7 VPU ops/element — the nibble
unpack/interleave is the wall, not the MXU (m=8 big dot: 1.42 us) and not
the group-scale math (grouped partials: +0.7 us).

The byte-pair family converts the PACKED BYTE B = 16·uh + ul straight to
bf16 (half the elements, no nibble deinterleave; integers ≤ 255 are exact
in bf16) and recovers both weights algebraically:

    q_even = ul − 8 = C2 − 8            C2 = bf16(B & 0xF)
    q_odd  = uh − 8 = (C1 − C2)/16 − 8  C1 = bf16(B)
    y      = (xe − xo/16) @ C2 + (xo/16) @ C1 − 8·Σx     (then group scales)

x-side combinations (xe' = xe − xo/16, xo' = xo/16, per-group x sums) are
precomputed OUTSIDE the kernel — m×K work, negligible at decode M.

REQUIRES the biased-nibble byte layout (each nibble stores q+8); the lab
generates it directly and oracles against the signed grid.

Usage: python benchmarks/dequant_lab.py [mode ...]
Modes: base_grouped noscale_base noscale_i8 noscale_i32
       bytepair_big bytepair_grouped
"""
import functools
import json
import sys

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chatglm_q_tpu.utils.timing import force, slope_time_auto

M, K, N = 8, 4096, 4096
BK, BN = 2048, 1024
GB = BK // 32          # scale groups per block
BYG = 16               # byte-rows per group


def _kernel(x_ref, p_ref, s_ref, xo_ref, xs_ref, o_ref, acc_ref, *, mode):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if mode.startswith("bytepair"):
        B = p_ref[...].astype(jnp.int32)                 # (BK/2, BN) biased bytes
        # u8→bf16 doesn't legalize on v5e (r3 finding) — widen via i32
        C1 = B.astype(jnp.bfloat16)                      # 16·uh + ul
        C2 = (B & 0xF).astype(jnp.bfloat16)              # ul
        xe = x_ref[...]                                  # xe' = xe − xo/16
        xo = xo_ref[...]                                 # xo' = xo/16
        s = s_ref[...].astype(jnp.float32)               # (GB, BN)
        if mode == "bytepair_big":
            # selscale-style: expand s to byte rows on the MXU, one flat
            # multiply per C matrix, two half-K dots
            rows = jax.lax.broadcasted_iota(jnp.int32, (BK // 2, GB), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (BK // 2, GB), 1)
            sel = (rows // BYG == cols).astype(jnp.bfloat16)
            sexp = jnp.dot(sel, s.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)        # (BK/2, BN)
            d = jnp.dot(xe, C2 * sexp, preferred_element_type=jnp.float32)
            d += jnp.dot(xo, C1 * sexp, preferred_element_type=jnp.float32)
        else:  # bytepair_grouped: scales on per-group partials
            d = jnp.zeros_like(acc_ref)
            for g in range(GB):
                r = slice(BYG * g, BYG * (g + 1))
                pg = jnp.dot(xe[:, r], C2[r], preferred_element_type=jnp.float32)
                pg += jnp.dot(xo[:, r], C1[r], preferred_element_type=jnp.float32)
                d += pg * s[g][None, :]
        # rank-1 bias: −8·Σ_g s_g·(Σ_k∈g x_k); per-group x sums arrive
        # precomputed, TRANSPOSED (1, GB, M) so the lane dim (M) matches
        # the full array (Pallas lane-128 rule); HIGHEST — f32 operands
        # round to bf16 at the TPU default (the bt_grouped round-4 lesson)
        d -= 8.0 * jax.lax.dot_general(
            xs_ref[0], s, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        acc_ref[...] += d
    else:
        q = pltpu.bitcast(p_ref[...], jnp.int4)
        if mode == "noscale_base":
            w = q.astype(jnp.bfloat16)
        elif mode == "noscale_i8":
            w = q.astype(jnp.int8).astype(jnp.bfloat16)
        elif mode == "noscale_i32":
            w = q.astype(jnp.int32).astype(jnp.bfloat16)
        else:  # base_grouped (production grouped scheme)
            w = q.astype(jnp.bfloat16)
        x = x_ref[...]
        if mode == "base_grouped":
            s = s_ref[...].astype(jnp.float32)
            total = jnp.zeros_like(acc_ref)
            for g in range(GB):
                pg = jnp.dot(x[:, 32 * g:32 * (g + 1)],
                             w[32 * g:32 * (g + 1)],
                             preferred_element_type=jnp.float32)
                total += pg * s[g][None, :]
            acc_ref[...] += total
        else:
            acc_ref[...] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def build_call(mode):
    bytepair = mode.startswith("bytepair")
    xspec_k = (M, BK // 2) if bytepair else (M, BK)
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(1, N // BN, K // BK),
        in_specs=[
            pl.BlockSpec(xspec_k, lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK // 2, BN), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK // 32, BN), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, BK // 2), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            # x group sums, transposed (K/BK, GB, M): lane dim == M (full)
            pl.BlockSpec((1, GB, M), lambda m, n, k: (k, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )


def prep_x(mode, x):
    """Kernel x inputs: (x_main, x_aux, x_groupsums)."""
    xf = x.astype(jnp.float32)
    xs = xf.reshape(M, K // 32, 32).sum(-1)           # (M, K/32)
    xs = xs.reshape(M, K // BK, GB).transpose(1, 2, 0).astype(jnp.float32)
    if mode.startswith("bytepair"):
        xe, xo = xf[:, 0::2], xf[:, 1::2]
        xm = (xe - xo / 16.0).astype(jnp.bfloat16)    # xe'
        xa = (xo / 16.0).astype(jnp.bfloat16)         # xo'
        return xm, xa, xs
    return x, jnp.zeros((M, K // 2), jnp.bfloat16), xs


def run_mode(mode, check=True):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    rng = np.random.RandomState(1)
    q = rng.randint(-8, 8, (K, N)).astype(np.int8)     # signed weights
    s_np = (np.abs(rng.randn(K // 32, N)) * 0.02 + 1e-3).astype(np.float32)
    if mode.startswith("bytepair"):
        u = (q + 8).astype(np.uint8)                   # biased nibbles
        B = (u[0::2] | (u[1::2] << 4))                 # byte = lo | hi<<4
        p = jnp.asarray(B)
    else:
        tc = (q.astype(np.int32) & 0xF).astype(np.uint8)  # two's complement
        p = jnp.asarray(tc[0::2] | (tc[1::2] << 4))
    s = jnp.asarray(s_np).astype(jnp.bfloat16)
    xm, xa, xs = prep_x(mode, x)
    call = build_call(mode)

    if check:
        got = np.asarray(call(xm, p, s, xa, xs), np.float32)
        sd = np.repeat(np.asarray(s, np.float32), 32, axis=0)
        if mode.startswith("noscale"):
            want = np.asarray(x, np.float32) @ q.astype(np.float32)
        else:
            want = np.asarray(x, np.float32) @ (q * sd)
        err = float(np.max(np.abs(got - want)))
        rel = err / (float(np.max(np.abs(want))) + 1e-9)
        if rel > 2e-2:
            print(json.dumps({"mode": mode, "exactness": "FAIL",
                              "rel": round(rel, 5)}), flush=True)
            return
    else:
        rel = -1.0

    Lw = 8

    @jax.jit
    def gen(kk):
        ps = jax.random.bits(kk, (Lw, K // 2, N), jnp.uint8)
        ss = jnp.full((Lw, K // 32, N), 0.01, jnp.bfloat16)
        return ps, ss

    ps, ss = gen(jax.random.PRNGKey(5))
    jax.block_until_ready((ps, ss))

    @jax.jit
    def chain(xm, xa, xs, ps, ss, reps):
        def outer(_, c):
            def body(cx, wl):
                pi, si = wl
                y = call(cx, pi, si, xa, xs)
                nxt = (y * 1e-2).astype(jnp.bfloat16)[:, : cx.shape[1]]
                return nxt, None

            cx, _ = jax.lax.scan(body, c, (ps, ss))
            return cx

        return jax.lax.fori_loop(0, reps, outer, xm).astype(jnp.float32).sum()

    per_call = slope_time_auto(
        lambda r: force(chain(xm, xa, xs, ps, ss, r)), 2, 8) / Lw
    traffic = K * N // 2 + (K // 32) * N * 2
    print(json.dumps({
        "mode": mode, "us_per_call": round(per_call * 1e6, 2),
        "rel_err": round(rel, 5),
        "eff_GBps": round(traffic / per_call / 1e9, 1),
    }), flush=True)


ALL = ("base_grouped", "noscale_base", "noscale_i8", "noscale_i32",
       "bytepair_big", "bytepair_grouped")

if __name__ == "__main__":
    for mode in (sys.argv[1:] or ALL):
        try:
            run_mode(mode)
        except Exception as e:
            print(json.dumps({"mode": mode, "error": repr(e)[:300]}), flush=True)
