"""Dequant-matmul kernel stage attribution + candidate-scheme shootout.

Times the int4 decode-shape kernel against ablations (no scale multiply /
int8 / pure bf16) and against alternative dequant formulations, to attribute
the gap to HBM speed-of-light between DMA, int4→bf16 conversion, and the
group-scale multiply — and to pick the fastest correct scheme.  Chains L
distinct weight tensors under one jit (cache-busting + dispatch
amortization) and slope-times (utils/timing.py).

Modes:
  bf16 / int8 / int4_noscale / int4   — round-1 attribution set
  int4_repeat     — group scales expanded with pltpu.repeat, single multiply
  int4_grouped    — per-group (M,32)@(32,bn) dots, scales on the partials
                    (32× fewer scale multiplies than scaling the weights)
  int4_batched    — same partial-dot idea via one batched dot_general
  int4_bittrick   — bf16 built from biased nibbles by integer OR into the
                    mantissa (no int→float convert); no scale (ablation)
  int4_bt_grouped — bittrick construction + grouped scales + rank-1 offset
                    correction via an (M,G)@(G,bn) MXU matmul (exact scheme)
  int4_convert_i8 — staged int4→int8→bf16 convert (no scale; ablation)

Usage: python benchmarks/kernel_microbench.py [mode ...]
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
# production helpers — the microbench MUST time the same numerics the
# kernels ship (round 3 drifted: a private _bittrick_w copy here carried
# the same nibble-bias bug pallas_matmul fixed in round 4)
from chatglm_q_tpu.ops.pallas_matmul import (
    _bittrick_unpack, _group_sel, _selscale_expand)

HBM_GBPS = 819.0
M, K, N, L = 8, 4096, 4096, 8
BK, BN = 2048, 1024
GROUP = 32


def _bittrick_w(p_u8):
    """(bk/2, bn) biased-nibble bytes → (bk, bn) bf16 of value 256 + 2u,
    u = q + 8 (pallas_matmul._bittrick_unpack, hardware branch)."""
    return _bittrick_unpack(p_u8, False)


def _kernel(x_ref, p_ref, s_ref, o_ref, acc_ref, *, mode):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]

    if mode in ("int4", "int4_noscale", "int4_repeat", "int4_selscale"):
        q = pltpu.bitcast(p_ref[...], jnp.int4)
        w = q.astype(jnp.bfloat16)
        bk, bn = w.shape
        if mode == "int4":
            s = s_ref[...].astype(jnp.bfloat16)
            w = (w.reshape(bk // GROUP, GROUP, bn) * s[:, None, :]).reshape(bk, bn)
        elif mode == "int4_repeat":
            # TIMING-ONLY ablation: pltpu.repeat TILES ([s;s;...]), which is
            # the wrong row↔group layout — numerics are wrong but the cost
            # of "cheap expansion + one flat multiply" is representative
            s = s_ref[...].astype(jnp.bfloat16)
            w = w * pltpu.repeat(s, GROUP, axis=0)
        elif mode == "int4_selscale":
            # exact production scheme: MXU 0/1 selection-matrix expansion
            w = w * _selscale_expand(s_ref[...], bk, jnp.bfloat16)
        acc_ref[...] += jnp.dot(x, w, preferred_element_type=jnp.float32)
    elif mode == "int4_convert_i8":
        q = pltpu.bitcast(p_ref[...], jnp.int4)
        w = q.astype(jnp.int8).astype(jnp.bfloat16)
        acc_ref[...] += jnp.dot(x, w, preferred_element_type=jnp.float32)
    elif mode == "int4_bittrick":
        w = _bittrick_w(p_ref[...])
        acc_ref[...] += jnp.dot(x, w, preferred_element_type=jnp.float32)
    elif mode == "int4_grouped":
        q = pltpu.bitcast(p_ref[...], jnp.int4)
        w = q.astype(jnp.bfloat16)
        bk, bn = w.shape
        s = s_ref[...].astype(jnp.float32)         # (G, bn)
        total = jnp.zeros_like(acc_ref)
        for g in range(bk // GROUP):
            pg = jnp.dot(x[:, GROUP * g:GROUP * (g + 1)],
                         w[GROUP * g:GROUP * (g + 1)],
                         preferred_element_type=jnp.float32)
            total += pg * s[g][None, :]
        acc_ref[...] += total
    elif mode == "int4_batched":
        q = pltpu.bitcast(p_ref[...], jnp.int4)
        w = q.astype(jnp.bfloat16)
        bk, bn = w.shape
        gb = bk // GROUP
        s = s_ref[...].astype(jnp.float32)
        xg = x.reshape(x.shape[0], gb, GROUP).transpose(1, 0, 2)
        wg = w.reshape(gb, GROUP, bn)
        pg = jax.lax.dot_general(
            xg, wg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                           # (G, M, bn)
        acc_ref[...] += (pg * s[:, None, :]).sum(0)
    elif mode == "int4_bt_grouped":
        w = _bittrick_w(p_ref[...])                 # value 256 + 2u
        bk, bn = w.shape
        gb = bk // GROUP
        s = s_ref[...].astype(jnp.float32)          # holds s/2 in real use
        total = jnp.zeros_like(acc_ref)
        for g in range(gb):
            pg = jnp.dot(x[:, GROUP * g:GROUP * (g + 1)],
                         w[GROUP * g:GROUP * (g + 1)],
                         preferred_element_type=jnp.float32)
            total += pg * s[g][None, :]
        # rank-1 offset: y -= 272 · (Σ_k∈g x) @ s — per-group sums via the
        # 0/1 selection-matrix dot (_group_sel)
        xsum = jnp.dot(x.astype(w.dtype), _group_sel(bk, w.dtype),
                       preferred_element_type=jnp.float32)
        total -= 272.0 * jnp.dot(xsum, s, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        acc_ref[...] += total
    elif mode == "int8":
        w = p_ref[...].astype(jnp.bfloat16)
        acc_ref[...] += jnp.dot(x, w, preferred_element_type=jnp.float32)
    elif mode == "int8_bt":
        # no int→float convert: biased byte u = q+128 split into nibbles,
        # each OR-ed into bf16-256's mantissa; x·q = 8·dh + 0.5·dl − 2304·Σx
        # vector shifts legalize only at 32 bit on Mosaic v5e
        u = (pltpu.bitcast(p_ref[...], jnp.uint8) ^ 0x80).astype(jnp.int32)
        wh = pltpu.bitcast((((u >> 4) & 0xF) | 0x4380).astype(jnp.int16), jnp.bfloat16)
        wl = pltpu.bitcast(((u & 0xF) | 0x4380).astype(jnp.int16), jnp.bfloat16)
        dh = jnp.dot(x, wh, preferred_element_type=jnp.float32)
        dl = jnp.dot(x, wl, preferred_element_type=jnp.float32)
        xsum = x.astype(jnp.float32).sum(axis=1, keepdims=True)
        acc_ref[...] += 8.0 * dh + 0.5 * dl - 2304.0 * xsum
    elif mode in ("int4_dma", "int4_dma_contig"):
        # pure-DMA floor: Pallas copies the FULL weight block to VMEM per
        # the BlockSpec regardless of use, so consuming only 8 rows keeps
        # the whole-stream DMA with negligible VPU work (summing the whole
        # block would itself cost ~2 VPU passes and mask the DMA time).
        # u8→f32 casts don't legalize on v5e; go via i32.
        # _contig: the weight arrives PRE-TILED (nb, K/2, bn) so each block
        # DMA is one contiguous span instead of bn-byte strided rows —
        # measures how much of the 819-538=281 GB/s gap is stride overhead.
        p = p_ref[0, :8, :] if mode == "int4_dma_contig" else p_ref[:8, :]
        acc_ref[...] += p.astype(jnp.int32).sum().astype(jnp.float32) * 1e-6
    elif mode == "int4_grouped_contig":
        # grouped-scheme compute on the pre-tiled contiguous layout
        q = pltpu.bitcast(p_ref[0], jnp.int4)
        w = q.astype(jnp.bfloat16)
        bk, bn = w.shape
        s = s_ref[0].astype(jnp.float32)
        total = jnp.zeros_like(acc_ref)
        for g in range(bk // GROUP):
            pg = jnp.dot(x[:, GROUP * g:GROUP * (g + 1)],
                         w[GROUP * g:GROUP * (g + 1)],
                         preferred_element_type=jnp.float32)
            total += pg * s[g][None, :]
        acc_ref[...] += total
    else:  # bf16
        acc_ref[...] += jnp.dot(x, p_ref[...], preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


_INT4_MODES = ("int4", "int4_noscale", "int4_repeat", "int4_selscale",
               "int4_grouped", "int4_batched", "int4_bittrick",
               "int4_bt_grouped", "int4_convert_i8", "int4_dma")


_CONTIG_MODES = ("int4_dma_contig", "int4_grouped_contig")


def matmul(mode, x, p, s):
    if mode in _CONTIG_MODES:
        # p (nb, K/2, bn), s (nb, K/32, bn) pre-tiled: block DMAs contiguous
        wspec = pl.BlockSpec((1, BK // 2, BN), lambda m, n, k: (n, k, 0),
                             memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec((1, BK // 32, BN), lambda m, n, k: (n, k, 0),
                             memory_space=pltpu.VMEM)
    else:
        wspec = pl.BlockSpec((BK // 2, BN) if mode in _INT4_MODES else (BK, BN),
                             lambda m, n, k: (k, n), memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec((BK // 32, BN), lambda m, n, k: (k, n),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(1, N // BN, K // BK),
        in_specs=[
            pl.BlockSpec((M, BK), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            wspec,
            sspec,
        ],
        out_specs=pl.BlockSpec((M, BN), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x, p, s)


def bench_mode(mode):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    if mode in _CONTIG_MODES:
        w = jax.random.bits(jax.random.PRNGKey(1), (L, K // 2, N), jnp.uint8)
        # pre-tile to (L, nb, K/2, bn): one-time layout transform, done on
        # host of the measurement — production would do it at load time
        w = jnp.asarray(w).reshape(L, K // 2, N // BN, BN).transpose(0, 2, 1, 3)
        wbytes = K * N // 2
    elif mode in ("int8", "int8_bt"):
        w = jax.random.bits(jax.random.PRNGKey(1), (L, K, N), jnp.uint8).astype(jnp.int8)
        wbytes = K * N
    else:
        w = jax.random.normal(jax.random.PRNGKey(1), (L, K, N), jnp.bfloat16) * 0.01
        wbytes = K * N * 2
    # bf16: the production scale storage dtype (ops/quant.py SCALE_DTYPE —
    # Mosaic v5e cannot load f16 vectors); the scale stream is 1/8 of the
    # packed weights, so benching f32 scales would overstate DMA by ~8%
    s = jnp.full((L, K // 32, N), 0.01, jnp.bfloat16)
    if mode in _CONTIG_MODES:
        s = s.reshape(L, K // 32, N // BN, BN).transpose(0, 2, 1, 3)
    if mode not in ("bf16", "int8", "int8_bt", "int4_noscale",
                    "int4_bittrick", "int4_convert_i8"):
        wbytes += (K // 32) * N * 2

    @jax.jit
    def run(x, w, s, reps):
        # dynamic trip count: ONE compiled program serves every chain
        # length (remote compiles cost minutes on this deployment)
        def outer(_, x):
            def body(x, wl):
                wi, si = wl
                y = matmul(mode, x, wi, si)
                return (y * 1e-2).astype(jnp.bfloat16), None

            x, _ = jax.lax.scan(body, x, (w, s))
            return x

        x = jax.lax.fori_loop(0, reps, outer, x)
        return x.sum()

    per = slope_time_auto(lambda n: force(run(x, w, s, n)), 2, 8) / L
    gbps = wbytes / per / 1e9
    print(json.dumps({
        "mode": mode, "us_per_matmul": round(per * 1e6, 1),
        "effective_GBps": round(gbps, 1),
        "sol_frac": round(gbps / HBM_GBPS, 3),
    }), flush=True)


if __name__ == "__main__":
    modes = sys.argv[1:] or ("bf16", "int8", "int8_bt", "int4_noscale", "int4",
                             "int4_repeat", "int4_selscale", "int4_grouped",
                             "int4_batched", "int4_bittrick", "int4_bt_grouped",
                             "int4_convert_i8", "int4_dma")
    for mode in modes:
        try:
            bench_mode(mode)
        except Exception as e:  # keep the shootout going past one bad mode
            print(json.dumps({"mode": mode, "error": repr(e)[:300]}), flush=True)
