"""Fused dequant+matmul Pallas TPU kernels for int8 / int4g32 weights.

TPU-native re-creation of the reference's four Triton kernels
(/root/reference/chatglm_q/int8/triton_ops.py:24-245 and
int4/triton_ops.py:26-264): weight tiles are streamed HBM→VMEM in their
packed integer form and dequantized *in-register* on the way into the MXU,
so the HBM traffic — the decode-time bottleneck — is 1 byte (int8) or
0.5 byte (int4) per weight instead of 2 (bf16).

Key TPU-specific design points (vs the Triton originals):

* **int4 unpack is a Mosaic ``bitcast``**: the in-memory packing stores
  two's-complement nibbles with K-adjacent pairs per byte, chosen so that
  ``pltpu.bitcast(packed_u8 (K/2, N) → int4)`` yields the (K, N) int4 weight
  directly — the hardware's native sub-byte layout does the "unpack"
  (verified: byte row i → int4 rows 2i (low nibble), 2i+1 (high)).  The
  Triton kernel's shift/mask arithmetic (int4/triton_ops.py:65-73)
  disappears entirely.
* **int8 scale is applied post-accumulation**: the per-out-channel scale
  (N,) commutes with the K-reduction, so the kernel converts int8→bf16 for
  the MXU and multiplies the f32 accumulator by the scale once per output
  tile — cheaper than scaling every weight element (the Triton kernel
  scales in-register per element, int8/triton_ops.py:70-71).
* **int4 group scales cannot commute** (they vary along K), so they are
  applied to the dequantized weight tile via a (groups, 32, N)-shaped
  broadcast before the dot — the TPU analog of the Triton kernel's
  scale-pointer advance per GROUP_K (int4/triton_ops.py:78-79).
* Grid is (M tiles, N tiles, K steps) with the K reduction innermost and a
  float32 VMEM accumulator — the Pallas-idiomatic replacement for Triton's
  program-id swizzle + SPLIT_K atomics (int8/triton_ops.py:44-49, :81-84).

Transposed variants compute ``grad_x = g @ dequant(w).T`` by contracting the
N dimension with ``dot_general`` on the same packed weights — no transposed
weight copy is needed (the reference stores a second layout for its
transposed kernels, int4/triton_ops.py:150-210).

On non-TPU backends kernels run in interpreter mode (tests); the int4
bitcast is replaced by an equivalent arithmetic unpack there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


import os

# perf-attribution switch (NOT for production): skip the int4 group-scale
# multiply to measure its share of the dequant cost.  Numerics are wrong
# while set.
_PERF_DEBUG_NOSCALE = os.environ.get("CHATGLM_Q_TPU_INT4_NOSCALE") == "1"

# block-size tuning overrides (sweeps; defaults chosen from measurements)
_BK_CAP = int(os.environ.get("CHATGLM_Q_TPU_BK_CAP", "0")) or None
_BN_CAP = int(os.environ.get("CHATGLM_Q_TPU_BN_CAP", "0")) or None
# int4 scale scheme: "broadcast" (per-element scale multiply) or "grouped"
# (per-group partial dots; see _int4_fwd_kernel).  The env var (and test
# monkeypatching of this module var) overrides the measured autotune table;
# the table overrides the built-in default.
_INT4_SCHEME = os.environ.get("CHATGLM_Q_TPU_INT4_SCHEME", "broadcast")


def _resolve_scheme(scheme: str | None) -> str:
    if scheme is not None and _INT4_SCHEME == "broadcast":
        return scheme  # tuned value; env/monkeypatch (non-default) wins
    return _INT4_SCHEME


# int8 dequant scheme: "convert" (native int8→float) or "bt" (nibble-split
# bitwise bf16 construction, no convert; see _int8_fwd_kernel)
_INT8_SCHEME = os.environ.get("CHATGLM_Q_TPU_INT8_SCHEME", "convert")


def _resolve_int8_scheme(scheme: str | None) -> str:
    if scheme is not None and _INT8_SCHEME == "convert":
        return scheme
    return _INT8_SCHEME
# optional per-kernel VMEM budget override (sweeps only; measured: raising
# it to 96 MB made decode slightly SLOWER - the compiler's default budget
# schedules better)
_VMEM_LIMIT = int(os.environ.get("CHATGLM_Q_TPU_VMEM_LIMIT", "0")) or None


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _largest_divisor(dim: int, align: int, cap: int) -> int | None:
    """Largest d ≤ cap with dim % d == 0 and d % align == 0."""
    best = None
    d = align
    while d <= min(dim, cap):
        if dim % d == 0:
            best = d
        d += align
    return best


def _pad_rows(x: jax.Array, multiple: int) -> jax.Array:
    m = x.shape[0]
    pad = (-m) % multiple
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


def _block_m(m: int) -> int:
    if m <= 8:
        return 8
    if m <= 256:
        return ((m + 7) // 8) * 8
    return 256


def _unpack_tile_int4(p_tile: jax.Array, interpret: bool) -> jax.Array:
    """(bk/2, bn) uint8 two's-complement nibble pairs → (bk, bn) int4/int8.

    On TPU this is a single Mosaic bitcast; in interpreter mode an
    arithmetic equivalent (also the definition of the layout).
    """
    if not interpret:
        return pltpu.bitcast(p_tile, jnp.int4)
    k2, bn = p_tile.shape
    lo = (jnp.bitwise_xor(p_tile & 0xF, 8).astype(jnp.int8) - 8)
    hi = (p_tile >> 4).astype(jnp.int8)
    hi = jnp.where(hi > 7, hi - 16, hi).astype(jnp.int8)
    return jnp.stack([lo, hi], axis=1).reshape(2 * k2, bn)


def _bittrick_unpack(p_tile: jax.Array, interpret: bool) -> jax.Array:
    """(bk/2, bn) u8 nibble pairs → (bk, bn) bfloat16 of value 256 + 2u,
    u = q + 8 ∈ [0, 15] the biased nibble.

    The nibble is OR-ed into the low mantissa bits of bf16 256.0 (0x4380):
    256·(1 + u/128) = 256 + 2u, every value exactly representable — the
    int→float convert (round-1 attribution: ≈3.6 ms/token of serial VPU
    work) becomes two ALU ops and a bitcast.  s·q then equals
    (s/2)·(256 + 2u) − 136·s, recovered exactly by the bt_grouped scheme's
    rank-1 correction (see _int4_fwd_kernel).
    """
    if not interpret:
        q = pltpu.bitcast(p_tile, jnp.int4)
        # q & 0xF is the raw two's-complement nibble = q mod 16, NOT the
        # biased q + 8 the construction needs — they differ by a flip of
        # the top bit for EVERY value (q mod 16 = (q + 8) ^ 8).  Round 3
        # shipped the unbiased form and saw max-err 75.4 on hardware
        # ("Mosaic miscompile", actually this bias bug — interpret mode
        # below always computed q + 8 and was exact).  XOR 0x8 biases it.
        u16 = (q.astype(jnp.int16) & 0xF) ^ 0x8
        return pltpu.bitcast(u16 | 0x4380, jnp.bfloat16)
    qf = _unpack_tile_int4(p_tile, True).astype(jnp.float32)
    return (256.0 + 2.0 * (qf + 8.0)).astype(jnp.bfloat16)


_GROUP_K = 32  # int4g32 quantization group size along K


def _group_sel(bk: int, dtype) -> jax.Array:
    """(bk, bk/32) 0/1 group-membership matrix: sel[r, g] = 1 iff row r is
    in scale group g.  Used as an MXU operand because the direct
    ``(bm, bk) → (bm, gb, 32)`` reshape splits the lane dim, which Mosaic
    cannot lay out ("infer-vector-layout: unsupported shape cast",
    verified by v5e AOT compile)."""
    gb = bk // _GROUP_K
    rows = jax.lax.broadcasted_iota(jnp.int32, (bk, gb), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bk, gb), 1)
    return (rows // _GROUP_K == cols).astype(dtype)


def _selscale_expand(s: jax.Array, bk: int, dtype) -> jax.Array:
    """(gb, bn) group scales → (bk, bn) per-row scales via ONE 0/1
    group-membership MXU dot — exact (one nonzero per row, f32
    accumulation), replacing Mosaic's slow 3-D sublane broadcast
    (measured +15 us / 9.4 MB tile) with a ~1 us matmul."""
    sel = _group_sel(bk, dtype)
    sfull = jnp.dot(sel, s.astype(dtype), preferred_element_type=jnp.float32)
    return sfull.astype(dtype)


# ---------------------------------------------------------------------------
# Forward kernels
# ---------------------------------------------------------------------------

def _int8_fwd_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *,
                     scheme="convert", interpret=False):
    """int8 per-out-channel fused dequant-matmul K-step.

    The per-N scale commutes with the K reduction, so it is applied ONCE on
    the accumulator — the only per-weight-element work is the int8→float
    convert.  Schemes:

    * ``convert`` (default): native int8→bf16/f32 convert, one dot.
    * ``bt``: NO int→float convert.  The biased byte u = q + 128 is split
      into nibbles u = 16·uh + ul; each nibble is OR-ed into the mantissa of
      bf16 256.0 (the int4 _bittrick_unpack construction, giving 256 + 2·uh
      and 256 + 2·ul exactly), and
        x·q = 8·(x·wh) + 0.5·(x·wl) − 2304·Σx
      recovers the true dot with a rank-1 row-sum term.  Two MXU dots per
      tile instead of one — free at decode M where the kernel is
      bandwidth-bound, so the trade is VPU convert work → MXU work.
      Requires bf16 activations (the wrapper gates on dtype).
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if scheme == "bt":
        xb = x_ref[...]
        if not interpret:
            # Mosaic v5e legalizes vector shifts only at 32 bit (verified
            # by local AOT compile: arith.shrui on i8/i16 vectors fails) —
            # widen, shift/mask, narrow to i16 for the mantissa OR
            u = (pltpu.bitcast(w_ref[...], jnp.uint8) ^ 0x80).astype(jnp.int32)
            wh = pltpu.bitcast((((u >> 4) & 0xF) | 0x4380).astype(jnp.int16),
                               jnp.bfloat16)
            wl = pltpu.bitcast(((u & 0xF) | 0x4380).astype(jnp.int16),
                               jnp.bfloat16)
        else:
            u = w_ref[...].astype(jnp.float32) + 128.0
            uh = jnp.floor(u / 16.0)
            wh = (256.0 + 2.0 * uh).astype(jnp.bfloat16)
            wl = (256.0 + 2.0 * (u - 16.0 * uh)).astype(jnp.bfloat16)
        dh = jnp.dot(xb, wh, preferred_element_type=jnp.float32)
        dl = jnp.dot(xb, wl, preferred_element_type=jnp.float32)
        xsum = xb.astype(jnp.float32).sum(axis=1, keepdims=True)
        acc_ref[...] += 8.0 * dh + 0.5 * dl - 2304.0 * xsum
    else:
        acc_ref[...] += jnp.dot(
            x_ref[...], w_ref[...].astype(x_ref.dtype),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _int4_fwd_kernel(x_ref, p_ref, s_ref, o_ref, acc_ref, *, interpret, k_total,
                     scheme="broadcast"):
    """int4g32 fused dequant-matmul K-step.

    Three scale schemes:
    * broadcast (default round 1): dequantized weights are multiplied by the
      group scale elementwise — 2 VPU ops per WEIGHT element.
    * ``grouped``: per-group (bm, 32)·(32, bn) partial dots on the UNSCALED
      weights, scales applied to the (bm, bn) partials — the scale work
      drops from O(bk·bn) to O(gb·bm·bn), 32/bm× less VPU traffic at decode
      (the round-1 attribution measured the broadcast multiply at
      5.5 ms/token, ~35% of the whole step; docs/RESULTS.md).
    * ``bt_grouped``: grouped partials on _bittrick_unpack's biased-nibble
      bf16 weights (no int→float convert) with the −136·s offset folded
      into ONE rank-1 (bm, gb)·(gb, bn) MXU matmul on per-group activation
      sums — exact.  Per-weight-element work drops to two cheap integer
      lane passes (nibble→i16 unpack + mantissa OR): no convert, no
      per-element multiply.  With that the VPU term is comparable to the
      DMA time, so the remaining win comes from the pipeline overlapping
      them (Mosaic double-buffering / the pipelined kernel).
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bittrick = scheme == "bt_grouped" and not _PERF_DEBUG_NOSCALE
    if bittrick:
        w = _bittrick_unpack(p_ref[...], interpret)       # (bk, bn) bf16
        bk, bn = w.shape
    else:
        q = _unpack_tile_int4(p_ref[...], interpret)      # (bk, bn) int4
        bk, bn = q.shape
        w = q.astype(x_ref.dtype)
    gb = bk // 32
    xv = x_ref[...]
    s = s_ref[...]
    if k_total % bk:
        # the final K block overhangs the arrays; the float-sourced operands
        # (x columns, scale rows) can read NaN garbage there and 0·NaN = NaN
        # would poison the accumulator — zero them both.  w comes from an
        # int4 bitcast, so it is always finite; the zeroed x/scale factors
        # null its contribution.  Emitted only for non-dividing K (e.g.
        # ChatGLM2 inner dim 13696 = 26×512 + 384).
        valid = k_total - k * bk
        cols = jax.lax.broadcasted_iota(jnp.int32, xv.shape, 1)
        xv = jnp.where(cols < valid, xv, jnp.zeros_like(xv))
        srows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(srows * 32 < valid, s, jnp.zeros_like(s))
    if bittrick:
        s2 = s.astype(jnp.float32) * 0.5                  # (gb, bn)
        xb = xv.astype(w.dtype)  # the offset below must see the SAME
        # rounded activations as the dots, or the −136·s term mis-cancels
        total = jnp.zeros_like(acc_ref)
        for g in range(gb):
            pg = jnp.dot(xb[:, 32 * g:32 * (g + 1)],
                         w[32 * g:32 * (g + 1)],
                         preferred_element_type=jnp.float32)
            total += pg * s2[g][None, :]
        # rank-1 offset: s·q = (s/2)(256+2u) − 136·s = s2·w_bt − 272·s2.
        # Per-group x sums via the 0/1 selection-matrix MXU dot (_group_sel).
        xsum = jnp.dot(xb, _group_sel(bk, w.dtype),
                       preferred_element_type=jnp.float32)  # (bm, gb)
        # HIGHEST: the correction dot has f32 operands, and the TPU default
        # rounds f32 matmul inputs to bf16 — the ~900-magnitude offset then
        # mis-cancels by ~1 absolute (hardware 2026-08-19: max err 0.896 vs
        # 0.09 for the other schemes).  The (bm, gb)·(gb, bn) dot is tiny,
        # full-precision passes cost nothing.
        total -= 272.0 * jnp.dot(xsum, s2, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        acc_ref[...] += total
    elif scheme == "grouped" and not _PERF_DEBUG_NOSCALE:
        s = s.astype(jnp.float32)                         # (gb, bn)
        total = jnp.zeros_like(acc_ref)
        for g in range(gb):
            pg = jnp.dot(xv[:, 32 * g:32 * (g + 1)], w[32 * g:32 * (g + 1)],
                         preferred_element_type=jnp.float32)
            total += pg * s[g][None, :]
        acc_ref[...] += total
    elif scheme == "selscale" and not _PERF_DEBUG_NOSCALE:
        # bit-identical to broadcast, but the (gb, bn) → (bk, bn) scale
        # expansion runs on the MXU (_selscale_expand) followed by ONE flat
        # 2-D multiply.
        w = w * _selscale_expand(s, bk, x_ref.dtype)
        acc_ref[...] += jnp.dot(xv, w, preferred_element_type=jnp.float32)
    else:
        if not _PERF_DEBUG_NOSCALE:
            s = s.astype(x_ref.dtype)                     # (gb, bn)
            w = (w.reshape(gb, 32, bn) * s[:, None, :]).reshape(bk, bn)
        acc_ref[...] += jnp.dot(xv, w, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def int8_matmul_pallas(x, w, scale, *, bk_cap=2048, bn_cap=2048, scheme=None,
                       interpret=None):
    """x (M, K) float @ (w (K, N) int8 ⊙ scale (N,)) → (M, N)."""
    from . import autotune as AT

    tuned = AT.lookup("int8", _block_m(x.shape[0]), w.shape[0], w.shape[1]) or {}
    bk_cap = _BK_CAP or tuned.get("bk") or bk_cap
    bn_cap = _BN_CAP or tuned.get("bn") or bn_cap
    scheme = _resolve_int8_scheme(scheme or tuned.get("scheme")) or "convert"
    if scheme == "bt" and x.dtype != jnp.bfloat16:
        # the nibble-split construction is exact only against bf16-rounded
        # activations; f32 parity/oracle modes keep the convert path
        scheme = "convert"
    if scheme == "bt":
        # the i32 widening for the nibble shifts (Mosaic legalizes vector
        # shifts only at 32 bit) costs 4 B/elem of scoped VMEM — a
        # 2048×2048 block overflows the 16 MB stack limit (v5e AOT
        # verified); halve the K block
        bk_cap = min(bk_cap, 1024)
    if interpret is None:
        interpret = not _is_tpu()
    M, K = x.shape
    K2, N = w.shape
    assert K == K2, (K, K2)
    bk = _largest_divisor(K, 256, bk_cap) or _largest_divisor(K, 32, bk_cap)
    bn = _largest_divisor(N, 128, bn_cap)
    if bk is None or bn is None:
        return x @ (w.astype(x.dtype) * scale.astype(x.dtype))
    bm = _block_m(M)
    xp = _pad_rows(x, bm)
    Mp = xp.shape[0]

    out = pl.pallas_call(
        functools.partial(_int8_fwd_kernel, scheme=scheme, interpret=interpret),
        grid=(Mp // bm, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, w, scale.reshape(1, N))
    return out[:M]


# History: bt_grouped was QUARANTINED for round 3 ("wrong on hardware,
# max err 75.4, suspected Mosaic miscompile").  Round 4 root-caused it to
# two ordinary bugs — the _bittrick_unpack nibble bias (q mod 16 vs q+8)
# and the TPU default bf16 matmul precision on the f32 rank-1 correction
# dot — and hardware revalidation (benchmarks/logs/btg_recheck.out,
# 2026-08-19: max err 8.0e-2, identical to `grouped`) lifted the
# quarantine.  docs/RESULTS.md has the full post-mortem.


def _pick_int4_bk(K: int, bk_cap: int):
    """K-block size for int4 kernels.

    The int4 scale block has bk/32 sublane rows, which TPU requires to be a
    multiple of 8 (or the full dim) — so blocked mode uses bk % 256 == 0.
    K need NOT divide by bk: the grid is cdiv(K, bk) and the final partial
    block is masked in-kernel (fwd) or write-clipped (transposed).  Whole-K
    single blocks are allowed only for small K — Mosaic compile time blows
    up on giant single-block dequants (measured: K=13696 whole-block takes
    >7 min to compile vs ~30 s tiled).
    """
    if K <= 512 and K % 128 == 0 and (K // 2) % 8 == 0 and K % 32 == 0:
        if _largest_divisor(K, 256, bk_cap) is None:
            return K  # small whole-K (e.g. 384): blocks equal full dims
    bk = _largest_divisor(K, 256, bk_cap)
    if bk is not None:
        return bk
    if K > 512 and K % 128 == 0:
        return 512  # cdiv grid with masked final partial block
    return None


def int4_matmul_pallas(x, packed, scale, *, bk_cap=2048, bn_cap=2048,
                       scheme=None, interpret=None):
    """x (M, K) @ dequant(packed (K/2, N) u8 nibble-pairs, scale (K/32, N))."""
    bk_cap = _BK_CAP or bk_cap
    bn_cap = _BN_CAP or bn_cap
    scheme = _resolve_scheme(scheme)
    if scheme == "selscale":
        # the f32 (bk, bn) expanded-scale intermediate costs 4 B/elem of
        # scoped VMEM — bk=2048 × bn=2048 overflows the 16 MB stack limit
        # (21.41M, v5e AOT verified); halve the K block unconditionally
        # (env/sweep overrides included: a larger bk cannot compile)
        bk_cap = min(bk_cap, 1024)
    if interpret is None:
        interpret = not _is_tpu()
    M, K = x.shape
    K2, N = packed.shape
    G = scale.shape[0]
    assert K == 2 * K2 and K == 32 * G, (K, K2, G)
    bk = _pick_int4_bk(K, bk_cap)
    bn = _largest_divisor(N, 128, bn_cap)
    if bk is None or bn is None:
        from .quant import unpack_int4_tpu

        return x @ unpack_int4_tpu(packed, scale).astype(x.dtype)
    bm = _block_m(M)
    xp = _pad_rows(x, bm)
    Mp = xp.shape[0]

    out = pl.pallas_call(
        functools.partial(_int4_fwd_kernel, interpret=interpret, k_total=K,
                          scheme=scheme),
        grid=(Mp // bm, N // bn, pl.cdiv(K, bk)),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 32, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            **({"vmem_limit_bytes": _VMEM_LIMIT} if _VMEM_LIMIT else {}),
        ),
        interpret=interpret,
    )(xp, packed, scale)
    return out[:M]


# ---------------------------------------------------------------------------
# Layer-INDEXED forward kernels: weights stay STACKED (L, ...) in HBM and
# the kernel's BlockSpec index maps address layer `idx` directly via a
# scalar-prefetched index (the paged-attention idiom).  Purpose: under the
# serving layer-scan, slicing the stacked weights in XLA materializes a
# full per-layer copy as the Pallas custom-call operand — round-4 profiles
# attribute ~4.1 ms of the 11.6 ms int4 decode step (35%) to those
# dynamic-slice fusions.  The indexed kernels make the per-layer "slice"
# free: blocks DMA straight from the stacked array.
# ---------------------------------------------------------------------------


def int4_matmul_pallas_idx(x, pstack, sstack, idx, *, bk_cap=2048,
                           bn_cap=2048, scheme=None, interpret=None):
    """x (M, K) @ dequant(pstack[idx], sstack[idx]) without slicing.

    pstack (L, K/2, N) uint8, sstack (L, K/32, N), idx scalar int32 — OR
    the pre-TILED layout pstack (L, N/bn, K/2, bn), sstack (L, N/bn,
    K/32, bn) (ops/quant.tile_int4_stack): each weight block is then ONE
    contiguous HBM span, recovering the ~9% the bn-strided column DMAs
    lose (int4_dma_contig 16.09 vs 17.61 us, benchmarks/logs).  Tiled
    layout fixes bn to the stored tile width.
    Returns None when the shape is unsupported (caller slices + falls back).
    """
    bk_cap = _BK_CAP or bk_cap
    bn_cap = _BN_CAP or bn_cap
    scheme = _resolve_scheme(scheme)
    if scheme == "selscale":
        bk_cap = min(bk_cap, 1024)  # see int4_matmul_pallas
    if interpret is None:
        interpret = not _is_tpu()
    M, K = x.shape
    tiled = pstack.ndim == 4
    if tiled:
        Lw, nb, K2, bn = pstack.shape
        N = nb * bn
        G = sstack.shape[2]
    else:
        Lw, K2, N = pstack.shape
        G = sstack.shape[1]
    assert K == 2 * K2 and K == 32 * G, (K, K2, G)
    bk = _pick_int4_bk(K, bk_cap)
    if bk is None:
        return None
    if not tiled:
        bn = _largest_divisor(N, 128, bn_cap)
        if bn is None:
            return None
    bm = _block_m(M)
    xp = _pad_rows(x, bm)
    Mp = xp.shape[0]
    inner = functools.partial(_int4_fwd_kernel, interpret=interpret,
                              k_total=K, scheme=scheme)

    if tiled:
        def kern(idx_ref, x_ref, p_ref, s_ref, o_ref, acc_ref):
            del idx_ref
            inner(x_ref, p_ref.at[0, 0], s_ref.at[0, 0], o_ref, acc_ref)

        in_specs = [
            pl.BlockSpec((bm, bk), lambda m, n, k, i: (m, k)),
            pl.BlockSpec((1, 1, bk // 2, bn),
                         lambda m, n, k, i: (i[0], n, k, 0)),
            pl.BlockSpec((1, 1, bk // 32, bn),
                         lambda m, n, k, i: (i[0], n, k, 0)),
        ]
    else:
        def kern(idx_ref, x_ref, p_ref, s_ref, o_ref, acc_ref):
            del idx_ref  # consumed by the index maps
            inner(x_ref, p_ref.at[0], s_ref.at[0], o_ref, acc_ref)

        in_specs = [
            pl.BlockSpec((bm, bk), lambda m, n, k, i: (m, k)),
            pl.BlockSpec((1, bk // 2, bn), lambda m, n, k, i: (i[0], k, n)),
            pl.BlockSpec((1, bk // 32, bn), lambda m, n, k, i: (i[0], k, n)),
        ]

    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Mp // bm, N // bn, pl.cdiv(K, bk)),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, i: (m, n)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), xp, pstack, sstack)
    return out[:M]


def int8_matmul_pallas_idx(x, wstack, sstack, idx, *, bk_cap=2048,
                           bn_cap=2048, scheme=None, interpret=None):
    """x (M, K) @ (wstack[idx] ⊙ sstack[idx]) without slicing.

    wstack (L, K, N) int8, sstack (L, N), idx scalar int32."""
    from . import autotune as AT

    tuned = AT.lookup("int8", _block_m(x.shape[0]), wstack.shape[1],
                      wstack.shape[2]) or {}
    bk_cap = _BK_CAP or tuned.get("bk") or bk_cap
    bn_cap = _BN_CAP or tuned.get("bn") or bn_cap
    scheme = _resolve_int8_scheme(scheme or tuned.get("scheme")) or "convert"
    if scheme == "bt" and x.dtype != jnp.bfloat16:
        scheme = "convert"
    if scheme == "bt":
        bk_cap = min(bk_cap, 1024)  # see int8_matmul_pallas
    if interpret is None:
        interpret = not _is_tpu()
    M, K = x.shape
    Lw, K2, N = wstack.shape
    assert K == K2, (K, K2)
    bk = _largest_divisor(K, 256, bk_cap) or _largest_divisor(K, 32, bk_cap)
    bn = _largest_divisor(N, 128, bn_cap)
    if bk is None or bn is None:
        return None
    bm = _block_m(M)
    xp = _pad_rows(x, bm)
    Mp = xp.shape[0]
    s3 = sstack.reshape(Lw, 1, N)
    inner = functools.partial(_int8_fwd_kernel, scheme=scheme,
                              interpret=interpret)

    def kern(idx_ref, x_ref, w_ref, s_ref, o_ref, acc_ref):
        del idx_ref
        inner(x_ref, w_ref.at[0], s_ref.at[0], o_ref, acc_ref)

    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Mp // bm, N // bn, K // bk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda m, n, k, i: (m, k)),
                pl.BlockSpec((1, bk, bn), lambda m, n, k, i: (i[0], k, n)),
                pl.BlockSpec((1, 1, bn), lambda m, n, k, i: (i[0], 0, n)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, i: (m, n)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), xp, wstack, s3)
    return out[:M]


def int4_matmul_auto_idx(x, pstack, sstack, idx, *, interpret=None):
    """Indexed-dispatch twin of int4_matmul_auto.  The autotune table keys
    match (same logical K/N); pipelined winners run their scheme/blocks on
    the grid impl (measured near-equal; an indexed pipelined variant can
    follow if a gap ever shows)."""
    from . import autotune as AT

    if pstack.ndim == 4:  # tiled serving layout (bn fixed by the layout)
        K, N = 2 * pstack.shape[2], pstack.shape[1] * pstack.shape[3]
    else:
        K, N = 2 * pstack.shape[1], pstack.shape[2]
    tuned = AT.lookup("int4", _block_m(x.shape[0]), K, N) or {}
    if tuned.get("scheme") == "bt_grouped" and not tuned.get("exact"):
        tuned = {}  # see int4_matmul_auto
    return int4_matmul_pallas_idx(
        x, pstack, sstack, idx, bk_cap=tuned.get("bk") or 2048,
        bn_cap=tuned.get("bn") or 2048, scheme=tuned.get("scheme"),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Transposed kernels (grad_x = g @ dequant(w).T), contraction over N
# ---------------------------------------------------------------------------

_CONTRACT_N = (((1,), (1,)), ((), ()))  # contract last dims of (bm,bn)·(bk,bn)


def _int8_t_kernel(g_ref, w_ref, s_ref, o_ref, acc_ref):
    n = pl.program_id(2)

    @pl.when(n == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gs = g_ref[...] * s_ref[...].astype(g_ref.dtype)  # fold per-N scale into g
    acc_ref[...] += jax.lax.dot_general(
        gs, w_ref[...].astype(g_ref.dtype), _CONTRACT_N,
        preferred_element_type=jnp.float32,
    )

    @pl.when(n == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _int4_t_kernel(g_ref, p_ref, s_ref, o_ref, acc_ref, *, interpret):
    n = pl.program_id(2)

    @pl.when(n == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = _unpack_tile_int4(p_ref[...], interpret)
    bk, bn = q.shape
    gb = bk // 32
    w = q.astype(g_ref.dtype)
    s = s_ref[...].astype(g_ref.dtype)
    w = (w.reshape(gb, 32, bn) * s[:, None, :]).reshape(bk, bn)
    acc_ref[...] += jax.lax.dot_general(
        g_ref[...], w, _CONTRACT_N, preferred_element_type=jnp.float32
    )

    @pl.when(n == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def int8_matmul_t_pallas(g, w, scale, *, bk_cap=512, bn_cap=2048, interpret=None):
    """g (M, N) @ (w (K, N) int8 ⊙ scale (N,)).T → (M, K)."""
    if interpret is None:
        interpret = not _is_tpu()
    M, N = g.shape
    K, N2 = w.shape
    assert N == N2
    bn = _largest_divisor(N, 256, bn_cap) or _largest_divisor(N, 128, bn_cap)
    bk = _largest_divisor(K, 128, bk_cap)
    if bk is None or bn is None:
        return g @ (w.astype(g.dtype) * scale.astype(g.dtype)).T
    bm = _block_m(M)
    gp = _pad_rows(g, bm)
    Mp = gp.shape[0]

    out = pl.pallas_call(
        _int8_t_kernel,
        grid=(Mp // bm, K // bk, N // bn),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda m, k, n: (m, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda m, k, n: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, k, n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bk), lambda m, k, n: (m, k), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, K), g.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(gp, w, scale.reshape(1, N))
    return out[:M]


def int4_matmul_t_pallas(g, packed, scale, *, bk_cap=512, bn_cap=2048, interpret=None):
    """g (M, N) @ dequant(packed, scale).T → (M, K)."""
    if interpret is None:
        interpret = not _is_tpu()
    M, N = g.shape
    K2, N2 = packed.shape
    K = 2 * K2
    assert N == N2
    bn = _largest_divisor(N, 256, bn_cap) or _largest_divisor(N, 128, bn_cap)
    bk = _pick_int4_bk(K, bk_cap)
    if bk is None or bn is None:
        from .quant import unpack_int4_tpu

        return g @ unpack_int4_tpu(packed, scale).astype(g.dtype).T
    bm = _block_m(M)
    gp = _pad_rows(g, bm)
    Mp = gp.shape[0]

    out = pl.pallas_call(
        functools.partial(_int4_t_kernel, interpret=interpret),
        grid=(Mp // bm, pl.cdiv(K, bk), N // bn),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda m, k, n: (m, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda m, k, n: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 32, bn), lambda m, k, n: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bk), lambda m, k, n: (m, k), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, K), g.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(gp, packed, scale)
    return out[:M]


# ---------------------------------------------------------------------------
# Decode-optimized pipelined int4 kernel: one program per N tile, in-kernel
# K loop with explicit double-buffered DMA so weight streaming overlaps the
# VPU dequant (measured: the grid-stepped kernel runs DMA and dequant
# serially — utils analysis in docs/RESULTS.md)
# ---------------------------------------------------------------------------

# K rows per pipelined chunk CAP (packed rows ck // 2); env-tunable.  The
# actual chunk is the largest divisor of K that is a multiple of 256 and
# ≤ the cap (so e.g. w_out's K=13824 pipelines with ck=1536).
_CK = int(os.environ.get("CHATGLM_Q_TPU_PIPE_CK", "2048"))


def _pick_pipeline_ck(K: int) -> int | None:
    return _largest_divisor(K, 256, _CK)


def _int4_chunk_compute(xk, ptile, stile, acc_like, *, scheme, interpret,
                        xdtype):
    """Dequantize one (ck, bn) packed chunk and contract with xk (bm, ck);
    returns the (bm, bn) f32 partial.  Shared by the statically-unrolled
    pipelined kernel; mirrors _int4_fwd_kernel's scheme branches."""
    ck2, bn = ptile.shape
    ck = 2 * ck2
    gb = ck // 32
    if scheme == "bt_grouped":
        w = _bittrick_unpack(ptile, interpret)             # (ck, bn) bf16
        s2 = stile.astype(jnp.float32) * 0.5               # (gb, bn)
        xb = xk.astype(w.dtype)  # offset must see the same rounded
        # activations as the dots (exact cancellation of the bias)
        total = jnp.zeros_like(acc_like)
        for g in range(gb):
            pg = jnp.dot(xb[:, 32 * g:32 * (g + 1)],
                         w[32 * g:32 * (g + 1)],
                         preferred_element_type=jnp.float32)
            total += pg * s2[g][None, :]
        xsum = jnp.dot(xb, _group_sel(ck, w.dtype),
                       preferred_element_type=jnp.float32)
        # HIGHEST — see _int4_fwd_kernel's correction-dot note
        total -= 272.0 * jnp.dot(xsum, s2,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        return total
    q = _unpack_tile_int4(ptile, interpret)                # (ck, bn)
    w = q.astype(xdtype)
    if scheme == "selscale":
        w = w * _selscale_expand(stile, ck, xdtype)
        return jnp.dot(xk, w, preferred_element_type=jnp.float32)
    if scheme == "grouped":
        s = stile.astype(jnp.float32)                      # (gb, bn)
        total = jnp.zeros_like(acc_like)
        for g in range(gb):
            pg = jnp.dot(xk[:, 32 * g:32 * (g + 1)],
                         w[32 * g:32 * (g + 1)],
                         preferred_element_type=jnp.float32)
            total += pg * s[g][None, :]
        return total
    s = stile.astype(xdtype)                               # (gb, bn)
    w = (w.reshape(gb, 32, bn) * s[:, None, :]).reshape(ck, bn)
    return jnp.dot(xk, w, preferred_element_type=jnp.float32)


def _int4_pipelined_kernel(x_ref, p_hbm, s_hbm, o_ref, pbuf, sbuf, acc_ref, sems,
                           *, k_total, bn, ck_rows, scheme, interpret=False):
    n = pl.program_id(0)
    num_chunks = k_total // ck_rows

    def get_dmas(slot, ck):
        rows = pl.ds(ck * (ck_rows // 2), ck_rows // 2)
        grows = pl.ds(ck * (ck_rows // 32), ck_rows // 32)
        cols = pl.ds(n * bn, bn)
        return (
            pltpu.make_async_copy(p_hbm.at[rows, cols], pbuf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(s_hbm.at[grows, cols], sbuf.at[slot], sems.at[slot, 1]),
        )

    for d in get_dmas(0, 0):
        d.start()
    acc_ref[...] = jnp.zeros_like(acc_ref)

    # STATICALLY UNROLLED chunk loop (num_chunks is trace-time static):
    # the fori_loop version indexed the revolving buffers with a DYNAMIC
    # slot (lax.rem(ck, 2)), and dynamically-indexed VMEM scratch defeats
    # Mosaic's scheduling — the hardware sweep measured the "pipelined"
    # kernel byte-for-byte as slow as the serial grid kernel (32.4 us vs
    # the 17.6 us DMA floor at the qo_proj decode tile).  With static
    # slots every chunk's DMA wait, compute, and next-chunk DMA start are
    # independently schedulable.
    for ck in range(num_chunks):
        slot = ck % 2
        if ck + 1 < num_chunks:
            for d in get_dmas((ck + 1) % 2, ck + 1):
                d.start()
        for d in get_dmas(slot, ck):
            d.wait()
        xk = x_ref[:, ck * ck_rows:(ck + 1) * ck_rows]
        acc_ref[...] += _int4_chunk_compute(
            xk, pbuf[slot], sbuf[slot], acc_ref, scheme=scheme,
            interpret=interpret, xdtype=x_ref.dtype)
    o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def int4_matmul_pallas_pipelined(x, packed, scale, *, bn_cap=1024,
                                 scheme=None, interpret=None):
    """Decode-path int4 dequant matmul with explicit DMA/compute overlap.

    Requirements: K divisible by a 256-multiple chunk (guaranteed for
    quantized linears by int4_storage_k padding when K > 512), M ≤ 64.
    Returns None when the shape is unsupported (caller falls back to the
    grid kernel).
    """
    if interpret is None:
        interpret = not _is_tpu()
    bn_cap = _BN_CAP or bn_cap
    M, K = x.shape
    K2, N = packed.shape
    ck = _pick_pipeline_ck(K)
    if K != 2 * K2 or ck is None or M > 64:
        return None
    bn = _largest_divisor(N, 256, bn_cap) or _largest_divisor(N, 128, bn_cap)
    if bn is None:
        return None
    bm = _block_m(M)
    xp = _pad_rows(x, bm)
    Mp = xp.shape[0]

    out = pl.pallas_call(
        functools.partial(_int4_pipelined_kernel, k_total=K, bn=bn,
                          ck_rows=ck, scheme=_resolve_scheme(scheme),
                          interpret=interpret),
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ck // 2, bn), jnp.uint8),
            pltpu.VMEM((2, ck // 32, bn), scale.dtype),
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xp, packed, scale)
    return out[:M]


_NO_PIPELINE = os.environ.get("CHATGLM_Q_TPU_NO_PIPELINE") == "1"


def int4_matmul_auto(x, packed, scale, *, interpret=None):
    """Dispatch: measured autotune entry when present (impl/blocks/scheme,
    ops/autotune.py); else pipelined decode kernel when applicable, grid
    kernel otherwise.  Env overrides (_NO_PIPELINE, _BK/BN_CAP, scheme)
    always win over the table."""
    from . import autotune as AT

    tuned = AT.lookup("int4", _block_m(x.shape[0]), 2 * packed.shape[0],
                      packed.shape[1]) or {}
    if tuned.get("scheme") == "bt_grouped" and not tuned.get("exact"):
        # pre-round-4 tables timed bt_grouped while its numerics were
        # broken on hardware; only exactness-verified entries may select it
        import warnings

        warnings.warn("autotune table selects 'bt_grouped' without an "
                      "exactness row; ignoring the stale entry "
                      "(re-run the sweep)")
        tuned = {}
    impl = "grid" if _NO_PIPELINE else tuned.get("impl")
    if impl != "grid":
        out = int4_matmul_pallas_pipelined(
            x, packed, scale, bn_cap=tuned.get("bn") or 1024,
            scheme=tuned.get("scheme"), interpret=interpret,
        )
        if out is not None:
            return out
    return int4_matmul_pallas(
        x, packed, scale, bk_cap=tuned.get("bk") or 2048,
        bn_cap=tuned.get("bn") or 2048, scheme=tuned.get("scheme"),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Dynamic-activation int8 kernel: s8×s8 MXU dots with int32 accumulation.
# The per-row activation scale and per-column weight scale both commute with
# the K reduction, so NO per-element dequant work remains in the kernel —
# the reference's ONNX-export semantics (DynamicQuantizeLinear +
# MatMulInteger + Cast + Mul, int8/qlinear.py:54-70) as a TPU fast path.
# ---------------------------------------------------------------------------

def _int8_dyn_kernel(xq_ref, xs_ref, w_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        xq_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * xs_ref[...] * s_ref[...]
        ).astype(o_ref.dtype)


def int8_dyn_matmul_pallas(x, w, scale, *, bk_cap=2048, bn_cap=2048, interpret=None):
    """Dynamic-activation-quantized int8 matmul.

    x (M, K) float → per-row symmetric int8; y = (xq @ w) · sx · scale.
    Introduces ~0.3-1% activation quantization error (a different numerics
    mode from weight-only — opt-in via TpuRuntimeConfig.dynamic_int8).
    """
    if interpret is None:
        interpret = not _is_tpu()
    M, K = x.shape
    K2, N = w.shape
    assert K == K2
    bk = _largest_divisor(K, 256, bk_cap) or _largest_divisor(K, 32, bk_cap)
    bn = _largest_divisor(N, 128, bn_cap)
    if bk is None or bn is None:
        return None

    xf = x.astype(jnp.float32)
    sx = jnp.clip(jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0, min=1e-10)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)

    bm = _block_m(M)
    xqp = _pad_rows(xq, bm)
    sxp = _pad_rows(sx, bm)
    Mp = xqp.shape[0]

    out = pl.pallas_call(
        _int8_dyn_kernel,
        grid=(Mp // bm, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m, n, k: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xqp, sxp, w, scale.astype(jnp.float32).reshape(1, N))
    return out[:M]


# ---------------------------------------------------------------------------
# Dynamic-activation int4g32 kernel (round 5): the int8-dyn trick applied to
# the packed int4 weights.  Motivation is the measured b≥32 crossover where
# int8 OVERTAKES int4 despite streaming 1.7× the bytes (r5_final_sweep:
# b64 4404 vs 3721 agg) — at high batch the binding wall is the int4
# ladder's per-element float dequant, not the weight stream.  Here the
# nibble unpack widens int4→int8 (a sign-extend, no int→float convert, no
# per-element multiply) and the group-32 partial dots run s8×s8 on the MXU
# with int32 accumulation; the group scale and the per-row activation scale
# both apply to (bm, bn) partials.  Dynamic activation quantization is a
# different numerics mode (~0.3-1% activation error) — opt-in via
# TpuRuntimeConfig.dynamic_int8, same as the int8 path (the reference's
# ONNX DynamicQuantizeLinear semantics, int8/qlinear.py:54-70).
# ---------------------------------------------------------------------------

def _int4_dyn_kernel(xq_ref, xs_ref, p_ref, s_ref, o_ref, acc_ref, *,
                     interpret, k_total):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = _unpack_tile_int4(p_ref[...], interpret)          # (bk, bn) int4
    bk, bn = q.shape
    w8 = q.astype(jnp.int8)
    gb = bk // 32
    xq = xq_ref[...]
    s = s_ref[...].astype(jnp.float32)
    if k_total % bk:
        # final K block overhangs storage: zero the activation columns and
        # scale rows there (int zeros are exact; w8 is always finite)
        valid = k_total - k * bk
        cols = jax.lax.broadcasted_iota(jnp.int32, xq.shape, 1)
        xq = jnp.where(cols < valid, xq, jnp.zeros_like(xq))
        srows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(srows * 32 < valid, s, jnp.zeros_like(s))
    total = jnp.zeros_like(acc_ref)
    for g in range(gb):
        pg = jax.lax.dot_general(
            xq[:, 32 * g:32 * (g + 1)], w8[32 * g:32 * (g + 1)],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        total += pg.astype(jnp.float32) * s[g][None, :]
    acc_ref[...] += total

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = (acc_ref[...] * xs_ref[...]).astype(o_ref.dtype)


def _dyn_quantize_rows(x):
    """Per-row symmetric int8 activation quantization (shared prologue)."""
    xf = x.astype(jnp.float32)
    sx = jnp.clip(jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0,
                  min=1e-10)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def int4_dyn_matmul_pallas(x, packed, scale, *, bk_cap=2048, bn_cap=2048,
                           interpret=None):
    """Dynamic-activation int4g32 matmul.

    x (M, K) float → per-row symmetric int8;
    y = Σ_g (xq_g @ unpack_s8(packed)_g) · scale_g · sx.
    Returns None when the shape is unsupported (caller falls back)."""
    if interpret is None:
        interpret = not _is_tpu()
    M, K2 = x.shape[0], packed.shape[0]
    K = 2 * K2
    N = packed.shape[1]
    xp = x if x.shape[1] == K else jnp.pad(x, ((0, 0), (0, K - x.shape[1])))
    bk = _pick_int4_bk(K, min(_BK_CAP or bk_cap, bk_cap))
    bn = _largest_divisor(N, 128, _BN_CAP or bn_cap)
    if bk is None or bn is None:
        return None
    bm = _block_m(M)
    xq, sx = _dyn_quantize_rows(xp)
    xqp = _pad_rows(xq, bm)
    sxp = _pad_rows(sx, bm)
    Mp = xqp.shape[0]

    out = pl.pallas_call(
        functools.partial(_int4_dyn_kernel, interpret=interpret, k_total=K),
        grid=(Mp // bm, N // bn, pl.cdiv(K, bk)),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k)),
            pl.BlockSpec((bm, 1), lambda m, n, k: (m, 0)),
            pl.BlockSpec((bk // 2, bn), lambda m, n, k: (k, n)),
            pl.BlockSpec((bk // 32, bn), lambda m, n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xqp, sxp, packed, scale)
    return out[:M]


def int8_dyn_matmul_pallas_idx(x, wstack, sstack, idx, *, bk_cap=2048,
                               bn_cap=2048, interpret=None):
    """Layer-indexed twin of :func:`int8_dyn_matmul_pallas` — the serving
    scan must never slice the stacked weights (round-4 lesson).

    wstack (L, K, N) int8, sstack (L, N), idx scalar int32."""
    if interpret is None:
        interpret = not _is_tpu()
    M, K = x.shape
    Lw, K2, N = wstack.shape
    assert K == K2, (K, K2)
    bk = _largest_divisor(K, 256, _BK_CAP or bk_cap) \
        or _largest_divisor(K, 32, bk_cap)
    bn = _largest_divisor(N, 128, _BN_CAP or bn_cap)
    if bk is None or bn is None:
        return None
    bm = _block_m(M)
    xq, sx = _dyn_quantize_rows(x)
    xqp = _pad_rows(xq, bm)
    sxp = _pad_rows(sx, bm)
    Mp = xqp.shape[0]
    s3 = sstack.astype(jnp.float32).reshape(Lw, 1, N)

    def kern(idx_ref, xq_ref, xs_ref, w_ref, s_ref, o_ref, acc_ref):
        del idx_ref  # consumed by the index maps
        _int8_dyn_kernel(xq_ref, xs_ref, w_ref.at[0], s_ref.at[0], o_ref,
                         acc_ref)

    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Mp // bm, N // bn, K // bk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda m, n, k, i: (m, k)),
                pl.BlockSpec((bm, 1), lambda m, n, k, i: (m, 0)),
                pl.BlockSpec((1, bk, bn), lambda m, n, k, i: (i[0], k, n)),
                pl.BlockSpec((1, 1, bn), lambda m, n, k, i: (i[0], 0, n)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, i: (m, n)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), xqp, sxp, wstack, s3)
    return out[:M]


def int4_dyn_matmul_pallas_idx(x, pstack, sstack, idx, *, bk_cap=2048,
                               bn_cap=2048, interpret=None):
    """Layer-indexed twin of :func:`int4_dyn_matmul_pallas` (the serving
    scan must never slice the stacked weights — round-4 lesson).  Untiled
    (L, K/2, N) stacks only; returns None otherwise."""
    if pstack.ndim != 3:
        return None
    if interpret is None:
        interpret = not _is_tpu()
    M = x.shape[0]
    Lw, K2, N = pstack.shape
    K = 2 * K2
    xp = x if x.shape[1] == K else jnp.pad(x, ((0, 0), (0, K - x.shape[1])))
    bk = _pick_int4_bk(K, min(_BK_CAP or bk_cap, bk_cap))
    bn = _largest_divisor(N, 128, _BN_CAP or bn_cap)
    if bk is None or bn is None:
        return None
    bm = _block_m(M)
    xq, sx = _dyn_quantize_rows(xp)
    xqp = _pad_rows(xq, bm)
    sxp = _pad_rows(sx, bm)
    Mp = xqp.shape[0]
    inner = functools.partial(_int4_dyn_kernel, interpret=interpret, k_total=K)

    def kern(idx_ref, xq_ref, xs_ref, p_ref, s_ref, o_ref, acc_ref):
        del idx_ref  # consumed by the index maps
        inner(xq_ref, xs_ref, p_ref.at[0], s_ref.at[0], o_ref, acc_ref)

    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Mp // bm, N // bn, pl.cdiv(K, bk)),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda m, n, k, i: (m, k)),
                pl.BlockSpec((bm, 1), lambda m, n, k, i: (m, 0)),
                pl.BlockSpec((1, bk // 2, bn), lambda m, n, k, i: (i[0], k, n)),
                pl.BlockSpec((1, bk // 32, bn), lambda m, n, k, i: (i[0], k, n)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, i: (m, n)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), xqp, sxp, pstack, sstack)
    return out[:M]
