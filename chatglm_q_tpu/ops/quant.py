"""Quantized weight representations: RTN quantizers, bit-packing, oracles.

Numerics re-create the reference exactly:
  * int8 per-out-channel symmetric RTN — /root/reference/chatglm_q/int8/quantizer.py:12-19
  * int4 group-32 symmetric RTN with +8 offset — int4/quantizer.py:13-29
  * int4 nibble unpack oracle — int4/qlinear.py:21-33

Layouts
-------
All linear weights here are stored K-major, i.e. ``(in_features K, out_features
N)`` — the natural layout for ``x @ w`` on the MXU.  (The reference stores int8
weights ``(N, K)`` and transposes per call, int8/qlinear.py:90; our loader
transposes once at load time.)

int8:    ``weight`` int8 ``(K, N)``;   ``weight_scale`` ``(N,)``.
int4g32: ``weight`` uint8 ``(K//2, N)`` packed two nibbles per byte;
         ``weight_scale`` ``(G=K//32, N)``.

Two nibble orders exist for int4:

* **reference order** (on-disk, int4/quantizer.py:28): byte row ``r`` packs
  ``k=2r`` (low nibble) and ``k=2r+1`` (high nibble) — K-adjacent pairs.
* **tpu order** (in-memory): same K-adjacent pairing, but nibbles hold the
  **two's-complement** value ``q & 0xF`` instead of the offset value
  ``q + 8``.  This is exactly the layout of a packed ``int4`` array on TPU,
  so the Pallas kernel unpacks a tile with a single Mosaic
  ``bitcast(uint8 (K/2, N) → int4 (K, N))`` — byte row ``i`` becomes int4
  rows ``2i`` (low nibble) and ``2i+1`` (high nibble) — and the shift/mask
  arithmetic of the reference's Triton kernel vanishes.

The two orders differ only by an XOR with ``0x88`` per byte
(``(q+8) mod 16 == (q & 0xF) ^ 0x8``), so reference↔tpu repacking is a
single vectorized involution.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

MAX_Q_INT8 = 127
MAX_Q_INT4 = 7
GROUP_K = 32  # int4 group size along K

# lm_head N padding target (65024 → 65536): applied only when N ≥ the
# multiple, so tiny test vocabularies stay unpadded
LMHEAD_N_MULTIPLE = 2048


def lmhead_pad(p: dict, quant_type: str) -> dict:
    """Pad the lm_head's vocab (N) dim to LMHEAD_N_MULTIPLE when large
    enough to benefit; callers slice logits back to vocab_size."""
    if quant_type == "none" or p["weight"].shape[-1] < LMHEAD_N_MULTIPLE:
        return p
    return pad_linear_n(p, quant_type, multiple=LMHEAD_N_MULTIPLE)

# int4 group scales are STORED in bfloat16 in HBM.  Rationale:
# * 16-bit storage keeps the (K/32, N) scale stream at 1/8 of the
#   packed-weight traffic (f32 storage costs +11% of HBM speed-of-light);
# * float16 — the reference checkpoints' on-disk dtype
#   (int4/quantizer.py) — is NOT loadable by Mosaic on TPU v5e: a local
#   v5e AOT compile of every int4 kernel fails with "Invalid vector type
#   for load" / "Unsupported cast: float16 -> bfloat16" on the f16 scale
#   tiles (verified round 3; f16 vector ops have no VPU support there);
# * the broadcast scheme multiplies scales in bf16 (``s.astype(x.dtype)``
#   with bf16 activations), where bf16 storage is numerically identical;
#   the grouped/bt_grouped schemes upcast scales to f32 for the partial
#   dots, so for a reference f16 checkpoint the one-time f16→bf16 load
#   rounding (≤2⁻⁸ relative on the scale) IS a real numerics change there
#   — accepted: it is the same magnitude as the bf16 weight-dequant
#   rounding all schemes already carry, and the parity suite pins it.
# On disk the reference f16 format is preserved (loader.py converts both
# ways), so checkpoint interop is unchanged.  Quantization grids are still
# computed against f32 scales (grid parity with the reference's f32 runs).
SCALE_DTYPE = jnp.bfloat16


# ---------------------------------------------------------------------------
# RTN quantizers (jnp; usable under jit)
# ---------------------------------------------------------------------------

def rtn_quantize_int8(w_kn: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-out-channel int8 RTN over a (K, N) weight.

    Returns (q (K, N) int8, scale (N,) f32).  Matches int8/quantizer.py:12-19
    applied to the (N, K) transpose.
    """
    w = w_kn.astype(jnp.float32)
    w_max = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.clip(w_max / MAX_Q_INT8, min=1e-10)
    q = jnp.clip(jnp.round(w / scale), -MAX_Q_INT8, MAX_Q_INT8).astype(jnp.int8)
    return q, scale


def rtn_quantize_int4(
    w_kn: jax.Array, group_k: int = GROUP_K
) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-(group-of-K × out-channel) int4 RTN over a (K, N) weight.

    Returns (q (K, N) int8 in [-7, 7], scale (G, N) f32).
    Matches int4/quantizer.py:13-24 before packing.
    """
    K, N = w_kn.shape
    assert K % group_k == 0, f"{K=} {group_k=}"
    G = K // group_k
    w = w_kn.astype(jnp.float32).reshape(G, group_k, N)
    w_max = jnp.max(jnp.abs(w), axis=1, keepdims=True)
    scale = jnp.clip(w_max / MAX_Q_INT4, min=1e-10)
    q = jnp.clip(jnp.round(w / scale), -MAX_Q_INT4, MAX_Q_INT4).astype(jnp.int8)
    return q.reshape(K, N), scale.reshape(G, N)


def quantize_with_scale_int8(w_kn: jax.Array, scale_n: jax.Array) -> jax.Array:
    """(K, N) weight → int8 grid with a fixed (N,) scale (int8/quantizer.py:29-30)."""
    q = jnp.round(w_kn.astype(jnp.float32) / scale_n.astype(jnp.float32))
    return jnp.clip(q, -MAX_Q_INT8, MAX_Q_INT8).astype(jnp.int8)


def quantize_with_scale_int4(w_kn: jax.Array, scale_gn: jax.Array) -> jax.Array:
    """(K, N) weight → int4 grid values in [-7, 7] with fixed (G, N) scales
    (int4/quantizer.py:39-48 before packing)."""
    K, N = w_kn.shape
    G = scale_gn.shape[0]
    assert K % G == 0
    w = w_kn.astype(jnp.float32).reshape(G, K // G, N)
    q = jnp.round(w / scale_gn.astype(jnp.float32)[:, None, :])
    return jnp.clip(q, -MAX_Q_INT4, MAX_Q_INT4).astype(jnp.int8).reshape(K, N)


# ---------------------------------------------------------------------------
# int4 nibble packing — reference order and tpu order
# ---------------------------------------------------------------------------

def pack_int4_ref(q_kn) -> jax.Array:
    """[-7,7] int grid (K, N) → reference-order packed uint8 (K//2, N)
    (int4/quantizer.py:25-29)."""
    u = (q_kn.astype(jnp.int32) + 0x8).astype(jnp.uint8)
    return (u[::2, :] & 0xF) | ((u[1::2, :] & 0xF) << 4)


def unpack_int4_ref(packed, scale):
    """Reference-order packed (K//2, N) + scale (G, N) → dequantized (K, N) f32.

    Oracle matching int4/qlinear.py:21-33 (``unpack_int4``).
    """
    K2, N = packed.shape
    K = K2 * 2
    G = scale.shape[0]
    p = packed.astype(jnp.int32)
    lo = (p & 0xF) - 0x8
    hi = ((p >> 4) & 0xF) - 0x8
    q = jnp.stack([lo, hi], axis=1).reshape(K, N)  # interleave K-adjacent pairs
    q = q.reshape(G, K // G, N).astype(jnp.float32) * scale.astype(jnp.float32)[:, None, :]
    return q.reshape(K, N)


def pack_int4_tpu(q_kn) -> jax.Array:
    """[-7,7] int grid (K, N) → tpu-order packed uint8 (K//2, N).

    Byte row ``i`` holds ``k=2i`` (low nibble) and ``k=2i+1`` (high nibble)
    as **two's-complement** nibbles — bit-identical to a packed int4 array,
    so the Pallas kernel unpacks a tile with a single Mosaic bitcast.
    """
    K, N = q_kn.shape
    assert K % 2 == 0
    u = (q_kn.astype(jnp.int32) & 0xF).astype(jnp.uint8)
    return u[0::2, :] | (u[1::2, :] << 4)


def _sign_extend_nibble(v):
    """4-bit two's-complement value in [0, 15] → signed int in [-8, 7]."""
    return jnp.bitwise_xor(v, 0x8) - 0x8


def unpack_int4_tpu(packed, scale):
    """tpu-order packed (K//2, N) + scale (G, N) → dequantized (K, N) f32.

    This jnp formulation is both the CPU/fallback compute path and the test
    oracle for the Pallas kernel (the reference uses the same dual-role
    pattern, int4/qlinear.py:47-51).
    """
    K2, N = packed.shape
    K = K2 * 2
    G = scale.shape[0]
    p = packed.astype(jnp.int32)
    lo = _sign_extend_nibble(p & 0xF)
    hi = _sign_extend_nibble((p >> 4) & 0xF)
    q = jnp.stack([lo, hi], axis=1).reshape(K, N)  # K-adjacent interleave
    q = q.reshape(G, K // G, N).astype(jnp.float32) * scale.astype(jnp.float32)[:, None, :]
    return q.reshape(K, N)


def repack_ref_to_tpu(packed_ref: np.ndarray) -> np.ndarray:
    """Reference-order packed uint8 → tpu order (numpy, load time).

    The reference's offset-8 nibble and the two's-complement nibble differ
    by XOR 0x8, so the whole-byte transform is ``^ 0x88`` (an involution).
    """
    return packed_ref ^ np.uint8(0x88)


def repack_tpu_to_ref(packed_tpu: np.ndarray) -> np.ndarray:
    """tpu-order packed uint8 → reference order (numpy, save time)."""
    return packed_tpu ^ np.uint8(0x88)


# ---------------------------------------------------------------------------
# Whole-layer quantize helpers (produce in-memory param dicts)
# ---------------------------------------------------------------------------

def pad_int8_weight(q: jax.Array) -> jax.Array:
    """Zero-pad an int8 (K, N) weight's K to the kernel-aligned storage size
    (see int4_storage_k — same rule; zero rows are exact no-ops)."""
    K = q.shape[0]
    Ks = int4_storage_k(K)
    if Ks == K:
        return q
    return jnp.pad(q, ((0, Ks - K), (0, 0)))


def pad_linear_n(p: dict, quant_type: str = "", multiple: int | None = None) -> dict:
    """Zero-pad a quantized linear param dict's output (N) dimension to the
    kernel-aligned storage size (default: the K rule, int4_storage_k; or an
    explicit ``multiple`` — the lm_head pads 65024 → 65536 so the widest
    matmul tiles at bn 2048 instead of 512).  ``quant_type`` is accepted
    for call-site symmetry but unused: the rule dispatches on the params'
    own shapes/dtypes (scale ndim).

    Only valid where the consumer tolerates extra zero outputs — the ffn
    w_in_h / w_in_gate pair (padded columns produce silu(0)*0 = 0
    activations flowing into the equally padded w_out K rows) and the
    lm_head (padded logits are sliced off before loss/sampling,
    models/chatglm2.py).  Padded scale entries are 1.0, padded bias 0.
    """
    w = p["weight"]
    N = w.shape[-1]
    Ns = ((N + multiple - 1) // multiple) * multiple if multiple else int4_storage_k(N)
    if Ns == N:
        return p
    pad = Ns - N
    out = {"weight": jnp.pad(w, ((0, 0), (0, pad)))}
    if "weight_scale" in p:
        sc = p["weight_scale"]
        if sc.ndim == 1:  # int8 (N,)
            out["weight_scale"] = jnp.pad(sc, (0, pad), constant_values=1.0)
        else:             # int4 (G, N)
            out["weight_scale"] = jnp.pad(sc, ((0, 0), (0, pad)), constant_values=1.0)
    if "bias" in p:
        out["bias"] = jnp.pad(p["bias"], (0, pad))
    return out


def quantize_linear_int8(w_kn, bias=None) -> dict:
    q, scale = rtn_quantize_int8(w_kn)
    p = {"weight": pad_int8_weight(q), "weight_scale": scale}
    if bias is not None:
        p["bias"] = bias
    return p


def int4_storage_k(K: int) -> int:
    """In-memory K for int4 linear weights.

    The Pallas kernels tile K in multiples of 256 (scale-block sublane
    alignment); a K with no such divisor ≤1024 (e.g. the ChatGLM2 inner dim
    13696 = 128·107) is stored zero-padded to the next multiple of 512 —
    Mosaic compiles overhanging partial blocks pathologically slowly
    (measured ~10× compile time), and zero rows contribute nothing to the
    matmul.  Activations are zero-padded to match at call time
    (ops/linear.py); the loader strips the padding on save.
    """
    if K <= 512:
        return K
    d = 256
    while d <= min(K, 1024):
        if K % d == 0:
            return K
        d += 256
    return ((K + 511) // 512) * 512


def pad_packed_int4(packed: jax.Array, scale: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Pad a (K/2, N) packed + (K/32, N) scale pair to the storage K.

    Padded nibbles are 0 (two's-complement zero) and padded scales 1.0, so
    the padded rows dequantize to exactly 0.
    """
    K = packed.shape[0] * 2
    Ks = int4_storage_k(K)
    if Ks == K:
        return packed, scale
    packed = jnp.pad(packed, ((0, (Ks - K) // 2), (0, 0)))
    scale = jnp.pad(scale, ((0, (Ks - K) // 32), (0, 0)), constant_values=1.0)
    return packed, scale


def quantize_linear_int4(w_kn, bias=None) -> dict:
    q, scale = rtn_quantize_int4(w_kn)
    packed, scale = pad_packed_int4(pack_int4_tpu(q), scale)
    p = {"weight": packed, "weight_scale": scale.astype(SCALE_DTYPE)}
    if bias is not None:
        p["bias"] = bias
    return p


def quantize_embedding_int8(w_vh) -> dict:
    """Embedding table (V, H) → int8 with per-embedding-dim scale.

    Matches int8/quantizer.py:45-52: quantize the transpose so the scale is
    per H dim; stored back as (V, H) int8 + (H,) scale.
    """
    # rtn_quantize_int8 reduces over axis 0; passing (V, H) gives a max over
    # V per embedding dim, i.e. per-H scales.
    q, scale = rtn_quantize_int8(w_vh)
    return {"weight": q, "weight_scale": scale}


def quantize_embedding_int4(w_vh) -> dict:
    """Embedding table (V, H) → int4 packed along V in *reference* nibble
    order with (V//32, H) scales (int4/quantizer.py:68-75).

    Embedding lookup is a gather (no matmul kernel), so the reference layout
    is kept in memory; adjacent token ids share a byte.
    """
    q, scale = rtn_quantize_int4(w_vh)  # groups along V
    return {"weight": pack_int4_ref(q), "weight_scale": scale}


def embedding_lookup_int8(params: dict, ids, dtype=jnp.float32):
    """Gather first, then dequantize only the gathered rows — per-token, like
    int8/qlinear.py:110-120 (QEmbedding).  Scaling the whole table before the
    gather would materialize a (V, H) bf16 intermediate (~0.5 GB at 6B)
    unless XLA happens to fuse the multiply into the gather."""
    rows = params["weight"][ids].astype(dtype)
    return rows * params["weight_scale"].astype(dtype)


def embedding_lookup_int4(params: dict, ids, dtype=jnp.float32):
    """Per-token nibble unpack at lookup, matching int4/qlinear.py:122-130."""
    packed = params["weight"]
    scale = params["weight_scale"]
    group_idx = ids // GROUP_K
    byte_idx = ids // 2
    shifts = (ids % 2) * 4
    bytes_ = packed[byte_idx].astype(jnp.int32)
    nib = ((bytes_ >> shifts[..., None]) & 0xF) - 0x8
    return nib.astype(dtype) * scale[group_idx].astype(dtype)


# ---------------------------------------------------------------------------
# Tiled serving layout (round 4): column-block the STACKED int4 weights so
# every kernel block DMA is one contiguous HBM span.  The standard
# (L, K/2, N) layout makes a (bk/2, bn) block a bn-byte-strided column
# slice — measured at ~91% of achievable DMA rate at the decode shapes
# (int4_dma_contig 16.09 vs 17.61 us).  Tiling fixes the kernel bn to the
# stored tile width; numerics are identical (pure layout).
# ---------------------------------------------------------------------------

def tile_int4_stack(pstack, sstack, bn: int = 1024):
    """(L, K/2, N), (L, G, N) → (L, N/bn, K/2, bn), (L, N/bn, G, bn);
    None when N is not a multiple of bn (caller keeps the flat layout)."""
    L, K2, N = pstack.shape
    if N % bn or N < bn:
        return None
    p = pstack.reshape(L, K2, N // bn, bn).transpose(0, 2, 1, 3)
    s = sstack.reshape(L, sstack.shape[1], N // bn, bn).transpose(0, 2, 1, 3)
    return p, s


def untile_int4_stack_layer(p4, s4, idx):
    """One layer of the tiled layout back to (K/2, N), (G, N) — the
    non-Pallas fallback path."""
    p = p4[idx].transpose(1, 0, 2).reshape(p4.shape[2], -1)
    s = s4[idx].transpose(1, 0, 2).reshape(s4.shape[2], -1)
    return p, s
