"""Pallas flash/ragged attention kernels for MQA (grouped KV) on TPU.

The reference materializes a (B, S, S) additive mask and runs naive O(S²)
attention (model.py:166-173, :311-317), capping context at 8192.  These
kernels re-create attention the TPU way:

* :func:`flash_attention_prefill` — blockwise (online-softmax) causal
  attention; the mask is computed on the fly from block indices, never
  materialized; KV tiles above the causal diagonal are skipped entirely.
  MQA-aware: the ``Hg`` query heads of a KV group are folded into the
  row dimension of the Q tile, so one kernel invocation serves all heads
  sharing a K/V (the reference broadcasts over a size-1 axis instead,
  model.py:143-146).
* :func:`flash_attention_decode` — single-token ragged attention over a
  preallocated cache with per-row lengths: KV blocks at or beyond a row's
  length are skipped (no DMA, no compute), so decode cost is O(length),
  not O(S_max).

Both are tested against the jnp masked-softmax oracle (the model's XLA
fallback path) in interpret mode on CPU and compiled on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Prefill: blockwise causal attention (right-padded rows, per-row lengths)
# ---------------------------------------------------------------------------

def _prefill_kernel(
    lengths_ref,  # SMEM (B,)
    starts_ref,   # SMEM (B,) — query-position offset (chunked prefill)
    rmap_ref,     # SMEM (B,) — q row → kv row (compact chunk batches)
    q_ref,        # (1, 1, bq*Hg, D)
    k_ref,        # (1, 1, bk, D)
    v_ref,        # (1, 1, bk, D)
    o_ref,        # (1, 1, bq*Hg, D)
    m_ref,        # scratch (bq*Hg, 128) f32
    l_ref,        # scratch (bq*Hg, 128) f32
    acc_ref,      # scratch (bq*Hg, D) f32
    *,
    hg: int,
    bq: int,
    bk: int,
    sm_scale: float,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    length = lengths_ref[b]
    # causal block skip: lowest q ABSOLUTE position in this tile is
    # start + qi*bq; a kv tile starting beyond the tile's last position
    # contributes nothing
    first_q = starts_ref[b] + qi * bq
    last_q = first_q + bq - 1

    @pl.when((ki * bk <= last_q) & (ki * bk < length))
    def _():
        q = q_ref[0, 0]                       # (bq*Hg, D)
        k = k_ref[0, 0]                       # (bk, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale                          # (bq*Hg, bk)

        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // hg + first_q  # absolute q positions
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * bk
        mask = (cols <= rows) & (cols < length)
        s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_ref[...][:, :1]
        l_prev = l_ref[...][:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

        v = v_ref[0, 0]                       # (bk, D)
        o_curr = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + o_curr

    @pl.when(ki == pl.num_programs(3) - 1)
    def _():
        l = l_ref[...][:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[...] / l).astype(o_ref.dtype)


def flash_attention_prefill(
    q: jax.Array,        # (B, S, G, Hg, D)
    k: jax.Array,        # (B, G, T, D) — serving cache layout, T ≥ S
    v: jax.Array,        # (B, G, T, D)
    lengths: jax.Array,  # (B,) int32
    sm_scale: float,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool | None = None,
    q_starts: jax.Array | None = None,  # (B,) — chunked prefill offsets
    kv_row_map: jax.Array | None = None,  # (B,) — q row b reads KV row map[b]
) -> jax.Array:
    """Causal masked softmax(q·kᵀ·scale)·v with per-row valid lengths.

    Returns (B, S, G, Hg, D).  Query position s attends kv positions ≤ s
    that are < lengths[b] (matching the serving-mode mask in
    models/chatglm2.py prefill).  K/V arrive in the cache's (B, G, T, D)
    layout — no relayout copy on the way into the kernel.

    With ``q_starts``, query row r of batch b sits at ABSOLUTE position
    ``q_starts[b] + r`` (chunked prefill: this chunk's S new queries attend
    the whole cache below them); ``lengths`` is then the total valid cache
    length including this chunk, and KV blocks span the cache up to the
    highest causal position (skipped raggedly per row).

    With ``kv_row_map``, q batch row b attends KV batch row
    ``kv_row_map[b]`` — the block index maps resolve the indirection, so a
    COMPACT chunk batch (only the slots mid-prefill) runs against the full
    engine cache with zero row copies.
    """
    if interpret is None:
        interpret = not _is_tpu()
    B, S, G, Hg, D = q.shape
    # cap the Q tile at ~512 ROWS (positions × folded heads): Mosaic compile
    # time degrades sharply on multi-thousand-row blocks (measured)
    bq = max(8 // Hg or 1, min(block_q, S, 512 // Hg or 1))
    T_kv = S if q_starts is None else k.shape[2]
    bk = min(block_k, T_kv)
    while S % bq:
        bq //= 2
    while T_kv % bk:
        bk //= 2
    if q_starts is None:
        starts = jnp.zeros((B,), jnp.int32)
    else:
        starts = q_starts.astype(jnp.int32)
    if kv_row_map is None:
        rmap = jnp.arange(B, dtype=jnp.int32)
    else:
        rmap = kv_row_map.astype(jnp.int32)

    # fold heads into q rows: (B, G, S, Hg, D) → (B, G, S*Hg, D)
    qf = q.transpose(0, 2, 1, 3, 4).reshape(B, G, S * Hg, D)
    kf = k
    vf = v

    grid = (B, G, S // bq, T_kv // bk)
    out = pl.pallas_call(
        functools.partial(
            _prefill_kernel, hg=Hg, bq=bq, bk=bk, sm_scale=sm_scale
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, bq * Hg, D), lambda b, g, qi, ki, *_: (b, g, qi, 0)
                ),
                pl.BlockSpec((1, 1, bk, D),
                             lambda b, g, qi, ki, lens, sts, rm: (rm[b], g, ki, 0)),
                pl.BlockSpec((1, 1, bk, D),
                             lambda b, g, qi, ki, lens, sts, rm: (rm[b], g, ki, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bq * Hg, D), lambda b, g, qi, ki, *_: (b, g, qi, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((bq * Hg, 128), jnp.float32),
                pltpu.VMEM((bq * Hg, 128), jnp.float32),
                pltpu.VMEM((bq * Hg, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, G, S * Hg, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), starts, rmap, qf, kf, vf)

    return out.reshape(B, G, S, Hg, D).transpose(0, 2, 1, 3, 4)


# ---------------------------------------------------------------------------
# Decode: single-token ragged attention over the preallocated cache
# ---------------------------------------------------------------------------

def _decode_kernel(
    lengths_ref,  # SMEM (B,)
    q_ref,        # (1, 1, Hg, D)
    k_ref,        # (1, 1, bk, D)
    v_ref,        # (1, 1, bk, D)
    o_ref,        # (1, 1, Hg, D)
    *rest,        # [m_out (1,1,Hg,128), l_out] when return_lse; scratches
    bk: int,
    sm_scale: float,
    return_lse: bool = False,
    stacked: bool = False,  # k/v blocks carry a leading layer dim (idx path)
):
    if return_lse:
        m_out, l_out, m_ref, l_ref, acc_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # valid kv slots: 0 .. lengths[b] inclusive (current token already written)
    n_valid = lengths_ref[b] + 1

    @pl.when(ki * bk < n_valid)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0, 0] if stacked else k_ref[0, 0]
        if k.dtype != q.dtype:  # fp8 cache: cast AFTER the DMA (idx path
            k = k.astype(q.dtype)  # feeds the stored dtype straight in)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale

        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * bk
        s = jnp.where(cols < n_valid, s, MASK_VALUE)

        m_prev = m_ref[...][:, :1]
        l_prev = l_ref[...][:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

        v = v_ref[0, 0, 0] if stacked else v_ref[0, 0]
        if v.dtype != q.dtype:
            v = v.astype(q.dtype)
        o_curr = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + o_curr

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        l = l_ref[...][:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[...] / l).astype(o_ref.dtype)
        if return_lse:
            m_out[0, 0] = m_ref[...]
            l_out[0, 0] = l_ref[...]


def flash_attention_decode(
    q: jax.Array,        # (B, G, Hg, D) — one new token per row
    k: jax.Array,        # (B, G, T, D) cache (current token already written)
    v: jax.Array,        # (B, G, T, D)
    lengths: jax.Array,  # (B,) int32 — cache length BEFORE this token
    sm_scale: float,
    block_k: int = 512,
    interpret: bool | None = None,
    return_lse: bool = False,
):
    """Ragged decode attention: row b attends cache slots ≤ lengths[b].

    KV blocks beyond the valid length are skipped, making the per-token
    cost O(length) instead of O(T).  Returns (B, G, Hg, D); with
    ``return_lse`` also the online-softmax running max ``m`` and sum ``l``
    (each (B, G, Hg)) so partial results over a sequence-sharded cache can
    be merged exactly (flash_attention_decode_kv_tsharded).
    """
    if interpret is None:
        interpret = not _is_tpu()
    B, G, Hg, D = q.shape
    T = k.shape[2]
    bk = min(block_k, T)
    while T % bk:
        bk //= 2

    grid = (B, G, T // bk)
    out_specs = [pl.BlockSpec((1, 1, Hg, D), lambda b, g, ki, *_: (b, g, 0, 0))]
    out_shapes = [jax.ShapeDtypeStruct((B, G, Hg, D), q.dtype)]
    if return_lse:
        out_specs += [
            pl.BlockSpec((1, 1, Hg, 128), lambda b, g, ki, *_: (b, g, 0, 0)),
            pl.BlockSpec((1, 1, Hg, 128), lambda b, g, ki, *_: (b, g, 0, 0)),
        ]
        out_shapes += [jax.ShapeDtypeStruct((B, G, Hg, 128), jnp.float32)] * 2

    res = pl.pallas_call(
        functools.partial(_decode_kernel, bk=bk, sm_scale=sm_scale,
                          return_lse=return_lse),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, Hg, D), lambda b, g, ki, *_: (b, g, 0, 0)),
                # clamp the KV block index to the row's LAST VALID block:
                # Pallas only issues a copy when the index-map output
                # changes between steps, so the repeated index elides the
                # DMA for masked blocks — without it every step streams the
                # full T_max cache and the O(length) claim is false (the
                # pl.when in the kernel gates only compute, never copies)
                pl.BlockSpec((1, 1, bk, D),
                             lambda b, g, ki, lens: (
                                 b, g, jnp.minimum(ki, lens[b] // bk), 0)),
                pl.BlockSpec((1, 1, bk, D),
                             lambda b, g, ki, lens: (
                                 b, g, jnp.minimum(ki, lens[b] // bk), 0)),
            ],
            out_specs=tuple(out_specs) if return_lse else out_specs[0],
            scratch_shapes=[
                pltpu.VMEM((Hg, 128), jnp.float32),
                pltpu.VMEM((Hg, 128), jnp.float32),
                pltpu.VMEM((Hg, D), jnp.float32),
            ],
        ),
        out_shape=tuple(out_shapes) if return_lse else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, k, v)
    if return_lse:
        out, m, l = res
        return out, m[..., 0], l[..., 0]
    return res


# ---------------------------------------------------------------------------
# Layer-indexed decode path (round 5): the serving layer-scan carries the
# FULL (L, B, G, T, D) cache; slicing layer slabs out for the attention
# kernel and back in for the write materializes XLA copies that scale with
# batch (profiled at b16: 4 slab extracts + 2 slab write-backs + a serial
# per-row while write loop ≈ 4.9 ms/step — docs/RESULTS.md round 5).  The
# same trick that fixed the weights in round 4 fixes the cache: scalar-
# prefetched layer index in the BlockSpec index maps, so blocks DMA
# straight from/to the stacked cache and the write aliases in place.
# ---------------------------------------------------------------------------

def _decode_kernel_idx(lengths_ref, layer_ref, *args, **kw):
    # the layer scalar is consumed by the BlockSpec index maps only
    return _decode_kernel(lengths_ref, *args, **kw)


def flash_attention_decode_idx(
    q: jax.Array,        # (B, G, Hg, D) — one new token per row
    k: jax.Array,        # (L, B, G, T, D) stacked cache (token already written)
    v: jax.Array,        # (L, B, G, T, D)
    layer: jax.Array,    # scalar int32 — which layer slab to attend
    lengths: jax.Array,  # (B,) int32 — cache length BEFORE this token
    sm_scale: float,
    block_k: int = 512,
    interpret: bool | None = None,
):
    """flash_attention_decode reading layer ``layer`` of the stacked cache
    directly (no (B, G, T, D) slab copy as the kernel operand)."""
    if interpret is None:
        interpret = not _is_tpu()
    B, G, Hg, D = q.shape
    T = k.shape[3]
    bk = min(block_k, T)
    while T % bk:
        bk //= 2

    grid = (B, G, T // bk)
    res = pl.pallas_call(
        functools.partial(_decode_kernel_idx, bk=bk, sm_scale=sm_scale,
                          return_lse=False, stacked=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # lengths, layer
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, Hg, D), lambda b, g, ki, *_: (b, g, 0, 0)),
                # same masked-block index clamp as flash_attention_decode,
                # with the layer coordinate prefetched
                pl.BlockSpec((1, 1, 1, bk, D),
                             lambda b, g, ki, lens, lay: (
                                 lay[0], b, g,
                                 jnp.minimum(ki, lens[b] // bk), 0)),
                pl.BlockSpec((1, 1, 1, bk, D),
                             lambda b, g, ki, lens, lay: (
                                 lay[0], b, g,
                                 jnp.minimum(ki, lens[b] // bk), 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, Hg, D),
                                   lambda b, g, ki, *_: (b, g, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((Hg, 128), jnp.float32),
                pltpu.VMEM((Hg, 128), jnp.float32),
                pltpu.VMEM((Hg, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, G, Hg, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), jnp.reshape(layer, (1,)).astype(jnp.int32),
      q, k, v)
    return res


_KV_WRITE_ROWS = 8  # aligned sublane window around the written slot


def _kv_write_kernel(starts_ref, layer_ref, new_ref, cache_in_ref,
                     cache_out_ref):
    b = pl.program_id(0)
    G, R, D = cache_in_ref.shape[2:]
    blk = cache_in_ref[0, 0]                       # (G, R, D)
    n = new_ref[0].astype(blk.dtype)               # (G, D)
    r = starts_ref[b] % _KV_WRITE_ROWS
    mask = jax.lax.broadcasted_iota(jnp.int32, (G, R, D), 1) == r
    cache_out_ref[0, 0] = jnp.where(mask, n[:, None, :], blk)


def kv_cache_write_idx(
    cache: jax.Array,    # (L, B, G, T, D)
    new: jax.Array,      # (B, G, D) — one token per row
    layer: jax.Array,    # scalar int32
    starts: jax.Array,   # (B,) int32 — slot to write for each row
    interpret: bool | None = None,
):
    """Write one token per row into the stacked cache IN PLACE
    (input_output_aliases) — replaces the slab-extract / per-row-loop /
    slab-write-back sequence XLA builds for the same update.  Each grid
    program round-trips one aligned 8-row (G, 8, D) window (4 KB) and
    selects the written slot in; every other cache byte is untouched
    aliased input."""
    if interpret is None:
        interpret = not _is_tpu()
    L, B, G, T, D = cache.shape
    R = _KV_WRITE_ROWS

    grid = (B,)
    return pl.pallas_call(
        _kv_write_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # starts, layer
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, G, D), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((1, 1, G, R, D),
                             lambda b, starts, lay: (
                                 lay[0], b, 0, starts[b] // R, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, G, R, D),
                                   lambda b, starts, lay: (
                                       lay[0], b, 0, starts[b] // R, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        # inputs are [starts, layer, new, cache]; alias cache -> output
        input_output_aliases={3: 0},
        interpret=interpret,
    )(starts.astype(jnp.int32), jnp.reshape(layer, (1,)).astype(jnp.int32),
      new, cache)


def _pool_write_kernel(starts_ref, layer_ref, pt_ref, new_ref, pool_in_ref,
                       pool_out_ref, *, cap):
    b = pl.program_id(0)
    G, R, D = pool_in_ref.shape[2:]
    blk = pool_in_ref[0, 0]                        # (G, R, D)
    n = new_ref[0].astype(blk.dtype)               # (G, D)
    r = jnp.minimum(starts_ref[b], cap - 1) % _KV_WRITE_ROWS
    mask = jax.lax.broadcasted_iota(jnp.int32, (G, R, D), 1) == r
    pool_out_ref[0, 0] = jnp.where(mask, n[:, None, :], blk)


def kv_pool_write_idx(
    pool: jax.Array,       # (L, NP, G, P, D) paged pool
    new: jax.Array,        # (B, G, D) — one token per row
    layer: jax.Array,      # scalar int32
    page_table: jax.Array, # (B, MP) int32
    starts: jax.Array,     # (B,) int32 — logical position per row
    interpret: bool | None = None,
):
    """Paged twin of :func:`kv_cache_write_idx`: the BlockSpec index map
    resolves the physical page from the scalar-prefetched page table, so
    the decode write is one in-place aligned 8-row window per row — no
    per-row dynamic_update_slice chain on the (L, NP, G, P, D) pool.
    Positions past the table capacity clamp to the last slot (the dense
    path's over-generation semantics).  None when the page size doesn't
    tile (caller falls back)."""
    if interpret is None:
        interpret = not _is_tpu()
    L, NP, G, P, D = pool.shape
    R = _KV_WRITE_ROWS
    if P % R:
        return None
    MP = page_table.shape[1]
    cap = MP * P

    def pool_map(b, starts, lay, pt):
        pos = jnp.minimum(starts[b], cap - 1)
        return (lay[0], pt[b, pos // P], 0, (pos % P) // R, 0)

    return pl.pallas_call(
        functools.partial(_pool_write_kernel, cap=cap),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,   # starts, layer, page_table
            grid=(new.shape[0],),
            in_specs=[
                pl.BlockSpec((1, G, D), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((1, 1, G, R, D), pool_map),
            ],
            out_specs=pl.BlockSpec((1, 1, G, R, D), pool_map),
        ),
        out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        # inputs are [starts, layer, page_table, new, pool]; alias pool
        input_output_aliases={4: 0},
        interpret=interpret,
    )(starts.astype(jnp.int32), jnp.reshape(layer, (1,)).astype(jnp.int32),
      page_table.astype(jnp.int32), new, pool)


# ---------------------------------------------------------------------------
# shard_map wrappers: flash kernels under tensor/data parallelism.
# pallas_call has no GSPMD partitioning rules, so under a mesh the kernels
# are mapped per-device: q heads shard over the model axis (matching the
# column-parallel q_proj layout, parallel/sharding.py), KV is replicated
# (it comes from the replicated kv_proj), batch shards over the data axis.
# ---------------------------------------------------------------------------

def _mesh_divides(mesh, data_axis, model_axis, batch, hg) -> bool:
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    return (
        batch % sizes.get(data_axis, 1) == 0
        and hg % sizes.get(model_axis, 1) == 0
    )


def flash_attention_prefill_sharded(
    q, k, v, lengths, sm_scale, mesh, block_q=256, block_k=512,
    data_axis="data", model_axis="model",
):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if not _mesh_divides(mesh, data_axis, model_axis, q.shape[0], q.shape[3]):
        # shapes not splittable over this mesh: run the kernel unsharded
        # (GSPMD replicates operands; correct, just not head-parallel)
        return flash_attention_prefill(q, k, v, lengths, sm_scale, block_q, block_k)

    q_spec = P(data_axis, None, None, model_axis, None)
    kv_spec = P(data_axis, None, None, None)

    fn = shard_map(
        lambda q, k, v, l: flash_attention_prefill(
            q, k, v, l, sm_scale, block_q, block_k
        ),
        mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, P(data_axis)),
        out_specs=q_spec,
        check_vma=False,
    )
    return fn(q, k, v, lengths)


def flash_attention_decode_sharded(
    q, k, v, lengths, sm_scale, mesh, block_k=512,
    data_axis="data", model_axis="model",
):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if not _mesh_divides(mesh, data_axis, model_axis, q.shape[0], q.shape[2]):
        return flash_attention_decode(q, k, v, lengths, sm_scale, block_k)

    q_spec = P(data_axis, None, model_axis, None)
    kv_spec = P(data_axis, None, None, None)

    fn = shard_map(
        lambda q, k, v, l: flash_attention_decode(q, k, v, l, sm_scale, block_k),
        mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, P(data_axis)),
        out_specs=q_spec,
        check_vma=False,
    )
    return fn(q, k, v, lengths)


def flash_attention_decode_idx_sharded(
    q, k, v, layer, lengths, sm_scale, mesh, block_k=512,
    data_axis="data", model_axis="model",
):
    """Sharded twin of :func:`flash_attention_decode_idx`: batch over the
    data axis (matching kv_cache_pspecs' stacked (L, B, G, T, D) layout),
    query heads over the model axis.  None when the mesh doesn't divide
    (caller falls back to the slab path)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if not _mesh_divides(mesh, data_axis, model_axis, q.shape[0], q.shape[2]):
        return None

    q_spec = P(data_axis, None, model_axis, None)
    kv_spec = P(None, data_axis, None, None, None)

    fn = shard_map(
        lambda q, k, v, lay, l: flash_attention_decode_idx(
            q, k, v, lay[0], l, sm_scale, block_k),
        mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, P(), P(data_axis)),
        out_specs=q_spec,
        check_vma=False,
    )
    return fn(q, k, v, jnp.reshape(layer, (1,)), lengths)


def kv_cache_write_idx_sharded(
    cache, new, layer, starts, mesh, data_axis="data", model_axis="model",
):
    """Sharded twin of :func:`kv_cache_write_idx` (batch over data axis).
    None when the mesh doesn't divide the batch."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if new.shape[0] % sizes.get(data_axis, 1):
        return None

    c_spec = P(None, data_axis, None, None, None)
    fn = shard_map(
        lambda c, n, lay, s: kv_cache_write_idx(c, n, lay[0], s),
        mesh=mesh,
        in_specs=(c_spec, P(data_axis, None, None), P(), P(data_axis)),
        out_specs=c_spec,
        check_vma=False,
    )
    return fn(cache, new, jnp.reshape(layer, (1,)), starts)


# ---------------------------------------------------------------------------
# Decode v2: O(length) KV reads via manual double-buffered DMA with a
# dynamic in-kernel trip count (paged-attention structure over contiguous
# "pages").  The (B, G, T, D) cache layout makes every DMA a contiguous
# full-width (bk, D) row range.  Enabled via TpuRuntimeConfig.decode_attn_v2.
# ---------------------------------------------------------------------------

def _decode_v2_kernel(lengths_ref, q_ref, k_hbm, v_hbm, o_ref,
                      kbuf, vbuf, acc_ref, sems, *, bk, hg, d):
    b = pl.program_id(0)
    g = pl.program_id(1)
    n_valid = lengths_ref[b] + 1
    n_blocks = jax.lax.div(n_valid + bk - 1, bk)

    def dmas(slot, blk):
        # K/V are (B, G, T, D): per-(b, g) reads are contiguous full-width
        # (bk, D) row ranges — 100%-efficient HBM DMA (the old (B, T, G·D)
        # layout strided every row at 50% efficiency, docs/RESULTS.md)
        rows = pl.ds(blk * bk, bk)
        return (
            pltpu.make_async_copy(k_hbm.at[b, g, rows, :], kbuf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(v_hbm.at[b, g, rows, :], vbuf.at[slot], sems.at[slot, 1]),
        )

    # guard like the paged kernel: lengths == -1 encodes an empty shard
    # (n_blocks == 0) — an unawaited DMA start would leak a semaphore
    # increment into the next grid program's waits
    @pl.when(n_blocks > 0)
    def _():
        for dma in dmas(0, 0):
            dma.start()

    q = q_ref[0, 0].astype(jnp.float32)  # (Hg, D)

    def body(blk, carry):
        m, l, acc = carry
        slot = jax.lax.rem(blk, 2)
        nxt = jax.lax.rem(blk + 1, 2)

        @pl.when(blk + 1 < n_blocks)
        def _():
            for dma in dmas(nxt, blk + 1):
                dma.start()

        for dma in dmas(slot, blk):
            dma.wait()

        k = kbuf[slot].astype(jnp.float32)       # (bk, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + blk * bk
        s = jnp.where(cols < n_valid, s, MASK_VALUE)

        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l = alpha * l + jnp.sum(p, axis=1, keepdims=True)
        v = vbuf[slot].astype(jnp.float32)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_next, l, acc

    m0 = jnp.full((hg, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((hg, 1), jnp.float32)
    acc0 = jnp.zeros((hg, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def flash_attention_decode_v2(
    q, k, v, lengths, sm_scale, block_k=512, interpret=None,
):
    """Ragged decode attention with O(length) HBM reads.

    Same semantics as flash_attention_decode; K/V ((B, G, T, D)) stay in
    HBM and only the blocks below each row's length are DMA'd.  The
    sm_scale is folded into q before the kernel (one (B,G,Hg,D) multiply).
    """
    if interpret is None:
        interpret = not _is_tpu()
    B, G, Hg, D = q.shape
    T = k.shape[2]
    bk = min(block_k, T)
    while T % bk:
        bk //= 2

    qs = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    kf = k
    vf = v

    out = pl.pallas_call(
        functools.partial(_decode_v2_kernel, bk=bk, hg=Hg, d=D),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, G),
            in_specs=[
                pl.BlockSpec((1, 1, Hg, D), lambda b, g, *_: (b, g, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, Hg, D), lambda b, g, *_: (b, g, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, bk, D), k.dtype),
                pltpu.VMEM((2, bk, D), v.dtype),
                pltpu.VMEM((Hg, D), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, G, Hg, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            # (B, G) programs are fully independent (per-row, per-group
            # online softmax over disjoint cache slices) — both parallel, so
            # Mosaic's megacore split stays free to divide them over cores
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qs, kf, vf)
    return out


# ---------------------------------------------------------------------------
# Paged decode: the KV pool is a set of fixed-size pages in HBM; a per-row
# page table maps logical KV blocks to physical pages.  Decode DMAs exactly
# the pages below each row's length — O(length) HBM reads over a pool whose
# memory scales with the TOKENS IN FLIGHT, not slots × max_seq_len.  The
# whole (L, NP, G, P, D) pool is passed once (ANY memory space) with the
# layer index as a prefetched scalar, so the per-layer serving scan never
# materializes a layer slab copy.
# ---------------------------------------------------------------------------

def _decode_paged_kernel(lengths_ref, layer_ref, phase_ref, pt_ref, q_ref,
                         k_hbm, v_hbm, o_ref, *rest, p, hg, d, stride=1,
                         return_lse=False):
    if return_lse:
        m_out, l_out, kbuf, vbuf, sems = rest
    else:
        kbuf, vbuf, sems = rest
    b = pl.program_id(0)
    g = pl.program_id(1)
    lyr = layer_ref[0]
    phase = phase_ref[0]
    n_valid = lengths_ref[b] + 1
    n_pages_row = jax.lax.div(n_valid + p - 1, p)
    # this device's local blocks i cover logical blocks i*stride + phase;
    # stride == 1 (phase 0) is the unsharded path
    n_pages = jnp.maximum(0, jax.lax.div(n_pages_row - phase + stride - 1,
                                         stride))
    # clamp to the table's capacity: within a chunk the device lengths can
    # transiently exceed MP*P before the host rolls over-generation back —
    # without the clamp the loop reads pt_ref[b, MP] (the NEXT row's first
    # page id, or past the array: an arbitrary-page HBM DMA)
    n_pages = jnp.minimum(n_pages, pt_ref.shape[1])

    def dmas(slot, blk):
        phys = pt_ref[b, blk]
        return (
            pltpu.make_async_copy(k_hbm.at[lyr, phys, g], kbuf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(v_hbm.at[lyr, phys, g], vbuf.at[slot], sems.at[slot, 1]),
        )

    # start the first DMA only when there is a block to read — an unawaited
    # start would leak a semaphore increment into the next grid program
    @pl.when(n_pages > 0)
    def _():
        for dma in dmas(0, 0):
            dma.start()

    q = q_ref[0, 0].astype(jnp.float32)  # (Hg, D)

    def body(blk, carry):
        m, l, acc = carry
        slot = jax.lax.rem(blk, 2)
        nxt = jax.lax.rem(blk + 1, 2)

        @pl.when(blk + 1 < n_pages)
        def _():
            for dma in dmas(nxt, blk + 1):
                dma.start()

        for dma in dmas(slot, blk):
            dma.wait()

        k = kbuf[slot].astype(jnp.float32)       # (P, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        cols = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                + (blk * stride + phase) * p)
        s = jnp.where(cols < n_valid, s, MASK_VALUE)

        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        pr = jnp.exp(s - m_next)
        l = alpha * l + jnp.sum(pr, axis=1, keepdims=True)
        v = vbuf[slot].astype(jnp.float32)
        acc = acc * alpha + jnp.dot(pr, v, preferred_element_type=jnp.float32)
        return m_next, l, acc

    m0 = jnp.full((hg, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((hg, 1), jnp.float32)
    acc0 = jnp.zeros((hg, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_pages, body, (m0, l0, acc0))
    ls = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / ls).astype(o_ref.dtype)
    if return_lse:
        m_out[0, 0] = jnp.broadcast_to(m, m_out.shape[2:])
        l_out[0, 0] = jnp.broadcast_to(l, l_out.shape[2:])


def flash_attention_decode_paged(
    q: jax.Array,           # (B, G, Hg, D)
    k_pool: jax.Array,      # (L, NP, G, P, D) in HBM
    v_pool: jax.Array,      # (L, NP, G, P, D)
    layer_idx: jax.Array,   # () or (1,) int32
    page_table: jax.Array,  # (B, MP) int32 — physical page per logical block
    lengths: jax.Array,     # (B,) int32 — cache length BEFORE this token
    sm_scale: float,
    interpret: bool | None = None,
    stride: int = 1,
    phase: jax.Array | None = None,
    return_lse: bool = False,
):
    """Ragged decode attention over a paged KV pool.

    Row b attends logical positions 0..lengths[b]; position t lives at
    ``pool[layer, page_table[b, t // P], g, t % P]``.  Only the pages below
    each row's length are DMA'd (double-buffered), so HBM reads are
    O(length) and the pool address never re-materializes per layer.
    Semantics match :func:`flash_attention_decode` over the gathered cache
    (tests/test_paged.py).  Replaces the reference's per-step concat cache
    (model.py:151-155) for many-slot serving.

    With ``stride``/``phase``, ``page_table`` column i maps LOGICAL block
    ``i*stride + phase`` (a strided local view — the model-axis pool
    sharding of :func:`flash_attention_decode_paged_msharded`); masking
    uses the logical positions, and ``return_lse`` additionally returns the
    online-softmax running (m, l) (each (B, G, Hg)) for the exact
    cross-device merge.
    """
    if interpret is None:
        interpret = not _is_tpu()
    B, G, Hg, D = q.shape
    P = k_pool.shape[3]

    qs = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    lyr = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    if phase is None:
        phase = jnp.zeros((1,), jnp.int32)
    phase = jnp.asarray(phase, jnp.int32).reshape(1)

    out_specs = [pl.BlockSpec((1, 1, Hg, D), lambda b, g, *_: (b, g, 0, 0))]
    out_shapes = [jax.ShapeDtypeStruct((B, G, Hg, D), q.dtype)]
    if return_lse:
        out_specs += [
            pl.BlockSpec((1, 1, Hg, 128), lambda b, g, *_: (b, g, 0, 0)),
            pl.BlockSpec((1, 1, Hg, 128), lambda b, g, *_: (b, g, 0, 0)),
        ]
        out_shapes += [jax.ShapeDtypeStruct((B, G, Hg, 128), jnp.float32)] * 2

    res = pl.pallas_call(
        functools.partial(_decode_paged_kernel, p=P, hg=Hg, d=D,
                          stride=stride, return_lse=return_lse),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, G),
            in_specs=[
                pl.BlockSpec((1, 1, Hg, D), lambda b, g, *_: (b, g, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=tuple(out_specs) if return_lse else out_specs[0],
            scratch_shapes=[
                pltpu.VMEM((2, P, D), k_pool.dtype),
                pltpu.VMEM((2, P, D), v_pool.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=tuple(out_shapes) if return_lse else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            # (B, G) programs are fully independent (per-row, per-group
            # online softmax over disjoint cache slices) — both parallel, so
            # Mosaic's megacore split stays free to divide them over cores
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), lyr, phase, page_table.astype(jnp.int32),
      qs, k_pool, v_pool)
    if return_lse:
        out, m, l = res
        return out, m[..., 0], l[..., 0]
    return res


def _chunk_paged_kernel(starts_ref, lyr_ref, pt_ref, q_ref, k_hbm, v_hbm,
                        o_ref, kbuf, vbuf, sems, *, p, s_chunk, hg, d):
    """S_chunk queries per row at absolute offsets against the paged pool —
    the speculative-verify / small-chunk-prefill counterpart of
    _decode_paged_kernel (same double-buffered page DMA; query t of row b
    attends logical positions 0..starts[b]+t)."""
    b = pl.program_id(0)
    g = pl.program_id(1)
    lyr = lyr_ref[0]
    start = starts_ref[b]
    # every chunk position is already written to the pool (block_forward
    # writes K/V before attention), so pages cover start + s_chunk tokens;
    # clamped to the table width (capacity overruns clamp-write there)
    n_pages = jax.lax.div(start + s_chunk + p - 1, p)
    n_pages = jnp.minimum(n_pages, pt_ref.shape[1])

    def dmas(slot, blk):
        phys = pt_ref[b, blk]
        return (
            pltpu.make_async_copy(k_hbm.at[lyr, phys, g], kbuf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(v_hbm.at[lyr, phys, g], vbuf.at[slot], sems.at[slot, 1]),
        )

    for dma in dmas(0, 0):  # n_pages >= 1 (start >= 0, s_chunk >= 1)
        dma.start()

    q = q_ref[0, 0].astype(jnp.float32)          # (s_chunk*hg, d), pre-scaled

    def body(blk, carry):
        m, l, acc = carry
        slot = jax.lax.rem(blk, 2)
        nxt = jax.lax.rem(blk + 1, 2)

        @pl.when(blk + 1 < n_pages)
        def _():
            for dma in dmas(nxt, blk + 1):
                dma.start()

        for dma in dmas(slot, blk):
            dma.wait()

        k = kbuf[slot].astype(jnp.float32)       # (P, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                        # (s_chunk*hg, P)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + blk * p
        qpos = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // hg
        s = jnp.where(cols <= qpos, s, MASK_VALUE)

        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        pr = jnp.exp(s - m_next)
        l = alpha * l + jnp.sum(pr, axis=1, keepdims=True)
        v = vbuf[slot].astype(jnp.float32)
        acc = acc * alpha + jnp.dot(pr, v, preferred_element_type=jnp.float32)
        return m_next, l, acc

    rows = s_chunk * hg
    m0 = jnp.full((rows, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    acc0 = jnp.zeros((rows, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_pages, body, (m0, l0, acc0))
    ls = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / ls).astype(o_ref.dtype)


def flash_attention_chunk_paged(
    q: jax.Array,           # (B, S, G, Hg, D) chunk queries
    k_pool: jax.Array,      # (L, NP, G, P, D) in HBM
    v_pool: jax.Array,
    layer_idx: jax.Array,
    page_table: jax.Array,  # (B, MP)
    starts: jax.Array,      # (B,) absolute offset of query 0
    sm_scale: float,
    row_map: jax.Array | None = None,  # (B,) compact row → cache row
    interpret: bool | None = None,
):
    """Chunk attention directly over the paged pool: query t of row b
    attends logical positions 0..starts[b]+t, pages DMA'd once per (row,
    group) — O(start + S) HBM reads per layer instead of materializing the
    whole (B, G, MP·P, D) pool view (gather_layer) per layer per step,
    which dominated the speculative-verify hot path.  Returns
    (B, S, G, Hg, D).  Use when S·Hg fits a VMEM tile (≤ ~512 rows);
    larger prefill chunks keep the gathered-dense flash path."""
    if interpret is None:
        interpret = not _is_tpu()
    B, S, G, Hg, D = q.shape
    P = k_pool.shape[3]
    if row_map is not None:
        page_table = jnp.take(page_table, row_map, axis=0)
    qs = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    qs = qs.transpose(0, 2, 1, 3, 4).reshape(B, G, S * Hg, D)
    lyr = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    out = pl.pallas_call(
        functools.partial(_chunk_paged_kernel, p=P, s_chunk=S, hg=Hg, d=D),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, G),
            in_specs=[
                pl.BlockSpec((1, 1, S * Hg, D), lambda b, g, *_: (b, g, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, S * Hg, D),
                                   lambda b, g, *_: (b, g, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, P, D), k_pool.dtype),
                pltpu.VMEM((2, P, D), v_pool.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, G, S * Hg, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(starts.astype(jnp.int32), lyr, page_table.astype(jnp.int32),
      qs, k_pool, v_pool)
    return out.reshape(B, G, S, Hg, D).transpose(0, 2, 1, 3, 4)


def flash_attention_decode_paged_sharded(
    q, k_pool, v_pool, layer_idx, page_table, lengths, sm_scale, mesh,
    data_axis="data", model_axis="model", interpret=None,
):
    """Paged ragged decode over a DATA-sharded page pool.

    The pool's physical-page dim (NP of (L, NP, G, P, D)) shards over the
    ``data`` axis: each data shard owns NP/n_data pages and only its own
    batch rows, so pool memory scales down with the data-parallel degree
    (a replicated pool would store every shard's pages everywhere).  The
    engine's per-group allocator (serving/dist_engine.py) guarantees a
    row's table entries point only at its own shard's pages; inside the
    per-device body the GLOBAL page ids translate to shard-local ones by
    subtracting the shard's base page.  q heads shard over ``model`` as in
    :func:`flash_attention_decode_sharded`; the pool replicates over
    ``model`` (it is written by the replicated kv_proj).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    nd = sizes.get(data_axis, 1)
    tp = sizes.get(model_axis, 1)
    B, G, Hg, D = q.shape
    NP = k_pool.shape[1]
    if B % nd or NP % nd or Hg % tp:
        return flash_attention_decode_paged(
            q, k_pool, v_pool, layer_idx, page_table, lengths, sm_scale,
            interpret=interpret,
        )
    np_local = NP // nd
    lyr = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    def local_fn(q, kp, vp, lyr, pt, lens):
        base = jax.lax.axis_index(data_axis) * np_local
        # clip is a safety net only: out-of-group ids indicate an allocator
        # bug (tests assert locality), but must not read out of bounds
        ptl = jnp.clip(pt - base, 0, np_local - 1)
        return flash_attention_decode_paged(
            q, kp, vp, lyr, ptl, lens, sm_scale, interpret=interpret
        )

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(data_axis, None, model_axis, None),
            P(None, data_axis, None, None, None),
            P(None, data_axis, None, None, None),
            P(None),
            P(data_axis, None),
            P(data_axis),
        ),
        out_specs=P(data_axis, None, model_axis, None),
        check_vma=False,
    )
    return fn(q, k_pool, v_pool, lyr, page_table.astype(jnp.int32),
              lengths.astype(jnp.int32))


def flash_attention_decode_paged_msharded(
    q, k_pool, v_pool, layer_idx, page_table, lengths, sm_scale, mesh,
    data_axis="data", model_axis="model", interpret=None,
):
    """Paged ragged decode over a pool sharded over BOTH mesh axes.

    The pool's physical-page dim shards over the flattened (data, model)
    axes — per-chip pool HBM is NP/(nd·tp) pages, tp× less than the
    data-only sharding of :func:`flash_attention_decode_paged_sharded`, and
    per-chip KV reads/token drop tp× (the same economics as the dense
    T-sharded cache, :func:`flash_attention_decode_kv_tsharded`, at paged
    memory scaling).  LOGICAL block j of a row lives on model chip
    ``j % tp`` of its data group (the engine allocator guarantees this;
    serving/dist_engine.py), so each model chip attends a strided view of
    the row — local block i ↔ logical block ``i*tp + phase`` — and the tp
    partial online-softmax states merge exactly by log-sum-exp over an
    all-gather.  q is replicated over ``model`` (per-chip work Hg × T/tp =
    the head-sharded kernel's Hg/tp × T; KV traffic is what shrinks).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    nd = sizes.get(data_axis, 1)
    tp = sizes.get(model_axis, 1)
    B, G, Hg, D = q.shape
    NP = k_pool.shape[1]
    MP = page_table.shape[1]
    if tp == 1 or B % nd or NP % (nd * tp):
        return flash_attention_decode_paged_sharded(
            q, k_pool, v_pool, layer_idx, page_table, lengths, sm_scale,
            mesh, data_axis, model_axis, interpret=interpret,
        )
    sp = NP // (nd * tp)
    mp_local = -(-MP // tp)
    lyr = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    def local_fn(q, kp, vp, lyr, pt, lens):
        di = jax.lax.axis_index(data_axis)
        mi = jax.lax.axis_index(model_axis)
        base = (di * tp + mi) * sp
        # strided local view: column i ← logical block i*tp + mi.  Tail
        # columns past MP are clamped; they are never DMA'd (the kernel's
        # local trip count keeps i*tp + mi < ceil(n_valid / P) ≤ MP).
        idx = jnp.minimum(mi + tp * jnp.arange(mp_local), MP - 1)
        # clip is a safety net: out-of-shard ids indicate an allocator bug
        # (tests assert phase locality) but must not read out of bounds
        ptl = jnp.clip(jnp.take(pt, idx, axis=1) - base, 0, sp - 1)
        out, m, l = flash_attention_decode_paged(
            q, kp, vp, lyr, ptl, lens, sm_scale, interpret=interpret,
            stride=tp, phase=jnp.full((1,), mi, jnp.int32), return_lse=True,
        )
        return _merge_lse_partials(out, m, l, model_axis, q.dtype)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(data_axis, None, None, None),
            P(None, (data_axis, model_axis), None, None, None),
            P(None, (data_axis, model_axis), None, None, None),
            P(None),
            P(data_axis, None),
            P(data_axis),
        ),
        out_specs=P(data_axis, None, None, None),
        check_vma=False,
    )
    return fn(q, k_pool, v_pool, lyr, page_table.astype(jnp.int32),
              lengths.astype(jnp.int32))


def _merge_lse_partials(out, m, l, axis_name, dtype):
    """Exact online-softmax merge of per-shard flash partials (out, m, l)
    over mesh axis ``axis_name`` — an empty shard contributes l == 0 and
    drops out of the weighted sum."""
    m_all = jax.lax.all_gather(m, axis_name)                 # (tp, B, G, Hg)
    l_all = jax.lax.all_gather(l, axis_name)
    o_all = jax.lax.all_gather(out.astype(jnp.float32), axis_name)
    m_max = jnp.max(m_all, axis=0)
    w = l_all * jnp.exp(m_all - m_max[None])                 # 0 where l==0
    den = jnp.maximum(w.sum(0), 1e-30)
    merged = (o_all * w[..., None]).sum(0) / den[..., None]
    return merged.astype(dtype)


def flash_attention_decode_kv_tsharded(
    q, k, v, lengths, sm_scale, mesh, block_k=512,
    data_axis="data", model_axis="model", interpret=None,
):
    """Ragged decode attention over a SEQUENCE-sharded KV cache.

    K/V (B, G, T, D) are sharded T over the ``model`` axis — each chip holds
    T/tp of the cache, so per-chip KV bytes/token drop tp× (the north-star
    8K-context configs are KV-bandwidth bound; replicating KV under TP reads
    the full cache on every chip).  q (B, G, Hg, D) is replicated over
    ``model`` (a few KB at decode).  Each chip runs the ragged flash kernel
    over its local slice with a shifted validity window, then the partial
    (out, m, l) online-softmax states merge exactly with a log-sum-exp
    combine over a tp-sized all-gather (ICI traffic: tp·B·G·Hg·(D+2) floats
    per step — negligible next to the KV reads saved).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    tp = sizes.get(model_axis, 1)
    B, G, Hg, D = q.shape
    T = k.shape[2]
    if tp == 1 or T % tp or (T // tp) % 8:
        return flash_attention_decode(q, k, v, lengths, sm_scale, block_k,
                                      interpret=interpret)
    t_local = T // tp

    def local_fn(q, k, v, lengths):
        # k/v here are the per-device (B, G, T/tp, D) slices
        idx = jax.lax.axis_index(model_axis)
        offset = idx * t_local
        n_valid_global = lengths + 1
        n_valid_local = jnp.clip(n_valid_global - offset, 0, t_local)
        out, m, l = flash_attention_decode(
            q, k, v, n_valid_local - 1, sm_scale, block_k,
            interpret=interpret, return_lse=True,
        )
        return _merge_lse_partials(out, m, l, model_axis, q.dtype)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(data_axis, None, None, None),
            P(data_axis, None, model_axis, None),
            P(data_axis, None, model_axis, None),
            P(data_axis),
        ),
        out_specs=P(data_axis, None, None, None),
        check_vma=False,
    )
    return fn(q, k, v, lengths)
