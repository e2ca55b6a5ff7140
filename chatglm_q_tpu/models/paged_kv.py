"""Paged KV cache: fixed-size pages + per-row page tables (vLLM-style,
re-designed for TPU).

The reference's cache is a per-sequence concat list (model.py:151-155); the
round-1 serving cache is a dense (L, B, G, S_max, D) slab — simple, but its
memory is ``slots × max_seq_len`` even when most slots hold short contexts.
This module stores KV in a shared pool of physical pages:

* pool (L, NP, G, P, D): NP pages of P token-rows each, allocated to
  sequences on demand — memory scales with tokens in flight;
* page_table (B, MP) int32: logical KV block j of row b lives at physical
  page ``page_table[b, j]``; physical page 0 is a reserved garbage page
  (inactive slots write there);
* all shapes static under jit: the page table is data, not structure, so
  admission/release never recompiles anything.

The decode hot path reads pages with the double-buffered
:func:`~chatglm_q_tpu.ops.pallas_attention.flash_attention_decode_paged`
kernel — O(length) HBM traffic, and the (L-leading) pool is passed whole
with the layer index as a scalar, so the per-layer scan never copies a
layer slab.  Prefill attends the freshly computed K/V directly (causality
never reaches the pool), then writes the pages.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax

from ..config import ChatGLM2Config, TpuRuntimeConfig
from . import chatglm2 as M

_DEFAULT_RT = TpuRuntimeConfig()


@flax.struct.dataclass
class PagedKVCache:
    k_pool: jax.Array      # (L, NP, G, P, D)
    v_pool: jax.Array      # (L, NP, G, P, D)
    page_table: jax.Array  # (B, MP) int32
    lengths: jax.Array     # (B,) int32

    @property
    def page_size(self) -> int:
        return self.k_pool.shape[3]

    @property
    def max_length(self) -> int:
        return self.page_table.shape[1] * self.page_size


class PagedWrite(NamedTuple):
    """kv_write payload marking the paged path through block_forward."""
    k_pool: jax.Array
    v_pool: jax.Array
    layer_idx: jax.Array
    page_table: jax.Array
    start: jax.Array  # (B,) write position per row (prefill: zeros)
    aligned: bool = True  # False: S>1 writes at arbitrary (unaligned) starts


def init_paged_kv_cache(
    config: ChatGLM2Config,
    batch_size: int,
    num_pages: int,
    max_length: Optional[int] = None,
    page_size: int = 256,
    dtype=jnp.bfloat16,
) -> PagedKVCache:
    L = config.num_layers
    G = config.num_multi_query_groups
    D = config.head_hidden_size
    S = max_length or config.max_sequence_length
    mp = -(-S // page_size)
    shape = (L, num_pages, G, page_size, D)
    return PagedKVCache(
        k_pool=jnp.zeros(shape, dtype),
        v_pool=jnp.zeros(shape, dtype),
        page_table=jnp.zeros((batch_size, mp), jnp.int32),
        lengths=jnp.zeros((batch_size,), jnp.int32),
    )


def write_pages(pool, new, layer_idx, page_table, start, aligned=True):
    """Write ``new`` (B, G, S, D) at positions start[b]..start[b]+S-1 of the
    paged pool (L, NP, G, P, D).

    S == 1 is the decode write (one row at a dynamic offset inside a
    dynamically chosen page); S > 1 with ``aligned`` is the prefill write,
    which requires every ``start`` to be PAGE-ALIGNED (0 for whole-prompt
    admission; chunked prefill uses page-multiple chunk sizes) so the page
    split stays static.  ``aligned=False`` writes token-by-token at
    arbitrary starts (speculative verification: S = k+1 small).  Batch is
    unrolled (engine batches are small; a vmap would lower to a serial
    scatter anyway).
    """
    B, G, S, D = new.shape
    P = pool.shape[3]
    if new.dtype != pool.dtype:
        new = new.astype(pool.dtype)
    cap = page_table.shape[1] * P
    if S == 1 or not aligned:
        for b in range(B):
            for t in range(S):
                # clamp to the row's capacity: in-chunk over-generation past
                # the table's last slot must overwrite THAT slot (the dense
                # path's dynamic_update_slice clamp semantics — the host
                # rolls those tokens back), never wrap pos % P back into
                # the last page's earlier, still-valid positions
                pos = jnp.minimum(start[b] + t, cap - 1)
                blk = pos // P
                phys = jax.lax.dynamic_index_in_dim(page_table[b], blk, 0,
                                                    keepdims=False)
                off = pos % P
                pool = jax.lax.dynamic_update_slice(
                    pool, new[b][None, None, :, t : t + 1],  # (1, 1, G, 1, D)
                    (layer_idx, phys, 0, off, 0),
                )
        return pool
    # prefill: start is page-aligned, pages split statically
    n_pages = -(-S // P)
    for b in range(B):
        blk0 = start[b] // P
        for j in range(n_pages):
            lo = j * P
            hi = min(S, lo + P)
            chunk = new[b, :, lo:hi][None, None]  # (1, 1, G, hi-lo, D)
            phys = jax.lax.dynamic_index_in_dim(
                page_table[b], blk0 + j, 0, keepdims=False)
            pool = jax.lax.dynamic_update_slice(
                pool, chunk, (layer_idx, phys, 0, 0, 0)
            )
    return pool


def gather_layer(pool, layer_idx, page_table):
    """Oracle/fallback: materialize one layer's paged KV as a dense
    (B, G, MP*P, D) tensor (reads the whole pool — test/XLA path only)."""
    slab = jax.lax.dynamic_index_in_dim(pool, layer_idx, 0, keepdims=False)
    gath = slab[page_table]                      # (B, MP, G, P, D)
    B, MP, G, P, D = gath.shape
    return gath.transpose(0, 2, 1, 3, 4).reshape(B, G, MP * P, D)


def _layers_scan_paged(params, config, quant_type, rt, h, freqs_cis, mask5,
                       cache: PagedKVCache, start, aligned=True):
    L = config.num_layers
    # layer-indexed weights: see M.stacked_layer_params (avoids the XLA
    # per-layer weight-slice copies in the scan body)
    small, make = M.stacked_layer_params(params["layers"], quant_type, rt)

    def scan_body(carry, inp):
        h, kp, vp = carry
        if make is not None:
            layer_idx, small_i = inp
            layer_params = make(layer_idx, small_i)
        else:
            layer_idx, layer_params = inp
        h, (kp, vp) = M.block_forward(
            layer_params, h, freqs_cis, mask5, config, quant_type, rt,
            kv_write=PagedWrite(kp, vp, layer_idx, cache.page_table, start,
                                aligned),
        )
        return (h, kp, vp), None

    xs = ((jnp.arange(L), small) if make is not None
          else (jnp.arange(L), params["layers"]))
    (h, kp, vp), _ = jax.lax.scan(
        scan_body, (h, cache.k_pool, cache.v_pool), xs,
    )
    return h, kp, vp


def prefill_paged(
    params: dict,
    config: ChatGLM2Config,
    input_ids: jax.Array,   # (B, S) right-padded
    lengths: jax.Array,     # (B,) true lengths
    cache: PagedKVCache,
    quant_type: str = "none",
    dtype=jnp.bfloat16,
    rt: TpuRuntimeConfig = _DEFAULT_RT,
):
    """Prefill rows from position 0 into their page-table pages; returns
    last-token logits (B, V) and the updated cache.  Attention runs on the
    freshly computed K/V (never touches the pool); the rows' pages must
    already be allocated to cover S positions."""
    B, S = input_ids.shape
    positions = jnp.arange(1, S + 1)[None, :].repeat(B, axis=0)
    freqs_cis = M._serving_freqs(config, positions, dtype)
    h = M.quant_embedding_lookup(params["word_embedding"], input_ids, quant_type, dtype)

    if rt.flash_enabled():
        mask5 = ("flash_prefill", lengths.astype(jnp.int32))
    else:
        # XLA fallback attends a gathered dense pool view (block_forward),
        # so the mask spans the pool's full logical length
        T = cache.max_length
        tq = jnp.arange(S)[:, None]
        tk = jnp.arange(T)[None, :]
        bias = jnp.where(tk <= tq, 0.0, M.MASK_VALUE).astype(jnp.float32)
        mask5 = bias[None, None, None, :, :]

    start = jnp.zeros((B,), jnp.int32)
    h, kp, vp = _layers_scan_paged(
        params, config, quant_type, rt, h, freqs_cis, mask5, cache, start
    )

    h = M.rms_norm(h, params["final_ln"]["weight"], config.layernorm_epsilon)
    last = jnp.take_along_axis(h, (lengths - 1)[:, None, None], axis=1)[:, 0]
    logits = M.quant_linear(last, params["lm_head"], quant_type, rt, tp_mode="col")
    logits = logits[..., : config.vocab_size]

    new_cache = cache.replace(k_pool=kp, v_pool=vp,
                              lengths=lengths.astype(jnp.int32))
    return logits, new_cache


def prefill_chunk_paged(
    params: dict,
    config: ChatGLM2Config,
    input_ids: jax.Array,    # (B, Sc) — Sc a multiple of the page size
    starts: jax.Array,       # (B,) page-aligned absolute chunk offsets
    chunk_valid: jax.Array,  # (B,)
    cache: PagedKVCache,
    quant_type: str = "none",
    dtype=jnp.bfloat16,
    rt: TpuRuntimeConfig = _DEFAULT_RT,
    return_all_logits: bool = False,
    page_aligned: bool = True,
):
    """Chunked prefill over the paged pool (see chatglm2.prefill_chunk).

    Chunk queries attend earlier context through a gathered dense view of
    the rows' pages — acceptable at prefill (one gather per layer per
    chunk); the decode hot path never gathers.
    """
    B, Sc = input_ids.shape
    positions = starts[:, None] + jnp.arange(1, Sc + 1)[None, :]
    freqs_cis = M._serving_freqs(config, positions, dtype)
    h = M.quant_embedding_lookup(params["word_embedding"], input_ids, quant_type, dtype)

    new_lengths = jnp.minimum(starts + chunk_valid,
                              cache.max_length - 1).astype(jnp.int32)
    if rt.flash_enabled():
        mask5 = ("flash_prefill_chunk", (new_lengths, starts.astype(jnp.int32)))
    else:
        T = cache.max_length
        tq = jnp.arange(Sc)[None, :, None]
        tk = jnp.arange(T)[None, None, :]
        causal = tk <= starts[:, None, None] + tq
        bias = jnp.where(causal, 0.0, M.MASK_VALUE).astype(jnp.float32)
        mask5 = bias[:, None, None, :, :]
    h, kp, vp = _layers_scan_paged(
        params, config, quant_type, rt, h, freqs_cis, mask5, cache, starts,
        aligned=page_aligned,
    )

    h = M.rms_norm(h, params["final_ln"]["weight"], config.layernorm_epsilon)
    if return_all_logits:
        logits = M.quant_linear(h, params["lm_head"], quant_type, rt, tp_mode="col")
    else:
        last = jnp.take_along_axis(h, (chunk_valid - 1)[:, None, None], axis=1)[:, 0]
        logits = M.quant_linear(last, params["lm_head"], quant_type, rt, tp_mode="col")
    logits = logits[..., : config.vocab_size]

    new_cache = cache.replace(k_pool=kp, v_pool=vp, lengths=new_lengths)
    return logits, new_cache


def decode_step_paged(
    params: dict,
    config: ChatGLM2Config,
    next_ids: jax.Array,  # (B,)
    cache: PagedKVCache,
    quant_type: str = "none",
    dtype=jnp.bfloat16,
    rt: TpuRuntimeConfig = _DEFAULT_RT,
):
    """One autoregressive step over the paged cache: write KV at position
    ``lengths`` (inside the mapped page), attend pages ≤ ``lengths``."""
    B = next_ids.shape[0]
    positions = (cache.lengths + 1)[:, None]
    freqs_cis = M._serving_freqs(config, positions, dtype)
    h = M.quant_embedding_lookup(params["word_embedding"], next_ids[:, None], quant_type, dtype)

    if rt.flash_enabled():
        mask5 = ("flash_decode", cache.lengths.astype(jnp.int32))
    else:
        T = cache.max_length
        tk = jnp.arange(T)[None, :]
        valid = tk <= cache.lengths[:, None]
        bias = jnp.where(valid, 0.0, M.MASK_VALUE).astype(jnp.float32)
        mask5 = bias[:, None, None, None, :]

    h, kp, vp = _layers_scan_paged(
        params, config, quant_type, rt, h, freqs_cis, mask5, cache, cache.lengths
    )

    h = M.rms_norm(h, params["final_ln"]["weight"], config.layernorm_epsilon)
    logits = M.quant_linear(h[:, 0], params["lm_head"], quant_type, rt, tp_mode="col")
    logits = logits[..., : config.vocab_size]

    # clamp: in-chunk steps past the table capacity keep overwriting the
    # last slot (host-side rollback discards their tokens) instead of
    # growing n_valid past what the page table can address
    new_lengths = jnp.minimum(cache.lengths + 1, cache.max_length - 1)
    new_cache = cache.replace(k_pool=kp, v_pool=vp, lengths=new_lengths)
    return logits, new_cache
