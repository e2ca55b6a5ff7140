"""Pure-functional ChatGLM2 model core for TPU (JAX).

Re-creates the numerics of the reference model (/root/reference/chatglm_q/
model.py: RMSNorm :62-73, half-bypass interleaved RoPE :35-59, MQA attention
:90-177, SwiGLU FFN :180-201, pre-norm blocks :204-246, full model :249-392)
in an idiomatic JAX design:

* parameters are a plain pytree; per-layer tensors are stacked on a leading
  ``L`` axis and the layer stack runs under ``lax.scan`` (compile-time O(1)
  in depth, unlike the reference's Python loop model.py:371-379);
* two forward paths:
  - :func:`forward` — "parity mode", the reference's exact semantics
    (materialized additive mask model.py:311-317, cumsum position ids
    :306-307, optional shifted CE loss :384-388); used for ppl/C-Eval and
    golden tests;
  - :func:`prefill` / :func:`decode_step` — serving mode with a
    **preallocated** KV cache updated via ``lax.dynamic_update_slice`` and
    per-row lengths (the one deliberate departure from the reference's
    per-step ``torch.cat`` cache realloc, model.py:151-155, which is
    incompatible with jit static shapes);
* fused projections are stored split (q|kv, h|gate) so tensor-parallel
  sharding never crosses a semantic boundary; the loader splits/merges to
  stay checkpoint-compatible with the reference's fused tensors
  (model.py:111, :194).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.struct

from ..config import ChatGLM2Config, TpuRuntimeConfig
from ..ops.linear import quant_linear, quant_embedding_lookup
from ..ops import quant as Q

MASK_VALUE = -1e10  # additive mask value, model.py:314

_DEFAULT_RT = TpuRuntimeConfig()


# ---------------------------------------------------------------------------
# RoPE (half of head_dim bypassed; interleaved [r, i] pairs)  model.py:35-59
# ---------------------------------------------------------------------------

def precompute_freqs_cis(dim: int, length: int, theta: float = 10000.0) -> np.ndarray:
    """Rotary table, shape (length, dim), where ``dim`` = head_hidden_size.

    Matches reference ``precompute_freqs_cis`` (model.py:35-43): only the
    first half of the head dim rotates; the second half gets identity
    (cos=1, sin=0) "bypass" freqs.  Flattened layout per position:
    [c0, s0, c1, s1, ..., 1, 0, 1, 0, ...] of size dim.
    """
    assert dim % 4 == 0
    half = dim // 2
    freqs = 1.0 / (theta ** (np.arange(0, half, 2, dtype=np.float32) / half))
    angles = np.outer(np.arange(length, dtype=np.float32), freqs)  # (L, half//2)
    rot = np.stack([np.cos(angles), np.sin(angles)], axis=-1)      # (L, half//2, 2)
    byp = np.stack([np.ones_like(angles), np.zeros_like(angles)], axis=-1)
    table = np.concatenate([rot, byp], axis=-2)                     # (L, half, 2)
    return table.reshape(length, dim)


def apply_rotary_emb(x: jax.Array, freqs_cis: jax.Array) -> jax.Array:
    """x (..., S, G, H, D); freqs_cis (..., S, 1, 1, D) with [cos, sin] pairs.

    Real-arithmetic complex multiply on interleaved pairs — the reference's
    fallback branch (model.py:56-59), which is bit-equivalent to its
    view_as_complex fast path.
    """
    xs = x.shape
    x2 = x.reshape(*xs[:-1], xs[-1] // 2, 2)
    f2 = freqs_cis.reshape(*freqs_cis.shape[:-1], xs[-1] // 2, 2)
    o_r = x2[..., 0] * f2[..., 0] - x2[..., 1] * f2[..., 1]
    o_i = x2[..., 0] * f2[..., 1] + x2[..., 1] * f2[..., 0]
    return jnp.stack([o_r, o_i], axis=-1).reshape(xs)


# ---------------------------------------------------------------------------
# Norm
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """fp32 rsqrt-mean-square then cast back, elementwise weight (model.py:62-73)."""
    xf = x.astype(jnp.float32)
    norm = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return norm.astype(x.dtype) * weight.astype(x.dtype)


# ---------------------------------------------------------------------------
# KV cache (serving mode): preallocated, per-row lengths
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class KVCache:
    """Layout (L, B, G, S_max, D): the sequence dim is adjacent to the head
    dim so a decode step's per-(batch, group) KV reads are contiguous
    (T, D)=(T, 128) row-ranges — full-width HBM DMAs for the O(length)
    ragged decode kernel, and no per-step relayout before the Pallas
    attention kernels (a (B, T, G, D) layout forces a whole-cache transpose
    copy every decode step, measured round 1)."""
    k: jax.Array        # (L, B, G, S_max, D)
    v: jax.Array        # (L, B, G, S_max, D)
    lengths: jax.Array  # (B,) int32 — number of valid cached positions per row

    @property
    def max_length(self) -> int:
        return self.k.shape[3]


def init_kv_cache(
    config: ChatGLM2Config, batch_size: int, max_length: Optional[int] = None,
    dtype=jnp.bfloat16,
) -> KVCache:
    """dtype may be a reduced-precision storage type (jnp.float8_e4m3fn
    halves KV memory/bandwidth vs bf16 — useful at long context / large
    batch; K/V are cast on write and upcast to the activation dtype at
    attention time).  The reference has no KV-cache compression (its cache
    is the activation dtype, model.py:151-155)."""
    L = config.num_layers
    G = config.num_multi_query_groups
    D = config.head_hidden_size
    S = max_length or config.max_sequence_length
    shape = (L, batch_size, G, S, D)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        lengths=jnp.zeros((batch_size,), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Attention + block
# ---------------------------------------------------------------------------

def _dropout(x, rate, rng):
    """Inverted dropout (train mode only; the reference's nn.Dropout)."""
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _attention_scores(q, k, v, mask_bias, dropout=None, kv_layout="btgd"):
    """q (B,S,G,Hg,D); k/v (B,T,G,D) (parity, ``btgd``) or the serving
    cache layout (B,G,T,D) (``bgtd``).  Grouped MQA attention with additive
    mask bias (B,1,1,S,T); softmax in fp32 (model.py:163-173); optional
    attention-prob dropout (model.py:171)."""
    B, S, G, Hg, D = q.shape
    q = q / jnp.asarray(np.sqrt(D), q.dtype)
    kv_sub = "btgd" if kv_layout == "btgd" else "bgtd"
    # scores (B, G, Hg, S, T)
    scores = jnp.einsum(f"bsghd,{kv_sub}->bghst", q, k)
    scores = scores.astype(jnp.float32) + mask_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    if dropout is not None:
        probs = _dropout(probs, *dropout)
    out = jnp.einsum(f"bghst,{kv_sub}->bsghd", probs, v)
    return out.reshape(B, S, G * Hg * D)


def _scatter_large(cache, new, layer_idx, start):
    """Large-batch KV write: scatter rows of one layer slab in place.
    cache (L, B, G, T, D); new (B, G, S, D); start (B,)."""
    slab = jax.lax.dynamic_index_in_dim(cache, layer_idx, 0, keepdims=False)
    slab = jax.vmap(
        lambda c, n, s0: jax.lax.dynamic_update_slice(c, n, (0, s0, 0))
    )(slab, new, start)
    return jax.lax.dynamic_update_index_in_dim(cache, slab, layer_idx, 0)


def block_forward(
    layer_params: dict,
    x: jax.Array,              # (B, S, H)
    freqs_cis: jax.Array,      # (B, S, D) flattened rope coeffs per position
    mask_bias: jax.Array,      # (B, 1, 1, S, T) additive fp32
    config: ChatGLM2Config,
    quant_type: str,
    rt: TpuRuntimeConfig = _DEFAULT_RT,
    kv_write=None,             # None (parity: keys = this block) or
                               # (cache_k (B,Smax,G,D), cache_v, start_idx (B,))
    collect_taps: bool = False,
    past_kv=None,              # parity-mode incremental forward: (pk, pv)
                               # each (B, T_past, G, D) prepended to K/V
    dropout=None,              # (rate, rng) — train-mode dropout on the
                               # attention probs and the FFN activation
                               # (model.py:171, :201)
):
    """One pre-norm transformer block (model.py:204-246).

    Returns (x_out, (k_full, v_full)) where k_full/v_full are the key/value
    tensors actually attended over (parity mode: the new ones; serving mode:
    the updated cache buffers).  With ``collect_taps`` a third element is
    returned: the activations feeding each linear — the functional
    replacement for the reference GPTQ driver's forward hooks
    (examples/quantize_gptq/int4g32.py:62-64).
    """
    B, S, H = x.shape
    G = config.num_multi_query_groups
    nH = config.num_attention_heads
    D = config.head_hidden_size
    Hg = nH // G

    h = rms_norm(x, layer_params["attn_ln"]["weight"], config.layernorm_epsilon)

    # tp_mode hints (active only under rt.tp_pallas + mesh): q/w_in are
    # column-parallel, o/w_out row-parallel, kv_proj replicated — matching
    # parallel/sharding.py::param_pspecs
    q = quant_linear(h, layer_params["q_proj"], quant_type, rt, tp_mode="col")
    kv = quant_linear(h, layer_params["kv_proj"], quant_type, rt,
                      tp_mode="rep")
    k, v = jnp.split(kv, 2, axis=-1)

    q = q.reshape(B, S, G, Hg, D)
    k = k.reshape(B, S, G, 1, D)
    if rt.mesh is not None and rt.kv_shard_t and S > 1:
        # sequence-parallel prefill: the projection outputs arrive
        # head-sharded (TP over the model axis) but ring attention wants
        # them sequence-sharded.  Reshard HERE, before RoPE — GSPMD cannot
        # derive the head→sequence all-to-all through the 6-D RoPE
        # reshape/stack and falls back to involuntary full
        # rematerialization EVERY layer (replicate-then-repartition inside
        # the scan body; spmd_partitioner.cc:652 warnings, VERDICT r2 #4).
        from jax.sharding import NamedSharding, PartitionSpec as _P

        from ..parallel.sharding import DATA_AXIS, MODEL_AXIS

        sizes = dict(zip(rt.mesh.axis_names, rt.mesh.devices.shape))
        tp = sizes.get(MODEL_AXIS, 1)
        if tp > 1 and S % tp == 0:
            # batch axis only when the mesh HAS one and B divides it (a
            # model-only mesh must not reference a nonexistent axis)
            b_ax = (DATA_AXIS if DATA_AXIS in sizes
                    and B % sizes[DATA_AXIS] == 0 else None)
            seq5 = NamedSharding(rt.mesh,
                                 _P(b_ax, MODEL_AXIS, None, None, None))
            seq3 = NamedSharding(rt.mesh, _P(b_ax, MODEL_AXIS, None))
            q = jax.lax.with_sharding_constraint(q, seq5)
            k = jax.lax.with_sharding_constraint(k, seq5)
            v = jax.lax.with_sharding_constraint(v, seq3)
    f = freqs_cis[:, :, None, None, :]
    q = apply_rotary_emb(q, f)
    k = apply_rotary_emb(k, f).reshape(B, S, G, D)
    v = v.reshape(B, S, G, D)

    from . import paged_kv as _PK

    paged = isinstance(kv_write, _PK.PagedWrite)
    kv_stacked = None  # set by the layer-indexed dense decode fast path
    if kv_write is None:
        if past_kv is not None:
            pk, pv = past_kv
            k_full = jnp.concatenate([pk.astype(k.dtype), k], axis=1)
            v_full = jnp.concatenate([pv.astype(v.dtype), v], axis=1)
        else:
            k_full, v_full = k, v
        kv_out = (k_full, v_full)
    elif paged:
        # paged pool write (models/paged_kv.py): prefill attends the fresh
        # K/V directly (causality never reaches the pool); decode attends
        # the pool through the paged ragged kernel or, on the XLA fallback
        # path, a gathered dense view
        from . import paged_kv as PK

        kw = k.transpose(0, 2, 1, 3)  # (B, G, S, D)
        vw = v.transpose(0, 2, 1, 3)
        kp = vp = None
        if S == 1 and rt.mesh is None:
            # decode write: in-place Pallas pool writer (page resolved in
            # the BlockSpec index map) — the per-row dynamic_update_slice
            # chain costs scale with batch (round-5 profile)
            from ..ops import pallas_attention as _PA

            kp = _PA.kv_pool_write_idx(
                kv_write.k_pool, kw[:, :, 0, :], kv_write.layer_idx,
                kv_write.page_table, kv_write.start)
            vp = _PA.kv_pool_write_idx(
                kv_write.v_pool, vw[:, :, 0, :], kv_write.layer_idx,
                kv_write.page_table, kv_write.start)
        if kp is None or vp is None:
            kp = PK.write_pages(kv_write.k_pool, kw, kv_write.layer_idx,
                                kv_write.page_table, kv_write.start,
                                aligned=kv_write.aligned)
            vp = PK.write_pages(kv_write.v_pool, vw, kv_write.layer_idx,
                                kv_write.page_table, kv_write.start,
                                aligned=kv_write.aligned)
        kv_out = (kp, vp)
        if not isinstance(mask_bias, tuple):
            # XLA fallback (decode, or prefill masked over the full pool
            # length): dense (B, G, MP*P, D) view of the pool
            k_full = PK.gather_layer(kp, kv_write.layer_idx, kv_write.page_table)
            v_full = PK.gather_layer(vp, kv_write.layer_idx, kv_write.page_table)
        else:
            k_full, v_full = kw, vw
    else:
        # write the S new positions into the FULL (L, B, G, Smax, D) cache
        # carried through the layer scan at (layer, row, start_row) — tiny
        # in-place index updates, never a whole-cache rewrite (stacking the
        # cache through scan ys copies all L×B×Smax slots every step: at
        # batch 8 × 8K context that is ~3.8 GB per token, measured).
        if len(kv_write) == 5:
            # compact chunk batch: q/kv-proj row b targets cache row
            # slot_map[b] (serving/engine chunked admission)
            ck, cv, layer_idx, start, slot_map = kv_write
        else:
            ck, cv, layer_idx, start = kv_write
            slot_map = None
        kw = k.transpose(0, 2, 1, 3)  # (B, G, S, D) — matches cache layout
        vw = v.transpose(0, 2, 1, 3)

        # layer-indexed decode fast path (round 5): write the token with an
        # in-place Pallas kernel and attend the STACKED cache directly —
        # the XLA formulation of the same update materializes per-layer
        # slab copies + a serial per-row write loop that scale with batch
        # (profiled ≈ 4.9 ms/step at b16, docs/RESULTS.md round 5)
        idx_ok = (slot_map is None and S == 1
                  and isinstance(mask_bias, tuple)
                  and mask_bias[0] == "flash_decode"
                  and not rt.decode_attn_v2 and not rt.no_idx_cache
                  and ck.shape[3] % 8 == 0)
        if idx_ok and rt.mesh is not None:
            # mesh case: batch must divide the data axis (cache layout,
            # kv_cache_pspecs) and heads the model axis; the T-sharded
            # cache (kv_shard_t) stays on its dedicated merge path
            from ..ops.pallas_attention import _mesh_divides

            sizes = dict(zip(rt.mesh.axis_names, rt.mesh.devices.shape))
            idx_ok = (not rt.kv_shard_t
                      and _mesh_divides(rt.mesh, "data", "model", B, Hg)
                      and B % sizes.get("data", 1) == 0)
        if idx_ok:
            from ..ops import pallas_attention as PA

            if rt.mesh is None:
                ck = PA.kv_cache_write_idx(ck, kw[:, :, 0, :], layer_idx,
                                           start)
                cv = PA.kv_cache_write_idx(cv, vw[:, :, 0, :], layer_idx,
                                           start)
            else:
                ck = PA.kv_cache_write_idx_sharded(
                    ck, kw[:, :, 0, :], layer_idx, start, rt.mesh)
                cv = PA.kv_cache_write_idx_sharded(
                    cv, vw[:, :, 0, :], layer_idx, start, rt.mesh)
            kv_out = (ck, cv)
            k_full = v_full = None
            kv_stacked = (ck, cv, layer_idx)

        def upd_all(cache, new):
            if new.dtype != cache.dtype:  # trace-time: avoid no-op casts
                new = new.astype(cache.dtype)
            Bc = new.shape[0]
            if Bc <= 8 or slot_map is not None:
                # unrolled per-row dynamic-update-slice (vmap would lower
                # to a scatter)
                for b in range(Bc):
                    row = b if slot_map is None else slot_map[b]
                    cache = jax.lax.dynamic_update_slice(
                        cache, new[None, b : b + 1],
                        (layer_idx, row, 0, start[b], 0),
                    )
                return cache
            return _scatter_large(cache, new, layer_idx, start)

        if kv_stacked is None:
            ck = upd_all(ck, kw)
            cv = upd_all(cv, vw)
            k_full = jax.lax.dynamic_index_in_dim(ck, layer_idx, 0,
                                                  keepdims=False)
            v_full = jax.lax.dynamic_index_in_dim(cv, layer_idx, 0,
                                                  keepdims=False)
            if slot_map is not None and not isinstance(mask_bias, tuple):
                # compact-chunk XLA fallback: gather the mapped cache rows
                k_full = jnp.take(k_full, slot_map, axis=0)
                v_full = jnp.take(v_full, slot_map, axis=0)
            kv_out = (ck, cv)  # k_full/v_full are (B, G, T, D)

    if isinstance(mask_bias, tuple):
        # serving fast path: Pallas flash/ragged attention, mask from lengths
        from ..ops import pallas_attention as PA

        kind, lengths = mask_bias
        sm_scale = 1.0 / float(np.sqrt(D))
        if k_full is not None:  # None = layer-indexed stacked-cache path
            kc = k_full.astype(q.dtype)
            vc = v_full.astype(q.dtype)
        if kind == "flash_prefill_chunk":
            # chunked prefill: queries at absolute offsets attend the whole
            # cache below them (paged: over a gathered dense view — the
            # decode hot path never gathers, models/paged_kv.py)
            if len(lengths) == 3:
                chunk_lengths, chunk_starts, chunk_rmap = lengths
            else:
                chunk_lengths, chunk_starts = lengths
                chunk_rmap = None
            if paged and rt.mesh is None and S * Hg <= 512:
                # small chunks (speculative verify runs this EVERY step):
                # attend the pool directly — page DMAs are O(start + S)
                # per layer, vs gather_layer materializing the whole
                # (B, G, MP·P, D) view per layer per step
                ctx = PA.flash_attention_chunk_paged(
                    q, kv_out[0], kv_out[1], kv_write.layer_idx,
                    kv_write.page_table, chunk_starts, sm_scale,
                    row_map=chunk_rmap,
                )
                attn_in_tap = ctx.reshape(B, S, G * Hg * D)
            else:
                if paged:
                    from . import paged_kv as PK

                    kc = PK.gather_layer(kv_out[0], kv_write.layer_idx,
                                         kv_write.page_table).astype(q.dtype)
                    vc = PK.gather_layer(kv_out[1], kv_write.layer_idx,
                                         kv_write.page_table).astype(q.dtype)
                ctx = PA.flash_attention_prefill(
                    q, kc, vc, chunk_lengths, sm_scale,
                    rt.attn_block_q, rt.attn_block_k, q_starts=chunk_starts,
                    kv_row_map=chunk_rmap,
                )
                attn_in_tap = ctx.reshape(B, S, G * Hg * D)
        elif kind == "flash_prefill":
            if rt.mesh is not None and rt.kv_shard_t:
                # sequence-parallel ring attention over the model axis: q/k/v
                # shard S (a local slice — they arrive replicated), KV shards
                # rotate on the ICI ring (parallel/ring_attention.py); pairs
                # with the T-sharded cache so no device ever holds full KV
                from ..parallel.ring_attention import ring_attention

                ctx = ring_attention(
                    q, k.astype(q.dtype), v.astype(q.dtype), lengths,
                    rt.mesh, "model", sm_scale,
                )
                attn_in_tap = ctx.reshape(B, S, G * Hg * D)
            elif rt.mesh is not None:
                ctx = PA.flash_attention_prefill_sharded(
                    q, kc, vc, lengths, sm_scale, rt.mesh,
                    rt.attn_block_q, rt.attn_block_k,
                )
            else:
                ctx = PA.flash_attention_prefill(
                    q, kc, vc, lengths, sm_scale, rt.attn_block_q, rt.attn_block_k
                )
            attn_in_tap = ctx.reshape(B, S, G * Hg * D)
        else:  # flash_decode: S == 1
            if paged and rt.mesh is not None and rt.paged_shard_model:
                ctx = PA.flash_attention_decode_paged_msharded(
                    q[:, 0], kv_out[0], kv_out[1], kv_write.layer_idx,
                    kv_write.page_table, lengths, sm_scale, rt.mesh,
                )
            elif paged and rt.mesh is not None:
                ctx = PA.flash_attention_decode_paged_sharded(
                    q[:, 0], kv_out[0], kv_out[1], kv_write.layer_idx,
                    kv_write.page_table, lengths, sm_scale, rt.mesh,
                )
            elif paged:
                ctx = PA.flash_attention_decode_paged(
                    q[:, 0], kv_out[0], kv_out[1], kv_write.layer_idx,
                    kv_write.page_table, lengths, sm_scale,
                )
            elif kv_stacked is not None:
                sck, scv, slay = kv_stacked
                bk = rt.decode_block_k(sck.shape[3])
                if rt.mesh is not None:
                    ctx = PA.flash_attention_decode_idx_sharded(
                        q[:, 0], sck, scv, slay, lengths, sm_scale, rt.mesh,
                        bk
                    )
                else:
                    ctx = PA.flash_attention_decode_idx(
                        q[:, 0], sck, scv, slay, lengths, sm_scale, bk
                    )
            elif rt.mesh is not None and rt.kv_shard_t:
                ctx = PA.flash_attention_decode_kv_tsharded(
                    q[:, 0], kc, vc, lengths, sm_scale, rt.mesh,
                    rt.decode_block_k(kc.shape[2])
                )
            elif rt.mesh is not None:
                ctx = PA.flash_attention_decode_sharded(
                    q[:, 0], kc, vc, lengths, sm_scale, rt.mesh,
                    rt.decode_block_k(kc.shape[2])
                )
            elif rt.decode_attn_v2:
                ctx = PA.flash_attention_decode_v2(
                    q[:, 0], kc, vc, lengths, sm_scale, rt.attn_block_k
                )
            else:
                ctx = PA.flash_attention_decode(
                    q[:, 0], kc, vc, lengths, sm_scale,
                    rt.decode_block_k(kc.shape[2])
                )
            attn_in_tap = ctx.reshape(B, 1, G * Hg * D)
    else:
        attn_drop = None
        ffn_rng = None
        if dropout is not None:
            rate, rng = dropout
            arng, ffn_rng = jax.random.split(rng)
            attn_drop = (rate, arng)
        attn_in_tap = _attention_scores(
            q, k_full.astype(q.dtype), v_full.astype(q.dtype), mask_bias,
            dropout=attn_drop,
            kv_layout="btgd" if kv_write is None else "bgtd",
        )
    attn_out = quant_linear(attn_in_tap, layer_params["o_proj"], quant_type,
                            rt, tp_mode="row")
    x = x + attn_out

    h2 = rms_norm(x, layer_params["ffn_ln"]["weight"], config.layernorm_epsilon)
    gate_in = quant_linear(h2, layer_params["w_in_h"], quant_type, rt,
                           tp_mode="col")
    gate = quant_linear(h2, layer_params["w_in_gate"], quant_type, rt,
                        tp_mode="col")
    act = jax.nn.silu(gate_in) * gate
    if dropout is not None and not isinstance(mask_bias, tuple):
        act = _dropout(act, dropout[0], ffn_rng)
    ffn = quant_linear(act, layer_params["w_out"], quant_type, rt,
                       tp_mode="row")
    x = x + ffn
    if collect_taps:
        taps = {"qkv_in": h, "o_in": attn_in_tap, "w_in_in": h2, "w_out_in": act}
        return x, kv_out, taps
    return x, kv_out


# ---------------------------------------------------------------------------
# Parity-mode forward (reference semantics incl. mask/positions/loss)
# ---------------------------------------------------------------------------

def build_parity_mask_and_positions(attention_mask: jax.Array, n_new: int):
    """(B, S) 1/0 mask → additive (B, n_new, S) fp32 mask and (B, n_new)
    position ids, exactly as reference ``prepare_input`` (model.py:303-318):
    causal ∨ padding, ×(−1e10); position_ids = cumsum(mask) (starts at 1),
    both aligned to the last ``n_new`` query positions.
    """
    B, S = attention_mask.shape
    position_ids = jnp.cumsum(attention_mask, axis=1)
    seq = jnp.arange(S)
    causal = seq[:, None] < seq[None, :]
    pad = ~attention_mask[:, None, :].astype(bool)
    bias = (causal[None] | pad).astype(jnp.float32) * MASK_VALUE
    return bias[:, -n_new:, :], position_ids[:, -n_new:]


def forward(
    params: dict,
    config: ChatGLM2Config,
    input_ids: jax.Array,                       # (B, S_new)
    attention_mask: Optional[jax.Array] = None, # (B, S_total) 1/0
    position_ids: Optional[jax.Array] = None,   # (B, S_new)
    labels: Optional[jax.Array] = None,         # (B, S_new), −100 = ignore
    quant_type: str = "none",
    dtype=jnp.float32,
    rt: TpuRuntimeConfig = _DEFAULT_RT,
    past_key_values=None,
    dropout_rng: Optional[jax.Array] = None,
    return_kv: bool = False,
):
    """Full-sequence forward, reference semantics (model.py:329-392).

    ``past_key_values`` reproduces the reference's stateless incremental
    API: a tuple of per-layer ``(k, v)`` — each ``(B, T_past, G, D)`` or the
    reference's ``(B, T_past, G, 1, D)`` — or a pre-stacked
    ``(k (L,B,T,G,D), v)`` pair; the new tokens attend over past+new keys
    with cumsum positions continuing past the prefix (model.py:297-318).

    ``dropout_rng`` enables train-mode dropout at ``config.dropout_rate``
    (embedding output, attention probs, FFN activation — model.py:369, :171,
    :201); omit it for deterministic eval (nn.Dropout in eval mode).

    Returns ``(loss | None, logits (B, S_new, V))``; with ``return_kv`` or a
    ``past_key_values`` input, returns the reference's 3-tuple with
    ``current_key_values`` (per-layer ``(B, T_total, G, 1, D)``) appended.
    """
    B, S = input_ids.shape
    L = config.num_layers

    past_k = past_v = None
    if past_key_values is not None:
        if isinstance(past_key_values, (tuple, list)):
            def norm_kv(t):
                t = jnp.asarray(t)
                return t[:, :, :, 0, :] if t.ndim == 5 else t
            past_k = jnp.stack([norm_kv(k) for k, _ in past_key_values])
            past_v = jnp.stack([norm_kv(v) for _, v in past_key_values])
        else:
            past_k, past_v = past_key_values
    n_past = 0 if past_k is None else past_k.shape[2]

    if attention_mask is None:
        attention_mask = jnp.ones((B, n_past + S), jnp.int32)
    mask_bias, pos = build_parity_mask_and_positions(attention_mask, S)
    if position_ids is not None:
        pos = position_ids

    freqs_table = jnp.asarray(
        # +1 row: cumsum positions are 1-based, so a full-context sequence's
        # last position indexes row max_sequence_length (the reference would
        # IndexError there; clamping would silently repeat a rotation)
        precompute_freqs_cis(config.head_hidden_size,
                             config.max_sequence_length + 1)
    ).astype(dtype)
    freqs_cis = freqs_table[pos]  # (B, S, D)

    h = quant_embedding_lookup(params["word_embedding"], input_ids, quant_type, dtype)
    mask5 = mask_bias[:, None, None, :, :]

    rate = config.dropout_rate
    use_drop = dropout_rng is not None and rate > 0
    layer_rngs = None
    if use_drop:
        demb, dlayers = jax.random.split(dropout_rng)
        h = _dropout(h, rate, demb)
        layer_rngs = jax.random.split(dlayers, L)

    collect_kv = return_kv or past_key_values is not None

    def scan_body(h, inp):
        layer_params, pkv, rng_l = inp
        h, kv = block_forward(
            layer_params, h, freqs_cis, mask5, config, quant_type, rt,
            kv_write=None, past_kv=pkv,
            dropout=(rate, rng_l) if rng_l is not None else None,
        )
        return h, (kv if collect_kv else None)

    xs = (
        params["layers"],
        (past_k, past_v) if past_k is not None else None,
        layer_rngs,
    )
    if rt.remat_layers:
        # scan-over-remat-blocks: activations of each layer are recomputed
        # in the backward pass instead of stored — training activation
        # memory drops from O(L) to O(1) layers (the standard TPU trade of
        # FLOPs for HBM; matmul-heavy blocks recompute nearly for free
        # under the MXU roof).  Exact same math — grads bit-match the
        # plain scan (tests/test_parallel.py).  prevent_cse=False: scan
        # already rules out the CSE hazard the default barriers guard
        # against (documented jax.checkpoint-under-scan form); keeping the
        # barriers would block XLA fusion in the backward pass.
        scan_body = jax.checkpoint(scan_body, prevent_cse=False)
    h, kvs = jax.lax.scan(scan_body, h, xs)

    h = rms_norm(h, params["final_ln"]["weight"], config.layernorm_epsilon)
    logits = quant_linear(h, params["lm_head"], quant_type, rt, tp_mode="col")
    logits = logits[..., : config.vocab_size]  # strip lm_head N padding

    loss = None
    if labels is not None:
        loss = cross_entropy_loss(logits, labels)
    if collect_kv:
        k_all, v_all = kvs
        current = tuple(
            (k_all[i][:, :, :, None, :], v_all[i][:, :, :, None, :])
            for i in range(L)
        )
        return loss, logits, current
    return loss, logits


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Shifted CE with −100 ignore index, mean over valid tokens
    (model.py:384-388)."""
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_loss = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    token_loss = jnp.where(valid, token_loss, 0.0)
    return jnp.sum(token_loss) / jnp.maximum(jnp.sum(valid), 1)


# ---------------------------------------------------------------------------
# Serving-mode forward: prefill + decode_step over a preallocated cache
# ---------------------------------------------------------------------------

def _serving_freqs(config, positions, dtype):
    # +1 row: serving positions are 1-based (position = lengths + 1), so the
    # final token of a FULL-context sequence indexes row max_sequence_length
    # — without it the gather clamps and that token silently reuses the
    # previous position's rotation
    table = jnp.asarray(
        precompute_freqs_cis(config.head_hidden_size,
                             config.max_sequence_length + 1)
    ).astype(dtype)
    return table[positions]


_STACKED_LINEARS = ("q_proj", "kv_proj", "o_proj", "w_in_h", "w_in_gate",
                    "w_out")


def stacked_layer_params(layers: dict, quant_type: str, rt):
    """(small-leaf xs tree, fn(idx, small_i) → per-layer params).

    When the layer-indexed kernel path applies (quantized, single device),
    the big weight/scale leaves become ops.linear.StackedWeight so the
    Pallas kernels DMA layer ``idx`` blocks straight from the stacked
    arrays — XLA-slicing them per scan step materializes a full per-layer
    weight copy as the custom-call operand (~35% of the int4 decode step,
    docs/RESULTS.md round 4).  Small leaves (norms, biases) slice as
    before.  Returns (None, None) when the mode does not apply."""
    if rt.mesh is not None or quant_type not in ("int8", "int4g32"):
        return None, None
    from ..ops.linear import StackedWeight

    small = {k: v for k, v in layers.items() if k not in _STACKED_LINEARS}

    def make(i, small_i):
        lp = dict(small_i)
        for name in _STACKED_LINEARS:
            leaf = layers[name]
            entry = {
                "weight": StackedWeight(leaf["weight"], i),
                "weight_scale": StackedWeight(leaf["weight_scale"], i),
            }
            if "bias" in leaf:
                entry["bias"] = leaf["bias"][i]
            lp[name] = entry
        return lp

    return small, make


def tile_layer_weights(params: dict, quant_type: str, bn: int = 1024) -> dict:
    """Opt-in serving-layout transform: pre-tile the stacked int4 linears'
    columns (ops/quant.tile_int4_stack) so the layer-indexed kernels' block
    DMAs are contiguous HBM spans instead of bn-byte-strided column slices
    (~+9% decode bandwidth; docs/RESULTS.md round 4).  One-time, at load:
    numerics identical; linears whose N doesn't tile (kv_proj at bn=1024)
    keep the flat layout.  Checkpoints are unaffected — this is an
    in-memory layout only."""
    if quant_type != "int4g32":
        return params
    from ..ops.quant import tile_int4_stack

    layers = dict(params["layers"])
    for name in _STACKED_LINEARS:
        leaf = dict(layers[name])
        if getattr(leaf["weight"], "ndim", 0) != 3:
            continue  # already tiled / not stacked
        t = tile_int4_stack(leaf["weight"], leaf["weight_scale"], bn)
        if t is not None:
            leaf["weight"], leaf["weight_scale"] = t
            layers[name] = leaf
    return {**params, "layers": layers}


def _layers_scan_serving(params, config, quant_type, rt, h, freqs_cis, mask5,
                         cache, start, slot_map=None):
    """Scan blocks over stacked layer params; the full KV cache rides the
    scan CARRY and each layer performs tiny in-place index writes (stacking
    per-layer cache outputs through scan ys would rewrite the entire cache
    every step)."""
    L = config.num_layers
    small, make = stacked_layer_params(params["layers"], quant_type, rt)

    def scan_body(carry, inp):
        h, ck, cv = carry
        if make is not None:
            layer_idx, small_i = inp
            layer_params = make(layer_idx, small_i)
        else:
            layer_idx, layer_params = inp
        kvw = ((ck, cv, layer_idx, start) if slot_map is None
               else (ck, cv, layer_idx, start, slot_map))
        h, (ck, cv) = block_forward(
            layer_params, h, freqs_cis, mask5, config, quant_type, rt,
            kv_write=kvw,
        )
        return (h, ck, cv), None

    xs = ((jnp.arange(L), small) if make is not None
          else (jnp.arange(L), params["layers"]))
    (h, new_k, new_v), _ = jax.lax.scan(scan_body, (h, cache.k, cache.v), xs)
    return h, new_k, new_v


def prefill(
    params: dict,
    config: ChatGLM2Config,
    input_ids: jax.Array,   # (B, S) right-padded
    lengths: jax.Array,     # (B,) true lengths
    cache: KVCache,
    quant_type: str = "none",
    dtype=jnp.bfloat16,
    rt: TpuRuntimeConfig = _DEFAULT_RT,
):
    """Prefill the cache from position 0 and return last-token logits (B, V).

    Rows are right-padded; padded slots are written to the cache but masked
    out of all attention by per-row lengths, and overwritten by later decode
    steps.  Positions are 1-based to match the reference's
    ``cumsum(attention_mask)`` convention (model.py:306-307).
    """
    B, S = input_ids.shape
    T = cache.max_length
    positions = jnp.arange(1, S + 1)[None, :].repeat(B, axis=0)
    freqs_cis = _serving_freqs(config, positions, dtype)

    h = quant_embedding_lookup(params["word_embedding"], input_ids, quant_type, dtype)

    tsh = rt.kv_shard_t
    if tsh and rt.mesh is not None:
        tp = dict(zip(rt.mesh.axis_names, rt.mesh.devices.shape)).get("model", 1)
        ring_ok = S % tp == 0
    else:
        ring_ok = False
    if rt.flash_enabled() and (not tsh or ring_ok):
        # Pallas blockwise causal attention over the freshly written cache
        # (only the first S cache slots are ever addressed: causality bounds
        # every query's keys to slots < S).  With a T-sharded cache
        # (kv_shard_t) this dispatches to sequence-parallel ring attention
        # (block_forward), requiring S divisible by the model axis; else the
        # XLA path partitions the masked einsum itself.
        mask5 = ("flash_prefill", lengths.astype(jnp.int32))
    else:
        # query t attends cache slots j ≤ t (cache slot j holds token j)
        tq = jnp.arange(S)[:, None]
        tk = jnp.arange(T)[None, :]
        bias = jnp.where(tk <= tq, 0.0, MASK_VALUE).astype(jnp.float32)  # (S, T)
        mask5 = bias[None, None, None, :, :]

    start = jnp.zeros((B,), jnp.int32)
    h, new_k, new_v = _layers_scan_serving(
        params, config, quant_type, rt, h, freqs_cis, mask5, cache, start
    )

    h = rms_norm(h, params["final_ln"]["weight"], config.layernorm_epsilon)
    # only the last valid position's logits are needed
    last = jnp.take_along_axis(h, (lengths - 1)[:, None, None], axis=1)[:, 0]
    logits = quant_linear(last, params["lm_head"], quant_type, rt, tp_mode="col")
    logits = logits[..., : config.vocab_size]

    new_cache = KVCache(k=new_k, v=new_v, lengths=lengths.astype(jnp.int32))
    return logits, new_cache


def prefill_chunk(
    params: dict,
    config: ChatGLM2Config,
    input_ids: jax.Array,    # (B, Sc) one chunk of prompt tokens
    starts: jax.Array,       # (B,) absolute position of the chunk's first token
    chunk_valid: jax.Array,  # (B,) valid tokens in this chunk (≤ Sc)
    cache: KVCache,
    quant_type: str = "none",
    dtype=jnp.bfloat16,
    rt: TpuRuntimeConfig = _DEFAULT_RT,
    slot_map: Optional[jax.Array] = None,  # (B,) chunk row → cache row
    return_all_logits: bool = False,
):
    """Process one chunk of a long prompt: write KV at ``starts`` and attend
    causally over the WHOLE cache below each query's absolute position.

    ``return_all_logits`` returns logits for EVERY chunk position
    (B, Sc, V) instead of the last valid one — the verification step of
    speculative decoding (serving/speculative.py) judges all draft
    positions from one such call.

    Chunked prefill bounds the per-admission device step so decode streams
    are not stalled by a long prompt (serving/engine.py) and the compile set
    stays one program regardless of prompt length.  Row lengths become
    ``starts + chunk_valid``; returns logits at each row's last valid chunk
    position (meaningful on the final chunk) and the updated cache.
    ``prefill`` ≡ a single chunk at starts = 0.

    With ``slot_map``, the chunk batch is COMPACT: row i of ``input_ids``
    belongs to cache row ``slot_map[i]`` — writes and attention resolve the
    indirection (flash kernel row maps; no cache-row copies), so the chunk
    computes only the rows actually mid-prefill.  Other cache rows'
    lengths are untouched.
    """
    B, Sc = input_ids.shape
    T = cache.max_length
    positions = starts[:, None] + jnp.arange(1, Sc + 1)[None, :]  # 1-based
    freqs_cis = _serving_freqs(config, positions, dtype)
    h = quant_embedding_lookup(params["word_embedding"], input_ids, quant_type, dtype)

    row_lengths = (starts + chunk_valid).astype(jnp.int32)
    # under a mesh the flash chunk kernel has no sharded wrapper (pallas_call
    # carries no GSPMD rules): take the XLA masked path, which GSPMD shards
    if rt.flash_enabled() and rt.mesh is None:
        payload = (row_lengths, starts.astype(jnp.int32))
        if slot_map is not None:
            payload = payload + (slot_map.astype(jnp.int32),)
        mask5 = ("flash_prefill_chunk", payload)
    else:
        # query r of row b sits at absolute position starts[b] + r and
        # attends cache slots ≤ it (the whole earlier context included)
        tq = jnp.arange(Sc)[None, :, None]
        tk = jnp.arange(T)[None, None, :]
        causal = tk <= starts[:, None, None] + tq
        bias = jnp.where(causal, 0.0, MASK_VALUE).astype(jnp.float32)
        mask5 = bias[:, None, None, :, :]

    h, new_k, new_v = _layers_scan_serving(
        params, config, quant_type, rt, h, freqs_cis, mask5, cache, starts,
        slot_map=slot_map,
    )

    h = rms_norm(h, params["final_ln"]["weight"], config.layernorm_epsilon)
    if return_all_logits:
        logits = quant_linear(h, params["lm_head"], quant_type, rt, tp_mode="col")
    else:
        last = jnp.take_along_axis(h, (chunk_valid - 1)[:, None, None], axis=1)[:, 0]
        logits = quant_linear(last, params["lm_head"], quant_type, rt, tp_mode="col")
    logits = logits[..., : config.vocab_size]

    if slot_map is None:
        new_lengths = row_lengths
    else:
        # one batched scatter (slot_map rows are unique by construction)
        new_lengths = cache.lengths.at[slot_map].set(row_lengths)
    new_cache = KVCache(k=new_k, v=new_v, lengths=new_lengths)
    return logits, new_cache


def decode_step(
    params: dict,
    config: ChatGLM2Config,
    next_ids: jax.Array,  # (B,)
    cache: KVCache,
    quant_type: str = "none",
    dtype=jnp.bfloat16,
    rt: TpuRuntimeConfig = _DEFAULT_RT,
):
    """One autoregressive step: write KV at slot ``lengths``, attend over
    slots ≤ ``lengths``, return logits (B, V) and the updated cache."""
    B = next_ids.shape[0]
    T = cache.max_length
    positions = (cache.lengths + 1)[:, None]  # 1-based
    freqs_cis = _serving_freqs(config, positions, dtype)

    h = quant_embedding_lookup(params["word_embedding"], next_ids[:, None], quant_type, dtype)

    if rt.flash_enabled():
        mask5 = ("flash_decode", cache.lengths.astype(jnp.int32))
    else:
        tk = jnp.arange(T)[None, :]
        valid = tk <= cache.lengths[:, None]  # (B, T): slots 0..len (current incl.)
        bias = jnp.where(valid, 0.0, MASK_VALUE).astype(jnp.float32)
        mask5 = bias[:, None, None, None, :]

    h, new_k, new_v = _layers_scan_serving(
        params, config, quant_type, rt, h, freqs_cis, mask5, cache, cache.lengths
    )

    h = rms_norm(h, params["final_ln"]["weight"], config.layernorm_epsilon)
    logits = quant_linear(h[:, 0], params["lm_head"], quant_type, rt,
                          tp_mode="col")
    logits = logits[..., : config.vocab_size]

    new_cache = KVCache(k=new_k, v=new_v, lengths=cache.lengths + 1)
    return logits, new_cache


def multi_step_decode(
    params: dict,
    config: ChatGLM2Config,
    first_ids: jax.Array,   # (B,) first tokens to feed
    cache: KVCache,
    num_steps: int,
    rng: Optional[jax.Array] = None,  # None = greedy
    quant_type: str = "none",
    dtype=jnp.bfloat16,
    rt: TpuRuntimeConfig = _DEFAULT_RT,
    top_k: int = 100,
    top_p: float = 0.8,
    temperature: float = 1.0,
):
    """Run ``num_steps`` decode steps entirely on-device under one jit
    (``lax.scan``), sampling each next token in-graph.

    This is the benchmarking / engine hot loop: it removes every host↔device
    round trip the reference's Python while-loop pays per token
    (decoder.py:76-97, ``.item()`` sync at :85).  Returns (tokens (B, n),
    cache)."""
    from ..ops.sampling import top_p_sampling, greedy_sampling

    def step(carry, rng_step):
        ids, cache = carry
        logits, cache = decode_step(params, config, ids, cache, quant_type, dtype, rt)
        if rng is None:
            nxt = greedy_sampling(logits)
        else:
            nxt = top_p_sampling(rng_step, logits, top_k, top_p, temperature)
        return (nxt, cache), nxt

    rngs = (
        jax.random.split(rng, num_steps)
        if rng is not None
        else jnp.zeros((num_steps, 2), jnp.uint32)
    )
    (last, cache), toks = jax.lax.scan(step, (first_ids, cache), rngs)
    return toks.T, cache


# ---------------------------------------------------------------------------
# Random init (structure also serves as the param-tree schema)
# ---------------------------------------------------------------------------

def _init_linear(rng, k, n, bias, quant_type, dtype, scale=0.02):
    w = jax.random.normal(rng, (k, n), jnp.float32) * scale
    if quant_type == "none":
        p = {"weight": w.astype(dtype)}
    elif quant_type == "int8":
        p = Q.quantize_linear_int8(w)
    elif quant_type == "int4g32":
        p = Q.quantize_linear_int4(w)
    else:
        raise NotImplementedError(quant_type)
    if bias:
        p["bias"] = jnp.zeros((n,), dtype)
    return p


def init_params(
    rng: jax.Array,
    config: ChatGLM2Config,
    quant_type: str = "none",
    dtype=jnp.float32,
) -> dict:
    """Random-init parameter pytree (tiny-model tests, benchmarks)."""
    H, I = config.hidden_size, config.inner_hidden_size
    V, L = config.vocab_size, config.num_layers
    keys = jax.random.split(rng, 16)

    emb_w = jax.random.normal(keys[0], (V, H), jnp.float32) * 0.02
    if quant_type == "none":
        emb = {"weight": emb_w.astype(dtype)}
    elif quant_type == "int8":
        emb = Q.quantize_embedding_int8(emb_w)
    else:
        emb = Q.quantize_embedding_int4(emb_w)

    def stacked_linear(rng, k, n, bias):
        rngs = jax.random.split(rng, L)
        return jax.vmap(
            lambda r: _init_linear(r, k, n, bias, quant_type, dtype)
        )(rngs)

    def pad_n(p):
        if quant_type == "none":
            return p
        return jax.vmap(lambda q: Q.pad_linear_n(q, quant_type))(p)

    layers = {
        "attn_ln": {"weight": jnp.ones((L, H), dtype)},
        "q_proj": stacked_linear(keys[1], H, config.q_size, True),
        "kv_proj": stacked_linear(keys[2], H, 2 * config.kv_size, True),
        "o_proj": stacked_linear(keys[3], config.q_size, H, False),
        "ffn_ln": {"weight": jnp.ones((L, H), dtype)},
        "w_in_h": pad_n(stacked_linear(keys[4], H, I, False)),
        "w_in_gate": pad_n(stacked_linear(keys[5], H, I, False)),
        "w_out": stacked_linear(keys[6], I, H, False),
    }

    return {
        "word_embedding": emb,
        "layers": layers,
        "final_ln": {"weight": jnp.ones((H,), dtype)},
        "lm_head": Q.lmhead_pad(
            _init_linear(keys[7], H, V, False, quant_type, dtype), quant_type
        ),
    }
