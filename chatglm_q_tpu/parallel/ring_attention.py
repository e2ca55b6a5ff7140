"""Ring attention — context-parallel causal attention over a mesh axis.

The reference caps context at 8192 with O(S²) attention on one device
(model.py:22, :311-317).  This module implements the sequence-parallel
extension (SURVEY.md §5 "long-context / sequence parallelism"): queries and
KV are sharded along the sequence over a mesh axis; each device computes
blockwise attention of its local queries against the KV shard it currently
holds while the KV shards rotate around the ring (``lax.ppermute`` — XLA
lowers it to ICI neighbor exchanges on TPU, overlapping the transfer with
the attention compute of the current block).  Online-softmax statistics
make the result exactly equal to full attention.

Pure-JAX formulation (collectives, not hand-rolled RDMA): it runs on any
backend — tested against the dense oracle on the virtual CPU mesh — and on
TPU the compiler schedules the ppermute/compute overlap.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MASK_VALUE = -1e30


def _ring_attention_local(q, k, v, lengths, sm_scale, axis_name):
    """Body run per-device under shard_map.

    q: (B, S_loc, G, Hg, D) local query shard (sequence-sharded)
    k, v: (B, S_loc, G, D) local KV shard
    lengths: (B,) replicated valid lengths (global)
    Returns the local output shard (B, S_loc, G, Hg, D).
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, S_loc, G, Hg, D = q.shape

    q_pos = idx * S_loc + jnp.arange(S_loc)          # global slot of each query
    qf = q.astype(jnp.float32)

    perm = [(j, (j + 1) % n) for j in range(n)]

    def compute(stats, k_cur, v_cur, t):
        m, l, acc = stats
        src = (idx - t) % n                           # shard id currently held
        kv_pos = src * S_loc + jnp.arange(S_loc)

        s = jnp.einsum(
            "bsghd,btgd->bghst", qf, k_cur.astype(jnp.float32)
        ) * sm_scale                                  # (B, G, Hg, S_loc, S_kv)
        mask = (kv_pos[None, None, :] <= q_pos[None, :, None]) & (
            kv_pos[None, None, :] < lengths[:, None, None]
        )                                             # (B, S_loc, S_kv)
        s = jnp.where(mask[:, None, None], s, MASK_VALUE)

        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        # zero p at masked positions: a fully-masked block otherwise gets
        # m_next == MASK_VALUE and p == exp(0) == 1, contaminating l/acc —
        # exact rows wipe it later via alpha == 0, but a zero-length row
        # (no valid keys at all) would return mean-of-v garbage instead of
        # the zeros the l == 0 guard below produces
        p = jnp.exp(s - m_next) * mask[:, None, None]
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bghst,btgd->bghsd", p, v_cur.astype(jnp.float32)
        )
        return (m_next, l, acc)

    def step(carry, t):
        stats, k_cur, v_cur = carry
        stats = compute(stats, k_cur, v_cur, t)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (stats, k_nxt, v_nxt), None

    m0 = jnp.full((B, G, Hg, S_loc, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, G, Hg, S_loc, 1), jnp.float32)
    acc0 = jnp.zeros((B, G, Hg, S_loc, D), jnp.float32)
    # n-1 (compute + rotate) steps, then a final compute WITHOUT the dead
    # last rotation (its result was discarded — 1/n of all ring ICI traffic)
    (stats, k_last, v_last), _ = jax.lax.scan(
        step, ((m0, l0, acc0), k, v), jnp.arange(n - 1)
    )
    m, l, acc = compute(stats, k_last, v_last, n - 1)
    l = jnp.where(l == 0.0, 1.0, l)
    out = (acc / l).astype(q.dtype)                   # (B, G, Hg, S_loc, D)
    return out.transpose(0, 3, 1, 2, 4)


def ring_attention(
    q: jax.Array,        # (B, S, G, Hg, D) — S sharded over `axis_name`
    k: jax.Array,        # (B, S, G, D)
    v: jax.Array,        # (B, S, G, D)
    lengths: jax.Array,  # (B,) global valid lengths (replicated)
    mesh: Mesh,
    axis_name: str,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Exact causal MQA attention with the sequence dimension sharded over
    ``axis_name``; equivalent to flash_attention_prefill on one device."""
    from jax import shard_map

    D = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(D))

    seq_spec_q = P(None, axis_name, None, None, None)
    seq_spec_kv = P(None, axis_name, None, None)

    fn = shard_map(
        functools.partial(
            _ring_attention_local, sm_scale=sm_scale, axis_name=axis_name
        ),
        mesh=mesh,
        in_specs=(seq_spec_q, seq_spec_kv, seq_spec_kv, P(None)),
        out_specs=seq_spec_q,
        check_vma=False,
    )
    return fn(q, k, v, lengths)
