"""Token sampling ops (jit-friendly).

`top_p_sampling` re-creates the reference sampler exactly
(/root/reference/chatglm_q/decoder.py:12-27): softmax(logits/temperature) →
top-k(100) → zero out tokens where (cumsum − prob) > top_p (always keeping
the first) → renormalize → multinomial draw.  The multinomial draw maps to
``jax.random.categorical`` over the renormalized log-probs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def top_p_filter(
    logits: jax.Array,       # (..., V)
    top_k: int = 100,
    top_p: float = 0.8,
    temperature: float = 1.0,
    top_k_limit: jax.Array | None = None,   # (..., 1) per-row k ≤ top_k
):
    """The reference sampler's filtering without the draw: softmax/T →
    top-k → top-p mask (always keeping the first) → renormalize.  Returns
    (probs (..., top_k) summing to 1, vocab indices (..., top_k)) — the
    exact target distribution, needed in full by speculative acceptance
    (models/spec_decode.py)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32) / temperature, axis=-1)
    probs, indices = jax.lax.top_k(probs, top_k)          # sorted descending
    if top_k_limit is not None:
        pos = jnp.arange(top_k)
        probs = jnp.where(pos < top_k_limit, probs, 0.0)
    cumsum = jnp.cumsum(probs, axis=-1)
    probs = jnp.where((cumsum - probs) > top_p, 0.0, probs)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    return probs, indices


@partial(jax.jit, static_argnames=("top_k",))
def top_p_sampling(
    rng: jax.Array,
    logits: jax.Array,       # (..., V)
    top_k: int = 100,
    top_p: float = 0.8,
    temperature: float = 1.0,
    top_k_limit: jax.Array | None = None,   # (..., 1) per-row k ≤ top_k
) -> jax.Array:
    """Sample token ids (...,) int32 from logits.

    ``top_k`` is the static sort width; ``top_k_limit`` optionally narrows it
    per row (so one compiled program serves mixed per-request top_k values,
    as the batching engine needs).
    """
    probs, indices = top_p_filter(logits, top_k, top_p, temperature,
                                  top_k_limit)
    # categorical over the masked top-k == multinomial (decoder.py:25)
    logp = jnp.log(jnp.where(probs > 0, probs, 1e-30))
    choice = jax.random.categorical(rng, logp, axis=-1)
    return jnp.take_along_axis(indices, choice[..., None], axis=-1)[..., 0]


def greedy_sampling(logits: jax.Array) -> jax.Array:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
