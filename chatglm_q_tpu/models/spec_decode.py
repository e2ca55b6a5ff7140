"""In-graph speculative decoding over the paged KV cache.

The host-side speculative decoder (serving/speculative.py + GLMDecoder)
pays a host round trip per verification; this module keeps the ENTIRE
draft→verify→accept loop inside one ``lax.scan``, the TPU way:

* a device-side token ring (B, T) holds each row's prompt + generation
  history; the draft for a step is found by a vectorized n-gram match over
  that buffer (a few hundred VPU ops — invisible next to the forward);
* verification is one (B, k+1)-token chunked forward over the paged cache
  (prefill_chunk_paged with unaligned token writes), whose extra k rows
  ride the same weight stream a single decode step already pays — decode
  is HBM-bound, so accepted tokens are nearly free;
* acceptance, next-token selection and ragged per-row length advances are
  all vectorized; the host sees only the per-step (draft, accept, next)
  triples at chunk boundaries.

Greedy-exact: rows accept exactly the tokens step-by-step greedy would
have produced (row i's argmax after context+draft[:i] must equal
draft[i]); rows with no n-gram match draft the impossible token −1 and
degrade to a plain decode step.  Rejected positions' KV/token writes sit
above the rolled-back lengths and are overwritten later — the engine's
standard invalidation rule.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ChatGLM2Config, TpuRuntimeConfig
from . import paged_kv as PK

_DEFAULT_RT = TpuRuntimeConfig()


def find_drafts(tokbuf: jax.Array, lengths: jax.Array, ngram: int, k: int):
    """Vectorized prompt-lookup drafting.

    tokbuf (B, T) int32 token history per row (valid below ``lengths``);
    returns (B, k) draft token ids, with −1 fillers where no draft exists
    (−1 never equals an argmax, so such positions are simply rejected).
    The most recent earlier occurrence of the last ``ngram`` tokens wins.
    """
    B, T = tokbuf.shape
    g = ngram
    # tail (B, g): tokens at lengths-g+i
    tail_idx = lengths[:, None] - g + jnp.arange(g)[None, :]
    tail = jnp.take_along_axis(tokbuf, jnp.clip(tail_idx, 0, T - 1), axis=1)
    # match[p]: tokbuf[p : p+g] == tail, for p in [0, T-g)
    match = jnp.ones((B, T - g), bool)
    for i in range(g):
        match &= tokbuf[:, i : T - g + i] == tail[:, i : i + 1]
    # occurrence must be strictly earlier than the tail itself and the row
    # must actually have a g-token tail
    p_range = jnp.arange(T - g)[None, :]
    valid = (p_range <= lengths[:, None] - g - 1) & (lengths[:, None] >= g + 1)
    match &= valid
    p_star = jnp.max(jnp.where(match, p_range, -1), axis=1)      # (B,)
    has = p_star >= 0
    src = p_star[:, None] + g + jnp.arange(k)[None, :]           # (B, k)
    draft = jnp.take_along_axis(tokbuf, jnp.clip(src, 0, T - 1), axis=1)
    # only positions that are real history may be drafted
    ok = has[:, None] & (src < lengths[:, None])
    return jnp.where(ok, draft, -1)


def spec_accept_next(rng, probs, indices, draft, argm, greedy):
    """Exact speculative acceptance at ONE position for point-mass drafts.

    ``probs``/``indices`` (B, K): the row's target filtered distribution
    (ops/sampling.top_p_filter); ``draft`` (B,) the proposed token;
    ``argm`` (B,) the greedy argmax; ``greedy`` (B,) bool.  Sampled rows
    accept the draft d with probability p(d) and, when this position ends
    the cascade, emit a sample from p restricted to x ≠ d (the rejection-
    sampling residual — for a deterministic draft q = δ_d the accepted/
    residual mixture is EXACTLY p, so spec streams are distribution-exact);
    greedy rows accept iff argm == draft and emit argm.  Returns
    (accept (B,) bool, stop_next (B,) int32).
    """
    u_key, r_key = jax.random.split(rng)
    is_draft = indices == draft[:, None]
    p_d = jnp.sum(jnp.where(is_draft, probs, 0.0), axis=-1)
    accept_s = jax.random.uniform(u_key, p_d.shape) < p_d
    resid = jnp.where(is_draft, 0.0, probs)
    rsum = jnp.sum(resid, axis=-1, keepdims=True)
    # p(d) == 1 → empty residual; acceptance then fires almost surely and
    # the (never-emitted) fallback just needs to be a valid distribution
    resid = jnp.where(rsum > 0, resid / jnp.maximum(rsum, 1e-30),
                      1.0 / probs.shape[-1])
    choice = jax.random.categorical(
        r_key, jnp.log(jnp.maximum(resid, 1e-30)), axis=-1)
    resample = jnp.take_along_axis(indices, choice[:, None], axis=-1)[:, 0]
    accept = jnp.where(greedy, argm == draft, accept_s)
    stop_next = jnp.where(greedy, argm, resample).astype(jnp.int32)
    return accept, stop_next


def _write_token_rows(tokbuf, seq, starts):
    """Write seq (B, S) into tokbuf (B, T) at per-row starts (unrolled).

    Drop-mode scatter, NOT dynamic_update_slice: near the buffer end the
    slice clamp would shift the write window down and overwrite committed
    history BELOW lengths — corrupting the n-gram search buffer (drafts
    would silently degrade to always-rejected)."""
    B, S = seq.shape
    for b in range(B):
        tokbuf = tokbuf.at[b, starts[b] + jnp.arange(S)].set(
            seq[b], mode="drop")
    return tokbuf


def speculative_decode_paged(
    params: dict,
    config: ChatGLM2Config,
    first_tok: jax.Array,     # (B,) pending tokens (already emitted)
    cache: PK.PagedKVCache,
    tokbuf: jax.Array,        # (B, T) token history, valid below lengths
    n_steps: int,
    k: int = 8,
    ngram: int = 3,
    quant_type: str = "none",
    dtype=jnp.bfloat16,
    rt: TpuRuntimeConfig = _DEFAULT_RT,
    rng: jax.Array | None = None,
    sampling=None,            # (temperature (B,), top_p (B,), top_k_limit (B,))
    top_k: int = 100,
):
    """Run ``n_steps`` in-graph verify steps.  Each step consumes the
    carried token, writes it + its k drafts, and advances each row by
    ``1 + accept`` positions.

    Greedy by default (rows accept exactly the step-by-step argmax
    stream).  With ``rng`` + ``sampling``, rows with temperature > 0
    instead run exact rejection sampling against the reference top-k/top-p
    filter (``spec_accept_next``): the emitted stream is drawn from
    EXACTLY the per-step sampling distribution (not bit-equal to the
    non-speculative stream — it consumes randomness differently — but
    distribution-identical); temperature == 0 rows keep the greedy rule,
    so mixed batches share one program.

    Returns (drafts (n, B, k), accepts (n, B), nexts (n, B), cache,
    tokbuf): step s of row b emitted ``drafts[s, b, :accepts[s, b]]``
    followed by ``nexts[s, b]``.
    """
    KT = k + 1
    B = first_tok.shape[0]
    if sampling is not None:
        assert rng is not None, "sampled speculation needs an rng"
        temperature, top_p, top_k_limit = sampling
        safe_t = jnp.where(temperature > 0, temperature, 1.0)
        greedy_rows = temperature <= 0

    def step(carry, step_rng):
        tok, cache, tokbuf = carry
        l0 = cache.lengths
        # the pending token is part of the search history (the n-gram tail
        # ends with it — one step fresher than searching without it)
        tokbuf = _write_token_rows(tokbuf, tok[:, None], l0)
        draft = find_drafts(tokbuf, l0 + 1, ngram, k)            # (B, k)
        seq = jnp.concatenate([tok[:, None], draft], axis=1)     # (B, KT)
        safe_seq = jnp.maximum(seq, 0)
        tokbuf = _write_token_rows(tokbuf, safe_seq[:, 1:], l0 + 1)
        all_logits, cache = PK.prefill_chunk_paged(
            params, config, safe_seq, l0, jnp.full((B,), KT, jnp.int32),
            cache, quant_type, dtype, rt,
            return_all_logits=True, page_aligned=False,
        )
        argm = jnp.argmax(all_logits, axis=-1).astype(jnp.int32)  # (B, KT)
        if sampling is None:
            eq = (argm[:, :k] == draft).astype(jnp.int32)
            accept = jnp.cumprod(eq, axis=1).sum(axis=1)          # (B,)
            nxt = jnp.take_along_axis(argm, accept[:, None], axis=1)[:, 0]
        else:
            from ..ops.sampling import top_p_filter

            probs, indices = top_p_filter(
                all_logits, top_k, top_p[:, None, None],
                safe_t[:, None, None], top_k_limit[:, None, None],
            )                                                     # (B, KT, K)
            accepts_i = []
            stops_i = []
            keys = jax.random.split(step_rng, k + 1)
            for i in range(k):
                a_i, s_i = spec_accept_next(
                    keys[i], probs[:, i], indices[:, i], draft[:, i],
                    argm[:, i], greedy_rows,
                )
                accepts_i.append(a_i.astype(jnp.int32))
                stops_i.append(s_i)
            # position k ends an all-accepted cascade: a plain draw from
            # the filtered distribution (greedy rows: argmax)
            logp = jnp.log(jnp.maximum(probs[:, k], 1e-30))
            full_choice = jax.random.categorical(keys[k], logp, axis=-1)
            full_next = jnp.take_along_axis(
                indices[:, k], full_choice[:, None], axis=-1)[:, 0]
            stops_i.append(jnp.where(greedy_rows, argm[:, k],
                                     full_next).astype(jnp.int32))
            eq = jnp.stack(accepts_i, axis=1)                     # (B, k)
            accept = jnp.cumprod(eq, axis=1).sum(axis=1)          # (B,)
            nxt = jnp.take_along_axis(
                jnp.stack(stops_i, axis=1), accept[:, None], axis=1)[:, 0]
        # clamp to capacity: a spec chunk near the wall advances by up to
        # k+1 — past the table's last slot the writes clamp (write_pages)
        # and the host rolls the tokens back, so lengths must not grow
        # past what the page table can address either
        new_len = jnp.minimum(l0 + 1 + accept, cache.max_length - 1)
        cache = cache.replace(lengths=new_len.astype(jnp.int32))
        return (nxt, cache, tokbuf), (draft, accept, nxt)

    xs = (jax.random.split(rng, n_steps) if sampling is not None
          else jnp.zeros((n_steps,)))
    (last, cache, tokbuf), (drafts, accepts, nexts) = jax.lax.scan(
        step, (first_tok, cache, tokbuf), xs, length=n_steps)
    return drafts, accepts, nexts, cache, tokbuf
