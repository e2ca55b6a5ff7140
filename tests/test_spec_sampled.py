"""Speculative decoding for SAMPLED requests: exact rejection sampling
against the reference top-k/top-p filter (models/spec_decode.spec_accept_next).
For a deterministic (prompt-lookup) draft q = δ_d, accepting d with
probability p(d) and otherwise drawing from p restricted to x ≠ d yields
EXACTLY p — verified empirically below — so speculative streams are
distribution-identical to the plain sampler (not bit-equal: randomness is
consumed differently, which is why the engine flag is opt-in)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatglm_q_tpu.config import ChatGLM2Config, GLMLoadConfig, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.models.spec_decode import spec_accept_next
from chatglm_q_tpu.ops.sampling import top_p_filter

CFG = ChatGLM2Config(
    hidden_size=128, inner_hidden_size=256, head_hidden_size=32,
    num_multi_query_groups=2, num_attention_heads=4, num_layers=2,
    vocab_size=256, max_sequence_length=128,
)


def test_spec_accept_next_marginal_is_exact():
    """Empirical distribution of (accept ? draft : residual sample) must
    equal the target filtered distribution, for drafts inside and outside
    the filtered support."""
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(1, 8) * 2.0, jnp.float32)
    probs, indices = top_p_filter(logits, top_k=8, top_p=0.9)
    p = np.zeros(8)
    p[np.asarray(indices)[0]] = np.asarray(probs)[0]

    for draft_tok in (int(np.asarray(indices)[0, 0]),   # the mode
                      int(np.asarray(indices)[0, -1])):  # lowest-ranked
        n = 20000
        keys = jax.random.split(jax.random.PRNGKey(draft_tok), n)
        draft = jnp.full((1,), draft_tok, jnp.int32)
        argm = jnp.asarray([0], jnp.int32)
        greedy = jnp.asarray([False])

        accept, stop_next = jax.vmap(
            lambda k: spec_accept_next(k, probs, indices, draft, argm, greedy)
        )(keys)
        emitted = np.where(np.asarray(accept)[:, 0], draft_tok,
                           np.asarray(stop_next)[:, 0])
        freq = np.bincount(emitted, minlength=8) / n
        # 4 sigma of a binomial proportion at n=20k ≈ 0.014 worst case
        np.testing.assert_allclose(freq, p, atol=0.016)
        # acceptance rate itself must be p(draft)
        np.testing.assert_allclose(np.asarray(accept).mean(), p[draft_tok],
                                   atol=0.016)


def test_spec_accept_next_draft_outside_filter_never_accepts():
    """A draft that the top-p filter zeroed out (or id −1 fillers) must
    always be rejected — and the residual then equals the full filtered
    distribution."""
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(1, 16) * 3.0, jnp.float32)
    probs, indices = top_p_filter(logits, top_k=4, top_p=0.5)
    zeroed = [int(i) for i, q in zip(np.asarray(indices)[0],
                                     np.asarray(probs)[0]) if q == 0.0]
    cand = zeroed[0] if zeroed else -1
    for draft_tok in (cand, -1):
        keys = jax.random.split(jax.random.PRNGKey(3), 512)
        accept, _ = jax.vmap(
            lambda k: spec_accept_next(
                k, probs, indices, jnp.full((1,), draft_tok, jnp.int32),
                jnp.asarray([0], jnp.int32), jnp.asarray([False]))
        )(keys)
        assert not np.asarray(accept).any()


def test_spec_accept_next_greedy_rows():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(3, 8), jnp.float32)
    probs, indices = top_p_filter(logits, top_k=8, top_p=1.0)
    argm = jnp.argmax(logits, -1).astype(jnp.int32)
    draft = jnp.asarray([int(argm[0]), (int(argm[1]) + 1) % 8, -1], jnp.int32)
    accept, nxt = spec_accept_next(
        jax.random.PRNGKey(0), probs, indices, draft, argm,
        jnp.asarray([True, True, True]))
    assert np.asarray(accept).tolist() == [True, False, False]
    assert np.asarray(nxt).tolist() == np.asarray(argm).tolist()


@pytest.fixture(scope="module")
def params():
    return M.init_params(jax.random.PRNGKey(0), CFG, "none", jnp.float32)


def _paged(params, **kw):
    from chatglm_q_tpu.serving.paged_engine import PagedServingEngine

    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    kw.setdefault("max_batch", 4)
    kw.setdefault("max_seq_len", 128)
    kw.setdefault("decode_chunk", 4)
    kw.setdefault("num_pages", 24)
    kw.setdefault("page_size", 16)
    return PagedServingEngine(load_cfg, params, None,
                              rt=TpuRuntimeConfig(use_pallas=False), **kw)


def _drain(engine):
    steps = 0
    while engine.has_work:
        engine.step()
        steps += 1
        assert steps < 300
    return {r.req_id: r.generated for r in engine.finished}


def test_engine_spec_sampled_mixed_batch(params):
    """speculative_sampled=True: a mixed greedy+sampled batch shares one
    spec chunk; the greedy rows' streams must stay exactly the greedy
    engine's, sampled rows draw valid tokens, runs are seed-deterministic,
    and acceptance fires on low-entropy sampled prompts."""
    rng = np.random.RandomState(4)
    rep = rng.randint(3, 12, size=4).tolist() * 5       # low-entropy
    greedy_prompt = rng.randint(3, 250, size=13).tolist()

    ref = _paged(params)   # no speculation
    ref.submit(greedy_prompt, max_new_tokens=12, temperature=0.0)
    want_greedy = _drain(ref)[0]

    def run():
        eng = _paged(params, speculative_k=4, speculative_ngram=2,
                     speculative_sampled=True, seed=7)
        eng.submit(greedy_prompt, max_new_tokens=12, temperature=0.0)
        eng.submit(rep, max_new_tokens=12, temperature=1.0, top_p=0.95)
        eng.submit(rep[::-1], max_new_tokens=12, temperature=0.7, top_k=8)
        return _drain(eng), eng.stats

    out1, stats1 = run()
    out2, _ = run()
    assert out1 == out2, "same seed must reproduce"
    assert out1[0] == want_greedy, (out1[0], want_greedy)
    assert stats1["spec_steps"] > 0
    for rid in (1, 2):
        assert len(out1[rid]) == 12
        assert all(0 <= t < CFG.vocab_size for t in out1[rid])


def test_engine_spec_sampled_acceptance_on_forced_repetition(params):
    """With top_k=1 sampling (argmax draw) the sampled path must accept
    drafts exactly like greedy speculation does — acceptance > 0 on a
    repetitive prompt."""
    rng = np.random.RandomState(6)
    rep = rng.randint(3, 9, size=3).tolist() * 8
    eng = _paged(params, speculative_k=4, speculative_ngram=2,
                 speculative_sampled=True, seed=3)
    eng.submit(rep, max_new_tokens=16, temperature=1.0, top_k=1)
    out = _drain(eng)
    assert len(out[0]) == 16
    assert eng.stats["spec_accepted"] > 0, eng.stats
