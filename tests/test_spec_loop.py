"""In-graph speculative decode loop (models/spec_decode.py): device-side
draft search unit tests + greedy exactness vs plain paged decode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.models import paged_kv as PK
from chatglm_q_tpu.models import spec_decode as SD

CFG = ChatGLM2Config(
    hidden_size=64, inner_hidden_size=64, head_hidden_size=16,
    num_multi_query_groups=2, num_attention_heads=4, num_layers=2,
    vocab_size=128, max_sequence_length=64,
)
FLASH_RT = TpuRuntimeConfig(use_pallas=True)
XLA_RT = TpuRuntimeConfig(use_pallas=False, use_flash_attention=False)


def test_find_drafts_matches_host():
    from chatglm_q_tpu.serving.speculative import find_draft

    rng = np.random.RandomState(0)
    T = 32
    for trial in range(20):
        n = rng.randint(5, T)
        hist = rng.randint(0, 5, size=n).tolist()  # small alphabet → repeats
        buf = np.zeros((1, T), np.int32)
        buf[0, :n] = hist
        dev = np.asarray(SD.find_drafts(
            jnp.asarray(buf), jnp.asarray([n], jnp.int32), ngram=2, k=4))[0]
        host = find_draft(hist, ngram=2, k=4, min_ngram=2)
        if host is None:
            assert (dev == -1).all(), (trial, hist, dev)
        else:
            got = [t for t in dev if t != -1]
            assert got == host, (trial, hist, got, host)


def test_find_drafts_no_history():
    buf = jnp.zeros((2, 16), jnp.int32)
    out = SD.find_drafts(buf, jnp.asarray([0, 1], jnp.int32), ngram=3, k=4)
    assert (np.asarray(out) == -1).all()


def test_spec_engine_matches_dense(params=None):
    """Paged engine with in-graph speculation must emit exactly the dense
    engine's greedy tokens, with measurable acceptance."""
    from chatglm_q_tpu.config import GLMLoadConfig
    from chatglm_q_tpu.serving.engine import ServingEngine
    from chatglm_q_tpu.serving.paged_engine import PagedServingEngine

    params = M.init_params(jax.random.PRNGKey(0), CFG, "none", jnp.float32)
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    rng = np.random.RandomState(5)
    prompts = [rng.randint(3, 40, size=nn).tolist() for nn in (18, 7, 12)]
    kw = dict(max_batch=2, max_seq_len=64, decode_chunk=4)
    dense = ServingEngine(load_cfg, params, None, rt=XLA_RT, **kw)
    spec = PagedServingEngine(load_cfg, params, None, rt=XLA_RT,
                              num_pages=40, page_size=8,
                              speculative_k=4, speculative_ngram=2, **kw)

    def run(eng):
        ids = [eng.submit(p, max_new_tokens=20, temperature=0.0)
               for p in prompts]
        steps = 0
        while eng.has_work:
            eng.step()
            steps += 1
            assert steps < 200
        by_id = {r.req_id: r.generated for r in eng.finished}
        return [by_id[i] for i in ids]

    want = run(dense)
    got = run(spec)
    assert got == want, (got, want)
    assert spec.stats["spec_accepted"] > 0, spec.stats


def test_spec_engine_mixed_sampling_falls_back():
    """A batch containing a sampling request must run the plain decode
    path (speculation is greedy-only) and still drain correctly."""
    from chatglm_q_tpu.config import GLMLoadConfig
    from chatglm_q_tpu.serving.paged_engine import PagedServingEngine

    params = M.init_params(jax.random.PRNGKey(0), CFG, "none", jnp.float32)
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    eng = PagedServingEngine(load_cfg, params, None, rt=XLA_RT,
                             num_pages=40, page_size=8,
                             speculative_k=4, speculative_ngram=2,
                             max_batch=2, max_seq_len=64, decode_chunk=4)
    eng.submit([3, 17, 42], max_new_tokens=8, temperature=0.0)
    eng.submit([7, 9, 11], max_new_tokens=8, temperature=0.9)
    steps = 0
    while eng.has_work:
        eng.step()
        steps += 1
        assert steps < 100
    assert len(eng.finished) == 2
    assert all(len(r.generated) > 0 for r in eng.finished)
    assert eng.stats["spec_steps"] == 0  # mixed batch: plain path only


@pytest.mark.parametrize("rt", [XLA_RT, FLASH_RT], ids=["xla", "flash"])
def test_spec_loop_greedy_exact(rt):
    params = M.init_params(jax.random.PRNGKey(0), CFG, "none", jnp.float32)
    rng = np.random.RandomState(5)
    prompt = rng.randint(3, 40, size=18).tolist()
    n_prompt = len(prompt)

    def make_cache():
        c = PK.init_paged_kv_cache(CFG, 1, 10, 64, 8, jnp.float32)
        return c.replace(
            page_table=jnp.asarray([[4, 7, 2, 9, 1, 5, 3, 8]], jnp.int32))

    # plain greedy reference over the paged cache
    cache = make_cache()
    logits, cache = PK.prefill_paged(
        params, CFG, jnp.asarray([prompt]), jnp.asarray([n_prompt], jnp.int32),
        cache, "none", jnp.float32, rt)
    ref = []
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    for _ in range(30):
        ref.append(int(tok[0]))
        logits, cache = PK.decode_step_paged(
            params, CFG, tok, cache, "none", jnp.float32, rt)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)

    # speculative loop
    cache = make_cache()
    logits, cache = PK.prefill_paged(
        params, CFG, jnp.asarray([prompt]), jnp.asarray([n_prompt], jnp.int32),
        cache, "none", jnp.float32, rt)
    t0 = jnp.argmax(logits, -1).astype(jnp.int32)
    tokbuf = jnp.zeros((1, 64), jnp.int32).at[0, :n_prompt].set(
        jnp.asarray(prompt))
    drafts, accepts, nexts, cache, tokbuf = SD.speculative_decode_paged(
        params, CFG, t0, cache, tokbuf, n_steps=8, k=4, ngram=2,
        quant_type="none", dtype=jnp.float32, rt=rt)
    drafts, accepts, nexts = map(np.asarray, (drafts, accepts, nexts))
    got = [int(t0[0])]
    for s in range(8):
        a = int(accepts[s, 0])
        got += drafts[s, 0, :a].tolist() + [int(nexts[s, 0])]
    assert got == ref[: len(got)], (got, ref[: len(got)])
    # a greedy cycle on a tiny random model must yield some acceptance
    assert accepts.sum() > 0, accepts
    # cache length must equal emitted tokens placed so far: prompt + all
    # but the final pending token
    assert int(cache.lengths[0]) == n_prompt + len(got) - 1
    # tokbuf mirrors the emitted history below the length
    emitted = np.asarray(tokbuf)[0, : n_prompt + len(got) - 1]
    assert emitted[:n_prompt].tolist() == prompt
    assert emitted[n_prompt:].tolist() == got[:-1]
