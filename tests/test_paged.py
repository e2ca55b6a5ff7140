"""Paged KV cache: write/gather helpers, the paged ragged-decode kernel,
model-level paged serving vs the dense cache, and the paged engine
(allocation, backpressure, page recycling) — all token-exact vs the dense
paths."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatglm_q_tpu.config import ChatGLM2Config, GLMLoadConfig, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.models import paged_kv as PK

XLA_RT = TpuRuntimeConfig(use_pallas=False, use_flash_attention=False)
FLASH_RT = TpuRuntimeConfig(use_pallas=True, use_flash_attention=True)

CFG = ChatGLM2Config(
    hidden_size=64, inner_hidden_size=64, head_hidden_size=16,
    num_multi_query_groups=2, num_attention_heads=4, num_layers=2,
    vocab_size=128, max_sequence_length=64,
)
PAGE = 16  # 4 logical pages per row at max_seq_len 64


@pytest.fixture(scope="module")
def params():
    return M.init_params(jax.random.PRNGKey(0), CFG, "none", jnp.float32)


def test_write_gather_roundtrip():
    """Prefill + decode writes through the page table must reassemble, via
    gather_layer, into exactly the dense cache contents."""
    rng = np.random.RandomState(0)
    L, NP, G, P, D = 2, 9, 2, 8, 16
    B, MP = 2, 3
    pool = jnp.zeros((L, NP, G, P, D), jnp.float32)
    # row 0 gets pages [3, 5, 1]; row 1 gets [7, 2, 8]
    pt = jnp.asarray([[3, 5, 1], [7, 2, 8]], jnp.int32)

    S = 13  # spans two pages (8 + 5)
    new = jnp.asarray(rng.randn(B, G, S, D), jnp.float32)
    for layer in range(L):
        pool = PK.write_pages(pool, new, jnp.int32(layer), pt,
                              jnp.zeros((B,), jnp.int32))
    # one decode write at position 13 per row
    tok = jnp.asarray(rng.randn(B, G, 1, D), jnp.float32)
    for layer in range(L):
        pool = PK.write_pages(pool, tok, jnp.int32(layer), pt,
                              jnp.full((B,), S, jnp.int32))

    for layer in range(L):
        dense = PK.gather_layer(pool, jnp.int32(layer), pt)  # (B, G, MP*P, D)
        np.testing.assert_array_equal(dense[:, :, :S], new)
        np.testing.assert_array_equal(dense[:, :, S : S + 1], tok)
        np.testing.assert_array_equal(dense[:, :, S + 1 :], 0.0)


def test_paged_decode_kernel_vs_oracle():
    from chatglm_q_tpu.ops.pallas_attention import (
        flash_attention_decode, flash_attention_decode_paged)

    rng = np.random.RandomState(1)
    L, NP, G, P, D, Hg = 3, 17, 2, 16, 16, 2
    B, MP = 4, 4
    pool_k = jnp.asarray(rng.randn(L, NP, G, P, D), jnp.float32)
    pool_v = jnp.asarray(rng.randn(L, NP, G, P, D), jnp.float32)
    # distinct random page assignments per row
    perm = rng.permutation(NP - 1)[: B * MP].reshape(B, MP) + 1
    pt = jnp.asarray(perm, jnp.int32)
    q = jnp.asarray(rng.randn(B, G, Hg, D), jnp.float32)
    lengths = jnp.asarray([0, 7, 33, 63], jnp.int32)
    sm = 1.0 / np.sqrt(D)

    for layer in range(L):
        got = flash_attention_decode_paged(
            q, pool_k, pool_v, jnp.int32(layer), pt, lengths, sm,
            interpret=True,
        )
        dk = PK.gather_layer(pool_k, jnp.int32(layer), pt)
        dv = PK.gather_layer(pool_v, jnp.int32(layer), pt)
        want = flash_attention_decode(q, dk, dv, lengths, sm, 16, interpret=True)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def _greedy_paged(params, prompt, n, rt):
    cache = PK.init_paged_kv_cache(CFG, 1, num_pages=9, max_length=64,
                                   page_size=PAGE, dtype=jnp.float32)
    # shuffled non-contiguous physical pages
    cache = cache.replace(page_table=jnp.asarray([[5, 2, 7, 3]], jnp.int32))
    S = len(prompt)
    logits, cache = PK.prefill_paged(
        params, CFG, jnp.asarray([prompt]), jnp.asarray([S], jnp.int32),
        cache, "none", jnp.float32, rt,
    )
    out = []
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    for _ in range(n):
        out.append(int(tok[0]))
        logits, cache = PK.decode_step_paged(
            params, CFG, tok, cache, "none", jnp.float32, rt)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
    return out


def _greedy_dense(params, prompt, n, rt):
    cache = M.init_kv_cache(CFG, 1, 64, jnp.float32)
    logits, cache = M.prefill(
        params, CFG, jnp.asarray([prompt]), jnp.asarray([len(prompt)], jnp.int32),
        cache, "none", jnp.float32, rt,
    )
    out = []
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    for _ in range(n):
        out.append(int(tok[0]))
        logits, cache = M.decode_step(params, CFG, tok, cache, "none",
                                      jnp.float32, rt)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
    return out


@pytest.mark.parametrize("rt", [XLA_RT, FLASH_RT], ids=["xla", "flash"])
def test_paged_model_matches_dense(params, rt):
    prompt = [3, 17, 42, 99, 5, 61, 8, 77, 23, 90, 11, 4, 56, 33, 70, 6, 81, 29]
    got = _greedy_paged(params, prompt, 12, rt)
    want = _greedy_dense(params, prompt, 12, rt)
    assert got == want, (got, want)


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

def _make_engines(params, num_pages, **kw):
    from chatglm_q_tpu.serving.engine import ServingEngine
    from chatglm_q_tpu.serving.paged_engine import PagedServingEngine

    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    kw.setdefault("max_batch", 4)
    kw.setdefault("max_seq_len", 64)
    kw.setdefault("decode_chunk", 4)
    dense = ServingEngine(load_cfg, params, None, rt=XLA_RT, **kw)
    paged = PagedServingEngine(load_cfg, params, None, rt=XLA_RT,
                               num_pages=num_pages, page_size=PAGE, **kw)
    return dense, paged


def _run(engine, prompts, **kw):
    ids = [engine.submit(p, temperature=0.0, **kw) for p in prompts]
    steps = 0
    while engine.has_work:
        engine.step()
        steps += 1
        assert steps < 200, "engine did not drain"
    by_id = {r.req_id: r.generated for r in engine.finished}
    return [by_id[i] for i in ids]


def test_paged_engine_matches_dense_engine(params):
    prompts = [[3, 17, 42], [7, 9, 11, 13, 15], [100, 101], [50, 60, 70, 80]]
    dense, paged = _make_engines(params, num_pages=40)
    want = _run(dense, prompts, max_new_tokens=6)
    got = _run(paged, prompts, max_new_tokens=6)
    assert got == want, (got, want)


def test_paged_engine_full_batch_decode_matches(params):
    """The single-host full_batch_decode escape hatch (decode all slots,
    no compact bucket — the workaround for the tunneled backend's
    bucket-32 fault, benchmarks/r5_p32_bisect) stays token-exact."""
    from chatglm_q_tpu.serving.paged_engine import PagedServingEngine

    prompts = [[3, 17, 42], [7, 9, 11, 13, 15], [100, 101], [50, 60, 70, 80],
               [5, 6], [9, 8, 7]]
    dense, paged = _make_engines(params, num_pages=40)
    want = _run(dense, prompts, max_new_tokens=6)
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    fb = PagedServingEngine(load_cfg, params, None, rt=XLA_RT,
                            num_pages=40, page_size=PAGE, max_batch=4,
                            max_seq_len=64, decode_chunk=4,
                            full_batch_decode=True)
    assert fb._full_batch_decode is True
    got = _run(fb, prompts, max_new_tokens=6)
    assert got == want, (got, want)


def test_paged_pool_fp8_kv(params):
    """The reduced-precision KV option must work behind the page table
    (pool stores f8, kernels upcast): greedy ids stay close to f32 —
    identical on this tiny model."""
    prompt = list(range(3, 20))
    outs = {}
    for dt in (jnp.float32, jnp.float8_e4m3fn):
        cache = PK.init_paged_kv_cache(CFG, 1, 10, 64, PAGE, dt)
        cache = cache.replace(page_table=jnp.asarray([[4, 7, 2, 9]], jnp.int32))
        logits, cache = PK.prefill_paged(
            params, CFG, jnp.asarray([prompt]),
            jnp.asarray([len(prompt)], jnp.int32), cache, "none",
            jnp.float32, FLASH_RT)
        out = []
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        for _ in range(8):
            out.append(int(tok[0]))
            logits, cache = PK.decode_step_paged(
                params, CFG, tok, cache, "none", jnp.float32, FLASH_RT)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
        outs[dt.__name__] = out
    assert outs["float32"] == outs["float8_e4m3fn"], outs


def test_prefix_cache_reuse_token_exact(params):
    """Requests sharing a page-aligned prompt prefix must reuse its KV pages
    (no recompute) and still emit exactly the dense engine's tokens."""
    from chatglm_q_tpu.serving.engine import ServingEngine
    from chatglm_q_tpu.serving.paged_engine import PagedServingEngine

    rng = np.random.RandomState(11)
    prefix = rng.randint(3, 120, size=24).tolist()
    prompts = [prefix + rng.randint(3, 120, size=n).tolist() for n in (5, 3, 9)]

    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    kw = dict(max_batch=2, max_seq_len=64, decode_chunk=4)
    dense = ServingEngine(load_cfg, params, None, rt=XLA_RT, **kw)
    paged = PagedServingEngine(load_cfg, params, None, rt=XLA_RT,
                               num_pages=40, page_size=8,
                               prefill_chunk_size=8, prefix_cache=True, **kw)
    want, got = [], []
    for p in prompts:  # sequential: later prompts hit the published prefix
        want += _run(dense, [p], max_new_tokens=6)
        got += _run(paged, [p], max_new_tokens=6)
    assert got == want, (got, want)
    # first request publishes the prefix; the other two reuse it
    assert paged.stats["prefix_hits"] == 2, paged.stats
    # 24-token prefix = 3 pages of 8 reused per hit
    assert paged.stats["prefix_tokens_reused"] == 48, paged.stats
    assert paged.pages_in_use == 0
    assert paged.pages_cached > 0
    paged.clear_prefix_cache()
    assert paged.pages_cached == 0
    assert sorted(paged._free_pages) == list(range(1, 40))


def test_prefix_cache_partial_share(params):
    """The system-prompt case: two prompts share only their HEAD pages.
    The registry must match the shared pages (every page-prefix length is
    published), not just a prompt's full span."""
    from chatglm_q_tpu.serving.engine import ServingEngine
    from chatglm_q_tpu.serving.paged_engine import PagedServingEngine

    rng = np.random.RandomState(13)
    sys_prompt = rng.randint(3, 120, size=16).tolist()  # 2 pages of 8
    a = sys_prompt + rng.randint(3, 120, size=12).tolist()
    b = sys_prompt + rng.randint(3, 120, size=12).tolist()

    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    kw = dict(max_batch=2, max_seq_len=64, decode_chunk=4)
    dense = ServingEngine(load_cfg, params, None, rt=XLA_RT, **kw)
    paged = PagedServingEngine(load_cfg, params, None, rt=XLA_RT,
                               num_pages=40, page_size=8,
                               prefill_chunk_size=8, prefix_cache=True, **kw)
    want = _run(dense, [a], max_new_tokens=6) + _run(dense, [b], max_new_tokens=6)
    got = _run(paged, [a], max_new_tokens=6) + _run(paged, [b], max_new_tokens=6)
    assert got == want, (got, want)
    # b shares exactly the 2 system-prompt pages (16 tokens), nothing more
    assert paged.stats["prefix_hits"] == 1, paged.stats
    assert paged.stats["prefix_tokens_reused"] == 16, paged.stats


def test_prefix_cache_eviction_under_pressure(params):
    """A pool too small to keep cached prefixes must evict them (LRU) to
    admit new work — never deadlock, outputs stay exact."""
    from chatglm_q_tpu.serving.engine import ServingEngine
    from chatglm_q_tpu.serving.paged_engine import PagedServingEngine

    rng = np.random.RandomState(12)
    prompts = [rng.randint(3, 120, size=n).tolist() for n in (25, 30, 28, 21)]
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    kw = dict(max_batch=2, max_seq_len=64, decode_chunk=4)
    dense = ServingEngine(load_cfg, params, None, rt=XLA_RT, **kw)
    # 11 usable pages; each request needs ~5 — cached prefixes must yield
    paged = PagedServingEngine(load_cfg, params, None, rt=XLA_RT,
                               num_pages=12, page_size=8,
                               prefill_chunk_size=8, prefix_cache=True, **kw)
    want = _run(dense, prompts, max_new_tokens=6)
    got = _run(paged, prompts, max_new_tokens=6)
    assert got == want, (got, want)
    assert paged.pages_in_use == 0


def test_paged_engine_backpressure_and_recycling(params):
    """A pool too small for all requests at once: admissions must wait for
    pages, recycled pages must serve later requests, and every output must
    still be token-exact."""
    prompts = [[3, 17, 42], [7, 9, 11, 13, 15], [100, 101],
               [50, 60, 70, 80], [5, 6], [88, 44, 22]]
    dense, paged = _make_engines(params, num_pages=7)  # 6 usable pages
    # each request needs ceil(min(max(16, len+6+4), 64)/16) = 1..2 pages;
    # with 6 usable pages not all six admit at once
    want = _run(dense, prompts, max_new_tokens=6)
    got = _run(paged, prompts, max_new_tokens=6)
    assert got == want, (got, want)
    assert paged.pages_in_use == 0
    assert sorted(paged._free_pages) == list(range(1, 7))


def test_submit_rejects_impossible_request(params):
    """A request that can never fit the page pool raises at submit instead
    of livelocking admission (has_work forever True, no progress)."""
    from chatglm_q_tpu.serving.paged_engine import PagedServingEngine

    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    eng = PagedServingEngine(load_cfg, params, None, max_batch=2,
                             max_seq_len=64, decode_chunk=4, rt=XLA_RT,
                             num_pages=2, page_size=PAGE)
    # pool: 2 pages, 1 garbage -> 1 usable = 16 tokens; this needs 64
    with pytest.raises(ValueError, match="KV pages"):
        eng.submit(list(range(40)), max_new_tokens=24)
    assert not eng.has_work  # rejected request must not linger in the queue


def test_alloc_no_pointless_prefix_eviction(params):
    """When every cached page is also held by an active slot, eviction can
    free nothing: _alloc must fail WITHOUT wiping the prefix registry."""
    from chatglm_q_tpu.serving.paged_engine import PagedServingEngine

    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    eng = PagedServingEngine(load_cfg, params, None, max_batch=2,
                             max_seq_len=64, decode_chunk=4, rt=XLA_RT,
                             num_pages=4, page_size=PAGE,
                             prefix_cache=True, prefill_chunk_size=PAGE)
    # 3 usable pages; request holds all of them (20+20+4-token budget)
    eng.submit(list(range(20)), max_new_tokens=20)
    while eng.queue or any(s.pending_ids is not None for s in eng.slots):
        eng.step()
        if all(s.request is None for s in eng.slots) and not eng.queue:
            break
    assert eng.pages_cached > 0, "prefix registered"
    before = [dict(lru) for lru in eng._prefix_lrus]
    # all registry pages are shared with the (still active or not) slot —
    # force the case: retain pages as a fake active slot if already freed
    if not eng._slot_pages:
        pages = list(next(iter(eng._prefix_lrus[0].values())))
        eng._slot_pages[0] = pages
        eng._retain(pages)
    got = eng._alloc(3, 0)
    assert got is None
    assert [dict(lru) for lru in eng._prefix_lrus] == before, (
        "registry must survive a hopeless allocation")


def test_sync_submissions_single_process_str(params):
    """Single-process sync_submissions must tokenize strings, not submit
    per-character lists."""
    from chatglm_q_tpu.parallel import sharding as S
    from chatglm_q_tpu.serving.dist_engine import DistributedServingEngine

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")

    class Tok:
        def encode(self, text):
            return [7, 8, 9]

        def __getitem__(self, piece):
            return 2

    mesh = S.make_mesh(2, 4)
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    eng = DistributedServingEngine(
        load_cfg, S.shard_params(params, mesh, CFG, "none"), Tok(),
        mesh=mesh, max_batch=2, max_seq_len=64, decode_chunk=4,
        rt=TpuRuntimeConfig(use_pallas=False, mesh=mesh))
    eng.sync_submissions(["hello"], max_new_tokens=4)
    assert eng.queue[0].prompt_ids == [7, 8, 9]
    eng.sync_submissions([[1, 2, 3]], max_new_tokens=4)
    assert eng.queue[1].prompt_ids == [1, 2, 3]


def test_decode_to_the_wall_matches_dense(params):
    """In-chunk over-generation past max_seq_len: device lengths/writes must
    clamp at the table's last slot (never wrap into valid pages), and the
    emitted tokens must match the dense engine's wall behavior."""
    from chatglm_q_tpu.serving.engine import ServingEngine
    from chatglm_q_tpu.serving.paged_engine import PagedServingEngine

    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    kw = dict(max_batch=1, max_seq_len=32, decode_chunk=8, rt=XLA_RT)
    prompt = [3, 17, 42, 99, 5, 8, 1, 9, 4, 11, 12, 13, 14, 15, 16, 17, 18]

    def run(eng):
        eng.submit(prompt, max_new_tokens=30, temperature=0.0)
        steps = 0
        while eng.has_work:
            eng.step()
            steps += 1
            assert steps < 100
        return eng.finished[0].generated

    dense = run(ServingEngine(load_cfg, params, None, **kw))
    paged = run(PagedServingEngine(load_cfg, params, None, num_pages=4,
                                   page_size=16, **kw))
    assert len(dense) == len(paged)
    assert dense == paged, (dense, paged)
    # the final decode chunk crosses the wall: device positions past
    # max_seq_len-1 are clamped writes whose tokens the host rolls back —
    # the engine's total sequence (sliced prompt + generated) fits exactly
    assert len(dense) <= 30


def test_spec_decode_to_the_wall(params):
    """Speculative chunks near the wall advance by up to k+1 per step —
    lengths and page writes must clamp at capacity, tokens exact vs plain."""
    from chatglm_q_tpu.serving.paged_engine import PagedServingEngine

    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    kw = dict(max_batch=1, max_seq_len=32, decode_chunk=4, rt=XLA_RT,
              num_pages=4, page_size=16)
    # a repetitive prompt encourages n-gram drafts (spec path actually fires)
    prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]

    def run(spec_k):
        eng = PagedServingEngine(load_cfg, params, None,
                                 speculative_k=spec_k, **kw)
        eng.submit(prompt, max_new_tokens=30, temperature=0.0)
        steps = 0
        while eng.has_work:
            eng.step()
            steps += 1
            assert steps < 100
        return eng.finished[0].generated

    plain, spec = run(0), run(4)
    assert plain == spec, (plain, spec)


def test_chunk_paged_kernel_vs_oracle():
    """flash_attention_chunk_paged (spec-verify hot path) vs the masked
    softmax over the gathered dense view, ragged starts incl. page edges."""
    from chatglm_q_tpu.ops.pallas_attention import flash_attention_chunk_paged

    rng = np.random.RandomState(3)
    L, NP, G, P, D, Hg, B, MP, S = 2, 17, 2, 16, 16, 2, 4, 4, 5
    pool_k = jnp.asarray(rng.randn(L, NP, G, P, D), jnp.float32)
    pool_v = jnp.asarray(rng.randn(L, NP, G, P, D), jnp.float32)
    pt = jnp.asarray(rng.permutation(NP - 1)[: B * MP].reshape(B, MP) + 1,
                     jnp.int32)
    q = jnp.asarray(rng.randn(B, S, G, Hg, D), jnp.float32)
    starts = jnp.asarray([0, 14, 31, 59 - S], jnp.int32)  # page-edge cases
    sm = 1.0 / np.sqrt(D)
    for layer in range(L):
        got = flash_attention_chunk_paged(
            q, pool_k, pool_v, jnp.int32(layer), pt, starts, sm,
            interpret=True)
        dk = PK.gather_layer(pool_k, jnp.int32(layer), pt)
        dv = PK.gather_layer(pool_v, jnp.int32(layer), pt)
        s = jnp.einsum("bsghd,bgtd->bghst", q, dk) * sm
        tq = starts[:, None, None, None, None] + jnp.arange(S)[None, None, None, :, None]
        tk = jnp.arange(dk.shape[2])[None, None, None, None, :]
        want = jnp.einsum("bghst,bgtd->bsghd",
                          jax.nn.softmax(jnp.where(tk <= tq, s, -1e30), -1), dv)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
