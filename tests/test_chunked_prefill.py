"""Chunked prefill: processing a prompt in fixed-size chunks must be
token-exact vs whole-prompt prefill (dense and paged caches, flash and XLA
paths), including the subsequent decode stream."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.models import paged_kv as PK

XLA_RT = TpuRuntimeConfig(use_pallas=False, use_flash_attention=False)
FLASH_RT = TpuRuntimeConfig(use_pallas=True, use_flash_attention=True)

CFG = ChatGLM2Config(
    hidden_size=64, inner_hidden_size=64, head_hidden_size=16,
    num_multi_query_groups=2, num_attention_heads=4, num_layers=2,
    vocab_size=128, max_sequence_length=64,
)


@pytest.fixture(scope="module")
def params():
    return M.init_params(jax.random.PRNGKey(0), CFG, "none", jnp.float32)


def _decode_greedy(params, logits, cache, n, rt, step_fn):
    out = []
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    for _ in range(n):
        out.append(int(tok[0]))
        logits, cache = step_fn(params, CFG, tok, cache, "none", jnp.float32, rt)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
    return out


@pytest.mark.parametrize("rt", [XLA_RT, FLASH_RT], ids=["xla", "flash"])
@pytest.mark.parametrize("n_prompt", [21, 24])
def test_chunked_prefill_matches_whole(params, rt, n_prompt):
    rng = np.random.RandomState(3)
    prompt = rng.randint(3, 120, size=n_prompt).tolist()
    chunk = 8

    # whole-prompt reference
    cache = M.init_kv_cache(CFG, 1, 64, jnp.float32)
    logits_w, cache_w = M.prefill(
        params, CFG, jnp.asarray([prompt]), jnp.asarray([n_prompt], jnp.int32),
        cache, "none", jnp.float32, rt)
    want = _decode_greedy(params, logits_w, cache_w, 8, rt, M.decode_step)

    # chunked
    cache = M.init_kv_cache(CFG, 1, 64, jnp.float32)
    pos = 0
    while pos < n_prompt:
        ids = prompt[pos : pos + chunk]
        valid = len(ids)
        padded = np.zeros((1, chunk), np.int32)
        padded[0, :valid] = ids
        logits_c, cache = M.prefill_chunk(
            params, CFG, jnp.asarray(padded), jnp.asarray([pos], jnp.int32),
            jnp.asarray([valid], jnp.int32), cache, "none", jnp.float32, rt)
        pos += valid
    np.testing.assert_allclose(np.asarray(logits_c), np.asarray(logits_w),
                               rtol=2e-4, atol=2e-4)
    got = _decode_greedy(params, logits_c, cache, 8, rt, M.decode_step)
    assert got == want, (got, want)


# ---------------------------------------------------------------------------
# Engines with chunked admission
# ---------------------------------------------------------------------------

def _run_engine(engine, prompts, **kw):
    ids = [engine.submit(p, temperature=0.0, **kw) for p in prompts]
    steps = 0
    while engine.has_work:
        engine.step()
        steps += 1
        assert steps < 300, "engine did not drain"
    by_id = {r.req_id: r.generated for r in engine.finished}
    return [by_id[i] for i in ids]


def test_engine_chunked_admission_matches_whole(params):
    """Chunked admission (prompts split into 8-token chunks, interleaved
    with decode) must produce exactly the whole-prompt engine's tokens —
    including with decode already in flight when long prompts arrive."""
    from chatglm_q_tpu.config import GLMLoadConfig
    from chatglm_q_tpu.serving.engine import ServingEngine

    rng = np.random.RandomState(7)
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    prompts = [rng.randint(3, 120, size=n).tolist() for n in (3, 23, 17, 30, 9)]
    kw = dict(max_batch=4, max_seq_len=64, decode_chunk=4)
    whole = ServingEngine(load_cfg, params, None, rt=XLA_RT, **kw)
    chunked = ServingEngine(load_cfg, params, None, rt=XLA_RT,
                            prefill_chunk_size=8, **kw)
    want = _run_engine(whole, prompts, max_new_tokens=6)
    got = _run_engine(chunked, prompts, max_new_tokens=6)
    assert got == want, (got, want)


def test_paged_engine_chunked_admission_matches_whole(params):
    from chatglm_q_tpu.config import GLMLoadConfig
    from chatglm_q_tpu.serving.engine import ServingEngine
    from chatglm_q_tpu.serving.paged_engine import PagedServingEngine

    rng = np.random.RandomState(8)
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    prompts = [rng.randint(3, 120, size=n).tolist() for n in (3, 23, 17, 30)]
    kw = dict(max_batch=4, max_seq_len=64, decode_chunk=4)
    whole = ServingEngine(load_cfg, params, None, rt=FLASH_RT, **kw)
    chunked = PagedServingEngine(load_cfg, params, None, rt=FLASH_RT,
                                 prefill_chunk_size=16, num_pages=40,
                                 page_size=8, **kw)
    want = _run_engine(whole, prompts, max_new_tokens=6)
    got = _run_engine(chunked, prompts, max_new_tokens=6)
    assert got == want, (got, want)
    assert chunked.pages_in_use == 0


@pytest.mark.parametrize("n_prompt", [21, 24])
def test_chunked_prefill_paged_matches_whole(params, n_prompt):
    rng = np.random.RandomState(4)
    prompt = rng.randint(3, 120, size=n_prompt).tolist()
    chunk = 16  # = 2 pages of 8

    cache = M.init_kv_cache(CFG, 1, 64, jnp.float32)
    logits_w, cache_w = M.prefill(
        params, CFG, jnp.asarray([prompt]), jnp.asarray([n_prompt], jnp.int32),
        cache, "none", jnp.float32, FLASH_RT)
    want = _decode_greedy(params, logits_w, cache_w, 8, FLASH_RT, M.decode_step)

    pcache = PK.init_paged_kv_cache(CFG, 1, num_pages=10, max_length=64,
                                    page_size=8, dtype=jnp.float32)
    pcache = pcache.replace(
        page_table=jnp.asarray([[4, 7, 2, 9, 1, 5, 3, 8]], jnp.int32))
    pos = 0
    while pos < n_prompt:
        ids = prompt[pos : pos + chunk]
        valid = len(ids)
        padded = np.zeros((1, chunk), np.int32)
        padded[0, :valid] = ids
        logits_c, pcache = PK.prefill_chunk_paged(
            params, CFG, jnp.asarray(padded), jnp.asarray([pos], jnp.int32),
            jnp.asarray([valid], jnp.int32), pcache, "none", jnp.float32,
            FLASH_RT)
        pos += valid
    np.testing.assert_allclose(np.asarray(logits_c), np.asarray(logits_w),
                               rtol=2e-4, atol=2e-4)
    got = _decode_greedy(params, logits_c, pcache, 8, FLASH_RT,
                         PK.decode_step_paged)
    assert got == want, (got, want)
