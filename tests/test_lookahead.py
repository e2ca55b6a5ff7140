"""Lookahead dispatch (ServingEngine(lookahead=True)): chunk N+1 is
submitted chained on chunk N's device tokens before N is fetched, hiding
host scheduling + dispatch RTT behind device compute.  Greedy streams must
be token-exact vs the plain engine through staggered finishes, slot reuse
and queued admissions (the stale-slot-view edge cases)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatglm_q_tpu.config import ChatGLM2Config, GLMLoadConfig, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M

CFG = ChatGLM2Config(
    hidden_size=128, inner_hidden_size=256, head_hidden_size=32,
    num_multi_query_groups=2, num_attention_heads=4, num_layers=2,
    vocab_size=512, max_sequence_length=96,
)


@pytest.fixture(scope="module")
def params():
    return M.init_params(jax.random.PRNGKey(0), CFG, "none", jnp.float32)


def _engine(params, **kw):
    from chatglm_q_tpu.serving.engine import ServingEngine

    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    kw.setdefault("max_batch", 4)
    kw.setdefault("max_seq_len", 96)
    kw.setdefault("decode_chunk", 4)
    return ServingEngine(load_cfg, params, None,
                         rt=TpuRuntimeConfig(use_pallas=False), **kw)


def _drain(engine):
    steps = 0
    while engine.has_work:
        engine.step()
        steps += 1
        assert steps < 400, "engine did not drain"
    return {r.req_id: r.generated for r in engine.finished}


def _workload(rng, n):
    # mixed lengths and budgets → staggered finishes mid-chunk, slot reuse
    return [
        (rng.randint(3, 500, size=rng.randint(4, 30)).tolist(),
         int(rng.randint(3, 18)))
        for _ in range(n)
    ]


@pytest.mark.parametrize("n_req,prefill_chunk", [(4, None), (9, None), (9, 16)])
def test_lookahead_token_exact_greedy(params, n_req, prefill_chunk):
    rng = np.random.RandomState(17)
    work = _workload(rng, n_req)

    def run(lookahead):
        eng = _engine(params, lookahead=lookahead,
                      prefill_chunk_size=prefill_chunk)
        for ids, budget in work:
            eng.submit(ids, max_new_tokens=budget, temperature=0.0)
        return _drain(eng)

    want = run(False)
    got = run(True)
    assert got == want, (got, want)


def test_lookahead_streamed_events_complete(params):
    """Every token must be reported exactly once through step() events,
    despite the one-chunk result lag."""
    rng = np.random.RandomState(23)
    work = _workload(rng, 6)
    eng = _engine(params, lookahead=True)
    for ids, budget in work:
        eng.submit(ids, max_new_tokens=budget, temperature=0.0)
    seen = {i: [] for i in range(len(work))}
    steps = 0
    while eng.has_work:
        for rid, toks in eng.step():
            seen[rid].extend(toks)
        steps += 1
        assert steps < 400
    done = {r.req_id: r.generated for r in eng.finished}
    for rid, gen in done.items():
        # events may include a trailing eos that finish-stripping removed
        assert seen[rid][: len(gen)] == gen, rid
        assert len(seen[rid]) <= len(gen) + 1


def test_lookahead_sampled_seed_deterministic(params):
    rng = np.random.RandomState(29)
    work = _workload(rng, 5)

    def run():
        eng = _engine(params, lookahead=True, seed=5)
        for ids, budget in work:
            eng.submit(ids, max_new_tokens=budget, temperature=0.9,
                       top_p=0.9)
        return _drain(eng)

    assert run() == run()
