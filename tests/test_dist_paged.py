"""Distributed paged engine on the 8-virtual-CPU-device mesh: data-sharded
page pool, per-group page allocation locality, prefix-affinity admission,
and token exactness vs the single-host dense engine (BASELINE config 5 at
paged-pool memory economics)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatglm_q_tpu.config import ChatGLM2Config, GLMLoadConfig, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.models import paged_kv as PK
from chatglm_q_tpu.parallel import sharding as S

CFG = ChatGLM2Config(
    hidden_size=256, inner_hidden_size=512, head_hidden_size=32,
    num_multi_query_groups=2, num_attention_heads=8, num_layers=2,
    vocab_size=1024, max_sequence_length=64,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def params():
    return M.init_params(jax.random.PRNGKey(0), CFG, "none", jnp.float32)


def _drain(engine):
    steps = 0
    while engine.has_work:
        engine.step()
        steps += 1
        assert steps < 300, "engine did not drain"
    by_id = {r.req_id: r.generated for r in engine.finished}
    return [by_id[i] for i in sorted(by_id)]


def _make_dist(params, mesh, **kw):
    from chatglm_q_tpu.serving.dist_engine import DistributedPagedServingEngine

    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    kw.setdefault("max_batch", 4)
    kw.setdefault("max_seq_len", 64)
    kw.setdefault("decode_chunk", 4)
    kw.setdefault("num_pages", 16)
    kw.setdefault("page_size", 8)
    kw.setdefault("prefill_chunk_size", 8)
    kw.setdefault("rt", TpuRuntimeConfig(use_pallas=False, mesh=mesh))
    return DistributedPagedServingEngine(
        load_cfg, S.shard_params(params, mesh, CFG, "none"), None,
        mesh=mesh, **kw,
    )


def test_paged_sharded_kernel_vs_unsharded():
    """flash_attention_decode_paged_sharded must equal the plain paged
    kernel when every row's pages live on its own data shard (the
    allocator's invariant): global→local page-id translation is exact."""
    from chatglm_q_tpu.ops.pallas_attention import (
        flash_attention_decode_paged, flash_attention_decode_paged_sharded)

    rng = np.random.RandomState(3)
    L, NP, G, P, D, Hg, B, MP = 2, 16, 2, 8, 32, 4, 4, 4
    pool_k = jnp.asarray(rng.randn(L, NP, G, P, D), jnp.float32)
    pool_v = jnp.asarray(rng.randn(L, NP, G, P, D), jnp.float32)
    # rows 0-1 (data shard 0) use pages 1..7; rows 2-3 (shard 1) pages 9..15
    pt = jnp.asarray([[1, 3, 5, 7], [2, 4, 6, 1],
                      [9, 11, 13, 15], [10, 12, 14, 9]], jnp.int32)
    q = jnp.asarray(rng.randn(B, G, Hg, D), jnp.float32)
    lengths = jnp.asarray([5, 17, 0, 31], jnp.int32)
    sm = 1.0 / np.sqrt(D)

    mesh = S.make_mesh(2, 4)
    for layer in range(L):
        want = flash_attention_decode_paged(
            q, pool_k, pool_v, jnp.int32(layer), pt, lengths, sm,
            interpret=True)
        with mesh:
            got = flash_attention_decode_paged_sharded(
                q, pool_k, pool_v, jnp.int32(layer), pt, lengths, sm, mesh,
                interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_dist_paged_engine_token_exact(params):
    """Full distributed paged run (chunked prefill + full-batch sharded
    decode over the data-sharded pool) vs the single-host dense engine."""
    from chatglm_q_tpu.serving.engine import ServingEngine

    rng = np.random.RandomState(5)
    prompts = [rng.randint(3, 900, size=n).tolist() for n in (19, 4, 26, 9)]
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")

    dense = ServingEngine(load_cfg, params, None, max_batch=4, max_seq_len=64,
                          decode_chunk=4,
                          rt=TpuRuntimeConfig(use_pallas=False))
    for p in prompts:
        dense.submit(p, max_new_tokens=5, temperature=0.0)
    want = _drain(dense)

    mesh = S.make_mesh(2, 4)
    with mesh:
        deng = _make_dist(params, mesh)
        deng.sync_submissions(prompts, max_new_tokens=5, temperature=0.0)
        got = _drain(deng)
    assert got == want, (got, want)
    assert deng.pages_in_use == 0


def test_dist_paged_allocation_locality(params):
    """Every admitted slot's pages must come from its own data-shard group
    (the sharded kernel reads only shard-local pages), and each group's
    reserved garbage page is never allocated."""
    mesh = S.make_mesh(2, 4)
    rng = np.random.RandomState(7)
    prompts = [rng.randint(3, 900, size=12).tolist() for _ in range(4)]
    with mesh:
        deng = _make_dist(params, mesh)
        deng.sync_submissions(prompts, max_new_tokens=4, temperature=0.0)
        deng._admit()
        gp = deng._group_pages
        assert {deng._slot_group(i) for i, s in enumerate(deng.slots)
                if s.request is not None} == {0, 1}
        for slot_idx, pages in deng._slot_pages.items():
            g = deng._slot_group(slot_idx)
            assert all(p // gp == g for p in pages), (slot_idx, g, pages)
            assert all(p % gp != 0 for p in pages), (slot_idx, pages)
        _drain(deng)
    assert deng.pages_in_use == 0


def test_dist_paged_prefix_affinity(params):
    """Admission must route a request to the shard whose registry caches
    its longest prompt prefix (pages cannot be attended across shards), not
    to the least-loaded shard — and stay token-exact."""
    from chatglm_q_tpu.serving.engine import ServingEngine

    rng = np.random.RandomState(9)
    prefix = rng.randint(3, 900, size=16).tolist()  # 2 pages of 8
    a = prefix + rng.randint(3, 900, size=7).tolist()
    b = prefix + rng.randint(3, 900, size=5).tolist()
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")

    dense = ServingEngine(load_cfg, params, None, max_batch=4, max_seq_len=64,
                          decode_chunk=4,
                          rt=TpuRuntimeConfig(use_pallas=False))
    for p in (a, b):
        dense.submit(p, max_new_tokens=5, temperature=0.0)
    want = _drain(dense)

    mesh = S.make_mesh(2, 4)
    with mesh:
        deng = _make_dist(params, mesh, prefix_cache=True)
        deng.sync_submissions([a], max_new_tokens=5, temperature=0.0)
        _drain(deng)
        # a (admitted to the first free slot → shard 0) has finished: its
        # prefix pages are registered on shard 0's registry only
        assert len(deng._prefix_lrus[0]) > 0
        assert len(deng._prefix_lrus[1]) == 0
        deng.sync_submissions([b], max_new_tokens=5, temperature=0.0)
        deng._admit()
        (slot_b,) = [i for i, s in enumerate(deng.slots)
                     if s.request is not None]
        assert deng._slot_group(slot_b) == 0, "must follow the cached prefix"
        got = _drain(deng)  # all finished so far, sorted by req_id: [a, b]
    assert got == want, (got, want)
    assert deng.stats["prefix_hits"] == 1
    assert deng.stats["prefix_tokens_reused"] == 16


def test_dist_paged_speculative_exact(params):
    """In-graph prompt-lookup speculation under the distributed full-batch
    decode: greedy tokens must equal the dense single-host engine's, with
    measurable acceptance."""
    from chatglm_q_tpu.serving.engine import ServingEngine

    rng = np.random.RandomState(15)
    # low-entropy prompts so n-gram drafting actually accepts
    prompts = [rng.randint(3, 40, size=n).tolist() for n in (18, 7, 12, 9)]
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")

    dense = ServingEngine(load_cfg, params, None, max_batch=4, max_seq_len=64,
                          decode_chunk=4,
                          rt=TpuRuntimeConfig(use_pallas=False))
    for p in prompts:
        dense.submit(p, max_new_tokens=16, temperature=0.0)
    want = _drain(dense)

    mesh = S.make_mesh(2, 4)
    with mesh:
        deng = _make_dist(params, mesh, speculative_k=4, speculative_ngram=2,
                          num_pages=24)
        deng.sync_submissions(prompts, max_new_tokens=16, temperature=0.0)
        got = _drain(deng)
    assert got == want, (got, want)
    assert deng.stats["spec_accepted"] > 0, deng.stats
    assert deng.pages_in_use == 0


def test_dist_paged_backpressure_per_group(params):
    """A saturated group must defer admission (backpressure) while other
    requests continue; pages recycle and the queue drains fully."""
    mesh = S.make_mesh(2, 4)
    rng = np.random.RandomState(11)
    # each needs 4 pages of the group's 7 usable → two concurrent per group max
    prompts = [rng.randint(3, 900, size=25).tolist() for _ in range(6)]
    with mesh:
        deng = _make_dist(params, mesh)
        deng.sync_submissions(prompts, max_new_tokens=4, temperature=0.0)
        out = _drain(deng)
    assert len(out) == 6
    assert deng.pages_in_use == 0
    assert sorted(sum(len(f) for f in g) for g in deng._free) == [7, 7]


# ---------------------------------------------------------------------------
# Model-axis pool sharding (shard_model_pages): the page dim shards over
# (data, model) — per-chip pool HBM ÷ dp·tp — with logical page j of a row
# on model chip j % tp and an exact strided-partial log-sum-exp merge.
# ---------------------------------------------------------------------------


def test_paged_msharded_kernel_vs_unsharded():
    """flash_attention_decode_paged_msharded must equal the plain paged
    kernel when pages follow the phase layout (logical block j in sub-pool
    (group, j % tp)) — strided local views + LSE merge are exact."""
    from chatglm_q_tpu.ops.pallas_attention import (
        flash_attention_decode_paged, flash_attention_decode_paged_msharded)

    rng = np.random.RandomState(13)
    L, NP, G, P, D, Hg, B, MP = 2, 16, 2, 8, 32, 4, 4, 4
    nd, tp = 2, 4
    sp = NP // (nd * tp)  # 2 pages per (data, model) chip
    pool_k = jnp.asarray(rng.randn(L, NP, G, P, D), jnp.float32)
    pool_v = jnp.asarray(rng.randn(L, NP, G, P, D), jnp.float32)
    # row r in data group r // 2; logical block j at phase j % tp, page
    # (g*tp + j%tp)*sp + (r % 2): distinct page per (row, block)
    pt = np.zeros((B, MP), np.int32)
    for r in range(B):
        g = r // 2
        for j in range(MP):
            pt[r, j] = (g * tp + j % tp) * sp + (r % 2)
    pt = jnp.asarray(pt)
    q = jnp.asarray(rng.randn(B, G, Hg, D), jnp.float32)
    lengths = jnp.asarray([5, 17, 0, 31], jnp.int32)
    sm = 1.0 / np.sqrt(D)

    mesh = S.make_mesh(nd, tp)
    for layer in range(L):
        want = flash_attention_decode_paged(
            q, pool_k, pool_v, jnp.int32(layer), pt, lengths, sm,
            interpret=True)
        with mesh:
            got = flash_attention_decode_paged_msharded(
                q, pool_k, pool_v, jnp.int32(layer), pt, lengths, sm, mesh,
                interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_dist_paged_msharded_engine_token_exact(params):
    """shard_model_pages end-to-end: phase-aware allocation + (data, model)-
    sharded pool + msharded decode, token-exact vs the single-host dense
    engine; every allocated page must sit in its block's phase sub-pool."""
    from chatglm_q_tpu.serving.engine import ServingEngine

    rng = np.random.RandomState(21)
    prompts = [rng.randint(3, 900, size=n).tolist() for n in (19, 4, 26, 9)]
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")

    dense = ServingEngine(load_cfg, params, None, max_batch=4, max_seq_len=64,
                          decode_chunk=4,
                          rt=TpuRuntimeConfig(use_pallas=False))
    for p in prompts:
        dense.submit(p, max_new_tokens=6, temperature=0.0)
    want = _drain(dense)

    mesh = S.make_mesh(2, 4)
    with mesh:
        deng = _make_dist(params, mesh, shard_model_pages=True, num_pages=24)
        assert deng._n_phase == 4 and deng._sub_pages == 3
        deng.sync_submissions(prompts, max_new_tokens=6, temperature=0.0)
        # step once so slots admit, then check phase locality of every
        # allocated page: block j of a group-g row ← sub-pool (g, j % tp)
        deng.step()
        assert deng._slot_pages, "nothing admitted"
        for slot_idx, pages in deng._slot_pages.items():
            g = deng._slot_group(slot_idx)
            for j, p in enumerate(pages):
                sub = p // deng._sub_pages
                assert sub == g * deng._n_phase + j % deng._n_phase, (
                    slot_idx, j, p)
                assert p % deng._sub_pages != 0, (slot_idx, p)  # not garbage
        got = _drain(deng)
    assert got == want, (got, want)
    assert deng.pages_in_use == 0


def test_dist_paged_msharded_flash_engine_token_exact(params):
    """Same, but through the interpret-mode flash kernels — the engine's
    decode hot path actually runs flash_attention_decode_paged_msharded."""
    from chatglm_q_tpu.serving.engine import ServingEngine

    rng = np.random.RandomState(22)
    prompts = [rng.randint(3, 900, size=n).tolist() for n in (11, 21)]
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")

    dense = ServingEngine(load_cfg, params, None, max_batch=4, max_seq_len=64,
                          decode_chunk=4,
                          rt=TpuRuntimeConfig(use_pallas=False))
    for p in prompts:
        dense.submit(p, max_new_tokens=5, temperature=0.0)
    want = _drain(dense)

    mesh = S.make_mesh(2, 4)
    with mesh:
        deng = _make_dist(
            params, mesh, shard_model_pages=True, num_pages=24,
            rt=TpuRuntimeConfig(use_pallas=False, use_flash_attention=True,
                                mesh=mesh),
        )
        assert deng.rt.paged_shard_model  # auto-set by the engine
        deng.sync_submissions(prompts, max_new_tokens=5, temperature=0.0)
        got = _drain(deng)
    assert got == want, (got, want)
    assert deng.pages_in_use == 0


def test_dist_paged_tp_pallas_token_exact():
    """Distributed paged engine with rt.tp_pallas (per-shard fused linears,
    incl. the paged_kv lm_head sites) vs the single-host dense engine —
    int4g32, token-exact."""
    from chatglm_q_tpu.serving.engine import ServingEngine
    from chatglm_q_tpu.serving.dist_engine import DistributedPagedServingEngine

    qparams = M.init_params(jax.random.PRNGKey(3), CFG, "int4g32", jnp.float32)
    load_cfg = GLMLoadConfig(model_config=CFG, quant_type="int4g32",
                             torch_dtype="float32")
    rng = np.random.RandomState(9)
    prompts = [rng.randint(3, 900, size=n).tolist() for n in (11, 4, 17)]

    dense = ServingEngine(load_cfg, qparams, None, max_batch=4,
                          max_seq_len=64, decode_chunk=4,
                          rt=TpuRuntimeConfig(use_pallas=False))
    for p in prompts:
        dense.submit(p, max_new_tokens=5, temperature=0.0)
    want = _drain(dense)

    mesh = S.make_mesh(2, 4)
    rt_tp = TpuRuntimeConfig(use_pallas=True, use_flash_attention=False,
                             tp_pallas=True, mesh=mesh)
    with mesh:
        deng = DistributedPagedServingEngine(
            load_cfg, S.shard_params(qparams, mesh, CFG, "int4g32"), None,
            mesh=mesh, max_batch=4, max_seq_len=64, decode_chunk=4,
            num_pages=16, page_size=8, prefill_chunk_size=8, rt=rt_tp)
        deng.sync_submissions(prompts, max_new_tokens=5, temperature=0.0)
        got = _drain(deng)
    assert got == want, (got, want)
    assert deng.pages_in_use == 0
