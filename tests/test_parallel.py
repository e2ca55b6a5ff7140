"""Sharding tests on the 8-virtual-CPU-device mesh: tensor/data-parallel
forward must be numerically identical to single-device, and the sharded
training step must run (the SURVEY.md §4 "fake backend" strategy)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.parallel import sharding as S
from chatglm_q_tpu.utils.train import make_train_step, partition_params, merge_params

RT = TpuRuntimeConfig(use_pallas=False)

CFG = ChatGLM2Config(
    hidden_size=256, inner_hidden_size=512, head_hidden_size=32,
    num_multi_query_groups=2, num_attention_heads=8, num_layers=2,
    vocab_size=1024, max_sequence_length=64,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@pytest.mark.parametrize("quant_type", ["none", "int8", "int4g32"])
def test_tp_forward_matches_single_device(quant_type):
    params = M.init_params(jax.random.PRNGKey(0), CFG, quant_type, jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, CFG.vocab_size)

    _, ref_logits = M.forward(params, CFG, ids, quant_type=quant_type, rt=RT)

    mesh = S.make_mesh(2, 4)
    sharded = S.shard_params(params, mesh, CFG, quant_type)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P(S.DATA_AXIS, None)))

    fwd = jax.jit(lambda p, i: M.forward(p, CFG, i, quant_type=quant_type, rt=RT)[1])
    with mesh:
        out = fwd(sharded, ids_sh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )


def test_tp_decode_matches_single_device():
    quant_type = "int4g32"
    params = M.init_params(jax.random.PRNGKey(2), CFG, quant_type, jnp.float32)
    prompt = jax.random.randint(jax.random.PRNGKey(3), (2, 8), 0, CFG.vocab_size)
    lengths = jnp.asarray([8, 8], jnp.int32)

    def run(params, mesh=None):
        cache = M.init_kv_cache(CFG, 2, 32, jnp.float32)
        if mesh is not None:
            cache = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                cache, S.kv_cache_pspecs(),
            )
        logits, cache = M.prefill(params, CFG, prompt, lengths, cache,
                                  quant_type, jnp.float32, RT)
        toks, _ = M.multi_step_decode(params, CFG,
                                      jnp.argmax(logits, -1).astype(jnp.int32),
                                      cache, 4, None, quant_type, jnp.float32, RT)
        return np.asarray(toks)

    ref_toks = run(params)
    mesh = S.make_mesh(1, 8)
    sharded = S.shard_params(params, mesh, CFG, quant_type)
    with mesh:
        tp_toks = run(sharded, mesh)
    np.testing.assert_array_equal(ref_toks, tp_toks)


def test_sharded_train_step_updates_floats_only():
    quant_type = "int8"
    mesh = S.make_mesh(2, 4)
    params = M.init_params(jax.random.PRNGKey(4), CFG, quant_type, jnp.float32)
    params = S.shard_params(params, mesh, CFG, quant_type)
    trainable, frozen = partition_params(params)
    opt = optax.sgd(1e-2)
    opt_state = opt.init(trainable)
    step = jax.jit(make_train_step(CFG, quant_type, opt, jnp.float32, RT))

    ids = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(5), (4, 16), 0, CFG.vocab_size),
        NamedSharding(mesh, P(S.DATA_AXIS, None)),
    )
    with mesh:
        t2, opt_state, loss = step(trainable, frozen, opt_state, ids, ids)
        _, _, loss2 = step(t2, frozen, opt_state, ids, ids)
    assert float(loss2) < float(loss)  # one SGD step reduces memorization loss
    # quantized weights untouched
    w0 = np.asarray(merge_params(trainable, frozen)["layers"]["q_proj"]["weight"])
    w1 = np.asarray(merge_params(t2, frozen)["layers"]["q_proj"]["weight"])
    np.testing.assert_array_equal(w0, w1)
    # float params did move
    a0 = np.asarray(trainable["layers"]["attn_ln"]["weight"])
    a1 = np.asarray(t2["layers"]["attn_ln"]["weight"])
    assert np.abs(a1 - a0).max() > 0


def test_tp_divisibility_guard():
    assert S.tp_divisibility_ok(CFG, 4, "int4g32")
    assert S.tp_divisibility_ok(CFG, 8, "int4g32")
    tiny = ChatGLM2Config(hidden_size=64, inner_hidden_size=64, head_hidden_size=16,
                          num_attention_heads=4, num_multi_query_groups=2,
                          num_layers=1, vocab_size=128)
    assert not S.tp_divisibility_ok(tiny, 4, "int4g32")  # 64/4=16 not group-aligned
    assert S.tp_divisibility_ok(tiny, 2, "int8")


def test_engine_with_sharded_params():
    """Continuous batching engine over tensor-sharded params must produce
    the same greedy tokens as the unsharded engine."""
    from chatglm_q_tpu.config import GLMLoadConfig
    from chatglm_q_tpu.serving.engine import ServingEngine

    quant_type = "int8"
    params = M.init_params(jax.random.PRNGKey(7), CFG, quant_type, jnp.float32)
    load_cfg = GLMLoadConfig(model_config=CFG, quant_type=quant_type,
                             torch_dtype="float32")
    prompts = [[3, 17, 42], [7, 9, 11, 13]]

    eng = ServingEngine(load_cfg, params, None, max_batch=2, max_seq_len=64,
                        decode_chunk=4, rt=RT)
    ref_out = eng.run(prompts, max_new_tokens=5, temperature=0.0)

    mesh = S.make_mesh(1, 8)
    sharded = S.shard_params(params, mesh, CFG, quant_type)
    with mesh:
        eng2 = ServingEngine(load_cfg, sharded, None, max_batch=2,
                             max_seq_len=64, decode_chunk=4, rt=RT)
        tp_out = eng2.run(prompts, max_new_tokens=5, temperature=0.0)
    assert ref_out == tp_out


def test_check_quant_params():
    from chatglm_q_tpu.utils.debug import check_quant_params

    params = M.init_params(jax.random.PRNGKey(8), CFG, "int4g32", jnp.float32)
    assert check_quant_params(params, CFG, "int4g32") == []
    bad = dict(params)
    bad["lm_head"] = {k: v[: v.shape[0] // 2] for k, v in params["lm_head"].items()}
    assert check_quant_params(bad, CFG, "int4g32")


def test_flash_attention_sharded_matches_xla():
    """Flash kernels under shard_map (q heads over the model axis, KV
    replicated, batch over data) must match the GSPMD XLA attention path."""
    quant_type = "none"
    params = M.init_params(jax.random.PRNGKey(10), CFG, quant_type, jnp.float32)
    mesh = S.make_mesh(2, 4)
    sharded = S.shard_params(params, mesh, CFG, quant_type)

    prompt = jax.random.randint(jax.random.PRNGKey(11), (2, 8), 0, CFG.vocab_size)
    lengths = jnp.asarray([8, 6], jnp.int32)

    def run(rt):
        cache = M.init_kv_cache(CFG, 2, 32, jnp.float32)
        cache = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            cache, S.kv_cache_pspecs(),
        )
        with mesh:
            logits, cache = M.prefill(sharded, CFG, prompt, lengths, cache,
                                      quant_type, jnp.float32, rt)
            out = [np.asarray(logits)]
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            for _ in range(3):
                logits, cache = M.decode_step(sharded, CFG, tok, cache,
                                              quant_type, jnp.float32, rt)
                out.append(np.asarray(logits))
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
        return out

    xla = run(TpuRuntimeConfig(use_pallas=False, use_flash_attention=False))
    flash = run(TpuRuntimeConfig(use_pallas=False, use_flash_attention=True,
                                 mesh=mesh))
    for a, b in zip(xla, flash):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)


def test_engine_sharded_with_flash():
    """Continuous batching over TP-sharded params WITH the shard_map flash
    attention path — tokens must match the unsharded XLA engine."""
    from chatglm_q_tpu.config import GLMLoadConfig
    from chatglm_q_tpu.serving.engine import ServingEngine

    quant_type = "none"
    params = M.init_params(jax.random.PRNGKey(12), CFG, quant_type, jnp.float32)
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    prompts = [[3, 17, 42], [7, 9, 11, 13]]

    eng = ServingEngine(load_cfg, params, None, max_batch=2, max_seq_len=64,
                        decode_chunk=4, rt=RT)
    ref_out = eng.run(prompts, max_new_tokens=4, temperature=0.0)

    mesh = S.make_mesh(1, 8)
    sharded = S.shard_params(params, mesh, CFG, quant_type)
    rt_flash = TpuRuntimeConfig(use_pallas=False, use_flash_attention=True,
                                mesh=mesh)
    with mesh:
        eng2 = ServingEngine(load_cfg, sharded, None, max_batch=2,
                             max_seq_len=64, decode_chunk=4, rt=rt_flash)
        tp_out = eng2.run(prompts, max_new_tokens=4, temperature=0.0)
    assert ref_out == tp_out


def test_distributed_engine_cross_shard_batching():
    """Cross-host continuous batching mechanism (BASELINE config 5) on the
    virtual mesh: data axis > 1, slots owned by different data shards,
    admissions balanced across shards, tokens exact vs the plain engine."""
    from chatglm_q_tpu.config import GLMLoadConfig
    from chatglm_q_tpu.serving.engine import ServingEngine
    from chatglm_q_tpu.serving.dist_engine import DistributedServingEngine

    quant_type = "int8"
    params = M.init_params(jax.random.PRNGKey(21), CFG, quant_type, jnp.float32)
    load_cfg = GLMLoadConfig(model_config=CFG, quant_type=quant_type,
                             torch_dtype="float32")
    prompts = [[3, 17, 42], [7, 9, 11, 13], [5, 6], [101, 102, 103]]

    eng = ServingEngine(load_cfg, params, None, max_batch=4, max_seq_len=64,
                        decode_chunk=4, rt=RT)
    ref_out = eng.run(prompts, max_new_tokens=5, temperature=0.0)

    mesh = S.make_mesh(2, 4)
    sharded = S.shard_params(params, mesh, CFG, quant_type)
    with mesh:
        deng = DistributedServingEngine(
            load_cfg, sharded, None, mesh=mesh, max_batch=4, max_seq_len=64,
            decode_chunk=4, rt=TpuRuntimeConfig(use_pallas=False),
        )
        # submit 2 of 4: the balancer must place them on DIFFERENT data shards
        deng.sync_submissions(prompts[:2], max_new_tokens=5, temperature=0.0)
        deng._admit()
        owners = {deng._shard_of(i) for i, s in enumerate(deng.slots)
                  if s.request is not None}
        assert owners == {0, 1}, owners
        deng.sync_submissions(prompts[2:], max_new_tokens=5, temperature=0.0)
        while deng.has_work:
            deng.step()
        by_id = {r.req_id: r.generated for r in deng.finished}
        dist_out = [by_id[i] for i in sorted(by_id)]
    assert ref_out == dist_out


def test_distributed_engine_chunked_admission():
    """Chunked prefill under the SPMD engine: compact chunk batches with
    kernel row maps must stay token-exact over a (data, model) mesh."""
    from chatglm_q_tpu.config import GLMLoadConfig
    from chatglm_q_tpu.serving.engine import ServingEngine
    from chatglm_q_tpu.serving.dist_engine import DistributedServingEngine

    params = M.init_params(jax.random.PRNGKey(22), CFG, "none", jnp.float32)
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    rng = np.random.RandomState(9)
    prompts = [rng.randint(3, 120, size=n).tolist() for n in (19, 4, 26, 9)]

    eng = ServingEngine(load_cfg, params, None, max_batch=4, max_seq_len=64,
                        decode_chunk=4, rt=RT)
    ref_out = eng.run(prompts, max_new_tokens=5, temperature=0.0)

    mesh = S.make_mesh(2, 4)
    sharded = S.shard_params(params, mesh, CFG, "none")
    with mesh:
        deng = DistributedServingEngine(
            load_cfg, sharded, None, mesh=mesh, max_batch=4, max_seq_len=64,
            decode_chunk=4, prefill_chunk_size=8,
            rt=TpuRuntimeConfig(use_pallas=False),
        )
        deng.sync_submissions(prompts, max_new_tokens=5, temperature=0.0)
        while deng.has_work:
            deng.step()
        by_id = {r.req_id: r.generated for r in deng.finished}
        dist_out = [by_id[i] for i in sorted(by_id)]
    assert ref_out == dist_out


def test_decode_kv_tsharded_matches_single_device():
    """Sequence-sharded KV cache (kv_shard_t): per-shard flash partials +
    log-sum-exp merge must match the unsharded decode exactly; per-chip KV
    bytes drop tp× by construction (cache T dim sharded over model)."""
    quant_type = "none"
    params = M.init_params(jax.random.PRNGKey(30), CFG, quant_type, jnp.float32)
    prompt = jax.random.randint(jax.random.PRNGKey(31), (2, 8), 0, CFG.vocab_size)
    lengths = jnp.asarray([8, 5], jnp.int32)

    def run(rt, mesh=None, shard_t=False):
        cache = M.init_kv_cache(CFG, 2, 64, jnp.float32)
        if mesh is not None:
            cache = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                cache, S.kv_cache_pspecs(shard_t=shard_t),
            )
        logits, cache = M.prefill(params_in, CFG, prompt, lengths, cache,
                                  quant_type, jnp.float32, rt)
        out = [np.asarray(logits)]
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        for _ in range(4):
            logits, cache = M.decode_step(params_in, CFG, tok, cache,
                                          quant_type, jnp.float32, rt)
            out.append(np.asarray(logits))
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
        return out

    params_in = params
    ref = run(TpuRuntimeConfig(use_pallas=False, use_flash_attention=False))

    mesh = S.make_mesh(2, 4)
    params_in = S.shard_params(params, mesh, CFG, quant_type)
    # cache (L,B,G,T,D): T=64 over model=4 → 16 per chip (8-aligned)
    rt = TpuRuntimeConfig(use_pallas=False, use_flash_attention=True,
                          mesh=mesh, kv_shard_t=True)
    with mesh:
        sharded = run(rt, mesh, shard_t=True)
    for a, b in zip(ref, sharded):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)


def test_tsharded_kernel_merge_exactness():
    """flash_attention_decode_kv_tsharded vs the plain kernel on the same
    data — merge of per-shard online-softmax partials is exact."""
    from chatglm_q_tpu.ops.pallas_attention import (
        flash_attention_decode, flash_attention_decode_kv_tsharded)

    B, T, G, Hg, D = 2, 64, 2, 4, 128
    q = jax.random.normal(jax.random.PRNGKey(40), (B, G, Hg, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(41), (B, G, T, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(42), (B, G, T, D), jnp.float32)
    lengths = jnp.asarray([3, 60], jnp.int32)  # one row confined to shard 0
    sm = 1.0 / np.sqrt(D)

    ref = flash_attention_decode(q, k, v, lengths, sm, 16, interpret=True)
    mesh = S.make_mesh(2, 4)
    with mesh:
        got = flash_attention_decode_kv_tsharded(
            q, k, v, lengths, sm, mesh, 16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_partition_freezes_quantized_scales_and_bias():
    """weight_scale (and bias) of a QUANTIZED linear are buffers of the
    packed weight: they must land in the FROZEN tree, or an optimizer's
    weight decay would shrink the scales toward 0 with zero gradient
    (reference registers them as non-trainable, int8/qlinear.py:83-87)."""
    import optax
    from chatglm_q_tpu.utils.train import (partition_params, merge_params,
                                           make_train_step)

    cfg = ChatGLM2Config(
        hidden_size=64, inner_hidden_size=64, head_hidden_size=16,
        num_multi_query_groups=2, num_attention_heads=4, num_layers=2,
        vocab_size=128, max_sequence_length=64)
    params = M.init_params(jax.random.PRNGKey(0), cfg, "int4g32", jnp.float32)
    trainable, frozen = partition_params(params)
    # every quantized-linear leaf is frozen — scales included
    assert trainable["layers"]["w_out"]["weight_scale"] is None
    assert frozen["layers"]["w_out"]["weight_scale"] is not None
    # float leaves outside quantized dicts stay trainable
    assert trainable["layers"]["attn_ln"]["weight"] is not None
    assert merge_params(trainable, frozen)["layers"]["w_out"]["weight"].dtype == jnp.uint8

    # one adamw step (weight decay!) must not touch the scales
    opt = optax.adamw(1e-2, weight_decay=0.1)
    step = make_train_step(cfg, "int4g32", opt, dtype=jnp.float32,
                           rt=TpuRuntimeConfig(use_pallas=False,
                                               use_flash_attention=False))
    opt_state = opt.init(trainable)
    ids = jnp.ones((2, 8), jnp.int32)
    labels = jnp.ones((2, 8), jnp.int32)
    before = np.asarray(frozen["layers"]["w_out"]["weight_scale"])
    trainable2, _, loss = step(trainable, frozen, opt_state, ids, labels)
    after = np.asarray(frozen["layers"]["w_out"]["weight_scale"])
    np.testing.assert_array_equal(before, after)
    assert np.isfinite(float(loss))
    # the norm weight DID update
    assert not np.array_equal(
        np.asarray(trainable["layers"]["attn_ln"]["weight"]),
        np.asarray(trainable2["layers"]["attn_ln"]["weight"]))


def test_remat_layers_grads_bit_match():
    """rt.remat_layers (jax.checkpoint around the layer-scan body) must be
    a pure memory/FLOPs trade: loss and grads identical to the plain scan."""
    import optax

    from chatglm_q_tpu.utils.train import make_train_step, partition_params

    cfg = ChatGLM2Config(
        hidden_size=64, inner_hidden_size=128, head_hidden_size=16,
        num_multi_query_groups=2, num_attention_heads=4, num_layers=3,
        vocab_size=128, max_sequence_length=32,
    )
    params = M.init_params(jax.random.PRNGKey(0), cfg, "int4g32", jnp.float32)
    trainable, frozen = partition_params(params)
    opt = optax.sgd(1e-2)
    opt_state = opt.init(trainable)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)
    labels = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 128)

    outs = {}
    for remat in (False, True):
        rt = TpuRuntimeConfig(use_pallas=False, remat_layers=remat)
        step = jax.jit(make_train_step(cfg, "int4g32", opt, jnp.float32, rt))
        t2, _, loss = step(trainable, frozen, opt_state, ids, labels)
        outs[remat] = (float(loss), t2)

    assert outs[False][0] == outs[True][0]
    for a, b in zip(jax.tree.leaves(outs[False][1]),
                    jax.tree.leaves(outs[True][1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("quant_type", ["int8", "int4g32"])
@pytest.mark.parametrize("mesh_shape", [(1, 4), (2, 2)])
def test_tp_pallas_decode_matches_single_device(quant_type, mesh_shape):
    """rt.tp_pallas: every linear runs as a per-shard fused kernel under
    shard_map (Megatron col/row placement, parallel/tp_linear.py) — prefill
    + decode tokens must match the single-device fallback path exactly."""
    cfg = ChatGLM2Config(
        hidden_size=256, inner_hidden_size=512, head_hidden_size=32,
        num_multi_query_groups=2, num_attention_heads=8, num_layers=2,
        vocab_size=1024, max_sequence_length=64,
    )
    params = M.init_params(jax.random.PRNGKey(0), cfg, quant_type, jnp.float32)

    def run(rt, p):
        cache = M.init_kv_cache(cfg, 2, 32, jnp.float32)
        ids = jnp.asarray([[3, 17, 42, 99], [5, 7, 11, 13]])
        lengths = jnp.full((2,), 4, jnp.int32)
        logits, cache = jax.jit(
            lambda p, i, l, c: M.prefill(p, cfg, i, l, c, quant_type,
                                         jnp.float32, rt))(p, ids, lengths, cache)
        step = jax.jit(lambda p, t, c: M.decode_step(p, cfg, t, c, quant_type,
                                                     jnp.float32, rt))
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        out = [np.asarray(tok)]
        for _ in range(3):
            logits, cache = step(p, tok, cache)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            out.append(np.asarray(tok))
        return np.stack(out)

    want = run(TpuRuntimeConfig(use_pallas=False, use_flash_attention=False),
               params)

    mesh = S.make_mesh(*mesh_shape)
    sharded = S.shard_params(params, mesh, cfg, quant_type)
    rt_tp = TpuRuntimeConfig(use_pallas=True, use_flash_attention=False,
                             tp_pallas=True, mesh=mesh)
    with mesh:
        got = run(rt_tp, sharded)
    np.testing.assert_array_equal(got, want)


def test_tp_pallas_row_mode_with_storage_padded_k():
    """Row-parallel with logical K < storage K (int4_storage_k padding):
    activations must be padded GLOBALLY before sharding — per-shard padding
    silently misaligns x columns against weight rows (round-3 review)."""
    from chatglm_q_tpu.ops.linear import quant_linear
    from chatglm_q_tpu.ops.quant import int4_storage_k, quantize_linear_int4

    K_logical = 1152
    Ks = int4_storage_k(K_logical)
    assert Ks != K_logical, "test needs a storage-padded K"
    N = 128
    w = jax.random.normal(jax.random.PRNGKey(0), (K_logical, N), jnp.float32) * 0.1
    p = quantize_linear_int4(w)   # storage-padded packed weights
    x = jax.random.normal(jax.random.PRNGKey(1), (4, K_logical), jnp.float32)

    want = quant_linear(x, p, "int4g32",
                        TpuRuntimeConfig(use_pallas=False))

    mesh = S.make_mesh(1, 4)
    from jax.sharding import NamedSharding
    sp = {"weight": NamedSharding(mesh, P(S.MODEL_AXIS, None)),
          "weight_scale": NamedSharding(mesh, P(S.MODEL_AXIS, None))}
    p_sh = {k: jax.device_put(v, sp[k]) for k, v in p.items()}
    rt = TpuRuntimeConfig(use_pallas=True, tp_pallas=True, mesh=mesh)
    with mesh:
        got = jax.jit(lambda a, b: quant_linear(a, b, "int4g32", rt,
                                                tp_mode="row"))(x, p_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tp_pallas_dynamic_int8_col_exact_row_refuses():
    """Under tp_pallas, dynamic-int8 col-parallel linears see the full K
    row per shard, so their activation scales — and therefore tokens —
    match the single-device dynamic_int8 kernel exactly; row-parallel
    would change the numerics and must refuse loudly."""
    from chatglm_q_tpu.ops.linear import quant_linear
    from chatglm_q_tpu.ops.quant import quantize_linear_int8

    K, N = 256, 512
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.1
    p = quantize_linear_int8(w)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, K), jnp.float32)

    want = quant_linear(x, p, "int8",
                        TpuRuntimeConfig(use_pallas=True, dynamic_int8=True))

    mesh = S.make_mesh(1, 4)
    from jax.sharding import NamedSharding
    p_sh = {"weight": jax.device_put(p["weight"],
                                     NamedSharding(mesh, P(None, S.MODEL_AXIS))),
            "weight_scale": jax.device_put(p["weight_scale"],
                                           NamedSharding(mesh, P(S.MODEL_AXIS)))}
    rt = TpuRuntimeConfig(use_pallas=True, tp_pallas=True, dynamic_int8=True,
                          mesh=mesh)
    with mesh:
        got = jax.jit(lambda a, b: quant_linear(a, b, "int8", rt,
                                                tp_mode="col"))(x, p_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError, match="row-parallel"):
        with mesh:
            quant_linear(x, p_sh, "int8", rt, tp_mode="row")
