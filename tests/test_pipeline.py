"""Pipeline parallelism (parallel/pipeline.py): the GPipe schedule over the
stacked layer dim must be numerically identical to the plain lax.scan
forward — logits, loss AND gradients (autodiff through ppermute gives the
backward pipeline) — including through frozen quantized layers."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.parallel import pipeline as PP

CFG = ChatGLM2Config(
    hidden_size=64, inner_hidden_size=128, head_hidden_size=16,
    num_multi_query_groups=2, num_attention_heads=4, num_layers=4,
    vocab_size=256, max_sequence_length=64,
)
RT = TpuRuntimeConfig(use_pallas=False)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _stage_mesh(n_stage):
    devs = np.array(jax.devices()[:8]).reshape(n_stage, -1)
    return Mesh(devs, (PP.STAGE_AXIS, "rep"))


@pytest.mark.parametrize("quant_type", ["none", "int4g32"])
@pytest.mark.parametrize("n_stage,n_micro", [(2, 2), (4, 4)])
def test_pp_forward_matches_plain(quant_type, n_stage, n_micro):
    params = M.init_params(jax.random.PRNGKey(0), CFG, quant_type, jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 24), 0, CFG.vocab_size)
    labels = jax.random.randint(jax.random.PRNGKey(2), (4, 24), 0, CFG.vocab_size)
    labels = labels.at[:, :3].set(-100)

    want_loss, want_logits = M.forward(params, CFG, ids, labels=labels,
                                       quant_type=quant_type, rt=RT)
    mesh = _stage_mesh(n_stage)
    with mesh:
        sharded = PP.shard_layers(params, mesh)
        got_loss, got_logits = jax.jit(
            lambda p, i, l: PP.pp_forward(p, CFG, i, l, quant_type,
                                          jnp.float32, RT, mesh, n_micro)
        )(sharded, ids, labels)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(want_logits),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)


def test_pp_grads_match_plain():
    """Backward pipeline: grads of the loss wrt float params (layer norms,
    embedding, lm_head) under the pipeline must equal the plain forward's —
    the stage-sharded layer grads come back in the same stacked layout."""
    params = M.init_params(jax.random.PRNGKey(3), CFG, "none", jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(4), (4, 16), 0, CFG.vocab_size)
    labels = jax.random.randint(jax.random.PRNGKey(5), (4, 16), 0, CFG.vocab_size)

    def plain_loss(p):
        loss, _ = M.forward(p, CFG, ids, labels=labels, quant_type="none",
                            rt=RT)
        return loss

    want = jax.grad(plain_loss)(params)

    mesh = _stage_mesh(2)
    with mesh:
        sharded = PP.shard_layers(params, mesh)

        def pp_loss(p):
            loss, _ = PP.pp_forward(p, CFG, ids, labels, "none", jnp.float32,
                                    RT, mesh, n_micro=2)
            return loss

        got = jax.jit(jax.grad(pp_loss))(sharded)

    for path in (
        ("final_ln", "weight"),
        ("word_embedding", "weight"),
        ("lm_head", "weight"),
    ):
        g_w, g_g = want, got
        for k in path:
            g_w, g_g = g_w[k], g_g[k]
        np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_w),
                                   rtol=3e-4, atol=3e-5, err_msg=str(path))
    # stage-sharded stacked layer grads: same global shape/layout
    gl_w = want["layers"]["attn_ln"]["weight"]
    gl_g = got["layers"]["attn_ln"]["weight"]
    np.testing.assert_allclose(np.asarray(gl_g), np.asarray(gl_w),
                               rtol=3e-4, atol=3e-5)


def test_pp_train_step_through_quantized_layers():
    """One optax step through the pipeline with int4g32 frozen packed
    weights: float leaves update, loss finite, packed weights untouched."""
    import optax
    from chatglm_q_tpu.utils.train import merge_params, partition_params

    params = M.init_params(jax.random.PRNGKey(6), CFG, "int4g32", jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(7), (4, 16), 0, CFG.vocab_size)
    labels = jax.random.randint(jax.random.PRNGKey(8), (4, 16), 0, CFG.vocab_size)
    mesh = _stage_mesh(2)
    with mesh:
        sharded = PP.shard_layers(params, mesh)
        trainable, frozen = partition_params(sharded)
        opt = optax.sgd(1e-2)
        state = opt.init(trainable)

        def loss_fn(tr):
            merged = merge_params(tr, frozen)
            loss, _ = PP.pp_forward(merged, CFG, ids, labels, "int4g32",
                                    jnp.float32, RT, mesh, n_micro=2)
            return loss

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(trainable)
        updates, state = opt.update(grads, state)
        new_tr = optax.apply_updates(trainable, updates)
    assert np.isfinite(float(loss))
    before = np.asarray(trainable["final_ln"]["weight"])
    after = np.asarray(new_tr["final_ln"]["weight"])
    assert not np.allclose(before, after)
