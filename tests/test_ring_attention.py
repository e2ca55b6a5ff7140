"""Ring (context-parallel) attention vs the dense oracle on the CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from chatglm_q_tpu.parallel import sharding as S
from chatglm_q_tpu.parallel.ring_attention import ring_attention

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def oracle(q, k, v, lengths, sm):
    B, Sq, G, Hg, D = q.shape
    s = jnp.einsum("bsghd,btgd->bghst", q, k) * sm
    tq = jnp.arange(Sq)[:, None]
    tk = jnp.arange(Sq)[None, :]
    m = (tk <= tq)[None] & (tk[None] < lengths[:, None, None])
    p = jax.nn.softmax(jnp.where(m[:, None, None], s, -1e30), axis=-1)
    return jnp.einsum("bghst,btgd->bsghd", p, v)


@pytest.mark.parametrize("n_sp", [2, 4, 8])
def test_ring_matches_oracle(n_sp):
    B, Sq, G, Hg, D = 2, 64, 2, 4, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, Sq, G, Hg, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, Sq, G, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, Sq, G, D))
    lengths = jnp.asarray([40, 64], jnp.int32)
    sm = 1.0 / np.sqrt(D)

    ref = oracle(q, k, v, lengths, sm)

    mesh = S.make_mesh(1, n_sp)
    spec = P(None, S.MODEL_AXIS, None, None, None)
    qs = jax.device_put(q, NamedSharding(mesh, spec))
    ks = jax.device_put(k, NamedSharding(mesh, P(None, S.MODEL_AXIS, None, None)))
    vs = jax.device_put(v, NamedSharding(mesh, P(None, S.MODEL_AXIS, None, None)))

    out = ring_attention(qs, ks, vs, lengths, mesh, S.MODEL_AXIS, sm)
    valid = np.asarray(jnp.arange(Sq)[None, :] < lengths[:, None])
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], rtol=2e-5, atol=2e-5
    )


def test_ring_under_jit():
    B, Sq, G, Hg, D = 1, 32, 2, 2, 8
    mesh = S.make_mesh(1, 4)
    q = jax.random.normal(jax.random.PRNGKey(3), (B, Sq, G, Hg, D))
    k = jax.random.normal(jax.random.PRNGKey(4), (B, Sq, G, D))
    v = jax.random.normal(jax.random.PRNGKey(5), (B, Sq, G, D))
    lengths = jnp.asarray([32], jnp.int32)

    f = jax.jit(lambda q, k, v, l: ring_attention(q, k, v, l, mesh, S.MODEL_AXIS))
    out = f(q, k, v, lengths)
    ref = oracle(q, k, v, lengths, 1.0 / np.sqrt(D))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_ring_zero_length_row_is_zeros():
    """A row with NO valid keys (padding row in a ragged batch) must return
    zeros, not mean-of-v garbage (fully-masked blocks previously leaked
    p = exp(0) into l/acc, defeating the l == 0 guard)."""
    B, Sq, G, Hg, D = 2, 32, 2, 4, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, Sq, G, Hg, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, Sq, G, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, Sq, G, D))
    lengths = jnp.asarray([0, 32], jnp.int32)
    sm = 1.0 / np.sqrt(D)
    mesh = S.make_mesh(1, 4)
    spec = P(None, S.MODEL_AXIS, None, None, None)
    qs = jax.device_put(q, NamedSharding(mesh, spec))
    ks = jax.device_put(k, NamedSharding(mesh, P(None, S.MODEL_AXIS, None, None)))
    vs = jax.device_put(v, NamedSharding(mesh, P(None, S.MODEL_AXIS, None, None)))
    out = np.asarray(ring_attention(qs, ks, vs, lengths, mesh, S.MODEL_AXIS, sm))
    np.testing.assert_array_equal(out[0], 0.0)
    ref = oracle(q, k, v, lengths, sm)
    np.testing.assert_allclose(out[1], np.asarray(ref)[1], rtol=2e-5, atol=2e-5)
