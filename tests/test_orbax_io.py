"""Orbax native checkpointing: plain and sharded round trips."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding

from chatglm_q_tpu.config import ChatGLM2Config
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.parallel import sharding as S
from chatglm_q_tpu.utils import orbax_io

CFG = ChatGLM2Config(
    hidden_size=64, inner_hidden_size=64, head_hidden_size=16,
    num_multi_query_groups=2, num_attention_heads=4, num_layers=2,
    vocab_size=128, max_sequence_length=64,
)


def test_roundtrip_plain(tmp_path):
    params = M.init_params(jax.random.PRNGKey(0), CFG, "int8", jnp.float32)
    orbax_io.save_params(tmp_path / "ckpt", params)
    restored = orbax_io.load_params(tmp_path / "ckpt", like=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_roundtrip_sharded_restore(tmp_path):
    quant_type = "int4g32"
    cfg = ChatGLM2Config(
        hidden_size=256, inner_hidden_size=512, head_hidden_size=32,
        num_multi_query_groups=2, num_attention_heads=8, num_layers=2,
        vocab_size=1024, max_sequence_length=64,
    )
    params = M.init_params(jax.random.PRNGKey(1), cfg, quant_type, jnp.float32)
    orbax_io.save_params(tmp_path / "ckpt", params)

    mesh = S.make_mesh(2, 4)
    specs = S.param_pspecs(cfg, quant_type, params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: not isinstance(x, dict))
    restored = orbax_io.load_params(tmp_path / "ckpt", like=params,
                                    shardings=shardings)
    # correct values and actually sharded
    np.testing.assert_array_equal(
        np.asarray(restored["layers"]["q_proj"]["weight"]),
        np.asarray(params["layers"]["q_proj"]["weight"]),
    )
    sh = restored["layers"]["q_proj"]["weight"].sharding
    assert isinstance(sh, NamedSharding) and sh.spec == specs["layers"]["q_proj"]["weight"]
