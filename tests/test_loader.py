"""Loader tests: save→load round trips for every quant type, plus two-way
interop with checkpoints produced/consumed by the reference implementation
(the decisive format-compatibility check, SURVEY.md §7)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/reference")

# The reference's loader imports `sentencepiece` at module scope; it is not
# installed here (this package ships its own tokenizer engine).  Shim it so
# the reference loader can be imported for interop tests that don't touch
# the tokenizer (load_tokenizer=False).
if "sentencepiece" not in sys.modules:
    import types

    _shim = types.ModuleType("sentencepiece")

    class _SPUnavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("sentencepiece shim: tokenizer not available in tests")

    _shim.SentencePieceProcessor = _SPUnavailable
    _shim._is_shim = True
    import importlib.machinery

    _shim.__spec__ = importlib.machinery.ModuleSpec("sentencepiece", None)
    sys.modules["sentencepiece"] = _shim

from chatglm_q_tpu.config import ChatGLM2Config, GLMLoadConfig, TpuRuntimeConfig
from chatglm_q_tpu import loader as LD
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.tokenizer.build import build_unigram_model

RT = TpuRuntimeConfig(use_pallas=False)

TINY = dict(
    hidden_size=64, inner_hidden_size=64, head_hidden_size=16,
    num_multi_query_groups=2, num_attention_heads=4, num_layers=2,
    vocab_size=128, max_sequence_length=64,
)


def tiny_tokenizer_file(tmp_path):
    data = build_unigram_model({"hello": -1.0, "world": -2.0})
    p = tmp_path / "sentencepiece.model"
    p.write_bytes(data)
    return p


@pytest.mark.parametrize("quant_type", ["none", "int8", "int4g32"])
def test_save_load_roundtrip(tmp_path, quant_type):
    cfg = ChatGLM2Config(**TINY)
    params = M.init_params(jax.random.PRNGKey(0), cfg, quant_type, jnp.float32)
    load_cfg = GLMLoadConfig(model_config=cfg, quant_type=quant_type, torch_dtype="float32")

    from chatglm_q_tpu.tokenizer import ChatGLM2Tokenizer

    tok = ChatGLM2Tokenizer(tiny_tokenizer_file(tmp_path))
    LD.save_model_and_tokenizer(tmp_path / "ckpt", load_cfg, params, tok)

    cfg2, params2, tok2 = LD.load_model_and_tokenizer(tmp_path / "ckpt")
    assert cfg2.quant_type == quant_type
    assert tok2 is not None

    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = jax.tree_util.tree_leaves_with_path(params2)
    assert len(flat1) == len(flat2)
    for (p1, v1), (p2, v2) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2), err_msg=str(p1))


def test_sharded_save(tmp_path):
    cfg = ChatGLM2Config(**TINY)
    params = M.init_params(jax.random.PRNGKey(1), cfg, "none", jnp.float32)
    load_cfg = GLMLoadConfig(model_config=cfg, torch_dtype="float32")
    LD.save_model_and_tokenizer(
        tmp_path / "ckpt", load_cfg, params, None, max_shard_bytes=200_000
    )
    assert len(load_cfg.weight_files) > 1
    _, params2, _ = LD.load_model_and_tokenizer(tmp_path / "ckpt", load_tokenizer=False)
    l1 = jax.tree.leaves(params)
    l2 = jax.tree.leaves(params2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("quant_type", ["none", "int8", "int4g32"])
def test_load_reference_produced_checkpoint(tmp_path, quant_type):
    """Checkpoint written by the reference's own save path must load here
    and produce matching logits."""
    torch = pytest.importorskip("torch")
    from chatglm_q import model as RM
    from chatglm_q import loader as RL
    from tests.test_model_parity import make_ref_model

    _, ref = make_ref_model(seed=3)
    if quant_type == "int8":
        from chatglm_q.int8.quantizer import get_quant_int8_linear, get_quant_embedding
        conv, econv = get_quant_int8_linear, get_quant_embedding
    elif quant_type == "int4g32":
        from chatglm_q.int4.quantizer import get_quant_int4_linear, get_quant_embedding
        conv, econv = get_quant_int4_linear, get_quant_embedding
    if quant_type != "none":
        with torch.no_grad():
            ref.word_embedding = econv(ref.word_embedding)
            for layer in ref.layers:
                layer.attn.qkv_proj = conv(layer.attn.qkv_proj)
                layer.attn.o_proj = conv(layer.attn.o_proj)
                layer.ffn.w_in = conv(layer.ffn.w_in)
                layer.ffn.w_out = conv(layer.ffn.w_out)
            ref.lm_head = conv(ref.lm_head)

    # save through the REFERENCE's saver (torch safetensors)
    ckpt = tmp_path / "ref_ckpt"
    ckpt.mkdir()
    from safetensors.torch import save_file

    save_file(ref.state_dict(), ckpt / "model_weights.safetensors")
    rc = RL.ChatGLMLoadConfig(
        model_config=RM.ChatGLM2Config(**{
            k: getattr(ref.config, k)
            for k in ("hidden_size", "inner_hidden_size", "head_hidden_size",
                      "num_multi_query_groups", "num_attention_heads", "num_layers",
                      "vocab_size", "max_sequence_length")
        }),
        quant_type=quant_type,
        weight_files=["model_weights.safetensors"],
        torch_dtype="float32",
    )
    (ckpt / "config.json").write_text(rc.to_json())
    (ckpt / "sentencepiece.model").write_bytes(build_unigram_model({"x": -1.0}))

    cfg2, params, _ = LD.load_model_and_tokenizer(ckpt)
    ids = np.array([[3, 17, 42, 99]], dtype=np.int64)
    with torch.no_grad():
        _, ref_logits, _ = ref(input_ids=torch.tensor(ids))
    _, logits = M.forward(params, cfg2.model_config, jnp.asarray(ids),
                          quant_type=quant_type, rt=RT)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_our_checkpoint_loads_in_reference(tmp_path):
    """Reverse interop: our int4g32 save must round-trip through the
    reference's loader and give matching state tensors."""
    torch = pytest.importorskip("torch")
    from chatglm_q import loader as RL

    cfg = ChatGLM2Config(**TINY)
    params = M.init_params(jax.random.PRNGKey(5), cfg, "int4g32", jnp.float32)
    load_cfg = GLMLoadConfig(model_config=cfg, quant_type="int4g32", torch_dtype="float32")
    from chatglm_q_tpu.tokenizer import ChatGLM2Tokenizer

    tok = ChatGLM2Tokenizer(tiny_tokenizer_file(tmp_path))
    LD.save_model_and_tokenizer(tmp_path / "ours", load_cfg, params, tok)

    _, ref_model, _ = RL.load_model_and_tokenizer(tmp_path / "ours", load_tokenizer=False)
    # pick one tensor and verify the packed bytes match our repack inverse
    from chatglm_q_tpu.ops.quant import repack_tpu_to_ref

    ours_packed = np.asarray(params["layers"]["o_proj"]["weight"][0])
    ref_packed = ref_model.layers[0].attn.o_proj.weight.numpy()
    np.testing.assert_array_equal(repack_tpu_to_ref(ours_packed), ref_packed)

    ids = torch.tensor([[3, 17, 42, 99]])
    with torch.no_grad():
        _, ref_logits, _ = ref_model(input_ids=ids)
    _, logits = M.forward(params, cfg, jnp.asarray(ids.numpy()),
                          quant_type="int4g32", rt=RT)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_ignored_and_missing_keys(tmp_path, capsys):
    """Lenient load: unknown checkpoint keys are reported and skipped;
    missing model weights raise a clear error (reference loader.py:97-110)."""
    cfg = ChatGLM2Config(**TINY)
    params = M.init_params(jax.random.PRNGKey(9), cfg, "none", jnp.float32)
    load_cfg = GLMLoadConfig(model_config=cfg, torch_dtype="float32")
    LD.save_model_and_tokenizer(tmp_path / "ok", load_cfg, params, None)

    # add an unknown tensor → warning, still loads
    import numpy as _np
    from safetensors.numpy import save_file, load_file

    f = tmp_path / "ok" / load_cfg.weight_files[0]
    sd = load_file(f)
    sd["mystery.weight"] = _np.zeros((2, 2), _np.float32)
    save_file(sd, f)
    _, p2, _ = LD.load_model_and_tokenizer(tmp_path / "ok", load_tokenizer=False)
    assert "mystery.weight" in capsys.readouterr().out
    assert p2 is not None

    # remove a required tensor → clear KeyError
    sd.pop("final_ln.weight")
    sd.pop("mystery.weight")
    save_file(sd, f)
    with pytest.raises(KeyError, match="final_ln"):
        LD.load_model_and_tokenizer(tmp_path / "ok", load_tokenizer=False)
