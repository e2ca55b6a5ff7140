"""End-to-end numeric parity of the JAX model core against the reference
PyTorch implementation (imported from /root/reference as a test oracle only —
no reference code ships in this package).

Covers: dense fp32 forward, masked/padded batches, loss, int8 and int4g32
quantized forwards, and quantizer-grid equality.
"""
import dataclasses
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")
ref_model_mod = pytest.importorskip("chatglm_q.model")

from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.ops import quant as Q

RT = TpuRuntimeConfig(use_pallas=False)

TINY = dict(
    hidden_size=64,
    inner_hidden_size=64,
    head_hidden_size=16,
    num_multi_query_groups=2,
    num_attention_heads=4,
    num_layers=2,
    vocab_size=128,
    max_sequence_length=64,
)


def make_ref_model(seed=0):
    torch.manual_seed(seed)
    cfg = ref_model_mod.ChatGLM2Config(**TINY)
    model = ref_model_mod.ChatGLM2Model(cfg, dtype=torch.float32)
    with torch.no_grad():
        for p in model.state_dict().values():
            if p.is_floating_point():
                p.normal_(0.0, 0.05)
        # norms near 1 for realism
        for name, p in model.state_dict().items():
            if "ln.weight" in name:
                p.normal_(1.0, 0.02)
    return cfg, model


def torch_to_params(model, quant_type="none"):
    """Convert a reference float state_dict to our param pytree (splitting the
    fused qkv/w_in tensors, transposing linears to K-major)."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = model.config
    qs = cfg.head_hidden_size * cfg.num_attention_heads
    inner = cfg.inner_hidden_size
    L = cfg.num_layers

    def linear(w_nk, bias=None):
        w = jnp.asarray(w_nk.T)  # (K, N)
        if quant_type == "none":
            p = {"weight": w}
        elif quant_type == "int8":
            p = Q.quantize_linear_int8(w)
        else:
            p = Q.quantize_linear_int4(w)
        if bias is not None:
            p["bias"] = jnp.asarray(bias)
        return p

    def stack(fn):
        per_layer = [fn(i) for i in range(L)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)

    layers = {
        "attn_ln": {
            "weight": jnp.stack([jnp.asarray(sd[f"layers.{i}.attn_ln.weight"]) for i in range(L)])
        },
        "ffn_ln": {
            "weight": jnp.stack([jnp.asarray(sd[f"layers.{i}.ffn_ln.weight"]) for i in range(L)])
        },
        "q_proj": stack(
            lambda i: linear(
                sd[f"layers.{i}.attn.qkv_proj.weight"][:qs],
                sd[f"layers.{i}.attn.qkv_proj.bias"][:qs],
            )
        ),
        "kv_proj": stack(
            lambda i: linear(
                sd[f"layers.{i}.attn.qkv_proj.weight"][qs:],
                sd[f"layers.{i}.attn.qkv_proj.bias"][qs:],
            )
        ),
        "o_proj": stack(lambda i: linear(sd[f"layers.{i}.attn.o_proj.weight"])),
        "w_in_h": stack(lambda i: linear(sd[f"layers.{i}.ffn.w_in.weight"][:inner])),
        "w_in_gate": stack(lambda i: linear(sd[f"layers.{i}.ffn.w_in.weight"][inner:])),
        "w_out": stack(lambda i: linear(sd[f"layers.{i}.ffn.w_out.weight"])),
    }

    emb_w = sd["word_embedding.weight"]
    if quant_type == "none":
        emb = {"weight": jnp.asarray(emb_w)}
    elif quant_type == "int8":
        emb = Q.quantize_embedding_int8(jnp.asarray(emb_w))
    else:
        emb = Q.quantize_embedding_int4(jnp.asarray(emb_w))

    return {
        "word_embedding": emb,
        "layers": layers,
        "final_ln": {"weight": jnp.asarray(sd["final_ln.weight"])},
        "lm_head": linear(sd["lm_head.weight"]),
    }


@pytest.fixture(scope="module")
def ref_and_params():
    cfg_ref, model = make_ref_model()
    cfg = ChatGLM2Config(**TINY)
    return cfg, model, torch_to_params(model)


def test_dense_forward_parity(ref_and_params):
    cfg, ref, params = ref_and_params
    ids = np.array([[3, 17, 42, 99, 5, 7]], dtype=np.int64)
    with torch.no_grad():
        _, ref_logits, _ = ref(input_ids=torch.tensor(ids))
    _, logits = M.forward(params, cfg, jnp.asarray(ids), quant_type="none", rt=RT)
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), rtol=2e-4, atol=2e-5
    )


def test_masked_padded_forward_parity(ref_and_params):
    cfg, ref, params = ref_and_params
    # left-padded batch, reference tokenizer style
    ids = np.array([[0, 0, 11, 12, 13], [21, 22, 23, 24, 25]], dtype=np.int64)
    mask = np.array([[0, 0, 1, 1, 1], [1, 1, 1, 1, 1]], dtype=np.int64)
    with torch.no_grad():
        _, ref_logits, _ = ref(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        )
    _, logits = M.forward(
        params, cfg, jnp.asarray(ids), attention_mask=jnp.asarray(mask),
        quant_type="none", rt=RT,
    )
    # padded-position logits are unspecified; compare valid positions
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(logits)[valid], ref_logits.numpy()[valid], rtol=2e-4, atol=2e-5
    )


def test_loss_parity(ref_and_params):
    cfg, ref, params = ref_and_params
    ids = np.array([[3, 17, 42, 99, 5, 7, 9, 2]], dtype=np.int64)
    labels = np.array([[-100, -100, 42, 99, 5, 7, 9, 2]], dtype=np.int64)
    with torch.no_grad():
        ref_loss, _, _ = ref(
            input_ids=torch.tensor(ids), labels=torch.tensor(labels)
        )
    loss, _ = M.forward(
        params, cfg, jnp.asarray(ids), labels=jnp.asarray(labels),
        quant_type="none", rt=RT,
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)


@pytest.mark.parametrize("quant_type", ["int8", "int4g32"])
def test_quantized_forward_parity(ref_and_params, quant_type):
    """Quantize the same float weights with the reference quantizers (torch)
    and ours (jnp); grids must match exactly and model outputs closely."""
    cfg, ref, _ = ref_and_params
    params = torch_to_params(ref, quant_type)

    if quant_type == "int8":
        from chatglm_q.int8.quantizer import get_quant_int8_linear, get_quant_embedding
        get_linear, get_emb = get_quant_int8_linear, get_quant_embedding
    else:
        from chatglm_q.int4.quantizer import get_quant_int4_linear, get_quant_embedding
        get_linear, get_emb = get_quant_int4_linear, get_quant_embedding

    import copy

    qref = copy.deepcopy(ref)
    with torch.no_grad():
        qref.word_embedding = get_emb(qref.word_embedding)
        for layer in qref.layers:
            layer.attn.qkv_proj = get_linear(layer.attn.qkv_proj)
            layer.attn.o_proj = get_linear(layer.attn.o_proj)
            layer.ffn.w_in = get_linear(layer.ffn.w_in)
            layer.ffn.w_out = get_linear(layer.ffn.w_out)
        qref.lm_head = get_linear(qref.lm_head)
        if quant_type == "int4g32":
            # we store int4 group scales in bf16 (ops/quant.py SCALE_DTYPE;
            # Mosaic v5e cannot load f16 vectors) — round the torch
            # oracle's scales the same way so the comparison tests the
            # production numerics at full strictness
            for m in qref.modules():
                # linears only: embedding scales stay f32 on our side too
                # (the lookup is a gather, not a Mosaic kernel)
                if (hasattr(m, "weight_scale") and m.weight_scale.ndim == 2
                        and type(m).__name__ != "QEmbedding"):
                    m.weight_scale.data = m.weight_scale.data.to(
                        torch.bfloat16).float()

    # grid equality on one layer's o_proj
    if quant_type == "int8":
        ref_w = qref.layers[0].attn.o_proj.weight.numpy()      # (N, K) int8
        ours = np.asarray(params["layers"]["o_proj"]["weight"][0])  # (K, N)
        np.testing.assert_array_equal(ours, ref_w.T)
        ref_s = qref.layers[0].attn.o_proj.weight_scale.numpy()
        np.testing.assert_allclose(
            np.asarray(params["layers"]["o_proj"]["weight_scale"][0]), ref_s, rtol=1e-6
        )
    else:
        ref_packed = qref.layers[0].attn.o_proj.weight.numpy()  # (K/2, N) ref order
        ours_packed = np.asarray(params["layers"]["o_proj"]["weight"][0])
        np.testing.assert_array_equal(Q.repack_ref_to_tpu(ref_packed), ours_packed)

    ids = np.array([[3, 17, 42, 99, 5, 7]], dtype=np.int64)
    with torch.no_grad():
        _, ref_logits, _ = qref(input_ids=torch.tensor(ids))
    _, logits = M.forward(params, cfg, jnp.asarray(ids), quant_type=quant_type, rt=RT)
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), rtol=2e-4, atol=2e-4
    )


def test_prefill_decode_matches_full_forward(ref_and_params):
    """Serving path (preallocated cache) must reproduce the parity path."""
    cfg, _, params = ref_and_params
    ids = np.array([[3, 17, 42, 99, 5, 7, 9, 2]], dtype=np.int64)
    _, full_logits = M.forward(params, cfg, jnp.asarray(ids), quant_type="none",
                               rt=RT, dtype=jnp.float32)

    prefix_len = 5
    cache = M.init_kv_cache(cfg, 1, max_length=16, dtype=jnp.float32)
    logits_p, cache = M.prefill(
        params, cfg, jnp.asarray(ids[:, :prefix_len]),
        jnp.array([prefix_len], jnp.int32), cache,
        quant_type="none", dtype=jnp.float32, rt=RT,
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, prefix_len - 1]),
        rtol=2e-4, atol=2e-5,
    )
    for t in range(prefix_len, ids.shape[1]):
        logits_d, cache = M.decode_step(
            params, cfg, jnp.asarray(ids[:, t]), cache,
            quant_type="none", dtype=jnp.float32, rt=RT,
        )
        np.testing.assert_allclose(
            np.asarray(logits_d), np.asarray(full_logits[:, t]),
            rtol=2e-4, atol=2e-5,
        )


def test_prefill_decode_batch_ragged(ref_and_params):
    """Right-padded ragged batch through serving path vs per-row parity."""
    cfg, _, params = ref_and_params
    rows = [[3, 17, 42], [21, 22, 23, 24, 25]]
    maxlen = 5
    padded = np.zeros((2, maxlen), np.int64)
    for i, r in enumerate(rows):
        padded[i, : len(r)] = r
    lengths = jnp.array([3, 5], jnp.int32)

    cache = M.init_kv_cache(cfg, 2, max_length=8, dtype=jnp.float32)
    logits_p, cache = M.prefill(
        params, cfg, jnp.asarray(padded), lengths, cache,
        quant_type="none", dtype=jnp.float32, rt=RT,
    )
    for i, r in enumerate(rows):
        _, full = M.forward(params, cfg, jnp.asarray([r]), quant_type="none", rt=RT)
        np.testing.assert_allclose(
            np.asarray(logits_p[i]), np.asarray(full[0, len(r) - 1]),
            rtol=2e-4, atol=2e-5,
        )


def test_incremental_forward_past_kv(ref_and_params):
    """The reference's stateless incremental API (model.py:329-392): forward
    a prefix, then new tokens with past_key_values — parity against both the
    torch reference's incremental outputs and our own full forward."""
    cfg, model, params = ref_and_params
    ids = np.array([[3, 17, 42, 7, 99, 12]], np.int64)
    split = 4

    # torch reference incremental pass
    with torch.no_grad():
        _, ref_pre, ref_kv = model(torch.tensor(ids[:, :split]))
        _, ref_new, _ = model(
            torch.tensor(ids[:, split:]), past_key_values=ref_kv
        )

    _, pre_logits, kv = M.forward(
        params, cfg, jnp.asarray(ids[:, :split]), quant_type="none", rt=RT,
        return_kv=True,
    )
    np.testing.assert_allclose(
        np.asarray(pre_logits), ref_pre.numpy(), rtol=2e-4, atol=2e-5
    )
    assert len(kv) == cfg.num_layers
    assert kv[0][0].shape == (1, split, cfg.num_multi_query_groups, 1,
                              cfg.head_hidden_size)

    out = M.forward(
        params, cfg, jnp.asarray(ids[:, split:]), quant_type="none", rt=RT,
        past_key_values=kv,
    )
    assert len(out) == 3  # reference 3-tuple shape with past input
    _, new_logits, kv2 = out
    np.testing.assert_allclose(
        np.asarray(new_logits), ref_new.numpy(), rtol=2e-4, atol=2e-5
    )
    assert kv2[0][0].shape[1] == ids.shape[1]

    # and against our own full-sequence forward
    _, full_logits = M.forward(params, cfg, jnp.asarray(ids), quant_type="none", rt=RT)
    np.testing.assert_allclose(
        np.asarray(new_logits), np.asarray(full_logits[:, split:]),
        rtol=2e-4, atol=2e-5,
    )


def test_dropout_train_mode(ref_and_params):
    """config.dropout_rate applies only when a dropout_rng is given
    (reference nn.Dropout train vs eval, model.py:171,:201,:369)."""
    cfg, _, params = ref_and_params
    dcfg = dataclasses.replace(cfg, dropout_rate=0.5)
    ids = jnp.asarray([[3, 17, 42, 7]])

    _, eval_logits = M.forward(params, dcfg, ids, quant_type="none", rt=RT)
    _, base_logits = M.forward(params, cfg, ids, quant_type="none", rt=RT)
    np.testing.assert_array_equal(np.asarray(eval_logits), np.asarray(base_logits))

    _, d1 = M.forward(params, dcfg, ids, quant_type="none", rt=RT,
                      dropout_rng=jax.random.PRNGKey(0))
    _, d2 = M.forward(params, dcfg, ids, quant_type="none", rt=RT,
                      dropout_rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(d1), np.asarray(base_logits))
    assert not np.allclose(np.asarray(d1), np.asarray(d2))

    # rate 0 with an rng stays exact
    _, d0 = M.forward(params, cfg, ids, quant_type="none", rt=RT,
                      dropout_rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(base_logits))


# --- mid-size end-to-end quantization-degradation budget (VERDICT r2 #2) ---

MID = dict(
    hidden_size=512,
    inner_hidden_size=1024,
    head_hidden_size=64,
    num_multi_query_groups=2,
    num_attention_heads=8,
    num_layers=6,
    vocab_size=2048,
    max_sequence_length=128,
)


def _quantize_ref(model, quant_type):
    """Quantize a reference torch model in place with ITS OWN quantizers
    (reference int4/quantizer.py, int8/quantizer.py)."""
    import copy

    if quant_type == "int8":
        from chatglm_q.int8.quantizer import (get_quant_embedding,
                                              get_quant_int8_linear as get_linear)
    else:
        from chatglm_q.int4.quantizer import (get_quant_embedding,
                                              get_quant_int4_linear as get_linear)
    qref = copy.deepcopy(model)
    with torch.no_grad():
        qref.word_embedding = get_quant_embedding(qref.word_embedding)
        for layer in qref.layers:
            layer.attn.qkv_proj = get_linear(layer.attn.qkv_proj)
            layer.attn.o_proj = get_linear(layer.attn.o_proj)
            layer.ffn.w_in = get_linear(layer.ffn.w_in)
            layer.ffn.w_out = get_linear(layer.ffn.w_out)
        qref.lm_head = get_linear(qref.lm_head)
        if quant_type == "int4g32":
            # our production int4 scales are stored bf16 (ops/quant.py
            # SCALE_DTYPE); round the oracle identically
            for m in qref.modules():
                # linears only: embedding scales stay f32 on our side too
                # (the lookup is a gather, not a Mosaic kernel)
                if (hasattr(m, "weight_scale") and m.weight_scale.ndim == 2
                        and type(m).__name__ != "QEmbedding"):
                    m.weight_scale.data = m.weight_scale.data.to(
                        torch.bfloat16).float()
    return qref


@pytest.mark.parametrize("quant_type", ["int8", "int4g32"])
def test_midsize_ppl_degradation_budget(quant_type):
    """The metric the reference publishes as its regression test is the ppl
    DELTA of each quant level vs fp16 (evaluations/ppl_results.txt).  Real
    6B weights are not downloadable here, so pin the next-strongest chain
    on a mid-size random model where error actually accumulates (6 layers,
    512 hidden, 2048 vocab): our quantized CE loss must (a) track the
    reference torch implementation's quantized loss to float tolerance and
    (b) produce the SAME fp→quant degradation as the reference to within
    0.1% of a nat — i.e. identical quantization quality, end to end."""
    torch.manual_seed(3)
    cfg_ref = ref_model_mod.ChatGLM2Config(**MID)
    model = ref_model_mod.ChatGLM2Model(cfg_ref, dtype=torch.float32)
    with torch.no_grad():
        for name, p in model.state_dict().items():
            if p.is_floating_point():
                p.normal_(1.0, 0.02) if "ln.weight" in name else p.normal_(0.0, 0.05)
    cfg = ChatGLM2Config(**MID)

    rng = np.random.RandomState(11)
    ids = rng.randint(0, MID["vocab_size"], size=(2, 48)).astype(np.int64)
    labels = ids.copy()
    labels[:, :4] = -100  # exercise the ignore-index path

    losses = {}
    for qt, m in (("none", model), (quant_type, _quantize_ref(model, quant_type))):
        with torch.no_grad():
            ref_loss, ref_logits, _ = m(input_ids=torch.tensor(ids),
                                        labels=torch.tensor(labels))
        params = torch_to_params(model, qt)
        loss, logits = M.forward(params, cfg, jnp.asarray(ids),
                                 labels=jnp.asarray(labels),
                                 quant_type=qt, rt=RT)
        # (a) absolute loss parity vs the torch oracle at the same quant
        np.testing.assert_allclose(float(loss), float(ref_loss),
                                   rtol=3e-4, atol=3e-4)
        # logits track too (not just the scalar reduction)
        np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                                   rtol=5e-3, atol=5e-3)
        losses[qt] = (float(loss), float(ref_loss))

    ours_delta = losses[quant_type][0] - losses["none"][0]
    ref_delta = losses[quant_type][1] - losses["none"][1]
    # (b) identical degradation: quantization hurts us exactly as much
    assert abs(ours_delta - ref_delta) < 1e-3, (ours_delta, ref_delta)
