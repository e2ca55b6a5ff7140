"""True long-context runs (SURVEY A4): 8K-token prefill + decode with the
sequence-parallel paths on the virtual mesh — the north-star config that
round 1 never exercised beyond 512 tokens.  Small model dims keep CPU
runtime bounded; the LENGTH is the real thing (8192 = the reference's
max_sequence_length, config.json)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.parallel import sharding as S

CFG = ChatGLM2Config(
    hidden_size=64, inner_hidden_size=64, head_hidden_size=16,
    num_multi_query_groups=2, num_attention_heads=4, num_layers=1,
    vocab_size=128, max_sequence_length=8192,
)
T = 8192

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_8k_ring_prefill_matches_flash():
    """Ring-attention prefill (q/k/v sequence-sharded over the model axis,
    KV rotating on the ring) at the full 8192 context must match the
    single-device flash kernel."""
    from chatglm_q_tpu.ops.pallas_attention import flash_attention_prefill
    from chatglm_q_tpu.parallel.ring_attention import ring_attention

    rng = np.random.RandomState(0)
    B, G, Hg, D = 1, 2, 2, 16
    q = jnp.asarray(rng.randn(B, T, G, Hg, D) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(B, T, G, D) * 0.3, jnp.float32)  # (B, S, G, D)
    v = jnp.asarray(rng.randn(B, T, G, D), jnp.float32)
    lengths = jnp.asarray([T - 5], jnp.int32)  # ragged tail exercised at 8K
    sm = 1.0 / np.sqrt(D)

    want = flash_attention_prefill(
        q, jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), lengths, sm,
        512, 512, interpret=True)
    mesh = S.make_mesh(2, 4)
    with mesh:
        got = ring_attention(q, k, v, lengths, mesh, "model", sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_8k_decode_tsharded_exact():
    """Decode against a FULL 8K cache with the T dim sharded over the model
    axis (per-chip KV bytes ÷ 4): log-sum-exp merge stays exact at this
    length, where partial-softmax drift would be visible."""
    from chatglm_q_tpu.ops.pallas_attention import (
        flash_attention_decode, flash_attention_decode_kv_tsharded)

    rng = np.random.RandomState(1)
    B, G, Hg, D = 2, 2, 2, 16
    q = jnp.asarray(rng.randn(B, G, Hg, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, G, T, D) * 0.3, jnp.float32)
    v = jnp.asarray(rng.randn(B, G, T, D), jnp.float32)
    lengths = jnp.asarray([T, 1500], jnp.int32)  # one row far from shard end
    sm = 1.0 / np.sqrt(D)

    want = flash_attention_decode(q, k, v, lengths, sm, 512, interpret=True)
    mesh = S.make_mesh(2, 4)
    with mesh:
        got = flash_attention_decode_kv_tsharded(
            q, k, v, lengths, sm, mesh, 512, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_8k_model_prefill_and_decode():
    """Whole-model run at 8192 context: flash prefill fills 7.5K of the
    cache without any quadratic mask; decode logits at positions past it
    match between the dense kernel and the O(length) decode-v2 path."""
    params = M.init_params(jax.random.PRNGKey(2), CFG, "none", jnp.float32)
    # 512-aligned prompt: the flash kernel halves its q block until it
    # divides S, so an unaligned S (engine prompts are bucketed and never
    # hit this) would degrade to 8-row blocks — thousands of
    # python-dispatched interpret programs on CPU
    S_len = T - 512
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, S_len), 0,
                             CFG.vocab_size)
    lengths = jnp.asarray([S_len], jnp.int32)
    outs = {}
    # huge blocks: interpret-mode grid steps are python-dispatched, so fewer,
    # bigger blocks keep the 8K CPU run fast (hardware uses ≤512 sublanes)
    blk = dict(attn_block_q=2048, attn_block_k=2048)
    for name, rt in (
        ("grid", TpuRuntimeConfig(use_pallas=True, use_flash_attention=True,
                                  **blk)),
        ("v2", TpuRuntimeConfig(use_pallas=True, use_flash_attention=True,
                                decode_attn_v2=True, **blk)),
    ):
        cache = M.init_kv_cache(CFG, 1, T, jnp.float32)
        # CPU-interpret quirk at 8K: prefill must run EAGERLY (jit-compiling
        # the interpret lowering of the 16x16-block flash grid blows up),
        # decode must run JITTED (eager per-op dispatch of the scan is the
        # slow path); on hardware both compile fine
        st = jax.jit(lambda p, i, c: M.decode_step(p, CFG, i, c, "none",
                                                   jnp.float32, rt))
        logits, cache = M.prefill(params, CFG, ids, lengths, cache, "none",
                                  jnp.float32, rt)
        seq = [np.asarray(logits)]
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        for _ in range(3):
            logits, cache = st(params, tok, cache)
            seq.append(np.asarray(logits))
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
        outs[name] = seq
    for a, b in zip(outs["grid"], outs["v2"]):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
