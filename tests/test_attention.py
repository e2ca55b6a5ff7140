"""Flash/ragged attention kernels vs the XLA masked-softmax oracle, both
standalone and wired into the serving paths (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.ops.pallas_attention import (
    flash_attention_prefill,
    flash_attention_decode,
)

CFG = ChatGLM2Config(
    hidden_size=64, inner_hidden_size=64, head_hidden_size=16,
    num_multi_query_groups=2, num_attention_heads=4, num_layers=2,
    vocab_size=128, max_sequence_length=64,
)
RT_XLA = TpuRuntimeConfig(use_pallas=False, use_flash_attention=False)
RT_FLASH = TpuRuntimeConfig(use_pallas=False, use_flash_attention=True)


def test_prefill_kernel_vs_oracle():
    B, S, G, Hg, D = 2, 32, 2, 4, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, G, Hg, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, G, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, G, D))
    lengths = jnp.asarray([20, 32], jnp.int32)
    sm = 1.0 / np.sqrt(D)

    s = jnp.einsum("bsghd,btgd->bghst", q, k) * sm
    tq = jnp.arange(S)[:, None]
    tk = jnp.arange(S)[None, :]
    m = (tk <= tq)[None] & (tk[None] < lengths[:, None, None])
    ref = jnp.einsum(
        "bghst,btgd->bsghd",
        jax.nn.softmax(jnp.where(m[:, None, None], s, -1e30), axis=-1), v,
    )
    out = flash_attention_prefill(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                                  lengths, sm, 8, 16, interpret=True)
    valid = np.asarray(jnp.arange(S)[None, :] < lengths[:, None])
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], rtol=1e-5, atol=1e-5
    )


def test_decode_kernel_vs_oracle_ragged():
    B, T, G, Hg, D = 3, 64, 2, 4, 16
    q = jax.random.normal(jax.random.PRNGKey(3), (B, G, Hg, D))
    k = jax.random.normal(jax.random.PRNGKey(4), (B, T, G, D))
    v = jax.random.normal(jax.random.PRNGKey(5), (B, T, G, D))
    lengths = jnp.asarray([0, 17, 63], jnp.int32)
    sm = 1.0 / np.sqrt(D)

    s = jnp.einsum("bghd,btgd->bght", q, k) * sm
    m = jnp.arange(T)[None, :] <= lengths[:, None]
    ref = jnp.einsum(
        "bght,btgd->bghd",
        jax.nn.softmax(jnp.where(m[:, None, None], s, -1e30), axis=-1), v,
    )
    out = flash_attention_decode(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                                 lengths, sm, 16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_decode_block_k_capacity_scaling():
    """Long caches get capacity-scaled KV blocks (grid-step-overhead
    bound there: bk=T//4 measured +19/+30% agg at 8K b8/b16 —
    docs/RESULTS.md round 5); short caches keep the configured block."""
    rt = TpuRuntimeConfig()
    assert rt.decode_block_k(1024) == 512
    assert rt.decode_block_k(2048) == 512
    assert rt.decode_block_k(4096) == 1024
    assert rt.decode_block_k(8192) == 2048
    # explicit override still wins when larger
    rt2 = TpuRuntimeConfig(attn_block_k=4096)
    assert rt2.decode_block_k(8192) == 4096

    # the kernel is exact at a capacity-scaled block: T=4096, bk=1024
    B, T, G, Hg, D = 2, 4096, 1, 4, 16
    q = jax.random.normal(jax.random.PRNGKey(3), (B, G, Hg, D))
    k = jax.random.normal(jax.random.PRNGKey(4), (B, G, T, D))
    v = jax.random.normal(jax.random.PRNGKey(5), (B, G, T, D))
    lengths = jnp.asarray([93, 3800], jnp.int32)
    sm = 1.0 / np.sqrt(D)
    s = jnp.einsum("bghd,bgtd->bght", q, k) * sm
    m = jnp.arange(T)[None, :] <= lengths[:, None]
    ref = jnp.einsum(
        "bght,bgtd->bghd",
        jax.nn.softmax(jnp.where(m[:, None, None], s, -1e30), axis=-1), v,
    )
    out = flash_attention_decode(q, k, v, lengths, sm,
                                 TpuRuntimeConfig().decode_block_k(T),
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_serving_path_flash_matches_xla():
    """prefill + decode steps must produce identical logits via both
    attention implementations."""
    params = M.init_params(jax.random.PRNGKey(0), CFG, "none", jnp.float32)
    ids = jnp.asarray([[3, 17, 42, 99, 5], [7, 9, 11, 0, 0]])
    lengths = jnp.asarray([5, 3], jnp.int32)

    def run(rt):
        cache = M.init_kv_cache(CFG, 2, 16, jnp.float32)
        logits, cache = M.prefill(params, CFG, ids, lengths, cache,
                                  "none", jnp.float32, rt)
        out = [logits]
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        for _ in range(3):
            logits, cache = M.decode_step(params, CFG, tok, cache,
                                          "none", jnp.float32, rt)
            out.append(logits)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
        return out

    xla = run(RT_XLA)
    flash = run(RT_FLASH)
    for a, b in zip(xla, flash):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_flash_prefill_long_context_no_quadratic_mask():
    """8K-context prefill through the flash path must not materialize a
    (B, S, S) mask (the reference's OOM hazard, model.py:311-317); smoke
    test at S=512 on CPU."""
    cfg = ChatGLM2Config(
        hidden_size=64, inner_hidden_size=64, head_hidden_size=16,
        num_multi_query_groups=2, num_attention_heads=4, num_layers=1,
        vocab_size=128, max_sequence_length=1024,
    )
    params = M.init_params(jax.random.PRNGKey(1), cfg, "none", jnp.float32)
    S = 512
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, S), 0, 128)
    cache = M.init_kv_cache(cfg, 1, S, jnp.float32)
    logits, cache = M.prefill(params, cfg, ids, jnp.asarray([S], jnp.int32),
                              cache, "none", jnp.float32, RT_FLASH)
    assert bool(jnp.isfinite(logits).all())


def test_fp8_kv_cache_close_to_bf16():
    """float8 KV cache storage: serving outputs stay close to full-precision
    (greedy tokens may differ on near-ties; logits must stay close)."""
    params = M.init_params(jax.random.PRNGKey(0), CFG, "none", jnp.float32)
    ids = jnp.asarray([[3, 17, 42, 99, 5]])
    lengths = jnp.asarray([5], jnp.int32)

    def run(kv_dtype):
        cache = M.init_kv_cache(CFG, 1, 16, kv_dtype)
        logits, cache = M.prefill(params, CFG, ids, lengths, cache,
                                  "none", jnp.float32, RT_XLA)
        out = [logits]
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        for _ in range(2):
            logits, cache = M.decode_step(params, CFG, tok, cache,
                                          "none", jnp.float32, RT_XLA)
            out.append(logits)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
        return out

    ref = run(jnp.float32)
    fp8 = run(jnp.float8_e4m3fn)
    for a, b in zip(ref, fp8):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-6))
        assert rel < 0.15, rel


def test_idx_decode_and_write_kernels_vs_oracle():
    """Layer-indexed stacked-cache kernels (round 5): decode_idx must match
    flash_attention_decode on the selected layer slab; the in-place write
    must equal the .at[].set() oracle and leave every other byte alone."""
    import numpy as np
    from chatglm_q_tpu.ops import pallas_attention as PA

    key = jax.random.PRNGKey(0)
    L, B, G, T, D, Hg = 3, 5, 2, 64, 128, 16
    k = jax.random.normal(key, (L, B, G, T, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 1), (L, B, G, T, D),
                          jnp.float32)
    q = jax.random.normal(jax.random.fold_in(key, 2), (B, G, Hg, D),
                          jnp.float32)
    lengths = jnp.asarray([3, 17, 31, 50, 63], jnp.int32)
    sm = 1.0 / np.sqrt(D)
    for lay in (0, 2):
        ref = PA.flash_attention_decode(q, k[lay], v[lay], lengths, sm,
                                        block_k=16)
        got = PA.flash_attention_decode_idx(q, k, v, jnp.int32(lay), lengths,
                                            sm, block_k=16)
        assert float(jnp.max(jnp.abs(got - ref))) < 1e-5

    new = jax.random.normal(jax.random.fold_in(key, 3), (B, G, D), jnp.float32)
    starts = jnp.asarray([4, 18, 32, 51, 0], jnp.int32)
    want = k
    for b in range(B):
        want = want.at[1, b, :, starts[b], :].set(new[b])
    got = PA.kv_cache_write_idx(k.copy(), new, jnp.int32(1), starts)
    assert float(jnp.max(jnp.abs(got - want))) == 0.0


def test_pool_write_idx_vs_oracle():
    """Paged-pool in-place writer: equals the dynamic_update_slice oracle
    through the page table, including the capacity clamp."""
    import numpy as np
    from chatglm_q_tpu.ops import pallas_attention as PA

    key = jax.random.PRNGKey(9)
    L, NP, G, P, D, B, MP = 3, 7, 2, 16, 128, 4, 4
    pool = jax.random.normal(key, (L, NP, G, P, D), jnp.float32)
    new = jax.random.normal(jax.random.fold_in(key, 1), (B, G, D), jnp.float32)
    pt = jnp.asarray([[1, 4, 2, 6], [3, 0, 5, 2], [6, 1, 0, 4], [2, 5, 3, 1]],
                     jnp.int32)
    # includes a past-capacity start (70 > 63) that must clamp to slot 63
    starts = jnp.asarray([0, 17, 63, 70], jnp.int32)
    want = pool
    cap = MP * P
    for b in range(B):
        pos = min(int(starts[b]), cap - 1)
        phys = int(pt[b, pos // P])
        want = want.at[1, phys, :, pos % P, :].set(new[b])
    got = PA.kv_pool_write_idx(pool.copy(), new, jnp.int32(1), pt, starts)
    assert got is not None
    assert float(jnp.max(jnp.abs(got - want))) == 0.0


def test_serving_decode_idx_path_matches_xla(monkeypatch):
    """The dense serving decode now routes through kv_cache_write_idx +
    flash_attention_decode_idx (models/chatglm2.py); greedy tokens must
    match the XLA fallback exactly — and the fast path must actually
    engage (no silent fallback)."""
    import numpy as np
    from chatglm_q_tpu.ops import pallas_attention as PA

    calls = {"write": 0, "attend": 0}
    real_write, real_attend = PA.kv_cache_write_idx, PA.flash_attention_decode_idx

    def count_write(*a, **k):
        calls["write"] += 1
        return real_write(*a, **k)

    def count_attend(*a, **k):
        calls["attend"] += 1
        return real_attend(*a, **k)

    monkeypatch.setattr(PA, "kv_cache_write_idx", count_write)
    monkeypatch.setattr(PA, "flash_attention_decode_idx", count_attend)

    params = M.init_params(jax.random.PRNGKey(3), CFG, "none", jnp.float32)
    ids = jnp.asarray([[3, 17, 42, 99, 5], [7, 1, 2, 3, 4]])
    lengths = jnp.asarray([5, 5], jnp.int32)

    def gen(rt):
        cache = M.init_kv_cache(CFG, 2, 16, jnp.float32)
        logits, cache = M.prefill(params, CFG, ids, lengths, cache, "none",
                                  jnp.float32, rt)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        toks, _ = M.multi_step_decode(params, CFG, tok, cache, 8, None,
                                      "none", jnp.float32, rt)
        return np.asarray(toks)

    flash = gen(RT_FLASH)
    assert calls["write"] > 0 and calls["attend"] > 0, calls
    np.testing.assert_array_equal(flash, gen(RT_XLA))

    # the A/B lever: no_idx_cache must route AROUND the idx kernels and
    # still produce the same tokens (slab-copy flash path)
    calls["write"] = calls["attend"] = 0
    rt_noidx = TpuRuntimeConfig(use_pallas=False, use_flash_attention=True,
                                no_idx_cache=True)
    noidx = gen(rt_noidx)
    assert calls["write"] == 0 and calls["attend"] == 0, calls
    np.testing.assert_array_equal(flash, noidx)


def test_decode_v2_kernel_vs_oracle_ragged():
    """O(length)-read decode kernel (manual double-buffered DMA) vs oracle."""
    from chatglm_q_tpu.ops.pallas_attention import flash_attention_decode_v2

    B, T, G, Hg, D = 3, 64, 2, 4, 16
    q = jax.random.normal(jax.random.PRNGKey(13), (B, G, Hg, D))
    k = jax.random.normal(jax.random.PRNGKey(14), (B, T, G, D))
    v = jax.random.normal(jax.random.PRNGKey(15), (B, T, G, D))
    lengths = jnp.asarray([0, 17, 63], jnp.int32)
    sm = 1.0 / np.sqrt(D)
    s = jnp.einsum("bghd,btgd->bght", q, k) * sm
    m = jnp.arange(T)[None, :] <= lengths[:, None]
    ref = jnp.einsum(
        "bght,btgd->bghd",
        jax.nn.softmax(jnp.where(m[:, None, None], s, -1e30), axis=-1), v,
    )
    out = flash_attention_decode_v2(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                                    lengths, sm, 16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_serving_path_decode_v2_matches_xla():
    """decode_attn_v2 (O(length)-DMA kernel) through the full serving path."""
    rt_v2 = TpuRuntimeConfig(use_pallas=False, use_flash_attention=True,
                             decode_attn_v2=True)
    params = M.init_params(jax.random.PRNGKey(0), CFG, "none", jnp.float32)
    ids = jnp.asarray([[3, 17, 42, 99, 5], [7, 9, 11, 0, 0]])
    lengths = jnp.asarray([5, 3], jnp.int32)

    def run(rt):
        cache = M.init_kv_cache(CFG, 2, 16, jnp.float32)
        logits, cache = M.prefill(params, CFG, ids, lengths, cache,
                                  "none", jnp.float32, rt)
        out = [logits]
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        for _ in range(3):
            logits, cache = M.decode_step(params, CFG, tok, cache,
                                          "none", jnp.float32, rt)
            out.append(logits)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
        return out

    for a, b in zip(run(RT_XLA), run(rt_v2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
