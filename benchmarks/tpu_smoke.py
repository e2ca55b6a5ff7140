"""On-device kernel validation: every Pallas kernel vs its jnp oracle,
compiled on the real TPU (the CPU interpret-mode equivalents run in CI via
tests/; this is the hardware counterpart — run manually or by the driver).

One kernel per section, sequential, single process (this environment
serializes TPU clients).  Prints one PASS/FAIL line per kernel and exits
non-zero on any failure.
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

from chatglm_q_tpu.ops import quant as Q
from chatglm_q_tpu.ops import pallas_matmul as PM
from chatglm_q_tpu.ops import pallas_attention as PA

T0 = time.time()
FAILED = []


def check(name, got, want, rtol=2e-2, atol=2e-2):
    ok = np.allclose(np.asarray(got, np.float32), np.asarray(want, np.float32),
                     rtol=rtol, atol=atol)
    err = float(np.max(np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))))
    print(f"[{time.time()-T0:6.1f}s] {'PASS' if ok else 'FAIL'} {name} (max err {err:.2e})",
          flush=True)
    if not ok:
        FAILED.append(name)


def main():
    key = jax.random.PRNGKey(0)
    M_, K, N = 8, 4096, 4096
    x = jax.random.normal(key, (M_, K), jnp.bfloat16)

    # int8 fwd
    w8 = jax.random.randint(jax.random.PRNGKey(1), (K, N), -127, 128, jnp.int8)
    s8 = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (N,))) * 0.01
    got = PM.int8_matmul_pallas(x, w8, s8)
    want = (x.astype(jnp.float32) @ (w8.astype(jnp.float32) * s8))
    check("int8_matmul", got, want, rtol=5e-2, atol=5e-1)

    # int4 fwd (aligned K)
    wf = jax.random.normal(jax.random.PRNGKey(3), (K, N)) * 0.1
    q4, s4 = Q.rtn_quantize_int4(wf)
    p4 = Q.pack_int4_tpu(q4)
    got = PM.int4_matmul_pallas(x, p4, s4)
    want = x.astype(jnp.float32) @ Q.unpack_int4_tpu(p4, s4)
    check("int4_matmul", got, want, rtol=5e-2, atol=5e-1)

    # int4 fwd, padded awkward K (ChatGLM2 inner dim)
    Kx = 13696
    wfx = jax.random.normal(jax.random.PRNGKey(4), (Kx, 512)) * 0.1
    px = Q.quantize_linear_int4(wfx)
    xx = jax.random.normal(jax.random.PRNGKey(5), (8, Kx), jnp.bfloat16)
    from chatglm_q_tpu.ops.linear import int4_matmul
    got = int4_matmul((True, 128), xx, px["weight"], px["weight_scale"])
    q4x, s4x = Q.rtn_quantize_int4(wfx)
    want = xx.astype(jnp.float32) @ Q.unpack_int4_tpu(Q.pack_int4_tpu(q4x), s4x)
    check("int4_matmul_paddedK", got, want, rtol=5e-2, atol=5e-1)

    # transposed kernels
    g = jax.random.normal(jax.random.PRNGKey(6), (8, N), jnp.bfloat16)
    got = PM.int8_matmul_t_pallas(g, w8, s8)
    want = g.astype(jnp.float32) @ (w8.astype(jnp.float32) * s8).T
    check("int8_matmul_t", got, want, rtol=5e-2, atol=5e-1)
    got = PM.int4_matmul_t_pallas(g, p4, s4)
    want = g.astype(jnp.float32) @ Q.unpack_int4_tpu(p4, s4).T
    check("int4_matmul_t", got, want, rtol=5e-2, atol=5e-1)

    # flash decode attention
    B, T, G_, Hg, D = 2, 1024, 2, 16, 128
    qd = jax.random.normal(jax.random.PRNGKey(7), (B, G_, Hg, D), jnp.bfloat16)
    kc = jax.random.normal(jax.random.PRNGKey(8), (B, T, G_, D), jnp.bfloat16)
    vc = jax.random.normal(jax.random.PRNGKey(9), (B, T, G_, D), jnp.bfloat16)
    lengths = jnp.asarray([100, 1000], jnp.int32)
    sm = 1.0 / np.sqrt(D)
    got = PA.flash_attention_decode(qd, kc.transpose(0, 2, 1, 3), vc.transpose(0, 2, 1, 3), lengths, sm)
    s = jnp.einsum("bghd,btgd->bght", qd.astype(jnp.float32), kc.astype(jnp.float32)) * sm
    m = jnp.arange(T)[None, :] <= lengths[:, None]
    want = jnp.einsum("bght,btgd->bghd",
                      jax.nn.softmax(jnp.where(m[:, None, None], s, -1e30), -1),
                      vc.astype(jnp.float32))
    check("flash_decode", got, want, rtol=5e-2, atol=5e-2)

    # layer-indexed stacked-cache decode + in-place write (round 5)
    L_ = 3
    kst = jax.random.normal(jax.random.PRNGKey(21), (L_, B, G_, T, D), jnp.bfloat16)
    vst = jax.random.normal(jax.random.PRNGKey(22), (L_, B, G_, T, D), jnp.bfloat16)
    got = PA.flash_attention_decode_idx(qd, kst, vst, jnp.int32(1), lengths, sm)
    want = PA.flash_attention_decode(qd, kst[1], vst[1], lengths, sm)
    check("flash_decode_idx", got, want, rtol=5e-2, atol=5e-2)
    new = jax.random.normal(jax.random.PRNGKey(23), (B, G_, D), jnp.bfloat16)
    want_w = kst
    for b_ in range(B):
        want_w = want_w.at[1, b_, :, lengths[b_], :].set(new[b_])
    # .copy(): the kernel aliases (donates) its cache argument
    wrote = PA.kv_cache_write_idx(kst.copy(), new, jnp.int32(1), lengths)
    check("kv_cache_write_idx", wrote, want_w, rtol=0, atol=0)
    NPp, Pp, MPp = 10, 256, 4
    pool = jax.random.normal(jax.random.PRNGKey(24), (L_, NPp, G_, Pp, D),
                             jnp.bfloat16)
    pt = jnp.asarray([[1, 4, 2, 6], [3, 0, 5, 2]], jnp.int32)
    starts = jnp.asarray([100, 1000], jnp.int32)
    want_p = pool
    for b_ in range(B):
        pos = int(starts[b_])
        want_p = want_p.at[1, int(pt[b_, pos // Pp]), :, pos % Pp, :].set(
            new[b_])
    wrote_p = PA.kv_pool_write_idx(pool.copy(), new, jnp.int32(1), pt, starts)
    check("kv_pool_write_idx", wrote_p, want_p, rtol=0, atol=0)

    # flash prefill attention
    S = 512
    qp = jax.random.normal(jax.random.PRNGKey(10), (1, S, G_, Hg, D), jnp.bfloat16)
    kp = jax.random.normal(jax.random.PRNGKey(11), (1, S, G_, D), jnp.bfloat16)
    vp = jax.random.normal(jax.random.PRNGKey(12), (1, S, G_, D), jnp.bfloat16)
    lengths = jnp.asarray([S], jnp.int32)
    got = PA.flash_attention_prefill(qp, kp.transpose(0, 2, 1, 3), vp.transpose(0, 2, 1, 3), lengths, sm)
    s = jnp.einsum("bsghd,btgd->bghst", qp.astype(jnp.float32), kp.astype(jnp.float32)) * sm
    tq = jnp.arange(S)[:, None]
    tk = jnp.arange(S)[None, :]
    mm = (tk <= tq)
    want = jnp.einsum("bghst,btgd->bsghd",
                      jax.nn.softmax(jnp.where(mm[None, None, None], s, -1e30), -1),
                      vp.astype(jnp.float32))
    check("flash_prefill", got, want, rtol=5e-2, atol=5e-2)

    # pipelined decode kernel (auto-dispatch path)
    got = PM.int4_matmul_pallas_pipelined(x, p4, s4)
    want = x.astype(jnp.float32) @ Q.unpack_int4_tpu(p4, s4)
    check("int4_pipelined", got, want, rtol=5e-2, atol=5e-1)

    # dequant-scheme variants with bf16 (production-storage; Mosaic v5e
    # cannot load f16 vectors — ops/quant.py SCALE_DTYPE) scales — the
    # bench scheme probe / autotune sweep may select any of these, so they
    # must be hardware-validated, not only interpret-mode tested
    s4h = s4.astype(jnp.bfloat16)
    want_h = x.astype(jnp.float32) @ Q.unpack_int4_tpu(p4, s4h).astype(jnp.float32)
    for scheme in ("grouped", "selscale", "bt_grouped"):
        got = PM.int4_matmul_pallas(x, p4, s4h, scheme=scheme)
        check(f"int4_{scheme}", got, want_h, rtol=5e-2, atol=5e-1)
        got = PM.int4_matmul_pallas_pipelined(x, p4, s4h, scheme=scheme)
        if got is not None:
            check(f"int4_pipelined_{scheme}", got, want_h, rtol=5e-2, atol=5e-1)

    # layer-indexed stacked kernels (round 4): DMA layer idx's blocks
    # straight from the stacked array — must match the sliced kernel
    Ls = 2
    p4s = jnp.stack([p4, jnp.roll(p4, 7, axis=1)])
    s4s = jnp.stack([s4h, s4h * 1.5])
    for l in range(Ls):
        got = PM.int4_matmul_pallas_idx(x, p4s, s4s, jnp.int32(l),
                                        scheme="grouped")
        want = x.astype(jnp.float32) @ Q.unpack_int4_tpu(
            p4s[l], s4s[l]).astype(jnp.float32)
        check(f"int4_idx_l{l}", got, want, rtol=5e-2, atol=5e-1)
    w8s = jnp.stack([w8, jnp.roll(w8, 3, axis=1)])
    s8s = jnp.stack([s8, s8 * 0.5])
    got = PM.int8_matmul_pallas_idx(x, w8s, s8s, jnp.int32(1))
    want = x.astype(jnp.float32) @ (w8s[1].astype(jnp.float32) * s8s[1])
    check("int8_idx_l1", got, want, rtol=5e-2, atol=5e-1)

    # int8 bt scheme (nibble-split bf16 construction, no int→float convert)
    got = PM.int8_matmul_pallas(x, w8, s8, scheme="bt")
    want = (x.astype(jnp.float32) @ (w8.astype(jnp.float32) * s8))
    check("int8_bt", got, want, rtol=5e-2, atol=5e-1)

    # decode v2 (manual double-buffered DMA, O(length) reads)
    got = PA.flash_attention_decode_v2(
        qd, kc.transpose(0, 2, 1, 3), vc.transpose(0, 2, 1, 3),
        jnp.asarray([100, 1000], jnp.int32), sm)
    s = jnp.einsum("bghd,btgd->bght", qd.astype(jnp.float32), kc.astype(jnp.float32)) * sm
    m = jnp.arange(T)[None, :] <= jnp.asarray([100, 1000])[:, None]
    want = jnp.einsum("bght,btgd->bghd",
                      jax.nn.softmax(jnp.where(m[:, None, None], s, -1e30), -1),
                      vc.astype(jnp.float32))
    check("flash_decode_v2", got, want, rtol=5e-2, atol=5e-2)

    # paged decode (page-table indirection over the page pool)
    from chatglm_q_tpu.models import paged_kv as PK
    L_, NP_, P_ = 2, 12, 256
    MP_ = T // P_
    pool_k = jax.random.normal(jax.random.PRNGKey(13), (L_, NP_, G_, P_, D), jnp.bfloat16)
    pool_v = jax.random.normal(jax.random.PRNGKey(14), (L_, NP_, G_, P_, D), jnp.bfloat16)
    rngp = np.random.RandomState(0)
    pt = jnp.asarray(
        rngp.permutation(NP_ - 1)[: B * MP_].reshape(B, MP_) + 1, jnp.int32)
    lengths = jnp.asarray([100, 1000], jnp.int32)
    got = PA.flash_attention_decode_paged(
        qd, pool_k, pool_v, jnp.int32(1), pt, lengths, sm)
    dk = PK.gather_layer(pool_k, jnp.int32(1), pt)
    dv = PK.gather_layer(pool_v, jnp.int32(1), pt)
    want = PA.flash_attention_decode(qd, dk, dv, lengths, sm)
    check("flash_decode_paged", got, want, rtol=5e-2, atol=5e-2)

    # paged chunk attention (speculative-verify hot path: S queries per row
    # at absolute offsets, pages DMA'd — no gather)
    S_ = 8
    qc = jax.random.normal(jax.random.PRNGKey(15), (B, S_, G_, Hg, D), jnp.bfloat16)
    starts = jnp.asarray([100, 1000], jnp.int32)
    got = PA.flash_attention_chunk_paged(
        qc, pool_k, pool_v, jnp.int32(1), pt, starts, sm)
    # oracle: masked softmax over the gathered dense view
    sx = jnp.einsum("bsghd,bgtd->bghst", qc.astype(jnp.float32),
                    dk.astype(jnp.float32)) * sm
    tq = starts[:, None, None, None, None] + jnp.arange(S_)[None, None, None, :, None]
    tk2 = jnp.arange(dk.shape[2])[None, None, None, None, :]
    want = jnp.einsum("bghst,bgtd->bsghd",
                      jax.nn.softmax(jnp.where(tk2 <= tq, sx, -1e30), -1),
                      dv.astype(jnp.float32))
    check("flash_chunk_paged", got, want, rtol=5e-2, atol=5e-2)

    # dynamic-activation int8 (s8×s8 MXU)
    got = PM.int8_dyn_matmul_pallas(x, w8, s8)
    want = x.astype(jnp.float32) @ (w8.astype(jnp.float32) * s8)
    check("int8_dynamic", got, want, rtol=8e-2, atol=2.0)

    # dynamic-activation int4 (round 5: int4→s8 widen, s8×s8 group dots)
    got = PM.int4_dyn_matmul_pallas(x, p4, s4)
    want = x.astype(jnp.float32) @ Q.unpack_int4_tpu(p4, s4)
    check("int4_dynamic", got, want, rtol=8e-2, atol=2.0)
    # layer-indexed dyn twins (the serving-scan path)
    p4s = jnp.stack([p4, p4])
    s4s = jnp.stack([s4, s4])
    got = PM.int4_dyn_matmul_pallas_idx(x, p4s, s4s, jnp.int32(1))
    check("int4_dynamic_idx", got, want, rtol=8e-2, atol=2.0)
    got = PM.int8_dyn_matmul_pallas_idx(
        x, jnp.stack([w8, w8]), jnp.stack([s8, s8]), jnp.int32(0))
    want8 = x.astype(jnp.float32) @ (w8.astype(jnp.float32) * s8)
    check("int8_dynamic_idx", got, want8, rtol=8e-2, atol=2.0)

    print(f"[{time.time()-T0:6.1f}s] {'ALL PASS' if not FAILED else 'FAILURES: ' + ','.join(FAILED)}",
          flush=True)
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
