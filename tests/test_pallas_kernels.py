"""Pallas dequant-matmul kernels vs the jnp oracle (interpret mode on CPU).

Mirrors the reference test strategy (tests/test_triton_ops.py:9-47,
test_triton_ops_int4.py:11-55): kernel vs dense-dequant matmul at tight
tolerance, forward and transposed(grad) variants, plus the custom-vjp
wrapper's backward.  On a real TPU the same tests run compiled (see
tests/test_pallas_tpu.py runner).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatglm_q_tpu.ops import quant as Q
from chatglm_q_tpu.ops import pallas_matmul as PM

INTERPRET = jax.default_backend() != "tpu"


def rand(shape, seed=0, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32) * scale


def make_int8(k, n, seed=0):
    w = rand((k, n), seed)
    return Q.rtn_quantize_int8(w)


def make_int4(k, n, seed=0):
    w = rand((k, n), seed)
    q, s = Q.rtn_quantize_int4(w)
    return Q.pack_int4_tpu(q), s


@pytest.mark.parametrize("m,k,n", [(1, 256, 256), (8, 512, 384), (100, 256, 128)])
def test_int8_fwd(m, k, n):
    x = rand((m, k), 1)
    w, s = make_int8(k, n, 2)
    out = PM.int8_matmul_pallas(x, w, s, interpret=INTERPRET)
    ref = x @ (w.astype(jnp.float32) * s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("m,k,n", [(1, 256, 256), (8, 512, 384), (100, 256, 128)])
def test_int4_fwd(m, k, n):
    x = rand((m, k), 3)
    p, s = make_int4(k, n, 4)
    out = PM.int4_matmul_pallas(x, p, s, interpret=INTERPRET)
    ref = x @ Q.unpack_int4_tpu(p, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("m,k,n", [(4, 256, 512), (9, 384, 256)])
def test_int8_transposed(m, k, n):
    g = rand((m, n), 5)
    w, s = make_int8(k, n, 6)
    out = PM.int8_matmul_t_pallas(g, w, s, interpret=INTERPRET)
    ref = g @ (w.astype(jnp.float32) * s).T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("m,k,n", [(4, 256, 512), (9, 384, 256)])
def test_int4_transposed(m, k, n):
    g = rand((m, n), 7)
    p, s = make_int4(k, n, 8)
    out = PM.int4_matmul_t_pallas(g, p, s, interpret=INTERPRET)
    ref = g @ Q.unpack_int4_tpu(p, s).T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_custom_vjp_backward_int8():
    """Autograd-wrapper grad vs dense-matmul grad (test_triton_ops.py:31-47)."""
    from chatglm_q_tpu.ops.linear import int8_matmul

    x = rand((8, 256), 9)
    w, s = make_int8(256, 256, 10)
    flags = (True, 128)  # use pallas (interpret picks up CPU automatically)

    gx = jax.grad(lambda x: int8_matmul(flags, x, w, s).sum())(x)
    deq = w.astype(jnp.float32) * s
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(jnp.ones((8, 256)) @ deq.T), rtol=1e-4, atol=1e-4
    )


def test_custom_vjp_backward_int4():
    from chatglm_q_tpu.ops.linear import int4_matmul

    x = rand((8, 256), 11)
    p, s = make_int4(256, 256, 12)
    flags = (True, 128)

    gx = jax.grad(lambda x: int4_matmul(flags, x, p, s).sum())(x)
    deq = Q.unpack_int4_tpu(p, s)
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(jnp.ones((8, 256)) @ deq.T), rtol=1e-4, atol=1e-4
    )


def test_fallback_for_odd_shapes():
    """Shapes with no aligned block divisor fall back to the jnp path."""
    x = rand((3, 96), 13)
    w, s = make_int8(96, 50, 14)
    out = PM.int8_matmul_pallas(x, w, s, interpret=INTERPRET)
    ref = x @ (w.astype(jnp.float32) * s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_int4_pipelined_kernel_matches_oracle():
    """Decode-path double-buffered-DMA kernel vs the jnp oracle."""
    K, N = 4096, 1024
    x = rand((8, K), 30)
    p, s = make_int4(K, N, 31)
    out = PM.int4_matmul_pallas_pipelined(x, p, s, interpret=INTERPRET)
    assert out is not None
    ref = x @ Q.unpack_int4_tpu(p, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_int4_auto_dispatch():
    # small K → pipelined unsupported → grid/whole-K fallback still correct
    K, N = 256, 256
    x = rand((4, K), 32)
    p, s = make_int4(K, N, 33)
    out = PM.int4_matmul_auto(x, p, s, interpret=INTERPRET)
    ref = x @ Q.unpack_int4_tpu(p, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_dynamic_int8_matmul_close():
    """s8×s8 dynamic-activation kernel vs weight-only float reference
    (~1% activation-quant error expected, ONNX DynamicQuantizeLinear
    semantics int8/qlinear.py:54-70)."""
    from chatglm_q_tpu.ops.linear import int8_matmul

    x = rand((8, 512), 40)
    w, s = make_int8(512, 512, 41)
    out = PM.int8_dyn_matmul_pallas(x, w, s, interpret=INTERPRET)
    ref = x @ (w.astype(jnp.float32) * s)
    rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    assert rel < 0.02, rel
    # dispatch through the flag tuple
    out2 = int8_matmul((True, 128, True), x, w, s)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), rtol=1e-5, atol=1e-5)


def test_dynamic_int8_idx_matches_direct():
    """Layer-indexed dyn-int8 twin (serving scan, no weight slicing) must
    equal the direct dyn kernel on the selected layer, and the stacked
    dispatch must engage it under the dynamic flag."""
    from chatglm_q_tpu.ops.linear import StackedWeight, _int8_matmul_stacked

    K, N, L = 512, 256, 3
    x = rand((8, K), 45)
    ws, ss = zip(*(make_int8(K, N, 70 + i) for i in range(L)))
    wstack, sstack = jnp.stack(ws), jnp.stack(ss)
    for lay in (0, 2):
        got = PM.int8_dyn_matmul_pallas_idx(x, wstack, sstack,
                                            jnp.int32(lay),
                                            interpret=INTERPRET)
        assert got is not None
        want = PM.int8_dyn_matmul_pallas(x, ws[lay], ss[lay],
                                         interpret=INTERPRET)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
    out = _int8_matmul_stacked(
        (True, 128, True), x,
        StackedWeight(wstack, jnp.int32(1)), StackedWeight(sstack, jnp.int32(1)))
    want = PM.int8_dyn_matmul_pallas(x, ws[1], ss[1], interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _int4_dyn_oracle(x, p, s):
    """Exact jnp formulation of the dyn-int4 kernel's math: per-row s8
    activations, per-group int dots, scales on the partials."""
    xf = x.astype(jnp.float32)
    sx = jnp.clip(jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0,
                  min=1e-10)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127)
    wq = Q.unpack_int4_tpu(p, jnp.ones_like(s))  # unscaled int values
    M, K = xq.shape
    G = K // 32
    partial = jnp.einsum("mgk,gkn->mgn", xq.reshape(M, G, 32),
                         wq.reshape(G, 32, -1))
    return jnp.einsum("mgn,gn->mn", partial, s.astype(jnp.float32)) * sx


@pytest.mark.parametrize("m,k,n", [(1, 256, 256), (8, 512, 384), (32, 640, 128)])
def test_dynamic_int4_matmul(m, k, n):
    """Dyn-int4 kernel (s8×s8 MXU group dots, no float dequant) vs its
    exact oracle, incl. a masked-overhang K (640 → bk 512 + masked 128);
    and within ~1% of the weight-only float reference."""
    x = rand((m, k), 50)
    p, s = make_int4(k, n, 51)
    out = PM.int4_dyn_matmul_pallas(x, p, s, interpret=INTERPRET)
    assert out is not None
    ref = _int4_dyn_oracle(x, p, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    dense = x @ Q.unpack_int4_tpu(p, s)
    rel = float(jnp.abs(out - dense).max() / jnp.abs(dense).max())
    assert rel < 0.02, rel


def test_dynamic_int4_idx_matches_direct():
    """Layer-indexed dyn-int4 twin must equal the direct kernel on the
    selected layer, and the stacked-dispatch path must engage it when the
    dynamic flag is set."""
    from chatglm_q_tpu.ops.linear import StackedWeight, _int4_matmul_stacked

    K, N, L = 512, 256, 3
    x = rand((8, K), 52)
    ps, ss = zip(*(make_int4(K, N, 60 + i) for i in range(L)))
    pstack, sstack = jnp.stack(ps), jnp.stack(ss)
    for lay in (0, 2):
        got = PM.int4_dyn_matmul_pallas_idx(x, pstack, sstack,
                                            jnp.int32(lay),
                                            interpret=INTERPRET)
        assert got is not None
        want = PM.int4_dyn_matmul_pallas(x, ps[lay], ss[lay],
                                         interpret=INTERPRET)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
    # dispatch: flags = (use_pallas, m_threshold, dynamic)
    out = _int4_matmul_stacked(
        (True, 128, True), x,
        StackedWeight(pstack, jnp.int32(1)), StackedWeight(sstack, jnp.int32(1)))
    want = PM.int4_dyn_matmul_pallas(x, ps[1], ss[1], interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scheme", ["grouped", "bt_grouped", "selscale"])
@pytest.mark.parametrize("m,k,n", [(1, 256, 256), (8, 512, 384), (8, 576, 128)])
def test_int4_fwd_alt_schemes(m, k, n, scheme, monkeypatch):
    """The grouped-scale scheme (per-group partial dots) and the bittrick
    scheme (biased-nibble bf16 weights + rank-1 offset correction) must
    match the broadcast scheme / oracle, incl. the masked partial final K
    block (k=576 → bk 512 + masked 64).  bt_grouped computes on
    bf16-rounded activations (what the MXU sees anyway), so the oracle
    rounds x the same way."""
    monkeypatch.setattr(PM, "_INT4_SCHEME", scheme)
    x = rand((m, k), 5)
    p, s = make_int4(k, n, 6)
    out = PM.int4_matmul_pallas(x, p, s, interpret=INTERPRET)
    deq = Q.unpack_int4_tpu(p, s)
    # bt_grouped sees bf16-rounded activations; shapes that fall back to
    # the jnp path (no aligned bk) see f32 — accept whichever ran
    errs = [
        float(jnp.abs(out - x @ deq).max()),
        float(jnp.abs(out - x.astype(jnp.bfloat16).astype(jnp.float32) @ deq).max()),
    ]
    assert min(errs) < 1e-3, errs


def test_autotune_table_and_dispatch(tmp_path, monkeypatch):
    """Measured-config table: record → lookup → int4_matmul_auto honors the
    entry (and stays correct with a non-default scheme/blocks)."""
    from chatglm_q_tpu.ops import autotune as AT

    monkeypatch.setenv("CHATGLM_Q_TPU_AUTOTUNE", str(tmp_path / "at.json"))
    AT.reload()
    try:
        k, n = 512, 384
        assert AT.lookup("int4", 8, k, n) is None
        AT.record("int4", 8, k, n,
                  {"impl": "grid", "bk": 256, "bn": 128, "scheme": "grouped"},
                  us_per_call=12.3)
        entry = AT.lookup("int4", 8, k, n)
        assert entry["bk"] == 256 and entry["scheme"] == "grouped"
        # persisted: survives an in-memory drop
        AT.reload()
        assert AT.lookup("int4", 8, k, n)["bn"] == 128

        x = rand((8, k), 20)
        p, s = make_int4(k, n, 21)
        out = PM.int4_matmul_auto(x, p, s, interpret=INTERPRET)
        ref = x @ Q.unpack_int4_tpu(p, s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
    finally:
        AT.reload()


def test_autotune_packaged_defaults(tmp_path, monkeypatch):
    """The repo ships measured winners (data/autotune_defaults.json) that a
    fresh clone reads without a sweep; a user-cache entry for the same key
    overrides the packaged default, and record() keeps the merge fresh."""
    import json

    from chatglm_q_tpu.ops import autotune as AT

    defaults = tmp_path / "defaults.json"
    kind = AT.device_kind()
    json.dump({f"{kind}|int4|m8k512n384": {"impl": "grid", "bk": 256,
                                           "scheme": "grouped"},
               f"{kind}|int4|m8k512n512": {"impl": "grid", "bk": 128,
                                           "scheme": "broadcast"}},
              defaults.open("w"))
    monkeypatch.setattr(AT, "_PACKAGED_DEFAULTS", str(defaults))
    monkeypatch.setenv("CHATGLM_Q_TPU_AUTOTUNE", str(tmp_path / "at.json"))
    AT.reload()
    try:
        assert AT.lookup("int4", 8, 512, 384)["bk"] == 256
        AT.record("int4", 8, 512, 384, {"impl": "pipelined", "bn": 128,
                                        "scheme": "selscale"})
        assert AT.lookup("int4", 8, 512, 384)["scheme"] == "selscale"
        # untouched defaults still visible after a record()
        assert AT.lookup("int4", 8, 512, 512)["bk"] == 128
    finally:
        AT.reload()


@pytest.mark.parametrize("scheme", ["broadcast", "grouped"])
def test_int4_pipelined_f16_scales(scheme, monkeypatch):
    """Scales are STORED float16 since the f16-scale change; the pipelined
    kernel's scale DMA buffer must follow the storage dtype (regression:
    a hardcoded f32 buffer broke the trace for every real checkpoint)."""
    monkeypatch.setattr(PM, "_INT4_SCHEME", scheme)
    k, n = 4096, 256
    x = rand((4, k), 9)
    p, s = make_int4(k, n, 10)
    s = s.astype(jnp.float16)
    out = PM.int4_matmul_pallas_pipelined(x, p, s, interpret=INTERPRET)
    assert out is not None
    ref = x @ Q.unpack_int4_tpu(p, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("scheme", ["grouped", "bt_grouped", "selscale"])
def test_int4_pipelined_alt_schemes(scheme, monkeypatch):
    monkeypatch.setattr(PM, "_INT4_SCHEME", scheme)
    k, n = 4096, 256
    x = rand((4, k), 7)
    p, s = make_int4(k, n, 8)
    out = PM.int4_matmul_pallas_pipelined(x, p, s, interpret=INTERPRET)
    assert out is not None
    xo = x.astype(jnp.bfloat16).astype(jnp.float32) if scheme == "bt_grouped" else x
    ref = xo @ Q.unpack_int4_tpu(p, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("scheme", ["broadcast", "grouped", "selscale"])
def test_int4_idx_kernel_matches_sliced(scheme):
    """Layer-indexed stacked kernel == slicing the stack then running the
    plain kernel, for every layer index."""
    L, k, n = 3, 512, 384
    ps, ss = [], []
    for l in range(L):
        p, s = make_int4(k, n, 40 + l)
        ps.append(p)
        ss.append(s)
    pstack, sstack = jnp.stack(ps), jnp.stack(ss)
    x = rand((8, k), 44)
    for l in range(L):
        got = PM.int4_matmul_pallas_idx(x, pstack, sstack, jnp.int32(l),
                                        scheme=scheme, interpret=INTERPRET)
        assert got is not None
        want = PM.int4_matmul_pallas(x, ps[l], ss[l], scheme=scheme,
                                     interpret=INTERPRET)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scheme", ["broadcast", "grouped"])
def test_int4_idx_tiled_matches_flat(scheme):
    """The tiled serving layout (contiguous column blocks) must match the
    flat stacked layout bit-for-bit through the indexed kernel, and the
    untile fallback must reproduce the original arrays."""
    from chatglm_q_tpu.ops.quant import tile_int4_stack, untile_int4_stack_layer

    L, k, n, bn = 2, 512, 512, 256
    ps, ss = [], []
    for l in range(L):
        p, s = make_int4(k, n, 50 + l)
        ps.append(p)
        ss.append(s)
    pstack, sstack = jnp.stack(ps), jnp.stack(ss)
    p4, s4 = tile_int4_stack(pstack, sstack, bn)
    for l in range(L):
        pu, su = untile_int4_stack_layer(p4, s4, l)
        np.testing.assert_array_equal(np.asarray(pu), np.asarray(ps[l]))
        np.testing.assert_array_equal(np.asarray(su), np.asarray(ss[l]))
    x = rand((8, k), 55)
    for l in range(L):
        got = PM.int4_matmul_pallas_idx(x, p4, s4, jnp.int32(l),
                                        scheme=scheme, interpret=INTERPRET)
        assert got is not None
        want = PM.int4_matmul_pallas_idx(x, pstack, sstack, jnp.int32(l),
                                         scheme=scheme, bn_cap=bn,
                                         interpret=INTERPRET)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_int8_idx_kernel_matches_sliced():
    L, k, n = 3, 512, 384
    rngs = np.random.RandomState(7)
    wstack = jnp.asarray(rngs.randint(-127, 128, (L, k, n)), jnp.int8)
    sstack = jnp.asarray(np.abs(rngs.randn(L, n)) * 0.02, jnp.float32)
    x = rand((8, k), 45)
    for l in range(L):
        got = PM.int8_matmul_pallas_idx(x, wstack, sstack, jnp.int32(l),
                                        interpret=INTERPRET)
        assert got is not None
        want = PM.int8_matmul_pallas(x, wstack[l], sstack[l],
                                     interpret=INTERPRET)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scheme", ["broadcast", "grouped", "bt_grouped"])
def test_int4_pipelined_nonpow2_chunk(scheme, monkeypatch):
    """K not divisible by the 2048 chunk cap: the auto chunk picker must
    select a 256-multiple divisor (3072 → ck 1536, two chunks) instead of
    refusing the shape — w_out's K=13824 pipelines this way (round 4)."""
    monkeypatch.setattr(PM, "_INT4_SCHEME", scheme)
    k, n = 3072, 256
    assert PM._pick_pipeline_ck(k) == 1536
    x = rand((4, k), 17)
    p, s = make_int4(k, n, 18)
    out = PM.int4_matmul_pallas_pipelined(x, p, s, interpret=INTERPRET)
    assert out is not None
    xo = x.astype(jnp.bfloat16).astype(jnp.float32) if scheme == "bt_grouped" else x
    ref = xo @ Q.unpack_int4_tpu(p, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("m,k,n", [(1, 256, 256), (8, 512, 384)])
def test_int8_bt_scheme(m, k, n):
    """bt (nibble-split bitwise bf16 construction) must match the convert
    scheme on bf16 activations: both compute dot(x_bf16, q exactly
    representable) with f32 accumulation."""
    x = rand((m, k), 21).astype(jnp.bfloat16)
    w, s = make_int8(k, n, 22)
    got = PM.int8_matmul_pallas(x, w, s, scheme="bt", interpret=INTERPRET)
    base = PM.int8_matmul_pallas(x, w, s, scheme="convert", interpret=INTERPRET)
    ref = x.astype(jnp.float32) @ (w.astype(jnp.float32) * s)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(base, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-1)


def test_int8_bt_extreme_values():
    """q = ±127/−128 and large activations exercise the biased-byte split
    exactly (u = 0 and 255 hit both nibble extremes)."""
    k, n = 64, 128
    w = jnp.tile(jnp.asarray([[-128, -127, -1, 0, 1, 126, 127, -64]],
                             jnp.int8), (k, n // 8))
    s = jnp.ones((n,), jnp.float32) * 0.5
    x = jnp.ones((8, k), jnp.bfloat16) * 3.0
    got = PM.int8_matmul_pallas(x, w, s, scheme="bt", interpret=INTERPRET)
    base = PM.int8_matmul_pallas(x, w, s, scheme="convert", interpret=INTERPRET)
    # integer-valued products: both schemes are exact in f32, so the bf16
    # output cast is the only rounding and must be IDENTICAL
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))
    ref = x.astype(jnp.float32) @ (w.astype(jnp.float32) * s)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=5e-3)


def test_int8_bt_f32_falls_back():
    """f32 activations keep convert-scheme numerics (bt requires bf16)."""
    x = rand((4, 256), 23)  # float32
    w, s = make_int8(256, 128, 24)
    got = PM.int8_matmul_pallas(x, w, s, scheme="bt", interpret=INTERPRET)
    base = PM.int8_matmul_pallas(x, w, s, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_int4_schemes_accuracy_across_scale_magnitudes():
    """Numeric audit: the bt_grouped rank-1 offset subtracts two large
    terms (±272·s2) — verify no catastrophic cancellation at any realistic
    scale magnitude (GPTQ outlier channels reach ~1.0; f16 checkpoints can
    carry larger).  All schemes must stay within bf16-dominated error of an
    f64 oracle; grouped/bt must agree with each other bit-for-bit risk-wise
    (measured round 3: identical max error at every magnitude)."""
    import numpy as np

    from chatglm_q_tpu.ops.quant import unpack_int4_tpu

    K, N, M = 512, 256, 8
    rng = np.random.RandomState(0)
    xb = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    packed = jnp.asarray(rng.randint(0, 256, size=(K // 2, N)), jnp.uint8)
    q = np.asarray(unpack_int4_tpu(packed, jnp.ones((K // 32, N), jnp.float32)))

    for smag in (0.001, 1.0, 100.0):
        s = (smag * np.exp(rng.uniform(-2.3, 2.3, size=(K // 32, N))))
        sb = jnp.asarray(s, jnp.bfloat16)
        w64 = q.astype(np.float64) * np.asarray(sb, np.float64).repeat(32, 0)
        y64 = np.asarray(xb, np.float64) @ w64
        ref = np.abs(y64).max()
        for scheme in ("broadcast", "grouped", "bt_grouped", "selscale"):
            y = PM.int4_matmul_pallas(xb, packed, sb, scheme=scheme,
                                      interpret=INTERPRET)
            err = np.abs(np.asarray(y, np.float64) - y64).max() / ref
            assert err < 6e-3, (scheme, smag, err)
