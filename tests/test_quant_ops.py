"""Unit tests for quantization packing/unpacking and linear op fallbacks.

Mirrors the reference's kernel-vs-dense parity strategy
(/root/reference/tests/test_triton_ops.py, test_triton_ops_int4.py): every
packed representation must round-trip, and the matmul ops must agree with a
dense dequantized matmul.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatglm_q_tpu.ops import quant as Q
from chatglm_q_tpu.ops.linear import quant_linear
from chatglm_q_tpu.config import TpuRuntimeConfig

RT_FALLBACK = TpuRuntimeConfig(use_pallas=False)


def rand(shape, seed=0, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32) * scale


class TestInt8:
    def test_rtn_roundtrip_error(self):
        w = rand((64, 32), 0)
        q, scale = Q.rtn_quantize_int8(w)
        deq = q.astype(jnp.float32) * scale
        err = jnp.abs(deq - w).max() / jnp.abs(w).max()
        assert err < 0.01  # 8-bit grid

    def test_scale_is_per_out_channel(self):
        w = rand((64, 32), 1)
        _, scale = Q.rtn_quantize_int8(w)
        assert scale.shape == (32,)
        np.testing.assert_allclose(
            np.asarray(scale), np.abs(np.asarray(w)).max(0) / 127, rtol=1e-6
        )

    def test_linear_matches_dense(self):
        x = rand((4, 64), 2)
        w = rand((64, 32), 3)
        p = Q.quantize_linear_int8(w)
        y = quant_linear(x, p, "int8", RT_FALLBACK)
        deq = p["weight"].astype(jnp.float32) * p["weight_scale"]
        np.testing.assert_allclose(np.asarray(y), np.asarray(x @ deq), rtol=1e-5, atol=1e-5)

    def test_grad_flows_to_x_only(self):
        x = rand((4, 64), 4)
        w = rand((64, 32), 5)
        p = Q.quantize_linear_int8(w)

        def f(x):
            return quant_linear(x, p, "int8", RT_FALLBACK).sum()

        gx = jax.grad(f)(x)
        deq = p["weight"].astype(jnp.float32) * p["weight_scale"]
        expected = jnp.ones((4, 32)) @ deq.T
        np.testing.assert_allclose(np.asarray(gx), np.asarray(expected), rtol=1e-5, atol=1e-5)


class TestInt4:
    def test_pack_unpack_ref_roundtrip(self):
        w = rand((128, 32), 0)
        q, scale = Q.rtn_quantize_int4(w)
        packed = Q.pack_int4_ref(q)
        deq = Q.unpack_int4_ref(packed, scale)
        expected = q.astype(jnp.float32).reshape(4, 32, 32) * scale[:, None, :]
        np.testing.assert_allclose(np.asarray(deq), np.asarray(expected.reshape(128, 32)), rtol=1e-6)

    def test_pack_unpack_tpu_roundtrip(self):
        w = rand((128, 32), 1)
        q, scale = Q.rtn_quantize_int4(w)
        packed = Q.pack_int4_tpu(q)
        deq = Q.unpack_int4_tpu(packed, scale)
        expected = q.astype(jnp.float32).reshape(4, 32, 32) * scale[:, None, :]
        np.testing.assert_allclose(np.asarray(deq), np.asarray(expected.reshape(128, 32)), rtol=1e-6)

    def test_repack_ref_tpu_inverse(self):
        w = rand((256, 16), 2)
        q, _ = Q.rtn_quantize_int4(w)
        ref = np.asarray(Q.pack_int4_ref(q))
        tpu = np.asarray(Q.pack_int4_tpu(q))
        np.testing.assert_array_equal(Q.repack_ref_to_tpu(ref), tpu)
        np.testing.assert_array_equal(Q.repack_tpu_to_ref(tpu), ref)

    def test_quant_mse_sane(self):
        # reference pattern: quantize a real matrix, check MSE of the matmul
        # result is small (test_triton_ops_int4.py:11-18)
        a = rand((32, 512), 3, 0.5)
        b = rand((512, 256), 4, 0.5)
        q, scale = Q.rtn_quantize_int4(b)
        deq = Q.unpack_int4_tpu(Q.pack_int4_tpu(q), scale)
        mse = jnp.mean((a @ deq - a @ b) ** 2)
        rel = float(mse) / float(jnp.mean((a @ b) ** 2))
        assert rel < 0.01

    def test_linear_matches_dense(self):
        x = rand((4, 64), 5)
        w = rand((64, 32), 6)
        p = Q.quantize_linear_int4(w)
        y = quant_linear(x, p, "int4g32", RT_FALLBACK)
        deq = Q.unpack_int4_tpu(p["weight"], p["weight_scale"])
        np.testing.assert_allclose(np.asarray(y), np.asarray(x @ deq), rtol=1e-5, atol=1e-5)

    def test_grad_flows_to_x(self):
        x = rand((4, 64), 7)
        w = rand((64, 32), 8)
        p = Q.quantize_linear_int4(w)
        gx = jax.grad(lambda x: quant_linear(x, p, "int4g32", RT_FALLBACK).sum())(x)
        deq = Q.unpack_int4_tpu(p["weight"], p["weight_scale"])
        np.testing.assert_allclose(
            np.asarray(gx), np.asarray(jnp.ones((4, 32)) @ deq.T), rtol=1e-5, atol=1e-5
        )


class TestEmbedding:
    def test_int8_lookup(self):
        w = rand((64, 16), 0)
        p = Q.quantize_embedding_int8(w)
        ids = jnp.array([[0, 5], [63, 1]])
        out = Q.embedding_lookup_int8(p, ids)
        deq = p["weight"].astype(jnp.float32) * p["weight_scale"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(deq[ids]), rtol=1e-6)

    def test_int4_lookup_matches_unpack(self):
        w = rand((64, 16), 1)
        p = Q.quantize_embedding_int4(w)
        ids = jnp.array([[0, 1, 2, 31], [32, 33, 62, 63]])
        out = Q.embedding_lookup_int4(p, ids)
        full = Q.unpack_int4_ref(p["weight"], p["weight_scale"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(full[ids]), rtol=1e-6, atol=1e-7)


def test_quantize_with_scale_matches_reference_grid():
    w = rand((64, 32), 9)
    _, s8 = Q.rtn_quantize_int8(w)
    g8 = Q.quantize_with_scale_int8(w, s8)
    q8, _ = Q.rtn_quantize_int8(w)
    np.testing.assert_array_equal(np.asarray(g8), np.asarray(q8))

    q4, s4 = Q.rtn_quantize_int4(w)
    g4 = Q.quantize_with_scale_int4(w, s4)
    np.testing.assert_array_equal(np.asarray(g4), np.asarray(q4))


class TestStoragePadding:
    """K dims with no aligned kernel divisor are stored zero-padded
    (ops/quant.py int4_storage_k); results must be exact on the logical K."""

    def test_storage_k_rule(self):
        assert Q.int4_storage_k(64) == 64
        assert Q.int4_storage_k(512) == 512
        assert Q.int4_storage_k(4096) == 4096
        assert Q.int4_storage_k(13696) == 13824  # ChatGLM2 inner dim
        assert Q.int4_storage_k(1664) == 2048

    def test_int4_padded_matmul_exact(self):
        K, N = 1664, 128
        w = rand((K, N), 20)
        p = Q.quantize_linear_int4(w)
        assert p["weight"].shape[0] * 2 == 2048
        x = rand((4, K), 21)
        y = quant_linear(x, p, "int4g32", RT_FALLBACK)
        q, scale = Q.rtn_quantize_int4(w)
        deq = Q.unpack_int4_tpu(Q.pack_int4_tpu(q), scale.astype(Q.SCALE_DTYPE))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x @ deq), rtol=1e-4, atol=1e-4)
        # gradient strips padding
        gx = jax.grad(lambda x: quant_linear(x, p, "int4g32", RT_FALLBACK).sum())(x)
        assert gx.shape == (4, K)

    def test_int8_padded_matmul_exact(self):
        K, N = 1664, 64
        w = rand((K, N), 22)
        p = Q.quantize_linear_int8(w)
        assert p["weight"].shape[0] == 2048
        x = rand((3, K), 23)
        y = quant_linear(x, p, "int8", RT_FALLBACK)
        q, scale = Q.rtn_quantize_int8(w)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x @ (q.astype(jnp.float32) * scale)),
            rtol=1e-4, atol=1e-4,
        )
