"""Dequant-matmul kernel stage attribution.

Times the int4 decode-shape kernel against ablations (no scale multiply /
int8 / pure bf16) to attribute the gap to HBM speed-of-light between DMA,
int4→bf16 conversion, and the group-scale multiply.  Chains L distinct
weight tensors under one jit (cache-busting + dispatch amortization) and
slope-times (utils/timing.py).
"""
import functools
import json

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chatglm_q_tpu.utils.timing import force, slope_time

HBM_GBPS = 819.0
M, K, N, L = 8, 4096, 4096, 8
BK, BN = 2048, 1024


def _kernel(x_ref, p_ref, s_ref, o_ref, acc_ref, *, mode):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if mode in ("int4", "int4_noscale"):
        q = pltpu.bitcast(p_ref[...], jnp.int4)
        w = q.astype(jnp.bfloat16)
        if mode == "int4":
            bk, bn = w.shape
            s = s_ref[...].astype(jnp.bfloat16)
            w = (w.reshape(bk // 32, 32, bn) * s[:, None, :]).reshape(bk, bn)
    elif mode == "int8":
        w = p_ref[...].astype(jnp.bfloat16)
    else:  # bf16
        w = p_ref[...]
    acc_ref[...] += jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def matmul(mode, x, p, s):
    wspec = {
        "int4": (BK // 2, BN),
        "int4_noscale": (BK // 2, BN),
        "int8": (BK, BN),
        "bf16": (BK, BN),
    }[mode]
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(1, N // BN, K // BK),
        in_specs=[
            pl.BlockSpec((M, BK), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(wspec, lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK // 32, BN), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x, p, s)


def bench_mode(mode):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    if mode in ("int4", "int4_noscale"):
        w = jax.random.bits(jax.random.PRNGKey(1), (L, K // 2, N), jnp.uint8)
        wbytes = K * N // 2
    elif mode == "int8":
        w = jax.random.bits(jax.random.PRNGKey(1), (L, K, N), jnp.uint8).astype(jnp.int8)
        wbytes = K * N
    else:
        w = jax.random.normal(jax.random.PRNGKey(1), (L, K, N), jnp.bfloat16) * 0.01
        wbytes = K * N * 2
    s = jnp.full((L, K // 32, N), 0.01, jnp.float32)
    if mode == "int4":
        wbytes += (K // 32) * N * 4

    @functools.partial(jax.jit, static_argnames="reps")
    def run(x, w, s, reps):
        def outer(x, _):
            def body(x, wl):
                wi, si = wl
                y = matmul(mode, x, wi, si)
                return (y * 1e-2).astype(jnp.bfloat16), None

            x, _ = jax.lax.scan(body, x, (w, s))
            return x, None

        x, _ = jax.lax.scan(outer, x, None, length=reps)
        return x.sum()

    per = slope_time(lambda n: force(run(x, w, s, n)), 2, 8) / L
    gbps = wbytes / per / 1e9
    print(json.dumps({
        "mode": mode, "us_per_matmul": round(per * 1e6, 1),
        "effective_GBps": round(gbps, 1),
        "sol_frac": round(gbps / HBM_GBPS, 3),
    }), flush=True)


if __name__ == "__main__":
    for mode in ("bf16", "int8", "int4_noscale", "int4"):
        bench_mode(mode)
