"""Chipless pre-compilation of the TPU measurement programs.

The local libtpu compiles for a v5e topology whose ``device_kind`` ("TPU v5
lite") matches the tunneled bench chip.  PRIMARY purpose: validate that
every measurement program Mosaic-compiles for the real hardware before a
measurement session (this is how the round-3 f16-scale / lane-reshape /
vector-shift bugs were caught).  The compiles also land in the persistent
cache, but NOTE: topology lowering embeds sdy.sharding annotations that a
plain single-device run does not, so these entries do NOT hit for the
default hardware runs (verified via jax cache-key canonicalization) — for
fast hardware compiles use client-side compile mode instead
(PALLAS_AXON_REMOTE_COMPILE=0; docs/STATUS.md wake plan).

Covers, at flagship 6B shapes:
* bench.py: make_params, prefill, decode_n(8/40) under EVERY int4 scheme
  the probe can select (the tuned scheme changes the traced program);
* the scheme-probe chain programs themselves;
* kernel_microbench mode programs.

Usage: python benchmarks/aot_precompile.py [--skip-microbench]
"""
import os
import sys
import time

os.environ.setdefault("TPU_SKIP_MDS_QUERY", "1")

import jax

jax.config.update("jax_platforms", "cpu")  # never touches the axon device
# ISOLATED cache dir: topology-AOT entries cannot be hit by plain runs
# anyway (sdy annotations change the key), and writing them into the main
# cache poisons other processes (XLA:CPU AOT across mismatched
# machine-feature flags segfaults — cpu_aot_loader warning / suite
# SIGSEGV).  A dedicated dir keeps REPEATED precompile runs warm without
# ever being read by measurement processes.
os.makedirs("/root/.cache/jax_comp_aot", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_aot")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np
import jax.numpy as jnp
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[aot {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    topo = topologies.get_topology_desc("v5e:2x2", platform="tpu")
    mesh = Mesh(np.array(topo.devices[:1]).reshape(1,), ("x",))
    SH = NamedSharding(mesh, P())

    from chatglm_q_tpu.ops import pallas_attention as PA
    from chatglm_q_tpu.ops import pallas_matmul as PM

    # the axon runtime reports backend "tpu"; mirror that so the traced
    # programs (kernel interpret flags, dispatch) are identical
    PM._is_tpu = lambda: True
    PA._is_tpu = lambda: True

    import bench
    from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
    from chatglm_q_tpu.models import chatglm2 as M
    from chatglm_q_tpu.ops.quant import int4_storage_k

    config = ChatGLM2Config()
    qt = "int4g32"
    rt = TpuRuntimeConfig(use_pallas=True, use_flash_attention=False)

    def sds(tree):
        return jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=SH), tree)

    params = sds(jax.eval_shape(
        lambda k: bench.random_quantized_params(k, config, qt),
        jax.random.PRNGKey(0)))
    cache = sds(jax.eval_shape(
        lambda: M.init_kv_cache(config, 1, 1024, jnp.bfloat16)))
    prompt = jax.ShapeDtypeStruct((1, 128), jnp.int32, sharding=SH)
    lengths = jax.ShapeDtypeStruct((1,), jnp.int32, sharding=SH)
    first = jax.ShapeDtypeStruct((1,), jnp.int32, sharding=SH)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=SH)

    def compile_(name, lowerable):
        # accepts a Lowered OR a thunk producing one (tracing itself can
        # raise for legitimately-unsupported candidate configs)
        t0 = time.time()
        try:
            if callable(lowerable):
                lowerable = lowerable()
            lowerable.compile()
            log(f"{name}: compiled in {time.time() - t0:.0f}s")
        except Exception as e:
            log(f"{name}: SKIP {type(e).__name__}: {str(e)[:160]}")

    compile_("make_params", jax.jit(
        lambda k: bench.random_quantized_params(k, config, qt)).lower(key))
    compile_("prefill",
             bench.make_prefill(config, qt, rt).lower(params, prompt,
                                                      lengths, cache))

    # scheme-probe chains (what bench.ensure_scheme_probe compiles first)
    H, Ip = config.hidden_size, int4_storage_k(config.inner_hidden_size)
    K, N, L = H, Ip, 6
    xprobe = jax.ShapeDtypeStruct((1, K), jnp.bfloat16, sharding=SH)
    packs = jax.ShapeDtypeStruct((L, K // 2, N), jnp.uint8, sharding=SH)
    scales = jax.ShapeDtypeStruct((L, K // 32, N), jnp.bfloat16, sharding=SH)
    repsS = jax.ShapeDtypeStruct((), jnp.int32, sharding=SH)
    for scheme in ("broadcast", "selscale", "grouped", "bt_grouped"):
        chain = bench.make_probe_chain(K, L, scheme)
        compile_(f"probe_chain/{scheme}",
                 chain.lower(xprobe, packs, scales, repsS))

    # decode program under every scheme the probe may record (the tuned
    # scheme changes the kernels inside the scan body).  A FRESH jit per
    # scheme: jax.jit caches traces by shapes/statics only, so reusing one
    # jit object would silently re-lower the first scheme's program.
    saved = PM._INT4_SCHEME
    for scheme in ("broadcast", "selscale", "grouped", "bt_grouped"):
        PM._INT4_SCHEME = scheme
        decode_n = bench.make_decode_n(config, qt, rt)
        try:
            for n in (8, 40):
                compile_(f"decode_n({n})/{scheme}",
                         decode_n.lower(params, first, cache, n=n))
        finally:
            PM._INT4_SCHEME = saved

    if "--skip-microbench" not in sys.argv:
        import benchmarks.kernel_microbench as KM

        for mode in ("bf16", "int8", "int8_bt", "int4_noscale", "int4",
                     "int4_repeat", "int4_selscale", "int4_grouped",
                     "int4_batched", "int4_bittrick", "int4_bt_grouped",
                     "int4_convert_i8", "int4_dma"):
            x = jax.ShapeDtypeStruct((KM.M, KM.K), jnp.bfloat16, sharding=SH)
            if mode.startswith("int4"):
                w = jax.ShapeDtypeStruct((KM.L, KM.K // 2, KM.N), jnp.uint8,
                                         sharding=SH)
            elif mode in ("int8", "int8_bt"):
                w = jax.ShapeDtypeStruct((KM.L, KM.K, KM.N), jnp.int8,
                                         sharding=SH)
            else:
                w = jax.ShapeDtypeStruct((KM.L, KM.K, KM.N), jnp.bfloat16,
                                         sharding=SH)
            s = jax.ShapeDtypeStruct((KM.L, KM.K // 32, KM.N), jnp.bfloat16,
                                     sharding=SH)
            reps = jax.ShapeDtypeStruct((), jnp.int32, sharding=SH)

            @jax.jit
            def run(x, w, s, reps, _m=mode):
                def outer(_, x):
                    def body(x, wl):
                        wi, si = wl
                        y = KM.matmul(_m, x, wi, si)
                        return (y * 1e-2).astype(jnp.bfloat16), None
                    x, _ = jax.lax.scan(body, x, (w, s))
                    return x
                x = jax.lax.fori_loop(0, reps, outer, x)
                return x.sum()

            compile_(f"microbench/{mode}", run.lower(x, w, s, reps))

    if "--sweep" in sys.argv:
        precompile_sweep(SH, compile_)
    if "--full" in sys.argv:
        precompile_full_bench(SH, compile_)

    log("done")





def precompile_sweep(SH, compile_):
    """Every autotune-sweep candidate program (the sweep's dominant cost on
    hardware is its per-candidate Mosaic compiles)."""
    import benchmarks.autotune_sweep as AS

    for kernel, cands in (("int4", AS.INT4_CANDIDATES),
                          ("int8", AS.INT8_CANDIDATES)):
        for name, (k, n, big) in AS.SHAPES.items():
            for m in (8, 64, 256):
                for impl, cfg in cands:
                    run = AS.build_chain(kernel, k, n, impl, cfg)
                    shapes = AS.chain_arg_dtypes(kernel, m, k, n)
                    args = [jax.ShapeDtypeStruct(s_[0], s_[1], sharding=SH)
                            for s_ in shapes]
                    reps = jax.ShapeDtypeStruct((), jnp.int32, sharding=SH)
                    compile_(f"sweep/{kernel}/{name}/m{m}/{impl}/"
                             f"{cfg.get('scheme')}/bn{cfg.get('bn')}",
                             lambda run=run, args=args: run.lower(*args, reps))


def precompile_full_bench(SH, compile_):
    """full_bench decode programs: int4 (3 schemes) and int8 (2 schemes)
    across the runbook's batch sizes, flash and flash+v2 attention."""
    import benchmarks.full_bench as FB
    import bench
    from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
    from chatglm_q_tpu.models import chatglm2 as M
    from chatglm_q_tpu.ops import pallas_matmul as PM

    config = ChatGLM2Config()

    def structs(qt, batch, cache_len=1024):
        params = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=SH),
            jax.eval_shape(lambda k: bench.random_quantized_params(k, config, qt),
                           jax.random.PRNGKey(0)))
        cache = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=SH),
            jax.eval_shape(lambda: M.init_kv_cache(config, batch, cache_len,
                                                   jnp.bfloat16)))
        first = jax.ShapeDtypeStruct((batch,), jnp.int32, sharding=SH)
        return params, first, cache

    rt_flash = TpuRuntimeConfig(use_flash_attention=True)
    rt_v2 = TpuRuntimeConfig(use_flash_attention=True, decode_attn_v2=True)

    saved4, saved8 = PM._INT4_SCHEME, PM._INT8_SCHEME
    try:
        for scheme in ("broadcast", "selscale", "grouped"):
            PM._INT4_SCHEME = scheme
            for batch in (1, 8, 16, 32):
                p, f, c = structs("int4g32", batch)
                dn = FB.make_decode_n(config, "int4g32", rt_flash)
                for n in (8, 40):
                    compile_(f"fb/int4/{scheme}/b{batch}/flash/n{n}",
                             dn.lower(p, f, c, n=n))
            for batch in (1, 8):
                p, f, c = structs("int4g32", batch)
                dn = FB.make_decode_n(config, "int4g32", rt_v2)
                for n in (8, 40):
                    compile_(f"fb/int4/{scheme}/b{batch}/v2/n{n}",
                             dn.lower(p, f, c, n=n))
        PM._INT4_SCHEME = saved4
        for scheme in ("convert", "bt"):
            PM._INT8_SCHEME = scheme
            for batch in (1, 8):
                p, f, c = structs("int8", batch)
                dn = FB.make_decode_n(config, "int8", rt_flash)
                for n in (8, 40):
                    compile_(f"fb/int8/{scheme}/b{batch}/flash/n{n}",
                             dn.lower(p, f, c, n=n))
    finally:
        PM._INT4_SCHEME, PM._INT8_SCHEME = saved4, saved8


if __name__ == "__main__":
    main()
