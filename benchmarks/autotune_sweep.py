"""Populate the measured kernel-config table (ops/autotune.py) on hardware.

Times the PRODUCTION kernels (not microbench replicas) per model shape and
M bucket over a small candidate set, and records each winner.  Measurement
protocol: L distinct weight tensors chained under one jit (cache busting —
every call streams its weights from HBM like a real decode step), a dynamic
``fori_loop`` rep count so ONE compiled program serves all chain lengths,
and slope timing between two counts (utils/timing.py; host-loop timing is
meaningless through this deployment's ~30 ms tunnel RTT).

Each candidate config is its own Mosaic compile (minutes cold through the
remote-compile tunnel, seconds warm from the persistent cache), so the
default sweep covers only the traffic-dominant shapes; widen with --all.
Already-recorded shapes are skipped unless --force.

Usage:
  python benchmarks/autotune_sweep.py            # int4, M=8, big shapes
  python benchmarks/autotune_sweep.py --kernel int8 --m 8 64 --all --force
"""
import argparse
import functools
import json
import sys

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

from chatglm_q_tpu.ops import autotune as AT
from chatglm_q_tpu.ops import pallas_matmul as PM
from chatglm_q_tpu.ops.quant import int4_storage_k
from chatglm_q_tpu.utils.timing import force, slope_time_auto

L = 8  # distinct weights per chain (cache busting)

HBM_GBPS = 819.0  # v5e

# Any per-call time implying more than ~1.5x the HBM bandwidth is a
# measurement failure (the tunnel's ~30 ms dispatch jitter swamping a
# too-small slope delta), not a result.
_IMPOSSIBLE_BW = 1.5 * HBM_GBPS * 1e9


# the sweep's scale storage dtypes — single source for chain_arg_dtypes,
# chain_inputs, and the traffic model (they must agree: the scale stream
# is 1/8 of the int4 weight bytes)
_SCALE_DTYPE = {"int4": jnp.bfloat16, "int8": jnp.float32}


def _traffic_bytes(kernel, k, n):
    sbytes = jnp.dtype(_SCALE_DTYPE[kernel]).itemsize
    if kernel == "int4":
        return k * n // 2 + (k // 32) * n * sbytes
    return k * n + sbytes * n

# ChatGLM2-6B linear shapes in STORAGE dims (int4_storage_k padding).
# name: (K, N, traffic_dominant)
SHAPES = {
    # q_proj and o_proj are both (4096, 4096) in this package's layout
    # (q/kv are SEPARATE linears — 4608 is the reference's fused-QKV width,
    # which never occurs here) and share one shape key
    "qo_proj": (4096, 4096, False),
    "kv_proj": (4096, 512, False),
    "w_in": (4096, int4_storage_k(13696), True),
    "w_out": (int4_storage_k(13696), 4096, True),
    "lm_head": (4096, 65536, True),
}

INT4_CANDIDATES = [
    # (impl, config) — selscale first: exact broadcast numerics with the
    # scale expansion moved off the VPU onto the MXU (microbench 2026-08-18:
    # broadcast 42.3 us vs repeat/grouped ~33-34 us at the decode tile; the
    # 3-D sublane-broadcast multiply is the cost).  selscale's f32
    # scale-expansion intermediate caps bk at 1024 (scoped-VMEM, see
    # pallas_matmul).  bt_grouped (no int→float convert at all) joins the
    # sweep only under CHATGLM_Q_TPU_ALLOW_BT_GROUPED=1 — after a hardware
    # tpu_smoke run validates the round-4 nibble-bias fix AND the code
    # quarantine is lifted.
    # ordered by expected value (microbench r3: bt_grouped compute 13.9 us,
    # grouped 15.6 us vs DMA 17.6 us at the decode tile → the pipelined
    # overlap should land near the DMA floor), so a --budget cutoff still
    # times the best bets.  bt_grouped is hardware-exact since the round-4
    # nibble-bias + correction-precision fixes; the exactness gate below
    # guards every recording anyway.
    ("pipelined", {"bn": 1024, "scheme": "bt_grouped"}),
    ("pipelined", {"bn": 1024, "scheme": "grouped"}),
    ("pipelined", {"bn": 1024, "scheme": "selscale"}),
    ("grid", {"bk": 2048, "bn": 1024, "scheme": "bt_grouped"}),
    ("grid", {"bk": 2048, "bn": 1024, "scheme": "grouped"}),
    ("grid", {"bk": 1024, "bn": 1024, "scheme": "selscale"}),
    ("pipelined", {"bn": 1024, "scheme": "broadcast"}),
    ("grid", {"bk": 2048, "bn": 2048, "scheme": "broadcast"}),
    ("grid", {"bk": 2048, "bn": 2048, "scheme": "grouped"}),
    ("grid", {"bk": 1024, "bn": 2048, "scheme": "selscale"}),
]

INT8_CANDIDATES = [
    # bt first: removes the int8→bf16 convert (round-1 attribution: the
    # convert is the int8 path's remaining per-element cost)
    ("grid", {"bk": 2048, "bn": 2048, "scheme": "bt"}),
    ("grid", {"bk": 2048, "bn": 1024, "scheme": "bt"}),
    ("grid", {"bk": 2048, "bn": 2048, "scheme": "convert"}),
    ("grid", {"bk": 2048, "bn": 1024, "scheme": "convert"}),
    ("grid", {"bk": 1024, "bn": 1024, "scheme": "convert"}),
]


def build_chain(kernel, k, n, impl, cfg):
    """The candidate's chained timing program (module-level so
    benchmarks/aot_precompile.py can pre-populate its compile-cache
    entry).  Returns a fresh jit ``run(x, w, s, reps)``."""
    call = _single_call(kernel, impl, cfg)

    # outputs (m, n) feed the next chain link's (m, k) input; pad/trim n→k
    if n < k:
        def call2(x, wi, si, _call=call):
            y = _call(x, wi, si)
            return jnp.pad(y, ((0, 0), (0, k - y.shape[1])))
        call = call2

    @jax.jit
    def run(x, w, s, reps):
        def outer(_, x):
            def body(x, wl):
                wi, si = wl
                y = call(x, wi, si)
                # keep magnitudes bounded; cast back to the input dtype
                return (y * 1e-2).astype(x.dtype)[:, : x.shape[1]], None

            x, _ = jax.lax.scan(body, x, (w, s))
            return x

        x = jax.lax.fori_loop(0, reps, outer, x)
        return x.sum()

    return run


def chain_arg_dtypes(kernel, m, k, n):
    """(x, w, s) shapes/dtypes for build_chain programs."""
    Lc = _chain_len(kernel, k, n)
    if kernel == "int4":
        return (((m, k), jnp.bfloat16), ((Lc, k // 2, n), jnp.uint8),
                ((Lc, k // 32, n), _SCALE_DTYPE["int4"]))
    return (((m, k), jnp.bfloat16), ((Lc, k, n), jnp.int8),
            ((Lc, n), _SCALE_DTYPE["int8"]))


def _single_call(kernel, impl, cfg):
    """One production-kernel application with this candidate's config."""
    if kernel == "int4":
        if impl == "pipelined":
            def call(x, wi, si):
                out = PM.int4_matmul_pallas_pipelined(
                    x, wi, si, bn_cap=cfg["bn"], scheme=cfg["scheme"])
                assert out is not None
                return out
        else:
            def call(x, wi, si):
                return PM.int4_matmul_pallas(
                    x, wi, si, bk_cap=cfg["bk"], bn_cap=cfg["bn"],
                    scheme=cfg["scheme"])
    else:
        def call(x, wi, si):
            return PM.int8_matmul_pallas(x, wi, si, bk_cap=cfg["bk"],
                                         bn_cap=cfg["bn"],
                                         scheme=cfg.get("scheme"))
    return call


def verify(kernel, m, k, n, impl, cfg, rel_tol=2e-2):
    """On-hardware exactness row: candidate kernel vs the jnp oracle at this
    exact shape/config.  The sweep REFUSES to record a winner whose
    exactness row did not pass — round 3's bt_grouped showed a kernel can
    be exact in interpret mode yet wrong on silicon (VERDICT r3 #3)."""
    x = jax.random.normal(jax.random.PRNGKey(5), (m, k), jnp.bfloat16)
    if kernel == "int4":
        from chatglm_q_tpu.ops.quant import unpack_int4_tpu

        w = jax.random.bits(jax.random.PRNGKey(6), (k // 2, n), jnp.uint8)
        s = (jnp.abs(jax.random.normal(jax.random.PRNGKey(7), (k // 32, n)))
             * 0.02 + 1e-3).astype(jnp.bfloat16)
        want = x.astype(jnp.float32) @ unpack_int4_tpu(w, s).astype(jnp.float32)
    else:
        w = jax.random.randint(jax.random.PRNGKey(6), (k, n), -127, 128,
                               jnp.int8)
        s = jnp.abs(jax.random.normal(jax.random.PRNGKey(7), (n,))) * 0.01
        want = x.astype(jnp.float32) @ (w.astype(jnp.float32) * s)
    got = jax.jit(_single_call(kernel, impl, cfg))(x, w, s)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
    rel = err / (float(jnp.max(jnp.abs(want))) + 1e-9)
    if rel > rel_tol:
        raise RuntimeError(f"EXACTNESS FAIL rel={rel:.3g} (max err {err:.3g})")
    return rel


def _chain_len(kernel, k, n) -> int:
    """Distinct weights per chain: enough to bust any cache, but capped so
    huge shapes (lm_head: 150 MB/copy) don't exhaust backend HBM — the
    round-4 sweep OOM'd every lm_head candidate at L=8 (1.2 GB steady +
    the eager-RNG transient this backend is known to trip on)."""
    per = _traffic_bytes(kernel, k, n)
    return max(2, min(L, int(6e8 // max(per, 1))))


def chain_inputs(kernel, m, k, n):
    """(x, w, s) on device, generated under ONE jit (eager RNG streams OOM
    this backend — bench.py make_params has the same rule)."""
    Lc = _chain_len(kernel, k, n)

    @jax.jit
    def gen(key):
        kx, kw = jax.random.split(key)
        x = jax.random.normal(kx, (m, k), jnp.bfloat16)
        if kernel == "int4":
            w = jax.random.bits(kw, (Lc, k // 2, n), jnp.uint8)
            s = jnp.full((Lc, k // 32, n), 0.01, _SCALE_DTYPE["int4"])
        else:
            w = jax.random.bits(kw, (Lc, k, n), jnp.uint8).astype(jnp.int8)
            s = jnp.full((Lc, n), 0.01, _SCALE_DTYPE["int8"])
        return x, w, s

    out = gen(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    return out


def measure(kernel, m, k, n, impl, cfg):
    x, w, s = chain_inputs(kernel, m, k, n)
    Lc = w.shape[0]
    run = build_chain(kernel, k, n, impl, cfg)
    floor = _traffic_bytes(kernel, k, n) / _IMPOSSIBLE_BW
    for attempt in range(3):
        t = slope_time_auto(lambda r: force(run(x, w, s, r)), 2, 8,
                            repeats=3 + 2 * attempt) / Lc
        if t >= floor:
            return t
    raise RuntimeError(
        f"implausible timing {t*1e6:.1f}us < physical floor {floor*1e6:.1f}us"
        " after 3 attempts (dispatch noise)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", default="int4", choices=["int4", "int8"])
    ap.add_argument("--m", type=int, nargs="+", default=[8])
    ap.add_argument("--all", action="store_true",
                    help="sweep every shape, not just traffic-dominant ones")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--budget", type=int, default=0,
                    help="max measurements this run (0 = unlimited)")
    args = ap.parse_args()

    cands = list(INT4_CANDIDATES if args.kernel == "int4" else INT8_CANDIDATES)
    done = 0
    for name, (k, n, big) in SHAPES.items():
        # m=8 (decode) always sweeps every shape — the batch-1 headline runs
        # all five, and round 3 left the non-"big" decode shapes as untimed
        # probe placeholders (VERDICT r3 weak #1)
        if not (big or args.all or args.m == [8]):
            continue
        for m in args.m:
            bm = PM._block_m(m)
            entry = AT.lookup(args.kernel, bm, k, n)
            # bench.py's one-shot scheme probe records provisional
            # ("probe": true) entries — a real sweep replaces them; entries
            # without an exactness row (pre-round-4 sweeps) are re-swept
            if (entry and not entry.get("probe") and entry.get("exact")
                    and not args.force):
                print(f"skip {name} m{bm} (recorded)", flush=True)
                continue
            timed = []
            for impl, cfg in cands:
                if args.budget and done >= args.budget:
                    break
                try:
                    t = measure(args.kernel, m, k, n, impl, cfg)
                except Exception as e:
                    print(json.dumps({"shape": name, "impl": impl, **cfg,
                                      "error": repr(e)[:200]}), flush=True)
                    continue
                done += 1
                print(json.dumps({"shape": name, "m": bm, "impl": impl, **cfg,
                                  "us": round(t * 1e6, 1)}), flush=True)
                timed.append((t, impl, cfg))
            # verify winners best-first and record the fastest EXACT one —
            # every remote compile costs minutes, so exactness rows run
            # only for candidates that would actually be recorded
            for t, impl, cfg in sorted(timed, key=lambda r: r[0]):
                try:
                    rel = verify(args.kernel, m, k, n, impl, cfg)
                except Exception as e:
                    print(json.dumps({"shape": name, "impl": impl, **cfg,
                                      "verify_error": repr(e)[:200]}),
                          flush=True)
                    continue
                AT.record(args.kernel, bm, k, n,
                          {"impl": impl, **cfg, "exact": True},
                          us_per_call=t * 1e6)
                print(f"RECORDED {args.kernel} {name} m{bm}: {impl} {cfg} "
                      f"{t*1e6:.1f}us (verify_rel {rel:.2g}) -> "
                      f"{AT.table_path()}", flush=True)
                break


if __name__ == "__main__":
    main()
