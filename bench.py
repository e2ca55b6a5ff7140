"""Headline benchmark: ChatGLM2-6B int4g32 single-chip decode throughput.

Measures steady-state autoregressive decode tokens/s on the flagship config
(BASELINE.json config 3: ChatGLM2-6B int4g32, batch-1 decode) with random
weights (identical compute/memory traffic to real ones; no network egress
for real checkpoints in this environment).

Protocol: in-graph ``lax.scan`` decode (models/chatglm2.py multi_step_decode)
so no host round trip is paid per token; per-token time from the slope
between two scan lengths with scalar forcing (utils/timing.py, required on
this tunneled TPU).  ``vs_baseline`` is the fraction of the
HBM-bandwidth speed-of-light for this chip (v5e ≈ 819 GB/s: every decoded
token must stream all weight bytes once), since the reference publishes no
tokens/s (BASELINE.md).

Prints exactly one JSON line.
"""
import json
import os
import sys
import time

import numpy as np
import jax

# persistent compilation cache: the 28-layer decode program takes minutes to
# compile through this environment's remote-compile tunnel; cache hits bring
# reruns down to seconds.
os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp


def _log(msg):
    print(f"[bench {time.perf_counter()-_T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.perf_counter()

from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.utils.timing import force, slope_time, slope_time_auto

HBM_GBPS = 819.0  # v5e


def random_quantized_params(rng: jax.Array, config: ChatGLM2Config, quant_type: str):
    """Random packed weights directly on device (no float quantize pass) —
    same shapes/dtypes/traffic as a real checkpoint."""
    H, I = config.hidden_size, config.inner_hidden_size
    V, L = config.vocab_size, config.num_layers
    ks = iter(jax.random.split(rng, 64))

    from chatglm_q_tpu.ops.quant import int4_storage_k

    def lin(k, n, bias):
        k = int4_storage_k(k)
        n = int4_storage_k(n)  # no-op except the w_in halves (13696→13824)
        if quant_type == "int4g32":
            p = {
                # random.bits: native uint8 generation, no int32 transients;
                # bf16 scales = the in-HBM storage dtype (ops/quant.py
                # SCALE_DTYPE; Mosaic v5e can't load f16) — 1/8 of the
                # weight stream
                "weight": jax.random.bits(next(ks), (L, k // 2, n), jnp.uint8),
                "weight_scale": jnp.full((L, k // 32, n), 0.01, jnp.bfloat16),
            }
        elif quant_type == "int8":
            p = {
                "weight": jax.random.bits(next(ks), (L, k, n), jnp.uint8).astype(jnp.int8),
                "weight_scale": jnp.full((L, n), 0.01, jnp.float32),
            }
        else:
            p = {"weight": jax.random.normal(next(ks), (L, k, n), jnp.bfloat16) * 0.02}
        if bias:
            p["bias"] = jnp.zeros((L, n), jnp.bfloat16)
        return p

    def lin1(k, n):
        from chatglm_q_tpu.ops.quant import LMHEAD_N_MULTIPLE

        k = int4_storage_k(k)
        if quant_type != "none" and n >= LMHEAD_N_MULTIPLE:
            # production checkpoints load the lm_head vocab-padded
            # (ops/quant.py lmhead_pad: 65024 → 65536 so the kernel tiles
            # at full bn instead of 512); logits are sliced back
            n = -(-n // LMHEAD_N_MULTIPLE) * LMHEAD_N_MULTIPLE
        if quant_type == "int4g32":
            return {
                "weight": jax.random.bits(next(ks), (k // 2, n), jnp.uint8),
                "weight_scale": jnp.full((k // 32, n), 0.01, jnp.bfloat16),
            }
        if quant_type == "int8":
            return {
                "weight": jax.random.bits(next(ks), (k, n), jnp.uint8).astype(jnp.int8),
                "weight_scale": jnp.full((n,), 0.01, jnp.float32),
            }
        return {"weight": jax.random.normal(next(ks), (k, n), jnp.bfloat16) * 0.02}

    if quant_type == "int4g32":
        emb = {
            "weight": jax.random.bits(next(ks), (V // 2, H), jnp.uint8),
            "weight_scale": jnp.full((V // 32, H), 0.01, jnp.float32),
        }
    elif quant_type == "int8":
        emb = {
            "weight": jax.random.bits(next(ks), (V, H), jnp.uint8).astype(jnp.int8),
            "weight_scale": jnp.full((H,), 0.01, jnp.float32),
        }
    else:
        emb = {"weight": jax.random.normal(next(ks), (V, H), jnp.bfloat16) * 0.02}

    return {
        "word_embedding": emb,
        "layers": {
            "attn_ln": {"weight": jnp.ones((L, H), jnp.bfloat16)},
            "ffn_ln": {"weight": jnp.ones((L, H), jnp.bfloat16)},
            "q_proj": lin(H, config.q_size, True),
            "kv_proj": lin(H, 2 * config.kv_size, True),
            "o_proj": lin(config.q_size, H, False),
            "w_in_h": lin(H, I, False),
            "w_in_gate": lin(H, I, False),
            "w_out": lin(I, H, False),
        },
        "final_ln": {"weight": jnp.ones((H,), jnp.bfloat16)},
        "lm_head": lin1(H, V),
    }


def _probe_impl_call(c, p, s, scheme):
    """The SAME dispatch the decode program uses (pipelined first, grid when
    inapplicable — pallas_matmul int4_matmul_auto), so the recorded probe
    winner is the kernel that actually runs."""
    from chatglm_q_tpu.ops import pallas_matmul as PM

    out = PM.int4_matmul_pallas_pipelined(c, p, s, scheme=scheme)
    if out is not None:
        return out, "pipelined"
    return PM.int4_matmul_pallas(c, p, s, scheme=scheme), "grid"


def make_probe_chain(K: int, L: int, scheme: str):
    """The scheme-probe timing program (module-level so
    benchmarks/aot_precompile.py can pre-populate its compile-cache entry).

    ``reps`` is a TRACED fori_loop trip count — one compiled program serves
    every chain length slope_time_auto asks for (a static count recompiled
    the whole chain per growth step, minutes each through the remote-compile
    tunnel).  One rep = one scan over the L distinct weights (cache
    busting), so per-call time = slope / L."""

    @jax.jit
    def chain(x, packs, scales, reps):
        def outer(_, c):
            def body(c, wl):
                p, s = wl
                out, _ = _probe_impl_call(c, p, s, scheme)
                return out[:, :K].astype(c.dtype), None

            c, _ = jax.lax.scan(body, c, (packs, scales))
            return c

        return jax.lax.fori_loop(0, reps, outer, x).sum()

    return chain


def ensure_scheme_probe(config: ChatGLM2Config, quant_type: str):
    """One-shot dequant-scheme selection when no sweep has recorded one.

    Times each int4 scale scheme (broadcast / grouped / bt_grouped —
    ops/pallas_matmul.py) on the dominant per-layer decode matmul with one
    small kernel compile each, and records the winner as a provisional
    autotune entry for every decode shape — so a round whose full
    autotune sweep never ran still benches with the best measured scheme
    instead of the built-in default.  A prior real sweep (non-probe table
    entries) disables this; `benchmarks/autotune_sweep.py` replaces probe
    entries."""
    if quant_type != "int4g32" or jax.default_backend() != "tpu":
        return
    from functools import partial

    from chatglm_q_tpu.ops import autotune as AT
    from chatglm_q_tpu.ops import pallas_matmul as PM
    from chatglm_q_tpu.ops.quant import int4_storage_k

    from chatglm_q_tpu.ops.quant import LMHEAD_N_MULTIPLE

    H, I = config.hidden_size, config.inner_hidden_size
    Ip = int4_storage_k(I)
    bm = PM._block_m(1)
    if AT.lookup("int4", bm, H, Ip):
        return
    K, N, L = H, Ip, 6  # w_in decode shape; L distinct weights bust caches
    packs = jax.random.bits(jax.random.PRNGKey(13), (L, K // 2, N), jnp.uint8)
    scales = jnp.full((L, K // 32, N), 0.01, jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(12), (1, K), jnp.bfloat16)

    results, impls = {}, {}
    for scheme in ("broadcast", "selscale", "grouped", "bt_grouped"):
        try:
            # the eager dispatch probe compiles the kernel — it must be
            # inside the try: a scheme that fails to Mosaic-compile LOSES,
            # it must not crash the headline run
            impls[scheme] = _probe_impl_call(x, packs[0], scales[0], scheme)[1]
            chain = make_probe_chain(K, L, scheme)
            t = slope_time_auto(
                lambda n: force(chain(x, packs, scales, n)), 2, 6) / L
        except Exception as e:  # a scheme that fails to compile loses
            _log(f"scheme probe: {scheme} failed ({type(e).__name__})")
            continue
        results[scheme] = t
        _log(f"scheme probe: {scheme}/{impls[scheme]} {t*1e6:.0f} us/call")
    if not results:
        return
    # winners are verified vs the jnp oracle at the probe shape before any
    # recording (the autotune-table guard drops unverified bt_grouped
    # entries, and no probe should ever record a wrong-numerics winner)
    from chatglm_q_tpu.ops.quant import unpack_int4_tpu

    want = x.astype(jnp.float32) @ unpack_int4_tpu(
        packs[0], scales[0]).astype(jnp.float32)
    wmax = float(jnp.max(jnp.abs(want))) + 1e-9
    best = None
    for scheme in sorted(results, key=results.get):
        got = _probe_impl_call(x, packs[0], scales[0], scheme)[0]
        rel = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want))) / wmax
        if rel < 2e-2:
            best = scheme
            break
        _log(f"scheme probe: {scheme} FAILED exactness (rel {rel:.3g})")
    if best is None:
        return
    _log(f"scheme probe winner: {best} ({impls[best]})")
    qs, kv2 = config.q_size, 2 * config.kv_size
    Vp = -(-config.vocab_size // LMHEAD_N_MULTIPLE) * LMHEAD_N_MULTIPLE
    for (k, n) in ((H, qs), (H, int4_storage_k(kv2)), (qs, H), (H, Ip),
                   (Ip, H), (H, Vp)):
        # "exact" verified at the probe shape; the per-shape sweep
        # (autotune_sweep.py) re-verifies at every shape it records
        AT.record("int4", bm, int4_storage_k(k), n,
                  {"scheme": best, "impl": impls[best], "probe": True,
                   "exact": True},
                  us_per_call=(results[best] * 1e6
                               if (int4_storage_k(k), n) == (K, N) else None))


def make_prefill(config: ChatGLM2Config, quant_type: str, rt: TpuRuntimeConfig):
    """The headline prefill program (module-level so
    benchmarks/aot_precompile.py compiles the byte-identical module)."""
    return jax.jit(
        lambda p, ids, l, c: M.prefill(p, config, ids, l, c, quant_type,
                                       jnp.bfloat16, rt)
    )


def make_decode_n(config: ChatGLM2Config, quant_type: str, rt: TpuRuntimeConfig):
    """The headline decode program (module-level, see make_prefill)."""
    from functools import partial

    @partial(jax.jit, static_argnames="n", donate_argnums=(2,))
    def decode_n(p, first, cache, n):
        toks, cache = M.multi_step_decode(
            p, config, first, cache, n, None, quant_type, jnp.bfloat16, rt
        )
        # the final cache must be an OUTPUT for the donation to be usable —
        # dropping it made XLA copy the donated KV buffers instead of
        # aliasing them ("donated buffers were not usable", BENCH_r04 tail)
        return toks.sum(), cache  # scalar forces; cache aliases the donation

    return decode_n


def make_params(config: ChatGLM2Config, quant_type: str, seed: int = 0):
    """Generate random params under ONE jit (eager generation lets dozens of
    RNG transients pile up in flight and OOMs this backend)."""
    gen = jax.jit(lambda key: random_quantized_params(key, config, quant_type))
    params = gen(jax.random.PRNGKey(seed))
    jax.block_until_ready(params)
    return params


def make_echo_params(config: ChatGLM2Config, seed: int = 0):
    """int4g32 params at full 6B shapes whose GREEDY continuation echoes the
    last input token — real acceptance for speculative decoding without real
    weights (VERDICT r4 next #7).

    Construction: layer linear scales are ~0, so the residual stream
    preserves the token embedding; lm_head is the int4 quantization of the
    embedding matrix transposed, so logits = h·Eᵀ peak at the current token
    (random 4096-dim embeddings are near-orthogonal: self-dot ≈ H·E[q²] vs
    cross-term std ≈ E[q²]·√H, a ~64× margin).  Same shapes/dtypes/kernel
    dispatch as make_params — per-step cost is data-independent, so the
    speculation speedup measured on this model is the real kernel-level
    speedup at genuine acceptance rates."""
    from chatglm_q_tpu.ops import quant as Q

    params = make_params(config, "int4g32", seed)
    layers = dict(params["layers"])
    for name in ("q_proj", "kv_proj", "o_proj", "w_in_h", "w_in_gate",
                 "w_out"):
        p = dict(layers[name])
        p["weight_scale"] = jnp.full_like(p["weight_scale"], 1e-7)
        layers[name] = p

    @jax.jit
    def build(key):
        E = jax.random.normal(
            key, (config.vocab_size, config.hidden_size), jnp.float32) * 0.02
        return Q.quantize_embedding_int4(E), Q.quantize_linear_int4(E.T)

    emb, lm = build(jax.random.PRNGKey(seed + 101))
    lm = Q.lmhead_pad(lm, "int4g32")
    out = {**params, "layers": layers, "word_embedding": emb, "lm_head": lm}
    return jax.block_until_ready(out)


def weight_bytes_per_token(params) -> int:
    """HBM bytes every decode step must stream: all layer + lm_head weights."""
    total = 0
    for sub in (params["layers"], params["lm_head"], params["final_ln"]):
        total += sum(x.nbytes for x in jax.tree.leaves(sub))
    return total


def probe_backend(retries: int = 3, timeout_s: int = 160) -> str | None:
    """Pre-flight device check in a SUBPROCESS with a hard timeout.

    A wedged tunnel device enumerates fine but hangs every value fetch
    (round-2 failure mode: BENCH_r02 rc=1 / 40-line traceback).  Probing
    in-process can therefore hang unkillably; a subprocess respects
    ``timeout``.  Runs before this process initializes its own backend,
    so the one-TPU-process rule is kept (probe exits before we init).

    Returns None when healthy, else a short error string after retries.
    """
    import subprocess

    err = "unknown"
    for attempt in range(retries):
        try:
            # the INNER `timeout` delivers SIGTERM (never SIGKILL a TPU
            # client mid-compile — a killed client's remote compile jobs
            # wedge the device; CLAUDE.md iron rule); the outer timeout is
            # a backstop 20 s later
            r = subprocess.run(
                ["timeout", str(timeout_s),
                 sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.ones((8, 8)).sum()))"],
                capture_output=True, text=True, timeout=timeout_s + 20,
            )
            if r.returncode == 0:
                return None
            if r.returncode == 124:
                err = f"device probe hung >{timeout_s}s (backend wedged?)"
            else:
                err = (r.stderr.strip().splitlines()
                       or ["rc=%d" % r.returncode])[-1][:300]
        except subprocess.TimeoutExpired:
            err = f"device probe hung >{timeout_s}s (backend wedged?)"
        _log(f"backend probe attempt {attempt + 1}/{retries} failed: {err}")
        if attempt + 1 < retries:
            time.sleep(20)
    return err


def emit_error(reason: str):
    """One machine-readable JSON line on failure — the driver records
    bench stdout verbatim; a traceback instead of JSON makes the round's
    artifact unparseable (VERDICT r2 weak #5)."""
    print(json.dumps({
        "metric": "ChatGLM2-6B int4g32 decode tokens/s/chip (batch=1, in-graph loop)",
        "value": 0.0,
        "unit": "tok/s",
        "vs_baseline": 0.0,
        "error": reason[:500],
    }))


def main():
    quant_type = "int4g32"
    batch = 1
    prefill_len = 128
    cache_len = 1024

    config = ChatGLM2Config()  # full 6B hyperparams
    # XLA attention for the headline run: at batch-1/1k-context the KV read
    # (~60 MB vs ~4 GB of weights per token) is off the critical path, and
    # the masked-softmax path compiles in seconds (the flash kernels are
    # benchmarked separately in benchmarks/full_bench.py --flash)
    rt = TpuRuntimeConfig(use_flash_attention=False)
    # generate inside ONE jit: eagerly dispatching ~60 RNG ops lets their
    # transients pile up in flight and OOMs this backend; a single program
    # lets XLA schedule and reuse the temp buffers
    ensure_scheme_probe(config, quant_type)
    params = make_params(config, quant_type)
    wbytes = weight_bytes_per_token(params)
    if os.environ.get("CHATGLM_Q_TPU_TILED") == "1":
        # opt-in contiguous serving layout (models.tile_layer_weights):
        # same bytes, same numerics, contiguous kernel block DMAs
        params = M.tile_layer_weights(params, quant_type)
        params = jax.block_until_ready(params)
        _log("tiled serving layout applied")

    cache = M.init_kv_cache(config, batch, cache_len, jnp.bfloat16)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (batch, prefill_len), 0, 60000)
    lengths = jnp.full((batch,), prefill_len, jnp.int32)

    _log("params built")
    prefill = make_prefill(config, quant_type, rt)
    logits, cache0 = prefill(params, prompt, lengths, cache)
    first = jnp.argmax(logits, -1).astype(jnp.int32)
    force(first)
    _log("prefill compiled+run")

    decode_n = make_decode_n(config, quant_type, rt)

    def run_n(n):
        c = jax.tree.map(lambda x: x.copy(), cache0)
        s, _ = decode_n(params, first, c, n)
        return force(s)

    per_tok = slope_time(run_n, 8, 40)
    _log(f"decode timed: {per_tok*1e3:.2f} ms/tok")
    toks_per_s = 1.0 / per_tok
    sol = HBM_GBPS * 1e9 / wbytes

    print(json.dumps({
        "metric": "ChatGLM2-6B int4g32 decode tokens/s/chip (batch=1, in-graph loop)",
        "value": round(toks_per_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(toks_per_s / sol, 4),
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH_SKIP_PROBE") != "1":
        _err = probe_backend()
        if _err is not None:
            emit_error(f"backend init failed: {_err}")
            # NONZERO rc: the stdout JSON keeps driver artifacts
            # machine-readable, while resumable runners (r2_measure.sh
            # .done markers) must NOT mark a failed headline as done
            sys.exit(1)
    try:
        main()
    except Exception as e:  # never leak a traceback to stdout
        import traceback

        traceback.print_exc(file=sys.stderr)
        emit_error(f"{type(e).__name__}: {e}")
        sys.exit(1)
