"""Capture a jax.profiler trace of the 6B decode step and attribute time.

VERDICT round-1 asked for measured DMA/VPU overlap instead of inference
from arithmetic ("capture a jax.profiler trace to verify DMA/VPU overlap").
TensorBoard is not reachable through this deployment's tunnel, so the
script parses the perfetto trace itself and prints:

* top ops by total duration (kernel-level attribution: which fused
  dequant-matmuls, attention, sampling ops dominate a decode step);
* per-track busy fractions over the traced window — if a DMA track and a
  TensorCore track are both near-busy, transfer/compute overlap is real;
  a near-idle compute track between kernel bursts means serial dequant.

Usage:  python benchmarks/profile_decode.py [--steps 16] [--quant int4g32]
Writes the raw trace under benchmarks/logs/trace/ for offline analysis.
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_params, ensure_scheme_probe  # noqa: E402
from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig  # noqa: E402
from chatglm_q_tpu.models import chatglm2 as M  # noqa: E402
from chatglm_q_tpu.utils.timing import force  # noqa: E402


def capture(trace_dir: str, steps: int, quant_type: str, batch: int,
            flash: bool = False):
    config = ChatGLM2Config()
    rt = TpuRuntimeConfig(use_flash_attention=flash)
    ensure_scheme_probe(config, quant_type)
    params = make_params(config, quant_type)
    cache = M.init_kv_cache(config, batch, 1024, jnp.bfloat16)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (batch, 128), 0, 60000)
    lengths = jnp.full((batch,), 128, jnp.int32)
    logits, cache = jax.jit(
        lambda p, i, l, c: M.prefill(p, config, i, l, c, quant_type,
                                     jnp.bfloat16, rt)
    )(params, prompt, lengths, cache)
    first = jnp.argmax(logits, -1).astype(jnp.int32)

    @partial(jax.jit, static_argnames="n", donate_argnums=(2,))
    def decode_n(p, tok, cache, n):
        toks, cache = M.multi_step_decode(p, config, tok, cache, n, None,
                                          quant_type, jnp.bfloat16, rt)
        # cache must be an output for the donation to alias (see bench.py)
        return toks.sum(), cache

    force(decode_n(params, first, jax.tree.map(lambda x: x.copy(), cache),
                   steps)[0])  # compile + warm OUTSIDE the trace
    print("warm; tracing", flush=True)
    jax.profiler.start_trace(trace_dir, create_perfetto_trace=True)
    force(decode_n(params, first, cache, steps)[0])
    jax.profiler.stop_trace()
    print("trace captured", flush=True)


def analyze(trace_dir: str, top: int = 25):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        print("no perfetto trace found under", trace_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # pid/tid → human-readable track names from metadata events
    procs, threads = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            procs[e["pid"]] = e["args"].get("name", str(e["pid"]))
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    by_op = collections.Counter()
    track_ivals = collections.defaultdict(list)
    n_events = 0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e["name"]
        if name.startswith("$"):  # host python stack frames, not device work
            continue
        n_events += 1
        key = (e["pid"], e.get("tid"))
        track = f"{procs.get(e['pid'], e['pid'])}/{threads.get(key, key[1])}"
        by_op[name] += e["dur"]  # microseconds
        track_ivals[track].append((e["ts"], e["ts"] + e["dur"]))

    print(f"\n== {n_events} events, top {top} ops by total us:")
    for name, dur in by_op.most_common(top):
        print(f"{dur:>10.0f} us  {name[:110]}")
    print("\n== per-track busy fraction (interval union; overlap check):")
    rows = []
    for track, ivals in track_ivals.items():
        ivals.sort()
        busy, lo, hi = 0, ivals[0][0], ivals[0][1]
        cs, ce = ivals[0]
        for t0, t1 in ivals[1:]:
            hi = max(hi, t1)
            if t0 > ce:
                busy += ce - cs
                cs, ce = t0, t1
            else:
                ce = max(ce, t1)
        busy += ce - cs
        rows.append((busy, max(hi - lo, 1), track))
    for busy, span, track in sorted(rows, reverse=True)[:20]:
        print(f"{busy:>10.0f} us busy / {span:>10.0f} us span "
              f"({100.0 * busy / span:5.1f}%)  {track[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--quant", default="int4g32")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--trace-dir",
                    default=os.path.join(os.path.dirname(__file__),
                                         "logs", "trace"))
    ap.add_argument("--flash", action="store_true",
                    help="flash decode attention (match full_bench --flash)")
    ap.add_argument("--analyze-only", action="store_true",
                    help="parse an existing trace without touching the TPU")
    args = ap.parse_args()
    os.makedirs(args.trace_dir, exist_ok=True)
    if not args.analyze_only:
        capture(args.trace_dir, args.steps, args.quant, args.batch, args.flash)
    analyze(args.trace_dir)


if __name__ == "__main__":
    main()
