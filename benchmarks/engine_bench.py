"""End-to-end continuous-batching engine throughput on the real chip.

Submits many synthetic requests (token ids; tokenizer-independent), runs
the engine to completion, reports aggregate generated tokens/s including
prefill admission, chunked decode, retirement and Python scheduling.
"""
import argparse
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_params, make_echo_params
from chatglm_q_tpu.config import ChatGLM2Config, GLMLoadConfig, TpuRuntimeConfig
from chatglm_q_tpu.serving.engine import ServingEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--decode-chunk", type=int, default=16)
    ap.add_argument("--max-seq", type=int, default=512)
    ap.add_argument("--engine", choices=["dense", "paged"], default="dense")
    ap.add_argument("--prefill-chunk", type=int, default=0,
                    help="chunked admission (0 = whole-prompt)")
    ap.add_argument("--prefix-cache", action="store_true")
    ap.add_argument("--shared-prefix", type=int, default=0,
                    help="tokens of identical prompt prefix across requests")
    ap.add_argument("--pages", type=int, default=0,
                    help="paged pool size (0 = auto)")
    ap.add_argument("--page-size", type=int, default=256)
    ap.add_argument("--flash", action="store_true")
    ap.add_argument("--speculative-k", type=int, default=0,
                    help="in-graph prompt-lookup speculation (paged engine, "
                         "greedy; 7 keeps the verify tile 8-row aligned)")
    ap.add_argument("--lookahead", action="store_true",
                    help="dense engine: dispatch chunk N+1 on device tokens "
                         "before fetching chunk N (hides host+RTT)")
    ap.add_argument("--echo-model", action="store_true",
                    help="weights whose greedy continuation echoes the last "
                         "token (bench.make_echo_params) — real speculative "
                         "acceptance at 6B-shape compute")
    ap.add_argument("--full-batch", action="store_true",
                    help="paged engine: decode all slots (no compact bucket)")
    ap.add_argument("--dyn-int8", action="store_true",
                    help="dynamic activation quantization (int8 AND int4 "
                         "layers — serving-throughput numerics mode)")
    ap.add_argument("--sampled", type=float, default=0.0,
                    help="submit with this temperature instead of greedy "
                         "(with --speculative-k: exact rejection-sampling "
                         "speculation, speculative_sampled=True)")
    args = ap.parse_args()

    mc = ChatGLM2Config()
    cfg = GLMLoadConfig(model_config=mc, quant_type="int4g32", torch_dtype="bfloat16")
    params = (make_echo_params(mc) if args.echo_model
              else make_params(mc, "int4g32"))
    rt = TpuRuntimeConfig(use_flash_attention=args.flash or False,
                          dynamic_int8=args.dyn_int8)

    kw = dict(max_batch=args.max_batch, max_seq_len=args.max_seq,
              decode_chunk=args.decode_chunk, rt=rt,
              prefill_chunk_size=args.prefill_chunk or None)
    if args.engine == "paged":
        from chatglm_q_tpu.serving.paged_engine import PagedServingEngine

        pages = args.pages or (
            args.max_batch * (-(-args.max_seq // args.page_size)) + 2)
        eng = PagedServingEngine(cfg, params, tokenizer=None,
                                 num_pages=pages, page_size=args.page_size,
                                 prefix_cache=args.prefix_cache,
                                 speculative_k=args.speculative_k,
                                 speculative_sampled=args.sampled > 0,
                                 full_batch_decode=args.full_batch or None,
                                 **kw)
    else:
        eng = ServingEngine(cfg, params, tokenizer=None,
                            lookahead=args.lookahead, **kw)
    rng = np.random.default_rng(0)
    shared = rng.integers(0, 60000, args.shared_prefix).tolist()
    for i in range(args.requests):
        tail = rng.integers(0, 60000, max(args.prompt_len - args.shared_prefix, 1)).tolist()
        eng.submit(shared + tail, max_new_tokens=args.new_tokens,
                   temperature=args.sampled)

    # warmup: one step compiles prefill bucket + decode chunk
    t0 = time.perf_counter()
    eng.step()
    warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    while eng.has_work:
        eng.step()
    wall = time.perf_counter() - t0
    gen = sum(len(r.generated) for r in eng.finished)
    print(json.dumps({
        "bench": "engine", "quant": "int4g32", "engine": args.engine,
        "requests": args.requests, "max_batch": args.max_batch,
        "prompt_len": args.prompt_len, "new_tokens": args.new_tokens,
        "prefill_chunk": args.prefill_chunk or None,
        "prefix_cache": args.prefix_cache,
        "shared_prefix": args.shared_prefix,
        "temperature": args.sampled,
        "lookahead": args.lookahead,
        "echo_model": args.echo_model,
        "speculative_k": args.speculative_k,
        "full_batch": bool(getattr(eng, "_full_batch_decode", False)),
        "dyn": args.dyn_int8,
        "generated_tokens": gen,
        "wall_s": round(wall, 2), "warmup_s": round(warm, 1),
        "agg_tokens_per_sec": round(gen / wall, 1),
        **({"prefix_hits": eng.stats.get("prefix_hits", 0),
            "spec_accepted": eng.stats.get("spec_accepted", 0),
            "spec_steps": eng.stats.get("spec_steps", 0)}
           if args.engine == "paged" else {}),
    }))


if __name__ == "__main__":
    main()
