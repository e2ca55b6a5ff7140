"""Extended benchmark suite (the headline driver metric stays in /bench.py).

Measures, on the real chip, with slope-timing (utils/timing.py):
  * batch-1 decode tok/s for bf16 / int8 / int4g32 (BASELINE configs 2-3)
  * batched decode throughput (tokens/s aggregate) at several batch sizes
  * prefill throughput (tokens/s) at a given prompt length

Usage: python benchmarks/full_bench.py [--quant int4g32] [--batches 1,8,32]
Writes JSONL records to stdout.
"""
import argparse
import json
import os
import sys
import time
from functools import partial

import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_params, weight_bytes_per_token, HBM_GBPS
from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.utils.timing import force, slope_time


def make_decode_n(config, quant_type, rt):
    """The decode timing program (module-level so
    benchmarks/aot_precompile.py can pre-populate its cache entry)."""

    @partial(jax.jit, static_argnames="n", donate_argnums=(2,))
    def decode_n(p, first, cache, n):
        toks, cache = M.multi_step_decode(
            p, config, first, cache, n, None, quant_type, jnp.bfloat16, rt
        )
        # returning the cache lets XLA alias the donated KV buffers
        # (same pattern as bench.py make_decode_n)
        return toks.sum(), cache

    return decode_n


def bench_decode(config, params, quant_type, batch, cache_len, rt,
                 start_len=64, kv_dtype=jnp.bfloat16):
    cache = M.init_kv_cache(config, batch, cache_len, kv_dtype)
    cache = cache.replace(lengths=jnp.full((batch,), start_len, jnp.int32))
    first = jnp.zeros((batch,), jnp.int32)
    decode_n = make_decode_n(config, quant_type, rt)

    def run_n(n):
        # decode_n donates the cache (bench.py) — feed it a fresh copy
        c = jax.tree.map(lambda x: x.copy(), cache)
        s, _ = decode_n(params, first, c, n)
        return force(s)

    per_step = slope_time(run_n, 8, 40)
    return batch / per_step  # aggregate tokens/s


def bench_decode_paged(config, params, quant_type, batch, cache_len, rt,
                       start_len=64, page_size=256, kv_dtype=jnp.bfloat16):
    """Paged-pool decode: same shapes as bench_decode but KV behind a
    shuffled page table (worst-case page scatter)."""
    import numpy as np
    from chatglm_q_tpu.models import paged_kv as PK
    from chatglm_q_tpu.ops.sampling import greedy_sampling

    mp = cache_len // page_size
    num_pages = batch * mp + 2
    cache = PK.init_paged_kv_cache(config, batch, num_pages, cache_len,
                                   page_size, kv_dtype)
    perm = np.random.RandomState(0).permutation(num_pages - 1)[: batch * mp]
    cache = cache.replace(
        page_table=jnp.asarray(perm.reshape(batch, mp) + 1, jnp.int32),
        lengths=jnp.full((batch,), start_len, jnp.int32),
    )
    first = jnp.zeros((batch,), jnp.int32)

    @partial(jax.jit, static_argnames="n")
    def decode_n(p, first, cache, n):
        def step(carry, _):
            tok, cache = carry
            logits, cache = PK.decode_step_paged(
                p, config, tok, cache, quant_type, jnp.bfloat16, rt)
            return (greedy_sampling(logits).astype(jnp.int32), cache), None

        (tok, _), _ = jax.lax.scan(step, (first, cache), None, length=n)
        return tok.sum()

    per_step = slope_time(lambda n: force(decode_n(params, first, cache, n)), 8, 40)
    return batch / per_step


def bench_prefill(config, params, quant_type, batch, seq, rt):
    prompt = jnp.zeros((batch, seq), jnp.int32)
    lengths = jnp.full((batch,), seq, jnp.int32)

    @partial(jax.jit, static_argnames="reps")
    def prefill_n(p, ids, l, reps):
        def body(acc, _):
            # make the input depend on the carry so XLA cannot CSE the scan
            # body into a single prefill (observed: identical bodies fold)
            ids2 = ids + (acc.astype(jnp.int32) & 1)
            cache = M.init_kv_cache(config, batch, seq, jnp.bfloat16)
            logits, _ = M.prefill(p, config, ids2, l, cache, quant_type, jnp.bfloat16, rt)
            return acc + logits.sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return acc

    per = slope_time(lambda n: force(prefill_n(params, prompt, lengths, n)), 1, 4)
    return batch * seq / per  # prompt tokens/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quants", default="int4g32,int8,none")
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--cache-len", type=int, default=1024)
    ap.add_argument("--prefill-len", type=int, default=512)
    ap.add_argument("--flash", action="store_true", help="enable flash-attention kernels")
    ap.add_argument("--dyn-int8", action="store_true",
                    help="dynamic activation quantization for int8 layers")
    ap.add_argument("--attn-v2", action="store_true",
                    help="O(length) manual-DMA decode attention kernel")
    ap.add_argument("--no-idx-cache", action="store_true",
                    help="A/B: disable the layer-indexed cache kernels")
    ap.add_argument("--attn-block-k", type=int, default=0,
                    help="decode attention KV block rows (0 = default 512); "
                         "long contexts are grid-step-overhead bound, bigger "
                         "blocks cut the step count")
    ap.add_argument("--paged", action="store_true",
                    help="decode over a paged pool (shuffled page table)")
    ap.add_argument("--start-len", type=int, default=64,
                    help="valid cache length during decode (attention cost)")
    ap.add_argument("--kv-dtype", default="bf16", choices=["bf16", "fp8"],
                    help="KV cache storage dtype (fp8 = float8_e4m3fn)")
    ap.add_argument("--skip-prefill", action="store_true")
    args = ap.parse_args()

    config = ChatGLM2Config()
    rt = TpuRuntimeConfig(use_flash_attention=args.flash or None,
                          dynamic_int8=args.dyn_int8,
                          decode_attn_v2=args.attn_v2,
                          no_idx_cache=args.no_idx_cache)
    if args.attn_block_k:
        import dataclasses
        rt = dataclasses.replace(rt, attn_block_k=args.attn_block_k)
    kv_dtype = jnp.bfloat16 if args.kv_dtype == "bf16" else jnp.float8_e4m3fn

    for quant in args.quants.split(","):
        params = make_params(config, quant)
        wbytes = weight_bytes_per_token(params)
        sol = HBM_GBPS * 1e9 / wbytes
        for b in map(int, args.batches.split(",")):
            t0 = time.perf_counter()
            if args.paged:
                tps = bench_decode_paged(config, params, quant, b,
                                         args.cache_len, rt, args.start_len,
                                         kv_dtype=kv_dtype)
            else:
                tps = bench_decode(config, params, quant, b, args.cache_len,
                                   rt, args.start_len, kv_dtype=kv_dtype)
            print(json.dumps({
                "bench": "decode", "quant": quant, "batch": b,
                "cache_len": args.cache_len, "start_len": args.start_len,
                "paged": args.paged, "attn_v2": args.attn_v2,
                "no_idx_cache": args.no_idx_cache,
                "attn_block_k": args.attn_block_k or 512,
                "kv_dtype": args.kv_dtype,
                "tokens_per_sec": round(tps, 2),
                "per_seq_tok_s": round(tps / b, 2),
                "sol_frac_batch1_equiv": round(tps / b / sol, 4),
                "wall_s": round(time.perf_counter() - t0, 1),
            }), flush=True)
        if args.skip_prefill:
            del params
            continue
        t0 = time.perf_counter()
        ptps = bench_prefill(config, params, quant, 1, args.prefill_len, rt)
        print(json.dumps({
            "bench": "prefill", "quant": quant, "batch": 1,
            "seq": args.prefill_len,
            "prompt_tokens_per_sec": round(ptps, 1),
            "wall_s": round(time.perf_counter() - t0, 1),
        }), flush=True)
        del params


if __name__ == "__main__":
    main()
