"""Batched-decode roofline: attribute the b8-b64 decode step cost
(VERDICT r4 next #1).

Round 4 built the attribution kit for b1 (kernel_microbench + grid3d) and
proved decode sits at the exact-semantics floor.  The SAME question at
b>=8 was open: int4 b8 ran at ~0.53 of its aggregate speed-of-light and
b32 at ~0.29, and nothing said where the extra per-step milliseconds go.

This kit times every component of the production decode step, per batch,
with the EXACT kernels the model dispatches (layer-indexed stacked-weight
Pallas kernels via ops.linear dispatch, ragged flash decode attention):

  linears:    q/kv/o/w_in_h/w_in_gate/w_out chains over the stacked (L,..)
              weights with a cycling layer index (cache-busting, identical
              DMA pattern to the serving scan), x28 layers per step
  lm_head:    the (b,4096)@(4096,65536) vocab projection
  attention:  flash_attention_decode at (b, G, Hg, D) vs the (b, G, T, D)
              cache at the measured lengths, x28
  sampling:   greedy argmax over (b, 65024)
  embedding:  per-token int4 nibble-unpack lookup
  step:       the full multi_step_decode scan (the number to attribute)

and prints per-batch attribution lines plus the HBM floors (weight stream
+ KV read) so the residual is visible.  One JSON line per batch to stdout;
details to stderr.

Usage: python benchmarks/batch_roofline.py [--batches 8,16,32,64]
       [--cache-len 1024] [--start-len 64] [--attn flash|xla]
"""
import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np
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
from chatglm_q_tpu.ops import pallas_matmul as PM
from chatglm_q_tpu.ops import pallas_attention as PA
from chatglm_q_tpu.utils.timing import force, slope_time, slope_time_auto

T0 = time.perf_counter()


def log(msg):
    print(f"[broofline {time.perf_counter()-T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


# ---------------------------------------------------------------------------
# component chains (traced rep counts: one compile per shape)
# ---------------------------------------------------------------------------

def linear_chain_fn(b: int, K: int, N: int):
    """Chain of layer-indexed int4 matmuls over stacked (L,..) weights —
    byte-identical dispatch to the serving scan's quant_linear calls."""

    @jax.jit
    def run(x, wstack, sstack, reps):
        L = wstack.shape[0]

        def outer(r, c):
            def body(c, i):
                y = PM.int4_matmul_auto_idx(c, wstack, sstack, i)
                if y is None:
                    raise RuntimeError("indexed kernel refused the shape")
                # feed output back at width K (data dependence)
                if y.shape[1] >= K:
                    c2 = y[:, :K]
                else:
                    rep = -(-K // y.shape[1])
                    c2 = jnp.concatenate([y] * rep, axis=1)[:, :K]
                return c2.astype(c.dtype), None

            c, _ = jax.lax.scan(body, c, jnp.arange(L))
            return c

        return jax.lax.fori_loop(0, reps, outer, x).sum()

    return run


def lmhead_chain_fn(b: int, K: int):
    @jax.jit
    def run(x, pack, scale, reps):
        def outer(r, c):
            y = PM.int4_matmul_auto(c, pack, scale)
            return y[:, :K].astype(c.dtype)

        return jax.lax.fori_loop(0, reps, outer, x).sum()

    return run


def attention_chain_fn(sm: float, variant: str):
    @jax.jit
    def run(q, k, v, lengths, reps):
        def outer(r, c):
            if variant == "flash":
                o = PA.flash_attention_decode(c, k, v, lengths, sm)
            else:  # xla masked softmax over the full cache
                T = k.shape[2]
                tk = jnp.arange(T)[None, :]
                bias = jnp.where(tk <= lengths[:, None], 0.0, -1e10)
                # (B,G,H,D)x(B,G,T,D) -> (B,G,H,T)
                s = jnp.einsum("bghd,bgtd->bght", c.astype(jnp.float32),
                               k.astype(jnp.float32)) * sm
                s = s + bias[:, None, None, :]
                p = jax.nn.softmax(s, axis=-1)
                o = jnp.einsum("bght,bgtd->bghd", p,
                               v.astype(jnp.float32)).astype(c.dtype)
            return o

        return jax.lax.fori_loop(0, reps, outer, q).sum()

    return run


def sampling_chain_fn(V: int):
    @jax.jit
    def run(logits, reps):
        def outer(r, c):
            ids = jnp.argmax(c, axis=-1)
            # dependence: nudge one column by the sampled id
            return c.at[:, 0].add(ids.astype(c.dtype) * 1e-30)

        return jax.lax.fori_loop(0, reps, outer, logits).sum()

    return run


def embedding_chain_fn(params_emb, dtype):
    from chatglm_q_tpu.ops.quant import embedding_lookup_int4

    @jax.jit
    def run(ids, reps):
        def outer(r, ids):
            h = embedding_lookup_int4(params_emb, ids, dtype)
            return (jnp.argmax(h[:, :128], axis=-1) + ids) % 1000

        return jax.lax.fori_loop(0, reps, outer, ids).sum()

    return run


def time_chain(run, *args, label=""):
    t = slope_time_auto(lambda n: force(run(*args, n)), 2, 6)
    log(f"  {label}: {t*1e6:.1f} us/iter")
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32,64")
    ap.add_argument("--cache-len", type=int, default=1024)
    ap.add_argument("--start-len", type=int, default=64)
    ap.add_argument("--attn", default="flash", choices=["flash", "xla"])
    ap.add_argument("--quant", default="int4g32")
    args = ap.parse_args()

    cfg = ChatGLM2Config()
    qt = args.quant
    rt = TpuRuntimeConfig(use_flash_attention=(args.attn == "flash"))
    L = cfg.num_layers
    G, D = cfg.num_multi_query_groups, cfg.head_hidden_size
    Hg = cfg.num_attention_heads // G
    sm = 1.0 / np.sqrt(D)

    log("building params")
    params = make_params(cfg, qt)
    wbytes = weight_bytes_per_token(params)
    lay = params["layers"]

    from chatglm_q_tpu.ops.quant import int4_storage_k

    H, I = cfg.hidden_size, cfg.inner_hidden_size
    Ip = int4_storage_k(I)
    shapes = {
        "q_proj": (H, cfg.q_size, 1),
        "kv_proj": (H, int4_storage_k(2 * cfg.kv_size), 1),
        "o_proj": (cfg.q_size, H, 1),
        "w_in_h": (H, Ip, 1),
        "w_in_gate": (H, Ip, 1),
        "w_out": (Ip, H, 1),
    }

    for b in [int(x) for x in args.batches.split(",")]:
        log(f"=== batch {b} ===")
        res = {"batch": b, "attn": args.attn, "cache_len": args.cache_len,
               "start_len": args.start_len, "quant": qt}

        # --- full step (the target) ---
        from bench import make_decode_n

        cache = M.init_kv_cache(cfg, b, args.cache_len, jnp.bfloat16)
        cache = cache.replace(
            lengths=jnp.full((b,), args.start_len, jnp.int32))
        first = jnp.zeros((b,), jnp.int32)
        decode_n = make_decode_n(cfg, qt, rt)

        def run_step(n):
            c = jax.tree.map(lambda x: x.copy(), cache)
            s, _ = decode_n(params, first, c, n)
            return force(s)

        t_step = slope_time(run_step, 8, 40)
        res["step_ms"] = t_step * 1e3
        log(f"  full step: {t_step*1e3:.2f} ms  "
            f"(agg {b/t_step:.0f} tok/s)")

        # --- per-linear chains ---
        comp = {}
        key = jax.random.PRNGKey(0)
        for name, (K, N, count) in shapes.items():
            x = jax.random.normal(key, (b, K), jnp.bfloat16)
            run = linear_chain_fn(b, K, N)
            t = time_chain(run, x, lay[name]["weight"],
                           lay[name]["weight_scale"], label=f"{name} (xL)")
            comp[name] = t  # already a whole-L scan per iter
        x = jax.random.normal(key, (b, H), jnp.bfloat16)
        lm = params["lm_head"]
        t = time_chain(lmhead_chain_fn(b, H), x, lm["weight"],
                       lm["weight_scale"], label="lm_head")
        comp["lm_head"] = t

        # --- attention ---
        lengths = jnp.full((b,), args.start_len + 20, jnp.int32)
        q = jax.random.normal(key, (b, G, Hg, D), jnp.bfloat16)
        kc = jax.random.normal(key, (b, G, args.cache_len, D), jnp.bfloat16)
        vc = jax.random.normal(key, (b, G, args.cache_len, D), jnp.bfloat16)
        t = time_chain(attention_chain_fn(sm, args.attn), q, kc, vc, lengths,
                       label=f"attn/{args.attn} (x1)")
        comp["attention"] = t * L

        # --- sampling + embedding ---
        logits = jax.random.normal(key, (b, cfg.vocab_size), jnp.float32)
        comp["sampling"] = time_chain(sampling_chain_fn(cfg.vocab_size),
                                      logits, label="sampling")
        ids = jnp.arange(b, dtype=jnp.int32) * 7 % 60000
        comp["embedding"] = time_chain(
            embedding_chain_fn(params["word_embedding"], jnp.bfloat16), ids,
            label="embedding")

        total = sum(comp.values())
        res["components_ms"] = {k: v * 1e3 for k, v in comp.items()}
        res["sum_ms"] = total * 1e3
        res["attributed_frac"] = total / t_step

        # --- floors ---
        kv_bytes = b * (args.start_len + 20) * G * D * 2 * 2 * L
        res["floor_weights_ms"] = wbytes / (HBM_GBPS * 1e9) * 1e3
        res["floor_kv_ms"] = kv_bytes / (HBM_GBPS * 1e9) * 1e3
        log(f"  sum {total*1e3:.2f} ms vs step {t_step*1e3:.2f} ms "
            f"({100*total/t_step:.0f}% attributed); floors: weights "
            f"{res['floor_weights_ms']:.2f} + kv {res['floor_kv_ms']:.2f} ms")
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
