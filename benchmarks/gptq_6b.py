"""GPTQ at ChatGLM2-6B shapes on real hardware — memory/runtime/numerics
proof (the reference quantizes 13696-wide layers with a 13696² Hessian
Cholesky, int4/quantizer.py:118-196; grid parity is tested at toy K in
tests/test_gptq.py — this script proves the engine at the real dims).

Stage A: per-linear-shape GPTQ (Hessian from random activations → damped
Cholesky → block sweep → packed params) for every distinct 6B layer shape,
timing each stage.
Stage B (--pipeline): the full layer-pipelined calibration driver
(quant/calibrate.py) on a reduced-depth model at full 6B widths, ending in
check_quant_params + a finite forward.

Usage: python benchmarks/gptq_6b.py [--quant int4g32|int8] [--pipeline]
       [--layers 2] [--shapes qkv,o,w_in,w_out,lm_head]
"""
import argparse
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

from chatglm_q_tpu.quant import gptq as G

parser = argparse.ArgumentParser()
parser.add_argument("--quant", default="int4g32", choices=["int4g32", "int8"])
parser.add_argument("--pipeline", action="store_true")
parser.add_argument("--layers", type=int, default=2)
parser.add_argument("--shapes", default="qkv,o,w_in,w_out,lm_head")
args = parser.parse_args()

# (K, N) of every distinct ChatGLM2-6B linear (our K-major layout)
SHAPES = {
    "qkv": (4096, 4608),      # fused q|kv out width
    "o": (4096, 4096),
    "w_in": (4096, 13696),
    "w_out": (13696, 4096),   # the 13696² Hessian
    "lm_head": (4096, 65024),
}


def fetch(x):
    return float(jnp.asarray(x).ravel()[0])


def stage_a(name, K, N):
    t0 = time.perf_counter()
    # Hessian from random activations in chunks (as calibration would)
    H, n = G.init_hessian(K)
    for i in range(4):
        x = jax.random.normal(jax.random.PRNGKey(i), (2048, K), jnp.float32)
        H, n = G.accumulate_hessian(H, n, x)
    fetch(H)
    t_hess = time.perf_counter() - t0

    w = jax.random.normal(jax.random.PRNGKey(99), (K, N), jnp.float32) * 0.02
    t0 = time.perf_counter()
    if args.quant == "int4g32":
        p = G.gptq_linear_params_int4(w, H)
    else:
        p = G.gptq_linear_params_int8(w, H)
    fetch(p["weight_scale"])
    t_quant = time.perf_counter() - t0

    # numeric validity: finite scales, non-degenerate grid
    assert bool(jnp.isfinite(p["weight_scale"].astype(jnp.float32)).all()), name
    wq = p["weight"]
    assert int(jnp.asarray((wq != 0).sum())) > 0, name
    print(json.dumps({
        "stage": "A", "shape": name, "K": K, "N": N, "quant": args.quant,
        "hessian_s": round(t_hess, 2), "gptq_s": round(t_quant, 2),
    }), flush=True)
    return t_quant


def stage_b():
    from chatglm_q_tpu.config import ChatGLM2Config
    from chatglm_q_tpu.models import chatglm2 as M
    from chatglm_q_tpu.quant.calibrate import gptq_quantize_model
    from chatglm_q_tpu.utils.debug import check_quant_params

    cfg = ChatGLM2Config(num_layers=args.layers, max_sequence_length=256,
                         vocab_size=65024)
    params = M.init_params(jax.random.PRNGKey(0), cfg, "none", jnp.float32)
    batches = [
        (jax.random.randint(jax.random.PRNGKey(10 + i), (2, 128), 0, 65024), None)
        for i in range(2)
    ]
    t0 = time.perf_counter()
    qparams = gptq_quantize_model(params, cfg, batches, args.quant,
                                  print_loss=True)
    problems = check_quant_params(qparams, cfg, args.quant)
    assert not problems, problems
    _, logits = M.forward(qparams, cfg, batches[0][0][:1, :32],
                          quant_type=args.quant)
    assert bool(jnp.isfinite(logits).all())
    t = time.perf_counter() - t0
    print(json.dumps({
        "stage": "B", "layers": args.layers, "quant": args.quant,
        "widths": "6B", "pipeline_s": round(t, 1),
        "per_layer_s": round(t / max(args.layers, 1), 1),
    }), flush=True)


if __name__ == "__main__":
    total = 0.0
    for name in args.shapes.split(","):
        K, N = SHAPES[name]
        total += stage_a(name, K, N)
    # 28 layers × (qkv + o + 2·w_in + w_out) + lm_head
    print(json.dumps({"stage": "A-total", "sum_s": round(total, 1)}), flush=True)
    if args.pipeline:
        stage_b()
