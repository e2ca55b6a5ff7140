"""Continuous-batching engine tour: dense / paged / prefix-cache /
chunked-admission / speculative serving on one model.

Runs with a real checkpoint (--model path) or, by default, random weights
at a small config (works on CPU) — outputs are then meaningless tokens,
but every scheduling feature exercises for real.

  python examples/engine_demo.py                  # random weights, CPU ok
  python examples/engine_demo.py --model ./chatglm2-6b-int4g32
"""
import argparse
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--model", default=None, help="checkpoint dir (else random)")
parser.add_argument("--requests", type=int, default=6)
parser.add_argument("--new-tokens", type=int, default=32)
parser.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (before any jax use)")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from chatglm_q_tpu.config import ChatGLM2Config, GLMLoadConfig, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.serving import ServingEngine, PagedServingEngine

if args.model:
    from chatglm_q_tpu.loader import load_model_and_tokenizer

    config, params, tokenizer = load_model_and_tokenizer(args.model)
    prompts = [f"[Round 1]\n\n问：讲个{i}句话的故事\n\n答：" for i in range(args.requests)]
else:
    mc = ChatGLM2Config(hidden_size=256, inner_hidden_size=512,
                        head_hidden_size=32, num_multi_query_groups=2,
                        num_attention_heads=8, num_layers=4, vocab_size=512,
                        max_sequence_length=256)
    config = GLMLoadConfig(model_config=mc, torch_dtype="float32",
                           quant_type="int4g32")
    params = M.init_params(jax.random.PRNGKey(0), mc, "int4g32")
    tokenizer = None
    rng = np.random.RandomState(0)
    shared = rng.randint(3, 500, size=48).tolist()  # shared "system prompt"
    prompts = [shared + rng.randint(3, 500, size=24 + i).tolist()
               for i in range(args.requests)]

rt = TpuRuntimeConfig()
common = dict(max_batch=4, decode_chunk=8, rt=rt)


def run(name, eng):
    t0 = time.perf_counter()
    for p in prompts:
        if isinstance(p, str):
            eng.submit_text(p, max_new_tokens=args.new_tokens, temperature=0.0)
        else:
            eng.submit(p, max_new_tokens=args.new_tokens, temperature=0.0)
    n_stream = 0
    while eng.has_work:
        for rid, toks in eng.step():
            n_stream += len(toks)  # live streaming hook point
    dt = time.perf_counter() - t0
    gen = sum(len(r.generated) for r in eng.finished)
    extra = {k: v for k, v in eng.stats.items()
             if k.startswith(("prefix", "spec")) and v}
    print(f"{name:28s} {gen:4d} tokens in {dt:6.1f}s  "
          f"({gen/dt:7.1f} tok/s) {extra}")
    return [r.generated for r in sorted(eng.finished, key=lambda r: r.req_id)]


base = run("dense", ServingEngine(config, params, tokenizer, **common))
outs = {}
outs["chunked admission"] = run(
    "dense + chunked admission",
    ServingEngine(config, params, tokenizer, prefill_chunk_size=64, **common))
outs["paged"] = run(
    "paged (64-token pages)",
    PagedServingEngine(config, params, tokenizer, num_pages=32, page_size=64,
                       **common))
outs["paged + prefix cache"] = run(
    "paged + prefix cache",
    PagedServingEngine(config, params, tokenizer, num_pages=32, page_size=64,
                       prefill_chunk_size=64, prefix_cache=True, **common))
outs["paged + speculative"] = run(
    "paged + speculative (k=7)",
    PagedServingEngine(config, params, tokenizer, num_pages=32, page_size=64,
                       speculative_k=7, **common))

for name, got in outs.items():
    assert got == base, f"{name} diverged from the dense engine"
print("all engine variants token-exact vs dense")
