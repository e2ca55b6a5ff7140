"""Cross-engine equivalence fuzz: every serving configuration must emit
IDENTICAL greedy tokens for the same workload (the engines differ only in
memory layout and scheduling, never in results).  Catches drift between
the dense, paged, chunked-prefill, prefix-cache and speculative paths that
single-feature tests can miss when features compose."""
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatglm_q_tpu.config import ChatGLM2Config, GLMLoadConfig, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.serving.engine import ServingEngine
from chatglm_q_tpu.serving.paged_engine import PagedServingEngine

RT = TpuRuntimeConfig(use_pallas=False, use_flash_attention=False)

CFG = ChatGLM2Config(
    hidden_size=64, inner_hidden_size=64, head_hidden_size=16,
    num_multi_query_groups=2, num_attention_heads=4, num_layers=2,
    vocab_size=128, max_sequence_length=64,
)


@pytest.fixture(scope="module")
def parts():
    params = M.init_params(jax.random.PRNGKey(0), CFG, "none", jnp.float32)
    return GLMLoadConfig(model_config=CFG, torch_dtype="float32"), params


def drain(eng, prompts, budgets):
    ids = [eng.submit(p, max_new_tokens=b, temperature=0.0)
           for p, b in zip(prompts, budgets)]
    steps = 0
    while eng.has_work:
        eng.step()
        steps += 1
        assert steps < 500
    by_id = {r.req_id: r.generated for r in eng.finished}
    return [by_id[i] for i in ids]


VARIANTS = [
    ("dense", lambda lc, p: ServingEngine(
        lc, p, None, max_batch=3, max_seq_len=64, decode_chunk=4, rt=RT)),
    ("dense-lookahead", lambda lc, p: ServingEngine(
        lc, p, None, max_batch=3, max_seq_len=64, decode_chunk=4, rt=RT,
        lookahead=True)),
    ("dense-chunked", lambda lc, p: ServingEngine(
        lc, p, None, max_batch=3, max_seq_len=64, decode_chunk=4, rt=RT,
        prefill_chunk_size=16)),
    ("paged", lambda lc, p: PagedServingEngine(
        lc, p, None, max_batch=3, max_seq_len=64, decode_chunk=4, rt=RT,
        num_pages=16, page_size=16)),
    ("paged-prefix", lambda lc, p: PagedServingEngine(
        lc, p, None, max_batch=3, max_seq_len=64, decode_chunk=4, rt=RT,
        num_pages=16, page_size=16, prefix_cache=True,
        prefill_chunk_size=16)),
    ("paged-spec", lambda lc, p: PagedServingEngine(
        lc, p, None, max_batch=3, max_seq_len=64, decode_chunk=4, rt=RT,
        num_pages=16, page_size=16, speculative_k=4)),
]


def test_cross_engine_equivalence_fuzz(parts):
    lc, params = parts
    rng = random.Random(7)
    for round_i in range(3):
        n = rng.randint(2, 5)
        # repetitive tails make speculation actually fire; shared heads
        # exercise the prefix cache
        head = [rng.randrange(3, 120) for _ in range(rng.randint(4, 16))]
        prompts = []
        for _ in range(n):
            body = [rng.randrange(3, 120) for _ in range(rng.randint(1, 12))]
            rep = body[-3:] * rng.randint(0, 3)
            prompts.append((head if rng.random() < 0.5 else []) + body + rep)
        budgets = [rng.randint(1, 14) for _ in range(n)]

        results = {}
        for name, make in VARIANTS:
            results[name] = drain(make(lc, params), prompts, budgets)
        ref = results["dense"]
        for name, got in results.items():
            assert got == ref, (round_i, name, got, ref)
