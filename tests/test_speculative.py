"""Prompt-lookup speculative decoding: draft lookup unit tests and
token-for-token greedy equivalence through the public decoder."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatglm_q_tpu.config import ChatGLM2Config, GLMLoadConfig, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.serving.decoder import GLMDecoder
from chatglm_q_tpu.serving.speculative import find_draft, greedy_accept

CFG = ChatGLM2Config(
    hidden_size=64, inner_hidden_size=64, head_hidden_size=16,
    num_multi_query_groups=2, num_attention_heads=4, num_layers=2,
    vocab_size=128, max_sequence_length=128,
)


class IdTokenizer:
    """Maps text '1 2 3' ↔ ids [1, 2, 3] so decoder tests need no model."""

    def __getitem__(self, tok):
        return 2  # </s>

    def encode(self, text):
        return [int(t) for t in text.split()]

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def test_find_draft_longest_recent_match():
    h = [1, 2, 3, 9, 1, 2, 3, 5, 6, 1, 2, 3]
    # tail [1,2,3] last occurred at 4..6, followed by 5, 6, 1, ...
    assert find_draft(h, ngram=3, k=4) == [5, 6, 1, 2]
    # no recurrence at any n-gram length
    assert find_draft([1, 2, 3, 4], ngram=3, k=4) is None
    # falls back to shorter n-grams
    assert find_draft([7, 1, 8, 9, 1], ngram=3, k=2) == [8, 9]


def test_greedy_accept():
    assert greedy_accept([5, 6, 7], [5, 6, 7]) == 3
    assert greedy_accept([5, 6, 7], [5, 9, 7]) == 1
    assert greedy_accept([5, 6, 7], [1, 6, 7]) == 0


@pytest.mark.parametrize("rt", [
    TpuRuntimeConfig(use_pallas=False, use_flash_attention=False),
    TpuRuntimeConfig(use_pallas=True),
], ids=["xla", "flash"])
def test_speculative_greedy_token_exact(rt):
    """Speculative generation must produce exactly the plain greedy tokens
    (acceptance only skips device steps, never changes output)."""
    params = M.init_params(jax.random.PRNGKey(0), CFG, "none", jnp.float32)
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    tok = IdTokenizer()
    dec = GLMDecoder(load_cfg, params, tok, rt=rt)

    # random tiny models decay into greedy cycles — ideal PLD territory
    prompt = "3 17 42 99 5 61 8 77"
    plain = list(dec.generate(prompt, max_generated_tokens=24, temperature=0.0))
    spec = list(dec.generate(prompt, max_generated_tokens=24, temperature=0.0,
                             speculative_k=6))
    assert plain[-1] == spec[-1], (plain[-1], spec[-1])
    # the streams agree too (same prefix yields)
    assert spec == plain, (spec, plain)
    stats = dec.spec_stats
    # the cycle must have produced accepted drafts — fewer device steps
    # than tokens
    assert stats["accepted_tokens"] > 0, stats
    assert stats["verify_steps"] + stats["decode_steps"] < 24, stats


def test_speculative_respects_budget_and_walls():
    params = M.init_params(jax.random.PRNGKey(1), CFG, "none", jnp.float32)
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    dec = GLMDecoder(load_cfg, params, IdTokenizer(), rt=TpuRuntimeConfig(
        use_pallas=False, use_flash_attention=False))
    for budget in (1, 2, 5):
        plain = list(dec.generate("4 8 15 16 23 42", max_generated_tokens=budget,
                                  temperature=0.0))
        spec = list(dec.generate("4 8 15 16 23 42", max_generated_tokens=budget,
                                 temperature=0.0, speculative_k=6))
        p_ids = plain[-1].split() if plain else []
        s_ids = spec[-1].split() if spec else []
        assert p_ids == s_ids, (budget, p_ids, s_ids)
        assert len(s_ids) <= budget
