"""GLMDecoder streaming generation tests (CPU, tiny model + tiny tokenizer)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatglm_q_tpu.config import ChatGLM2Config, GLMLoadConfig, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.serving.decoder import GLMDecoder, _bucket
from chatglm_q_tpu.serving.chat import chat_template, process_response
from chatglm_q_tpu.tokenizer import ChatGLM2Tokenizer
from chatglm_q_tpu.tokenizer.build import build_unigram_model
from chatglm_q_tpu.ops.sampling import top_p_sampling

RT = TpuRuntimeConfig(use_pallas=False)

TINY = dict(
    hidden_size=64, inner_hidden_size=64, head_hidden_size=16,
    num_multi_query_groups=2, num_attention_heads=4, num_layers=2,
    vocab_size=320, max_sequence_length=64,
)


@pytest.fixture(scope="module")
def decoder(tmp_path_factory):
    vocab = {f"tok{i}": -float(i) for i in range(40)}
    vocab.update({"hello": -0.5, "world": -0.6})
    path = tmp_path_factory.mktemp("tok") / "sp.model"
    path.write_bytes(build_unigram_model(vocab))
    tok = ChatGLM2Tokenizer(path)
    assert len(tok) <= TINY["vocab_size"]

    cfg = ChatGLM2Config(**TINY)
    params = M.init_params(jax.random.PRNGKey(0), cfg, "none", jnp.float32)
    load_cfg = GLMLoadConfig(model_config=cfg, torch_dtype="float32")
    return GLMDecoder(load_cfg, params, tok, rt=RT, time_log=True)


def test_generate_greedy_streams_and_stops(decoder, capsys):
    stream = list(decoder.generate("hello world", max_generated_tokens=8, temperature=0.0))
    # yields grow monotonically (each yield is the full response so far)
    for a, b in zip(stream, stream[1:]):
        assert b.startswith(a) or len(b) >= len(a)
    out = capsys.readouterr().out
    assert "tok/s" in out  # time_log report (reference decoder.py:99-106)


def test_generate_max_tokens_cap(decoder):
    gen = decoder.generate("hello", max_generated_tokens=3, temperature=0.0)
    list(gen)  # exhaust


def test_generate_deterministic_with_seed(decoder):
    ids1 = list(decoder.generate("hello", max_generated_tokens=5, seed=1))
    ids2 = list(decoder.generate("hello", max_generated_tokens=5, seed=1))
    assert ids1 == ids2


def test_generate_matches_manual_loop(decoder):
    """Greedy generate must equal a hand-rolled prefill/decode loop."""
    tok = decoder.tokenizer
    cfg = decoder.config.model_config
    prefix = tok.encode("hello world")
    bucket = _bucket(len(prefix))
    prompt = np.zeros((1, bucket), np.int32)
    prompt[0, : len(prefix)] = prefix
    cache = M.init_kv_cache(cfg, 1, decoder.max_sequence_length, jnp.float32)
    logits, cache = M.prefill(
        decoder.params, cfg, jnp.asarray(prompt),
        jnp.asarray([len(prefix)], jnp.int32), cache, "none", jnp.float32, RT,
    )
    manual = []
    for _ in range(6):
        t = int(jnp.argmax(logits, -1)[0])
        manual.append(t)
        if t == decoder.eos_token_id:
            break
        logits, cache = M.decode_step(
            decoder.params, cfg, jnp.asarray([t]), cache, "none", jnp.float32, RT
        )

    gen = decoder.generate("hello world", max_generated_tokens=6, temperature=0.0)
    while True:
        try:
            next(gen)
        except StopIteration as e:
            final = e.value
            break
    expected = process_response(tok.decode(manual))
    assert final == expected


def test_multi_step_decode_matches_single_steps(decoder):
    cfg = decoder.config.model_config
    cache = M.init_kv_cache(cfg, 2, 32, jnp.float32)
    ids = jnp.asarray([[5, 9, 11], [7, 8, 12]], jnp.int32)
    lengths = jnp.asarray([3, 3], jnp.int32)
    logits, cache = M.prefill(decoder.params, cfg, ids, lengths, cache,
                              "none", jnp.float32, RT)
    first = jnp.argmax(logits, -1).astype(jnp.int32)

    toks_scan, _ = M.multi_step_decode(
        decoder.params, cfg, first, cache, 4, None, "none", jnp.float32, RT
    )
    # manual single steps
    cur, c = first, cache
    manual = []
    for _ in range(4):
        lg, c = M.decode_step(decoder.params, cfg, cur, c, "none", jnp.float32, RT)
        cur = jnp.argmax(lg, -1).astype(jnp.int32)
        manual.append(cur)
    # scan emits the *sampled* token at each step: first sampled token is
    # the argmax after feeding `first`
    manual_arr = jnp.stack(manual, axis=1)
    np.testing.assert_array_equal(np.asarray(toks_scan), np.asarray(manual_arr))


def test_chat_template():
    t = chat_template([("你好", "你好!")], "今天天气")
    assert t == "[Round 1]\n\n问：你好\n\n答：你好!\n\n[Round 2]\n\n问：今天天气\n\n答："


def test_process_response_punct():
    assert process_response("中文,测试") == "中文，测试"
    assert process_response("  [[训练时间]]x ") == "2023年x"
    assert process_response("abc, def") == "abc, def"  # non-CJK untouched


def test_top_p_sampling_distribution():
    rng = jax.random.PRNGKey(0)
    logits = jnp.log(jnp.asarray([0.5, 0.3, 0.1, 0.05, 0.05]))
    # top_p=0.5: keeps only the first token (cumsum-prob > p after it)
    samples = [
        int(top_p_sampling(jax.random.PRNGKey(i), logits, top_k=5, top_p=0.5))
        for i in range(20)
    ]
    assert set(samples) <= {0, 1}
    # top_p=0.999: all tokens reachable
    samples = [
        int(top_p_sampling(jax.random.PRNGKey(i), logits, top_k=5, top_p=0.999))
        for i in range(50)
    ]
    assert len(set(samples)) >= 3


def test_generate_overlong_prompt_truncates(decoder):
    """A prompt longer than the cache must not corrupt decoding (keeps the
    most recent context)."""
    long_prompt = "hello " * 200  # tokenizes far beyond max_sequence_length=64
    gen = decoder.generate(long_prompt, max_generated_tokens=3, temperature=0.0)
    for _ in gen:
        pass  # must not raise
