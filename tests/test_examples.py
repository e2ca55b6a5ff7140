"""Smoke tests: the example scripts run end-to-end on tiny checkpoints.

(Reference analog: its examples are unchecked scripts; here they are part
of the suite so the quantize/eval pipelines stay runnable.)
"""
import json
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatglm_q_tpu.config import ChatGLM2Config, GLMLoadConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.loader import save_model_and_tokenizer, load_model_and_tokenizer
from chatglm_q_tpu.tokenizer import ChatGLM2Tokenizer
from chatglm_q_tpu.tokenizer.build import build_unigram_model

ROOT = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def tiny_float_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("ex")
    vocab = {f"tok{i}": -float(i) for i in range(40)}
    vocab.update({"hello": -0.5, "world": -0.6, "A": -1.0, "B": -1.1,
                  "C": -1.2, "D": -1.3})
    tok_file = d / "sp.model"
    tok_file.write_bytes(build_unigram_model(vocab))
    tok = ChatGLM2Tokenizer(tok_file)
    V = ((len(tok) + 63) // 64) * 64
    cfg = ChatGLM2Config(hidden_size=64, inner_hidden_size=64, head_hidden_size=16,
                         num_multi_query_groups=2, num_attention_heads=4,
                         num_layers=2, vocab_size=V, max_sequence_length=128)
    params = M.init_params(jax.random.PRNGKey(0), cfg, "none", jnp.float32)
    lc = GLMLoadConfig(model_config=cfg, torch_dtype="float32")
    ckpt = d / "fp"
    save_model_and_tokenizer(ckpt, lc, params, tok)
    calib = d / "calib.txt"
    calib.write_text("hello world\nworld hello hello\ntok1 tok2\nhello tok3\n")
    return d, ckpt, calib


def _run_script(rel, argv):
    script = ROOT / rel
    old_argv = sys.argv
    sys.argv = [script.name] + argv
    try:
        exec(compile(script.read_text(), str(script), "exec"), {"__name__": "__main__"})
    finally:
        sys.argv = old_argv


def test_quantize_naive_script(tiny_float_ckpt):
    d, ckpt, _ = tiny_float_ckpt
    _run_script("examples/quantize_naive/int4g32.py",
                ["--source", str(ckpt), "--target", str(d / "q4")])
    cfg, params, _ = load_model_and_tokenizer(d / "q4")
    assert cfg.quant_type == "int4g32"


def test_quantize_gptq_script(tiny_float_ckpt):
    d, ckpt, calib = tiny_float_ckpt
    _run_script("examples/quantize_gptq/int8.py",
                ["--source", str(ckpt), "--target", str(d / "g8"),
                 "--calib-file", str(calib), "--num-prompts", "4",
                 "--batch-size", "2"])
    cfg, params, _ = load_model_and_tokenizer(d / "g8")
    assert cfg.quant_type == "int8"


def test_ppl_script(tiny_float_ckpt, capsys):
    d, ckpt, calib = tiny_float_ckpt
    _run_script("examples/evaluations/ppl.py",
                ["--model", str(ckpt), "--batch-size", "2",
                 "--calib-file", str(calib)])
    out = capsys.readouterr().out
    assert "ppl:" in out
    ppl = float(out.strip().split("ppl:")[1])
    assert np.isfinite(ppl) and ppl > 1


def test_ceval_script(tiny_float_ckpt, capsys, tmp_path):
    d, ckpt, _ = tiny_float_ckpt
    val = tmp_path / "val"
    val.mkdir()
    rows = [{"id": i, "question": f"q {i} hello", "A": "hello", "B": "world",
             "C": "tok1", "D": "tok2", "answer": "ABCD"[i % 4]} for i in range(8)]
    (val / "demo_val.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows))
    _run_script("examples/evaluations/ceval.py",
                ["--model", str(ckpt), "--ceval-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "overall:" in out


def test_api_server_over_checkpoint(tiny_float_ckpt):
    """The examples/api_server.py wiring: checkpoint -> engine with the
    REAL tokenizer -> HTTP chat completion (the unit tests use a stub)."""
    import json as _json
    import urllib.request
    from chatglm_q_tpu.serving import ServingEngine, GLMAPIServer
    from chatglm_q_tpu.config import TpuRuntimeConfig

    d, ckpt, _ = tiny_float_ckpt
    config, params, tok = load_model_and_tokenizer(ckpt)
    eng = ServingEngine(config, params, tok, max_batch=2, max_seq_len=64,
                        decode_chunk=4,
                        rt=TpuRuntimeConfig(use_pallas=False,
                                            use_flash_attention=False))
    server = GLMAPIServer(eng, port=0, model_name="tiny-ckpt")
    server.start()
    try:
        req = urllib.request.Request(
            f"http://{server.host}:{server.port}/v1/chat/completions",
            data=_json.dumps({
                "messages": [{"role": "user", "content": "hello world"}],
                "max_tokens": 6, "temperature": 0.0}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            obj = _json.loads(resp.read())
        assert obj["choices"][0]["finish_reason"] in ("stop", "length")
        assert isinstance(obj["choices"][0]["message"]["content"], str)
    finally:
        server.shutdown()


def test_export_stablehlo_roundtrip(tmp_path, capsys):
    """C31 analog: the serialized decode step reloads and executes
    (the script itself performs the deserialize+call round-trip)."""
    _run_script("examples/export_stablehlo.py",
                ["--out", str(tmp_path / "d.stablehlo"), "--cache-len", "64"])
    out = capsys.readouterr().out
    assert "reload OK" in out
    assert (tmp_path / "d.stablehlo").stat().st_size > 1000
