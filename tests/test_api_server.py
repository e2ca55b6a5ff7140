"""OpenAI-compatible API server tests (CPU, tiny model, live HTTP).

The server multiplexes HTTP clients onto one continuous-batching engine;
these tests exercise the full stack — routing, SSE streaming, stop
sequences, usage accounting — over a real socket."""
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import pytest

from chatglm_q_tpu.config import ChatGLM2Config, GLMLoadConfig, TpuRuntimeConfig
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.serving.engine import ServingEngine
from chatglm_q_tpu.serving.api_server import GLMAPIServer, _messages_to_prompt

RT = TpuRuntimeConfig(use_pallas=False, use_flash_attention=False)

CFG = ChatGLM2Config(
    hidden_size=64, inner_hidden_size=64, head_hidden_size=16,
    num_multi_query_groups=2, num_attention_heads=4, num_layers=2,
    vocab_size=128, max_sequence_length=64,
)


class StubTokenizer:
    """Char-level codec over the tiny vocab (id = codepoint offset into a
    CJK page so decode is always valid text)."""

    BASE = 0x4E00

    def encode(self, text):
        return [ord(c) % 128 for c in text]

    def decode(self, ids):
        return "".join(chr(self.BASE + int(i)) for i in ids)

    def __getitem__(self, piece):
        assert piece == "</s>"
        return 2


@pytest.fixture(scope="module")
def api():
    params = M.init_params(jax.random.PRNGKey(0), CFG, "none", jnp.float32)
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    eng = ServingEngine(load_cfg, params, tokenizer=StubTokenizer(),
                        max_batch=4, max_seq_len=64, decode_chunk=4, rt=RT)
    server = GLMAPIServer(eng, port=0, model_name="tiny-test")
    server.start()
    yield server
    server.shutdown()


def _post(server, path, body):
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        return resp.status, json.loads(resp.read())


def _post_stream(server, path, body):
    """Returns (deltas, finish_reason) parsed from the SSE stream."""
    body = dict(body, stream=True)
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    deltas, reason = [], None
    with urllib.request.urlopen(req, timeout=300) as resp:
        for raw in resp:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                break
            obj = json.loads(payload)
            choice = obj["choices"][0]
            if choice.get("finish_reason"):
                reason = choice["finish_reason"]
            if "delta" in choice:
                deltas.append(choice["delta"].get("content", ""))
            else:
                deltas.append(choice.get("text", ""))
    return deltas, reason


BODY = {"model": "tiny-test", "max_tokens": 12, "temperature": 0.0,
        "messages": [{"role": "user", "content": "hello"}]}


def test_models_endpoint(api):
    with urllib.request.urlopen(
            f"http://{api.host}:{api.port}/v1/models", timeout=60) as resp:
        obj = json.loads(resp.read())
    assert obj["data"][0]["id"] == "tiny-test"


def test_chat_completion(api):
    status, obj = _post(api, "/v1/chat/completions", BODY)
    assert status == 200
    assert obj["object"] == "chat.completion"
    choice = obj["choices"][0]
    assert choice["message"]["role"] == "assistant"
    assert isinstance(choice["message"]["content"], str)
    assert choice["finish_reason"] in ("stop", "length")
    u = obj["usage"]
    assert u["prompt_tokens"] > 0
    assert u["total_tokens"] == u["prompt_tokens"] + u["completion_tokens"]
    assert u["completion_tokens"] <= 12


def test_stream_matches_non_stream(api):
    _, obj = _post(api, "/v1/chat/completions", BODY)
    full = obj["choices"][0]["message"]["content"]
    deltas, reason = _post_stream(api, "/v1/chat/completions", BODY)
    assert "".join(deltas) == full
    assert reason == obj["choices"][0]["finish_reason"]


def test_text_completion(api):
    body = {"model": "tiny-test", "prompt": "abc", "max_tokens": 8,
            "temperature": 0.0}
    status, obj = _post(api, "/v1/completions", body)
    assert status == 200
    assert obj["object"] == "text_completion"
    assert isinstance(obj["choices"][0]["text"], str)


def test_stop_sequence_truncates(api):
    _, obj = _post(api, "/v1/chat/completions", dict(BODY, max_tokens=16))
    full = obj["choices"][0]["message"]["content"]
    if len(full) < 3:
        pytest.skip("tiny model generated too little text to split")
    stop = full[2:4]
    _, obj2 = _post(api, "/v1/chat/completions",
                    dict(BODY, max_tokens=16, stop=stop))
    text = obj2["choices"][0]["message"]["content"]
    assert stop not in text
    assert text == full[: full.find(stop)]
    assert obj2["choices"][0]["finish_reason"] == "stop"
    # streaming path applies the same truncation
    deltas, reason = _post_stream(api, "/v1/chat/completions",
                                  dict(BODY, max_tokens=16, stop=stop))
    assert "".join(deltas) == text
    assert reason == "stop"


def test_concurrent_clients_share_engine(api):
    """Four clients in flight at once — continuous batching multiplexes
    them onto the 4 engine slots; greedy answers must match serial runs."""
    _, ref = _post(api, "/v1/chat/completions", BODY)
    expected = ref["choices"][0]["message"]["content"]
    results = [None] * 4

    def call(i):
        _, obj = _post(api, "/v1/chat/completions", BODY)
        results[i] = obj["choices"][0]["message"]["content"]

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert results == [expected] * 4


def test_bad_json_is_400(api):
    req = urllib.request.Request(
        f"http://{api.host}:{api.port}/v1/chat/completions",
        data=b"{not json", headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())


def test_messages_template_mapping():
    prompt = _messages_to_prompt([
        {"role": "system", "content": "sys"},
        {"role": "user", "content": "q1"},
        {"role": "assistant", "content": "a1"},
        {"role": "user", "content": "q2"},
    ])
    assert prompt == "[Round 1]\n\n问：q1\n\n答：a1\n\n[Round 2]\n\n问：sys\nq2\n\n答："
    with pytest.raises(ValueError):
        _messages_to_prompt([{"role": "assistant", "content": "a"}])


def test_metrics_endpoint(api):
    # generate something first so counters are nonzero
    _post(api, "/v1/chat/completions", BODY)
    with urllib.request.urlopen(
            f"http://{api.host}:{api.port}/metrics", timeout=60) as resp:
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()
    assert 'glm_engine_total{stat="generated_tokens"}' in text
    assert 'glm_engine_gauge{stat="max_batch"} 4' in text
    gen = int(next(l for l in text.splitlines()
                   if 'stat="generated_tokens"' in l).rsplit(" ", 1)[1])
    assert gen > 0


def test_stream_include_usage(api):
    body = dict(BODY, stream=True, stream_options={"include_usage": True})
    req = urllib.request.Request(
        f"http://{api.host}:{api.port}/v1/chat/completions",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    usage = None
    n_text = 0
    with urllib.request.urlopen(req, timeout=300) as resp:
        for raw in resp:
            line = raw.decode().strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            obj = json.loads(line[6:])
            if obj.get("usage"):
                usage = obj["usage"]
                assert obj["choices"] == []
            for c in obj["choices"]:
                n_text += len(c.get("delta", {}).get("content", ""))
    assert usage is not None
    assert usage["completion_tokens"] <= 12
    assert usage["total_tokens"] == usage["prompt_tokens"] + usage["completion_tokens"]


def test_worker_crash_closes_streams():
    """A device/engine exception must not leave HTTP clients hanging: the
    worker closes every open event stream with finish_reason=error."""
    from chatglm_q_tpu.serving.api_server import EngineWorker, _DONE

    class BoomEngine:
        eos_token_id = 2
        finished = []

        def __init__(self):
            self._n = 0

        @property
        def has_work(self):
            return self._n > 0

        def submit(self, ids, **kw):
            self._n += 1
            return self._n

        def step(self):
            raise RuntimeError("device fell over")

        def cancel(self, rid):
            pass

    w = EngineWorker(BoomEngine())
    w.start()
    rid, events = w.submit([1, 2, 3])
    assert events.get(timeout=30) is _DONE
    assert w.finish_reason(rid) == "error"
    w.join(timeout=30)
    assert not w.is_alive()  # thread exited via the finally block
    # subsequent submits fail FAST (dead-worker check), not after 300 s
    import time as _time
    t0 = _time.monotonic()
    with pytest.raises(RuntimeError):
        w.submit([4, 5])
    assert _time.monotonic() - t0 < 30


def test_stream_state_non_monotonic_rewrites():
    """process_response rewrites already-seen chars (halfwidth punctuation
    converts when the NEXT char turns out CJK; the 8-char training-time
    placeholder collapses to 5).  The stable-prefix hold-back must make the
    concatenated deltas equal the final processed text no matter how the
    tokens are chunked."""
    from chatglm_q_tpu.serving.api_server import _StreamState
    from chatglm_q_tpu.serving.chat import process_response

    pieces = ["abc", ",", "中", "!", "x", "[[训练时", "间]]", "好", ":",
              "中", " ", " tail ", "�", "中"]

    class PieceTok:
        def decode(self, ids):
            return "".join(pieces[i] for i in ids)

    full = process_response(PieceTok().decode(range(len(pieces))))
    for chunk_len in (1, 2, 3, len(pieces)):
        st = _StreamState(PieceTok(), eos_token_id=-1, stop=[])
        out = []
        for i in range(0, len(pieces), chunk_len):
            d = st.push(list(range(i, min(i + chunk_len, len(pieces)))))
            if d:
                out.append(d)
        tail = st.flush()
        if tail:
            out.append(tail)
        assert "".join(out) == full == st.text, (chunk_len, out, full)


def test_stream_state_stop_across_chunks():
    """A stop string arriving split across pushes truncates exactly."""
    from chatglm_q_tpu.serving.api_server import _StreamState

    pieces = ["中中", "ST", "OP", "中中"]

    class PieceTok:
        def decode(self, ids):
            return "".join(pieces[i] for i in ids)

    st = _StreamState(PieceTok(), eos_token_id=-1, stop=["STOP"])
    out = []
    for i in range(len(pieces)):
        d = st.push([i])
        if d:
            out.append(d)
    t = st.flush()
    if t:
        out.append(t)
    assert st.stopped
    assert "".join(out) == "中中" == st.text


def test_api_server_over_paged_engine():
    """The server is engine-agnostic: same flow over the paged-KV engine
    (page pool + prefix cache) — greedy output must match the dense one."""
    from chatglm_q_tpu.serving.paged_engine import PagedServingEngine

    params = M.init_params(jax.random.PRNGKey(0), CFG, "none", jnp.float32)
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    dense = ServingEngine(load_cfg, params, tokenizer=StubTokenizer(),
                          max_batch=2, max_seq_len=64, decode_chunk=4, rt=RT)
    paged = PagedServingEngine(load_cfg, params, tokenizer=StubTokenizer(),
                               max_batch=2, max_seq_len=64, decode_chunk=4,
                               rt=RT, page_size=16, num_pages=16,
                               prefix_cache=True, prefill_chunk_size=16)
    outs = []
    for eng in (dense, paged):
        srv = GLMAPIServer(eng, port=0, model_name="t")
        srv.start()
        try:
            _, obj = _post(srv, "/v1/chat/completions", BODY)
            outs.append(obj["choices"][0]["message"]["content"])
        finally:
            srv.shutdown()
    assert outs[0] == outs[1]


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_api_server_over_distributed_engine():
    """BASELINE config-5 serving story end-to-end: HTTP clients →
    OpenAI server → cross-host engine over a (data=2, model=4) mesh —
    greedy output matches the single-device dense engine."""
    from chatglm_q_tpu.parallel import sharding as S
    from chatglm_q_tpu.serving.dist_engine import DistributedPagedServingEngine

    params = M.init_params(jax.random.PRNGKey(0), CFG, "none", jnp.float32)
    load_cfg = GLMLoadConfig(model_config=CFG, torch_dtype="float32")
    kw = dict(max_batch=4, max_seq_len=64, decode_chunk=4)

    dense = ServingEngine(load_cfg, params, tokenizer=StubTokenizer(),
                          rt=RT, **kw)
    mesh = S.make_mesh(2, 4)
    dist = DistributedPagedServingEngine(
        load_cfg, S.shard_params(params, mesh, CFG, "none"),
        tokenizer=StubTokenizer(), mesh=mesh, num_pages=16, page_size=8,
        prefill_chunk_size=8,
        rt=TpuRuntimeConfig(use_pallas=False, mesh=mesh), **kw)
    outs = []
    for eng in (dense, dist):
        srv = GLMAPIServer(eng, port=0, model_name="t")
        srv.start()
        try:
            _, obj = _post(srv, "/v1/chat/completions", BODY)
            outs.append(obj["choices"][0]["message"]["content"])
        finally:
            srv.shutdown()
    assert outs[0] == outs[1]


def test_n_choices(api):
    """n>1 fans out to n engine requests batched together; greedy samples
    are identical, indices ordered, usage summed."""
    _, ref = _post(api, "/v1/chat/completions", BODY)
    _, obj = _post(api, "/v1/chat/completions", dict(BODY, n=3))
    assert [c["index"] for c in obj["choices"]] == [0, 1, 2]
    expected = ref["choices"][0]["message"]["content"]
    assert [c["message"]["content"] for c in obj["choices"]] == [expected] * 3
    u = obj["usage"]
    assert u["prompt_tokens"] == ref["usage"]["prompt_tokens"] * 3
    assert u["completion_tokens"] == ref["usage"]["completion_tokens"] * 3
    # streaming with n>1 is rejected
    try:
        _post(api, "/v1/chat/completions", dict(BODY, n=2, stream=True))
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400
