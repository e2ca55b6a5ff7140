"""OpenAI-compatible HTTP serving front-end over the batching engines.

The reference serves interactively through a Streamlit UI driving the
batch-1 decoder (/root/reference/examples/web-ui.py); this module is the
production counterpart: a dependency-free HTTP server (stdlib
``http.server``) exposing ``/v1/chat/completions``, ``/v1/completions``
and ``/v1/models`` with Server-Sent-Events streaming, multiplexing many
concurrent HTTP clients onto ONE continuous-batching engine.

Design constraints that shape this file:

* **One device client.**  All engine/device work happens on a single
  ``EngineWorker`` thread (the TPU runtime is not thread-safe and this
  environment serializes TPU clients); HTTP handler threads communicate
  with it only through queues.
* **Continuous batching end-to-end.**  Requests arriving while others
  decode are admitted between chunks by the engine itself — the server
  adds no batching logic of its own, it only routes token events
  (``req_id`` → per-request queue) back to the waiting handler.
* **Incremental detokenization** suppresses trailing partial-UTF8
  replacement chars exactly like the streaming decoder
  (decoder.py: yield only when the text does not end in U+FFFD).
"""
from __future__ import annotations

import json
import queue
import threading
import time
import itertools
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from .chat import chat_template, process_response

_DONE = object()  # sentinel closing a per-request event stream


class EngineWorker(threading.Thread):
    """Owns the engine; the only thread that touches the device.

    HTTP threads call :meth:`submit` / :meth:`cancel`; the worker loop
    drains those mailboxes between engine steps and fans decoded tokens
    out to per-request queues.
    """

    def __init__(self, engine, poll_interval: float = 0.02):
        super().__init__(daemon=True, name="engine-worker")
        self.engine = engine
        self._mail: queue.Queue = queue.Queue()
        self._events: dict[int, queue.Queue] = {}
        self._finish_reason: dict[int, str] = {}
        self._wake = threading.Event()
        self._stop = False
        self._poll = poll_interval
        self._retired: set[int] = set()

    # -- called from HTTP handler threads ------------------------------

    def submit(self, prompt_ids: list, **sampling) -> tuple[int, queue.Queue]:
        """Queue a request; returns (req_id, token-event queue).  The queue
        yields lists of token ids and finally the _DONE sentinel."""
        out: queue.Queue = queue.Queue()
        done = threading.Event()
        box: dict = {}
        self._mail.put(("submit", (prompt_ids, sampling, out, box, done)))
        self._wake.set()
        if not done.wait(timeout=300):
            raise RuntimeError("engine worker did not accept the request "
                               "(worker dead or device stalled)")
        return box["req_id"], out

    def cancel(self, req_id: int):
        self._mail.put(("cancel", req_id))
        self._wake.set()

    def shutdown(self):
        self._stop = True
        self._wake.set()

    def finish_reason(self, req_id: int) -> str:
        return self._finish_reason.get(req_id, "stop")

    # -- worker loop ----------------------------------------------------

    def _drain_mail(self):
        while True:
            try:
                kind, payload = self._mail.get_nowait()
            except queue.Empty:
                return
            if kind == "submit":
                prompt_ids, sampling, out, box, done = payload
                rid = self.engine.submit(prompt_ids, **sampling)
                self._events[rid] = out
                box["req_id"] = rid
                done.set()
            elif kind == "cancel":
                self.engine.cancel(payload)

    def _route_finished(self):
        for req in self.engine.finished:
            rid = req.req_id
            if rid in self._retired:
                continue
            self._retired.add(rid)
            if req.generated and req.generated[-1] == self.engine.eos_token_id:
                self._finish_reason[rid] = "stop"
            else:
                self._finish_reason[rid] = "length"
            q = self._events.pop(rid, None)
            if q is not None:
                q.put(_DONE)

    def run(self):
        try:
            while not self._stop:
                self._drain_mail()
                # a cancel can retire a request without a further step (and
                # may leave the engine with no work at all) — route its
                # _DONE now, not only after the next step
                self._route_finished()
                if not self.engine.has_work:
                    # idle: block until a submission (or shutdown) arrives
                    self._wake.wait(timeout=1.0)
                    self._wake.clear()
                    continue
                for rid, toks in self.engine.step():
                    q = self._events.get(rid)
                    if q is not None and toks:
                        q.put(list(toks))
                self._route_finished()
        finally:
            # worker exiting (shutdown or a device/engine exception): close
            # every open event stream so no HTTP client hangs to timeout
            for rid, q in list(self._events.items()):
                self._finish_reason.setdefault(rid, "error")
                q.put(_DONE)
            self._events.clear()


class _StreamState:
    """Per-request incremental detokenizer with stop-sequence scanning."""

    def __init__(self, tokenizer, eos_token_id: int, stop: list[str]):
        self.tokenizer = tokenizer
        self.eos = eos_token_id
        self.stop = stop
        self.ids: list[int] = []
        self.emitted = 0  # chars of processed text already sent
        self.stopped = False

    def push(self, toks: list[int]) -> Optional[str]:
        """Absorb decoded tokens; return the new text delta to emit (None
        when held back: partial UTF-8 tail or potential stop-seq prefix)."""
        self.ids.extend(t for t in toks if t != self.eos)
        text = process_response(self.tokenizer.decode(self.ids))
        if text.endswith("�"):
            return None
        for s in self.stop:
            hit = text.find(s, max(0, self.emitted - len(s) + 1))
            if hit >= 0:
                self.stopped = True
                delta = text[self.emitted:hit]
                self.emitted = hit
                return delta or None
            # hold back a suffix that could grow into this stop string
            for k in range(len(s) - 1, 0, -1):
                if text.endswith(s[:k]):
                    text = text[: len(text) - k]
                    break
        if len(text) <= self.emitted:
            return None
        delta = text[self.emitted:]
        self.emitted = len(text)
        return delta

    def flush(self) -> Optional[str]:
        """Emit whatever a held-back tail left behind at end of stream."""
        if self.stopped:
            return None
        text = process_response(self.tokenizer.decode(self.ids))
        if text.endswith("�"):
            text = text[:-1]
        for s in self.stop:
            hit = text.find(s)
            if hit >= 0:
                self.stopped = True
                text = text[:hit]
        if len(text) <= self.emitted:
            return None
        delta = text[self.emitted:]
        self.emitted = len(text)
        return delta


def _messages_to_prompt(messages: list[dict]) -> str:
    """Map OpenAI chat messages onto the ChatGLM2 [Round n] template.

    ChatGLM2 has no system role: system content is prepended to the first
    user turn (the convention its own web demos use)."""
    system = "\n".join(m["content"] for m in messages if m.get("role") == "system")
    turns = [m for m in messages if m.get("role") in ("user", "assistant")]
    if not turns or turns[-1].get("role") != "user":
        raise ValueError("last non-system message must be role=user")
    history: list[tuple[str, str]] = []
    i = 0
    while i < len(turns) - 1:
        if turns[i]["role"] == "user" and turns[i + 1]["role"] == "assistant":
            history.append((turns[i]["content"], turns[i + 1]["content"]))
            i += 2
        else:
            i += 1
    current = turns[-1]["content"]
    if system:
        current = system + "\n" + current
    return chat_template(history, current)


class GLMAPIServer:
    """Binds an engine + tokenizer to an HTTP port.

    ``server = GLMAPIServer(engine); server.start()`` — or ``serve()`` to
    block.  ``engine`` is any of the serving engines (dense/paged/dist);
    it must have been built WITH a tokenizer.
    """

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 8000,
                 model_name: str = "chatglm2-6b", default_max_tokens: int = 256):
        if engine.tokenizer is None:
            raise ValueError("API server needs an engine built with a tokenizer")
        self.engine = engine
        self.tokenizer = engine.tokenizer
        self.model_name = model_name
        self.default_max_tokens = default_max_tokens
        self.worker = EngineWorker(engine)
        self._counter = itertools.count(1)
        handler = _make_handler(self)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.host, self.port = self.httpd.server_address[:2]

    def start(self):
        if not self.worker.is_alive():
            self.worker.start()
        threading.Thread(target=self.httpd.serve_forever, daemon=True,
                         name="http-accept").start()

    def serve(self):
        if not self.worker.is_alive():
            self.worker.start()
        try:
            self.httpd.serve_forever()
        finally:
            self.shutdown()

    def shutdown(self):
        self.httpd.shutdown()
        self.worker.shutdown()

    # -- request execution (called from handler threads) ----------------

    def _sampling_kwargs(self, body: dict) -> dict:
        kw = {"max_new_tokens": int(body.get("max_tokens")
                                    or self.default_max_tokens)}
        temp = float(body.get("temperature", 1.0))
        kw["temperature"] = temp
        kw["top_p"] = float(body.get("top_p", 0.8))
        if "top_k" in body:
            kw["top_k"] = int(body["top_k"])
        return kw

    @staticmethod
    def _stop_list(body: dict) -> list[str]:
        stop = body.get("stop") or []
        return [stop] if isinstance(stop, str) else list(stop)

    def generate(self, prompt_text: str, body: dict):
        """Returns (req_id, prompt_len, _StreamState, event queue)."""
        prompt_ids = self.tokenizer.encode(prompt_text)
        rid, events = self.worker.submit(prompt_ids, **self._sampling_kwargs(body))
        state = _StreamState(self.tokenizer, self.engine.eos_token_id,
                             self._stop_list(body))
        return rid, len(prompt_ids), state, events


def _make_handler(server: GLMAPIServer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        # -- plumbing ---------------------------------------------------

        def _json(self, code: int, obj: dict):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _error(self, code: int, message: str, etype: str = "invalid_request_error"):
            self._json(code, {"error": {"message": message, "type": etype,
                                        "param": None, "code": None}})

        def _read_body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n) if n else b"{}"
            return json.loads(raw)

        # -- routes -----------------------------------------------------

        def do_GET(self):
            if self.path == "/v1/models":
                self._json(200, {"object": "list", "data": [
                    {"id": server.model_name, "object": "model",
                     "created": int(time.time()), "owned_by": "chatglm_q_tpu"}]})
            elif self.path in ("/health", "/healthz"):
                self._json(200, {"status": "ok"})
            elif self.path == "/metrics":
                self._metrics()
            else:
                self._error(404, f"unknown path {self.path}")

        def do_POST(self):
            try:
                body = self._read_body()
            except (ValueError, json.JSONDecodeError):
                return self._error(400, "invalid JSON body")
            try:
                if self.path == "/v1/chat/completions":
                    return self._completions(body, chat=True)
                if self.path == "/v1/completions":
                    return self._completions(body, chat=False)
            except ValueError as e:
                return self._error(400, str(e))
            self._error(404, f"unknown path {self.path}")

        def _metrics(self):
            """Prometheus text exposition of the engine counters (A7
            observability at the serving boundary).  Reads are unlocked —
            metrics tolerate a torn view of monotonically growing ints."""
            eng = server.engine
            lines = ["# TYPE glm_engine_total counter"]
            for k, v in eng.stats.items():
                lines.append(f'glm_engine_total{{stat="{k}"}} {v}')
            lines += [
                "# TYPE glm_engine_gauge gauge",
                f'glm_engine_gauge{{stat="queued"}} {len(eng.queue)}',
                f'glm_engine_gauge{{stat="active_slots"}} '
                f'{sum(1 for s in eng.slots if s.request is not None)}',
                f'glm_engine_gauge{{stat="max_batch"}} {eng.max_batch}',
            ]
            data = ("\n".join(lines) + "\n").encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        # -- completions --------------------------------------------

        def _completions(self, body: dict, chat: bool):
            if chat:
                prompt = _messages_to_prompt(body.get("messages") or [])
            else:
                p = body.get("prompt", "")
                if isinstance(p, list):
                    if len(p) != 1:
                        raise ValueError("only a single prompt is supported")
                    p = p[0]
                prompt = str(p)
            rid, n_prompt, state, events = server.generate(prompt, body)
            oid = (f"chatcmpl-{next(server._counter)}" if chat
                   else f"cmpl-{next(server._counter)}")
            if body.get("stream"):
                return self._stream(body, chat, oid, rid, state, events,
                                    n_prompt)

            while True:
                ev = events.get(timeout=600)
                if ev is _DONE:
                    break
                state.push(ev)
                if state.stopped:
                    server.worker.cancel(rid)
                    # drain to the sentinel so the queue is not leaked
                    while events.get(timeout=600) is not _DONE:
                        pass
                    break
            state.flush()
            text = process_response(self.tokenizer_decode(state))
            reason = "stop" if state.stopped else server.worker.finish_reason(rid)
            usage = {"prompt_tokens": n_prompt,
                     "completion_tokens": len(state.ids),
                     "total_tokens": n_prompt + len(state.ids)}
            if chat:
                choice = {"index": 0, "finish_reason": reason,
                          "message": {"role": "assistant", "content": text}}
                obj = "chat.completion"
            else:
                choice = {"index": 0, "finish_reason": reason, "text": text}
                obj = "text_completion"
            self._json(200, {"id": oid, "object": obj,
                             "created": int(time.time()),
                             "model": server.model_name,
                             "choices": [choice], "usage": usage})

        def tokenizer_decode(self, state: _StreamState) -> str:
            text = state.tokenizer.decode(state.ids)
            text = process_response(text)
            for s in state.stop:
                hit = text.find(s)
                if hit >= 0:
                    text = text[:hit]
            return text

        def _stream(self, body, chat, oid, rid, state, events, n_prompt):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            obj = "chat.completion.chunk" if chat else "text_completion"

            def chunk(delta_obj: dict, reason=None):
                if chat:
                    choice = {"index": 0, "delta": delta_obj,
                              "finish_reason": reason}
                else:
                    choice = {"index": 0, "text": delta_obj.get("content", ""),
                              "finish_reason": reason}
                payload = json.dumps({"id": oid, "object": obj,
                                      "created": int(time.time()),
                                      "model": server.model_name,
                                      "choices": [choice]})
                self._write_chunk(f"data: {payload}\n\n")

            try:
                if chat:
                    chunk({"role": "assistant", "content": ""})
                while True:
                    ev = events.get(timeout=600)
                    if ev is _DONE:
                        break
                    delta = state.push(ev)
                    if delta:
                        chunk({"content": delta})
                    if state.stopped:
                        server.worker.cancel(rid)
                        while events.get(timeout=600) is not _DONE:
                            pass
                        break
                tail = state.flush()
                if tail:
                    chunk({"content": tail})
                reason = "stop" if state.stopped else server.worker.finish_reason(rid)
                chunk({}, reason=reason)
                if (body.get("stream_options") or {}).get("include_usage"):
                    usage = {"prompt_tokens": n_prompt,
                             "completion_tokens": len(state.ids),
                             "total_tokens": n_prompt + len(state.ids)}
                    payload = json.dumps({"id": oid, "object": obj,
                                          "created": int(time.time()),
                                          "model": server.model_name,
                                          "choices": [], "usage": usage})
                    self._write_chunk(f"data: {payload}\n\n")
                self._write_chunk("data: [DONE]\n\n")
                self._write_chunk("")  # terminal zero-length chunk
            except (BrokenPipeError, ConnectionResetError):
                server.worker.cancel(rid)  # client went away mid-stream

        def _write_chunk(self, text: str):
            data = text.encode()
            self.wfile.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")
            self.wfile.flush()

    return Handler
