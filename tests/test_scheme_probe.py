"""bench.py's one-shot dequant-scheme probe, exercised on CPU.

The probe normally runs only on TPU right before the headline benchmark —
a crash or a bad record there eats the round's headline run, so its
selection/record logic is validated here with the backend gate and kernel
dispatch monkeypatched (kernels run in interpret mode; timings are faked
deterministically)."""
import importlib.util
import os
import sys

import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chatglm_q_tpu.config import ChatGLM2Config
from chatglm_q_tpu.ops import autotune as AT


@pytest.fixture
def bench_mod():
    spec = importlib.util.spec_from_file_location(
        "bench_for_test", os.path.join(os.path.dirname(__file__), "..",
                                       "bench.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_scheme_probe_records_winner(bench_mod, tmp_path, monkeypatch):
    monkeypatch.setenv("CHATGLM_Q_TPU_AUTOTUNE", str(tmp_path / "at.json"))
    AT.reload()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # kernels must still run in interpret mode on this CPU host
    from chatglm_q_tpu.ops import pallas_matmul as _PM
    monkeypatch.setattr(_PM, "_is_tpu", lambda: False)

    # deterministic fake timings: bt_grouped wins
    fake = {"broadcast": 3e-4, "grouped": 2e-4, "bt_grouped": 1e-4}
    calls = []

    def fake_slope(fn, n_lo, n_hi):
        calls.append((n_lo, n_hi))
        return fake[calls_scheme[-1]]

    # the probe builds one chain per scheme in order; track which
    calls_scheme = []
    real_chain = bench_mod.make_probe_chain

    def tracking_chain(K, L, scheme):
        calls_scheme.append(scheme)
        return real_chain(K, L, scheme)

    monkeypatch.setattr(bench_mod, "make_probe_chain", tracking_chain)
    monkeypatch.setattr(bench_mod, "slope_time", fake_slope)

    cfg = ChatGLM2Config(
        hidden_size=256, inner_hidden_size=512, head_hidden_size=32,
        num_multi_query_groups=2, num_attention_heads=8, num_layers=2,
        vocab_size=1024, max_sequence_length=64,
    )
    bench_mod.ensure_scheme_probe(cfg, "int4g32")

    from chatglm_q_tpu.ops import pallas_matmul as PM
    from chatglm_q_tpu.ops.quant import int4_storage_k

    AT.reload()
    bm = PM._block_m(1)
    H, Ip = cfg.hidden_size, int4_storage_k(cfg.inner_hidden_size)
    entry = AT.lookup("int4", bm, H, Ip)
    assert entry is not None and entry["scheme"] == "bt_grouped", entry
    assert entry.get("probe") is True
    # every decode shape got a provisional entry
    for (k, n) in ((H, cfg.q_size), (cfg.q_size, H), (Ip, H)):
        e = AT.lookup("int4", bm, int4_storage_k(k), n)
        assert e is not None and e["scheme"] == "bt_grouped", (k, n, e)

    # a SECOND probe is a no-op (real-or-probe entry present)
    calls_before = len(calls_scheme)
    bench_mod.ensure_scheme_probe(cfg, "int4g32")
    assert len(calls_scheme) == calls_before


def test_scheme_probe_survives_failing_scheme(bench_mod, tmp_path, monkeypatch):
    """A scheme whose chain raises (e.g. fails to compile) just loses."""
    monkeypatch.setenv("CHATGLM_Q_TPU_AUTOTUNE", str(tmp_path / "at.json"))
    AT.reload()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # kernels must still run in interpret mode on this CPU host
    from chatglm_q_tpu.ops import pallas_matmul as _PM
    monkeypatch.setattr(_PM, "_is_tpu", lambda: False)

    calls_scheme = []
    real_chain = bench_mod.make_probe_chain

    def tracking_chain(K, L, scheme):
        calls_scheme.append(scheme)
        return real_chain(K, L, scheme)

    def flaky_slope(fn, n_lo, n_hi):
        if calls_scheme[-1] == "bt_grouped":
            raise RuntimeError("mosaic says no")
        return {"broadcast": 2e-4, "grouped": 3e-4}[calls_scheme[-1]]

    monkeypatch.setattr(bench_mod, "make_probe_chain", tracking_chain)
    monkeypatch.setattr(bench_mod, "slope_time", flaky_slope)

    cfg = ChatGLM2Config(
        hidden_size=256, inner_hidden_size=512, head_hidden_size=32,
        num_multi_query_groups=2, num_attention_heads=8, num_layers=2,
        vocab_size=1024, max_sequence_length=64,
    )
    bench_mod.ensure_scheme_probe(cfg, "int4g32")
    AT.reload()

    from chatglm_q_tpu.ops import pallas_matmul as PM
    from chatglm_q_tpu.ops.quant import int4_storage_k

    entry = AT.lookup("int4", PM._block_m(1), cfg.hidden_size,
                      int4_storage_k(cfg.inner_hidden_size))
    assert entry is not None and entry["scheme"] == "broadcast", entry
