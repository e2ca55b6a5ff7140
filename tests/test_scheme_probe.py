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
from chatglm_q_tpu.ops import pallas_matmul as PM
from chatglm_q_tpu.ops.quant import int4_storage_k

CFG = ChatGLM2Config(
    hidden_size=256, inner_hidden_size=512, head_hidden_size=32,
    num_multi_query_groups=2, num_attention_heads=8, num_layers=2,
    vocab_size=1024, max_sequence_length=64,
)


@pytest.fixture
def probe_env(tmp_path, monkeypatch):
    """Fresh autotune table + TPU-gate patches + a chain-construction
    tracker; returns (bench module, calls_scheme list)."""
    monkeypatch.setenv("CHATGLM_Q_TPU_AUTOTUNE", str(tmp_path / "at.json"))
    AT.reload()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # kernels must still run in interpret mode on this CPU host
    monkeypatch.setattr(PM, "_is_tpu", lambda: False)

    spec = importlib.util.spec_from_file_location(
        "bench_for_test", os.path.join(os.path.dirname(__file__), "..",
                                       "bench.py"))
    bench_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_mod)
    # bench.py enables the persistent compile cache at import — UNDO it for
    # the test process: the cache holds TPU-topology-process XLA:CPU
    # executables with mismatched machine features, and loading one later
    # in the suite segfaults (cpu_aot_loader "could lead to SIGILL").
    jax.config.update("jax_compilation_cache_dir", None)

    calls_scheme = []
    real_chain = bench_mod.make_probe_chain

    def tracking_chain(K, L, scheme):
        calls_scheme.append(scheme)
        return real_chain(K, L, scheme)

    monkeypatch.setattr(bench_mod, "make_probe_chain", tracking_chain)
    return bench_mod, calls_scheme


def _probe_entry():
    AT.reload()
    return AT.lookup("int4", PM._block_m(1), CFG.hidden_size,
                     int4_storage_k(CFG.inner_hidden_size))


def test_scheme_probe_records_winner(probe_env, monkeypatch):
    bench_mod, calls_scheme = probe_env
    fake = {"broadcast": 3e-4, "grouped": 2e-4, "selscale": 1e-4}
    monkeypatch.setattr(bench_mod, "slope_time_auto",
                        lambda fn, lo, hi: fake[calls_scheme[-1]])

    bench_mod.ensure_scheme_probe(CFG, "int4g32")

    entry = _probe_entry()
    assert entry is not None and entry["scheme"] == "selscale", entry
    assert entry.get("probe") is True
    # every decode shape got a provisional entry
    H = CFG.hidden_size
    for (k, n) in ((H, CFG.q_size), (CFG.q_size, H),
                   (int4_storage_k(CFG.inner_hidden_size), H)):
        e = AT.lookup("int4", PM._block_m(1), int4_storage_k(k), n)
        assert e is not None and e["scheme"] == "selscale", (k, n, e)

    # a SECOND probe is a no-op (real-or-probe entry present)
    calls_before = len(calls_scheme)
    bench_mod.ensure_scheme_probe(CFG, "int4g32")
    assert len(calls_scheme) == calls_before


def test_scheme_probe_survives_failing_scheme(probe_env, monkeypatch):
    """A scheme whose timing chain raises (e.g. fails to compile) loses."""
    bench_mod, calls_scheme = probe_env

    def flaky_slope(fn, lo, hi):
        if calls_scheme[-1] == "selscale":
            raise RuntimeError("mosaic says no")
        return {"broadcast": 2e-4, "grouped": 3e-4}[calls_scheme[-1]]

    monkeypatch.setattr(bench_mod, "slope_time_auto", flaky_slope)
    bench_mod.ensure_scheme_probe(CFG, "int4g32")
    entry = _probe_entry()
    assert entry is not None and entry["scheme"] == "broadcast", entry


def test_scheme_probe_survives_compile_crash(probe_env, monkeypatch):
    """The EAGER dispatch probe (which compiles the kernel) can also raise
    — e.g. a Mosaic error; it must lose, not crash the headline run."""
    bench_mod, _ = probe_env

    real_impl = bench_mod._probe_impl_call

    def crashing_impl(c, p, s, scheme):
        if scheme == "grouped":
            raise RuntimeError("mosaic exploded at dispatch")
        return real_impl(c, p, s, scheme)

    monkeypatch.setattr(bench_mod, "_probe_impl_call", crashing_impl)
    monkeypatch.setattr(bench_mod, "slope_time_auto",
                        lambda fn, lo, hi: 2e-4)

    bench_mod.ensure_scheme_probe(CFG, "int4g32")
    entry = _probe_entry()
    assert entry is not None and entry["scheme"] != "grouped", entry
