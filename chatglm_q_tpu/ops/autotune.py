"""Measured kernel-config table: profile-guided block sizes and schemes.

The reference ships Triton kernels with hand-frozen ``BLOCK_*`` constants
(int4/triton_ops.py:26-47); round 1 reproduced that with env-var sweeps.
This module closes the loop the TPU way:

* ``benchmarks/autotune_sweep.py`` times candidate (bk, bn, scheme, impl)
  configs for each linear shape ON HARDWARE (slope timing over chained
  cache-busting applications) and records the winners here;
* kernels consult the table at TRACE time — shapes are static under jit,
  so a lookup costs nothing at run time and adds no recompiles beyond the
  config it selects;
* precedence at a call site: explicit env override > measured table >
  built-in default, so sweeps and production never fight.

The table is JSON at ``$CHATGLM_Q_TPU_AUTOTUNE`` (default
``~/.cache/chatglm_q_tpu/autotune.json``), keyed by
``{device_kind}|{kernel}|m{bm}k{K}n{N}`` — bm is the padded block-M bucket
(see pallas_matmul._block_m), so all decode batch sizes that share a
program share an entry.
"""
from __future__ import annotations

import json
import os
import threading

import jax

_DEFAULT_PATH = os.path.expanduser("~/.cache/chatglm_q_tpu/autotune.json")

# measured winners checked into the repo (the reference's analog is its
# hand-frozen Triton BLOCK_* constants): a fresh clone gets tuned configs
# for known device kinds without running a sweep; a user-cache sweep entry
# always overrides the packaged default
_PACKAGED_DEFAULTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "autotune_defaults.json")

_lock = threading.Lock()
_table: dict | None = None
_device_kind: str | None = None


def table_path() -> str:
    return os.environ.get("CHATGLM_Q_TPU_AUTOTUNE", _DEFAULT_PATH)


def _read(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _load() -> dict:
    global _table
    if _table is None:
        merged = _read(_PACKAGED_DEFAULTS)
        merged.update(_read(table_path()))
        _table = merged
    return _table


def reload() -> None:
    """Drop the in-memory table (tests / after an external sweep)."""
    global _table
    with _lock:
        _table = None


def device_kind() -> str:
    global _device_kind
    if _device_kind is None:
        try:
            _device_kind = jax.devices()[0].device_kind.replace(" ", "_")
        except Exception:
            _device_kind = "unknown"
    return _device_kind


def _key(kernel: str, bm: int, k: int, n: int) -> str:
    return f"{device_kind()}|{kernel}|m{bm}k{k}n{n}"


def lookup(kernel: str, bm: int, k: int, n: int) -> dict | None:
    """Best measured config for this kernel/shape, or None."""
    return _load().get(_key(kernel, bm, k, n))


def record(kernel: str, bm: int, k: int, n: int, config: dict,
           us_per_call: float | None = None) -> None:
    """Persist the winning config (atomic rewrite; keeps existing keys)."""
    with _lock:
        entry = dict(config)
        if us_per_call is not None:
            entry["us"] = round(us_per_call, 3)
        path = table_path()
        try:
            with open(path) as f:
                on_disk = json.load(f)
        except (OSError, ValueError):
            on_disk = {}
        on_disk[_key(kernel, bm, k, n)] = entry
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(on_disk, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
        global _table
        _table = None  # lazy re-merge with the packaged defaults
