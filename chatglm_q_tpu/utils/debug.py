"""Numerical-debugging helpers (SURVEY.md §5 "race detection / sanitizers").

The reference's nearest analogs are kernel input assertions
(int8/triton_ops.py:94-110) and a NaN assert in GPTQ
(int8/quantizer.py:115).  The TPU-native equivalents:

* ``enable_nan_checks()`` — ``jax_debug_nans``: every jit result is checked
  and the failing primitive is re-run un-jitted for a precise traceback;
* ``interpret_kernels()`` — context manager forcing all Pallas kernels
  through the interpreter for element-exact kernel debugging;
* ``check_quant_params()`` — shape/dtype validation of a quantized param
  tree (the loader API boundary check).
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


def enable_nan_checks(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def interpret_kernels():
    """Run all Pallas kernels in interpreter mode within the block."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def check_quant_params(params: dict, config, quant_type: str) -> list[str]:
    """Validate a param tree's shapes/dtypes; returns a list of problems
    (empty = OK).  Mirrors the reference kernels' input guards at the API
    boundary instead of per-call."""
    problems = []
    H, I, V = config.hidden_size, config.inner_hidden_size, config.vocab_size
    L = config.num_layers

    def expect(path, arr, shape=None, dtype=None):
        if shape is not None and tuple(arr.shape) != tuple(shape):
            problems.append(f"{path}: shape {arr.shape} != {shape}")
        if dtype is not None and arr.dtype != dtype:
            problems.append(f"{path}: dtype {arr.dtype} != {dtype}")

    from ..ops.quant import int4_storage_k

    def check_linear(path, p, k, n, stacked):
        lead = (L,) if stacked else ()
        ks = int4_storage_k(k)
        if quant_type == "int4g32":
            expect(path + ".weight", p["weight"], lead + (ks // 2, n), jnp.uint8)
            expect(path + ".weight_scale", p["weight_scale"], lead + (ks // 32, n))
        elif quant_type == "int8":
            expect(path + ".weight", p["weight"], lead + (ks, n), jnp.int8)
            expect(path + ".weight_scale", p["weight_scale"], lead + (n,))
        else:
            expect(path + ".weight", p["weight"], lead + (k, n))

    qs = config.q_size
    kv = config.kv_size
    lyr = params["layers"]
    check_linear("q_proj", lyr["q_proj"], H, qs, True)
    check_linear("kv_proj", lyr["kv_proj"], H, 2 * kv, True)
    check_linear("o_proj", lyr["o_proj"], qs, H, True)
    check_linear("w_in_h", lyr["w_in_h"], H, int4_storage_k(I), True)
    check_linear("w_in_gate", lyr["w_in_gate"], H, int4_storage_k(I), True)
    check_linear("w_out", lyr["w_out"], I, H, True)
    # lm_head's vocab dim may be padded to LMHEAD_N_MULTIPLE (quantized
    # factories/pipelines apply ops/quant.lmhead_pad; logits are sliced
    # back to vocab_size at every call site)
    from ..ops.quant import LMHEAD_N_MULTIPLE

    v_stored = params["lm_head"]["weight"].shape[-1]
    v_padded = -(-V // LMHEAD_N_MULTIPLE) * LMHEAD_N_MULTIPLE
    v_ok = v_padded if (quant_type != "none" and v_stored == v_padded) else V
    check_linear("lm_head", params["lm_head"], H, v_ok, False)
    return problems
