"""Training step over (possibly quantized) models.

The reference supports backprop *through* quantized layers (gradient to the
activation only, int8/qlinear.py:42-52) so fp float parameters — norms,
biases, dense layers — can be tuned while packed weights stay frozen.  This
module provides that as a functional train step: partition the param tree
into float (trainable) and integer (frozen) leaves, differentiate w.r.t.
the float subtree only, and apply an optax update.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import ChatGLM2Config, TpuRuntimeConfig
from ..models import chatglm2 as M


def _is_float(x) -> bool:
    return jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)


def partition_params(params):
    """Split into (trainable float leaves, frozen leaves); each tree has
    None at the other's positions.

    A QUANTIZED linear/embedding is frozen as a UNIT: its float
    ``weight_scale`` and ``bias`` are buffers of the packed weight
    (reference registers them as non-trainable, int8/qlinear.py:83-87) —
    dtype-only partitioning would hand scales to the optimizer, whose
    weight decay then shrinks them toward 0 even with zero gradient,
    silently corrupting the frozen weights' dequantization."""
    def tag(tree):
        # returns tree of bools: True = trainable
        if isinstance(tree, dict):
            w = tree.get("weight")
            quantized = w is not None and not isinstance(w, dict) \
                and not _is_float(w)
            return {
                k: (jax.tree.map(lambda _: False, v)
                    if quantized else tag(v))
                for k, v in tree.items()
            }
        return jax.tree.map(_is_float, tree)

    flags = tag(params)
    # trainable masters are held in f32 regardless of the checkpoint dtype
    # (the reference's Linear/Embedding cast weights to the activation
    # dtype at call time, model.py:76-87, exactly so fp32 masters can run
    # fp16/bf16 compute) — fp16 masters break optimizers outright: adam's
    # grad² underflows to 0 and eps=1e-8 rounds to 0, so the very first
    # update divides by zero
    trainable = jax.tree.map(
        lambda x, f: jnp.asarray(x, jnp.float32) if f else None,
        params, flags)
    frozen = jax.tree.map(lambda x, f: None if f else x, params, flags)
    return trainable, frozen


def merge_params(trainable, frozen):
    return jax.tree.map(
        lambda a, b: b if a is None else a,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )


def make_train_step(
    config: ChatGLM2Config,
    quant_type: str,
    optimizer: optax.GradientTransformation,
    dtype=jnp.bfloat16,
    rt: Optional[TpuRuntimeConfig] = None,
) -> Callable:
    """Returns train_step(trainable, frozen, opt_state, input_ids, labels)
    → (trainable, opt_state, loss).  Jit/pjit-able."""
    rt = rt or TpuRuntimeConfig()
    if rt.tp_pallas:
        raise ValueError(
            "rt.tp_pallas is a forward/serving-only path (the per-shard "
            "Pallas kernels have no autodiff rule); train with tp_pallas="
            "False — the GSPMD route differentiates through the custom-VJP "
            "linears.")

    def loss_fn(trainable, frozen, input_ids, labels, dropout_rng):
        params = merge_params(trainable, frozen)
        loss, _ = M.forward(
            params, config, input_ids, labels=labels,
            quant_type=quant_type, dtype=dtype, rt=rt,
            dropout_rng=dropout_rng,
        )
        return loss

    def train_step(trainable, frozen, opt_state, input_ids, labels,
                   dropout_rng=None):
        loss, grads = jax.value_and_grad(loss_fn)(
            trainable, frozen, input_ids, labels, dropout_rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    return train_step
