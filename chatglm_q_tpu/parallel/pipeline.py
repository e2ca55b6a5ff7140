"""GPipe-style pipeline parallelism over the stacked layer dimension.

The reference has no pipeline parallelism (SURVEY §2: "PP/EP — not in
reference"; its nearest ancestor is the GPTQ driver's CPU↔GPU layer
pipeline, examples/quantize_gptq/int4g32.py:56-86).  This module adds it
the TPU way: the model already stores its L blocks as ONE stacked pytree
(the ``lax.scan`` layout, models/chatglm2.py), so pipeline stages are just
an even split of the leading L dim over a ``stage`` mesh axis —
``PartitionSpec("stage")`` on every layer leaf IS the stage placement, no
per-stage module objects.  ``shard_map`` runs each stage's local sub-scan
and rotates micro-batch activations to the next stage with ``lax.ppermute``
over ICI/DCN; differentiating through the schedule yields the reverse
(backward) pipeline automatically, so training through (frozen) quantized
layers works unchanged.

Scope: full-sequence forward/training (the parity path — what pod-scale
fine-tuning needs).  Serving uses TP/DP (+ the sharded KV designs); a
decode pipeline would serialize layers across chips per token and lose to
TP on a slice, so it is deliberately absent.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ChatGLM2Config, TpuRuntimeConfig
from ..models import chatglm2 as M

STAGE_AXIS = "stage"

_DEFAULT_RT = TpuRuntimeConfig()


def stage_pspecs(params_layers) -> dict:
    """P(stage) on the leading (L) dim of every stacked layer leaf."""
    return jax.tree.map(lambda _: P(STAGE_AXIS), params_layers)


def shard_layers(params: dict, mesh: Mesh) -> dict:
    """device_put the ``layers`` subtree with its stage sharding (other
    subtrees replicate)."""
    out = dict(params)
    out["layers"] = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params["layers"], stage_pspecs(params["layers"]),
    )
    return out


def pipeline_blocks(
    layers_params,            # stacked (L, ...) pytree, L-dim stage-sharded
    h: jax.Array,             # (B, T, H) embedded activations
    freqs_cis: jax.Array,     # (B, T, D)
    mask5: jax.Array,         # (B or 1, 1, 1, T, T) additive fp32
    config: ChatGLM2Config,
    quant_type: str,
    rt: TpuRuntimeConfig = _DEFAULT_RT,
    mesh: Mesh | None = None,
    n_micro: int = 2,
):
    """Run the L transformer blocks as an S-stage GPipe pipeline.

    The batch splits into ``n_micro`` micro-batches; step t of the
    ``n_micro + S − 1``-step schedule has stage i processing micro-batch
    ``t − i`` (bubble fraction (S−1)/(n_micro+S−1)).  Activations move
    stage→stage with a single ppermute per step; the final stage's stream
    is masked-psum'd back to every device.  Numerically identical to the
    plain stacked scan (tests/test_pipeline.py).
    """
    assert mesh is not None and STAGE_AXIS in mesh.axis_names, (
        f"pipeline parallelism needs a mesh with a '{STAGE_AXIS}' axis "
        f"(got {None if mesh is None else mesh.axis_names})")
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    S = sizes[STAGE_AXIS]
    L = config.num_layers
    assert L % S == 0, (L, S)
    B = h.shape[0]
    assert B % n_micro == 0, (B, n_micro)
    Bm = B // n_micro

    h_m = h.reshape(n_micro, Bm, *h.shape[1:])
    f_m = freqs_cis.reshape(n_micro, Bm, *freqs_cis.shape[1:])
    if mask5.shape[0] == B:
        mk_m = mask5.reshape(n_micro, Bm, *mask5.shape[1:])
    else:  # shared mask (shape (1, ...)): every micro sees the same bias
        mk_m = jnp.broadcast_to(mask5[None], (n_micro,) + mask5.shape)

    def local(layers_local, h_m, f_m, mk_m):
        i = jax.lax.axis_index(STAGE_AXIS)

        def run_stage(x, fr, mk):
            def body(c, lp):
                c, _ = M.block_forward(lp, c, fr, mk, config, quant_type,
                                       rt, kv_write=None)
                return c, None

            out, _ = jax.lax.scan(body, x, layers_local)
            return out

        n_steps = n_micro + S - 1
        buf = jnp.zeros_like(h_m[0])
        ys = []
        perm = [(s, s + 1) for s in range(S - 1)]
        for t in range(n_steps):  # static unroll: n_steps is small
            m_idx = jnp.clip(t - i, 0, n_micro - 1)
            x_in = jnp.where(i == 0, h_m[min(t, n_micro - 1)], buf)
            fr = jnp.take(f_m, m_idx, axis=0)
            mk = jnp.take(mk_m, m_idx, axis=0)
            y = run_stage(x_in, fr, mk)
            ys.append(y)
            if t < n_steps - 1:
                buf = jax.lax.ppermute(y, STAGE_AXIS, perm)
        # micro m completes on the LAST stage at step m + S − 1; a masked
        # psum replicates the finished stream to every stage
        outs = jnp.stack(ys[S - 1 :], axis=0)           # (n_micro, Bm, T, H)
        outs = jnp.where(i == S - 1, outs, 0.0)
        return jax.lax.psum(outs, STAGE_AXIS)

    # axes other than "stage" are simply unmentioned → replicated
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(stage_pspecs(layers_params), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    out_m = fn(layers_params, h_m, f_m, mk_m)
    return out_m.reshape(B, *h.shape[1:])


def pp_forward(
    params: dict,
    config: ChatGLM2Config,
    input_ids: jax.Array,                 # (B, S)
    labels: jax.Array | None = None,      # (B, S), −100 = ignore
    quant_type: str = "none",
    dtype=jnp.float32,
    rt: TpuRuntimeConfig = _DEFAULT_RT,
    mesh: Mesh | None = None,
    n_micro: int = 2,
):
    """Reference-semantics full forward (models/chatglm2.forward) with the
    block stack pipelined over the ``stage`` mesh axis.  Embedding, final
    RMSNorm, lm_head and the shifted-CE loss run replicated outside the
    pipeline (they are a few % of the FLOPs).  Returns (loss | None,
    logits)."""
    B, S = input_ids.shape
    attention_mask = jnp.ones((B, S), jnp.int32)
    mask_bias, pos = M.build_parity_mask_and_positions(attention_mask, S)
    freqs_table = jnp.asarray(
        M.precompute_freqs_cis(config.head_hidden_size,
                               config.max_sequence_length)
    ).astype(dtype)
    freqs_cis = freqs_table[pos]

    h = M.quant_embedding_lookup(params["word_embedding"], input_ids,
                                 quant_type, dtype)
    h = pipeline_blocks(params["layers"], h, freqs_cis,
                        mask_bias[:, None, None, :, :], config, quant_type,
                        rt, mesh, n_micro)
    h = M.rms_norm(h, params["final_ln"]["weight"], config.layernorm_epsilon)
    logits = M.quant_linear(h, params["lm_head"], quant_type, rt)
    logits = logits[..., : config.vocab_size]

    loss = None
    if labels is not None:
        loss = M.cross_entropy_loss(logits, labels)
    return loss, logits
