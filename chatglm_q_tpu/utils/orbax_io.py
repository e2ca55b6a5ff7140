"""Orbax-backed native checkpointing (multi-host / sharded arrays).

The *interchange* format stays the reference's safetensors layout
(chatglm_q_tpu/loader.py — SURVEY.md §5 checkpoint/resume); this module
adds the TPU-production path the reference never needed: saving/restoring a
(possibly GSPMD-sharded) param tree directly with Orbax, so multi-host
slices checkpoint without gathering to one host, and restore places each
shard on its owning devices.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import jax


def save_params(path: Union[str, Path], params: dict):
    """Save a (sharded or host-local) param tree to an Orbax checkpoint."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params)
        ckptr.wait_until_finished()


def load_params(
    path: Union[str, Path],
    like: Optional[dict] = None,
    shardings: Optional[dict] = None,
):
    """Restore a param tree.

    ``like``: a tree of arrays or ShapeDtypeStructs giving the target
    structure; combined with ``shardings`` (matching tree of
    jax.sharding.Sharding) the restore places shards directly on devices.
    """
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(path)
        if shardings is not None:
            target = jax.tree.map(
                lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
                like,
                shardings,
            )
        else:
            target = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like
            )
        return ckptr.restore(path, target)
