"""Multi-host runtime initialization and process-level helpers.

The reference has no distributed runtime at all (SURVEY.md §2: no
torch.distributed/NCCL/MPI anywhere); on TPU pods the runtime layer is
``jax.distributed`` — one process per host, ICI within a slice, DCN across
hosts, with failure detection via the coordination service's built-in
heartbeat (a missed heartbeat terminates the job rather than hanging —
the multi-host analog of the reference's fail-fast philosophy).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize the multi-host runtime (no-op on single-process runs).

    On Cloud TPU the arguments are auto-detected from the metadata server;
    pass them explicitly elsewhere.  Must run before first backend use.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def is_primary() -> bool:
    """True on the host that does scheduling/logging (host 0)."""
    return jax.process_index() == 0


def primary_only(fn):
    """Run fn only on host 0 (e.g. logging, checkpoint writes)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_primary():
            return fn(*args, **kwargs)
        return None

    return wrapper


def local_batch_slice(global_batch: int) -> slice:
    """The rows of a global batch owned by this process (data-parallel
    serving: host 0 schedules request→row assignment, each host prefixes
    its own shard; see serving/engine.py)."""
    n = jax.process_count()
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
