"""Robust on-device timing for this environment.

The tunneled TPU has two measurement hazards (discovered empirically, see
.claude/skills/verify/SKILL.md): ``block_until_ready()`` does not actually
wait, and every dispatch pays ~30 ms round-trip latency.  Correct protocol:

  1. amortize the work inside one jit (e.g. ``lax.scan`` chains with a data
     dependence so XLA cannot hoist),
  2. force completion by fetching a scalar to the host,
  3. subtract the dispatch floor by timing two different chain lengths and
     using the slope.
"""
from __future__ import annotations

import time
from typing import Callable


def force(x) -> float:
    """Force execution; returns a host scalar derived from x."""
    import jax.numpy as jnp

    return float(jnp.asarray(x).ravel()[0])


def time_scalar_fn(fn: Callable[[], object], repeats: int = 3) -> float:
    """Median wall time of fn(), where fn must end in a host-scalar fetch."""
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def slope_time(run_n: Callable[[int], object], n_small: int, n_large: int,
               repeats: int = 3) -> float:
    """Per-iteration time via slope between two amortized chain lengths.

    ``run_n(n)`` must execute n iterations on device and fetch a scalar.
    """
    # warm both compilations
    run_n(n_small)
    run_n(n_large)
    t_small = time_scalar_fn(lambda: run_n(n_small), repeats)
    t_large = time_scalar_fn(lambda: run_n(n_large), repeats)
    return max(t_large - t_small, 1e-9) / (n_large - n_small)


def slope_time_auto(run_n: Callable[[int], object], n_small: int = 2,
                    n_large: int = 8, repeats: int = 3,
                    target_delta_s: float = 0.12, max_n: int = 2048) -> float:
    """slope_time that grows n_large until the measured work delta dominates
    the dispatch noise.

    Through this deployment's tunnel a dispatch costs ~30 ms with several ms
    of jitter; a slope whose total work delta is a few ms measures NOISE
    (observed: 0.0 us and >1x-speed-of-light "results").  ``run_n`` must
    accept any n in [n_small, max_n] without recompiling (dynamic
    ``fori_loop`` rep count).
    """
    while True:
        t = slope_time(run_n, n_small, n_large, repeats)
        if t * (n_large - n_small) >= target_delta_s or n_large >= max_n:
            return t
        # size the next delta from this estimate; overshoot 1.5x for safety,
        # and at least double so garbage-small estimates still make progress
        want = int(1.5 * target_delta_s / max(t, 1e-9))
        n_large = min(max_n, max(2 * n_large, n_small + want))
