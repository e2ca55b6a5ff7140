"""Profiling / tracing helpers.

The reference's only observability is the decoder ``time_log`` wall-clock
report (decoder.py:80-87, :99-106) — kept in serving/decoder.py.  On TPU
this module adds XLA-level tracing via ``jax.profiler`` (TensorBoard
trace viewer shows per-kernel HLO cost, DMA overlap, ICI traffic).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture an XLA profiler trace around a block.

    View with: tensorboard --logdir <log_dir>  (Profile tab).
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class DecodeStats:
    """tok/s accumulator matching the reference time_log semantics."""

    step_times: list = field(default_factory=list)
    _t0: float = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def lap(self):
        now = time.perf_counter()
        self.step_times.append(now - self._t0)
        self._t0 = now

    @property
    def prefill_latency(self) -> float:
        return self.step_times[0] if self.step_times else 0.0

    @property
    def decode_tps(self) -> float:
        rest = self.step_times[1:]
        return len(rest) / sum(rest) if rest else 0.0

    @property
    def avg_tps(self) -> float:
        return (
            len(self.step_times) / sum(self.step_times) if self.step_times else 0.0
        )

    def report(self, prefix_len: int, gen_len: int) -> str:
        return (
            f"Decoder:\n  len: {prefix_len}(prefix) + {gen_len}(gen)\n"
            f" init: {self.prefill_latency:.6f} s\n"
            f"  sum: {sum(self.step_times):.6f} s\n"
            f"  gen: {self.decode_tps:.6f} tok/s\n"
            f"  avg: {self.avg_tps:.6f} tok/s"
        )
