"""Tracing / profiling hooks.

The reference has only ad-hoc wall-clock prints (`models/llama.py:340-356`,
`examples/bench.py:50-59`) and a commented-out torch Timer; here profiling
is first-class: jax.profiler traces viewable in XProf/TensorBoard/Perfetto,
plus a lightweight step timer for the same colored latency report the
reference prints.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler trace (XPlane) under `log_dir` when set;
    no-op otherwise. View with xprof/tensorboard or Perfetto."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for a named region inside a trace."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timer; reports like the reference's bench
    ("Decoding Latency ms/token" / "Decoding Throughput token/s",
    `examples/bench.py:58-59`)."""

    def __init__(self):
        self.t0 = None
        self.steps = 0
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed += time.perf_counter() - self.t0
        return False

    def step(self, n: int = 1):
        self.steps += n

    @property
    def ms_per_token(self) -> float:
        return 1000.0 * self.elapsed / max(self.steps, 1)

    @property
    def tokens_per_s(self) -> float:
        return self.steps / max(self.elapsed, 1e-9)

    def report(self, batch_size: int = 1) -> str:
        return (f"Decoding Latency {self.ms_per_token:.2f} ms/token | "
                f"Decoding Throughput "
                f"{self.tokens_per_s * batch_size:.2f} token/s")
