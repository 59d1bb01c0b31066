"""Profiling & latency instrumentation.

Reference has only wall-clock latency logging (``translate.py:29-64``:
batch_size=1 timing appended to ``latency.txt``). TPU equivalents here:

* ``trace_annotation(name)``: jax.profiler annotation context so encode /
  decode phases show up in TensorBoard profiles;
* ``profile_trace(log_dir)``: capture a full profiler trace around a block;
* ``LatencyRecorder``: the reference's ``latency.txt`` CSV contract.
"""

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class LatencyRecorder:
    """Accumulates per-sample wall-clock and appends the reference's
    ``latency.txt`` row: ``method\ttask\ttotal\tn\tavg``."""

    def __init__(self, method: str = "", task: str = ""):
        self.method = method
        self.task = task
        self.total = 0.0
        self.n = 0

    @contextlib.contextmanager
    def measure(self, n: int = 1):
        t0 = time.perf_counter()
        yield
        self.total += time.perf_counter() - t0
        self.n += n

    @property
    def avg(self) -> float:
        return self.total / max(self.n, 1)

    def append_to(self, path: str = "latency.txt"):
        with open(path, "a") as f:
            f.write(f"{self.method}\t{self.task}\t{self.total}\t{self.n}\t"
                    f"{self.avg}\n")
