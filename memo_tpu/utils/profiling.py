"""Tracing / profiling hooks (SURVEY §5: none in the reference).

``stage_timer`` wraps pipeline stages with wall-clock accounting;
``trace_context`` wraps a region in a ``jax.profiler`` trace when a trace
directory is given (CLI ``--profile DIR``), viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

from memo_tpu.utils.logging import get_logger

log = get_logger(__name__)


@dataclass
class StageTimes:
    times: dict[str, float] = field(default_factory=dict)

    def add(self, name: str, seconds: float) -> None:
        self.times[name] = self.times.get(name, 0.0) + seconds

    def report(self) -> str:
        return ", ".join(f"{k}={v:.3f}s" for k, v in self.times.items())


GLOBAL_TIMES = StageTimes()


@contextlib.contextmanager
def stage_timer(name: str, times: StageTimes | None = None, log_it: bool = True):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        (times or GLOBAL_TIMES).add(name, dt)
        if log_it:
            log.debug("stage %s: %.3fs", name, dt)


@contextlib.contextmanager
def trace_context(trace_dir: str | None):
    """jax.profiler trace when trace_dir is set; no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
