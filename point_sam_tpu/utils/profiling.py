"""Tracing / profiling hooks (first-class, unlike the reference which has
none — SURVEY.md §5 "Tracing/profiling: none").

- ``trace(dir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device execution.
- ``StageTimer``: lightweight named wall-clock stage timing with device
  synchronization, for per-stage breakdowns in benchmarks and the trainer.
- ``annotate``: TraceAnnotation wrapper so stages show up in device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulates wall-clock per named stage; ``sync=True`` blocks on the
    given arrays so async dispatch doesn't hide device time."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        import jax

        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: dict(
                total_s=round(self.totals[name], 4),
                mean_ms=round(self.totals[name] / max(self.counts[name], 1)
                              * 1e3, 3),
                count=self.counts[name],
            )
            for name in sorted(self.totals)
        }

    def report(self) -> str:
        lines = [
            f"{name:32s} {s['mean_ms']:10.2f} ms x{s['count']}"
            for name, s in self.summary().items()
        ]
        return "\n".join(lines)
