"""jax.profiler integration — first-class tracing the reference lacks
(SURVEY.md §5: its only observability is tqdm + wandb scalars)."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """Capture a TPU profile (TensorBoard/XProf format) when trace_dir is set."""
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir, create_perfetto_link=False):
        yield
    print(f"[profiler] trace written to {trace_dir}")


class StepTimer:
    """Wall-clock per-step timing with simple percentile summary."""

    def __init__(self) -> None:
        self.samples = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        return {
            "steps": n,
            "mean_s": sum(s) / n,
            "p50_s": s[n // 2],
            "p90_s": s[min(n - 1, int(0.9 * n))],
            "min_s": s[0],
        }
