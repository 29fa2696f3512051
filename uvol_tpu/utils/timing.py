"""Wall-clock and per-stage timing.

The reference's only profiling tool is an ad-hoc millisecond timer
(`deprecated/encoder/dev/src/timer.h`, used around encode/decode in
`main.cpp:167,207,238,277`). The rebuild makes per-stage timing a
first-class, always-available facility and integrates with `jax.profiler`
for device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional


class Timer:
    """Simple restartable wall-clock timer reporting milliseconds."""

    def __init__(self) -> None:
        self._start = time.perf_counter()

    def restart(self) -> None:
        self._start = time.perf_counter()

    def elapsed_ms(self) -> float:
        return (time.perf_counter() - self._start) * 1e3


class StageTimer:
    """Accumulates wall time per named stage; cheap enough to always be on."""

    def __init__(self) -> None:
        self.totals_ms: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals_ms[name] += (time.perf_counter() - t0) * 1e3
            self.counts[name] += 1

    def report(self) -> List[str]:
        lines = []
        for name in sorted(self.totals_ms, key=self.totals_ms.get, reverse=True):
            n = self.counts[name]
            tot = self.totals_ms[name]
            lines.append(f"{name:32s} {tot:10.2f} ms total  {tot / max(n, 1):8.3f} ms/call  x{n}")
        return lines

    def __str__(self) -> str:
        return "\n".join(self.report())


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Wrap a region in a `jax.profiler` trace when `log_dir` is given."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
