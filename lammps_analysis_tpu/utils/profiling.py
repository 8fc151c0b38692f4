"""Tracing / profiling hooks.

The reference's observability is ad-hoc timers + throughput debug logs
(``utils/meta_functions.py:294-324``, RDF million-pairs/s counters at
``radial_distribution_function.py:452-459``). This build keeps those
counters (see the RDF calculator's pairs/s log) and adds first-class
device profiling via ``jax.profiler``.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

log = logging.getLogger(__name__)


class Stopwatch:
    """Accumulating named timers with throughput reporting."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [
            f"{name}: {total:.4f} s over {self.counts[name]} calls"
            for name, total in sorted(self.totals.items())
        ]
        return "\n".join(lines)

    def throughput(self, name: str, items: float) -> float:
        """items per second for an accumulated section."""
        total = self.totals.get(name, 0.0)
        return items / total if total > 0 else 0.0


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Capture a ``jax.profiler`` trace (viewable in TensorBoard/XProf).

    No-op when ``log_dir`` is None so call sites can leave the hook in
    place unconditionally.
    """
    if log_dir is None:
        yield
        return
    import jax

    log.info("jax profiler trace -> %s", log_dir)
    with jax.profiler.trace(str(log_dir)):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler timelines (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
