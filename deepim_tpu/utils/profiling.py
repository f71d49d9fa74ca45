"""Profiling & tracing: named scopes, stage timers, xprof trace capture.

Rebuild (and upgrade) of the reference's only observability —
``deepim/core/callback.py §Speedometer`` samples/sec logging.  Adds:

- :func:`trace`: context manager around ``jax.profiler.trace`` writing an
  xprof/TensorBoard trace directory.
- :func:`stage`: ``jax.named_scope`` wrapper so raster/zoom/CNN/compose
  show up as named regions inside compiled-program traces.
- :class:`StageTimer`: host-side wall-clock timing with device sync —
  the quick per-stage numbers used by bench/CI (a full xprof run is the
  deep tool).
- :class:`Speedometer`: the reference's samples/sec logger, as an
  iterator wrapper.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


def stage(name: str):
    """Named scope for a pipeline stage (shows up in xprof traces)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an xprof trace of the enclosed block into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage timing with device synchronization.

    >>> t = StageTimer()
    >>> with t.time("render"):
    ...     out = render(...)  # timed incl. device completion
    >>> t.summary()
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, result=None):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            out = box.get("result", result)
            if out is not None:
                jax.block_until_ready(out)
            else:
                # no handle given: sync the whole device queue
                for d in jax.devices()[:1]:
                    jax.device_put(0.0, d).block_until_ready()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name, tot in sorted(self.totals.items(), key=lambda x: -x[1]):
            n = self.counts[name]
            lines.append(f"{name:<24} {tot * 1e3 / max(n, 1):>9.2f} ms/call"
                         f"  x{n} = {tot * 1e3:>9.1f} ms")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


class Speedometer:
    """samples/sec logging iterator (reference ``callback.py §Speedometer``).

    >>> for step, batch in Speedometer(loader, batch_size=16, every=20,
    ...                                log=print):
    ...     ...
    """

    def __init__(self, iterable, batch_size: int, every: int = 20,
                 log=print):
        self.iterable = iterable
        self.batch_size = batch_size
        self.every = every
        self.log = log

    def __iter__(self):
        t0 = time.perf_counter()
        for i, item in enumerate(self.iterable):
            yield i, item
            if (i + 1) % self.every == 0:
                dt = time.perf_counter() - t0
                t0 = time.perf_counter()
                self.log(
                    f"[speedometer] step {i + 1}: "
                    f"{self.every * self.batch_size / dt:.1f} samples/s"
                )
