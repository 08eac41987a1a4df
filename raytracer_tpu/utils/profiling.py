"""Profiling/metrics hooks (SURVEY.md §5 "Tracing / profiling").

The reference's instrumentation is a wall-clock print around render(); ours is
`jax.profiler` traces (XProf/Perfetto) around the step plus rays/s counters
carried in the wavefront state (renderer.render count_rays=True).
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def xprof_trace(logdir: str):
    """Capture a device trace viewable in XProf/Perfetto/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that blocks on device completion."""

    def __init__(self):
        self.t0 = None
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0


def timed(fn, *args, repeats: int = 3, inner: int = 8):
    """Best-of-N amortized wall time of fn(*args), post-warmup.

    Issues `inner` back-to-back dispatches and blocks once: robust against
    async-dispatch timing jitter (a single block_until_ready round-trip can
    under- or over-state sub-ms kernels). No device→host readbacks.
    """
    out = jax.block_until_ready(fn(*args))  # warmup/compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return out, best
