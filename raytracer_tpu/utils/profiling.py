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


def timed(fn, *args, repeats: int = 3, inner: int | None = None):
    """Best-of-N amortized wall time of fn(*args), post-warmup.

    Issues `inner` back-to-back dispatches and blocks once: robust against
    async-dispatch timing jitter (a single block_until_ready round-trip can
    under- or over-state sub-ms kernels). No device→host readbacks. `inner`
    auto-scales so one repeat costs ~0.5 s (long kernels get inner=1).
    """
    jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))  # calibration run
    t_cal = time.perf_counter() - t0
    if inner is None:
        inner = max(1, min(8, int(0.5 / max(t_cal, 1e-4))))
    best = t_cal
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return out, best
