"""Tracing / profiling helpers (SURVEY §5.1 parity).

The reference uses landmarks auto-instrumentation (`[@@@landmark
"auto"]`, de.ml:1) plus median-of-N timing with GC compaction in its
bench (b.ml:11–20).  The TPU equivalents here: `jax.profiler` trace
contexts (Perfetto-compatible), annotated named scopes on the codec
stages, and fetch-synchronized timers that are correct over the axon
tunnel (where ``block_until_ready`` does not actually synchronize).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/decompress_tpu_trace"):
    """Capture a jax.profiler trace of the enclosed codec calls.

    View with Perfetto / TensorBoard.  Usage::

        with profiling.device_trace("/tmp/trace"):
            de.deflate(data, 6)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named profiler scope for a codec stage (shows up in traces)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class FetchTimer:
    """Wall timer that forces a real device fetch before stopping —
    required on transports where block_until_ready is asynchronous."""

    def __init__(self) -> None:
        self.laps: list[float] = []
        self._t0 = None

    def start(self) -> None:
        self._t0 = time.time()

    def stop(self, result=None) -> float:
        if result is not None:
            import numpy as np

            np.asarray(result)  # forces completion + transfer
        dt = time.time() - self._t0
        self.laps.append(dt)
        return dt

    @property
    def median(self) -> float:
        xs = sorted(self.laps)
        return xs[len(xs) // 2] if xs else float("nan")
