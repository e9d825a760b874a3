"""Profiling hooks (SURVEY.md §5: the reference has none; the TPU build
provides jax.profiler trace capture and per-step timing for free via XLA)."""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with device sync at window edges; tracks a
    running images/sec figure without syncing every step."""

    def __init__(self, window=20):
        self.window = window
        self._count = 0
        self._images = 0
        self._t0 = None
        self.images_per_sec = None

    def update(self, batch_size, sync_value=None):
        # sync by VALUE FETCH, not block_until_ready: through a remote
        # dispatch transport (axon) block_until_ready can return before
        # device execution finishes, inflating images/sec (CLAUDE.md)
        if self._t0 is None:
            if sync_value is not None:
                jax.device_get(sync_value)
            self._t0 = time.perf_counter()
            self._count = 0
            self._images = 0
            return self.images_per_sec
        self._count += 1
        self._images += batch_size
        if self._count >= self.window:
            if sync_value is not None:
                jax.device_get(sync_value)
            dt = time.perf_counter() - self._t0
            self.images_per_sec = self._images / dt
            self._t0 = time.perf_counter()
            self._count = 0
            self._images = 0
        return self.images_per_sec


def annotate(name):
    """Named trace region for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def cli_trace(args, capture=True):
    """Context manager behind the -trace_dir CLI flag: a jax.profiler trace
    of the wrapped block when `capture` and the flag is set, else a no-op."""
    trace_dir = getattr(args, 'trace_dir', None)
    if capture and trace_dir:
        print('=> Capturing profiler trace to ' + trace_dir)
        return trace(trace_dir)
    return contextlib.nullcontext()
