"""Named wall-clock timing contexts with real-time-factor reporting.

Replaces the reference's torchutil.time.context/reset/results machinery
(promonet/synthesize/core.py:222,250; promonet/evaluate/core.py:49-50,
125-129): phases are timed by name, aggregated, and converted to a
real-time factor rtf = audio_seconds / wall_seconds.

On JAX, asynchronous dispatch means a naive timer measures dispatch, not
compute — `context` therefore blocks on outstanding device work at entry
and exit when `synchronize=True`.
"""
import contextlib
import time
from collections import defaultdict

import jax

_totals = defaultdict(float)
_counts = defaultdict(int)
_suppress = False


def reset():
    """Clear all accumulated timings (torchutil.time.reset)"""
    global _suppress
    _totals.clear()
    _counts.clear()
    _suppress = False


@contextlib.contextmanager
def context(name, synchronize=True):
    """Accumulate wall time under `name` (torchutil.time.context)"""
    if _suppress:
        # Inside a `phase` region: the enclosing wall-clock region is
        # the measurement; per-call contexts would double-count (and
        # sum overlapping intervals across worker threads)
        yield
        return
    if synchronize:
        _block_on_device()
    start = time.perf_counter()
    try:
        yield
    finally:
        if synchronize:
            _block_on_device()
        _totals[name] += time.perf_counter() - start
        _counts[name] += 1


@contextlib.contextmanager
def phase(name):
    """Wall-clock a (possibly multi-threaded) region under `name`.

    Used by offline evaluation (evaluate/core.py) where each pipeline
    phase fans its device calls out over a thread pool: the honest
    number is elapsed wall time for the whole region, so nested
    `context` calls are suppressed for the duration.
    """
    global _suppress
    _block_on_device()
    _suppress = True
    start = time.perf_counter()
    try:
        yield
    finally:
        _block_on_device()
        _suppress = False
        _totals[name] += time.perf_counter() - start
        _counts[name] += 1


def results():
    """Total seconds per named phase (torchutil.time.results)"""
    return dict(_totals)


def rtf(num_samples, sample_rate, phases=None):
    """Real-time factor per phase: generated seconds / wall seconds

    Reference: promonet/evaluate/core.py:125-129.
    """
    audio_seconds = num_samples / sample_rate
    timings = results()
    if phases is not None:
        timings = {k: v for k, v in timings.items() if k in phases}
    return {
        name: (audio_seconds / seconds) if seconds > 0 else float('inf')
        for name, seconds in timings.items()}


@contextlib.contextmanager
def profile(directory):
    """Capture a device profile for the enclosed region

    TPU equivalent of the reference's profiling hooks (SURVEY.md §5.1):
    writes a Perfetto/TensorBoard-compatible trace under `directory`
    (inspect with TensorBoard's profile plugin or ui.perfetto.dev).
    """
    jax.profiler.start_trace(str(directory))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _block_on_device():
    try:
        (jax.device_put(0.) + 0).block_until_ready()
    except Exception:
        pass
