"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
XLA's host-platform device-count flag (SURVEY.md §4).
"""
import os

# Must be set before jax initializes
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PLATFORM_NAME'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax
jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: the slow tier is compile-dominated
# (full-architecture models on the 8-device host mesh); caching XLA
# executables across runs makes `make test-full` re-runnable in minutes
# instead of hours. The cache key includes jaxlib version and flags —
# but NOT the host CPU's feature set, and XLA:CPU AOT executables are
# machine-feature specific: entries compiled on a previous host with a
# wider ISA (amx/avx10) load here with SIGILL warnings. Scope the cache
# per CPU-feature fingerprint so a moved disk starts a fresh cache.
import hashlib


def _machine_fingerprint():
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith('flags'):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return platform.machine()


_cache_dir = os.path.join(
    os.path.dirname(__file__), '..', '.cache',
    f'jax_test_cache-{_machine_fingerprint()}')
jax.config.update('jax_compilation_cache_dir', os.path.abspath(_cache_dir))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
try:
    jax.config.update('jax_persistent_cache_enable_xla_caches', 'all')
except Exception:  # older jaxlib without the XLA-caches knob
    pass

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _isolated_runs_dir(tmp_path, monkeypatch):
    """Point RUNS_DIR away from the repo's real training runs.

    `synthesize.default_checkpoint` resolves the active config's latest
    run checkpoint when no checkpoint is passed; tests must exercise
    the random-init fallback deterministically, not whatever training
    run happens to live under ./runs.
    """
    import promonet_tpu
    monkeypatch.setattr(promonet_tpu, 'RUNS_DIR', tmp_path / 'runs')
    yield


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope='session')
def audio(rng):
    """A second of speech-like harmonic audio at the native rate"""
    import promonet_tpu
    sr = promonet_tpu.SAMPLE_RATE
    t = np.arange(sr) / sr
    pitch = 150. + 50. * np.sin(2 * np.pi * 2. * t)
    phase = 2 * np.pi * np.cumsum(pitch) / sr
    signal = sum(
        (0.5 ** k) * np.sin(k * phase) for k in range(1, 5))
    signal *= 0.4 + 0.3 * np.sin(2 * np.pi * 3. * t)
    signal += 0.01 * rng.standard_normal(sr)
    signal = 0.5 * signal / np.abs(signal).max()
    return signal.astype(np.float32)[None]
