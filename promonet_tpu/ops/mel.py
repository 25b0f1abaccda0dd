"""Mel filterbank and log-mel conversion.

JAX reimplementation of librosa.filters.mel (Slaney scale + Slaney norm),
which is what the reference uses to build its mel basis
(promonet/preprocess/spectrogram.py:111-135).
"""
import functools

import jax.numpy as jnp
import numpy as np

from .spectral import fft_frequencies


def hz_to_mel(frequencies):
    """Convert Hz to mel (Slaney scale, librosa htk=False)"""
    frequencies = np.asarray(frequencies, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (frequencies - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = frequencies >= min_log_hz
    mels = np.where(
        log_t,
        min_log_mel + np.log(np.maximum(frequencies, 1e-10) / min_log_hz) / logstep,
        mels)
    return mels


def mel_to_hz(mels):
    """Convert mel to Hz (Slaney scale)"""
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    return np.where(
        log_t,
        min_log_hz * np.exp(logstep * (mels - min_log_mel)),
        freqs)


@functools.lru_cache(maxsize=8)
def _mel_filterbank_np(sample_rate, n_fft, n_mels, fmin, fmax):
    if fmax is None:
        fmax = sample_rate / 2

    fftfreqs = fft_frequencies(sample_rate, n_fft)
    mel_f = mel_to_hz(
        np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))

    # Slaney-style energy normalization
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


def mel_filterbank(sample_rate, n_fft, n_mels, fmin=0.0, fmax=None):
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_freq)

    Matches librosa.filters.mel(sr, n_fft, n_mels) defaults. The cache
    holds host numpy (a device constant per trace) — caching a traced
    jnp array would leak tracers across jit boundaries.
    """
    return jnp.asarray(
        _mel_filterbank_np(sample_rate, n_fft, n_mels, fmin, fmax))


def linear_to_mel(
    spectrogram,
    sample_rate,
    n_fft,
    n_mels,
    log_dynamic_range_compression_threshold=None
):
    """Convert magnitude spectrogram (..., n_freq, T) to log-mels

    Reference: promonet/preprocess/spectrogram.py:111-135. The basis matmul
    runs on the MXU; optional dynamic-range clamp matches the reference.
    """
    basis = mel_filterbank(sample_rate, n_fft, n_mels)
    basis = basis.astype(spectrogram.dtype)
    mels = jnp.log(
        jnp.einsum(
            'mf,...ft->...mt',
            basis,
            spectrogram,
            preferred_element_type=jnp.float32).astype(spectrogram.dtype))
    if log_dynamic_range_compression_threshold is not None:
        mels = jnp.maximum(mels, log_dynamic_range_compression_threshold)
    return mels
