"""Spectral weighting and dB conversion utilities.

JAX reimplementations of the librosa routines the reference leans on for
loudness extraction (promonet/preprocess/loudness.py:46,149-160):
``librosa.fft_frequencies``, ``librosa.amplitude_to_db`` (power_to_db with
amin/top_db semantics), and ``librosa.A_weighting``.
"""
import jax.numpy as jnp
import numpy as np


def fft_frequencies(sample_rate, n_fft):
    """Center frequencies of rFFT bins (librosa.fft_frequencies)"""
    return np.linspace(0, sample_rate / 2, 1 + n_fft // 2, endpoint=True)


def power_to_db(power, ref=1.0, amin=1e-10, top_db=80.0):
    """Convert power spectrogram to dB (librosa.power_to_db semantics)

    top_db clips relative to the max over the WHOLE array — this matches
    librosa and therefore the reference loudness feature; it makes the
    output depend on the utterance-level maximum.
    """
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, power))
    log_spec = log_spec - 10.0 * np.log10(max(amin, ref))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def amplitude_to_db(amplitude, ref=1.0, amin=1e-5, top_db=80.0):
    """Convert amplitude spectrogram to dB (librosa.amplitude_to_db)"""
    return power_to_db(
        jnp.square(amplitude),
        ref=ref ** 2,
        amin=amin ** 2,
        top_db=top_db)


def a_weighting(frequencies, min_db=-80.0):
    """A-weighting curve in dB at the given frequencies (librosa.A_weighting)

    Computed with numpy at trace time — frequencies are static.
    """
    f = np.asarray(frequencies, dtype=np.float64)
    f_sq = f ** 2
    const = np.array([20.6, 107.7, 737.9, 12194.217]) ** 2
    with np.errstate(divide='ignore'):
        weights = 2.0 + 20.0 * (
            np.log10(const[3]) +
            2 * np.log10(f_sq) -
            np.log10(f_sq + const[3]) -
            np.log10(f_sq + const[0]) -
            0.5 * np.log10(f_sq + const[1]) -
            0.5 * np.log10(f_sq + const[2]))
    if min_db is not None:
        weights = np.maximum(weights, min_db)
    return weights
