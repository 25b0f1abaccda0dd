"""Linear spectrograms and log-mels.

Reference: promonet/preprocess/spectrogram.py. Jittable; the mel basis
matmul rides the MXU and the magnitude epsilon matches the reference's
sqrt(|S|² + 1e-6).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

import promonet_tpu
from ..ops import mel as mel_ops, stft as stft_ops


@functools.partial(jax.jit, static_argnames=('mels', 'threshold'))
def _from_audio_jit(audio, mels, threshold):
    size = (promonet_tpu.NUM_FFT - promonet_tpu.HOPSIZE) // 2
    audio = stft_ops.reflect_pad(audio, size)
    window = stft_ops.hann_window(promonet_tpu.NUM_FFT)
    spectrogram = stft_ops.stft(
        audio[..., 0, :],
        promonet_tpu.NUM_FFT,
        promonet_tpu.HOPSIZE,
        window=window,
        magnitude=True,
        magnitude_epsilon=1e-6)
    if mels:
        spectrogram = linear_to_mel(spectrogram, threshold)
    return spectrogram


def from_audio(
    audio,
    mels=False,
    log_dynamic_range_compression_threshold='default'
):
    """Compute (mel) spectrogram from audio (..., 1, T) → (..., F, T)

    Reference: promonet/preprocess/spectrogram.py:15-60.
    """
    if log_dynamic_range_compression_threshold == 'default':
        log_dynamic_range_compression_threshold = \
            promonet_tpu.LOG_DYNAMIC_RANGE_COMPRESSION_THRESHOLD
    return _from_audio_jit(
        jnp.asarray(audio), mels, log_dynamic_range_compression_threshold)


def from_file(audio_file, mels=False):
    """Compute spectrogram from audio file"""
    return from_audio(promonet_tpu.load.audio(audio_file), mels)


def from_file_to_file(audio_file, output_file, mels=False):
    """Compute spectrogram from audio file and save to disk"""
    promonet_tpu.load.save_array(
        output_file, np.asarray(from_file(audio_file, mels)))


def from_files_to_files(audio_files, output_files, mels=False):
    """Compute spectrogram from audio files and save to disk"""
    for audio_file, output_file in zip(audio_files, output_files):
        from_file_to_file(audio_file, output_file, mels)


def linear_to_mel(
    spectrogram,
    log_dynamic_range_compression_threshold='default'
):
    """Convert linear spectrogram to log-mels

    Reference: promonet/preprocess/spectrogram.py:111-135.
    """
    if log_dynamic_range_compression_threshold == 'default':
        log_dynamic_range_compression_threshold = \
            promonet_tpu.LOG_DYNAMIC_RANGE_COMPRESSION_THRESHOLD
    return mel_ops.linear_to_mel(
        spectrogram,
        promonet_tpu.SAMPLE_RATE,
        promonet_tpu.NUM_FFT,
        promonet_tpu.NUM_MELS,
        log_dynamic_range_compression_threshold)
