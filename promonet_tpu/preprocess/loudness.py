"""A-weighted multi-band loudness.

TPU re-design of the reference loudness feature
(promonet/preprocess/loudness.py): the reference round-trips through
numpy/librosa on CPU; here the whole chain — reflect pad, STFT,
amplitude→dB with librosa top_db semantics, A-weighting, floor, band
average — is one jittable JAX function that fuses with downstream
consumers. The feed-forward limiter's sequential sample loop
(loudness.py:114-141) becomes a `lax.scan`.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

import promonet_tpu
from ..ops import spectral, stft as stft_ops


def perceptual_weights():
    """A-weighted frequency weights minus REF_DB, shape (n_freq, 1)

    Reference: promonet/preprocess/loudness.py:149-160.
    """
    frequencies = spectral.fft_frequencies(
        promonet_tpu.SAMPLE_RATE, promonet_tpu.WINDOW_SIZE)
    return (
        spectral.a_weighting(frequencies)[:, None] -
        float(promonet_tpu.REF_DB))


@functools.partial(jax.jit, static_argnames=('bands',))
def _from_audio_jit(audio, bands):
    padding = (promonet_tpu.WINDOW_SIZE - promonet_tpu.HOPSIZE) // 2
    audio = stft_ops.reflect_pad(audio, padding)

    # Hann-windowed STFT magnitude (librosa.stft defaults)
    window = stft_ops.hann_window(promonet_tpu.WINDOW_SIZE)
    mag = stft_ops.stft(
        audio[0],
        promonet_tpu.WINDOW_SIZE,
        promonet_tpu.HOPSIZE,
        window=window,
        magnitude=True)

    # A-weighted dB with librosa's utterance-max-relative top_db clip
    weighted = (
        spectral.amplitude_to_db(mag) +
        jnp.asarray(perceptual_weights(), mag.dtype))

    # Floor
    weighted = jnp.maximum(weighted, promonet_tpu.MIN_DB)

    return band_average(weighted, bands) if bands is not None else weighted


def from_audio(audio, bands=1):
    """Compute A-weighted loudness of audio (1, T); returns (F or bands, T)

    Reference: promonet/preprocess/loudness.py:17-55.
    """
    return _from_audio_jit(jnp.asarray(audio), bands)


def from_file(audio_file, bands=None):
    """Compute A-weighted loudness from audio file"""
    if bands is None:
        bands = promonet_tpu.LOUDNESS_BANDS
    return from_audio(promonet_tpu.load.audio(audio_file), bands)


def from_file_to_file(audio_file, output_file, bands=None):
    """Compute A-weighted loudness from audio file and save"""
    promonet_tpu.load.save_array(
        output_file, np.asarray(from_file(audio_file, bands)))


def from_files_to_files(audio_files, output_files, bands=None):
    """Compute A-weighted loudness from audio files and save"""
    for audio_file, output_file in zip(audio_files, output_files):
        from_file_to_file(audio_file, output_file, bands)


###############################################################################
# Loudness utilities
###############################################################################


def band_average(loudness, bands=None):
    """Average over frequency bands (promonet/preprocess/loudness.py:84-111)"""
    if bands is None:
        bands = promonet_tpu.LOUDNESS_BANDS
    if bands is None:
        return loudness
    if bands == 1:
        return loudness.mean(axis=-2, keepdims=True)
    num_freqs = loudness.shape[-2]
    step = num_freqs / bands
    return jnp.stack(
        [
            loudness[..., int(band * step):int((band + 1) * step), :].mean(
                axis=-2)
            for band in range(int(bands))
        ],
        axis=-2)


@functools.partial(
    jax.jit, static_argnames=('delay',))
def limit(audio, delay=40, attack_coef=.9, release_coef=.9995, threshold=.99):
    """Feed-forward limiter to prevent clipping

    Reference: promonet/preprocess/loudness.py:114-141 — a per-sample
    Python loop there; a single `lax.scan` here. audio: (1, T).
    """
    audio = jnp.pad(audio, ((0, 0), (0, delay - 1)))
    samples = audio[0]

    def step(carry, sample):
        delay_line, delay_index, gain, envelope = carry

        # Update signal history
        delay_line = delay_line.at[delay_index].set(sample)
        delay_index = (delay_index + 1) % delay

        # Calculate envelope
        envelope = jnp.maximum(jnp.abs(sample), envelope * release_coef)

        # Calculate gain
        target = jnp.where(envelope > threshold, threshold / envelope, 1.)
        gain = gain * attack_coef + target * (1 - attack_coef)

        # Apply gain to the delayed sample
        out = delay_line[delay_index] * gain
        return (delay_line, delay_index, gain, envelope), out

    init = (jnp.zeros(delay, samples.dtype), jnp.asarray(0), 1., 0.)
    _, limited = jax.lax.scan(step, init, samples)
    return limited[None, delay - 1:]


def normalize(loudness):
    """Normalize loudness to [-1., 1.] (promonet/preprocess/loudness.py:144-146)"""
    return (
        (loudness - promonet_tpu.MIN_DB) /
        (promonet_tpu.REF_DB - promonet_tpu.MIN_DB))


def scale(audio, target_loudness):
    """Scale audio to the target loudness (promonet/preprocess/loudness.py:163-176)"""
    target_loudness = jnp.asarray(target_loudness)
    if target_loudness.ndim >= 2 and target_loudness.shape[-2] > 1:
        target_loudness = target_loudness.mean(axis=-2, keepdims=True)
    loudness = from_audio(audio)
    gain = promonet_tpu.convert.db_to_ratio(target_loudness - loudness)
    return limit(shift(audio, gain))


def shift(audio, value):
    """Shift loudness by value in decibels (promonet/preprocess/loudness.py:179-193)"""
    gain = promonet_tpu.convert.db_to_ratio(jnp.asarray(value))
    if gain.size > 1:
        # Linearly interpolate frame-rate gain to sample rate
        # (align_corners=False semantics)
        num_samples = audio.shape[-1]
        num_frames = gain.shape[-1]
        scale_factor = num_frames / num_samples
        positions = (jnp.arange(num_samples) + 0.5) * scale_factor - 0.5
        positions = jnp.clip(positions, 0, num_frames - 1)
        gain = promonet_tpu.ops.grid.sample(gain, positions)
    return gain * audio
