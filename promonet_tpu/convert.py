"""Unit conversions.

Reference: promonet/convert.py. Pure functions over Python scalars or JAX
arrays; everything is jittable.
"""
import math

import jax.numpy as jnp

import promonet_tpu


###############################################################################
# Loudness conversions
###############################################################################


def db_to_ratio(db):
    """Convert decibels to perceptual loudness ratio

    Reference: promonet/convert.py:14-16
    """
    return 2 ** (db / 10)


def ratio_to_db(ratio):
    """Convert perceptual loudness ratio to decibels

    Reference: promonet/convert.py:19-24
    """
    if isinstance(ratio, (int, float)):
        return 10 * math.log2(ratio)
    return 10 * jnp.log2(ratio)


###############################################################################
# Pitch conversions
###############################################################################


def bins_to_hz(
    bins,
    num_bins=None,
    fmin=None,
    fmax=None,
    pitch_distribution=None
):
    """Convert pitch in bin indices to hz

    Reference: promonet/convert.py:32-61. With variable-width bins, the bin
    center is the log-space midpoint between consecutive distribution
    quantiles.
    """
    num_bins = promonet_tpu.PITCH_BINS if num_bins is None else num_bins
    fmin = promonet_tpu.FMIN if fmin is None else fmin
    fmax = promonet_tpu.FMAX if fmax is None else fmax

    if promonet_tpu.VARIABLE_PITCH_BINS:
        if pitch_distribution is None:
            from . import load as load_module
            pitch_distribution = load_module.pitch_distribution()
        distribution = jnp.concatenate([
            jnp.asarray(pitch_distribution, dtype=jnp.float32),
            jnp.array([fmax], dtype=jnp.float32)])
        offset = 2 ** (
            (
                jnp.log2(distribution[bins + 1]) -
                jnp.log2(distribution[bins])
            ) / 2)
        return distribution[bins] + offset

    logfmin = math.log2(fmin)
    logfmax = math.log2(fmax)
    normalized = jnp.asarray(bins, dtype=jnp.float32) / (num_bins - 1)
    hz = 2 ** ((normalized * (logfmax - logfmin)) + logfmin)
    return jnp.clip(hz, fmin, fmax)


def cents_to_ratio(cents):
    """Convert pitch ratio in cents to linear ratio

    Reference: promonet/convert.py:64-66
    """
    return 2 ** (cents / 1200)


def hz_to_bins(
    hz,
    num_bins=None,
    fmin=None,
    fmax=None,
    pitch_distribution=None
):
    """Convert pitch in hz to bins

    Reference: promonet/convert.py:69-91
    """
    num_bins = promonet_tpu.PITCH_BINS if num_bins is None else num_bins
    fmin = promonet_tpu.FMIN if fmin is None else fmin
    fmax = promonet_tpu.FMAX if fmax is None else fmax

    hz = jnp.clip(hz, fmin, fmax)

    if promonet_tpu.VARIABLE_PITCH_BINS:
        if pitch_distribution is None:
            from . import load as load_module
            pitch_distribution = load_module.pitch_distribution()
        distribution = jnp.asarray(pitch_distribution, dtype=jnp.float32)
        bins = jnp.searchsorted(distribution, hz)
        return jnp.clip(bins, 0, num_bins - 1).astype(jnp.int32)

    logfmin = math.log2(fmin)
    logfmax = math.log2(fmax)
    normalized = (jnp.log2(hz) - logfmin) / (logfmax - logfmin)
    return ((num_bins - 1) * normalized).astype(jnp.int32)


def ratio_to_cents(ratio):
    """Convert linear pitch ratio to cents

    Reference: promonet/convert.py:94-96
    """
    if isinstance(ratio, (int, float)):
        return 1200 * math.log2(ratio)
    return 1200 * jnp.log2(ratio)


###############################################################################
# Time conversions
###############################################################################


def seconds_to_frames(seconds):
    """Convert seconds to frames (reference: promonet/convert.py:104-106)"""
    return int(seconds * promonet_tpu.SAMPLE_RATE / promonet_tpu.HOPSIZE)


def frames_to_samples(frames):
    """Convert number of frames to samples (promonet/convert.py:109-111)"""
    return frames * promonet_tpu.HOPSIZE


def frames_to_seconds(frames):
    """Convert number of frames to seconds (promonet/convert.py:114-116)"""
    return frames * samples_to_seconds(promonet_tpu.HOPSIZE)


def samples_to_seconds(samples, sample_rate=None):
    """Convert time in samples to seconds (promonet/convert.py:119-121)"""
    if sample_rate is None:
        sample_rate = promonet_tpu.SAMPLE_RATE
    return samples / sample_rate


def samples_to_frames(samples):
    """Convert time in samples to frames (promonet/convert.py:124-128)"""
    return samples // promonet_tpu.HOPSIZE
