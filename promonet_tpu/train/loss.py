"""GAN and reconstruction losses.

Reference: promonet/train/loss.py. Pure jittable functions; losses are
computed in float32 regardless of model compute dtype.
"""
import jax
import jax.numpy as jnp

import promonet_tpu
from ..ops import stft as stft_ops


###############################################################################
# Adversarial loss functions
###############################################################################


def feature_matching(real_feature_maps, fake_feature_maps):
    """Feature matching loss (promonet/train/loss.py:11-26)"""
    loss = 0.
    for real_maps, fake_maps in zip(real_feature_maps, fake_feature_maps):
        if promonet_tpu.FEATURE_MATCHING_OMIT_FIRST:
            real_maps = real_maps[1:]
            fake_maps = fake_maps[1:]
        for real, fake in zip(real_maps, fake_maps):
            loss += jnp.mean(
                jnp.abs(
                    jax.lax.stop_gradient(real.astype(jnp.float32)) -
                    fake.astype(jnp.float32)))
    return loss


def discriminator(real_outputs, fake_outputs):
    """Discriminator loss (promonet/train/loss.py:29-40)"""
    real_losses, fake_losses = [], []
    for real_output, fake_output in zip(real_outputs, fake_outputs):
        real_output = real_output.astype(jnp.float32)
        fake_output = fake_output.astype(jnp.float32)
        if promonet_tpu.ADVERSARIAL_HINGE_LOSS:
            real_losses.append(jnp.mean(jnp.maximum(1. - real_output, 0.)))
            fake_losses.append(jnp.mean(jnp.maximum(1. + fake_output, 0.)))
        else:
            real_losses.append(jnp.mean((1. - real_output) ** 2))
            fake_losses.append(jnp.mean(fake_output ** 2))
    return sum(real_losses) + sum(fake_losses), real_losses, fake_losses


def generator(discriminator_outputs):
    """Generator adversarial loss (promonet/train/loss.py:43-53)"""
    if promonet_tpu.ADVERSARIAL_HINGE_LOSS:
        losses = [
            jnp.mean(jnp.maximum(1. - output.astype(jnp.float32), 0.))
            for output in discriminator_outputs]
    else:
        losses = [
            jnp.mean((1. - output.astype(jnp.float32)) ** 2)
            for output in discriminator_outputs]
    return sum(losses), losses


###############################################################################
# Spectral loss functions
###############################################################################


def _stft_magnitude(x, fft_size, hop_size, win_length):
    """Root magnitude spectrogram for spectral convergence

    Reference: promonet/train/loss.py:61-80 (note the reference takes
    sqrt of the clamped magnitude).
    """
    window = stft_ops.hann_window(win_length)
    if win_length < fft_size:
        pad = (fft_size - win_length) // 2
        window = jnp.pad(window, (pad, fft_size - win_length - pad))
    # torch.stft default center=True
    mag = stft_ops.stft(
        x, fft_size, hop_size, window=window, center=True, magnitude=True)
    return jnp.sqrt(jnp.clip(mag, 1e-7))


def multi_resolution_spectral_convergence(
    x,
    y,
    fft_sizes=(2560, 1280, 640, 320, 160, 80),
    hop_sizes=(640, 320, 160, 80, 40, 20),
    win_lengths=(2560, 1280, 640, 320, 160, 80)
):
    """Multi-resolution spectral convergence (promonet/train/loss.py:124-150)"""
    x = x.reshape(x.shape[0], -1).astype(jnp.float32)
    y = y.reshape(y.shape[0], -1).astype(jnp.float32)
    loss = 0.
    for fft_size, hop_size, win_length in zip(
        fft_sizes, hop_sizes, win_lengths
    ):
        x_mag = _stft_magnitude(x, fft_size, hop_size, win_length)
        y_mag = _stft_magnitude(y, fft_size, hop_size, win_length)
        loss += (
            jnp.sum(jnp.abs(y_mag - x_mag)) /
            jnp.clip(jnp.sum(jnp.abs(y_mag)), 1e-9))
    return loss / len(fft_sizes)


###############################################################################
# Time-domain loss functions
###############################################################################


def signal(y_true, y_pred):
    """Normalized-correlation waveform loss (promonet/train/loss.py:158-162)"""
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    t = y_true / (
        1e-15 + jnp.linalg.norm(y_true, axis=-1, keepdims=True))
    p = y_pred / (
        1e-15 + jnp.linalg.norm(y_pred, axis=-1, keepdims=True))
    return jnp.mean(1. - jnp.sum(p * t, axis=-1))


###############################################################################
# Mel reconstruction loss
###############################################################################


def mel(spectrograms, generated, mask=None):
    """L1 log-mel loss between target linear spectrograms and generated audio

    Reference: promonet/train/core.py:277-305. `mask` (..., frames)
    excludes frames from the loss — bucket-padded validation batches
    carry all-zero spectrogram columns whose log-mels are -inf (the
    reference never pads, promonet/data/sampler.py:18-22).
    """
    threshold = (
        promonet_tpu.LOG_DYNAMIC_RANGE_COMPRESSION_THRESHOLD
        if promonet_tpu.SPARSE_MEL_LOSS else None)
    if mask is not None:
        # Keep the masked-out columns finite so inf * 0 cannot poison
        # the reduction
        spectrograms = jnp.where(mask[..., None, :], spectrograms, 1.)
    mels = promonet_tpu.preprocess.spectrogram.linear_to_mel(
        spectrograms.astype(jnp.float32), threshold)
    generated_mels = promonet_tpu.preprocess.spectrogram.from_audio(
        generated.astype(jnp.float32), True, threshold)
    if promonet_tpu.SPARSE_MEL_LOSS:
        mels = mels + promonet_tpu.LOG_DYNAMIC_RANGE_COMPRESSION_THRESHOLD
        generated_mels = (
            generated_mels +
            promonet_tpu.LOG_DYNAMIC_RANGE_COMPRESSION_THRESHOLD)
    difference = jnp.abs(mels - generated_mels)
    if mask is None:
        return jnp.mean(difference)
    weights = jnp.broadcast_to(mask[..., None, :], difference.shape)
    return (
        jnp.sum(difference * weights) /
        jnp.maximum(jnp.sum(weights), 1.))
