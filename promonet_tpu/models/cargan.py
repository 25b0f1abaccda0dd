"""CARGAN: chunked autoregressive GAN.

Reference: promonet/model/cargan.py — an MLP encodes the previous
CARGAN_INPUT_SIZE samples into CARGAN_OUTPUT_SIZE channels that are
concatenated onto the HiFiGAN input features. (Partially wired in the
reference: not exported from model/__init__.py; kept here for parity.)
"""
import jax.numpy as jnp
from flax import linen as nn

import promonet_tpu
from .hifigan import HiFiGAN


class Autoregressive(nn.Module):
    """Previous-sample encoder (promonet/model/cargan.py)"""

    input_size: int = 512
    hidden_size: int = 256
    output_size: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, previous_samples):
        # (B, 1, S) -> (B, S)
        x = previous_samples.reshape(previous_samples.shape[0], -1)
        x = x.astype(self.dtype)
        for features in (self.hidden_size, self.hidden_size, self.output_size):
            x = nn.Dense(features, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, negative_slope=0.1)
        return x


class CARGAN(nn.Module):
    """HiFiGAN conditioned on an autoregressive context encoding"""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, global_features, previous_samples=None):
        batch, num_frames, _ = features.shape
        if previous_samples is None:
            previous_samples = jnp.zeros(
                (batch, 1, promonet_tpu.CARGAN_INPUT_SIZE), jnp.float32)
        context = Autoregressive(
            input_size=promonet_tpu.CARGAN_INPUT_SIZE,
            hidden_size=promonet_tpu.CARGAN_HIDDEN_SIZE,
            output_size=promonet_tpu.CARGAN_OUTPUT_SIZE,
            dtype=self.dtype)(previous_samples)
        context = jnp.broadcast_to(
            context[:, None, :],
            (batch, num_frames, context.shape[-1])).astype(self.dtype)
        features = jnp.concatenate([features, context], axis=-1)
        return HiFiGAN(
            initial_size=promonet_tpu.HIFIGAN_UPSAMPLE_INITIAL_SIZE,
            upsample_kernel_sizes=tuple(
                promonet_tpu.HIFIGAN_UPSAMPLE_KERNEL_SIZES),
            upsample_rates=tuple(promonet_tpu.HIFIGAN_UPSAMPLE_RATES),
            resblock_kernel_sizes=tuple(
                promonet_tpu.HIFIGAN_RESBLOCK_KERNEL_SIZES),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in promonet_tpu.HIFIGAN_RESBLOCK_DILATION_SIZES),
            lrelu_slope=promonet_tpu.LRELU_SLOPE,
            dtype=self.dtype)(features, global_features)
