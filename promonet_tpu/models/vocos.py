"""Vocos vocoder backbone (ConvNeXt stack + differentiable ISTFT head).

Reference: promonet/model/vocos.py. The ISTFT head uses the shared
`ops.stft.istft` (overlap-add as a strided scatter) instead of torch's
fold; the whole model is one fused XLA program.
"""
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import stft as stft_ops
from .modules import Conv1d


class ConvNeXtBlock(nn.Module):
    """Depthwise conv → LayerNorm → pointwise MLP with layer scale

    Reference: promonet/model/vocos.py:110-140.
    """

    dim: int
    pointwise_channels: int
    layer_scale_init_value: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        # Depthwise conv over (B, T, C)
        x = nn.Conv(
            self.dim,
            kernel_size=(7,),
            padding=3,
            feature_group_count=self.dim,
            kernel_init=nn.initializers.truncated_normal(0.02),
            dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = nn.Dense(
            self.pointwise_channels,
            kernel_init=nn.initializers.truncated_normal(0.02),
            dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.Dense(
            self.dim,
            kernel_init=nn.initializers.truncated_normal(0.02),
            dtype=self.dtype)(x)
        gamma = self.param(
            'gamma',
            nn.initializers.constant(self.layer_scale_init_value),
            (self.dim,))
        return residual + gamma.astype(self.dtype) * x


class Vocos(nn.Module):
    """Vocos over (B, T, C) features; returns (B, T * hop_length, 1)

    Reference: promonet/model/vocos.py:11-102,148-166.
    """

    channels: int = 512
    pointwise_channels: int = 1536
    num_layers: int = 6
    n_fft: int = 1024
    hop_length: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, global_features, previous_samples=None,
                 train=False):
        # Input feature projection
        x = Conv1d(self.channels, 7, padding=3, dtype=self.dtype)(features)

        # Speaker conditioning
        g = Conv1d(self.channels, 1, dtype=self.dtype)(global_features)
        x = x + g

        # Backbone
        x = Conv1d(self.channels, 7, padding=3, dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        for _ in range(self.num_layers):
            x = ConvNeXtBlock(
                self.channels,
                self.pointwise_channels,
                layer_scale_init_value=1 / self.num_layers,
                dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)

        # ISTFT head (promonet/model/vocos.py:148-166): predict log-mag and
        # phase, clip magnitude, synthesize via inverse STFT
        x = nn.Dense(self.n_fft + 2, dtype=self.dtype)(x).astype(jnp.float32)
        mag, phase = jnp.split(x, 2, axis=-1)
        mag = jnp.clip(jnp.exp(mag), max=1e2)
        spec = mag * jnp.exp(1j * phase.astype(jnp.float32))

        window = stft_ops.hann_window(self.n_fft)
        audio = stft_ops.istft(
            jnp.swapaxes(spec, -1, -2),  # (B, freq, frames)
            self.n_fft,
            self.hop_length,
            window)
        return audio[..., None]
