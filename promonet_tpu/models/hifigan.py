"""HiFi-GAN vocoder backbone.

TPU-first re-design of the reference HiFi-GAN (promonet/model/hifigan.py):
same architecture family — input conv + speaker-conditioning conv, four
multi-receptive-field-fusion upsampling stages (rates [8, 8, 2, 2], kernels
[16, 16, 4, 4], initial width 512), residual blocks with kernels [3, 7, 11]
× dilations [1, 3, 5] — expressed in (B, T, C) layout so every convolution
tiles directly onto the MXU, with weight-norm reparameterization done
functionally (no mutable hooks, jit-stable).
"""
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .modules import (
    Conv1d,
    WNConv1d,
    WNConvTranspose1d,
    get_padding,
    leaky_relu)


def receptive_field_frames(
        upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_rates=(8, 8, 2, 2),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5))):
    """Conditioning receptive field of the HiFiGAN stack, in input frames.

    Backward accumulation from one output sample: stride-1 convs widen
    the window by (k-1)*dilation; each transposed upsample divides it by
    the rate (plus kernel spill). Parallel MRF branches take the max
    over kernels. The result is the FULL kernel extent (both sides), so
    it upper-bounds how many trailing frames of output a change to the
    final input frame can reach — e.g. how far pad-tail contents
    propagate into trimmed audio (tests/test_padded.py).
    """
    rf = 1 + 6  # output conv, kernel 7
    for kernel, rate in zip(
        reversed(upsample_kernel_sizes), reversed(upsample_rates)
    ):
        rf += max(
            sum((k - 1) * d + (k - 1) for d in dilations)
            for k, dilations in zip(
                resblock_kernel_sizes, resblock_dilation_sizes))
        rf = -(-(rf + kernel - 1) // rate) + 1
    return rf + 6  # input conv, kernel 7


class Block(nn.Module):
    """Dilated residual unit (promonet/model/hifigan.py:157-210)

    With `pallas`, the six-conv chain runs as one fused VMEM-resident
    Pallas kernel (ops/resblock.py) — identical parameter tree, bf16
    numerics, custom VJP. The unfused path remains the semantics
    reference (parity-tested).
    """

    channels: int
    kernel_size: int
    dilations: Sequence[int]
    lrelu_slope: float
    pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.pallas:
            from ..ops.resblock import fused_block
            kernels, biases = [], []
            for dilation in self.dilations:
                for conv_dilation in (dilation, 1):
                    kernel, bias = WNConv1d(
                        self.channels,
                        self.kernel_size,
                        dilation=conv_dilation,
                        padding=get_padding(
                            self.kernel_size, conv_dilation),
                        dtype=self.dtype)(x, materialize_only=True)
                    kernels.append(kernel)
                    biases.append(bias)
            weights = jnp.stack(kernels).astype(self.dtype)
            bias_stack = jnp.stack(biases)
            return fused_block(
                x.astype(self.dtype),
                weights,
                bias_stack,
                tuple(self.dilations),
                self.lrelu_slope)
        for dilation in self.dilations:
            xt = leaky_relu(x, self.lrelu_slope)
            xt = WNConv1d(
                self.channels,
                self.kernel_size,
                dilation=dilation,
                padding=get_padding(self.kernel_size, dilation),
                dtype=self.dtype)(xt)
            xt = leaky_relu(xt, self.lrelu_slope)
            xt = WNConv1d(
                self.channels,
                self.kernel_size,
                padding=get_padding(self.kernel_size),
                dtype=self.dtype)(xt)
            x = xt + x
        return x


class ResidualBlock(nn.Module):
    """Average of parallel dilated blocks (promonet/model/hifigan.py:128-145)

    With `remat`, each dilated block recomputes its activations in the
    backward pass (jax.checkpoint) — full-batch training at the
    reference budget (64 × 16384 samples) does not fit HBM otherwise.
    """

    channels: int
    kernel_sizes: Sequence[int]
    dilation_sizes: Sequence[Sequence[int]]
    lrelu_slope: float
    remat: bool = False
    pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        block = nn.remat(Block) if self.remat else Block
        total = None
        for i, (kernel_size, dilations) in enumerate(zip(
            self.kernel_sizes, self.dilation_sizes
        )):
            # Explicit names keep the parameter tree identical between
            # the remat (training) and plain (inference) variants —
            # flax would otherwise auto-name by wrapper class
            out = block(
                self.channels,
                kernel_size,
                dilations,
                self.lrelu_slope,
                pallas=self.pallas,
                dtype=self.dtype,
                name=f'Block_{i}')(x)
            total = out if total is None else total + out
        return total / len(self.kernel_sizes)


class MultiReceptiveFieldFusion(nn.Module):
    """LeakyReLU → weight-norm transposed upsample → residual block

    Reference: promonet/model/hifigan.py:84-115.
    """

    output_channels: int
    upsample_kernel_size: int
    upsample_rate: int
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    lrelu_slope: float
    remat: bool = False
    pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = leaky_relu(x, self.lrelu_slope)
        x = WNConvTranspose1d(
            self.output_channels,
            self.upsample_kernel_size,
            stride=self.upsample_rate,
            padding=(self.upsample_kernel_size - self.upsample_rate) // 2,
            dtype=self.dtype)(x)
        return ResidualBlock(
            self.output_channels,
            self.resblock_kernel_sizes,
            self.resblock_dilation_sizes,
            self.lrelu_slope,
            remat=self.remat,
            pallas=self.pallas,
            dtype=self.dtype)(x)


class HiFiGAN(nn.Module):
    """HiFi-GAN over (B, T, C) features; returns (B, T * prod(rates), 1)

    Reference: promonet/model/hifigan.py:13-70.
    """

    initial_size: int = 512
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    lrelu_slope: float = 0.1
    remat: bool = False
    pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, global_features, previous_samples=None,
                 train=False):
        """
        Arguments
            features: (B, T, NUM_FEATURES) frame-rate input features
            global_features: (B, 1, GLOBAL_CHANNELS) speaker ⊕ ratios
            previous_samples: unused (API parity with autoregressive models)
        """
        # Input layer (plain conv — reference leaves these un-normalized,
        # promonet/model/hifigan.py:19-30)
        x = Conv1d(
            self.initial_size, 7, padding=3, dtype=self.dtype)(features)

        # Speaker conditioning, broadcast over time
        g = Conv1d(
            self.initial_size, 1, dtype=self.dtype)(global_features)
        x = x + g

        # Upsampling MRF stages
        channels = self.initial_size
        for kernel_size, rate in zip(
            self.upsample_kernel_sizes, self.upsample_rates
        ):
            channels //= 2
            x = MultiReceptiveFieldFusion(
                channels,
                kernel_size,
                rate,
                self.resblock_kernel_sizes,
                self.resblock_dilation_sizes,
                self.lrelu_slope,
                remat=self.remat,
                pallas=self.pallas and not train,
                dtype=self.dtype)(x)

        # Output layer
        x = leaky_relu(x, self.lrelu_slope)
        x = Conv1d(1, 7, padding=3, use_bias=False, dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))
