"""Shared neural-net building blocks.

Weight-normalized convolutions matching the semantics of
torch.nn.utils.weight_norm as used throughout the reference models
(promonet/model/core.py:43-45, promonet/model/hifigan.py:100-107): the
kernel is reparameterized as g * v / ||v|| with the norm taken over all
axes except the torch dim=0 axis (output channels for Conv, input channels
for ConvTranspose). Parameters are fp32; computation runs in `dtype`
(bfloat16 by default on TPU).

Layouts are TPU-native: activations are (batch, time, channels) /
(batch, h, w, channels) so XLA tiles convolutions onto the MXU without
transposes.
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def torch_conv_init(fan_in):
    """torch Conv default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))"""
    bound = 1. / np.sqrt(fan_in)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def leaky_relu(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _weight_norm_params(module, shape, norm_axes, fan_in):
    """Create (v, g) weight-norm parameters with torch-equivalent init"""
    v = module.param('kernel_v', torch_conv_init(fan_in), shape)

    def g_init(key):
        return jnp.sqrt(
            jnp.sum(jnp.square(v), axis=norm_axes, keepdims=True) + 1e-12)

    g = module.param('kernel_g', g_init)
    norm = jnp.sqrt(
        jnp.sum(jnp.square(v), axis=norm_axes, keepdims=True) + 1e-12)
    return v * (g / norm)


class WNConv1d(nn.Module):
    """Weight-normalized 1-D convolution over (B, T, C)"""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        shape = (self.kernel_size, in_channels // self.groups, self.features)
        fan_in = (in_channels // self.groups) * self.kernel_size
        # torch weight_norm dim=0 on Conv1d (out, in, k): per-out-channel
        kernel = _weight_norm_params(self, shape, (0, 1), fan_in)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=('NHC', 'HIO', 'NHC'),
            feature_group_count=self.groups)
        if self.use_bias:
            bias = self.param('bias', torch_conv_init(fan_in), (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class WNConvTranspose1d(nn.Module):
    """Weight-normalized transposed 1-D convolution over (B, T, C)

    Matches torch.nn.ConvTranspose1d(kernel, stride, padding=p): output
    length (T - 1) * stride - 2p + kernel. Implemented as an
    lhs-dilated convolution, which XLA lowers to the same MXU work.
    torch weight_norm dim=0 normalizes per INPUT channel for transposed
    convs; replicated here.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        shape = (self.kernel_size, in_channels, self.features)
        fan_in = in_channels * self.kernel_size
        # normalize over (kernel, out) per input channel (torch dim=0)
        kernel = _weight_norm_params(self, shape, (0, 2), fan_in)
        pad = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=('NHC', 'HIO', 'NHC'))
        if self.use_bias:
            bias = self.param(
                'bias', torch_conv_init(in_channels * self.kernel_size),
                (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class WNConv2d(nn.Module):
    """Weight-normalized 2-D convolution over (B, H, W, C)"""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    dilation: tuple = (1, 1)
    padding: tuple = (0, 0)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        kh, kw = self.kernel_size
        shape = (kh, kw, in_channels, self.features)
        fan_in = in_channels * kh * kw
        kernel = _weight_norm_params(self, shape, (0, 1, 2), fan_in)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=self.strides,
            padding=[
                (self.padding[0], self.padding[0]),
                (self.padding[1], self.padding[1])],
            rhs_dilation=self.dilation,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            bias = self.param('bias', torch_conv_init(fan_in), (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class Conv1d(nn.Module):
    """Plain 1-D convolution over (B, T, C) with torch-default init"""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        fan_in = in_channels * self.kernel_size
        kernel = self.param(
            'kernel',
            torch_conv_init(fan_in),
            (self.kernel_size, in_channels, self.features))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=('NHC', 'HIO', 'NHC'))
        if self.use_bias:
            bias = self.param('bias', torch_conv_init(fan_in), (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class WNDense(nn.Module):
    """Weight-normalized dense layer (FARGAN GLUs/convs)"""

    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        shape = (in_features, self.features)
        kernel = _weight_norm_params(self, shape, (0,), in_features)
        y = jnp.matmul(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            preferred_element_type=jnp.float32).astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                'bias', torch_conv_init(in_features), (self.features,))
            y = y + bias.astype(self.dtype)
        return y


def get_padding(kernel_size, dilation=1, stride=1):
    """Same-size convolution padding (promonet/model/core.py:9-11)"""
    return int((kernel_size * dilation - dilation - stride + 1) / 2)
