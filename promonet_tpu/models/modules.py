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
import contextlib
import contextvars

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


_CONV_LOWERING = contextvars.ContextVar('conv_lowering', default=None)


@contextlib.contextmanager
def conv_lowering(mode):
    """Scope the stride-1 conv lowering for code TRACED inside the block.

    The flag is read at trace time, so it must be set around the jitted
    function's first (tracing) call — the train step does this in its
    traced body (promonet_tpu/train/core.py make_train_step), which runs
    as Python exactly once per compilation. Toggling the config global
    after a program is cached serves the stale lowering; this scoped
    override sidesteps that hazard because every trace re-reads it.
    """
    if mode is None:
        yield
        return
    token = _CONV_LOWERING.set(mode)
    try:
        yield
    finally:
        _CONV_LOWERING.reset(token)


def _conv_lowering(batch=1):
    """Active stride-1 conv lowering ('shifted' or 'xla'), trace-time.

    Resolution order: the `conv_lowering` scoped override (the training
    step pins 'xla' — batch-64 programs win there, see
    conv1d_shifted_dots), then the CONV_LOWERING config attribute
    (experiment overlays / A-B scripts), then a batch-size heuristic:
    the shifted-matmul lowering wins at small batch but its k shifted
    activation copies scale HBM traffic superlinearly with batch —
    measured at the 10 s inference workload (scripts/infer_lowering_ab
    .py, v5e): batch 1 is 11.8 ms shifted vs 22.3 ms xla; batch 4 is
    101.2 ms shifted vs 84.6 ms xla. Batched serving uses 'xla'.
    """
    override = _CONV_LOWERING.get()
    if override is not None:
        return override
    import promonet_tpu
    configured = getattr(promonet_tpu, 'CONV_LOWERING', None)
    if configured is not None:
        return configured
    return 'xla' if batch >= 4 else 'shifted'


def conv1d_shifted_dots(x, kernel, dilation, padding, dtype):
    """Stride-1 1-D convolution as a sum of k time-shifted matmuls.

    XLA's TPU lowering of `conv_general_dilated` leaves most of the MXU
    idle at vocoder channel widths (measured on v5e, k=11: 7 TF/s at
    C=32 and 87 TF/s at C=128). Expressing the same op as k shifted
    slices each contracted with one kernel tap — with fp32 accumulation,
    matching conv semantics — reaches 70-110 TF/s across all widths, so
    it is the unconditional lowering for stride-1, groups-1 convs.

    Arguments
        x: (B, T, C_in)
        kernel: (k, C_in, C_out)
        dilation / padding: conv parameters
        dtype: compute dtype (params cast in, output cast back)
    """
    k = kernel.shape[0]
    out_len = x.shape[1] + 2 * padding - (k - 1) * dilation
    x = x.astype(dtype)
    kernel = kernel.astype(dtype)
    if _conv_lowering(batch=x.shape[0]) == 'xla':
        # Native conv lowering: wins at TRAINING shapes (batch 64), where
        # the shifted-dots unrolling materializes k shifted copies of the
        # activation (measured round 4: generator fwd touches 142 GB and
        # runs at 4.9% MFU at batch 64; see scripts/train_triage.py).
        # Inference (small batch) keeps the shifted-dots default.
        # No preferred_element_type: the TPU conv accumulates bf16
        # operands in fp32 internally already, and an fp32-typed output
        # gives the transpose rule an fp32 cotangent against the bf16
        # kernel (conv_general_dilated requires matching dtypes)
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(padding, padding)],
            rhs_dilation=(dilation,),
            dimension_numbers=('NHC', 'HIO', 'NHC'))
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    acc = None
    for i in range(k):
        part = jax.lax.dot_general(
            jax.lax.slice_in_dim(x, i * dilation, i * dilation + out_len, 1, 1),
            kernel[i],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc.astype(dtype)


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
    def __call__(self, x, materialize_only=False):
        in_channels = x.shape[-1]
        shape = (self.kernel_size, in_channels // self.groups, self.features)
        fan_in = (in_channels // self.groups) * self.kernel_size
        # torch weight_norm dim=0 on Conv1d (out, in, k): per-out-channel
        kernel = _weight_norm_params(self, shape, (0, 1), fan_in)
        if materialize_only:
            # Return the effective (kernel, bias) without applying —
            # fused Pallas paths (ops/resblock.py) consume several
            # convolutions' parameters in one kernel while keeping the
            # parameter tree identical to the unfused path
            bias = (
                self.param(
                    'bias', torch_conv_init(fan_in), (self.features,))
                if self.use_bias
                else jnp.zeros((self.features,), kernel.dtype))
            return kernel, bias
        if self.stride == 1 and self.groups == 1:
            y = conv1d_shifted_dots(
                x, kernel, self.dilation, self.padding, self.dtype)
        else:
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
    length (T - 1) * stride - 2p + kernel. torch weight_norm dim=0
    normalizes per INPUT channel for transposed convs; replicated here.

    Two lowering strategies with an identical parameter tree:

    - `subpixel=True` (default): exact polyphase decomposition. The
      transposed conv's output phase r (= n mod stride) only reads every
      stride-th kernel tap, so the whole op is a DENSE stride-1
      convolution onto stride*features channels followed by a
      depth-to-space reshape. Dense convs tile the MXU directly; XLA's
      lowering of lhs-dilated convs multiplies the inserted zeros
      (round-2 generator MFU was 13.7% with the dilated path).
    - `subpixel=False`: the direct lhs-dilated convolution (kept as the
      semantics reference; the parity test checks the two agree).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    subpixel: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        shape = (self.kernel_size, in_channels, self.features)
        fan_in = in_channels * self.kernel_size
        # normalize over (kernel, out) per input channel (torch dim=0)
        kernel = _weight_norm_params(self, shape, (0, 2), fan_in)
        pad = self.kernel_size - 1 - self.padding
        out_length = \
            (x.shape[1] - 1) * self.stride - 2 * self.padding + \
            self.kernel_size
        if self.subpixel and self.stride > 1 \
                and out_length <= x.shape[1] * self.stride:
            y = self._subpixel(x, kernel, pad, out_length)
        else:
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

    def _subpixel(self, x, kernel, pad, out_length):
        """Polyphase lowering: one dense conv + depth-to-space.

        Derivation: with x_d = x lhs-dilated by s, the dilated-conv output
        is y[n] = sum_q x_d[n + q - pad] * K[q]. Substituting the only
        nonzero taps (n + q - pad = t*s) and writing n = u*s + r gives

            y[u*s + r] = sum_d x[u + d] * K[d*s + pad - r]

        i.e. phase r of the output is a stride-1 cross-correlation of x
        with the phase-r subsample of K. All phases are fused into one
        conv onto s*features channels (phase-major), then interleaved by
        reshape.
        """
        s, k, features = self.stride, self.kernel_size, self.features
        in_channels = x.shape[-1]
        # Static phase-gather indices: q[j, r] = (d_min + j)*s + pad - r
        d_min = min(-(-(r - pad) // s) for r in range(s))  # ceil div
        d_max = max((k - 1 - (pad - r)) // s for r in range(s))
        length = d_max - d_min + 1
        q = (d_min + np.arange(length))[:, None] * s \
            + (pad - np.arange(s))[None, :]
        valid = (q >= 0) & (q < k)
        flat = np.clip(q, 0, k - 1).reshape(-1)
        sub = kernel[flat] * valid.reshape(-1, 1, 1)
        sub = sub.reshape(length, s, in_channels, features)
        sub = jnp.transpose(sub, (0, 2, 1, 3)).reshape(
            length, in_channels, s * features)
        # Dense stride-1 conv via shifted matmuls (see conv1d_shifted_dots)
        frames = x.shape[1]
        xp = jnp.pad(
            x.astype(self.dtype), ((0, 0), (-d_min, d_max), (0, 0)))
        sub = sub.astype(self.dtype)
        acc = None
        for j in range(length):
            part = jax.lax.dot_general(
                jax.lax.slice_in_dim(xp, j, j + frames, 1, 1),
                sub[j],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        y = acc.astype(self.dtype)
        y = y.reshape(y.shape[0], frames * s, features)
        return y[:, :out_length]


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
        if self.stride == 1:
            y = conv1d_shifted_dots(
                x, kernel, self.dilation, self.padding, self.dtype)
        else:
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
