"""GAN discriminators.

Reference: promonet/model/discriminator.py. The aggregate discriminator
builds the configured set — multi-period (HiFi-GAN), complex multi-band
(RVQGAN), multi-resolution (UnivNet), multi-scale (MelGAN), and the FARGAN
ERB-filterbank spectrogram discriminator — and returns
(logits_real, logits_fake, feature_maps_real, feature_maps_fake).

All STFT front-ends use the shared jittable `ops.stft` (the reference's
in-discriminator torch.stft calls use no window, i.e. rectangular —
replicated here), so the entire D forward is one XLA program per
discriminator family.
"""
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import promonet_tpu
from ..ops import stft as stft_ops
from .modules import WNConv1d, WNConv2d, get_padding, leaky_relu


###############################################################################
# Aggregate discriminator
###############################################################################


class Discriminator(nn.Module):
    """Configured discriminator ensemble (promonet/model/discriminator.py:13-49)"""

    multi_period: bool = True
    multi_scale: bool = False
    multi_resolution: bool = False
    complex_multiband: bool = True
    fargan: bool = False
    lrelu_slope: float = 0.1
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def create(cls, dtype=None, remat=False):
        if dtype is None:
            dtype = (
                jnp.bfloat16 if promonet_tpu.PRECISION == 'bfloat16'
                else jnp.float32)
        return cls(
            multi_period=promonet_tpu.MULTI_PERIOD_DISCRIMINATOR,
            multi_scale=promonet_tpu.MULTI_SCALE_DISCRIMINATOR,
            multi_resolution=promonet_tpu.MULTI_RESOLUTION_DISCRIMINATOR,
            complex_multiband=promonet_tpu.COMPLEX_MULTIBAND_DISCRIMINATOR,
            fargan=promonet_tpu.FARGAN_DISCRIMINATOR,
            lrelu_slope=promonet_tpu.LRELU_SLOPE,
            remat=remat,
            dtype=dtype)

    def setup(self):
        # With remat, each sub-discriminator recomputes activations in
        # the backward pass (feature maps at full batch do not fit HBM)
        wrap = nn.remat if self.remat else (lambda cls: cls)
        d_p = wrap(DiscriminatorP)
        d_s = wrap(DiscriminatorS)
        d_r = wrap(DiscriminatorR)
        d_cmb = wrap(DiscriminatorCMB)
        d_mf = wrap(DiscriminatorMagFree)
        discriminators = []
        if self.multi_period:
            discriminators += [
                d_p(period=p, lrelu_slope=self.lrelu_slope, dtype=self.dtype)
                for p in (2, 3, 5, 7, 11)]
        if self.multi_scale:
            discriminators.append(
                d_s(lrelu_slope=self.lrelu_slope, dtype=self.dtype))
        if self.multi_resolution:
            discriminators += [
                d_r(resolution=r, dtype=self.dtype)
                for r in ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))]
        if self.complex_multiband:
            discriminators.append(d_cmb(dtype=self.dtype))
        if self.fargan:
            discriminators += [
                d_mf(resolution=(n, n // 4, n), dtype=self.dtype)
                for n in (64, 128, 256, 512, 1024, 2048)]
        self.discriminators = discriminators

    def __call__(self, audio_real, audio_fake):
        """audio: (B, 1, T). Returns 4 lists over discriminators."""
        logits_real, logits_fake = [], []
        feature_maps_real, feature_maps_fake = [], []
        for discriminator in self.discriminators:
            logit_real, fmap_real = discriminator(audio_real)
            logit_fake, fmap_fake = discriminator(audio_fake)
            logits_real.append(logit_real)
            logits_fake.append(logit_fake)
            feature_maps_real.append(fmap_real)
            feature_maps_fake.append(fmap_fake)
        return logits_real, logits_fake, feature_maps_real, feature_maps_fake


###############################################################################
# Individual discriminators
###############################################################################


class DiscriminatorP(nn.Module):
    """Multi-period waveform discriminator

    Reference: promonet/model/discriminator.py:57-93. Audio is reflect-
    padded to a period multiple and viewed as (B, T/p, p, 1) so strided
    2-D convs see period-aligned structure.
    """

    period: int
    kernel_size: int = 5
    stride: int = 3
    lrelu_slope: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        batch, _, time = x.shape
        if time % self.period != 0:
            n_pad = self.period - (time % self.period)
            x = jnp.pad(
                x, ((0, 0), (0, 0), (0, n_pad)), mode='reflect')
            time = time + n_pad
        # (B, 1, T) -> (B, T/p, p, 1)
        x = x.reshape(batch, 1, time // self.period, self.period)
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)

        pad = (get_padding(self.kernel_size, 1), 0)
        feature_maps = []
        for channels, stride in (
            (32, self.stride),
            (128, self.stride),
            (512, self.stride),
            (1024, self.stride),
            (1024, 1),
        ):
            x = WNConv2d(
                channels,
                (self.kernel_size, 1),
                strides=(stride, 1),
                padding=pad,
                dtype=self.dtype)(x)
            x = leaky_relu(x, self.lrelu_slope)
            feature_maps.append(x)
        x = WNConv2d(1, (3, 1), padding=(1, 0), dtype=self.dtype)(x)
        feature_maps.append(x)
        return x.reshape(batch, -1), feature_maps


class DiscriminatorR(nn.Module):
    """Multi-resolution spectrogram discriminator

    Reference: promonet/model/discriminator.py:96-143.
    """

    resolution: Tuple[int, int, int]
    lrelu_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    def spectrogram(self, x):
        n_fft, hop, _ = self.resolution
        pad = (n_fft - hop) // 2
        x = stft_ops.reflect_pad(x, pad)
        mag = stft_ops.stft(
            x[:, 0], n_fft, hop, window=None, magnitude=True)
        return mag[..., None]  # (B, F, T, 1)

    @nn.compact
    def __call__(self, x):
        x = self.spectrogram(x).astype(self.dtype)
        feature_maps = []
        for strides in ((1, 1), (1, 2), (1, 2), (1, 2)):
            x = WNConv2d(
                32, (3, 9), strides=strides, padding=(1, 4),
                dtype=self.dtype)(x)
            x = leaky_relu(x, self.lrelu_slope)
            feature_maps.append(x)
        x = WNConv2d(32, (3, 3), padding=(1, 1), dtype=self.dtype)(x)
        x = leaky_relu(x, self.lrelu_slope)
        feature_maps.append(x)
        x = WNConv2d(1, (3, 3), padding=(1, 1), dtype=self.dtype)(x)
        feature_maps.append(x)
        return x.reshape(x.shape[0], -1), feature_maps


class DiscriminatorCMB(nn.Module):
    """Complex multi-band spectrogram discriminator (RVQGAN-style)

    Reference: promonet/model/discriminator.py:146-208. Each band of the
    1024-bin STFT gets its own conv stack; band outputs are concatenated
    along frequency before the post conv.
    """

    bands: Sequence[Tuple[float, float]] = (
        (0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))
    channels: int = 32
    lrelu_slope: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def spectrogram(self, x):
        window_length = promonet_tpu.WINDOW_SIZE
        hop = promonet_tpu.HOPSIZE
        pad = (window_length - hop) // 2
        x = stft_ops.reflect_pad(x, pad)
        mag = stft_ops.stft(
            x[:, 0], window_length, hop, window=None, magnitude=True)
        # (B, F, T) -> (B, T, F, 1)
        mag = jnp.transpose(mag, (0, 2, 1))[..., None]
        n_freq = window_length // 2 + 1
        return [
            mag[..., int(lo * n_freq):int(hi * n_freq), :]
            for lo, hi in self.bands]

    @nn.compact
    def __call__(self, x):
        x_bands = self.spectrogram(x)
        feature_maps, outputs = [], []
        for band in x_bands:
            band = band.astype(self.dtype)
            for kernel, strides, padding in (
                ((3, 9), (1, 1), (1, 4)),
                ((3, 9), (1, 2), (1, 4)),
                ((3, 9), (1, 2), (1, 4)),
                ((3, 9), (1, 2), (1, 4)),
                ((3, 3), (1, 1), (1, 1)),
            ):
                band = WNConv2d(
                    self.channels, kernel, strides=strides, padding=padding,
                    dtype=self.dtype)(band)
                band = leaky_relu(band, self.lrelu_slope)
                feature_maps.append(band)
            outputs.append(band)
        x = jnp.concatenate(outputs, axis=-2)  # concat along frequency
        x = WNConv2d(1, (3, 3), padding=(1, 1), dtype=self.dtype)(x)
        feature_maps.append(x)
        return x.reshape(x.shape[0], -1), feature_maps


class DiscriminatorS(nn.Module):
    """Multi-scale waveform discriminator (MelGAN-style)

    Reference: promonet/model/discriminator.py:211-239.
    """

    lrelu_slope: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # (B, 1, T) -> (B, T, 1)
        x = jnp.transpose(x, (0, 2, 1)).astype(self.dtype)
        feature_maps = []
        for features, kernel, stride, groups, padding in (
            (16, 15, 1, 1, 7),
            (64, 41, 4, 4, 20),
            (256, 41, 4, 16, 20),
            (1024, 41, 4, 64, 20),
            (1024, 41, 4, 256, 20),
            (1024, 5, 1, 1, 2),
        ):
            x = WNConv1d(
                features, kernel, stride=stride, groups=groups,
                padding=padding, dtype=self.dtype)(x)
            x = leaky_relu(x, self.lrelu_slope)
            feature_maps.append(x)
        x = WNConv1d(1, 3, padding=1, dtype=self.dtype)(x)
        feature_maps.append(x)
        return x.reshape(x.shape[0], -1), feature_maps


###############################################################################
# FARGAN discriminator
###############################################################################


def gen_filterbank(n, sample_rate, keep_size=False):
    """ERB-spaced smoothing filterbank

    Reference: promonet/model/discriminator.py:490-502 (ERB model from
    B.C.J. Moore, An Introduction to the Psychology of Hearing, 5th ed.).
    """
    in_freq = (np.arange(n + 1, dtype='float32') / n * sample_rate / 2)[None, :]
    m = n + 1 if keep_size else n
    out_freq = (np.arange(m, dtype='float32') / n * sample_rate / 2)[:, None]
    erb = 24.7 + .108 * in_freq
    delta = np.abs(in_freq - out_freq) / erb
    center = (delta < .5).astype('float32')
    response = -12 * center * delta ** 2 + (1 - center) * (3 - 12 * delta)
    energy = 10. ** (response / 10.)
    return jnp.asarray(energy / energy.sum(axis=1, keepdims=True))


def create_3x3_conv_plan(num_layers, f_stretch, f_down, t_stretch, t_down):
    """Stride/dilation/padding plan for the MagFree conv stack

    Reference: promonet/model/discriminator.py:397-487.
    """

    def process_dimension(n_layers, stretch, down):
        stack_layers = n_layers - 1
        stride_layers = min(min(down, stretch), stack_layers)
        dilation_layers = max(
            min(stack_layers - stride_layers - 1, stretch - stride_layers), 0)
        final_stride = 2 ** (max(down - stride_layers, 0))

        strides, dilations, paddings = [], [], []
        processed, current_dilation = 0, 1
        for _ in range(stride_layers):
            strides.append(2)
            dilations.append(1)
            paddings.append(1)
            processed += 1
        if processed < stack_layers:
            strides.append(1)
            dilations.append(1)
            paddings.append(1)
            processed += 1
        for _ in range(dilation_layers):
            strides.append(1)
            current_dilation *= 2
            dilations.append(current_dilation)
            paddings.append(current_dilation)
            processed += 1
        while processed < n_layers - 1:
            strides.append(1)
            dilations.append(current_dilation)
            paddings.append(current_dilation)
            processed += 1
        strides.append(final_stride)
        dilations.append(current_dilation)
        paddings.append(current_dilation)
        return strides, dilations, paddings

    t = process_dimension(num_layers, t_stretch, t_down)
    f = process_dimension(num_layers, f_stretch, f_down)
    return [
        ((f[0][i], t[0][i]), (f[1][i], t[1][i]), (f[2][i], t[2][i]))
        for i in range(num_layers)]


def frequency_positional_embedding(x):
    """Append sin/cos frequency position channels

    Reference: promonet/model/discriminator.py:381-389. Layout here is
    (B, T, F, C); position runs over the frequency axis.
    """
    n = x.shape[-2]
    args = jnp.arange(n, dtype=x.dtype) * jnp.pi * 2 / n
    cos = jnp.broadcast_to(
        jnp.cos(args)[None, None, :, None], (*x.shape[:-1], 1))
    sin = jnp.broadcast_to(
        jnp.sin(args)[None, None, :, None], (*x.shape[:-1], 1))
    return jnp.concatenate((x, sin, cos), axis=-1)


class DiscriminatorMagFree(nn.Module):
    """FARGAN spectrogram discriminator with frequency positional embedding

    Reference: promonet/model/discriminator.py:247-379.
    """

    resolution: Tuple[int, int, int]
    num_channels: int = 16
    max_channels: int = 256
    num_layers: int = 5
    dtype: jnp.dtype = jnp.float32

    def spectrogram(self, x):
        n_fft, hop, win = self.resolution
        window = stft_ops.hann_window(win)
        # torch.stft default center=True
        mag = stft_ops.stft(
            x[:, 0], n_fft, hop, window=window, center=True, magnitude=True)
        # amplitude_to_DB(multiplier=20, amin=1e-5, top_db=80)
        db = 20. * jnp.log10(jnp.clip(mag, 1e-5))
        db = jnp.maximum(db, db.max() - 80.)
        # (B, F, T) -> (B, T, F, 1)
        return jnp.transpose(db, (0, 2, 1))[..., None]

    @nn.compact
    def __call__(self, x):
        n_fft = self.resolution[0]
        stretch = {64: 0, 128: 1, 256: 2, 512: 3, 1024: 4, 2048: 5}[n_fft]
        plan = create_3x3_conv_plan(self.num_layers + 1, stretch, stretch, 0, 0)

        x = self.spectrogram(x).astype(self.dtype)
        outputs = []
        out_channels = self.num_channels

        # The plan is expressed as (freq, time) like the reference; our
        # spatial layout is (time, freq), so swap each pair
        def tf(pair):
            return (pair[1], pair[0])

        for i in range(self.num_layers):
            x = frequency_positional_embedding(x)
            x = WNConv2d(
                out_channels,
                (3, 3),
                strides=tf(plan[i][0]),
                dilation=tf(plan[i][1]),
                padding=tf(plan[i][2]),
                dtype=self.dtype)(x)
            x = nn.relu(x)
            outputs.append(x)
            factor = plan[i][0][0] * plan[i][0][1]
            out_channels = min(factor * out_channels, self.max_channels)
        x = frequency_positional_embedding(x)
        x = WNConv2d(
            1,
            (3, 3),
            strides=tf(plan[-1][0]),
            dilation=tf(plan[-1][1]),
            padding=tf(plan[-1][2]),
            dtype=self.dtype)(x)
        x = nn.sigmoid(x)
        return x.reshape(x.shape[0], -1), outputs
