"""FARGAN: framewise autoregressive GAN vocoder.

TPU re-design of the reference FARGAN (promonet/model/fargan.py). The
reference iterates frames and subframes in Python (fargan.py:51-131); here
the frame recurrence is a single `nn.scan` (one XLA while-loop with fused
bodies) and the four subframes per frame are statically unrolled inside
the scan body. The pitch-period lookback (`torch.gather` at
fargan.py:233-242) becomes a static-shape `take_along_axis` into the
rolling sample buffer carried through the scan.
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .modules import WNDense, torch_conv_init


def _additive_noise(x, rng, enabled):
    """Uniform noise injection (promonet/model/fargan.py:396-403)"""
    if not enabled:
        return x
    noise = (1. / 127.) * (
        jax.random.uniform(rng, x.shape, x.dtype) - .5)
    return jnp.clip(x + noise, -1., 1.)


class GRUCellNoBias(nn.Module):
    """torch.nn.GRUCell(bias=False) semantics"""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        bound_i = 1. / np.sqrt(self.features)
        dense_i = nn.Dense(
            3 * self.features,
            use_bias=False,
            kernel_init=nn.initializers.uniform(scale=2 * bound_i),
            dtype=self.dtype)
        dense_h = nn.Dense(
            3 * self.features,
            use_bias=False,
            kernel_init=nn.initializers.uniform(scale=2 * bound_i),
            dtype=self.dtype)
        gi = dense_i(x) - bound_i  # recentre uniform(0, 2b) -> (-b, b)
        gh = dense_h(h)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = nn.sigmoid(i_r + h_r)
        z = nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1. - z) * n + z * h


class GLU(nn.Module):
    """Gated linear unit (promonet/model/fargan.py:375-388)"""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return x * nn.sigmoid(
            WNDense(self.features, dtype=self.dtype)(x))


class FramewiseConv(nn.Module):
    """State-concatenating frame conv (promonet/model/fargan.py:349-372)"""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, state):
        x = jnp.concatenate((features, state), axis=-1)
        x = WNDense(self.features, dtype=self.dtype)(x)
        x = jnp.tanh(x)
        return GLU(self.features, dtype=self.dtype)(x)


class ConditioningNetwork(nn.Module):
    """3×(Linear+Tanh) feature encoder (promonet/model/fargan.py:139-160)"""

    hopsize: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        channels = x.shape[-1]
        for features in (channels, channels, 2 * self.hopsize):
            x = nn.Dense(
                features,
                use_bias=False,
                kernel_init=torch_conv_init(x.shape[-1]),
                dtype=self.dtype)(x)
            x = jnp.tanh(x)
        return x


class SubframeNetwork(nn.Module):
    """One subframe of samples from conditioning + lookback + recurrence

    Reference: promonet/model/fargan.py:163-335.
    """

    hopsize: int
    subframe_size: int
    num_previous_samples: int
    additive_noise: bool
    gain_normalization: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, previous_samples, period, states, rngs):
        """
        Arguments
            features: (B, 2 * subframe_size) conditioning slice
            previous_samples: (B, num_previous_samples) rolling buffer
            period: (B,) int32 pitch period in samples
            states: (gru1, gru2, gru3, fwconv) recurrent state
            rngs: iterator of noise keys (or None at inference)

        Returns
            (signal (B, subframe_size), states)
        """
        noise_on = self.additive_noise and rngs is not None

        def noisy(x):
            return _additive_noise(x, next(rngs), True) if noise_on else x

        features_noise = noisy(features)

        # Extract a subframe one or two pitch periods ago
        # (promonet/model/fargan.py:233-242)
        buffer_len = previous_samples.shape[-1]
        lookback = (
            buffer_len - period[:, None] +
            jnp.arange(self.subframe_size + 4)[None, :] - 2)
        lookback = lookback - period[:, None] * (lookback >= buffer_len)
        lookback = jnp.clip(lookback, 0, buffer_len - 1)
        pitch_lookback = jnp.take_along_axis(
            previous_samples, lookback, axis=-1).astype(self.dtype)

        previous_subframe = noisy(
            previous_samples[:, -self.subframe_size:].astype(self.dtype))

        if self.gain_normalization:
            gain = jnp.exp(
                nn.Dense(1, dtype=self.dtype)(features_noise))
            previous_subframe = previous_subframe / (1e-5 + gain)
            pitch_lookback = pitch_lookback / (1e-5 + gain)
        pitch_lookback = noisy(pitch_lookback)

        subframe_input_features = jnp.concatenate(
            (features_noise, previous_subframe, pitch_lookback), axis=-1)
        fwconv_out = noisy(
            FramewiseConv(self.hopsize, dtype=self.dtype)(
                subframe_input_features, states[3]))
        pitch_lookback = pitch_lookback[:, 2:-2]

        if self.gain_normalization:
            pitch_gain = nn.sigmoid(
                nn.Dense(4, dtype=self.dtype)(fwconv_out)) + 1e-5
        else:
            pitch_gain = jnp.ones((1, 4), dtype=self.dtype)

        gru_outs = []
        gru_states = []
        gru_in = fwconv_out
        for i in range(3):
            gru_state = GRUCellNoBias(self.hopsize, dtype=self.dtype)(
                states[i],
                jnp.concatenate(
                    [
                        gru_in,
                        pitch_gain[:, i:i + 1] * pitch_lookback,
                        previous_subframe
                    ],
                    axis=-1))
            gru_out = noisy(
                GLU(self.hopsize, dtype=self.dtype)(noisy(gru_state)))
            gru_states.append(gru_state)
            gru_outs.append(gru_out)
            gru_in = gru_out

        skip_features = jnp.concatenate(
            gru_outs + [fwconv_out, pitch_gain[:, 3:4] * pitch_lookback,
                        previous_subframe],
            axis=-1)
        skip_out = GLU(self.hopsize, dtype=self.dtype)(
            noisy(jnp.tanh(
                nn.Dense(
                    self.hopsize,
                    use_bias=False,
                    kernel_init=nn.initializers.orthogonal(),
                    dtype=self.dtype)(skip_features))))

        output = jnp.tanh(
            nn.Dense(
                self.subframe_size,
                use_bias=False,
                kernel_init=nn.initializers.orthogonal(),
                dtype=self.dtype)(skip_out))
        if self.gain_normalization:
            output = output * gain

        # Pin state dtypes: the scan carry must keep identical types
        # across iterations regardless of promotion inside the body
        states = (
            gru_states[0].astype(self.dtype),
            gru_states[1].astype(self.dtype),
            gru_states[2].astype(self.dtype),
            subframe_input_features.astype(self.dtype))
        return output, states


class FrameStep(nn.Module):
    """One frame of the scan: 4 subframes, rolling sample buffer"""

    hopsize: int
    subframe_size: int
    subframes: int
    num_previous_samples: int
    additive_noise: bool
    gain_normalization: bool
    train: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, inputs):
        previous_samples, states = carry
        cond, period = inputs  # (B, 2 * hopsize), (B,)

        if self.train and self.additive_noise:
            # Enough keys for every noise site across the subframes
            keys = iter(jax.random.split(self.make_rng('noise'), 64))
        else:
            keys = None

        network = SubframeNetwork(
            self.hopsize,
            self.subframe_size,
            self.num_previous_samples,
            self.additive_noise,
            self.gain_normalization,
            dtype=self.dtype)

        # (B, 2 * subframe_size, subframes) conditioning slices
        # (promonet/model/fargan.py:109-113)
        cond = cond.reshape(
            cond.shape[0], 2 * self.subframe_size, self.subframes)

        outputs = []
        for s in range(self.subframes):
            subframe, states = network(
                cond[..., s], previous_samples, period, states, keys)
            outputs.append(subframe)
            previous_samples = jnp.concatenate(
                [
                    previous_samples[:, self.subframe_size:],
                    subframe.astype(previous_samples.dtype)
                ],
                axis=-1)

        frame = jnp.concatenate(outputs, axis=-1)  # (B, hopsize)
        return (previous_samples, states), frame


class FARGAN(nn.Module):
    """FARGAN over (B, T, C) features; returns (B, T * hopsize, 1)

    The final feature channel is the pitch period in samples
    (promonet/model/generator.py:191-195).
    """

    hopsize: int = 256
    subframe_size: int = 64
    subframes: int = 4
    previous_frames: int = 2
    additive_noise: bool = True
    gain_normalization: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features,
        global_features,
        previous_samples=None,
        train=False,
        initial_states=None,
        return_states=False
    ):
        """
        Arguments
            initial_states: (previous_samples_buffer, recurrent_states)
                carry from a previous call — exact-state streaming
                continuation (the scan carry is the complete state of the
                recurrence, so chunked synthesis is bit-identical to one
                offline pass)
            return_states: also return the final carry
        """
        batch, num_frames, _ = features.shape
        num_previous = self.hopsize * self.previous_frames

        # Separate pitch period (promonet/model/fargan.py:97-99)
        period = jnp.round(features[..., -1]).astype(jnp.int32)  # (B, T)
        period = jnp.clip(period, 1, num_previous - self.subframe_size - 2)
        features = features[..., :-1]

        # Frame conditioning for all frames at once (batched matmul on MXU)
        global_broadcast = jnp.broadcast_to(
            global_features,
            (batch, num_frames, global_features.shape[-1]))
        cond = ConditioningNetwork(self.hopsize, dtype=self.dtype)(
            jnp.concatenate([features, global_broadcast], axis=-1))

        # Initial sample buffer and recurrent state
        # (promonet/model/fargan.py:406-415)
        if initial_states is not None:
            prev, states = initial_states
        else:
            if previous_samples is None:
                prev = jnp.zeros((batch, num_previous), jnp.float32)
            else:
                prev = previous_samples.reshape(batch, -1)[:, -num_previous:]
            states = (
                jnp.zeros((batch, self.hopsize), self.dtype),
                jnp.zeros((batch, self.hopsize), self.dtype),
                jnp.zeros((batch, self.hopsize), self.dtype),
                jnp.zeros((batch, 4 * self.subframe_size + 4), self.dtype))

        scan = nn.scan(
            FrameStep,
            variable_broadcast='params',
            split_rngs={'params': False, 'noise': True},
            in_axes=1,
            out_axes=1)
        carry, frames = scan(
            self.hopsize,
            self.subframe_size,
            self.subframes,
            num_previous,
            self.additive_noise,
            self.gain_normalization,
            train,
            dtype=self.dtype)((prev, states), (cond, period))

        # (B, T, hopsize) -> (B, T * hopsize, 1)
        signal = frames.reshape(batch, num_frames * self.hopsize)
        signal = signal.astype(jnp.float32)[..., None]
        if return_states:
            return signal, carry
        return signal
