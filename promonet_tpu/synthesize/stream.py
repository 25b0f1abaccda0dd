"""Streaming synthesis.

The reference exports a packed-inference torchscript method for
buffer-at-a-time streaming in IRCAM's nn~ (promonet/model/generator.py:
345-371). Here, streaming is a windowed chunker over the jitted
generator: each step processes [left-context | chunk | right-context]
frames through ONE fixed-shape compiled program and emits only the
chunk's samples, so the convolutional receptive field sees real context
on both sides. Emission latency is `right` frames
(right * HOPSIZE / SAMPLE_RATE seconds).
"""
import jax
import numpy as np

import promonet_tpu


class Streamer:
    """Frame-at-a-time speech synthesis with bounded latency

    Usage:
        streamer = Streamer(checkpoint, speaker=3)
        for features in feature_chunks:
            audio = streamer.feed(*features)   # may be empty
        audio = streamer.flush()
    """

    def __init__(
        self,
        checkpoint=None,
        speaker=0,
        spectral_balance_ratio=1.,
        loudness_ratio=1.,
        chunk_frames=32,
        left_frames=16,
        right_frames=16
    ):
        from .core import _cached_model

        self.chunk = chunk_frames
        self.left = left_frames
        self.right = right_frames
        self.window = left_frames + chunk_frames + right_frames
        self.speaker = speaker
        self.spectral_balance_ratio = spectral_balance_ratio
        self.loudness_ratio = loudness_ratio
        self.model, self.params, _ = _cached_model(checkpoint)

        # Pending (not yet emitted) feature frames; left-context history
        self._pending = None
        self._history = None

        hopsize = promonet_tpu.HOPSIZE
        model = self.model
        params = self.params

        @jax.jit
        def step(loudness, pitch, periodicity, ppg):
            # pitch/periodicity arrive as (1, T) rows
            audio = model.apply(
                params,
                loudness[None],
                pitch,
                periodicity,
                ppg[None],
                np.asarray([speaker]).astype(
                    np.int32 if not promonet_tpu.ZERO_SHOT
                    else np.float32),
                np.asarray([spectral_balance_ratio], np.float32),
                np.asarray([loudness_ratio], np.float32))
            start = left_frames * hopsize
            return audio[0, :, start:start + chunk_frames * hopsize]

        self._step = step

    @property
    def latency_seconds(self):
        """Algorithmic emission latency"""
        return (
            self.right * promonet_tpu.HOPSIZE / promonet_tpu.SAMPLE_RATE)

    def feed(self, loudness, pitch, periodicity, ppg):
        """Append feature frames; return newly synthesizable audio

        Features use the standard layouts: loudness (F, T), pitch (T,)
        or (1, T), periodicity likewise, ppg (C, T).
        """
        incoming = _stack(loudness, pitch, periodicity, ppg)
        if self._pending is None:
            self._pending = incoming
        else:
            self._pending = tuple(
                np.concatenate([a, b], axis=-1)
                for a, b in zip(self._pending, incoming))

        outputs = []
        while self._frames_available() >= self.chunk + self.right:
            outputs.append(self._emit())
        if not outputs:
            return np.zeros((1, 0), np.float32)
        return np.concatenate(outputs, axis=-1)

    def flush(self):
        """Synthesize everything still pending (replicate-padded)"""
        outputs = []
        while self._frames_available() > 0:
            remaining = min(self._frames_available(), self.chunk)
            pad = self.chunk + self.right - self._frames_available()
            if pad > 0:
                self._pending = tuple(
                    np.concatenate(
                        [a, np.repeat(a[..., -1:], pad, axis=-1)], axis=-1)
                    for a in self._pending)
            audio = self._emit()
            outputs.append(audio[..., :remaining * promonet_tpu.HOPSIZE])
            # Drop any replicate padding that leaked into pending
            self._pending = tuple(
                a[..., :max(0, a.shape[-1] - pad)] if pad > 0 else a
                for a in self._pending)
        self._pending = None
        self._history = None
        if not outputs:
            return np.zeros((1, 0), np.float32)
        return np.concatenate(outputs, axis=-1)

    def _frames_available(self):
        return 0 if self._pending is None else self._pending[1].shape[-1]

    def _emit(self):
        """Run one window; advance by chunk frames"""
        # Assemble [history | pending-window]
        window = tuple(a[..., :self.chunk + self.right]
                       for a in self._pending)
        if self._history is None:
            # Replicate the first frame as initial left context
            history = tuple(
                np.repeat(a[..., :1], self.left, axis=-1) for a in window)
        else:
            history = self._history
        full = tuple(
            np.concatenate([h, w], axis=-1)[..., :self.window]
            for h, w in zip(history, window))
        # Pad to the window if the right context is short
        full = tuple(
            np.concatenate(
                [a, np.repeat(
                    a[..., -1:], self.window - a.shape[-1], axis=-1)],
                axis=-1) if a.shape[-1] < self.window else a
            for a in full)

        audio = np.asarray(self._step(*full))

        # Next left context: the last `left` frames ending at the chunk
        # boundary
        consumed = tuple(a[..., :self.chunk] for a in self._pending)
        boundary = tuple(
            np.concatenate([h, c], axis=-1)[..., -self.left:]
            for h, c in zip(history, consumed))
        self._history = boundary
        self._pending = tuple(
            a[..., self.chunk:] for a in self._pending)
        return audio


def _stack(loudness, pitch, periodicity, ppg):
    loudness = np.asarray(loudness, np.float32)
    pitch = np.asarray(pitch, np.float32).reshape(1, -1)
    periodicity = np.asarray(periodicity, np.float32).reshape(1, -1)
    ppg = np.asarray(ppg, np.float32)
    return (loudness, pitch, periodicity, ppg)


class FARGANStreamer:
    """Exact-state streaming for the FARGAN backbone.

    FARGAN's frame recurrence is an `nn.scan` whose carry (rolling sample
    buffer + GRU/framewise-conv states) is the COMPLETE state of the
    synthesis (models/fargan.py); carrying it across chunk boundaries
    makes chunked synthesis bit-identical to one offline pass — no
    context windows, no recompute, zero algorithmic latency beyond the
    chunk itself. This is the streaming contract of the reference's
    recurrent state init (promonet/model/fargan.py:406-415) taken to its
    TPU-native conclusion: one fixed-shape compiled program per chunk
    size, state resident between calls.
    """

    def __init__(
        self,
        checkpoint=None,
        speaker=0,
        spectral_balance_ratio=1.,
        loudness_ratio=1.,
        chunk_frames=32
    ):
        from .core import _cached_model

        if promonet_tpu.MODEL != 'fargan':
            raise ValueError(
                'FARGANStreamer requires MODEL="fargan"; use Streamer '
                '(windowed) for convolutional backbones')
        self.chunk = chunk_frames
        self.model, self.params, _ = _cached_model(checkpoint)
        self._pending = None

        # Zero initial carry, matching FARGAN's internal init
        import jax.numpy as jnp
        hopsize = promonet_tpu.HOPSIZE
        subframe = hopsize // 4
        num_previous = promonet_tpu.NUM_PREVIOUS_SAMPLES
        dtype = self.model.dtype
        self._carry = (
            jnp.zeros((1, num_previous), jnp.float32),
            (
                jnp.zeros((1, hopsize), dtype),
                jnp.zeros((1, hopsize), dtype),
                jnp.zeros((1, hopsize), dtype),
                jnp.zeros((1, 4 * subframe + 4), dtype)))

        model = self.model
        params = self.params

        @jax.jit
        def step(carry, loudness, pitch, periodicity, ppg):
            audio, carry = model.apply(
                params,
                loudness[None],
                pitch,
                periodicity,
                ppg[None],
                np.asarray([speaker]).astype(
                    np.int32 if not promonet_tpu.ZERO_SHOT
                    else np.float32),
                np.asarray([spectral_balance_ratio], np.float32),
                np.asarray([loudness_ratio], np.float32),
                initial_states=carry,
                return_states=True)
            return audio[0], carry

        self._step = step

    @property
    def latency_seconds(self):
        """Algorithmic latency: one chunk"""
        return (
            self.chunk * promonet_tpu.HOPSIZE / promonet_tpu.SAMPLE_RATE)

    def feed(self, loudness, pitch, periodicity, ppg):
        """Append feature frames; return newly synthesized audio"""
        incoming = _stack(loudness, pitch, periodicity, ppg)
        if self._pending is None:
            self._pending = incoming
        else:
            self._pending = tuple(
                np.concatenate([a, b], axis=-1)
                for a, b in zip(self._pending, incoming))

        outputs = []
        while self._pending[1].shape[-1] >= self.chunk:
            window = tuple(a[..., :self.chunk] for a in self._pending)
            self._pending = tuple(
                a[..., self.chunk:] for a in self._pending)
            audio, self._carry = self._step(self._carry, *window)
            outputs.append(np.asarray(audio))
        if not outputs:
            return np.zeros((1, 0), np.float32)
        return np.concatenate(outputs, axis=-1)

    def flush(self):
        """Synthesize the remaining (< chunk) frames

        The tail is zero-padded to the chunk so the compiled program is
        reused, and the padding's output is trimmed — the scan is causal,
        so the true frames' samples are unaffected. Terminal: the carry
        is reset afterwards.
        """
        remaining = (
            0 if self._pending is None else self._pending[1].shape[-1])
        if remaining == 0:
            self._pending = None
            return np.zeros((1, 0), np.float32)
        pad = self.chunk - remaining
        window = tuple(
            np.concatenate(
                [a, np.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1)
            for a in self._pending)
        audio, _ = self._step(self._carry, *window)
        self._pending = None
        return np.asarray(
            audio)[..., :remaining * promonet_tpu.HOPSIZE]
