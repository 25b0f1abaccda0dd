"""Short-time Fourier analysis/synthesis.

TPU-native replacement for the reference's torch.stft / librosa.stft calls
(promonet/preprocess/spectrogram.py:40-52, promonet/preprocess/loudness.py:38-43)
and the Vocos differentiable ISTFT (promonet/model/vocos.py:169-206).

Everything here is jittable with static shapes; framing is expressed as a
reshape+gather pattern XLA lowers to efficient HBM reads, and the FFTs map
onto the TPU's native rFFT.
"""
import jax
import jax.numpy as jnp
import numpy as np


def hann_window(size, dtype=jnp.float32):
    """Periodic Hann window (matches torch.hann_window / scipy periodic)"""
    n = np.arange(size)
    return jnp.asarray(0.5 - 0.5 * np.cos(2 * np.pi * n / size), dtype=dtype)


def frame(audio, frame_length, hop_length):
    """Slice audio (..., T) into overlapping frames (..., N, frame_length)

    No centering or padding; N = 1 + (T - frame_length) // hop_length.
    """
    num_frames = 1 + (audio.shape[-1] - frame_length) // hop_length
    # Gather frame starts with a strided slice pattern; XLA fuses this into
    # the downstream FFT's input read
    idx = (
        np.arange(num_frames)[:, None] * hop_length +
        np.arange(frame_length)[None, :])
    return audio[..., idx]


def reflect_pad(audio, padding):
    """Reflect-pad the last axis on both sides"""
    pad = [(0, 0)] * (audio.ndim - 1) + [(padding, padding)]
    return jnp.pad(audio, pad, mode='reflect')


def stft(
    audio,
    n_fft,
    hop_length,
    window=None,
    center=False,
    magnitude=False,
    magnitude_epsilon=0.
):
    """Compute (complex or magnitude) STFT of audio (..., T)

    With center=False and no padding this matches
    torch.stft(..., center=False): frames start at multiples of hop_length.
    Returns (..., n_freq, n_frames) to match torch/librosa layout.
    """
    if center:
        audio = reflect_pad(audio, n_fft // 2)
    frames = frame(audio, n_fft, hop_length)
    if window is not None:
        frames = frames * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    if magnitude:
        if magnitude_epsilon:
            spec = jnp.sqrt(
                spec.real ** 2 + spec.imag ** 2 + magnitude_epsilon)
        else:
            spec = jnp.abs(spec)
    # (..., frames, freq) -> (..., freq, frames)
    return jnp.swapaxes(spec, -1, -2)


def overlap_add(frames, hop_length):
    """Overlap-add frames (..., frame_length, n_frames) -> (..., T)

    T = (n_frames - 1) * hop_length + frame_length. Formulated as a strided
    scatter-add, which XLA lowers without materializing the fold matrix.
    """
    frame_length, num_frames = frames.shape[-2], frames.shape[-1]
    output_size = (num_frames - 1) * hop_length + frame_length

    # (..., n_frames, frame_length)
    frames = jnp.swapaxes(frames, -1, -2)

    idx = (
        np.arange(num_frames)[:, None] * hop_length +
        np.arange(frame_length)[None, :]).reshape(-1)
    flat = frames.reshape(*frames.shape[:-2], -1)
    out = jnp.zeros((*frames.shape[:-2], output_size), dtype=frames.dtype)
    return out.at[..., idx].add(flat)


def istft(spec, n_fft, hop_length, window):
    """Differentiable inverse STFT with window-envelope normalization

    Matches the reference Vocos ISTFT (promonet/model/vocos.py:179-206):
    irfft each frame, window, overlap-add, trim (win - hop) // 2 on both
    sides, and normalize by the summed squared-window envelope.

    Arguments
        spec: complex STFT, shape (..., n_freq, n_frames)
    Returns
        audio, shape (..., n_frames * hop_length)
    """
    num_frames = spec.shape[-1]
    pad = (n_fft - hop_length) // 2

    # Inverse FFT per frame: (..., freq, frames) -> (..., frames, time)
    ifft = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    ifft = ifft * window

    # Overlap-add signal and window envelope
    audio = overlap_add(jnp.swapaxes(ifft, -1, -2), hop_length)
    envelope = overlap_add(
        jnp.broadcast_to(
            (window * window)[:, None], (n_fft, num_frames)),
        hop_length)

    audio = audio[..., pad:-pad]
    envelope = envelope[..., pad:-pad]
    return audio / envelope
