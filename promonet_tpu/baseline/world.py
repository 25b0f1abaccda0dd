"""WORLD-style DSP vocoder baseline.

Reference: promonet/baseline/world.py (pyworld: dio/stonemask pitch,
cheaptrick envelope, d4c aperiodicity). pyworld is not available here, so
this is a self-contained source-filter vocoder with the same API and edit
semantics: analysis to (F0, spectral envelope, band aperiodicity),
pitch-shift by swapping F0, time-stretch by linear interpolation of the
parameters in log-F0 space (baseline/world.py:218-274), and
pulse-plus-noise resynthesis. Runs on host numpy — it is a comparison
baseline, not a TPU hot path.
"""
import numpy as np
import scipy.signal

import promonet_tpu

FRAME_PERIOD_MS = 1000. * promonet_tpu.HOPSIZE / promonet_tpu.SAMPLE_RATE


def analyze(audio, sample_rate=None):
    """Analyze audio → (pitch, spectrogram envelope, aperiodicity)

    Reference: promonet/baseline/world.py:175-215.
    """
    if sample_rate is None:
        sample_rate = promonet_tpu.SAMPLE_RATE
    audio = np.asarray(audio, np.float64)
    if audio.ndim == 2:
        audio = audio[0]

    # Pitch from the shared estimator (replaces dio+stonemask)
    pitch, periodicity = promonet_tpu.preprocess.pitch.from_audio(
        audio[None].astype(np.float32))
    pitch = pitch[0].astype(np.float64)
    voiced = periodicity[0] > promonet_tpu.VOICING_THRESHOLD
    f0 = np.where(voiced, pitch, 0.)

    # Spectral envelope: cepstrally-smoothed magnitude (cheaptrick-like)
    mag = np.asarray(
        promonet_tpu.preprocess.spectrogram.from_audio(
            audio[None].astype(np.float32)),
        np.float64)
    log_mag = np.log(np.maximum(mag, 1e-10))
    cepstrum = np.fft.irfft(log_mag, axis=0)
    lifter = np.zeros(cepstrum.shape[0])
    cutoff = int(sample_rate / 500.)
    lifter[:cutoff] = 1.
    lifter[1:cutoff] *= 1.  # symmetric handled by irfft/rfft pair
    envelope = np.exp(np.fft.rfft(
        cepstrum * lifter[:, None], n=cepstrum.shape[0], axis=0).real)
    envelope = envelope[:mag.shape[0]]

    # Aperiodicity from periodicity (d4c stand-in): one band
    aperiodicity = np.clip(1. - periodicity[0], 0.01, 0.99)[None, :]
    aperiodicity = np.repeat(aperiodicity, envelope.shape[0], axis=0)

    length = min(f0.shape[-1], envelope.shape[-1])
    return f0[:length], envelope[:, :length], aperiodicity[:, :length]


def synthesize(f0, envelope, aperiodicity, sample_rate=None):
    """Pulse+noise source-filter synthesis"""
    if sample_rate is None:
        sample_rate = promonet_tpu.SAMPLE_RATE
    hopsize = promonet_tpu.HOPSIZE
    num_frames = f0.shape[-1]
    num_samples = num_frames * hopsize

    # Excitation: pitch-synchronous pulse train + noise
    f0_samples = np.repeat(np.maximum(f0, 0.), hopsize)[:num_samples]
    voiced_mask = f0_samples > 0
    phase = np.cumsum(f0_samples / sample_rate)
    pulses = np.zeros(num_samples)
    crossings = np.diff(np.floor(phase), prepend=0.) > 0
    pulses[crossings & voiced_mask] = np.sqrt(
        np.maximum(f0_samples[crossings & voiced_mask], 1.))
    noise = np.random.default_rng(0).standard_normal(num_samples) * 0.03

    aper_samples = np.repeat(
        aperiodicity.mean(axis=0), hopsize)[:num_samples]
    excitation = (
        pulses * (1. - aper_samples) + noise * aper_samples)

    # Filter per frame with the spectral envelope (overlap-add)
    n_fft = promonet_tpu.NUM_FFT
    window = scipy.signal.get_window('hann', n_fft, fftbins=True)
    pad = n_fft // 2
    padded = np.pad(excitation, (pad, pad))
    output = np.zeros(num_samples + 2 * pad)
    norm = np.zeros(num_samples + 2 * pad)
    for frame in range(num_frames):
        start = frame * hopsize
        chunk = padded[start:start + n_fft]
        if len(chunk) < n_fft:
            chunk = np.pad(chunk, (0, n_fft - len(chunk)))
        spectrum = np.fft.rfft(chunk * window)
        filtered = np.fft.irfft(
            spectrum * envelope[:, frame], n=n_fft)
        output[start:start + n_fft] += filtered * window
        norm[start:start + n_fft] += window * window
    output = output / np.maximum(norm, 1e-8)
    output = output[pad:pad + num_samples]
    peak = np.abs(output).max()
    if peak > 0:
        output = output / peak * 0.6
    return output.astype(np.float32)[None]


def from_audio(
    audio,
    sample_rate=None,
    grid=None,
    pitch=None,
    periodicity=None,
    loudness=None
):
    """Perform World-style analysis/editing/synthesis

    Reference: promonet/baseline/world.py:20-102: optional time-stretch
    grid, pitch replacement, and loudness matching (limiter-protected).
    """
    f0, envelope, aperiodicity = analyze(audio, sample_rate)

    # Maybe time-stretch
    if grid is not None:
        f0, envelope, aperiodicity = linear_time_stretch(
            f0, envelope, aperiodicity, np.asarray(grid))

    # Maybe pitch-shift (swap F0)
    if pitch is not None:
        pitch = np.asarray(pitch).reshape(-1)[:f0.shape[-1]]
        voiced = f0 > 0
        new_f0 = np.zeros_like(f0)
        new_f0[voiced] = pitch[voiced] if len(pitch) == len(f0) else pitch
        f0 = new_f0

    generated = synthesize(f0, envelope, aperiodicity, sample_rate)

    # Maybe match loudness
    if loudness is not None:
        generated = np.asarray(
            promonet_tpu.preprocess.loudness.scale(
                generated, np.asarray(loudness)))
    return generated


def linear_time_stretch(f0, envelope, aperiodicity, grid):
    """Time-stretch WORLD parameters along a grid, F0 in log space

    Reference: promonet/baseline/world.py:218-274.
    """
    voiced = f0 > 0
    log_f0 = np.where(voiced, np.log2(np.maximum(f0, 1e-3)), 0.)
    frames = np.arange(f0.shape[-1])

    stretched_voiced = np.interp(grid, frames, voiced.astype(np.float64)) > .5
    stretched_log_f0 = np.interp(grid, frames, log_f0)
    stretched_f0 = np.where(stretched_voiced, 2. ** stretched_log_f0, 0.)

    def stretch_rows(matrix):
        return np.stack(
            [np.interp(grid, frames, row) for row in matrix])

    return (
        stretched_f0,
        stretch_rows(envelope),
        stretch_rows(aperiodicity))
