"""WORLD baseline: algorithmic fidelity tests.

Validates the dio/stonemask/cheaptrick/d4c implementations against
signals with known ground truth (reference behavior:
promonet/baseline/world.py:175-215).
"""
import numpy as np
import pytest

import promonet_tpu
from promonet_tpu.baseline import world


SAMPLE_RATE = 22050


def harmonic_signal(f0_hz, seconds=1.0, harmonics=8, vibrato_hz=0.,
                    vibrato_cents=0.):
    """Harmonic signal with known (possibly modulated) F0"""
    t = np.arange(int(seconds * SAMPLE_RATE)) / SAMPLE_RATE
    f0 = f0_hz * 2 ** (
        vibrato_cents / 1200. * np.sin(2 * np.pi * vibrato_hz * t))
    phase = 2 * np.pi * np.cumsum(f0) / SAMPLE_RATE
    audio = sum(
        (0.6 ** k) * np.sin((k + 1) * phase) for k in range(harmonics))
    return (0.4 * audio / np.abs(audio).max()).astype(np.float64), f0


def cents(a, b):
    return np.abs(1200 * np.log2(a / b))


def test_dio_stonemask_constant_pitch():
    audio, f0_true = harmonic_signal(220.)
    f0, envelope, aperiodicity = world.analyze(audio)
    voiced = f0 > 0
    # Interior frames must be detected as voiced
    assert voiced[5:-5].mean() > 0.9
    frames = np.arange(len(f0))
    truth = f0_true[np.minimum(
        frames * promonet_tpu.HOPSIZE, len(f0_true) - 1)]
    error = cents(f0[voiced], truth[voiced])
    assert np.median(error) < 10.


def test_dio_stonemask_vibrato():
    audio, f0_true = harmonic_signal(
        180., vibrato_hz=4., vibrato_cents=150.)
    f0, _, _ = world.analyze(audio)
    voiced = f0 > 0
    assert voiced[5:-5].mean() > 0.8
    frames = np.arange(len(f0))
    truth = f0_true[np.minimum(
        frames * promonet_tpu.HOPSIZE, len(f0_true) - 1)]
    error = cents(f0[voiced], truth[voiced])
    # Tracks the vibrato without octave errors
    assert np.median(error) < 25.
    assert (error > 600).mean() < 0.05


def test_dio_unvoiced_noise():
    # At the reference's permissive allowed_range=.8
    # (promonet/baseline/world.py:16), band-limited noise can pass the
    # DIO stability gate — what must hold is that D4C saturates the
    # aperiodicity, so synthesis still treats those frames as noise
    rng = np.random.default_rng(0)
    audio = 0.1 * rng.standard_normal(SAMPLE_RATE)
    f0, _, aperiodicity = world.analyze(audio)
    assert aperiodicity.mean() > 0.8
    voiced = f0 > 0
    if voiced.any():
        assert aperiodicity[:, voiced].mean() > 0.5


def test_cheaptrick_formant_peak():
    # Flat harmonic source through a 1 kHz resonance: the envelope
    # should peak near the resonance, not at individual harmonics
    t = np.arange(SAMPLE_RATE) / SAMPLE_RATE
    phase = 2 * np.pi * 140. * t
    audio = sum(np.sin((k + 1) * phase) for k in range(40))
    audio = 0.4 * audio / np.abs(audio).max()
    import scipy.signal
    resonance = 1000.
    r = np.exp(-np.pi * 150. / SAMPLE_RATE)
    theta = 2 * np.pi * resonance / SAMPLE_RATE
    filtered = scipy.signal.lfilter(
        [1. - r], [1., -2 * r * np.cos(theta), r * r], audio)
    f0, envelope, _ = world.analyze(filtered)
    voiced = f0 > 0
    mean_envelope = envelope[:, voiced].mean(axis=1)
    bin_hz = SAMPLE_RATE / promonet_tpu.NUM_FFT
    peak_hz = np.argmax(mean_envelope[:int(3000 / bin_hz)]) * bin_hz
    assert abs(peak_hz - resonance) < 300.


def test_d4c_discriminates_noise():
    audio, _ = harmonic_signal(200., harmonics=30)
    f0, _, ap_harmonic = world.analyze(audio)
    voiced = f0 > 0
    rng = np.random.default_rng(1)
    noisy = audio + 0.5 * rng.standard_normal(len(audio))
    f0_n, _, ap_noisy = world.analyze(noisy)
    voiced_n = f0_n > 0
    if voiced.any() and voiced_n.any():
        # low-band aperiodicity: clean harmonic << noisy harmonic
        low = ap_harmonic[:60, voiced].mean()
        low_noisy = ap_noisy[:60, voiced_n].mean()
        assert low < 0.5
        assert low_noisy > low


def test_round_trip_f0():
    audio, _ = harmonic_signal(220., seconds=1.2)
    f0, envelope, aperiodicity = world.analyze(audio)
    out = world.synthesize(f0, envelope, aperiodicity)
    assert out.shape == (1, len(f0) * promonet_tpu.HOPSIZE)
    f0_round, _, _ = world.analyze(out[0].astype(np.float64))
    voiced = (f0 > 0) & (f0_round > 0)
    assert voiced.mean() > 0.7
    error = cents(f0_round[voiced], f0[voiced])
    assert np.median(error) < 20.


def test_pitch_shift_swaps_f0():
    audio, _ = harmonic_signal(200., seconds=1.0)
    frames = len(audio) // promonet_tpu.HOPSIZE
    target = np.full(frames, 300.)
    periodicity = np.ones(frames)
    out = world.from_audio(
        audio, pitch=target, periodicity=periodicity)
    f0_out, _, _ = world.analyze(out[0].astype(np.float64))
    voiced = f0_out > 0
    assert voiced.mean() > 0.5
    assert np.median(cents(f0_out[voiced], 300.)) < 30.


def test_time_stretch_length_and_f0():
    audio, _ = harmonic_signal(250., seconds=1.0)
    frames = len(audio) // promonet_tpu.HOPSIZE
    grid = np.linspace(0, frames - 1, int(frames * 1.5))
    out = world.from_audio(audio, grid=grid)
    assert out.shape[-1] == len(grid) * promonet_tpu.HOPSIZE
    f0_out, _, _ = world.analyze(out[0].astype(np.float64))
    voiced = f0_out > 0
    assert np.median(cents(f0_out[voiced], 250.)) < 30.
