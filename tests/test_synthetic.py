"""Formant-synthesis corpus: alignment correctness + pitch validation.

The synthetic corpus (promonet_tpu/data/synthetic.py) is the zero-egress
stand-in for recorded speech; these tests assert the ground-truth
alignments it emits are consistent, and use them to validate the pitch
estimator the way the reference validates against penn
(promonet/preprocess/core.py:64-86).
"""
import numpy as np
import pytest

import promonet_tpu
from promonet_tpu.data import synthetic


def test_phone_recipes_cover_inventory():
    """Every phoneme in the PPG inventory has an acoustic recipe"""
    covered = (
        set(synthetic.VOWELS) | set(synthetic.DIPHTHONGS) |
        set(synthetic.GLIDES) | set(synthetic.NASALS) |
        set(synthetic.FRICATIVES) | set(synthetic.PLOSIVES) |
        set(synthetic.AFFRICATES) | {synthetic.SILENCE})
    assert covered == set(promonet_tpu.preprocess.ppg.PHONEMES)


def test_aligned_utterance_consistency():
    rng = np.random.default_rng(7)
    profile = synthetic.sample_speaker(rng, 0)
    audio, phones, labels, f0, voiced = \
        synthetic.generate_aligned_utterance(rng, profile, 2.0)

    # Audio length is an exact multiple of the hopsize; one label per frame
    assert audio.shape[-1] % promonet_tpu.HOPSIZE == 0
    frames = audio.shape[-1] // promonet_tpu.HOPSIZE
    assert labels.shape == f0.shape == voiced.shape == (frames,)

    # Labels are valid phoneme indices; silence frames are unvoiced
    assert labels.min() >= 0
    assert labels.max() < promonet_tpu.PPG_CHANNELS
    silence = promonet_tpu.preprocess.ppg.PHONEME_TO_INDEX_MAPPING[
        synthetic.SILENCE]
    # Interior silence frames (away from coarticulation smoothing) must
    # be unvoiced — check frames whose neighbors are also silence
    interior = (
        (labels[1:-1] == silence) &
        (labels[:-2] == silence) &
        (labels[2:] == silence))
    assert not voiced[1:-1][interior].any()

    # F0 is within the configured pitch range everywhere
    assert (f0 >= promonet_tpu.FMIN).all()
    assert (f0 <= promonet_tpu.FMAX).all()

    # Audio is non-degenerate
    assert 0.2 < np.abs(audio).max() <= 1.0
    assert np.isfinite(audio).all()


def test_pitch_estimator_against_ground_truth():
    """The NCC+Viterbi estimator recovers the synthesizer's exact F0

    This is the zero-egress analogue of validating against penn: the
    synthesizer knows its own glottal-source frequency at every frame.
    Reference thresholds: 50 cents frame error
    (promonet/config/defaults.py:198).
    """
    rng = np.random.default_rng(11)
    all_cents, octave_errors, voiced_frames = [], 0, 0
    for i in range(2):
        profile = synthetic.sample_speaker(rng, i)
        audio, _, _, f0, voiced = \
            synthetic.generate_aligned_utterance(rng, profile, 1.5)
        pitch, _ = promonet_tpu.preprocess.pitch.from_audio(audio)
        pitch = np.asarray(pitch)[0][:len(f0)]
        mask = voiced[:len(pitch)]
        cents = 1200 * np.abs(
            np.log2(pitch[mask] / f0[:len(pitch)][mask]))
        all_cents.append(cents)
        octave_errors += int((cents > 600).sum())
        voiced_frames += int(mask.sum())
    cents = np.concatenate(all_cents)
    assert np.median(cents) < 30.
    assert octave_errors / max(voiced_frames, 1) < 0.005


def test_create_writes_alignments(tmp_path, monkeypatch):
    monkeypatch.setattr(promonet_tpu, 'CACHE_DIR', tmp_path / 'cache')
    monkeypatch.setattr(promonet_tpu, 'ASSETS_DIR', tmp_path / 'assets')
    cache = synthetic.create(
        'aligned', speakers=1, utterances=2, seconds=1.0, preprocess=False)
    wavs = sorted(cache.glob('*/*.wav'))
    assert len(wavs) == 2
    for wav in wavs:
        stem = wav.parent / wav.stem
        labels = np.load(f'{stem}-phonemes.npy')
        f0 = np.load(f'{stem}-truepitch.npy')
        voiced = np.load(f'{stem}-voiced.npy')
        assert labels.shape == f0.shape == voiced.shape
        # Transcript holds the non-silence phone string
        text = (wav.parent / f'{wav.stem}.txt').read_text()
        for token in text.split():
            assert token in promonet_tpu.preprocess.ppg.PHONEMES
            assert token != synthetic.SILENCE
