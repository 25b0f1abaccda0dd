"""Training the feature extractors from corpus ground truth.

The reference uses pretrained penn/ppgs checkpoints; here the extractors
train zero-egress on the formant-synthesis corpus's exact alignments
(VERDICT round-1 items #3/#4). These tests run tiny versions of those
trainings and assert the weights are real (far above chance, JSD
separation between matched and mismatched utterances).
"""
import numpy as np
import pytest

import promonet_tpu
from promonet_tpu.data import synthetic


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('extractors')
    old = promonet_tpu.CACHE_DIR, promonet_tpu.ASSETS_DIR
    promonet_tpu.CACHE_DIR = tmp / 'cache'
    promonet_tpu.ASSETS_DIR = tmp / 'assets'
    # Enough utterances that the 5% held-out window split is more than
    # one window — a single-window validation set made the training
    # assertion a coin flip
    synthetic.create(
        'synthetic', speakers=2, utterances=10, seconds=1.5,
        preprocess=False)
    yield tmp
    promonet_tpu.CACHE_DIR, promonet_tpu.ASSETS_DIR = old
    # Drop any cached models trained against the temp checkpoints
    if hasattr(promonet_tpu.preprocess.ppg._model, 'cache'):
        del promonet_tpu.preprocess.ppg._model.cache
    if hasattr(promonet_tpu.preprocess.pitch.PitchCNN, '_instance'):
        del promonet_tpu.preprocess.pitch.PitchCNN._instance


@pytest.mark.slow
def test_ppg_training(corpus):
    """A short training run learns real phoneme posteriors"""
    accuracy = promonet_tpu.preprocess.ppg.train(
        'synthetic', steps=700, batch_size=16, window=96)
    # 40-way classification: chance is 0.025. The tiny test corpus
    # (8 utterances) and short budget bound what the run reaches; the
    # full corpus training measures 0.93 (PITCH_REPORT.md / assets
    # checkpoint). The budget is sized for the single-core test host
    # (round-4 ask: `pytest tests/` must finish inside a round).
    assert accuracy > 0.3

    # from_audio now uses the trained checkpoint
    assert not hasattr(promonet_tpu.preprocess.ppg._model, 'cache')
    cache = promonet_tpu.CACHE_DIR / 'synthetic'
    wavs = sorted(cache.glob('*/*.wav'))

    # PPGs now track the spoken phonemes: JSD between an utterance's
    # PPG and its own alignment one-hots must be well below the JSD
    # against a different utterance's alignment (VERDICT #3 done-bar)
    from promonet_tpu.ops.sparse import jensen_shannon

    def ppg_and_onehot(wav):
        ppg = np.asarray(promonet_tpu.preprocess.ppg.from_audio(
            promonet_tpu.load.audio(wav)))
        labels = np.load(wav.parent / f'{wav.stem}-phonemes.npy')
        frames = min(ppg.shape[-1], len(labels))
        onehot = np.eye(
            promonet_tpu.PPG_CHANNELS, dtype=np.float32)[labels[:frames]].T
        return ppg[:, :frames], onehot

    ppg_a, onehot_a = ppg_and_onehot(wavs[0])
    _, onehot_b = ppg_and_onehot(wavs[-1])
    frames = min(ppg_a.shape[-1], onehot_b.shape[-1])
    matched = float(np.mean(jensen_shannon(
        ppg_a[:, :frames], onehot_a[:, :frames])))
    mismatched = float(np.mean(jensen_shannon(
        ppg_a[:, :frames], onehot_b[:, :frames])))
    assert matched < 0.8 * mismatched


@pytest.mark.slow
def test_pitch_cnn_training(corpus, monkeypatch):
    """A short CNN training run learns real pitch posteriors"""
    median_cents, voicing_accuracy = promonet_tpu.preprocess.pitch.train(
        'synthetic', steps=250, batch_size=32, max_frames=3000,
        tone_fraction=0.)
    # 256-bin classification over ~4150 cents: chance error is ~1000c
    assert median_cents < 150.
    assert voicing_accuracy > 0.7

    # The domain-randomized tone mix trains end-to-end at tiny budgets
    # (quality at the real budget is gated by scripts/pitch_domain_check)
    tone_cents, _ = promonet_tpu.preprocess.pitch.train(
        'synthetic', steps=100, batch_size=32, max_frames=2000,
        tone_fraction=0.4)
    assert np.isfinite(tone_cents)

    # The 'cnn' estimator path runs end-to-end with the new checkpoint
    monkeypatch.setattr(promonet_tpu, 'PITCH_ESTIMATOR', 'cnn')
    if hasattr(promonet_tpu.preprocess.pitch.PitchCNN, '_instance'):
        del promonet_tpu.preprocess.pitch.PitchCNN._instance
    rng = np.random.default_rng(3)
    audio = synthetic.generate_utterance(rng, 1.0)
    pitch, periodicity = promonet_tpu.preprocess.pitch.from_audio(audio)
    assert np.isfinite(np.asarray(pitch)).all()
    assert (np.asarray(periodicity) >= 0).all()
    assert (np.asarray(periodicity) <= 1).all()
