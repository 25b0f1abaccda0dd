"""Objective evaluation metrics.

Reference: promonet/evaluate/metrics.py. Every metric is a streaming
accumulator with update()/__call__()/reset() semantics matching the
torchutil.metrics base classes the reference builds on.
"""
import jax.numpy as jnp
import numpy as np

import promonet_tpu
from ..ops import sparse


class Metrics:
    """Bundle of prosody + pronunciation metrics

    Reference: promonet/evaluate/metrics.py:17-81.
    """

    def __init__(self, include_wer=True):
        self.loudness = Loudness()
        self.periodicity = RMSE()
        self.pitch = Pitch()
        self.ppg = PPG()
        self.wer = WER() if include_wer else None

    def __call__(self):
        result = {
            'loudness': self.loudness(),
            'periodicity': self.periodicity(),
            'pitch': self.pitch(),
            'ppg': self.ppg()}
        if self.wer is not None and self.wer.count:
            result['wer'] = self.wer()
        return result

    def update(
        self,
        loudness,
        predicted_loudness,
        pitch,
        periodicity,
        predicted_pitch,
        predicted_periodicity,
        ppg,
        predicted_ppg,
        text=None,
        predicted_text=None
    ):
        self.loudness.update(loudness, predicted_loudness)
        self.periodicity.update(periodicity, predicted_periodicity)
        self.pitch.update(
            pitch, periodicity, predicted_pitch, predicted_periodicity)
        self.ppg.update(ppg, predicted_ppg)
        if self.wer is not None and text and predicted_text:
            self.wer.update(text, predicted_text)

    def reset(self):
        self.loudness.reset()
        self.periodicity.reset()
        self.pitch.reset()
        self.ppg.reset()
        if self.wer is not None:
            self.wer.reset()


class Loudness:
    """Loudness RMSE in dBA with loud/quiet split at -60 dB

    Reference: promonet/evaluate/metrics.py:170-206.
    """

    THRESHOLD = -60.

    def __init__(self):
        self.reset()

    def __call__(self):
        result = {'loudness': float(np.sqrt(self.total / max(self.count, 1)))}
        if self.loud_count:
            result['loudness-loud'] = float(
                np.sqrt(self.loud_total / self.loud_count))
        if self.quiet_count:
            result['loudness-quiet'] = float(
                np.sqrt(self.quiet_total / self.quiet_count))
        return result

    def update(self, target, predicted):
        target = np.asarray(target, np.float64).reshape(-1)
        predicted = np.asarray(predicted, np.float64).reshape(-1)
        length = min(len(target), len(predicted))
        target, predicted = target[:length], predicted[:length]
        sq = (target - predicted) ** 2
        self.total += sq.sum()
        self.count += length
        loud = target > self.THRESHOLD
        self.loud_total += sq[loud].sum()
        self.loud_count += int(loud.sum())
        self.quiet_total += sq[~loud].sum()
        self.quiet_count += int((~loud).sum())

    def reset(self):
        self.total = self.count = 0
        self.loud_total = self.loud_count = 0
        self.quiet_total = self.quiet_count = 0


class RMSE:
    """Streaming root-mean-square error"""

    def __init__(self):
        self.reset()

    def __call__(self):
        return float(np.sqrt(self.total / max(self.count, 1)))

    def update(self, target, predicted):
        target = np.asarray(target, np.float64).reshape(-1)
        predicted = np.asarray(predicted, np.float64).reshape(-1)
        length = min(len(target), len(predicted))
        self.total += ((target[:length] - predicted[:length]) ** 2).sum()
        self.count += length

    def reset(self):
        self.total = 0.
        self.count = 0


class Pitch:
    """L1 pitch error in cents on co-voiced frames

    Reference: promonet/evaluate/metrics.py:209-255 — frames are included
    only where BOTH target and prediction are voiced (periodicity above
    the voicing threshold).
    """

    def __init__(self):
        self.reset()

    def __call__(self):
        return float(self.total / max(self.count, 1))

    def update(
        self,
        target_pitch,
        target_periodicity,
        predicted_pitch,
        predicted_periodicity
    ):
        target_pitch = np.asarray(target_pitch, np.float64).reshape(-1)
        predicted_pitch = np.asarray(predicted_pitch, np.float64).reshape(-1)
        target_periodicity = np.asarray(target_periodicity).reshape(-1)
        predicted_periodicity = np.asarray(predicted_periodicity).reshape(-1)
        length = min(len(target_pitch), len(predicted_pitch))
        voicing = (
            (target_periodicity[:length] > promonet_tpu.VOICING_THRESHOLD) &
            (predicted_periodicity[:length] > promonet_tpu.VOICING_THRESHOLD))
        if not voicing.any():
            return
        cents = 1200 * np.abs(
            np.log2(predicted_pitch[:length][voicing]) -
            np.log2(target_pitch[:length][voicing]))
        self.total += cents.sum()
        self.count += int(voicing.sum())

    def reset(self):
        self.total = 0.
        self.count = 0


class PPG:
    """Sparsified-PPG Jensen-Shannon pronunciation distance

    Reference: promonet/evaluate/metrics.py:263-303.
    """

    def __init__(self):
        self.reset()

    def __call__(self):
        return float(self.total / max(self.count, 1))

    def update(self, target, predicted):
        target = jnp.asarray(target)
        predicted = jnp.asarray(predicted)
        length = min(target.shape[-1], predicted.shape[-1])
        target = sparse.sparsify(
            target[..., :length],
            promonet_tpu.SPARSE_PPG_METHOD,
            promonet_tpu.SPARSE_PPG_THRESHOLD)
        predicted = sparse.sparsify(
            predicted[..., :length],
            promonet_tpu.SPARSE_PPG_METHOD,
            promonet_tpu.SPARSE_PPG_THRESHOLD)
        distance = sparse.jensen_shannon(target, predicted)
        self.total += float(jnp.sum(distance))
        self.count += int(distance.size)

    def reset(self):
        self.total = 0.
        self.count = 0


class WER:
    """Word error rate via Levenshtein distance (replaces jiwer)

    Reference: promonet/evaluate/metrics.py:306-310.
    """

    def __init__(self):
        self.reset()

    def __call__(self):
        return float(self.total / max(self.count, 1))

    def update(self, target_text, predicted_text):
        normalize = promonet_tpu.preprocess.text.normalize
        target = normalize(target_text).split()
        predicted = normalize(predicted_text).split()
        if not target:
            return
        self.total += _levenshtein(target, predicted) / len(target)
        self.count += 1

    def reset(self):
        self.total = 0.
        self.count = 0


class SpectralBalance:
    """Spectral-centroid correlation metric

    Reference: promonet/evaluate/metrics.py:89-148 (defined there, not in
    the default bundle).
    """

    def __init__(self):
        self.reset()

    def __call__(self):
        if self.count < 2:
            return 0.
        stacked = np.asarray(self.pairs)
        return float(np.corrcoef(stacked[:, 0], stacked[:, 1])[0, 1])

    def update(self, target_audio, predicted_audio):
        self.pairs.append(
            (_centroid(target_audio), _centroid(predicted_audio)))
        self.count += 1

    def reset(self):
        self.pairs = []
        self.count = 0


def _centroid(audio):
    mag = np.abs(np.asarray(
        promonet_tpu.preprocess.spectrogram.from_audio(np.asarray(audio))))
    freqs = np.linspace(
        0,
        promonet_tpu.SAMPLE_RATE / 2,
        mag.shape[-2])
    return float(
        (freqs[:, None] * mag).sum() / np.clip(mag.sum(), 1e-9, None))


def _levenshtein(a, b):
    """Edit distance over token sequences"""
    m, n = len(a), len(b)
    previous = list(range(n + 1))
    for i in range(1, m + 1):
        current = [i] + [0] * n
        for j in range(1, n + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            current[j] = min(
                previous[j] + 1,
                current[j - 1] + 1,
                previous[j - 1] + cost)
        previous = current
    return previous[n]
