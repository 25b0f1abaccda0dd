"""Data augmentation: pitch (formant/spectral-balance) and loudness.

Reference: promonet/data/augment/{core,pitch,loudness}.py. Per-utterance
ratios are sampled log-uniform in [AUGMENTATION_RATIO_MIN, MAX], deduped
by nudging, and recorded to assets/augmentations/<dataset>-{kind}.json.
Pitch augmentation is the resampling trick (playback-rate change);
loudness augmentation is a dB shift with clipping-aware rescale.
"""
import json

import numpy as np

import promonet_tpu


def sample(count, rng):
    """Sample augmentation ratios (promonet/data/augment/core.py:83-93)

    Log-uniform in [AUGMENTATION_RATIO_MIN, MAX]. The only collision that
    matters is the two-decimal key 100, which would alias the un-augmented
    stem suffix '-100' — nudge those to 101 (ratio 1.01). Ratios may repeat
    across stems (each stem owns its augmented file), matching the
    reference, which only guards the ==100 case.
    """
    ratios = 2 ** rng.uniform(
        np.log2(promonet_tpu.AUGMENTATION_RATIO_MIN),
        np.log2(promonet_tpu.AUGMENTATION_RATIO_MAX),
        count)
    result = []
    for ratio in ratios:
        key = int(round(ratio * 100))
        if key == 100:
            key = 101
        result.append(key / 100.)
    return result


def pitch_shift(audio, ratio, sample_rate=None):
    """Pitch augmentation via the resampling trick

    Reference: promonet/data/augment/pitch.py:13-19 — resample by 1/ratio
    then play back at the original rate.
    """
    if sample_rate is None:
        sample_rate = promonet_tpu.SAMPLE_RATE
    return promonet_tpu.utils.audio.resample(
        audio, int(round(sample_rate * ratio)), sample_rate)


def loudness_shift(audio, ratio):
    """Loudness augmentation with clipping-aware rescale

    Reference: promonet/data/augment/loudness.py:13-30.
    """
    gain = promonet_tpu.convert.db_to_ratio(
        10 * np.log2(ratio))  # perceptual ratio -> dB -> linear
    shifted = np.asarray(audio) * gain
    peak = np.abs(shifted).max()
    if peak > 1.:
        shifted = shifted / peak * 0.999
    return shifted.astype(np.float32)


def from_files_to_files(audio_files, output_files, ratios, kind='pitch'):
    """Augment audio files and save"""
    for audio_file, output_file, ratio in zip(
        audio_files, output_files, ratios
    ):
        audio, sr = promonet_tpu.utils.audio.load(
            audio_file, promonet_tpu.SAMPLE_RATE)
        if kind == 'pitch':
            augmented = pitch_shift(audio, ratio)
        else:
            augmented = loudness_shift(audio, ratio)
        promonet_tpu.utils.audio.save(output_file, augmented, sr)


from ...utils.notify import notify


@notify('augment')
def datasets(datasets=None):
    """Augment cached datasets, writing ratio JSONs

    Reference: promonet/data/augment/core.py.
    """
    if datasets is None:
        datasets = promonet_tpu.DATASETS
    rng = np.random.default_rng(promonet_tpu.RANDOM_SEED)
    for name in datasets:
        cache = promonet_tpu.CACHE_DIR / name
        if not cache.exists():
            continue
        # Only augment originals (suffix -100); skip prior augmentations
        # ('-p<ratio>' / '-l<ratio>' suffixes)
        wavs = sorted(
            w for w in cache.glob('*/*.wav') if w.stem.endswith('-100'))
        for kind in ('pitch', 'loudness'):
            if kind == 'pitch' and not promonet_tpu.AUGMENT_PITCH:
                continue
            if kind == 'loudness' and not promonet_tpu.AUGMENT_LOUDNESS:
                continue
            ratios = sample(len(wavs), rng)
            mapping = {}
            prefix = kind[0]
            outputs = []
            for wav, ratio in zip(wavs, ratios):
                stem = f'{wav.parent.name}/{wav.stem}'
                mapping[stem] = int(round(ratio * 100))
                outputs.append(
                    wav.parent / f'{wav.stem}-{prefix}{mapping[stem]}.wav')
            from_files_to_files(wavs, outputs, ratios, kind)
            file = promonet_tpu.AUGMENT_DIR / f'{name}-{kind}.json'
            file.parent.mkdir(parents=True, exist_ok=True)
            with open(file, 'w') as f:
                json.dump(mapping, f, indent=4, sort_keys=True)
