"""Dataset-level preprocessing.

Reference: promonet/data/preprocess/core.py — run feature extraction over
all cached wavs with FULL-BAND loudness (loudness_bands=None) plus
spectrograms.
"""
import promonet_tpu


from ...utils.notify import notify


@notify('preprocess')
def datasets(datasets=None, features=None, gpu=None):
    if datasets is None:
        datasets = promonet_tpu.DATASETS
    if features is None:
        features = (
            'loudness', 'pitch', 'periodicity', 'spectrogram', 'ppg')
    for name in datasets:
        cache = promonet_tpu.CACHE_DIR / name
        wavs = sorted(cache.glob('*/*.wav'))
        promonet_tpu.preprocess.from_files_to_files(
            wavs,
            [w.parent / w.stem for w in wavs],
            features=features,
            loudness_bands=None)
