"""Dataset download and formatting.

Reference: promonet/data/download/core.py (DAPS, LibriTTS, VCTK). In a
zero-egress environment, archives must already exist under DATA_DIR;
this module formats them into the reference cache layout
(data/cache/<dataset>/<speaker-index>/<utterance>-100.wav + .txt,
download/core.py:1-21), including quiet-audio gain normalization.
"""
from pathlib import Path

import numpy as np

import promonet_tpu

# Gain-up target for quiet audio (promonet/data/download/core.py:103-105)
PEAK_TARGET = 0.35


from ...utils.notify import notify


@notify('download')
def datasets(datasets=None):
    """Format datasets found on disk into the cache layout"""
    if datasets is None:
        datasets = promonet_tpu.DATASETS
    for name in datasets:
        source = promonet_tpu.DATA_DIR / name
        if not source.exists():
            raise FileNotFoundError(
                f'Dataset {name} not found at {source}. This environment '
                'has no network egress; place the extracted dataset there '
                'or use promonet_tpu.data.synthetic.create() for testing.')
        format_generic(name, source)


def format_generic(name, source):
    """Format a generic <speaker>/<utterance>.wav[+.txt] tree"""
    cache = promonet_tpu.CACHE_DIR / name
    speakers = sorted(d for d in Path(source).iterdir() if d.is_dir())
    for index, speaker_dir in enumerate(speakers):
        out_dir = cache / f'{index:04d}'
        out_dir.mkdir(parents=True, exist_ok=True)
        wavs = sorted(speaker_dir.glob('**/*.wav'))
        for utterance, wav in enumerate(wavs):
            audio, _ = promonet_tpu.utils.audio.load(
                wav, promonet_tpu.SAMPLE_RATE)
            audio = normalize_gain(audio)
            stem = f'{utterance:06d}-100'
            promonet_tpu.utils.audio.save(
                out_dir / f'{stem}.wav', audio, promonet_tpu.SAMPLE_RATE)
            text = wav.with_suffix('.txt')
            if text.exists():
                (out_dir / f'{stem}.txt').write_text(
                    text.read_text(encoding='utf-8'), encoding='utf-8')


def normalize_gain(audio, target=PEAK_TARGET):
    """Gain-up quiet audio to the target peak"""
    peak = np.abs(audio).max()
    if 0 < peak < target:
        return (audio * (target / peak)).astype(np.float32)
    return audio
