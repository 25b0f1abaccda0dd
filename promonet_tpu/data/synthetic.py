"""Synthetic speech-like corpus for tests and smoke training.

No reference counterpart: the reference assumes DAPS/LibriTTS/VCTK are
downloadable (promonet/data/download/core.py); in a zero-egress
environment this module fabricates a tiny corpus — harmonic "voiced"
segments with pitch contours, noise "consonants", silences — runs the
real preprocessing stack over it, and writes the real cache layout +
partition files, so the entire train/eval pipeline is exercised
end-to-end.
"""
import json

import numpy as np

import promonet_tpu


def generate_utterance(rng, seconds=1.5, sample_rate=None):
    """A speech-like harmonic signal with moving pitch and envelope"""
    if sample_rate is None:
        sample_rate = promonet_tpu.SAMPLE_RATE
    num = int(seconds * sample_rate)
    t = np.arange(num) / sample_rate

    # Smooth pitch contour in [110, 330] Hz
    nodes = rng.uniform(110., 330., 8)
    pitch = np.interp(
        np.linspace(0, 1, num), np.linspace(0, 1, len(nodes)), nodes)
    phase = 2 * np.pi * np.cumsum(pitch) / sample_rate

    # Harmonic stack with decaying amplitudes
    signal = np.zeros(num)
    for k in range(1, 6):
        signal += (0.5 ** k) * np.sin(k * phase)

    # Amplitude envelope with pauses
    envelope = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(1., 3.) * t)
    gate = (np.sin(2 * np.pi * rng.uniform(0.5, 1.5) * t +
                   rng.uniform(0, np.pi)) > -0.7).astype(np.float64)
    signal = signal * envelope * gate

    # Breath noise
    signal += 0.01 * rng.standard_normal(num)

    signal = 0.5 * signal / np.abs(signal).max()
    return signal.astype(np.float32)[None]


def create(name='synthetic', speakers=2, utterances=6, seconds=1.5):
    """Create a synthetic dataset cache + partition + preprocessing"""
    rng = np.random.default_rng(promonet_tpu.RANDOM_SEED)
    cache = promonet_tpu.CACHE_DIR / name
    stems = {speaker: [] for speaker in range(speakers)}

    for speaker in range(speakers):
        speaker_dir = cache / f'{speaker:04d}'
        speaker_dir.mkdir(parents=True, exist_ok=True)
        for utterance in range(utterances):
            audio = generate_utterance(rng, seconds)
            stem = f'{utterance:06d}-100'
            promonet_tpu.utils.audio.save(
                speaker_dir / f'{stem}.wav',
                audio,
                promonet_tpu.SAMPLE_RATE)
            with open(speaker_dir / f'{stem}.txt', 'w') as file:
                file.write('synthetic utterance')
            stems[speaker].append(f'{speaker:04d}/{stem}')

    # Preprocess features (full-band loudness like the reference dataset
    # preprocessing, promonet/data/preprocess/core.py:33-46)
    wavs = sorted(cache.glob('*/*.wav'))
    promonet_tpu.preprocess.from_files_to_files(
        wavs,
        [w.parent / w.stem for w in wavs],
        features=('loudness', 'pitch', 'periodicity', 'spectrogram', 'ppg'),
        loudness_bands=None)

    # Partition: last utterance of each speaker for valid/test
    train, valid, test = [], [], []
    for speaker, speaker_stems in stems.items():
        train.extend(speaker_stems[:-2])
        valid.append(speaker_stems[-2])
        test.append(speaker_stems[-1])
    partition_file = (
        promonet_tpu.ASSETS_DIR / 'partitions' / 'multispeaker' /
        f'{name}.json')
    partition_file.parent.mkdir(parents=True, exist_ok=True)
    with open(partition_file, 'w') as file:
        json.dump({'train': train, 'valid': valid, 'test': test}, file)

    return cache
