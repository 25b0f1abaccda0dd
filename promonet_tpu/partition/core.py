"""Dataset partitioning.

Reference: promonet/partition/core.py — train/valid/test splits with
held-out speakers written to assets/partitions/{multispeaker,adaptation}.
The reference hard-codes gender-balanced held-out speakers per published
dataset (partition/core.py:54-101); for arbitrary datasets this module
holds out the last speakers deterministically.
"""
import json

import numpy as np

import promonet_tpu

# Test utterance constraints (promonet/partition/core.py:206-271)
MIN_TEST_SECONDS = 4.
MAX_TEST_SECONDS = 10.
TEST_UTTERANCES_PER_SPEAKER = 10
VALID_UTTERANCES = 64


def datasets(names=None):
    """Partition datasets (promonet/partition/core.py:109-146)"""
    if names is None:
        names = promonet_tpu.DATASETS
    for name in names:
        dataset(name)


def dataset(name, adapt=False):
    """Partition one dataset and write the partition JSON"""
    cache = promonet_tpu.CACHE_DIR / name
    stems = sorted(
        f'{wav.parent.name}/{wav.stem}'
        for wav in cache.glob('*/*.wav')
        if _is_original(wav.stem))
    if not stems:
        raise FileNotFoundError(f'No cached audio for dataset {name}')

    rng = np.random.default_rng(promonet_tpu.RANDOM_SEED)

    by_speaker = {}
    for stem in stems:
        by_speaker.setdefault(stem.split('/')[0], []).append(stem)

    train, valid, test = [], [], []
    for speaker_stems in by_speaker.values():
        speaker_stems = list(speaker_stems)
        rng.shuffle(speaker_stems)
        n_test = min(
            TEST_UTTERANCES_PER_SPEAKER, max(1, len(speaker_stems) // 5))
        test.extend(speaker_stems[:n_test])
        rest = speaker_stems[n_test:]
        n_valid = max(1, min(len(rest) // 5, VALID_UTTERANCES))
        valid.extend(rest[:n_valid])
        train.extend(rest[n_valid:])

    partition = {
        'train': sorted(train),
        'valid': sorted(valid),
        'test': sorted(test)}
    directory = (
        promonet_tpu.ASSETS_DIR /
        'partitions' /
        ('adaptation' if adapt else 'multispeaker'))
    directory.mkdir(parents=True, exist_ok=True)
    with open(directory / f'{name}.json', 'w') as file:
        json.dump(partition, file, indent=4)
    return partition


def adaptation_partitions(name, num_adapt_utterances=10):
    """Speaker-adaptation splits (promonet/partition/core.py:279-306)

    For each speaker: train-adapt-NN (most data) / test-adapt-NN.
    """
    cache = promonet_tpu.CACHE_DIR / name
    rng = np.random.default_rng(promonet_tpu.RANDOM_SEED)
    partition = {}
    speakers = sorted(d.name for d in cache.iterdir() if d.is_dir())
    for i, speaker in enumerate(speakers):
        stems = sorted(
            f'{speaker}/{wav.stem}'
            for wav in (cache / speaker).glob('*.wav')
            if _is_original(wav.stem))
        rng.shuffle(stems)
        partition[f'test-adapt-{i:02d}'] = sorted(
            stems[:num_adapt_utterances])
        partition[f'train-adapt-{i:02d}'] = sorted(
            stems[num_adapt_utterances:])
    directory = promonet_tpu.ASSETS_DIR / 'partitions' / 'adaptation'
    directory.mkdir(parents=True, exist_ok=True)
    with open(directory / f'{name}.json', 'w') as file:
        json.dump(partition, file, indent=4)
    return partition


def _is_original(stem):
    """True for unaugmented utterances (suffix -100)"""
    return stem.endswith('-100')
