"""Dataset partitioning.

Reference: promonet/partition/core.py — train/valid/test splits with
held-out speakers written to assets/partitions/{multispeaker,adaptation}.

For the published datasets (DAPS / LibriTTS / VCTK) the splits come, in
order of preference, from:

1. The reference's shipped partition files (data assets copied to
   assets/partitions/reference/), so metric numbers are comparable
   utterance-for-utterance with the reference system. Shipped stems omit
   the `-100` loudness suffix; it is appended on load.
2. Re-computation with the reference's semantics: the same
   gender-balanced held-out speakers (promonet/partition/core.py:54-101),
   the 4-10 s test-utterance length criteria, 10 test utterances per
   held-out speaker, 64 validation utterances, and (VCTK) exclusion of
   other-microphone recordings of test utterances via correspondence.json
   (promonet/partition/core.py:206-271).

Arbitrary datasets (speaker adaptation, the synthetic corpus) use a
deterministic generic split.
"""
import itertools
import json
from pathlib import Path

import numpy as np

import promonet_tpu

# Test utterance constraints (promonet/partition/core.py:41-45,206-271)
MIN_TEST_SECONDS = 4.
MAX_TEST_SECONDS = 10.
TEST_UTTERANCES_PER_SPEAKER = 10
VALID_UTTERANCES = 64

# Gender-balanced held-out speakers (promonet/partition/core.py:54-101).
# Data constants matching the reference so held-out sets are identical.
ADAPTATION_SPEAKERS = {
    'daps': [
        # Female
        '0002', '0007', '0010', '0013', '0019',
        # Male
        '0003', '0005', '0014', '0015', '0017'],
    # LibriTTS speakers are original corpus IDs; mapped through the
    # formatting speaker map (data/download/core.py)
    'libritts': [
        # Female
        '40', '669', '4362', '5022', '8123',
        # Male
        '196', '460', '1355', '3664', '7067'],
    'vctk': [
        # Female
        '0013', '0037', '0070', '0082', '0108',
        # Male
        '0016', '0032', '0047', '0073', '0083'],
}


def datasets(names=None):
    """Partition datasets (promonet/partition/core.py:109-146)"""
    if names is None:
        names = promonet_tpu.DATASETS
    for name in names:
        dataset(name)


def dataset(name, adapt=False):
    """Partition one dataset and write the partition JSON"""
    if name in ADAPTATION_SPEAKERS:
        partition = _published(name, adapt)
        if partition is None:
            partition = _dataset_specific(name, adapt)
    else:
        partition = _generic(name)

    partition = {key: sorted(value) for key, value in partition.items()}
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


###############################################################################
# Published-dataset partitions
###############################################################################


def _published(name, adapt):
    """Load the reference's shipped partition, if available

    Shipped stems omit the `-100` loudness suffix
    (e.g. '0013/000017'); this framework's cache stems carry it
    (promonet/data/download/core.py saves `<utterance>-100.wav`).
    """
    shipped = (
        Path(__file__).parent.parent / 'assets' / 'partitions' /
        'reference' /
        ('adaptation' if adapt else 'multispeaker') /
        f'{name}.json')
    if not shipped.exists():
        return None
    with open(shipped) as file:
        partition = json.load(file)
    return {
        key: [f'{stem}-100' for stem in stems]
        for key, stems in partition.items()}


def _dataset_specific(name, adapt):
    """Recompute the reference's split semantics from a formatted cache"""
    cache = promonet_tpu.CACHE_DIR / name
    stems = sorted(
        f'{wav.parent.name}/{wav.stem}'
        for wav in cache.glob('*/*.wav')
        if _is_original(wav.stem))
    if not stems:
        raise FileNotFoundError(f'No cached audio for dataset {name}')

    speakers = ADAPTATION_SPEAKERS[name]
    if name == 'libritts':
        # Map original corpus speaker IDs through the formatting map
        with open(cache / 'speakers.json') as file:
            speaker_map = json.load(file)
        speakers = [f'{speaker_map[s][0]:04d}' for s in speakers]

    rng = np.random.default_rng(promonet_tpu.RANDOM_SEED)

    # VCTK: recordings of one utterance by another microphone must not
    # leak across splits (promonet/partition/core.py:224-235)
    correspondence = None
    if name == 'vctk' and (cache / 'correspondence.json').exists():
        with open(cache / 'correspondence.json') as file:
            correspondence = {
                f'{stem}-100': source
                for stem, source in json.load(file).items()}

    def meets_length(stem):
        seconds = promonet_tpu.utils.audio.duration(cache / f'{stem}.wav')
        return MIN_TEST_SECONDS <= seconds <= MAX_TEST_SECONDS

    if adapt or name == 'daps':
        # Adaptation partitions over the held-out speakers
        # (promonet/partition/core.py:148-160,279-306)
        partition = {}
        for i, speaker in enumerate(speakers):
            speaker_stems = [
                stem for stem in stems if stem.split('/')[0] == speaker]
            rng.shuffle(speaker_stems)
            test = [
                stem for stem in speaker_stems if meets_length(stem)
            ][:TEST_UTTERANCES_PER_SPEAKER]
            train = [stem for stem in speaker_stems if stem not in test]
            partition[f'train-adapt-{i:02d}'] = train
            partition[f'test-adapt-{i:02d}'] = test
        if name == 'daps':
            return partition

        # Residual train/valid over the remaining speakers
        test_stems = set(
            itertools.chain.from_iterable(partition.values()))
        residual = _exclude(
            [stem for stem in stems if stem not in test_stems],
            test_stems,
            correspondence)
        rng.shuffle(residual)
        valid = [s for s in residual if meets_length(s)][:VALID_UTTERANCES]
        train = [stem for stem in residual if stem not in valid]
        return {'train': train, 'valid': valid, **partition}

    # Multispeaker: 10 test utterances per held-out speaker
    # (promonet/partition/core.py:245-271)
    test = []
    for speaker in speakers:
        speaker_stems = [
            stem for stem in stems if stem.split('/')[0] == speaker]
        rng.shuffle(speaker_stems)
        test += [
            stem for stem in speaker_stems if meets_length(stem)
        ][:TEST_UTTERANCES_PER_SPEAKER]
    residual = _exclude(
        [stem for stem in stems if stem not in set(test)],
        set(test),
        correspondence)
    rng.shuffle(residual)
    valid = [s for s in residual if meets_length(s)][:VALID_UTTERANCES]
    train = [stem for stem in residual if stem not in valid]
    return {'train': train, 'valid': valid, 'test': test}


def _exclude(residual, test_stems, correspondence):
    """Drop residual stems that are other-mic takes of test utterances"""
    if correspondence is None:
        return list(residual)
    test_sources = {
        correspondence[stem][:-1]
        for stem in test_stems if stem in correspondence}
    return [
        stem for stem in residual
        if correspondence.get(stem, ' ')[:-1] not in test_sources]


###############################################################################
# Generic datasets
###############################################################################


def _generic(name):
    """Deterministic split for arbitrary (adaptation/synthetic) datasets"""
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

    return {'train': train, 'valid': valid, 'test': test}


def _is_original(stem):
    """True for unaugmented utterances (suffix -100)"""
    return stem.endswith('-100')
