"""Dataset formatting + partition parity (reference cache contract).

Reference: promonet/data/download/core.py:55-294 and
promonet/partition/core.py:54-101,206-271 — exercised on tiny mocked
dataset trees (no network egress).
"""
import json

import numpy as np
import pytest

import promonet_tpu


@pytest.fixture
def dirs(tmp_path, monkeypatch):
    monkeypatch.setattr(promonet_tpu, 'DATA_DIR', tmp_path / 'data')
    monkeypatch.setattr(promonet_tpu, 'CACHE_DIR', tmp_path / 'cache')
    monkeypatch.setattr(promonet_tpu, 'ASSETS_DIR', tmp_path / 'assets')
    return tmp_path


def _write_wav(path, seconds=0.3, sample_rate=16000, amplitude=0.5):
    path.parent.mkdir(parents=True, exist_ok=True)
    t = np.arange(int(seconds * sample_rate)) / sample_rate
    audio = (amplitude * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    promonet_tpu.utils.audio.save(path, audio[None], sample_rate)


def test_format_libritts(dirs):
    """LibriTTS formatting: speaker map, normalized transcripts, -100 wavs"""
    source = dirs / 'data' / 'libritts' / 'train-clean-100'
    for name, text in (
        ('40_111_000001_000000', 'hello there'),
        ('40_111_000002_000000', 'general kenobi'),
        ('669_222_000001_000000', 'another speaker'),
    ):
        _write_wav(source / name.split('_')[0] / f'{name}.wav')
        (source / name.split('_')[0] / f'{name}.normalized.txt').write_text(
            text)

    promonet_tpu.data.download.datasets(['libritts'])

    cache = promonet_tpu.CACHE_DIR / 'libritts'
    # Speaker indices by order of first appearance
    with open(cache / 'speakers.json') as file:
        speakers = json.load(file)
    assert speakers['40'] == [0, 2]
    assert speakers['669'] == [1, 1]
    # Both rates saved; transcripts copied
    assert (cache / '0000' / '000000.wav').exists()
    assert (cache / '0000' / '000000-100.wav').exists()
    assert (cache / '0000' / '000001-100.wav').exists()
    assert (cache / '0001' / '000000.txt').read_text() == 'another speaker'
    # The -100 cache is at the system rate
    _, sample_rate = promonet_tpu.utils.audio.load(
        cache / '0000' / '000000-100.wav')
    assert sample_rate == promonet_tpu.SAMPLE_RATE


def test_format_vctk(dirs):
    """VCTK formatting: mic-suffix transcripts, drops, correspondence"""
    source = dirs / 'data' / 'vctk'
    # Two mics of the same utterance + one with no transcript
    for stem in ('p225_001_mic1', 'p225_001_mic2', 'p225_002_mic1'):
        _write_wav(source / 'wav48_silence_trimmed' / 'p225' / f'{stem}.wav')
    txt = source / 'txt' / 'p225'
    txt.mkdir(parents=True)
    (txt / 'p225_001.txt').write_text('same utterance')

    promonet_tpu.data.download.datasets(['vctk'])

    cache = promonet_tpu.CACHE_DIR / 'vctk'
    # p225_002 dropped (no transcript); both mics of 001 kept
    wavs = sorted(cache.glob('*/*-100.wav'))
    assert len(wavs) == 2
    with open(cache / 'correspondence.json') as file:
        correspondence = json.load(file)
    assert correspondence['0000/000000-100'] == 'p225_001_mic1'
    assert correspondence['0000/000001-100'] == 'p225_001_mic2'


def test_format_daps(dirs):
    """DAPS formatting: speaker from filename prefix, quiet gain-up"""
    source = dirs / 'data' / 'daps'
    _write_wav(source / 'f1_script1_clean.wav', amplitude=0.1)
    _write_wav(source / 'm3_script1_clean.wav', amplitude=0.5)
    (source / 'f1_script1_clean.txt').write_text('quiet speech')
    (source / 'm3_script1_clean.txt').write_text('loud speech')

    promonet_tpu.data.download.datasets(['daps'])

    cache = promonet_tpu.CACHE_DIR / 'daps'
    quiet, _ = promonet_tpu.utils.audio.load(cache / '0000' / '000000.wav')
    loud, _ = promonet_tpu.utils.audio.load(cache / '0001' / '000000.wav')
    # Quiet audio gained up to the 0.35 peak target; loud audio untouched
    assert np.abs(quiet).max() == pytest.approx(0.35, abs=0.01)
    assert np.abs(loud).max() == pytest.approx(0.5, abs=0.01)


def test_published_partitions(dirs):
    """The reference's shipped partition files load with -100 stems"""
    partition = promonet_tpu.partition.dataset('vctk')
    assert set(partition) == {'train', 'valid', 'test'}
    assert len(partition['test']) == 100
    assert len(partition['valid']) == 64
    assert all(stem.endswith('-100') for stem in partition['test'])
    # Held-out test speakers are the reference's gender-balanced set
    speakers = {stem.split('/')[0] for stem in partition['test']}
    assert speakers == set(
        promonet_tpu.partition.core.ADAPTATION_SPEAKERS['vctk'])
    # Written to the active partition directory
    out = (
        promonet_tpu.ASSETS_DIR / 'partitions' / 'multispeaker' /
        'vctk.json')
    assert out.exists()


def test_dataset_specific_partition(dirs):
    """Without shipped files, splits recompute with reference semantics"""
    cache = promonet_tpu.CACHE_DIR / 'daps'
    # Two held-out speakers with long-enough test utterances
    for speaker in ('0002', '0003'):
        for i in range(4):
            _write_wav(
                cache / speaker / f'{i:06d}-100.wav',
                seconds=5.,
                sample_rate=promonet_tpu.SAMPLE_RATE)
    partition = promonet_tpu.partition.core._dataset_specific(
        'daps', adapt=True)
    # DAPS is adaptation-only (promonet/partition/core.py:148-160)
    assert any(key.startswith('train-adapt-') for key in partition)
    assert any(key.startswith('test-adapt-') for key in partition)
    stems = [s for key in partition for s in partition[key]]
    assert all(
        stem.split('/')[0] in ('0002', '0003') for stem in stems)
