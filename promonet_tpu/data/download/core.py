"""Dataset download and formatting.

Reference: promonet/data/download/core.py (DAPS, LibriTTS, VCTK). In a
zero-egress environment, archives must already exist under DATA_DIR;
this module formats them into the reference cache layout
(data/cache/<dataset>/<speaker-index>/<utterance>-100.wav + .txt,
download/core.py:1-21):

- per-speaker directories numbered by order of first appearance
- each utterance saved twice: `<count>.wav` at the original rate and
  `<count>-100.wav` at the system rate (download/core.py:106-124)
- quiet audio gained up to a 0.35 peak (download/core.py:103-105)
- LibriTTS: `.normalized.txt` transcripts + a `speakers.json` map from
  corpus speaker IDs to cache indices (download/core.py:127-210)
- VCTK: transcripts resolved from the `txt/` tree (audio stems carry a
  `_micN` suffix the text stems lack); utterances without transcripts
  dropped; a `correspondence.json` mapping cache stems to source stems
  so other-microphone takes can be excluded from opposite partitions
  (download/core.py:213-294)
"""
import json
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
        if name == 'daps':
            daps(source)
        elif name == 'libritts':
            libritts(source)
        elif name == 'vctk':
            vctk(source)
        else:
            format_generic(name, source)


###############################################################################
# Published datasets
###############################################################################


def daps(source=None):
    """Format the DAPS tree (promonet/data/download/core.py:55-124)

    Speaker is the first underscore-separated token of the filename
    (e.g. 'f1_script1_clean.wav' → speaker 'f1').
    """
    source = Path(source or promonet_tpu.DATA_DIR / 'daps')
    audio_files = sorted(path.resolve() for path in source.rglob('*.wav'))
    pairs = [
        (audio, audio.with_suffix('.txt'))
        for audio in audio_files]
    _format_files('daps', pairs, lambda stem: stem.split('_')[0])


def libritts(source=None):
    """Format a LibriTTS tree (promonet/data/download/core.py:127-210)

    Filenames are '<speaker>_<chapter>_<utt>_<seg>.wav' with transcripts
    in '.normalized.txt'; the speaker map is saved to speakers.json.
    """
    source = Path(source or promonet_tpu.DATA_DIR / 'libritts')
    audio_files = sorted(source.rglob('*.wav'))
    pairs = [
        (audio, audio.with_suffix('.normalized.txt'))
        for audio in audio_files]
    speaker_count = _format_files(
        'libritts', pairs, lambda stem: stem.split('_')[0])

    # Speaker map: corpus ID → (cache index, utterance count)
    with open(
        promonet_tpu.CACHE_DIR / 'libritts' / 'speakers.json', 'w'
    ) as file:
        json.dump(speaker_count, file, indent=4, sort_keys=True)


def vctk(source=None):
    """Format a VCTK tree (promonet/data/download/core.py:213-294)

    Audio stems carry a '_micN' suffix; transcripts live under
    txt/<speaker>/<stem-without-mic>.txt. Utterances without transcripts
    are dropped. correspondence.json records the source stem of every
    cache stem so partitioning can exclude other-mic takes
    (promonet/partition/core.py:224-235).
    """
    source = Path(source or promonet_tpu.DATA_DIR / 'vctk')
    audio_root = source / 'wav48_silence_trimmed'
    if not audio_root.exists():
        audio_root = source

    def text_of(audio_file):
        return (
            source / 'txt' / audio_file.parent.name /
            f'{audio_file.stem[:-5]}.txt')

    audio_files = sorted(
        list(audio_root.rglob('*.flac')) + list(audio_root.rglob('*.wav')))
    pairs = [
        (audio, text_of(audio))
        for audio in audio_files
        if text_of(audio).exists()]
    _format_files(
        'vctk',
        pairs,
        lambda stem: stem.split('_')[0],
        correspondence=True)


def _format_files(name, pairs, speaker_of, correspondence=False):
    """Write (audio, text) pairs into the cache layout

    Returns the {speaker: [index, count]} map. Speaker indices follow
    order of first appearance (promonet/data/download/core.py:74-80).
    """
    cache = promonet_tpu.CACHE_DIR / name
    cache.mkdir(parents=True, exist_ok=True)
    speaker_count = {}
    stem_map = {}
    for audio_file, text_file in pairs:
        speaker = speaker_of(audio_file.stem)
        if speaker not in speaker_count:
            speaker_count[speaker] = [len(speaker_count), 0]
        speaker_count[speaker][1] += 1
        index, count = speaker_count[speaker]
        count -= 1  # zero-based utterance numbering

        audio, sample_rate = _load_any(audio_file)
        audio = normalize_gain(audio)

        speaker_dir = cache / f'{index:04d}'
        speaker_dir.mkdir(parents=True, exist_ok=True)

        # Original rate + system rate (promonet/data/download/core.py:106-124)
        promonet_tpu.utils.audio.save(
            speaker_dir / f'{count:06d}.wav', audio, sample_rate)
        resampled = promonet_tpu.utils.audio.resample(
            audio, sample_rate, promonet_tpu.SAMPLE_RATE)
        promonet_tpu.utils.audio.save(
            speaker_dir / f'{count:06d}-100.wav',
            resampled,
            promonet_tpu.SAMPLE_RATE)
        if text_file.exists():
            (speaker_dir / f'{count:06d}.txt').write_text(
                text_file.read_text(encoding='utf-8'), encoding='utf-8')
        stem_map[f'{index:04d}/{count:06d}-100'] = audio_file.stem

    if correspondence:
        with open(cache / 'correspondence.json', 'w') as file:
            json.dump(stem_map, file)
    return speaker_count


def _load_any(file):
    """Load an audio file; FLAC requires a local decoder"""
    if file.suffix.lower() == '.flac':
        raise RuntimeError(
            f'{file}: FLAC decoding requires a local decoder (none is '
            'available in this environment); convert the tree to wav '
            'first, e.g. with ffmpeg or soundfile where available')
    return promonet_tpu.utils.audio.load(file)


###############################################################################
# Generic datasets
###############################################################################


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
