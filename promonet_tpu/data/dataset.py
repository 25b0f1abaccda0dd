"""Dataset over the preprocessed feature cache.

Reference: promonet/data/dataset.py. Same on-disk layout
(data/cache/<dataset>/<speaker>/<utterance>-100[-aug]* plus per-feature
files), same behaviors: augmented-stem expansion, the 50 Hz-hum stem
filter, loudness-augmentation stems reusing the original loudness,
training-time random fixed-size chunks (static shapes for XLA), and
zero-shot speaker embeddings.
"""
import json

import numpy as np

import promonet_tpu
from . import native


def _windowed_load(file, window):
    """Read only the trailing-axis window of an .npy (memory-mapped)"""
    if str(file).endswith('.npy'):
        mapped = np.load(file, mmap_mode='r')
        return np.asarray(mapped[..., window], np.float32)
    return np.asarray(
        promonet_tpu.load.array(file), np.float32)[..., window]


def _frames_of(file):
    """Trailing-axis length of an .npy from its header (no data read)"""
    if not str(file).endswith('.npy'):
        return None
    with open(file, 'rb') as handle:
        version = np.lib.format.read_magic(handle)
        shape, _, _ = np.lib.format._read_array_header(handle, version)
    return shape[-1]


class Dataset:

    def __init__(self, name, partition):
        self.name = name
        self.partition = partition
        self.cache = promonet_tpu.CACHE_DIR / name
        self.viterbi = '-viterbi' if promonet_tpu.VITERBI_DECODE_PITCH else ''

        # Partition stems + augmented variants
        # (promonet/data/dataset.py:34-48). Partitions named
        # *-adapt-NN live in the adaptation partition file regardless of
        # the global ADAPTATION flag (evaluation adapts per speaker,
        # promonet/evaluate/core.py:158-180)
        adapt = True if '-adapt-' in partition else None
        stems = list(promonet_tpu.load.partition(name, adapt)[partition])
        self.stems = []
        for stem in stems:
            self.stems.append(stem)
            if partition.startswith('train'):
                self.stems.extend(self._augmented_stems(stem))

        # Drop stems dominated by mains hum
        # (promonet/data/dataset.py:51-57)
        self.stems = [
            stem for stem in self.stems if not self._is_hum(stem)]

        # Speaker map
        speakers = sorted({stem.split('/')[0] for stem in stems})
        self.speaker_index = {speaker: i for i, speaker in enumerate(speakers)}

    def _augmented_stems(self, stem):
        """Expand augmentation variants recorded in the ratio JSONs"""
        stems = []
        for kind, prefix in (('pitch', 'p'), ('loudness', 'l')):
            if kind == 'pitch' and not promonet_tpu.AUGMENT_PITCH:
                continue
            if kind == 'loudness' and not promonet_tpu.AUGMENT_LOUDNESS:
                continue
            file = (
                promonet_tpu.AUGMENT_DIR / f'{self.name}-{kind}.json')
            if not file.exists():
                continue
            with open(file) as f:
                ratios = json.load(f)
            # Ratio JSONs are keyed by the full original stem
            # (data/augment/core.py writes '<speaker>/<utt>-100')
            if stem in ratios:
                stems.append(f'{stem}-{prefix}{ratios[stem]}')
        return stems

    def _is_hum(self, stem):
        """True if mean log2 pitch is at or below 60 Hz (mains hum)"""
        try:
            pitch = promonet_tpu.load.array(
                self.cache / f'{stem}{self.viterbi}-pitch.npy')
        except FileNotFoundError:
            return False
        return float(2 ** np.log2(pitch[~np.isnan(pitch)]).mean()) <= 60.

    def __len__(self):
        return len(self.stems)

    def __getitem__(self, index):
        return self.load_item(index)

    def load_item(self, index, chunk_rng=None):
        """Load one example; with chunk_rng, crop to CHUNK_SIZE directly

        The chunked path reads only the needed audio window — through the
        native C++ decoder (data/native.py) when built — instead of
        decoding the whole file and cropping in Python.
        """
        stem = self.stems[index]
        load = promonet_tpu.load

        pitch = load.array(self.cache / f'{stem}{self.viterbi}-pitch.npy')
        periodicity = load.array(
            self.cache / f'{stem}{self.viterbi}-periodicity.npy')

        # Loudness-augmented stems reuse the ORIGINAL loudness to
        # disentangle loudness from other features
        # (promonet/data/dataset.py:84-88)
        loudness_stem = stem
        base, ratio_pitch, ratio_loudness = self._parse_ratios(stem)
        if ratio_loudness != 1.:
            loudness_stem = base

        # Chunked training path reads only the crop window of the wide
        # (1025, T) features via mmap — loading them whole and cropping
        # makes the host loader ~8x slower than the TPU train step
        hopsize = promonet_tpu.HOPSIZE
        chunk = promonet_tpu.CHUNK_SIZE
        frames = chunk // hopsize
        total_frames = pitch.shape[-1]
        windowed = chunk_rng is not None and total_frames >= frames
        if windowed:
            start_frame = int(
                chunk_rng.integers(0, total_frames - frames + 1))
            window = slice(start_frame, start_frame + frames)
        else:
            window = slice(None)

        spectrogram = _windowed_load(
            self.cache / f'{stem}-spectrogram.npy', window)
        ppg_file = self.cache / f'{stem}-ppg.npy'
        if _frames_of(ppg_file) == total_frames:
            ppg = _windowed_load(ppg_file, window)
        else:
            ppg = np.asarray(load.ppg(ppg_file, total_frames))[..., window]
        loudness = _windowed_load(
            self.cache / f'{loudness_stem}-loudness.npy', window)
        if windowed:
            pitch = pitch[..., window]
            periodicity = periodicity[..., window]

        text_file = self.cache / f'{base.split("-")[0]}.txt'
        if not text_file.exists():
            text_file = self.cache / f'{base}.txt'
        text = load.text(text_file) if text_file.exists() else ''

        # Speaker conditioning
        speaker_dir = stem.split('/')[0]
        if promonet_tpu.ZERO_SHOT:
            speaker_stem = stem
            # Maybe shuffle: condition on a random other utterance of
            # the SAME speaker so the embedding cannot leak content
            # (promonet/data/dataset.py:119-128, ZERO_SHOT_SHUFFLE)
            if (
                promonet_tpu.ZERO_SHOT_SHUFFLE and
                chunk_rng is not None
            ):
                candidates = [
                    s for s in self.stems
                    if s.split('/')[0] == speaker_dir and s != stem]
                if candidates:
                    speaker_stem = candidates[
                        int(chunk_rng.integers(0, len(candidates)))]
            speaker = load.array(
                self.cache / f'{speaker_stem}-speaker.npy')
        else:
            speaker = np.asarray(
                self.speaker_index.get(speaker_dir, 0), np.int32)

        item = {
            'text': text,
            'loudness': np.asarray(loudness, np.float32),
            'pitch': np.asarray(pitch, np.float32).reshape(-1),
            'periodicity': np.asarray(periodicity, np.float32).reshape(-1),
            'ppg': np.asarray(ppg, np.float32),
            'speakers': speaker,
            'spectral_balance_ratios': np.asarray(ratio_pitch, np.float32),
            'loudness_ratios': np.asarray(ratio_loudness, np.float32),
            'spectrograms': np.asarray(spectrogram, np.float32),
            'stems': stem,
        }

        wav = self.cache / f'{stem}.wav'
        if chunk_rng is None:
            item['audio'] = np.asarray(load.audio(wav), np.float32)
            return item

        if not windowed:
            # Short clip: decode fully and reflect-pad
            item['audio'] = np.asarray(load.audio(wav), np.float32)
            return random_chunk(item, chunk_rng)

        # Features were window-read above; read the matching audio window
        # (reference crops after full decode,
        # promonet/data/dataset.py:91-117)
        start = start_frame * hopsize
        if native.available():
            item['audio'] = native.wav_chunk(wav, start, chunk)[None]
        else:
            item['audio'] = np.asarray(
                load.audio(wav), np.float32)[..., start:start + chunk]
        return item

    @staticmethod
    def _parse_ratios(stem):
        """Parse augmentation ratios from the stem suffix

        Reference: promonet/data/dataset.py:141-152. Suffixes: -p<int>
        (pitch ratio ×100) and -l<int> (loudness ratio ×100).
        """
        parts = stem.split('-')
        base = parts[0] if '/' not in parts[-1] else stem
        base_parts = [parts[0]]
        pitch_ratio, loudness_ratio = 1., 1.
        for part in parts[1:]:
            if part.startswith('p') and part[1:].isdigit():
                pitch_ratio = int(part[1:]) / 100.
            elif part.startswith('l') and part[1:].isdigit():
                loudness_ratio = int(part[1:]) / 100.
            else:
                base_parts.append(part)
        return '-'.join(base_parts), pitch_ratio, loudness_ratio


def random_chunk(item, rng):
    """Crop a training example to CHUNK_SIZE samples / matching frames

    Reference: promonet/data/dataset.py:91-117 (short clips are
    reflect-padded). Fixed chunks give XLA static shapes.
    """
    hopsize = promonet_tpu.HOPSIZE
    chunk = promonet_tpu.CHUNK_SIZE
    frames = chunk // hopsize

    audio = item['audio']
    total_frames = audio.shape[-1] // hopsize

    if total_frames < frames:
        pad_frames = frames - total_frames
        pad_samples = chunk - total_frames * hopsize

        def pad_feature(x, amount):
            width = [(0, 0)] * (x.ndim - 1) + [(0, amount)]
            return np.pad(x, width, mode='reflect')

        start = 0
        item = dict(item)
        item['audio'] = pad_feature(
            audio[..., :total_frames * hopsize], pad_samples)
        for key in ('loudness', 'ppg', 'spectrograms'):
            item[key] = pad_feature(item[key][..., :total_frames], pad_frames)
        for key in ('pitch', 'periodicity'):
            item[key] = pad_feature(item[key][:total_frames], pad_frames)
        return item

    start_frame = int(rng.integers(0, total_frames - frames + 1))
    start = start_frame * hopsize
    out = dict(item)
    out['audio'] = audio[..., start:start + chunk]
    for key in ('loudness', 'ppg', 'spectrograms'):
        out[key] = out[key][..., start_frame:start_frame + frames]
    for key in ('pitch', 'periodicity'):
        out[key] = out[key][start_frame:start_frame + frames]
    return out
