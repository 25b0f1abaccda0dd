"""Feature-extraction orchestrator.

Reference: promonet/preprocess/core.py. On TPU the per-feature extractors
are jitted JAX functions, so `from_audio` runs as a handful of fused
device programs instead of the reference's CPU librosa + separate GPU
model calls.
"""
from pathlib import Path

import numpy as np

import promonet_tpu


def from_audio(
    audio,
    sample_rate=None,
    gpu=None,
    features=('loudness', 'pitch', 'periodicity', 'ppg'),
    loudness_bands='default',
    max_harmonics=None
):
    """Preprocess audio (1, T) → tuple of requested features

    Menu and ordering match the reference (promonet/preprocess/core.py:
    17-126): loudness, pitch, periodicity, ppg, text, harmonics, speaker.
    `loudness_bands=None` requests FULL-BAND loudness (the dataset
    preprocessing convention, promonet/data/preprocess/core.py:33-37).
    """
    if sample_rate is None:
        sample_rate = promonet_tpu.SAMPLE_RATE
    if loudness_bands == 'default':
        loudness_bands = promonet_tpu.LOUDNESS_BANDS
    if max_harmonics is None:
        max_harmonics = promonet_tpu.MAX_HARMONICS

    # Resample to the native rate once, up front
    audio = np.asarray(audio)
    if sample_rate != promonet_tpu.SAMPLE_RATE:
        audio = promonet_tpu.utils.audio.resample(
            audio, sample_rate, promonet_tpu.SAMPLE_RATE)

    result = []

    # Compute loudness
    if 'loudness' in features:
        result.append(
            promonet_tpu.preprocess.loudness.from_audio(
                audio, loudness_bands))

    # Estimate pitch and periodicity
    if 'pitch' in features or 'periodicity' in features:
        if promonet_tpu.VITERBI_DECODE_PITCH:
            decoder, voicing_threshold = 'viterbi', None
        else:
            decoder, voicing_threshold = \
                'argmax', promonet_tpu.VOICING_THRESHOLD
        pitch, periodicity = promonet_tpu.preprocess.pitch.from_audio(
            audio,
            sample_rate=promonet_tpu.SAMPLE_RATE,
            hopsize=promonet_tpu.HOPSIZE,
            fmin=promonet_tpu.FMIN,
            fmax=promonet_tpu.FMAX,
            decoder=decoder,
            interp_unvoiced_at=voicing_threshold)
        if 'pitch' in features:
            result.append(pitch)
        if 'periodicity' in features:
            result.append(periodicity)

    # Spectrogram (used by the data pipeline; not in the reference menu)
    if 'spectrogram' in features:
        result.append(
            promonet_tpu.preprocess.spectrogram.from_audio(audio))

    # Infer ppg (already at the native frame rate)
    if 'ppg' in features:
        result.append(promonet_tpu.preprocess.ppg.from_audio(audio))

    # Infer transcript
    if 'text' in features:
        result.append(promonet_tpu.preprocess.text.from_audio(audio))

    # Compute harmonics
    if 'harmonics' in features:
        result.append(
            promonet_tpu.preprocess.harmonics.from_audio(
                audio, max_harmonics=max_harmonics))

    # Compute speaker embeddings
    if 'speaker' in features:
        result.append(promonet_tpu.preprocess.speaker.from_audio(audio))

    return (*result,)


def from_file(file, gpu=None, features=('loudness', 'pitch', 'periodicity', 'ppg')):
    """Preprocess audio on disk (promonet/preprocess/core.py:129-160)"""
    return from_audio(promonet_tpu.load.audio(file), features=features)


def from_file_to_file(
    file,
    output_prefix=None,
    gpu=None,
    features=('loudness', 'pitch', 'periodicity', 'ppg'),
    loudness_bands='default'
):
    """Preprocess audio on disk and save

    File naming matches the reference cache convention
    (promonet/preprocess/core.py:163-224): -loudness, -{viterbi-}pitch,
    -{viterbi-}periodicity, -ppg, -spectrogram, -text, -harmonics,
    -speaker.
    """
    if output_prefix is None:
        output_prefix = Path(file).with_suffix('')
    values = from_audio(
        promonet_tpu.load.audio(file),
        features=features,
        loudness_bands=loudness_bands)
    save(output_prefix, dict(zip(_ordered(features), values)))


def from_files_to_files(
    files,
    output_prefixes=None,
    gpu=None,
    features=('loudness', 'pitch', 'periodicity', 'ppg'),
    loudness_bands='default'
):
    """Preprocess multiple audio files and save

    Reference fans out per-extractor with worker pools
    (promonet/preprocess/core.py:227-319); here extraction is
    device-bound, so a sequential host loop feeding the jitted extractors
    keeps the TPU busy.
    """
    if output_prefixes is None:
        output_prefixes = [Path(file).with_suffix('') for file in files]
    for file, output_prefix in zip(files, output_prefixes):
        from_file_to_file(
            file,
            output_prefix,
            features=features,
            loudness_bands=loudness_bands)


def save(output_prefix, feature_values):
    """Save named features under the reference's naming convention"""
    viterbi = '-viterbi' if promonet_tpu.VITERBI_DECODE_PITCH else ''
    for name, value in feature_values.items():
        if name == 'text':
            with open(f'{output_prefix}.txt', 'w', encoding='utf-8') as file:
                file.write(value)
        elif name in ('pitch', 'periodicity'):
            promonet_tpu.load.save_array(
                f'{output_prefix}{viterbi}-{name}.npy', np.asarray(value))
        else:
            promonet_tpu.load.save_array(
                f'{output_prefix}-{name}.npy', np.asarray(value))


def _ordered(features):
    """Canonical result ordering (matches from_audio)"""
    order = [
        'loudness', 'pitch', 'periodicity', 'spectrogram', 'ppg', 'text',
        'harmonics', 'speaker']
    return [name for name in order if name in features]
