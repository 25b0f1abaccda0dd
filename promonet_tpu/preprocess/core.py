"""Feature-extraction orchestrator.

Reference: promonet/preprocess/core.py. On TPU the jittable extractors
(loudness, pitch+periodicity incl. the Pallas Viterbi decode,
spectrogram, PPG) fuse into ONE XLA program per (length-bucket,
feature-set) — a single device dispatch and a single host transfer,
replacing the reference's CPU librosa + three separate GPU model calls.
Audio is padded to bucketed frame counts to bound recompilation
(SURVEY.md §5.7); outputs are trimmed to the true frame count.
"""
import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import promonet_tpu

# Features the fused device path can produce
JITTABLE = ('loudness', 'pitch', 'periodicity', 'spectrogram', 'ppg')


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

    # Resample to the native rate once, up front. DEVICE-resident audio
    # (e.g. freshly synthesized — the evaluation re-preprocess path)
    # stays on device when no resampling or host-only feature is
    # needed: feature re-extraction then never round-trips the tunnel.
    host_needed = (
        sample_rate != promonet_tpu.SAMPLE_RATE
        or any(f in features for f in ('text', 'harmonics', 'speaker')))
    if host_needed or not isinstance(audio, jax.Array):
        audio = np.asarray(audio)
    if sample_rate != promonet_tpu.SAMPLE_RATE:
        audio = promonet_tpu.utils.audio.resample(
            audio, sample_rate, promonet_tpu.SAMPLE_RATE)

    # Fused device path for the jittable subset: one dispatch per
    # (bucket, feature-set)
    jittable_requested = tuple(f for f in _ordered(features) if f in JITTABLE)
    fused = {}
    if jittable_requested:
        fused = dict(
            zip(
                jittable_requested,
                _fused_extract(audio, jittable_requested, loudness_bands)))

    result = []
    for name in _ordered(features):
        if name in fused:
            result.append(fused[name])
        elif name == 'text':
            result.append(promonet_tpu.preprocess.text.from_audio(audio))
        elif name == 'harmonics':
            result.append(
                promonet_tpu.preprocess.harmonics.from_audio(
                    audio, max_harmonics=max_harmonics))
        elif name == 'speaker':
            result.append(promonet_tpu.preprocess.speaker.from_audio(audio))

    return (*result,)


def _fused_extract(audio, features, loudness_bands):
    """Run the fused extractor with length bucketing; trim to true frames"""
    from ..data.collate import bucket_frames

    frames = audio.shape[-1] // promonet_tpu.HOPSIZE
    bucket = bucket_frames(frames)
    samples = bucket * promonet_tpu.HOPSIZE
    if isinstance(audio, jax.Array):
        # Device-resident input: pad with an async device op
        if audio.shape[-1] >= samples:
            padded = audio[:, :samples].astype(jnp.float32)
        else:
            padded = jnp.pad(
                audio.astype(jnp.float32),
                ((0, 0), (0, samples - audio.shape[-1])))
    else:
        padded = np.zeros((audio.shape[0], samples), np.float32)
        padded[:, :audio.shape[-1]] = audio[:, :samples]

    if promonet_tpu.VITERBI_DECODE_PITCH:
        decoder, interp_at = 'viterbi', None
    else:
        decoder, interp_at = 'argmax', promonet_tpu.VOICING_THRESHOLD

    ppg_params = (
        promonet_tpu.preprocess.ppg._model()[1]
        if 'ppg' in features else {})
    pitch_kind, pitch_params = _pitch_front_end(features)
    outputs = _fused_jit(
        jnp.asarray(padded),
        ppg_params,
        pitch_params,
        features,
        loudness_bands,
        decoder,
        interp_at,
        pitch_kind)
    # Keep the bucket-shaped device arrays alive (PaddedFeature): edit
    # and synthesize consume them with zero trim/re-pad dispatches, and
    # their programs stay keyed on bucket sizes alone. Anything else
    # sees the trimmed array via np.asarray / jnp.asarray / indexing.
    from ..ops.padded import PaddedFeature
    return [PaddedFeature(out, frames) for out in outputs]


def _pitch_front_end(features):
    """(kind, params) for the pitch front-end — resolved OUTSIDE jit.

    The CNN weights are program inputs and the estimator kind a static
    cache key (see pitch.cnn_posteriorgram): a fused program that baked
    them as trace-time constants would silently serve stale weights
    after a checkpoint/config change at the same audio shape.
    """
    from . import pitch as pitch_module

    if not ('pitch' in features or 'periodicity' in features):
        return 'dsp', {}
    if promonet_tpu.PITCH_ESTIMATOR == 'cnn':
        return 'cnn', pitch_module.PitchCNN.instance().params
    return 'dsp', {}


@functools.partial(
    jax.jit,
    static_argnames=(
        'features', 'bands', 'decoder', 'interp_at', 'pitch_kind'))
def _fused_jit(
    audio, ppg_params, pitch_params, features, bands, decoder, interp_at,
    pitch_kind='dsp'
):
    """All jittable extractors as one XLA program"""
    from . import loudness as loudness_module
    from . import pitch as pitch_module
    from . import ppg as ppg_module
    from . import spectrogram as spectrogram_module

    out = {}
    if 'loudness' in features:
        out['loudness'] = loudness_module._from_audio_jit(audio, bands)

    if 'pitch' in features or 'periodicity' in features:
        pitch, periodicity = pitch_module._from_audio_jit(
            audio,
            pitch_params,
            promonet_tpu.SAMPLE_RATE,
            promonet_tpu.HOPSIZE,
            decoder,
            interp_at,
            pitch_kind)
        out['pitch'] = pitch
        out['periodicity'] = periodicity

    if 'spectrogram' in features or 'ppg' in features:
        spectrogram = spectrogram_module._from_audio_jit(
            audio[None], False, None)[0]
        if 'spectrogram' in features:
            out['spectrogram'] = spectrogram
        if 'ppg' in features:
            mels = spectrogram_module.linear_to_mel(spectrogram)
            log_probs = ppg_module._model()[0].apply(
                ppg_params, jnp.swapaxes(mels, -1, -2)[None])
            out['ppg'] = jnp.exp(jnp.swapaxes(log_probs[0], -1, -2))

    return tuple(out[name] for name in features)


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
    (promonet/preprocess/core.py:227-319); here extraction is one fused
    device program per file, so the binding constraint is dispatch
    latency (significant on tunneled/remote TPU attachments), not
    compute. A thread pool keeps several dispatches in flight — JAX
    dispatch is thread-safe and compiled programs are shared — hiding
    the round-trip behind the device work.
    """
    from concurrent.futures import ThreadPoolExecutor

    if output_prefixes is None:
        output_prefixes = [Path(file).with_suffix('') for file in files]

    def task(pair):
        file, output_prefix = pair
        from_file_to_file(
            file,
            output_prefix,
            features=features,
            loudness_bands=loudness_bands)

    # Warm the compile caches sequentially on the first file (avoids a
    # thundering herd of identical compilations), then fan out
    pairs = list(zip(files, output_prefixes))
    if not pairs:
        return
    task(pairs[0])
    if len(pairs) > 1:
        with ThreadPoolExecutor(8) as pool:
            list(pool.map(task, pairs[1:]))


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
