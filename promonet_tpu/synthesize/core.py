"""Speech synthesis from interpretable features.

Reference: promonet/synthesize/core.py. The generator program is jitted
and cached per (checkpoint, padded-length bucket); variable-length inputs
are padded to bucketed frame counts so arbitrary utterances reuse a small
set of compiled programs (SURVEY.md §5.7).
"""
import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import promonet_tpu
from ..data.collate import bucket_frames
from ..train.core import example_batch, generator_args
from ..utils import timer


def from_features(
    loudness,
    pitch,
    periodicity,
    ppg,
    speaker=0,
    spectral_balance_ratio=1.,
    loudness_ratio=1.,
    checkpoint=None,
    gpu=None
):
    """Perform speech synthesis

    Arguments (reference: promonet/synthesize/core.py:18-59)
        loudness: (F, T) loudness contour
        pitch: (1, T) pitch contour in Hz
        periodicity: (1, T) periodicity contour
        ppg: (C, T) phonetic posteriorgram
        speaker: integer speaker id or (512,) WavLM x-vector
        spectral_balance_ratio: (0, 2] spectral balance / formant ratio
        loudness_ratio: loudness ratio
        checkpoint: generator checkpoint directory
        gpu: unused (API parity)

    Returns
        audio: (1, T * HOPSIZE)
    """
    return generate(
        jnp.asarray(loudness),
        jnp.asarray(pitch).reshape(-1),
        jnp.asarray(periodicity).reshape(-1),
        jnp.asarray(ppg),
        speaker,
        spectral_balance_ratio,
        loudness_ratio,
        checkpoint)


def from_file(
    loudness_file,
    pitch_file,
    periodicity_file,
    ppg_file,
    speaker=0,
    spectral_balance_ratio=1.,
    loudness_ratio=1.,
    checkpoint=None,
    gpu=None
):
    """Synthesize from features on disk (promonet/synthesize/core.py:62-115)"""
    pitch = promonet_tpu.load.array(pitch_file)
    return from_features(
        promonet_tpu.load.array(loudness_file),
        pitch,
        promonet_tpu.load.array(periodicity_file),
        promonet_tpu.load.ppg(ppg_file, pitch.shape[-1]),
        speaker,
        spectral_balance_ratio,
        loudness_ratio,
        checkpoint)


def from_file_to_file(
    loudness_file,
    pitch_file,
    periodicity_file,
    ppg_file,
    output_file,
    speaker=0,
    spectral_balance_ratio=1.,
    loudness_ratio=1.,
    checkpoint=None,
    gpu=None
):
    """Synthesize from features on disk and save"""
    audio = from_file(
        loudness_file,
        pitch_file,
        periodicity_file,
        ppg_file,
        speaker,
        spectral_balance_ratio,
        loudness_ratio,
        checkpoint)
    promonet_tpu.utils.audio.save(
        output_file, np.asarray(audio), promonet_tpu.SAMPLE_RATE)


def from_files_to_files(
    loudness_files,
    pitch_files,
    periodicity_files,
    ppg_files,
    output_files,
    speakers=None,
    spectral_balance_ratio=1.,
    loudness_ratio=1.,
    checkpoint=None,
    gpu=None
):
    """Synthesize multiple utterances"""
    if speakers is None:
        speakers = [0] * len(loudness_files)
    for args in zip(
        loudness_files, pitch_files, periodicity_files, ppg_files,
        output_files, speakers
    ):
        from_file_to_file(
            *args[:5],
            speaker=args[5],
            spectral_balance_ratio=spectral_balance_ratio,
            loudness_ratio=loudness_ratio,
            checkpoint=checkpoint)


###############################################################################
# Internals
###############################################################################


def load_params(checkpoint=None):
    """Load generator parameters from a checkpoint directory or file"""
    if checkpoint is None:
        raise ValueError(
            'No checkpoint given and no default checkpoint available in a '
            'zero-egress environment (the reference downloads one from '
            'HuggingFace hub at promonet/synthesize/core.py:234-237)')
    checkpoint = Path(checkpoint)
    if checkpoint.is_dir() and not (checkpoint / '_METADATA').exists() \
            and not any(checkpoint.glob('*.orbax-checkpoint*')):
        # Run directory: resolve latest generator checkpoint
        resolved = promonet_tpu.utils.checkpoint.latest_path(checkpoint)
        if resolved is not None:
            checkpoint = resolved
    payload = promonet_tpu.utils.checkpoint.load(checkpoint)
    return payload['params'] if 'params' in payload else payload


def _model_key(checkpoint):
    return str(checkpoint) if checkpoint is not None else '__random__'


def _cached_model(checkpoint):
    """Model cache keyed on checkpoint (promonet/synthesize/core.py:226-248)"""
    if not hasattr(_cached_model, 'cache'):
        _cached_model.cache = {}
    key = _model_key(checkpoint)
    if key not in _cached_model.cache:
        with timer.context('load'):
            model = promonet_tpu.models.Generator.create()
            if checkpoint is None:
                # Random init (testing / benchmarking without a checkpoint)
                params = model.init(
                    jax.random.PRNGKey(0),
                    *generator_args(example_batch()))
            else:
                params = load_params(checkpoint)

            @functools.partial(jax.jit, static_argnames=())
            def apply(params, *args):
                return model.apply(params, *args)

            _cached_model.cache[key] = (model, params, apply)
    return _cached_model.cache[key]


def generate(
    loudness,
    pitch,
    periodicity,
    ppg,
    speaker=0,
    spectral_balance_ratio=1.,
    loudness_ratio=1.,
    checkpoint=None
):
    """Generate speech, with padding to bucketed lengths

    Reference: promonet/synthesize/core.py:209-281.
    """
    model, params, apply = _cached_model(checkpoint)

    with timer.context('generate'):
        frames = pitch.shape[-1]
        padded = bucket_frames(frames)

        # Pad on the host in numpy: device-side eager padding would cost
        # one dispatch round-trip per array on a remote interconnect
        def pad(x):
            x = np.asarray(x, np.float32)
            width = [(0, 0)] * (x.ndim - 1) + [(0, padded - x.shape[-1])]
            return np.pad(x, width)

        speaker_arr = np.asarray(speaker)[None]
        audio = apply(
            params,
            pad(loudness)[None],
            pad(np.nan_to_num(np.asarray(pitch), nan=100.))[None],
            pad(periodicity)[None],
            pad(ppg)[None],
            speaker_arr.astype(
                np.int32 if not promonet_tpu.ZERO_SHOT else np.float32),
            np.asarray([spectral_balance_ratio], np.float32),
            np.asarray([loudness_ratio], np.float32))
        return np.asarray(audio)[0, :, :frames * promonet_tpu.HOPSIZE]
