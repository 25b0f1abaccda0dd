"""Loading utilities.

Reference: promonet/load.py. Feature files interoperate with the
reference's on-disk cache: `.pt` tensors (read via CPU torch when
available) and native `.npy` arrays are both supported, preferring `.npy`.
"""
import json
from pathlib import Path

import numpy as np

import promonet_tpu


###############################################################################
# Array file IO (torch .pt interop)
###############################################################################


def array(file):
    """Load a feature array saved as .npy or torch .pt"""
    file = Path(file)
    npy = file.with_suffix('.npy')
    if file.suffix == '.npy' or (not file.exists() and npy.exists()):
        return np.load(npy if not file.exists() else file)
    if file.suffix == '.pt':
        import torch
        tensor = torch.load(file, map_location='cpu', weights_only=False)
        return tensor.detach().numpy()
    raise FileNotFoundError(file)


def save_array(file, data):
    """Save a feature array; writes .npy natively, .pt for interop"""
    file = Path(file)
    data = np.asarray(data)
    if file.suffix == '.pt':
        import torch
        torch.save(torch.from_numpy(np.ascontiguousarray(data)), file)
    else:
        np.save(file.with_suffix('.npy'), data)


###############################################################################
# Loading utilities
###############################################################################


def audio(file):
    """Load audio from disk, resampled to SAMPLE_RATE, mono (1, T)

    Reference: promonet/load.py:16-28
    """
    waveform, _ = promonet_tpu.utils.audio.load(
        file, promonet_tpu.SAMPLE_RATE)
    return waveform


def features(prefix):
    """Load input features from file prefix (promonet/load.py:31-41)"""
    prefix = str(prefix)
    if promonet_tpu.VITERBI_DECODE_PITCH:
        pitch_prefix = f'{prefix}-viterbi'
    else:
        pitch_prefix = prefix
    return (
        array(f'{prefix}-loudness.npy'),
        array(f'{pitch_prefix}-pitch.npy'),
        array(f'{pitch_prefix}-periodicity.npy'),
        array(f'{prefix}-ppg.npy'))


def partition(dataset, adapt=None):
    """Load partitions for dataset (promonet/load.py:44-51)"""
    if adapt is None:
        adapt = promonet_tpu.ADAPTATION
    partition_dir = (
        promonet_tpu.ASSETS_DIR /
        'partitions' /
        ('adaptation' if adapt else 'multispeaker'))
    with open(partition_dir / f'{dataset}.json') as file:
        return json.load(file)


def pitch_distribution(dataset=None, partition='train'):
    """Load (or compute and cache) dataset-wide voiced-pitch quantiles

    Reference: promonet/load.py:54-111. The distribution defines the
    boundaries of the variable-width pitch bins; PITCH_BINS quantiles of
    all voiced pitch frames in the training partition.
    """
    if dataset is None:
        dataset = promonet_tpu.TRAINING_DATASET
    key = ''
    if promonet_tpu.AUGMENT_LOUDNESS:
        key += '-loudness'
    if promonet_tpu.AUGMENT_PITCH:
        key += '-pitch'
    if promonet_tpu.VITERBI_DECODE_PITCH:
        key += '-viterbi'
    file = (
        promonet_tpu.ASSETS_DIR /
        'stats' /
        f'{dataset}-{promonet_tpu.PITCH_BINS}{key}.npy')

    # Cache KEYED on the resolved stats file: an unkeyed cache poisons
    # every later caller after ASSETS_DIR/dataset changes mid-process
    # (adaptation runs; test suites with temp corpora) — the variable
    # pitch-bin boundaries silently come from the wrong dataset and
    # every bins↔hz conversion is systematically off.
    cache = pitch_distribution.__dict__.setdefault('cache', {})
    cache_key = str(file)
    if cache_key not in cache:
        if file.exists():
            cache[cache_key] = np.load(file)
        else:
            try:
                cache[cache_key] = _compute_pitch_distribution(
                    dataset, partition)
                file.parent.mkdir(parents=True, exist_ok=True)
                np.save(file, cache[cache_key])
            except Exception:
                # No dataset on disk: fall back to log-uniform quantiles
                # over [FMIN, FMAX] so models remain constructible
                cache[cache_key] = np.exp(
                    np.linspace(
                        np.log(promonet_tpu.FMIN),
                        np.log(promonet_tpu.FMAX),
                        promonet_tpu.PITCH_BINS)).astype(np.float32)

    return cache[cache_key]


def _compute_pitch_distribution(dataset, partition):
    """Quantile computation over all voiced training pitch frames"""
    data_module = promonet_tpu.data
    dataset_object = data_module.Dataset(dataset, partition)
    viterbi = '-viterbi' if promonet_tpu.VITERBI_DECODE_PITCH else ''
    allpitch = []
    for stem in dataset_object.stems:
        pitch = array(dataset_object.cache / f'{stem}{viterbi}-pitch.npy')
        periodicity = array(
            dataset_object.cache / f'{stem}{viterbi}-periodicity.npy')
        voiced = np.logical_and(
            ~np.isnan(pitch),
            periodicity > promonet_tpu.VOICING_THRESHOLD)
        allpitch.append(pitch[voiced])
    pitch = np.sort(np.concatenate(allpitch))
    indices = np.linspace(
        len(pitch) / promonet_tpu.PITCH_BINS,
        len(pitch) - 1,
        promonet_tpu.PITCH_BINS).astype(np.int64)
    return pitch[indices].astype(np.float32)


def per_speaker_averages(dataset=None, partition='train'):
    """Average voiced pitch per speaker (promonet/load.py:114-169)"""
    if dataset is None:
        dataset = promonet_tpu.TRAINING_DATASET
    key = '-viterbi' if promonet_tpu.VITERBI_DECODE_PITCH else ''
    file = (
        promonet_tpu.ASSETS_DIR /
        'stats' /
        f'{dataset}-{partition}-speaker-averages{key}.json')
    if file.exists():
        with open(file) as json_file:
            return json.load(json_file)

    dataset_object = promonet_tpu.data.Dataset(dataset, partition)
    viterbi = '-viterbi' if promonet_tpu.VITERBI_DECODE_PITCH else ''
    allpitch = {}
    for stem in dataset_object.stems:
        pitch = array(dataset_object.cache / f'{stem}{viterbi}-pitch.npy')
        periodicity = array(
            dataset_object.cache / f'{stem}{viterbi}-periodicity.npy')
        voiced = np.logical_and(
            ~np.isnan(pitch),
            periodicity > promonet_tpu.VOICING_THRESHOLD)
        speaker = stem.split('/')[0]
        allpitch.setdefault(speaker, []).append(pitch[voiced])
    averages = {
        speaker: float(2 ** np.log2(np.concatenate(values)).mean())
        for speaker, values in allpitch.items()}
    file.parent.mkdir(parents=True, exist_ok=True)
    with open(file, 'w') as json_file:
        json.dump(averages, json_file, indent=4, sort_keys=True)
    return averages


def ppg(file, resample_length=None):
    """Load a PPG file and maybe grid-resample, preserving distribution

    Reference: promonet/load.py:172-188 (the resample + re-softmax that
    keeps PPGs valid distributions).
    """
    import jax.numpy as jnp

    result = array(file)
    if resample_length is not None and result.shape[-1] != resample_length:
        grid = promonet_tpu.ops.grid.of_length(result, resample_length)
        result = promonet_tpu.ops.grid.sample(
            jnp.asarray(result), grid, promonet_tpu.PPG_INTERP_METHOD)
        result = jnp.exp(
            jnp.log(result + 1e-8) -
            jnp.log(jnp.sum(result + 1e-8, axis=-2, keepdims=True)))
        return np.asarray(result)
    return result


def text(file):
    """Load text file (promonet/load.py:191-194)"""
    with open(file, encoding='utf-8') as file:
        return file.read()
