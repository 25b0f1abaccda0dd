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
    gpu=None,
    output_dtype='float32'
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
        output_dtype: 'float32', or 'int16' for PCM16 wire format —
            halves the device→host transfer; lossless relative to the
            16-bit PCM that reaches disk

    Returns
        audio: (1, T * HOPSIZE)
    """
    # Bucket-resident fast path (preprocess/edit outputs): single jitted
    # dispatch with no re-padding; the program is keyed on the bucket
    from ..ops.padded import unwrap
    unwrapped = unwrap(loudness, pitch, periodicity, ppg)
    if unwrapped is not None:
        return generate_padded(
            *unwrapped,
            speaker,
            spectral_balance_ratio,
            loudness_ratio,
            checkpoint,
            output_dtype)

    audio = generate(
        jnp.asarray(loudness),
        jnp.asarray(pitch).reshape(-1),
        jnp.asarray(periodicity).reshape(-1),
        jnp.asarray(ppg),
        speaker,
        spectral_balance_ratio,
        loudness_ratio,
        checkpoint)
    if output_dtype == 'int16':  # wire-format parity with the fast path
        audio = np.clip(
            np.round(audio * 32767.), -32768., 32767.).astype(np.int16)
    return audio


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


def from_features_batched(
    feature_sets,
    speakers=None,
    spectral_balance_ratios=None,
    loudness_ratios=None,
    checkpoint=None,
    batch_size=8,
):
    """Batched synthesis of SAME-BUCKET feature sets: one generator
    dispatch per `batch_size` utterances.

    TPU-native serving path with no reference counterpart (the
    reference synthesizes one utterance per model call,
    promonet/synthesize/core.py:209-281): per-call dispatch latency on
    a tunneled attachment rivals the compute itself, so the offline
    evaluation batches same-bucket jobs. The batch dimension is padded
    to `batch_size` (rows recycled) so exactly ONE program per bucket
    compiles regardless of group size; batch >= 4 trips the native-conv
    lowering (models/modules.py _conv_lowering).

    Arguments
        feature_sets: list of (loudness, pitch, periodicity, ppg) —
            PaddedFeatures (or arrays) sharing one frame bucket
        speakers / spectral_balance_ratios / loudness_ratios: per-set

    Returns
        audio: (len(feature_sets), 1, bucket * HOPSIZE) device array —
        execution is forced (cheap scalar materialization) but the bulk
        audio is NOT transferred; np.asarray it (or slice rows on
        device) as needed.
    """
    from ..ops.padded import as_padded

    count = len(feature_sets)
    if speakers is None:
        speakers = [0] * count
    if spectral_balance_ratios is None:
        spectral_balance_ratios = [1.] * count
    if loudness_ratios is None:
        loudness_ratios = [1.] * count

    sets = [
        tuple(as_padded(value) for value in features)
        for features in feature_sets]
    buckets = {features[1].bucket for features in sets}
    if len(buckets) != 1:
        raise ValueError(f'feature sets span buckets {sorted(buckets)}')

    _, params, _ = _cached_model(checkpoint)
    model_key = _model_key(checkpoint)
    speaker_dtype = np.float32 if promonet_tpu.ZERO_SHOT else np.int32

    outputs = []
    with timer.context('generate'):
        for start in range(0, count, batch_size):
            group = sets[start:start + batch_size]
            rows = [i % len(group) for i in range(batch_size)]
            stack = lambda j, shape=None: jnp.stack([
                group[row][j].data.reshape(shape)
                if shape else group[row][j].data
                for row in rows])
            audio = _apply_batched_jit(
                params,
                stack(0),
                stack(1, (-1,)),
                stack(2, (-1,)),
                stack(3),
                np.stack([
                    np.asarray(speakers[start + row], speaker_dtype)
                    for row in rows]),
                np.asarray(
                    [spectral_balance_ratios[start + row] for row in rows],
                    np.float32),
                np.asarray(
                    [loudness_ratios[start + row] for row in rows],
                    np.float32),
                model_key)
            # Force execution without transferring the bulk audio
            float(jax.device_get(audio[0, 0, 0]))
            outputs.append(audio[:len(group)])
    return outputs[0] if len(outputs) == 1 else jnp.concatenate(outputs)


@functools.partial(jax.jit, static_argnames=('model_key',))
def _apply_batched_jit(
    params, loudness, pitch, periodicity, ppg, speakers,
    spectral_balance_ratios, loudness_ratios, model_key
):
    model = _cached_model_by_key(model_key)
    return model.apply(
        params,
        loudness,
        jnp.nan_to_num(pitch, nan=100.),
        periodicity,
        ppg,
        speakers,
        spectral_balance_ratios,
        loudness_ratios)


###############################################################################
# Fused end-to-end editing (TPU-native fast path)
###############################################################################


def from_edited_audio(
    audio,
    sample_rate=None,
    pitch_shift_cents=None,
    time_stretch_ratio=None,
    loudness_scale_db=None,
    stretch_unvoiced=True,
    stretch_silence=True,
    speaker=0,
    spectral_balance_ratio=1.,
    loudness_ratio=1.,
    checkpoint=None,
    output_dtype='float32'
):
    """Audio in → edited audio out as ONE device dispatch

    No reference counterpart (the reference chains preprocess → edit →
    synthesize through host memory): feature extraction (loudness,
    pitch/periodicity with Viterbi decode, PPG), editing, and the
    generator forward compile into a single XLA program per
    (input-bucket, output-bucket) pair. Edit amounts are traced scalars,
    so different shifts/stretches/scales reuse the compiled program.
    This is the >50x-realtime end-to-end editing path.

    The PPG-aware selective stretch (stretch_unvoiced/stretch_silence
    False) needs the PPG on the host to build its variable-rate grid,
    so that variant falls back to the 3-call pipeline.
    """
    from ..preprocess import core as preprocess_core

    if sample_rate is None:
        sample_rate = promonet_tpu.SAMPLE_RATE
    audio = np.asarray(audio)
    if sample_rate != promonet_tpu.SAMPLE_RATE:
        audio = promonet_tpu.utils.audio.resample(
            audio, sample_rate, promonet_tpu.SAMPLE_RATE)

    # Selective stretch: grid depends on PPG content — 3-call pipeline
    if time_stretch_ratio is not None and not (
        stretch_unvoiced and stretch_silence
    ):
        features = promonet_tpu.preprocess.from_audio(
            audio, loudness_bands=None)
        edited = promonet_tpu.edit.from_features(
            *features,
            pitch_shift_cents=pitch_shift_cents,
            time_stretch_ratio=time_stretch_ratio,
            loudness_scale_db=loudness_scale_db,
            stretch_unvoiced=stretch_unvoiced,
            stretch_silence=stretch_silence)
        return from_features(
            *edited,
            speaker=speaker,
            spectral_balance_ratio=spectral_balance_ratio,
            loudness_ratio=loudness_ratio,
            checkpoint=checkpoint)

    hopsize = promonet_tpu.HOPSIZE
    frames = audio.shape[-1] // hopsize
    bucket_in = bucket_frames(frames)

    ratio = 1. if time_stretch_ratio is None else time_stretch_ratio
    out_frames = int(round(frames / ratio))
    bucket_out = bucket_frames(out_frames)

    # Pad audio to the input bucket (host numpy; single upload).
    # int16 input ships PCM16 over the wire — half the upload bytes,
    # bit-exact with 16-bit sources — and scales to float IN-PROGRAM.
    wire_dtype = np.int16 if audio.dtype == np.int16 else np.float32
    padded = np.zeros((audio.shape[0], bucket_in * hopsize), wire_dtype)
    padded[:, :audio.shape[-1]] = audio[:, :bucket_in * hopsize]

    # Per-output-frame step in input frames (traced: length-agnostic)
    step = (
        (frames - 1) / (out_frames - 1)
        if out_frames > 1 else 0.)

    model, params, _ = _cached_model(checkpoint)
    shift_ratio = (
        promonet_tpu.convert.cents_to_ratio(pitch_shift_cents)
        if pitch_shift_cents is not None else 1.)
    scale_db = loudness_scale_db if loudness_scale_db is not None else 0.

    # Materialize the extractor models OUTSIDE the trace (their params
    # caches must hold real arrays, not tracers; weights enter the
    # program as inputs, never as baked constants)
    from ..preprocess.core import _pitch_front_end
    ppg_params = promonet_tpu.preprocess.ppg._model()[1]
    pitch_kind, pitch_params = _pitch_front_end(('pitch',))

    audio_out = _fused_edit_jit(
        params,
        ppg_params,
        pitch_params,
        pitch_kind,
        jnp.asarray(padded),
        jnp.asarray(step, jnp.float32),
        jnp.asarray(shift_ratio, jnp.float32),
        jnp.asarray(scale_db, jnp.float32),
        np.asarray(speaker)[None].astype(
            np.int32 if not promonet_tpu.ZERO_SHOT else np.float32),
        np.asarray([spectral_balance_ratio], np.float32),
        np.asarray([loudness_ratio], np.float32),
        bucket_out,
        pitch_shift_cents is not None,
        _model_key(checkpoint),
        output_dtype)
    return np.asarray(audio_out)[0, :, :out_frames * hopsize]


@functools.partial(
    jax.jit,
    static_argnames=(
        'bucket_out', 'clip_pitch', 'model_key', 'pitch_kind',
        'output_dtype'))
def _fused_edit_jit(
    params,
    ppg_params,
    pitch_params,
    pitch_kind,
    audio,
    step,
    shift_ratio,
    scale_db,
    speaker,
    spectral_balance_ratio,
    loudness_ratio_arr,
    bucket_out,
    clip_pitch,
    model_key,
    output_dtype='float32'
):
    """extract → edit → synthesize, fused"""
    from ..ops import grid as grid_ops
    from ..preprocess import core as preprocess_core

    model = _cached_model_by_key(model_key)
    if audio.dtype == jnp.int16:  # PCM16 wire input
        audio = audio.astype(jnp.float32) / 32768.

    features = ('loudness', 'pitch', 'periodicity', 'ppg')
    loudness, pitch, periodicity, ppg = preprocess_core._fused_jit(
        audio,
        ppg_params,
        pitch_params,
        features,
        None,
        'viterbi' if promonet_tpu.VITERBI_DECODE_PITCH else 'argmax',
        None if promonet_tpu.VITERBI_DECODE_PITCH
        else promonet_tpu.VOICING_THRESHOLD,
        pitch_kind)

    # Edit on the device: constant-rate grid from the traced step
    grid = jnp.arange(bucket_out, dtype=jnp.float32) * step
    pitch = 2 ** grid_ops.sample(jnp.log2(pitch), grid)
    periodicity = grid_ops.sample(periodicity, grid)
    loudness = grid_ops.sample(loudness, grid) + scale_db
    ppg = grid_ops.sample(ppg, grid, promonet_tpu.PPG_INTERP_METHOD)
    pitch = pitch * shift_ratio
    if clip_pitch:
        pitch = jnp.clip(pitch, promonet_tpu.FMIN, promonet_tpu.FMAX)

    return _as_wire(
        model.apply(
            params,
            loudness[None] if loudness.ndim == 2 else loudness,
            pitch,
            periodicity,
            ppg[None] if ppg.ndim == 2 else ppg,
            speaker,
            spectral_balance_ratio,
            loudness_ratio_arr),
        output_dtype)


def _cached_model_by_key(key):
    return _cached_model.cache[key][0]


def precompile(
    checkpoint=None,
    buckets=None,
    stretch_ratios=(1., 0.717, 1.414),
    speaker=0,
):
    """Warm the fused-edit programs for the hot bucket pairs.

    `from_edited_audio` compiles one program per (input-bucket,
    output-bucket) pair; a fresh process hitting a new pair pays that
    compile inline. This warms the pairs reachable from each input
    bucket under the given stretch ratios (identity + the reference's
    evaluation ratios, promonet/config/defaults.py:204), so serving
    processes take no compile hits on the hot path. Compiles populate
    JAX's persistent compilation cache (promonet_tpu/__init__.py), so
    subsequent processes warm from disk.

    Returns the number of programs compiled.
    """
    if buckets is None:
        buckets = promonet_tpu.INFERENCE_FRAME_BUCKETS
    hopsize = promonet_tpu.HOPSIZE
    count = 0
    for bucket in buckets:
        audio = np.zeros((1, bucket * hopsize), np.float32)
        for ratio in stretch_ratios:
            from_edited_audio(
                audio,
                time_stretch_ratio=None if ratio == 1. else ratio,
                pitch_shift_cents=100.,
                loudness_scale_db=1.,
                speaker=speaker,
                checkpoint=checkpoint)
            count += 1
    return count


###############################################################################
# Internals
###############################################################################


def default_checkpoint():
    """Resolve the default generator checkpoint, if one exists.

    The reference defaults to a trained model fetched from HuggingFace
    hub (promonet/synthesize/core.py:234-237). Zero-egress equivalent:
    `DEFAULT_CHECKPOINT` if configured, else the latest checkpoint of
    the active config's run directory. None if neither exists (callers
    fall back to random init for smoke/benchmarking).
    """
    configured = getattr(promonet_tpu, 'DEFAULT_CHECKPOINT', None)
    if configured is not None:
        return Path(configured)

    # Resolution walks the run directory and parses orbax metadata
    # (~100 ms); it sits on the hot synthesis path (called per
    # utterance), so cache it keyed on the run directory's mtime — a
    # new checkpoint landing from a concurrent trainer bumps the mtime
    # and re-resolves
    run_dir = promonet_tpu.RUNS_DIR / promonet_tpu.CONFIG
    try:
        mtime = run_dir.stat().st_mtime_ns
    except OSError:
        mtime = None
    # Cache only the PATH resolution — the compatibility verdict below
    # is keyed separately so a config change (different architecture,
    # same run dir) re-gates rather than returning a stale checkpoint
    if not hasattr(default_checkpoint, '_resolved'):
        default_checkpoint._resolved = {}
    cache_key = (str(run_dir), mtime)
    if cache_key in default_checkpoint._resolved:
        resolved = default_checkpoint._resolved[cache_key]
    else:
        try:
            resolved = promonet_tpu.utils.checkpoint.latest_path(run_dir)
        except Exception:
            resolved = None
        default_checkpoint._resolved[cache_key] = resolved
    if resolved is None:
        return None

    # A run checkpoint may have been trained under a different config
    # (e.g. another speaker count); an implicit default must not crash
    # synthesis — validate shapes once per path and fall back
    if not hasattr(default_checkpoint, '_compatible'):
        default_checkpoint._compatible = {}
    key = str(resolved)
    if key not in default_checkpoint._compatible:
        default_checkpoint._compatible[key] = _params_compatible(
            promonet_tpu.models.Generator.create(), load_params(resolved))
        if not default_checkpoint._compatible[key]:
            print(
                f'default checkpoint {resolved} does not match the active '
                'configuration (load its config, e.g. '
                'PROMONET_TPU_CONFIG=<run>/<config>.py); using random init')
    return resolved if default_checkpoint._compatible[key] else None


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
    if checkpoint is None:
        checkpoint = default_checkpoint()
    return str(checkpoint) if checkpoint is not None else '__random__'


def _params_compatible(model, params):
    """Whether loaded parameters match the active config's shapes"""
    try:
        expected = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0), *generator_args(example_batch())))
        flat_loaded = dict(
            (jax.tree_util.keystr(path), np.shape(leaf))
            for path, leaf in jax.tree_util.tree_leaves_with_path(params))
        for path, leaf in jax.tree_util.tree_leaves_with_path(expected):
            if flat_loaded.get(jax.tree_util.keystr(path)) != leaf.shape:
                return False
        return True
    except Exception:
        return False


def _cached_model(checkpoint):
    """Model cache keyed on checkpoint (promonet/synthesize/core.py:226-248)"""
    if checkpoint is None:
        checkpoint = default_checkpoint()
    if not hasattr(_cached_model, 'cache'):
        _cached_model.cache = {}
    key = _model_key(checkpoint)
    if key not in _cached_model.cache:
        with timer.context('load'):
            model = promonet_tpu.models.Generator.create()
            if checkpoint is None:
                # Random init (testing / benchmarking without a
                # checkpoint). Jitted: eager init pays one tunnel
                # round-trip per primitive (~270 s measured r4)
                params = jax.jit(model.init)(
                    jax.random.PRNGKey(0),
                    *generator_args(example_batch()))
            else:
                # Resident upload ONCE: orbax restores host numpy, and
                # jit would re-transfer every leaf on every call — ~50MB
                # per synthesis over the tunneled attachment (measured:
                # 0.1 s → 1.3 s per 10 s utterance)
                params = jax.device_put(load_params(checkpoint))

            @functools.partial(jax.jit, static_argnames=())
            def apply(params, *args):
                return model.apply(params, *args)

            _cached_model.cache[key] = (model, params, apply)
    return _cached_model.cache[key]


def _as_wire(audio, output_dtype):
    """Convert device audio to the requested wire format IN-PROGRAM.

    'int16' halves the device→host transfer (the dominant cost of a
    synthesis call on a tunneled attachment) and is lossless relative
    to what reaches disk anyway — sources and outputs are 16-bit PCM
    (reference cache convention, promonet/data/download/core.py:1-21).
    """
    if output_dtype == 'int16':
        return jnp.clip(
            jnp.round(audio * 32767.), -32768., 32767.).astype(jnp.int16)
    return audio


@functools.partial(
    jax.jit, static_argnames=('model_key', 'output_dtype'))
def _apply_padded_jit(
    params, loudness, pitch, periodicity, ppg, speaker,
    spectral_balance_ratio, loudness_ratio, model_key,
    output_dtype='float32'
):
    """Generator forward over BUCKET-shaped features: batching reshapes
    and NaN scrubbing fuse into the one dispatch (the exact-length path
    pays an eager device op per feature for the same work)."""
    model = _cached_model_by_key(model_key)
    pitch = jnp.nan_to_num(pitch.reshape(1, -1), nan=100.)
    periodicity = periodicity.reshape(1, -1)
    loudness = loudness[None] if loudness.ndim == 2 else loudness
    ppg = ppg[None] if ppg.ndim == 2 else ppg
    return _as_wire(
        model.apply(
            params, loudness, pitch, periodicity, ppg, speaker,
            spectral_balance_ratio, loudness_ratio),
        output_dtype)


def generate_padded(
    arrays,
    frames,
    speaker=0,
    spectral_balance_ratio=1.,
    loudness_ratio=1.,
    checkpoint=None,
    output_dtype='float32'
):
    """Generate speech from bucket-resident features (no re-padding)"""
    _, params, _ = _cached_model(checkpoint)
    with timer.context('generate'):
        loudness, pitch, periodicity, ppg = arrays
        speaker_arr = np.asarray(speaker)[None]
        audio = _apply_padded_jit(
            params,
            loudness,
            pitch,
            periodicity,
            ppg,
            speaker_arr.astype(
                np.int32 if not promonet_tpu.ZERO_SHOT else np.float32),
            np.asarray([spectral_balance_ratio], np.float32),
            np.asarray([loudness_ratio], np.float32),
            _model_key(checkpoint),
            output_dtype)
        return np.asarray(audio)[0, :, :frames * promonet_tpu.HOPSIZE]


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

        # Hybrid padding: features already on device (preprocess/edit
        # outputs) pad with async device ops — no host round-trip;
        # host arrays pad in numpy and upload once via the jit call
        def pad(x, nan=None):
            if isinstance(x, jax.Array):
                if nan is not None:
                    x = jnp.nan_to_num(x, nan=nan)
                width = [(0, 0)] * (x.ndim - 1) + [(0, padded - x.shape[-1])]
                return jnp.pad(x, width)
            x = np.asarray(x, np.float32)
            if nan is not None:
                x = np.nan_to_num(x, nan=nan)
            width = [(0, 0)] * (x.ndim - 1) + [(0, padded - x.shape[-1])]
            return np.pad(x, width)

        speaker_arr = np.asarray(speaker)[None]
        audio = apply(
            params,
            pad(loudness)[None],
            pad(pitch, nan=100.)[None],
            pad(periodicity)[None],
            pad(ppg)[None],
            speaker_arr.astype(
                np.int32 if not promonet_tpu.ZERO_SHOT else np.float32),
            np.asarray([spectral_balance_ratio], np.float32),
            np.asarray([loudness_ratio], np.float32))
        return np.asarray(audio)[0, :, :frames * promonet_tpu.HOPSIZE]
