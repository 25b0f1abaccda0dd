"""Edit speech features.

Reference: promonet/edit/core.py. Pitch-shift, loudness-scale, and the
(optionally PPG-aware) time-stretch over the interpretable representation.
The variable-rate grid construction (edit/core.py:92-110) runs on the host
(it determines output length, which must be static for the device); the
actual feature resampling is vectorized JAX.
"""
import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import promonet_tpu
from ..ops import grid as grid_ops
from ..ops import padded as padded_ops
from ..preprocess.ppg import PHONEME_TO_INDEX_MAPPING, PHONEMES, SILENCE, VOICED


@functools.partial(jax.jit, static_argnames=('method', 'clip_pitch'))
def _edit_with_grid(
    loudness, pitch, periodicity, ppg, grid, shift_ratio, scale_db,
    method, clip_pitch
):
    """Stretch + shift + scale as ONE device dispatch"""
    pitch = 2 ** grid_ops.sample(jnp.log2(pitch), grid)
    periodicity = grid_ops.sample(periodicity, grid)
    loudness = grid_ops.sample(loudness, grid)
    ppg = grid_ops.sample(ppg, grid, method)
    pitch = pitch * shift_ratio
    if clip_pitch:
        pitch = jnp.clip(pitch, promonet_tpu.FMIN, promonet_tpu.FMAX)
    return loudness + scale_db, pitch, periodicity, ppg


@functools.partial(jax.jit, static_argnames=('clip_pitch',))
def _edit_no_grid(loudness, pitch, shift_ratio, scale_db, clip_pitch):
    pitch = pitch * shift_ratio
    if clip_pitch:
        pitch = jnp.clip(pitch, promonet_tpu.FMIN, promonet_tpu.FMAX)
    return loudness + scale_db, pitch


@functools.partial(
    jax.jit, static_argnames=('bucket_out', 'method', 'clip_pitch'))
def _edit_padded(
    loudness, pitch, periodicity, ppg, step, shift_ratio, scale_db,
    bucket_out, method, clip_pitch
):
    """Stretch + shift + scale over BUCKET-shaped inputs, one dispatch.

    The grid is `arange(bucket_out) * step` with a traced step, so the
    compiled program is keyed on (input bucket, output bucket) only —
    every true length reuses it. Positions past the true final frame
    sample the (finite) padded tail; those output frames land in the
    padded tail of the result and are never materialized. Mirrors the
    fused path's on-device edit (synthesize/core.py _fused_edit_jit).
    """
    grid = jnp.arange(bucket_out, dtype=jnp.float32) * step
    pitch = 2 ** grid_ops.sample(jnp.log2(pitch), grid)
    periodicity = grid_ops.sample(periodicity, grid)
    loudness = grid_ops.sample(loudness, grid) + scale_db
    ppg = grid_ops.sample(ppg, grid, method)
    pitch = pitch * shift_ratio
    if clip_pitch:
        pitch = jnp.clip(pitch, promonet_tpu.FMIN, promonet_tpu.FMAX)
    return loudness, pitch, periodicity, ppg


def from_features(
    loudness,
    pitch,
    periodicity,
    ppg,
    pitch_shift_cents: Optional[float] = None,
    time_stretch_ratio: Optional[float] = None,
    loudness_scale_db: Optional[float] = None,
    stretch_unvoiced: bool = True,
    stretch_silence: bool = True,
    return_grid: bool = False
):
    """Edit speech representation

    Arguments (reference: promonet/edit/core.py:17-48)
        loudness: (F, T) loudness contour to edit
        pitch: (1, T) pitch contour to edit
        periodicity: (1, T) periodicity contour to edit
        ppg: (C, T) phonetic posteriorgram to edit
        pitch_shift_cents: Amount of pitch-shifting in cents
        time_stretch_ratio: Amount of time-stretching. Faster above one.
        loudness_scale_db: Loudness scaling in dB
        stretch_unvoiced: If true, time-stretch unvoiced frames
        stretch_silence: If true, time-stretch silent frames
        return_grid: If true, also return the time-stretch grid

    Returns
        edited_loudness, edited_pitch, edited_periodicity, edited_ppg
        (+ grid if return_grid)
    """
    # Bucket-resident fast path (preprocess outputs): one dispatch, no
    # trim/re-pad churn, programs keyed on buckets — not true lengths.
    # The selective (PPG-aware) stretch needs the true-length PPG on the
    # host to build its grid, so it takes the exact-length path below.
    unwrapped = padded_ops.unwrap(loudness, pitch, periodicity, ppg)
    if unwrapped is not None and (
        time_stretch_ratio is None or (stretch_unvoiced and stretch_silence)
    ):
        return _from_padded_features(
            *unwrapped,
            pitch_shift_cents,
            time_stretch_ratio,
            loudness_scale_db,
            return_grid)

    loudness = jnp.asarray(loudness)
    pitch = jnp.asarray(pitch)
    periodicity = jnp.asarray(periodicity)
    ppg = jnp.asarray(ppg)
    grid = None

    # All edits run as a single device dispatch; scalar edit amounts are
    # traced so different shifts/scales reuse the compiled program
    shift_ratio = jnp.asarray(
        promonet_tpu.convert.cents_to_ratio(pitch_shift_cents)
        if pitch_shift_cents is not None else 1., jnp.float32)
    scale_db = jnp.asarray(
        loudness_scale_db if loudness_scale_db is not None else 0.,
        jnp.float32)
    clip_pitch = pitch_shift_cents is not None

    if time_stretch_ratio is not None:
        if stretch_unvoiced and stretch_silence:
            grid = promonet_tpu.edit.grid.constant(ppg, time_stretch_ratio)
        else:
            grid = _selective_grid(
                np.asarray(ppg),
                time_stretch_ratio,
                stretch_unvoiced,
                stretch_silence)
        loudness, pitch, periodicity, ppg = _edit_with_grid(
            loudness, pitch, periodicity, ppg, grid,
            shift_ratio, scale_db,
            promonet_tpu.PPG_INTERP_METHOD, clip_pitch)
    elif pitch_shift_cents is not None or loudness_scale_db is not None:
        loudness, pitch = _edit_no_grid(
            loudness, pitch, shift_ratio, scale_db, clip_pitch)

    if return_grid:
        return loudness, pitch, periodicity, ppg, grid
    return loudness, pitch, periodicity, ppg


def _from_padded_features(
    arrays,
    frames,
    pitch_shift_cents,
    time_stretch_ratio,
    loudness_scale_db,
    return_grid
):
    """Edit bucket-resident features; outputs stay bucket-resident."""
    from ..data.collate import bucket_frames
    from ..ops.padded import PaddedFeature

    loudness, pitch, periodicity, ppg = arrays
    shift_ratio = jnp.asarray(
        promonet_tpu.convert.cents_to_ratio(pitch_shift_cents)
        if pitch_shift_cents is not None else 1., jnp.float32)
    scale_db = jnp.asarray(
        loudness_scale_db if loudness_scale_db is not None else 0.,
        jnp.float32)
    clip_pitch = pitch_shift_cents is not None
    grid = None

    if time_stretch_ratio is not None:
        out_frames = int(round(frames / time_stretch_ratio))
        bucket_out = bucket_frames(out_frames)
        step = (frames - 1) / (out_frames - 1) if out_frames > 1 else 0.
        loudness, pitch, periodicity, ppg = _edit_padded(
            loudness, pitch, periodicity, ppg,
            jnp.asarray(step, jnp.float32), shift_ratio, scale_db,
            bucket_out, promonet_tpu.PPG_INTERP_METHOD, clip_pitch)
        if return_grid:
            # Exact-length grid only on request (WORLD baseline / pack)
            grid = jnp.linspace(
                0., frames - 1, out_frames, dtype=jnp.float32)
    else:
        out_frames = frames
        if pitch_shift_cents is not None or loudness_scale_db is not None:
            loudness, pitch = _edit_no_grid(
                loudness, pitch, shift_ratio, scale_db, clip_pitch)

    result = tuple(
        value if isinstance(value, PaddedFeature)
        else PaddedFeature(value, out_frames)
        for value in (loudness, pitch, periodicity, ppg))
    return (*result, grid) if return_grid else result


def _selective_grid(ppg, ratio, stretch_unvoiced, stretch_silence):
    """Variable-rate stretch grid exempting unvoiced and/or silent frames

    Reference: promonet/edit/core.py:58-110. The probability-weighted
    step loop runs on the host (it determines the output length).
    """
    # Phoneme classes selected FOR stretching
    indices = [PHONEME_TO_INDEX_MAPPING[phoneme] for phoneme in VOICED]
    if stretch_silence:
        indices.append(PHONEME_TO_INDEX_MAPPING[SILENCE])
    if stretch_unvoiced:
        indices.extend(
            PHONEME_TO_INDEX_MAPPING[p]
            for p in set(PHONEMES) - set(VOICED) - {SILENCE})

    # Per-frame probability of being stretchable
    selected = ppg[np.asarray(indices)].sum(axis=0)

    # Number of output frames and the ratio applied to selected frames so
    # the unselected frames pass through unstretched
    total_frames = ppg.shape[-1]
    target_frames = round(total_frames / ratio)
    total_selected = selected.sum()
    total_unselected = total_frames - total_selected
    effective_ratio = (target_frames - total_unselected) / total_selected

    grid = np.zeros(round(target_frames), dtype=np.float32)
    i = 0.
    for j in range(1, target_frames):
        left = math.floor(i)
        if left + 1 < len(selected):
            offset = i - left
            probability = (
                offset * selected[left + 1] + (1 - offset) * selected[left])
        else:
            probability = selected[left]
        frame_ratio = probability * effective_ratio + (1 - probability)
        step = 1. / frame_ratio
        grid[j] = grid[j - 1] + step
        i += step

    return jnp.asarray(grid)


def from_file(
    loudness_file,
    pitch_file,
    periodicity_file,
    ppg_file,
    pitch_shift_cents=None,
    time_stretch_ratio=None,
    loudness_scale_db=None,
    stretch_unvoiced=True,
    stretch_silence=True,
    return_grid=False
):
    """Edit speech representation on disk (promonet/edit/core.py:135-178)"""
    pitch = promonet_tpu.load.array(pitch_file)
    return from_features(
        promonet_tpu.load.array(loudness_file),
        pitch,
        promonet_tpu.load.array(periodicity_file),
        promonet_tpu.load.ppg(ppg_file, pitch.shape[-1]),
        pitch_shift_cents,
        time_stretch_ratio,
        loudness_scale_db,
        stretch_unvoiced,
        stretch_silence,
        return_grid)


def from_file_to_file(
    loudness_file,
    pitch_file,
    periodicity_file,
    ppg_file,
    output_prefix,
    pitch_shift_cents=None,
    time_stretch_ratio=None,
    loudness_scale_db=None,
    stretch_unvoiced=True,
    stretch_silence=True,
    save_grid=False
):
    """Edit and save (promonet/edit/core.py:181-229)"""
    results = from_file(
        loudness_file,
        pitch_file,
        periodicity_file,
        ppg_file,
        pitch_shift_cents,
        time_stretch_ratio,
        loudness_scale_db,
        stretch_unvoiced,
        stretch_silence,
        save_grid)
    viterbi = '-viterbi' if promonet_tpu.VITERBI_DECODE_PITCH else ''
    save = promonet_tpu.load.save_array
    save(f'{output_prefix}-loudness.npy', np.asarray(results[0]))
    save(f'{output_prefix}{viterbi}-pitch.npy', np.asarray(results[1]))
    save(f'{output_prefix}{viterbi}-periodicity.npy', np.asarray(results[2]))
    save(f'{output_prefix}-ppg.npy', np.asarray(results[3]))
    if save_grid:
        save(f'{output_prefix}-grid.npy', np.asarray(results[4]))


def from_files_to_files(
    loudness_files,
    pitch_files,
    periodicity_files,
    ppg_files,
    output_prefixes,
    pitch_shift_cents=None,
    time_stretch_ratio=None,
    loudness_scale_db=None,
    stretch_unvoiced=True,
    stretch_silence=True,
    save_grid=False
):
    """Edit multiple representations (promonet/edit/core.py:232-278)"""
    for args in zip(
        loudness_files, pitch_files, periodicity_files, ppg_files,
        output_prefixes
    ):
        from_file_to_file(
            *args,
            pitch_shift_cents=pitch_shift_cents,
            time_stretch_ratio=time_stretch_ratio,
            loudness_scale_db=loudness_scale_db,
            stretch_unvoiced=stretch_unvoiced,
            stretch_silence=stretch_silence,
            save_grid=save_grid)
