"""1-D grid-based resampling and interpolation-grid constructors.

Reference: promonet/edit/grid.py and the ppgs grid constructors it
delegates to. Sampling is a vectorized gather + lerp; fully jittable for
static grid lengths.
"""
import jax
import jax.numpy as jnp
import numpy as np


def sample(sequence, grid, method='linear'):
    """Grid-based sampling of sequence (..., T) at positions grid (N,)

    Matches the reference semantics (promonet/edit/grid.py:12-45): linear
    interpolation against integer sample positions with the final frame
    replicated, or nearest-neighbor rounding.
    """
    grid = jnp.asarray(grid)
    length = sequence.shape[-1]

    if method == 'linear':
        # Left/right integer neighbors; replicate the final frame so grids
        # that touch T-1 exactly (or overshoot slightly) stay in-bounds
        left = jnp.clip(jnp.floor(grid).astype(jnp.int32), 0, length - 1)
        right = jnp.minimum(left + 1, length - 1)
        offset = grid - left
        take_left = jnp.take(sequence, left, axis=-1)
        take_right = jnp.take(sequence, right, axis=-1)
        return take_left * (1 - offset) + take_right * offset

    if method == 'nearest':
        idx = jnp.clip(jnp.round(grid).astype(jnp.int32), 0, length - 1)
        return jnp.take(sequence, idx, axis=-1)

    raise ValueError(f'Grid sampling method {method} is not defined')


def constant(tensor, ratio):
    """Grid for constant-ratio time-stretching

    Length round(T / ratio), spanning [0, T - 1] uniformly (the ppgs
    constant-grid construction the reference delegates to at
    promonet/edit/grid.py:53-55).
    """
    length = tensor.shape[-1]
    target = int(round(length / ratio))
    return of_length(tensor, target)


def of_length(tensor, length):
    """Grid of a specified output length spanning the input uniformly

    Reference: promonet/edit/grid.py:67-69 (ppgs.edit.grid.of_length).
    """
    source = tensor.shape[-1]
    return jnp.linspace(0., source - 1, int(length), dtype=jnp.float32)


def masked_interp(values, mask):
    """Linearly interpolate `values` through positions where mask is False

    Static-shape replacement for np.interp over the masked domain (used
    to interpolate pitch through unvoiced regions on-device, mirroring
    penn's `interp_unvoiced_at`). Anchors are found with forward/backward
    cumulative extrema — no data-dependent shapes.
    """
    n = values.shape[-1]
    idx = jnp.arange(n)

    left = jax.lax.cummax(jnp.where(mask, idx, -1))
    right = jax.lax.cummin(jnp.where(mask, idx, n), reverse=True)

    # Fall back to the other side when one side has no anchor
    left_c = jnp.where(left < 0, right, left)
    right_c = jnp.where(right >= n, left_c, right)
    left_c = jnp.where(left < 0, right_c, left_c)

    left_v = values[jnp.clip(left_c, 0, n - 1)]
    right_v = values[jnp.clip(right_c, 0, n - 1)]
    span = right_c - left_c
    weight = jnp.where(
        span > 0, (idx - left_c) / jnp.maximum(span, 1), 0.)
    interpolated = left_v * (1 - weight) + right_v * weight
    return jnp.where(mask, values, interpolated)


def from_alignments(source, target, sample_rate, hopsize):
    """Grid that maps the frames of a source forced alignment onto a target

    Reference: promonet/edit/grid.py:58-64. Alignments are sequences of
    (start_seconds, end_seconds) phoneme intervals; both must contain the
    same number of phonemes. For each output frame (at the target's frame
    rate) we find the containing target phoneme and linearly map the
    within-phoneme position back to source frames.
    """
    source = np.asarray(source, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    assert source.shape == target.shape, \
        'Source and target alignments must have the same number of phonemes'

    frames_per_second = sample_rate / hopsize
    total_frames = int(round(target[-1, 1] * frames_per_second))
    times = (np.arange(total_frames) + 0.5) / frames_per_second

    # Containing target phoneme per output frame
    idx = np.clip(
        np.searchsorted(target[:, 1], times, side='left'),
        0,
        len(target) - 1)

    # Fractional position within the phoneme
    t0, t1 = target[idx, 0], target[idx, 1]
    s0, s1 = source[idx, 0], source[idx, 1]
    alpha = np.where(t1 > t0, (times - t0) / np.maximum(t1 - t0, 1e-9), 0.)
    source_times = s0 + alpha * (s1 - s0)

    grid = source_times * frames_per_second - 0.5
    return jnp.asarray(np.clip(grid, 0., None), dtype=jnp.float32)
