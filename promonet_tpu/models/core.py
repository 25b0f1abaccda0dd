"""Shared model utilities.

Reference: promonet/model/core.py. Segment slicing is vectorized
(vmap over per-example start indices) instead of the reference's Python
loop.
"""
import jax
import jax.numpy as jnp

from .modules import get_padding  # noqa: F401 — re-export (promonet/model/core.py:9-11)


def slice_segments(segments, start_indices, segment_size, fill_value=0.):
    """Slice fixed-size windows along the last axis, one start per example

    Negative starts are left-padded with `fill_value`
    (promonet/model/core.py:23-40).
    """

    def slice_one(segment, start):
        # Shift so negative starts read padding
        padded = jnp.concatenate(
            [
                jnp.full(
                    (*segment.shape[:-1], segment_size),
                    fill_value,
                    segment.dtype),
                segment
            ],
            axis=-1)
        return jax.lax.dynamic_slice_in_dim(
            padded,
            jnp.maximum(start + segment_size, 0),
            segment_size,
            axis=-1)

    return jax.vmap(slice_one)(segments, start_indices)


def random_slice_segments(segments, lengths, segment_size, key):
    """Randomly slice segments along the last axis

    Reference: promonet/model/core.py:14-20.
    """
    max_start = lengths - segment_size + 1
    uniform = jax.random.uniform(key, (segments.shape[0],))
    start_indices = (uniform * max_start).astype(jnp.int32)
    return slice_segments(segments, start_indices, segment_size), start_indices
