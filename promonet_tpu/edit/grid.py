"""Interpolation grids for editing.

Reference: promonet/edit/grid.py (delegating to ppgs.edit.grid); here the
constructors live in ops/grid.py and are re-exported with the
configuration applied.
"""
import promonet_tpu
from ..ops import grid as _grid


def sample(sequence, grid, method='linear'):
    """Perform 1D grid-based sampling (promonet/edit/grid.py:12-45)"""
    return _grid.sample(sequence, grid, method)


def constant(tensor, ratio):
    """Create a grid for constant-ratio time-stretching"""
    return _grid.constant(tensor, ratio)


def from_alignments(source, target):
    """Create time-stretch grid converting source alignment to target"""
    return _grid.from_alignments(
        source,
        target,
        sample_rate=promonet_tpu.SAMPLE_RATE,
        hopsize=promonet_tpu.HOPSIZE)


def of_length(tensor, length):
    """Create time-stretch grid of a specified length"""
    return _grid.of_length(tensor, length)
