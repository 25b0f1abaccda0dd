"""Bucket-padded, device-resident feature arrays.

The inference pipeline (preprocess → edit → synthesize) pads every
variable-length feature to a bucketed frame count so a small set of
compiled programs serves arbitrary utterance lengths (SURVEY.md §5.7).
Before this wrapper existed each stage trimmed its outputs to the true
frame count and the next stage re-padded them — two eager device
dispatches per feature per stage, which dominated the end-to-end
latency on the tunneled TPU attachment (round 4: the fused single
program ran the SAME math 1.6x faster than the 3-call chain purely by
skipping the dispatch churn).

`PaddedFeature` keeps the BUCKET-shaped device array alive across
stages and carries the true frame count as metadata. Stages that
understand it consume `.data` directly (one jitted dispatch, programs
keyed on bucket sizes only — never on true lengths); everything else
sees the trimmed array through the standard protocols:

- `np.asarray(x)` / `.__array__`     → trimmed host numpy
- `jnp.asarray(x)` / `.__jax_array__` → trimmed device array
- `.shape` / `.ndim` / `.dtype` / `len` / indexing → true-length view

Invariant: the padded tail must be FINITE (it is never masked out on
device — the generator runs over the full bucket and the tail is
trimmed after download). Extractor outputs on zero-padded audio and
grid-sampled edits of those outputs satisfy this; anything synthesizing
a PaddedFeature from raw data must too.

No reference counterpart: the reference chains stages through exact-
length torch tensors (promonet/synthesize/core.py:209-281 pads inside
the model call instead).
"""
import jax.numpy as jnp
import numpy as np


class PaddedFeature:
    """A feature padded to a bucket along the last axis + true length."""

    __slots__ = ('data', 'frames')

    def __init__(self, data, frames):
        self.data = data
        self.frames = int(frames)

    # -- metadata ----------------------------------------------------------

    @property
    def bucket(self):
        return self.data.shape[-1]

    @property
    def shape(self):
        return (*self.data.shape[:-1], self.frames)

    @property
    def ndim(self):
        return self.data.ndim

    @property
    def dtype(self):
        return self.data.dtype

    def __len__(self):
        return self.shape[0]

    def __repr__(self):
        return (
            f'PaddedFeature(shape={self.shape}, bucket={self.bucket}, '
            f'dtype={self.dtype})')

    # -- materialization ---------------------------------------------------

    def trim(self):
        """The true-length device array (lazy slice)"""
        return self.data[..., :self.frames]

    def __array__(self, dtype=None, copy=None):
        array = np.asarray(self.trim())
        return array if dtype is None else array.astype(dtype)

    def __jax_array__(self):
        return self.trim()

    def __getitem__(self, index):
        return self.trim()[index]

    # Arithmetic/comparison operators delegate to the trimmed array so
    # feature consumers that scale/compare without an explicit asarray
    # still work. numpy ufuncs applied to a PaddedFeature operand (e.g.
    # np.log2(feature)) route here too and see trimmed data.
    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        inputs = tuple(
            x.trim() if isinstance(x, PaddedFeature) else x
            for x in inputs)
        return getattr(ufunc, method)(*inputs, **kwargs)

    def __add__(self, other):
        return self.trim() + other

    __radd__ = __add__

    def __sub__(self, other):
        return self.trim() - other

    def __rsub__(self, other):
        return other - self.trim()

    def __mul__(self, other):
        return self.trim() * other

    __rmul__ = __mul__

    def __truediv__(self, other):
        return self.trim() / other

    def __rtruediv__(self, other):
        return other / self.trim()

    def __neg__(self):
        return -self.trim()

    def __lt__(self, other):
        return self.trim() < other

    def __le__(self, other):
        return self.trim() <= other

    def __gt__(self, other):
        return self.trim() > other

    def __ge__(self, other):
        return self.trim() >= other


def as_padded(value, bucket=None):
    """Coerce an array (or PaddedFeature) to a bucket-padded feature.

    Host arrays are padded in numpy (single upload on first device use);
    device arrays pad with one device op. The pad replicates the final
    frame — NOT zeros — to keep the finite-tail invariant benign for
    log-domain consumers (zero pitch would be -inf in log space).
    """
    from ..data.collate import bucket_frames

    if isinstance(value, PaddedFeature):
        return value
    frames = value.shape[-1]
    if bucket is None:
        bucket = bucket_frames(frames)
    pad = bucket - frames
    width = [(0, 0)] * (value.ndim - 1) + [(0, pad)]
    if isinstance(value, np.ndarray):
        data = np.pad(value, width, mode='edge') if pad else value
    else:
        value = jnp.asarray(value)
        data = jnp.pad(value, width, mode='edge') if pad else value
    return PaddedFeature(data, frames)


def unwrap(*values):
    """Split PaddedFeatures into (data arrays, common true frames).

    Returns None if the values are not all PaddedFeatures sharing one
    (bucket, frames) pair — callers fall back to exact-length paths.
    """
    if not values or not all(
        isinstance(value, PaddedFeature) for value in values
    ):
        return None
    frames = {value.frames for value in values}
    buckets = {value.bucket for value in values}
    if len(frames) != 1 or len(buckets) != 1:
        return None
    return [value.data for value in values], frames.pop()
