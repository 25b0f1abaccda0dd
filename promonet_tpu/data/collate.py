"""Batch collation.

Reference: promonet/data/collate.py (sort by length, zero-pad to max).
For TPU, padding targets are bucketed frame counts so XLA compiles a
bounded set of shapes (SURVEY.md §5.7); training batches are fixed-size
chunks and need no padding.
"""
import contextlib

import numpy as np

import promonet_tpu

# Scoped ladder override (see bucket_ladder). A plain module global —
# not a contextvar — because the consumers fan work over THREAD pools
# (evaluate/core.py) and worker threads do not inherit the submitting
# thread's context.
_LADDER_OVERRIDE = None


def bucket_frames(frames):
    """Smallest configured bucket that fits `frames`"""
    ladder = _LADDER_OVERRIDE or promonet_tpu.INFERENCE_FRAME_BUCKETS
    for bucket in ladder:
        if frames <= bucket:
            return bucket
    return frames


@contextlib.contextmanager
def bucket_ladder(buckets):
    """Scope a coarse bucket ladder for everything inside the block.

    The dense MXU-aligned default ladder minimizes padded compute per
    call, but every distinct (bucket) — and for editing, (input bucket,
    output bucket) pair — compiles its own program. The offline
    evaluation compiles a whole corpus' worth of first-encounters inside
    its timed warmup (round 4: 1047 s); scoping a 2-4 rung ladder sized
    to the corpus maximum collapses the program count while the extra
    padded frames cost microseconds next to per-dispatch latency.
    """
    global _LADDER_OVERRIDE
    previous = _LADDER_OVERRIDE
    _LADDER_OVERRIDE = tuple(sorted(buckets))
    try:
        yield
    finally:
        _LADDER_OVERRIDE = previous


def collate(items, pad_to_bucket=True):
    """Collate items (dicts from Dataset) into a batch dict of arrays

    Layouts match the reference batch tuple
    (promonet/data/collate.py:11-107): features padded to a common frame
    count, audio to the matching sample count.
    """
    # Sort by length, descending
    items = sorted(
        items, key=lambda item: item['pitch'].shape[-1], reverse=True)
    max_frames = items[0]['pitch'].shape[-1]
    if pad_to_bucket:
        max_frames = bucket_frames(max_frames)
    max_samples = max_frames * promonet_tpu.HOPSIZE

    def pad(x, target):
        width = [(0, 0)] * (x.ndim - 1) + [(0, target - x.shape[-1])]
        return np.pad(x, width)

    batch = {
        'text': [item['text'] for item in items],
        'stems': [item['stems'] for item in items],
        'lengths': np.asarray(
            [item['pitch'].shape[-1] for item in items], np.int32),
    }
    for key in ('loudness', 'ppg', 'spectrograms'):
        batch[key] = np.stack(
            [pad(item[key], max_frames) for item in items])
    for key in ('pitch', 'periodicity'):
        batch[key] = np.stack(
            [pad(item[key], max_frames) for item in items])
    batch['audio'] = np.stack(
        [pad(item['audio'][..., :max_samples], max_samples)
         for item in items])
    batch['speakers'] = np.stack([item['speakers'] for item in items])
    for key in ('spectral_balance_ratios', 'loudness_ratios'):
        batch[key] = np.stack([item[key] for item in items])
    return batch
