"""Checkpointing with the reference's directory/glob/auto-resume semantics.

Replaces torchutil.checkpoint (promonet/train/core.py:70-100,426-438):
checkpoints are directories named `<prefix>-<step:08d>` containing an orbax
pytree of (params, opt_state, step, epoch); `latest_path` glob-resolves the
most recent one for auto-resume.
"""
import re
from pathlib import Path

import numpy as np
import orbax.checkpoint as ocp


def save(path, params, opt_state=None, step=0, epoch=0, **extra):
    """Save a checkpoint to `path` (a directory)"""
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        'params': params,
        'step': np.asarray(step),
        'epoch': np.asarray(epoch),
    }
    if opt_state is not None:
        payload['opt_state'] = opt_state
    payload.update(extra)
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, payload, force=True)
    checkpointer.wait_until_finished()


def top_level_keys(path):
    """Top-level pytree keys of a checkpoint without loading arrays

    Distinguishes full training checkpoints (params/opt_state/step/epoch)
    from release checkpoints (params/step/epoch only).
    """
    metadata = ocp.PyTreeCheckpointer().metadata(Path(path).absolute())
    return set(metadata.item_metadata.keys())


def load(path, template=None):
    """Load a checkpoint; returns the saved pytree

    If `template` (a matching pytree of arrays) is given, restoration
    preserves its structure/dtypes; otherwise orbax restores as saved.
    """
    import logging

    path = Path(path).absolute()
    checkpointer = ocp.StandardCheckpointer()
    if template is not None:
        return checkpointer.restore(path, template)
    # Template-free restore is intentional here (the payload layout is
    # ours); scope-silence orbax's advisory warning about it
    absl_logger = logging.getLogger('absl')
    level = absl_logger.level
    absl_logger.setLevel(logging.ERROR)
    try:
        return checkpointer.restore(path)
    finally:
        absl_logger.setLevel(level)


def readable(path):
    """True if the checkpoint's metadata parses (i.e. the write committed)

    A process killed mid-save leaves either an orbax tmp directory (name
    does not match the step pattern) or, on non-atomic filesystems, a
    truncated tree; both fail the metadata read.
    """
    try:
        return bool(top_level_keys(path))
    except Exception:
        return False


def prune(directory, keep_interval=20000, keep_latest=3,
          prefixes=('generator', 'discriminator')):
    """Delete old checkpoints to bound run-directory growth.

    A dense CHECKPOINT_INTERVAL (cheap orbax writes, restart-loss
    insurance) would otherwise accumulate ~600 MB per step multiple.
    Keeps the `keep_latest` newest checkpoints of each prefix plus
    every `keep_interval` multiple (the reference's own checkpoint
    cadence, promonet/config/defaults.py:287).
    """
    import shutil

    directory = Path(directory)
    if not directory.exists():
        return
    for prefix in prefixes:
        pattern = re.compile(f'^{prefix}-(\\d+)$')
        entries = sorted(
            (int(m.group(1)), e)
            for e in directory.iterdir()
            if (m := pattern.match(e.name)))
        for step, entry in entries[:-keep_latest or None]:
            if keep_interval and step % keep_interval == 0:
                continue
            shutil.rmtree(entry, ignore_errors=True)


def latest_path(directory, prefix='generator-*'):
    """Resolve the newest READABLE checkpoint for auto-resume

    Reference: torchutil.checkpoint.latest_path usage at
    promonet/train/core.py:70-75. Unlike the reference, a corrupted
    latest checkpoint (crash mid-write) is skipped in favor of the
    newest one that still loads, so auto-resume survives hard kills.
    """
    directory = Path(directory)
    if not directory.exists():
        return None
    pattern = re.compile(
        '^' + prefix.replace('*', r'(\d+)') + '$')
    candidates = []
    for entry in directory.iterdir():
        match = pattern.match(entry.name)
        if match:
            candidates.append((int(match.group(1)), entry))
    for _, entry in sorted(candidates, reverse=True):
        if readable(entry):
            return entry
    return None
