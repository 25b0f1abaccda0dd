"""Metrics/observability sink.

Replaces torchutil.tensorboard.update (promonet/train/core.py:342-345,
375-407): scalars, audio, and figures logged per step. Writes TensorBoard
event files when the `tensorboard` package is available and always mirrors
scalars to a JSONL file so headless runs stay observable.
"""
import json
import time
from pathlib import Path

_writers = {}


def _tensorboard_writer(directory):
    key = str(directory)
    if key not in _writers:
        try:
            from torch.utils.tensorboard import SummaryWriter
            _writers[key] = SummaryWriter(log_dir=str(directory))
        except Exception:
            _writers[key] = None
    return _writers[key]


def update(
    directory,
    step,
    scalars=None,
    audio=None,
    sample_rate=None,
    figures=None
):
    """Log metrics for a step (API parity with torchutil.tensorboard.update)"""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    writer = _tensorboard_writer(directory)

    if scalars:
        record = {'step': int(step), 'time': time.time()}
        for name, value in scalars.items():
            value = float(value)
            record[name] = value
            if writer is not None:
                writer.add_scalar(name, value, int(step))
        with open(directory / 'metrics.jsonl', 'a') as file:
            file.write(json.dumps(record) + '\n')

    if writer is not None:
        if audio:
            for name, waveform in audio.items():
                import numpy as np
                array = np.asarray(waveform).reshape(-1, 1)
                writer.add_audio(name, array, int(step), sample_rate)
        if figures:
            for name, figure in figures.items():
                writer.add_figure(name, figure, int(step))
                try:
                    import matplotlib.pyplot as plt
                    plt.close(figure)
                except Exception:
                    pass

    if writer is not None:
        writer.flush()
