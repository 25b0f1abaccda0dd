"""Multi-panel prosody figures.

Reference: promonet/plot/core.py — audio waveform, PPG, pitch,
periodicity, loudness panels with optional target overlays and red
per-frame error highlighting against the configured thresholds.
"""
import numpy as np

import promonet_tpu


def from_features(
    audio=None,
    loudness=None,
    pitch=None,
    periodicity=None,
    ppg=None,
    target_loudness=None,
    target_pitch=None,
    target_periodicity=None,
    target_ppg=None,
    features=None
):
    """Create the prosody figure (promonet/plot/core.py:158-283)"""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    if features is None:
        features = promonet_tpu.DEFAULT_PLOT_FEATURES
    available = {
        'audio': audio,
        'loudness': loudness,
        'pitch': pitch,
        'periodicity': periodicity,
        'ppg': ppg}
    panels = [f for f in features if available.get(f) is not None]
    if not panels:
        panels = [f for f in features if f in available]
    figure, axes = plt.subplots(
        len(panels), 1, figsize=(10, 2 * len(panels)), sharex=False)
    if len(panels) == 1:
        axes = [axes]

    for axis, name in zip(axes, panels):
        axis.set_ylabel(name)
        if name == 'audio' and audio is not None:
            axis.plot(np.asarray(audio).reshape(-1), linewidth=.5)
        elif name == 'loudness' and loudness is not None:
            values = np.asarray(loudness)
            if values.ndim > 1:
                values = values.mean(axis=-2)
            axis.plot(values.reshape(-1))
            if target_loudness is not None:
                target = np.asarray(target_loudness)
                if target.ndim > 1:
                    target = target.mean(axis=-2)
                target = target.reshape(-1)
                axis.plot(target, alpha=.5)
                _highlight(
                    axis,
                    np.abs(values.reshape(-1)[:len(target)] - target),
                    promonet_tpu.ERROR_THRESHOLD_LOUDNESS)
        elif name == 'pitch' and pitch is not None:
            values = np.asarray(pitch).reshape(-1)
            axis.plot(values)
            if target_pitch is not None:
                target = np.asarray(target_pitch).reshape(-1)
                axis.plot(target, alpha=.5)
                cents = 1200 * np.abs(
                    np.log2(values[:len(target)]) - np.log2(target))
                _highlight(axis, cents, promonet_tpu.ERROR_THRESHOLD_PITCH)
        elif name == 'periodicity' and periodicity is not None:
            values = np.asarray(periodicity).reshape(-1)
            axis.plot(values)
            if target_periodicity is not None:
                target = np.asarray(target_periodicity).reshape(-1)
                axis.plot(target, alpha=.5)
                _highlight(
                    axis,
                    np.abs(values[:len(target)] - target),
                    promonet_tpu.ERROR_THRESHOLD_PERIODICITY)
        elif name == 'ppg' and ppg is not None:
            axis.imshow(
                np.asarray(ppg),
                aspect='auto',
                origin='lower',
                interpolation='nearest')
    figure.tight_layout()
    return figure


def _highlight(axis, errors, threshold):
    """Shade frames whose error exceeds the threshold"""
    bad = np.where(errors > threshold)[0]
    for frame in bad:
        axis.axvspan(frame - .5, frame + .5, color='red', alpha=.15, lw=0)


def from_file_to_file(
    output_file,
    audio_file=None,
    prefix=None,
    target_prefix=None,
    features=None
):
    """Plot features from cache prefixes and save"""
    kwargs = {}
    if audio_file is not None:
        kwargs['audio'] = promonet_tpu.load.audio(audio_file)
    if prefix is not None:
        (
            kwargs['loudness'],
            kwargs['pitch'],
            kwargs['periodicity'],
            kwargs['ppg']
        ) = promonet_tpu.load.features(prefix)
    if target_prefix is not None:
        (
            kwargs['target_loudness'],
            kwargs['target_pitch'],
            kwargs['target_periodicity'],
            kwargs['target_ppg']
        ) = promonet_tpu.load.features(target_prefix)
    figure = from_features(features=features, **kwargs)
    figure.savefig(output_file, bbox_inches='tight', dpi=150)
    import matplotlib.pyplot as plt
    plt.close(figure)
