"""Pack features into a single frame-rate tensor for DAW / export use.

Reference: promonet/data/pack/core.py — 8 loudness bands + pitch +
periodicity + 40 PPG + speaker + 2 ratios = 52 channels, with CSV export
carrying frame timecodes.
"""
import numpy as np

import promonet_tpu
from ...models.export import labels, pack_features as _pack


def from_features(
    loudness,
    pitch,
    periodicity,
    ppg,
    speaker=0,
    spectral_balance_ratio=1.,
    loudness_ratio=1.
):
    """Pack features → (B, 52, T) (promonet/data/pack/core.py:33-90)"""
    import jax.numpy as jnp
    loudness = jnp.asarray(loudness)
    if loudness.ndim == 2:
        loudness = loudness[None]
    pitch = jnp.asarray(pitch).reshape(1, -1)
    periodicity = jnp.asarray(periodicity).reshape(1, -1)
    ppg = jnp.asarray(ppg)
    if ppg.ndim == 2:
        ppg = ppg[None]
    return _pack(
        loudness,
        pitch,
        periodicity,
        ppg,
        jnp.asarray([speaker]),
        jnp.asarray([spectral_balance_ratio]),
        jnp.asarray([loudness_ratio]))


def from_file_to_file(prefix, output_file, **kwargs):
    """Pack features from a cache prefix and save (.npy or .csv)"""
    loudness, pitch, periodicity, ppg = promonet_tpu.load.features(prefix)
    packed = np.asarray(
        from_features(loudness, pitch, periodicity, ppg, **kwargs))[0]
    output_file = str(output_file)
    if output_file.endswith('.csv'):
        frames = packed.shape[-1]
        times = np.arange(frames) * (
            promonet_tpu.HOPSIZE / promonet_tpu.SAMPLE_RATE)
        header = 'time,' + ','.join(labels())
        rows = np.concatenate([times[None], packed], axis=0).T
        np.savetxt(
            output_file, rows, delimiter=',', header=header, comments='')
    else:
        promonet_tpu.load.save_array(output_file, packed)
