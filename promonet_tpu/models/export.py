"""Model export for deployment.

TPU-native equivalent of the reference's torchscript export path
(promonet/model/export/core.py, promonet/model/generator.py:203-422):
features are packed into a single frame-rate tensor, inference over that
tensor is jitted, and the program is serialized as portable StableHLO via
`jax.export` alongside the parameters.
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import promonet_tpu


###############################################################################
# Packed features
###############################################################################


def labels():
    """Semantic labels for packed input channels

    Reference: promonet/model/generator.py:225-253.
    """
    names = [f'loudness-{i}' for i in range(promonet_tpu.LOUDNESS_BANDS)]
    names += ['pitch', 'periodicity']
    names += [f'ppg-{i}' for i in range(promonet_tpu.PPG_CHANNELS)]
    names += ['speaker', 'spectral balance', 'loudness ratio']
    return names


def pack_features(
    loudness,
    pitch,
    periodicity,
    ppg,
    speakers,
    spectral_balance_ratios,
    loudness_ratios
):
    """Pack features into one (B, C, T) frame-rate tensor

    Reference: promonet/model/generator.py:255-309. Loudness is
    band-averaged; scalar conditioning is broadcast over frames.
    """
    from .generator import _band_average
    frames = loudness.shape[-1]
    averaged = _band_average(loudness, promonet_tpu.LOUDNESS_BANDS)
    ppg = promonet_tpu.ops.sparse.sparsify(
        ppg,
        promonet_tpu.SPARSE_PPG_METHOD,
        promonet_tpu.SPARSE_PPG_THRESHOLD)

    def broadcast(x):
        return jnp.broadcast_to(
            x[:, None, None].astype(jnp.float32),
            (x.shape[0], 1, frames))

    return jnp.concatenate(
        [
            averaged,
            pitch[:, None],
            periodicity[:, None],
            ppg,
            broadcast(speakers),
            broadcast(spectral_balance_ratios),
            broadcast(loudness_ratios),
        ],
        axis=1)


def unpack_features(x):
    """Unpack a (B, C, T) packed tensor

    Reference: promonet/model/generator.py:373-422.
    """
    i = 0
    loudness = x[:, i:i + promonet_tpu.LOUDNESS_BANDS]
    i += promonet_tpu.LOUDNESS_BANDS
    pitch = x[:, i]
    i += 1
    periodicity = x[:, i]
    i += 1
    ppg = x[:, i:i + promonet_tpu.PPG_CHANNELS]
    i += promonet_tpu.PPG_CHANNELS
    speakers = x[:, i, 0].astype(jnp.int32)
    i += 1
    spectral_balance_ratios = x[:, i, 0]
    i += 1
    loudness_ratios = x[:, i, 0]
    return (
        loudness,
        pitch,
        periodicity,
        ppg,
        speakers,
        spectral_balance_ratios,
        loudness_ratios)


def packed_inference(model, params, x):
    """Synthesize from packed features (promonet/model/generator.py:311-343)

    Note: the packed loudness is already band-averaged, so it enters the
    generator's band-average as an (almost) identity reduction.
    """
    (
        loudness,
        pitch,
        periodicity,
        ppg,
        speakers,
        spectral_balance_ratios,
        loudness_ratios
    ) = unpack_features(x)
    return model.apply(
        params,
        loudness,
        pitch,
        periodicity,
        ppg,
        speakers,
        spectral_balance_ratios,
        loudness_ratios)


###############################################################################
# Export
###############################################################################


def from_file_to_file(checkpoint, output_file, buffer_size=8192):
    """Export a jitted packed-inference program + parameters

    Writes `<output_file>.stablehlo` (serialized jax.export artifact) and
    `<output_file>.params` (orbax checkpoint). Includes the reference's
    shape self-check (promonet/model/generator.py:363-368).
    """
    import promonet_tpu.synthesize

    model = promonet_tpu.models.Generator.create()
    params = promonet_tpu.synthesize.load_params(checkpoint)

    num_channels = len(labels())
    frames = buffer_size // promonet_tpu.HOPSIZE

    def infer(x):
        return packed_inference(model, params, x)

    # Self-check
    x = np.zeros((1, num_channels, frames), np.float32)
    y = jax.jit(infer)(x)
    assert y.shape == (1, 1, buffer_size) and y.dtype == jnp.float32

    output_file = Path(output_file)
    exported = jax.export.export(jax.jit(infer))(
        jax.ShapeDtypeStruct((1, num_channels, frames), jnp.float32))
    output_file.with_suffix('.stablehlo').write_bytes(exported.serialize())
    promonet_tpu.utils.checkpoint.save(
        output_file.with_suffix('.params'), params)
    return output_file


def _main():
    """python -m promonet_tpu.models.export

    Reference: promonet/model/export/__main__.py.
    """
    from promonet_tpu.utils.cli import ArgumentParser
    parser = ArgumentParser(description='Export a model for deployment')
    parser.add_argument(
        '--checkpoint', type=Path, required=True,
        help='The generator checkpoint to export')
    parser.add_argument(
        '--output_file', type=Path, required=True,
        help='The export path, minus extension')
    args = parser.parse_args()
    from_file_to_file(args.checkpoint, args.output_file)


if __name__ == '__main__':
    _main()
