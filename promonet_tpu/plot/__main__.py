"""python -m promonet_tpu.plot (reference: promonet/plot/__main__.py)"""
from pathlib import Path

import promonet_tpu
from promonet_tpu.utils.cli import ArgumentParser


def parse_args():
    parser = ArgumentParser(description='Plot speech representation')
    parser.add_argument(
        '--output_file', type=Path, required=True,
        help='The file to save the figure')
    parser.add_argument(
        '--audio_file', type=Path,
        help='The audio file to plot')
    parser.add_argument(
        '--prefix', type=Path,
        help='The cache prefix of the features to plot')
    parser.add_argument(
        '--target_prefix', type=Path,
        help='The cache prefix of target features to overlay')
    parser.add_argument(
        '--features', nargs='+',
        default=promonet_tpu.DEFAULT_PLOT_FEATURES,
        help='The features to plot')
    return parser.parse_args()


if __name__ == '__main__':
    promonet_tpu.plot.from_file_to_file(**vars(parse_args()))
