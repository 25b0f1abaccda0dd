"""python -m promonet_tpu.preprocess (reference: promonet/preprocess/__main__.py)"""
from pathlib import Path

import promonet_tpu
from promonet_tpu.utils.cli import ArgumentParser


def parse_args():
    parser = ArgumentParser(description='Preprocess')
    parser.add_argument(
        '--files', type=Path, nargs='+', required=True,
        help='Audio files to preprocess')
    parser.add_argument(
        '--output_prefixes', type=Path, nargs='+',
        help='Files to save features, minus extension')
    parser.add_argument(
        '--features', nargs='+',
        default=['loudness', 'pitch', 'periodicity', 'ppg'],
        help='The features to preprocess')
    parser.add_argument(
        '--gpu', type=int, help='Unused (API parity); device is the TPU')
    return parser.parse_args()


if __name__ == '__main__':
    promonet_tpu.preprocess.from_files_to_files(**vars(parse_args()))
