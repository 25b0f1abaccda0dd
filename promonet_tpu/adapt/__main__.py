"""python -m promonet_tpu.adapt (reference: promonet/adapt/__main__.py)"""
from pathlib import Path

import promonet_tpu
from promonet_tpu.utils.cli import ArgumentParser


def parse_args():
    parser = ArgumentParser(description='Perform speaker adaptation')
    parser.add_argument(
        '--name', required=True,
        help='The name of the speaker')
    parser.add_argument(
        '--files', type=Path, nargs='+', required=True,
        help='The audio files of the target speaker')
    parser.add_argument(
        '--checkpoint', type=Path,
        help='The base generator checkpoint to adapt from')
    parser.add_argument(
        '--gpu', type=int, help='Unused (API parity); device is the TPU')
    return parser.parse_args()


if __name__ == '__main__':
    promonet_tpu.adapt.speaker(**vars(parse_args()))
