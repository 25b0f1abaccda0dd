"""python -m promonet_tpu.evaluate (reference: promonet/evaluate/__main__.py)"""
from pathlib import Path

import promonet_tpu
from promonet_tpu.utils.cli import ArgumentParser


def parse_args():
    parser = ArgumentParser(description='Perform objective evaluation')
    parser.add_argument(
        '--datasets', nargs='+',
        default=[promonet_tpu.TRAINING_DATASET],
        help='The datasets to evaluate')
    parser.add_argument(
        '--checkpoint', type=Path,
        help='The generator checkpoint to evaluate')
    parser.add_argument(
        '--gpu', type=int, help='Unused (API parity); device is the TPU')
    parser.add_argument(
        '--max_stems', type=int,
        help='Cap evaluated utterances per speaker (bounds wall clock)')
    parser.add_argument(
        '--adapt',
        action='store_true',
        default=None,
        help='Evaluate per-speaker adaptation partitions '
             '(reference: promonet/evaluate/core.py:97-108)')
    return parser.parse_args()


if __name__ == '__main__':
    promonet_tpu.evaluate.datasets(**vars(parse_args()))
