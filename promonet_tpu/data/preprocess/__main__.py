"""python -m promonet_tpu.data.preprocess (reference: promonet/data/preprocess/__main__.py)"""
import promonet_tpu
from promonet_tpu.utils.cli import ArgumentParser


def parse_args():
    parser = ArgumentParser(description='Preprocess datasets')
    parser.add_argument(
        '--datasets', nargs='+', default=promonet_tpu.DATASETS,
        help='The datasets to preprocess')
    parser.add_argument(
        '--features', nargs='+',
        help='The features to preprocess')
    parser.add_argument(
        '--gpu', type=int, help='Unused (API parity); device is the TPU')
    return parser.parse_args()


if __name__ == '__main__':
    promonet_tpu.data.preprocess.datasets(**vars(parse_args()))
