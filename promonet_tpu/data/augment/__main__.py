"""python -m promonet_tpu.data.augment (reference: promonet/data/augment/__main__.py)"""
import promonet_tpu
from promonet_tpu.utils.cli import ArgumentParser


def parse_args():
    parser = ArgumentParser(description='Augment datasets')
    parser.add_argument(
        '--datasets', nargs='+', default=promonet_tpu.DATASETS,
        help='The datasets to augment')
    return parser.parse_args()


if __name__ == '__main__':
    promonet_tpu.data.augment.datasets(**vars(parse_args()))
