"""python -m promonet_tpu.partition (reference: promonet/partition/__main__.py)"""
import promonet_tpu
from promonet_tpu.utils.cli import ArgumentParser


def parse_args():
    parser = ArgumentParser(description='Partition datasets')
    parser.add_argument(
        '--datasets', nargs='+', default=promonet_tpu.DATASETS,
        help='The datasets to partition')
    return parser.parse_args()


if __name__ == '__main__':
    promonet_tpu.partition.datasets(parse_args().datasets)
