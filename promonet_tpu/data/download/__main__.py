"""python -m promonet_tpu.data.download (reference: promonet/data/download/__main__.py)"""
import promonet_tpu
from promonet_tpu.utils.cli import ArgumentParser


def parse_args():
    parser = ArgumentParser(description='Download and format datasets')
    parser.add_argument(
        '--datasets', nargs='+', default=promonet_tpu.DATASETS,
        help='The datasets to format')
    return parser.parse_args()


if __name__ == '__main__':
    promonet_tpu.data.download.datasets(**vars(parse_args()))
