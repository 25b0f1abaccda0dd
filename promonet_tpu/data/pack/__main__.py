"""python -m promonet_tpu.data.pack (reference: promonet/data/pack/__main__.py)"""
from pathlib import Path

import promonet_tpu
from promonet_tpu.utils.cli import ArgumentParser


def parse_args():
    parser = ArgumentParser(
        description='Pack features into a single frame-rate tensor')
    parser.add_argument(
        '--prefixes', type=Path, nargs='+', required=True,
        help='The cache prefixes of the features to pack')
    parser.add_argument(
        '--output_files', type=Path, nargs='+', required=True,
        help='The files to save packed features (.npy or .csv)')
    parser.add_argument(
        '--speaker', type=int, default=0, help='The speaker index')
    return parser.parse_args()


if __name__ == '__main__':
    args = parse_args()
    for prefix, output_file in zip(args.prefixes, args.output_files):
        promonet_tpu.data.pack.from_file_to_file(
            prefix, output_file, speaker=args.speaker)
