"""python -m promonet_tpu.edit (reference: promonet/edit/__main__.py)"""
from pathlib import Path

import promonet_tpu
from promonet_tpu.utils.cli import ArgumentParser


def parse_args():
    parser = ArgumentParser(description='Edit speech representation')
    parser.add_argument(
        '--loudness_files', type=Path, nargs='+', required=True,
        help='The loudness files to edit')
    parser.add_argument(
        '--pitch_files', type=Path, nargs='+', required=True,
        help='The pitch files to edit')
    parser.add_argument(
        '--periodicity_files', type=Path, nargs='+', required=True,
        help='The periodicity files to edit')
    parser.add_argument(
        '--ppg_files', type=Path, nargs='+', required=True,
        help='The phonetic posteriorgram files to edit')
    parser.add_argument(
        '--output_prefixes', type=Path, nargs='+', required=True,
        help='The locations to save output files, minus extension')
    parser.add_argument(
        '--pitch_shift_cents', type=float,
        help='Amount of pitch-shifting in cents')
    parser.add_argument(
        '--time_stretch_ratio', type=float,
        help='Amount of time-stretching. Faster when above one.')
    parser.add_argument(
        '--loudness_scale_db', type=float,
        help='Loudness scaling in decibels')
    parser.add_argument(
        '--stretch_unvoiced', action='store_true', default=True,
        help='If set, time-stretches unvoiced frames')
    parser.add_argument(
        '--no-stretch_unvoiced', dest='stretch_unvoiced',
        action='store_false',
        help='If set, does not time-stretch unvoiced frames')
    parser.add_argument(
        '--stretch_silence', action='store_true', default=True,
        help='If set, time-stretches silent frames')
    parser.add_argument(
        '--no-stretch_silence', dest='stretch_silence',
        action='store_false',
        help='If set, does not time-stretch silent frames')
    parser.add_argument(
        '--save_grid', action='store_true',
        help='If set, also saves the time-stretch grid')
    return parser.parse_args()


if __name__ == '__main__':
    promonet_tpu.edit.from_files_to_files(**vars(parse_args()))
