"""python -m promonet_tpu.synthesize (reference: promonet/synthesize/__main__.py)"""
from pathlib import Path

import promonet_tpu
from promonet_tpu.utils.cli import ArgumentParser


def parse_args():
    parser = ArgumentParser(description='Synthesize speech from features')
    parser.add_argument(
        '--precompile', action='store_true',
        help='Warm the fused-edit programs for the hot bucket pairs '
             '(populates the persistent compile cache) and exit')
    parser.add_argument(
        '--loudness_files', type=Path, nargs='+',
        help='The loudness files')
    parser.add_argument(
        '--pitch_files', type=Path, nargs='+',
        help='The pitch files')
    parser.add_argument(
        '--periodicity_files', type=Path, nargs='+',
        help='The periodicity files')
    parser.add_argument(
        '--ppg_files', type=Path, nargs='+',
        help='The phonetic posteriorgram files')
    parser.add_argument(
        '--output_files', type=Path, nargs='+',
        help='The files to save the synthesized audio')
    parser.add_argument(
        '--speakers', type=int, nargs='+',
        help='The IDs of the speakers for voice conversion')
    parser.add_argument(
        '--spectral_balance_ratio', type=float, default=1.,
        help='> 1 for Alvin and the Chipmunks; < 1 for Patrick Star')
    parser.add_argument(
        '--loudness_ratio', type=float, default=1.,
        help='> 1 for louder; < 1 for quieter')
    parser.add_argument(
        '--checkpoint', type=Path, help='The generator checkpoint')
    parser.add_argument(
        '--gpu', type=int, help='Unused (API parity); device is the TPU')
    return parser.parse_args()


if __name__ == '__main__':
    args = vars(parse_args())
    if args.pop('precompile'):
        count = promonet_tpu.synthesize.precompile(
            checkpoint=args.get('checkpoint'))
        print(f'precompiled {count} fused-edit programs')
    else:
        required = (
            'loudness_files', 'pitch_files', 'periodicity_files',
            'ppg_files', 'output_files')
        missing = [name for name in required if args.get(name) is None]
        if missing:
            raise SystemExit(
                f'the following arguments are required: '
                + ', '.join(f'--{name}' for name in missing))
        promonet_tpu.synthesize.from_files_to_files(**args)
