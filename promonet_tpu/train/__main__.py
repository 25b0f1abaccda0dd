"""python -m promonet_tpu.train (reference: promonet/train/__main__.py)"""
import os
import shutil
from pathlib import Path

# Persistent XLA compilation cache: auto-resumed runs skip the
# multi-minute train-step/eval recompiles on restart
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '-1')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0')

import promonet_tpu
from promonet_tpu.utils.cli import ArgumentParser


def main():
    parser = ArgumentParser(description='Train a model')
    parser.add_argument(
        '--dataset', default=promonet_tpu.TRAINING_DATASET,
        help='The dataset to train on')
    parser.add_argument(
        '--train_partition', default='train',
        help='The partition to train on')
    parser.add_argument(
        '--valid_partition', default='valid',
        help='The partition to validate on')
    parser.add_argument(
        '--adapt_from', type=Path,
        help='A checkpoint to perform adaptation from')
    parser.add_argument(
        '--gpu', type=int, help='Unused (API parity); device is the TPU')
    args = parser.parse_args()

    directory = promonet_tpu.RUNS_DIR / promonet_tpu.CONFIG
    directory.mkdir(parents=True, exist_ok=True)

    # Copy configuration into the run directory
    # (reference: promonet/train/__main__.py:21-27). Resuming with
    # --config pointing at the run dir's own copy is a no-op, not an
    # error.
    for config in parser.config_paths:
        target = directory / Path(config).name
        if Path(config).resolve() != target.resolve():
            shutil.copyfile(config, target)

    promonet_tpu.train(
        directory,
        args.dataset,
        args.train_partition,
        args.valid_partition,
        args.adapt_from,
        args.gpu)


if __name__ == '__main__':
    main()
