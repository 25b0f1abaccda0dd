"""Promote the newest flagship checkpoint to a params-only release.

The flagship run directory's full checkpoints (params + opt_state) are
gitignored; the committed release checkpoint under
`runs/promonet/release/` is the params/step/epoch subset that
`scripts/train_flagship.sh` warm-starts from after a host wipe and that
`promonet_tpu.synthesize` resolves as the run's generator (the
reference's analogue is the published `generator-00800000.pt`,
/root/reference/promonet/synthesize/core.py:234-237).

CPU-only: orbax restore + re-save, no TPU attachment.

Usage: JAX_PLATFORMS=cpu python scripts/promote_release.py [--run runs/promonet]
"""
import argparse
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from promonet_tpu.utils import checkpoint  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--run', type=Path, default=REPO / 'runs/promonet')
    parser.add_argument(
        '--keep', type=int, default=1,
        help='number of release checkpoints to keep (newest first)')
    args = parser.parse_args()

    latest = checkpoint.latest_path(args.run)
    if latest is None:
        sys.exit(f'no readable checkpoint under {args.run}')
    step = int(latest.name.split('-')[-1])

    release_dir = args.run / 'release'
    target = release_dir / latest.name
    if target.exists():
        print(f'release {target} already exists; nothing to do')
        return

    payload = checkpoint.load(latest)
    checkpoint.save(
        target,
        payload['params'],
        step=payload.get('step', step),
        epoch=payload.get('epoch', 0))
    print(f'promoted {latest} -> {target}')

    # Keep only the newest releases in the working tree (older ones
    # remain in git history)
    releases = sorted(
        (p for p in release_dir.glob('generator-*') if p.is_dir()),
        key=lambda p: int(p.name.split('-')[-1]),
        reverse=True)
    for stale in releases[args.keep:]:
        shutil.rmtree(stale)
        print(f'pruned {stale}')


if __name__ == '__main__':
    main()
