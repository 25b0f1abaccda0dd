"""Per-stage wall decomposition of the api editing path (round 4).

The 3-call api chain (preprocess -> edit -> synthesize) straddles the
50x north star run-to-run (46.5x..58.2x measured). All three calls
dispatch asynchronously; the only hard syncs are the final audio
download and any host-side work between calls. This script times each
stage twice — async (dispatch only) and synced (jax.block_until_ready +
a materializing device_get) — so host overhead, device compute, and
download separate cleanly.

Usage: python scripts/api_triage.py [seconds]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import os
_RUN_CONFIG = Path(__file__).parent.parent / 'runs' / 'promonet' / 'synthetic.py'
_BENCH_CONFIG = Path(__file__).parent.parent / 'configs' / 'bench.py'
if 'PROMONET_TPU_CONFIG' not in os.environ and _RUN_CONFIG.exists():
    os.environ['PROMONET_TPU_CONFIG'] = ':'.join(
        [str(_RUN_CONFIG)] + ([str(_BENCH_CONFIG)] if _BENCH_CONFIG.exists() else []))

import jax
import numpy as np

import promonet_tpu


EDIT_KWARGS = dict(
    pitch_shift_cents=200.,
    time_stretch_ratio=1.414,
    loudness_scale_db=3.)


def materialize(tree):
    from promonet_tpu.ops.padded import PaddedFeature
    for leaf in jax.tree.leaves(tree, is_leaf=lambda x: isinstance(x, PaddedFeature)):
        if isinstance(leaf, PaddedFeature):
            leaf = leaf.data
        if isinstance(leaf, jax.Array):
            float(jax.device_get(leaf.ravel()[0]))


def main():
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from bench import make_audio

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 10.
    audio = make_audio(seconds, promonet_tpu.SAMPLE_RATE)

    def preprocess():
        return promonet_tpu.preprocess.from_audio(
            audio,
            features=('loudness', 'pitch', 'periodicity', 'ppg'),
            loudness_bands=None)

    def edit(features):
        return promonet_tpu.edit.from_features(*features, **EDIT_KWARGS)

    def synthesize(edited):
        return promonet_tpu.synthesize.from_features(*edited, speaker=0)

    # Warmup all programs
    out = synthesize(edit(preprocess()))
    np.asarray(out)

    for round_ in range(3):
        t0 = time.perf_counter()
        features = preprocess()
        t1 = time.perf_counter()
        materialize(features)
        t2 = time.perf_counter()
        edited = edit(features)
        t3 = time.perf_counter()
        materialize(edited)
        t4 = time.perf_counter()
        out = synthesize(edited)
        t5 = time.perf_counter()
        out = np.asarray(out)
        t6 = time.perf_counter()
        print(
            f'[{round_}] preprocess dispatch={1000*(t1-t0):6.1f} '
            f'sync={1000*(t2-t1):6.1f} | '
            f'edit dispatch={1000*(t3-t2):6.1f} sync={1000*(t4-t3):6.1f} | '
            f'synth dispatch={1000*(t5-t4):6.1f} '
            f'download={1000*(t6-t5):6.1f} | '
            f'synced_total={1000*(t6-t0):6.1f} ms',
            flush=True)

    # Fully-async chain (what bench measures): one sync at the end
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = np.asarray(synthesize(edit(preprocess())))
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    print(
        f'async chain: min={1000*wall:.1f} ms rtf={seconds/wall:.1f}x '
        f'(all {[round(1000*w) for w in walls]})',
        flush=True)


if __name__ == '__main__':
    from promonet_tpu.utils import pause
    with pause.exclusive(timeout=300.):
        main()
