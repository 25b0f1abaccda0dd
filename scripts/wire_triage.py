"""Tunnel wire-cost decomposition for the api editing chain (round 4).

Hypothesis: the api path's gap to the fused path (212 ms vs 96 ms for
10 s of audio) is transfer + per-dispatch host glue over the tunneled
attachment, not device compute (the generator forward is 11.5 ms
amortized). This measures, under an exclusive pause:
  1. upload/download bandwidth at waveform sizes, f32 vs i16 wire
  2. null-program dispatch round-trip (sync + async)
  3. the api chain with per-phase hard syncs

Usage: python scripts/wire_triage.py
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
import jax.numpy as jnp
import numpy as np

import promonet_tpu


EDIT_KWARGS = dict(
    pitch_shift_cents=200.,
    time_stretch_ratio=1.414,
    loudness_scale_db=3.)


def transfers():
    for n in (163840, 655360, 2621440):
        host = np.random.default_rng(0).standard_normal(n).astype(np.float32)
        dev = jax.device_put(host)
        dev.block_until_ready()
        for name, conv in (
            ('f32', lambda d: d),
            ('i16', lambda d: (d * 32767.).astype(jnp.int16)),
        ):
            arr = jax.jit(conv)(dev)
            arr.block_until_ready()
            walls = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(arr)
                walls.append(time.perf_counter() - t0)
            print(
                f'download n={n:8d} {name}: {min(walls)*1000:7.1f} ms '
                f'({arr.nbytes/1e6:.2f} MB)', flush=True)
        walls = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_put(host).block_until_ready()
            walls.append(time.perf_counter() - t0)
        print(f'upload   n={n:8d} f32: {min(walls)*1000:7.1f} ms', flush=True)

    f = jax.jit(lambda x: x + 1.)
    one = jax.device_put(np.float32(1.))
    f(one).block_until_ready()
    for label, sync in (('sync', True), ('async', False)):
        walls = []
        for _ in range(10):
            t0 = time.perf_counter()
            out = f(one)
            if sync:
                out.block_until_ready()
            walls.append(time.perf_counter() - t0)
        print(f'null dispatch {label}: {min(walls)*1000:7.2f} ms', flush=True)


def api_chain():
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from bench import make_audio

    audio = make_audio(10., promonet_tpu.SAMPLE_RATE)

    def preprocess():
        return promonet_tpu.preprocess.from_audio(
            audio,
            features=('loudness', 'pitch', 'periodicity', 'ppg'),
            loudness_bands=None)

    def sync_tree(tree):
        from promonet_tpu.ops.padded import PaddedFeature
        for leaf in jax.tree.leaves(
            tree, is_leaf=lambda x: isinstance(x, PaddedFeature)
        ):
            if isinstance(leaf, PaddedFeature):
                leaf = leaf.data
            if isinstance(leaf, jax.Array):
                leaf.block_until_ready()

    # Warmup
    features = preprocess()
    edited = promonet_tpu.edit.from_features(*features, **EDIT_KWARGS)
    out = promonet_tpu.synthesize.from_features(*edited, speaker=0)
    np.asarray(out)

    for round_ in range(3):
        t0 = time.perf_counter()
        features = preprocess()
        sync_tree(features)
        t1 = time.perf_counter()
        edited = promonet_tpu.edit.from_features(*features, **EDIT_KWARGS)
        sync_tree(edited)
        t2 = time.perf_counter()
        out = promonet_tpu.synthesize.from_features(*edited, speaker=0)
        t3 = time.perf_counter()
        np.asarray(out)
        t4 = time.perf_counter()
        print(
            f'[{round_}] preprocess={1000*(t1-t0):6.1f} '
            f'edit={1000*(t2-t1):6.1f} synth={1000*(t3-t2):6.1f} '
            f'final_asarray={1000*(t4-t3):6.1f} '
            f'total={1000*(t4-t0):6.1f} ms', flush=True)

    # The async-chained e2e (what bench times)
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = promonet_tpu.synthesize.from_features(
            *promonet_tpu.edit.from_features(*preprocess(), **EDIT_KWARGS),
            speaker=0)
        np.asarray(out)
        walls.append(time.perf_counter() - t0)
    print(f'async e2e: min={1000*min(walls):.1f} ms '
          f'(all {[round(1000*w) for w in walls]})', flush=True)


if __name__ == '__main__':
    from promonet_tpu.utils import pause
    t0 = time.time()
    with pause.exclusive(timeout=600.) as acked:
        print(f'pause acked: {acked} after {time.time()-t0:.0f}s', flush=True)
        transfers()
        api_chain()
