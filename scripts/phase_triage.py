"""Device-time decomposition of the api editing chain (round 4).

wire_triage.py established: download free, upload ~16 MB/s, sync RTT
27 ms, async dispatch ~0. The api chain (228 ms for 10 s of audio) then
splits as upload (~55) + device compute (~146) + final sync (27). This
measures where the compute goes:
  1. pipelining: N async null dispatches then one sync — RTT or N*RTT?
  2. each program's pure device wall via hot synced repeats with
     device-resident inputs (upload excluded)
  3. the fused single-dispatch program for comparison

Usage: python scripts/phase_triage.py
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


def timed(label, fn, repeat=5):
    fn()  # warm
    walls = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    print(f'{label:32s} {1000*min(walls):7.1f} ms '
          f'(all {[round(1000*w, 1) for w in walls]})', flush=True)
    return min(walls)


def main():
    from bench import make_audio
    from promonet_tpu.ops.padded import PaddedFeature

    audio = make_audio(10., promonet_tpu.SAMPLE_RATE)

    # 1. Pipelining probe
    f = jax.jit(lambda x: x + 1.)
    one = jax.device_put(np.float32(1.))
    f(one).block_until_ready()
    for n in (1, 5, 10):
        def chain():
            out = one
            for _ in range(n):
                out = f(out)
            out.block_until_ready()
        timed(f'null chain n={n}', chain)

    # 2. Per-program device walls, inputs resident
    features = promonet_tpu.preprocess.from_audio(
        audio,
        features=('loudness', 'pitch', 'periodicity', 'ppg'),
        loudness_bands=None)
    audio_dev = jax.device_put(
        np.pad(audio, ((0, 0), (0, features[1].data.shape[-1] *
                                promonet_tpu.HOPSIZE - audio.shape[-1])))
        if features[1].data.shape[-1] * promonet_tpu.HOPSIZE > audio.shape[-1]
        else audio)
    audio_dev.block_until_ready()

    from promonet_tpu.preprocess import core as pre_core
    decoder = 'viterbi' if promonet_tpu.VITERBI_DECODE_PITCH else 'argmax'
    interp = (None if promonet_tpu.VITERBI_DECODE_PITCH
              else promonet_tpu.VOICING_THRESHOLD)
    ppg_params = promonet_tpu.preprocess.ppg._model()[1]
    feats = ('loudness', 'pitch', 'periodicity', 'ppg')

    def extract():
        out = pre_core._fused_jit(
            audio_dev, ppg_params, feats, None, decoder, interp)
        jax.block_until_ready(out)
    timed('extract program', extract)

    # Sub-programs of extract: pitch-only vs ppg-only vs loudness-only
    for sub in (('pitch', 'periodicity'), ('ppg',), ('loudness',)):
        def run(sub=sub):
            out = pre_core._fused_jit(
                audio_dev, ppg_params if 'ppg' in sub else {}, sub,
                None, decoder, interp)
            jax.block_until_ready(out)
        timed(f'extract[{"+".join(sub)}]', run)

    def edit():
        out = promonet_tpu.edit.from_features(*features, **EDIT_KWARGS)
        jax.block_until_ready([
            leaf.data if isinstance(leaf, PaddedFeature) else leaf
            for leaf in out])
    timed('edit program', edit)

    edited = promonet_tpu.edit.from_features(*features, **EDIT_KWARGS)

    def synth():
        out = promonet_tpu.synthesize.from_features(*edited, speaker=0)
        np.asarray(out)
    timed('synth program (+download)', synth)

    # 3. Fused single-dispatch for comparison
    def fused():
        out = promonet_tpu.synthesize.from_edited_audio(
            audio, speaker=0, **EDIT_KWARGS)
        np.asarray(out)
    timed('fused single dispatch', fused)

    # 4. Honest api chain
    def api():
        feats_ = promonet_tpu.preprocess.from_audio(
            audio,
            features=('loudness', 'pitch', 'periodicity', 'ppg'),
            loudness_bands=None)
        ed = promonet_tpu.edit.from_features(*feats_, **EDIT_KWARGS)
        np.asarray(promonet_tpu.synthesize.from_features(*ed, speaker=0))
    timed('api e2e', api)


if __name__ == '__main__':
    from promonet_tpu.utils import pause
    t0 = time.time()
    with pause.exclusive(timeout=600.) as acked:
        print(f'pause acked: {acked} after {time.time()-t0:.0f}s', flush=True)
        main()
