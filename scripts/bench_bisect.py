"""Bisect the bench warmup hang: which phase wedges the attachment?

Phases, each printed before starting so a timeout shows the culprit:
  1. attach              (jax.devices)
  2. tiny-exec           (1-element add, executes on chip)
  3. preprocess-compile  (AOT compile of the fused extractor, no exec)
  4. preprocess-exec     (run preprocess.from_audio)
  5. generator-exec      (run synthesize.from_features)
Run under the pause protocol like bench.py does.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

START = time.time()


def phase(name):
    print(f'[bisect +{time.time() - START:6.1f}s] {name}', flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import promonet_tpu as p

    phase('attach')
    jax.devices()

    phase('tiny-exec')
    print('  1+1 =', int(jax.device_get(
        jax.jit(lambda x: x + 1)(jnp.ones((), jnp.int32)))))

    sr = p.SAMPLE_RATE
    t = np.arange(int(4. * sr)) / sr
    audio = (0.3 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)[None]

    phase('preprocess-exec')
    feats = p.preprocess.from_audio(
        audio,
        features=('loudness', 'pitch', 'periodicity', 'ppg'),
        loudness_bands=None)
    print('  pitch mean', float(np.asarray(feats[1]).mean()))

    phase('generator-exec')
    out = p.synthesize.from_features(*feats, speaker=0)
    print('  out shape', np.asarray(out).shape)

    phase('done')


if __name__ == '__main__':
    from promonet_tpu.utils import pause
    with pause.exclusive(timeout=240.) as acked:
        print('acked:', acked, flush=True)
        main()
