"""A/B the stride-1 conv lowering at INFERENCE shapes (round 5).

VERDICT r4 weak #4: batch-4 generator MFU (0.111) is LOWER than batch-1
(0.240) — serving throughput does not scale with batch. Hypothesis: the
shifted-dots lowering (conv as k time-shifted matmuls) materializes k
shifted activation copies; at the post-upsample sample rate (~220k
samples x 64ch at 10 s audio) that HBM traffic scales with batch and
saturates bandwidth, while the native conv lowering keeps one activation.

This times the generator forward at batch {1, 4} under each lowering
('shifted' vs 'xla') at the bench workload (10 s / 862 frames), holding
exclusive device access. Results decide a batch-conditional lowering in
models/modules.py.

Usage: python scripts/infer_lowering_ab.py [frames]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

_RUN = Path(__file__).parent.parent / 'runs' / 'promonet' / 'synthetic.py'
_BENCH = Path(__file__).parent.parent / 'configs' / 'bench.py'
if 'PROMONET_TPU_CONFIG' not in os.environ and _RUN.exists():
    os.environ['PROMONET_TPU_CONFIG'] = f'{_RUN}:{_BENCH}'

import jax
import jax.numpy as jnp

import promonet_tpu
from promonet_tpu.models.modules import conv_lowering
from promonet_tpu.train.core import example_batch, generator_args


def bench_forward(model, params, args, lowering, repeat=30):
    """Per-forward wall of `repeat` chained forwards under `lowering`"""
    with conv_lowering(lowering):

        @jax.jit
        def chained(loudness, pitch, *rest):
            def body(carry, _):
                out = model.apply(
                    params, loudness, pitch + carry * 1e-20, *rest)
                return jnp.mean(out), None
            carry, _ = jax.lax.scan(
                body, jnp.float32(0.), None, length=repeat)
            return carry

        t0 = time.perf_counter()
        float(jax.device_get(chained(*args)))
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            start = time.perf_counter()
            float(jax.device_get(chained(*args)))
            walls.append((time.perf_counter() - start) / repeat)
    return min(walls), compile_s


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 862
    model = promonet_tpu.models.Generator.create()
    results = {}
    for batch_size in (1, 4):
        batch = example_batch(batch_size, frames)
        args = generator_args(batch)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
        for lowering in ('shifted', 'xla'):
            wall, compile_s = bench_forward(model, params, args, lowering)
            results[(batch_size, lowering)] = wall
            audio_s = frames * promonet_tpu.HOPSIZE / promonet_tpu.SAMPLE_RATE
            print(
                f'batch={batch_size} lowering={lowering:8s} '
                f'wall={wall * 1000:7.2f} ms  '
                f'throughput={batch_size * audio_s / wall:7.1f}x RT  '
                f'(compile {compile_s:.0f}s)',
                flush=True)
    b1 = min(results[(1, low)] for low in ('shifted', 'xla'))
    b4 = min(results[(4, low)] for low in ('shifted', 'xla'))
    print(f'best batch-4 / batch-1 wall ratio: {b4 / b1:.2f} (ideal 4.0 -> 1.0 scaling)')


if __name__ == '__main__':
    from promonet_tpu.utils import pause
    with pause.exclusive(timeout=300.) as acked:
        if not acked:
            print('warning: trainer did not ack pause; contended numbers',
                  file=sys.stderr)
        main()
