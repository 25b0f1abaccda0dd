"""A/B the stride-1 conv lowering at the training shape (round 4).

conv1d_shifted_dots wins at inference shapes (batch 1: 23.9% MFU vs
~14% for the native conv) but at batch 64 the unrolled shifted slices
materialize k copies of the activation: the generator forward touches
142 GB / 4.9% MFU (scripts/train_triage.py). This times the generator
fwd+bwd and the full GAN step under each lowering, with the flagship
run config when present.

Usage: python scripts/lowering_ab.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

_RUN_CONFIG = Path(__file__).parent.parent / 'runs' / 'promonet' / 'synthetic.py'
if 'PROMONET_TPU_CONFIG' not in os.environ and _RUN_CONFIG.exists():
    os.environ['PROMONET_TPU_CONFIG'] = str(_RUN_CONFIG)

import jax

import promonet_tpu
from promonet_tpu.train.core import (
    create_state,
    example_batch,
    generator_args,
    make_train_step)
from promonet_tpu.train import loss as loss_module


def sync(x):
    return float(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def bench(name, fn, *args, repeat=3):
    t0 = time.perf_counter()
    compiled = jax.jit(fn).lower(*args).compile()
    compile_s = time.perf_counter() - t0
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = float(analysis.get('flops', 0.))
        bytes_ = float(analysis.get('bytes accessed', 0.))
    except Exception:
        flops, bytes_ = 0., 0.
    sync(compiled(*args))
    walls = []
    for _ in range(repeat):
        start = time.perf_counter()
        sync(compiled(*args))
        walls.append(time.perf_counter() - start)
    wall = min(walls)
    print(
        f'{name:24s} wall={wall * 1000:8.1f} ms  '
        f'flops={flops / 1e12:6.2f} T  '
        f'mfu={flops / wall / 197e12 * 100:5.1f}%  '
        f'bytes={bytes_ / 1e9:6.2f} GB  (compile {compile_s:.0f}s)',
        flush=True)
    return wall


def main():
    batch = example_batch(promonet_tpu.BATCH_SIZE)
    state = create_state(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    generator = promonet_tpu.models.Generator.create()
    g_params = state['generator']['params']
    gen_args = generator_args(batch)

    def g_fwd_bwd(params, *args):
        def loss_fn(p):
            generated = generator.apply(p, *args, train=True)
            return loss_module.mel(batch['spectrograms'], generated)
        return jax.value_and_grad(loss_fn)(params)

    for mode in ('shifted', 'xla'):
        promonet_tpu.CONV_LOWERING = mode
        bench(f'g_fwd_bwd[{mode}]', g_fwd_bwd, g_params, *gen_args)

    for mode in ('shifted', 'xla'):
        promonet_tpu.CONV_LOWERING = mode
        step = make_train_step(discriminate=True, adversarial=True)
        state_ = create_state(jax.random.PRNGKey(0))
        bench(f'full[{mode}]', step, state_, batch, rng)


if __name__ == '__main__':
    from promonet_tpu.utils import pause
    with pause.exclusive(timeout=300.):
        main()
