"""Decompose the GAN train step's wall time (round-4 throughput work).

Times jitted variants of the training program at the flagship batch
size under exclusive chip access, with XLA-counted flops for each, so
the optimization target is the measured-hottest component rather than a
guess:

  full        — D update + G update (the production step)
  no_adv      — G update with mel loss only (no discriminator anywhere)
  g_forward   — generator forward alone
  g_fwd_bwd   — generator forward + backward (mel-loss cotangent)
  d_forward   — discriminator forward alone (real + fake)

Usage: python scripts/train_triage.py [repeat]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

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
    peak = 197e12
    print(
        f'{name:12s} wall={wall * 1000:8.1f} ms  '
        f'flops={flops / 1e12:6.2f} T  '
        f'mfu={flops / wall / peak * 100:5.1f}%  '
        f'bytes={bytes_ / 1e9:6.2f} GB  '
        f'(compile {compile_s:.0f}s)',
        flush=True)
    return wall


def main():
    repeat = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    batch = example_batch(promonet_tpu.BATCH_SIZE)
    state = create_state(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    generator = promonet_tpu.models.Generator.create()
    discriminators = promonet_tpu.models.Discriminator.create()
    g_params = state['generator']['params']
    gen_args = generator_args(batch)

    def g_forward(params, *args):
        return generator.apply(params, *args, train=True)

    bench('g_forward', g_forward, g_params, *gen_args, repeat=repeat)

    def g_fwd_bwd(params, *args):
        def loss_fn(p):
            generated = generator.apply(p, *args, train=True)
            return loss_module.mel(batch['spectrograms'], generated)
        value, grads = jax.value_and_grad(loss_fn)(params)
        return value, grads

    bench('g_fwd_bwd', g_fwd_bwd, g_params, *gen_args, repeat=repeat)

    d_params = jax.jit(discriminators.init)(
        jax.random.PRNGKey(2), batch['audio'], batch['audio'])

    def d_forward(params, audio):
        return discriminators.apply(params, audio, audio)

    bench('d_forward', d_forward, d_params, batch['audio'], repeat=repeat)

    def d_fwd_bwd(params, audio):
        def loss_fn(p):
            real, fake, _, _ = discriminators.apply(p, audio, audio)
            total, _, _ = loss_module.discriminator(real, fake)
            return total
        return jax.value_and_grad(loss_fn)(params)

    bench('d_fwd_bwd', d_fwd_bwd, d_params, batch['audio'], repeat=repeat)

    full = make_train_step(discriminate=True, adversarial=True)
    bench('full', full, state, batch, rng, repeat=repeat)

    state = create_state(jax.random.PRNGKey(0))
    no_adv = make_train_step(discriminate=False, adversarial=False)
    bench('no_adv', no_adv, state, batch, rng, repeat=repeat)


if __name__ == '__main__':
    from promonet_tpu.utils import pause
    with pause.exclusive(timeout=300.):
        main()
