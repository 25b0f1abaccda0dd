"""Triage XLA compile time of the synthesis program (VERDICT r3 weak #2).

AOT-lowers and compiles the generator apply at several frame buckets —
no device dispatch, so it can run alongside the trainer. Reports
trace/lower and compile wall time per bucket, plus this process's own
CPU time to show whether compilation is client-side (this host has ONE
core) or server-side.

Usage: python scripts/compile_triage.py [bucket ...]
Env: TRIAGE_CACHE=0 disables the persistent compilation cache so cold
compile times are honest.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

if os.environ.get('TRIAGE_CACHE', '1') == '0':
    os.environ['PROMONET_TPU_COMPILATION_CACHE'] = ''

import jax
import numpy as np

import promonet_tpu as p


def cpu_seconds():
    import resource
    r = resource.getrusage(resource.RUSAGE_SELF)
    return r.ru_utime + r.ru_stime


def abstract_args(bucket):
    num_freqs = p.WINDOW_SIZE // 2 + 1
    f32 = np.float32
    S = jax.ShapeDtypeStruct
    return (
        S((1, num_freqs, bucket), f32),      # loudness
        S((1, bucket), f32),                 # pitch
        S((1, bucket), f32),                 # periodicity
        S((1, p.PPG_CHANNELS, bucket), f32), # ppg
        S((1,), np.int32),                   # speakers
        S((1,), f32),                        # spectral balance
        S((1,), f32),                        # loudness ratio
    )


def main():
    buckets = [int(b) for b in sys.argv[1:]] or [256, 1024, 2048]
    model = p.models.Generator.create()
    from promonet_tpu.train.core import example_batch, generator_args
    params_shape = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), *generator_args(example_batch())))

    print(f'backend={jax.default_backend()} '
          f'pallas_resblock={getattr(p, "PALLAS_RESBLOCK", None)}')
    for bucket in buckets:
        fn = jax.jit(model.apply)
        t0, c0 = time.perf_counter(), cpu_seconds()
        lowered = fn.lower(params_shape, *abstract_args(bucket))
        t1, c1 = time.perf_counter(), cpu_seconds()
        compiled = lowered.compile()
        t2, c2 = time.perf_counter(), cpu_seconds()
        try:
            flops = compiled.cost_analysis()
            flops = flops.get('flops') if isinstance(flops, dict) else (
                flops[0].get('flops') if flops else None)
        except Exception:
            flops = None
        print(
            f'bucket={bucket:5d}  lower={t1-t0:7.2f}s (cpu {c1-c0:6.2f}s)  '
            f'compile={t2-t1:7.2f}s (cpu {c2-c1:6.2f}s)  flops={flops}',
            flush=True)


if __name__ == '__main__':
    main()
