"""Profile the generator forward at batch 1 vs 4 (VERDICT r4 weak #4).

Captures a jax.profiler trace of the default-config generator forward
at both batch sizes on the attached device, then prints a per-op-group
wall breakdown so the batch-4 slowdown (mfu_batch4 0.111 vs batch-1
0.240 in BENCH_r04) attributes to a specific component: transposed
upsamples, resblock stacks (per stage width), pre/post convs, or the
Pallas fused kernel.

The trace parser reads the trace-viewer JSON the profiler writes
(plugins/profile/<run>/*.trace.json.gz) and sums 'complete' events on
the device lanes, grouped by the HLO/fusion name. One compile per
batch size (the same chained-scan program bench.py times).

Usage: python scripts/batch4_profile.py [frames] [--cpu]
"""
import collections
import contextlib
import glob
import gzip
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

_RUN = Path(__file__).parent.parent / 'runs' / 'promonet' / 'synthetic.py'
_BENCH = Path(__file__).parent.parent / 'configs' / 'bench.py'
if '--cpu' in sys.argv:
    os.environ['JAX_PLATFORMS'] = 'cpu'
if 'PROMONET_TPU_CONFIG' not in os.environ and _RUN.exists():
    os.environ['PROMONET_TPU_CONFIG'] = f'{_RUN}:{_BENCH}'

import jax

if '--cpu' in sys.argv:
    # The axon sitecustomize attaches the tunneled TPU regardless of
    # JAX_PLATFORMS; the post-import config update does take effect
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

import promonet_tpu
from promonet_tpu.train.core import example_batch, generator_args


def group_of(name):
    """Attribute one HLO/fusion event name to a model component."""
    n = name.lower()
    if 'pallas' in n or 'fused_block' in n or 'resblock' in n:
        return 'pallas_resblock'
    for tag in ('transpose', 'conv'):
        if tag in n:
            return 'conv/fusion'
    if 'dot' in n:
        return 'dot'
    if 'dynamic' in n or 'slice' in n or 'pad' in n:
        return 'data-movement'
    if 'copy' in n or 'bitcast' in n or 'reshape' in n:
        return 'layout'
    return 'other'


def parse_trace(logdir):
    files = glob.glob(
        str(Path(logdir) / 'plugins' / 'profile' / '*' / '*.trace.json.gz'))
    if not files:
        return None
    with gzip.open(sorted(files)[-1], 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    # Device lanes: pid whose process_name mentions TPU/device.
    names = {}
    threads = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            names[e['pid']] = e['args'].get('name', '')
        if e.get('ph') == 'M' and e.get('name') == 'thread_name':
            threads[(e['pid'], e.get('tid'))] = e['args'].get('name', '')
    device_pids = {
        pid for pid, name in names.items()
        if any(t in name.lower() for t in ('tpu', 'device', 'xla'))
        and 'host' not in name.lower()}
    # Prefer the leaf-op lane ("XLA Ops"); module/step lanes hold
    # container events (whole-program spans) that double-count
    op_lanes = {
        key for key, name in threads.items()
        if key[0] in device_pids and 'xla ops' in name.lower()}
    if not device_pids:
        # CPU backend: one '/host:CPU' process; executor thread lanes
        op_lanes = {
            key for key, name in threads.items()
            if 'tf_xla' in name.lower() or 'xla ops' in name.lower()}
        device_pids = {key[0] for key in op_lanes}

    def included(e):
        key = (e.get('pid'), e.get('tid'))
        return key in op_lanes if op_lanes \
            else e.get('pid') in device_pids

    # SELF time per op: events nest (a while contains its body's ops on
    # the same lane in some backends); subtracting contained children
    # from each event's duration makes the per-op sums additive
    lanes = collections.defaultdict(list)
    for e in events:
        if e.get('ph') == 'X' and included(e):
            lanes[(e['pid'], e.get('tid'))].append(
                (e['ts'], e['ts'] + e.get('dur', 0), e.get('name', '?')))
    per_op = collections.Counter()
    per_group = collections.Counter()
    total = 0.
    for lane in lanes.values():
        lane.sort(key=lambda ev: (ev[0], -ev[1]))
        stack = []  # (end, child_time_accumulator index into selfs)
        selfs = []
        for start, end, name in lane:
            while stack and stack[-1][0] <= start:
                stack.pop()
            if stack:
                # Attribute this span as a child of the innermost open
                # container
                selfs[stack[-1][1]][1] += end - start
            stack.append((end, len(selfs)))
            selfs.append([name, 0, end - start])
        for name, child_time, dur in selfs:
            self_time = max(0, dur - child_time)
            per_op[name] += self_time
            per_group[group_of(name)] += self_time
            total += self_time
    return per_op, per_group, total


def profile_forward(batch_size, frames, repeat=20):
    model = promonet_tpu.models.Generator.create()
    batch = example_batch(batch_size, frames)
    args = generator_args(batch)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    loudness, pitch, *rest = args

    @jax.jit
    def chained(loudness, pitch, *rest):
        def body(carry, _):
            out = model.apply(
                params, loudness, pitch + carry * 1e-20, *rest)
            return jnp.mean(out), None
        carry, _ = jax.lax.scan(
            body, jnp.float32(0.), None, length=repeat)
        return carry

    float(jax.device_get(chained(loudness, pitch, *rest)))  # compile
    walls = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(jax.device_get(chained(loudness, pitch, *rest)))
        walls.append((time.perf_counter() - t0) / repeat)

    logdir = f'/tmp/b4prof-{int(time.time())}/b{batch_size}'
    with jax.profiler.trace(logdir):
        float(jax.device_get(chained(loudness, pitch, *rest)))
    return min(walls), logdir


def main():
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    frames = int(args[0]) if args else 862
    print(f'device: {jax.devices()[0].device_kind}', flush=True)
    from promonet_tpu.utils import pause
    with contextlib.ExitStack() as stack:
        if '--cpu' not in sys.argv:
            acked = stack.enter_context(pause.exclusive(timeout=300.))
            print(f'trainer paused: {acked}', flush=True)
        results = {}
        for batch in (1, 4):
            wall, logdir = profile_forward(batch, frames)
            results[batch] = (wall, logdir)
            print(f'batch {batch}: {wall * 1e3:.2f} ms/forward', flush=True)
    for batch, (wall, logdir) in results.items():
        parsed = parse_trace(logdir)
        if parsed is None:
            print(f'batch {batch}: no trace found in {logdir}')
            continue
        per_op, per_group, total = parsed
        print(f'\n== batch {batch}: device total {total / 1e3:.1f} ms '
              f'(trace) ==')
        for group, dur in per_group.most_common():
            print(f'  {group:20s} {dur / 1e3:9.2f} ms '
                  f'{100 * dur / max(total, 1):5.1f}%')
        print('  top ops:')
        for name, dur in per_op.most_common(12):
            print(f'    {dur / 1e3:9.2f} ms  {name[:110]}')


if __name__ == '__main__':
    main()
