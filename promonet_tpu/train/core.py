"""GAN training.

TPU re-design of the reference trainer (promonet/train/core.py). The
entire step — generator forward, discriminator update, generator losses
through the *updated* discriminator (matching the reference's
alternating-update ordering at train/core.py:216-369), and both optimizer
updates — is ONE jitted XLA program. The generator forward runs once: its
VJP is captured with `jax.vjp`, the discriminator is updated against the
stop-gradient waveform, and the generator cotangent is pulled back through
the saved VJP.

Mixed precision is bf16 compute / fp32 params+losses (replacing the
reference's CUDA AMP GradScaler at train/core.py:118 — bf16 needs no loss
scaling). Data parallelism shards the global batch over the mesh's 'data'
axis; XLA inserts the gradient all-reduce (SURVEY.md §2.9).
"""
import functools
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

import promonet_tpu
from . import loss as loss_module


###############################################################################
# Entry point
###############################################################################


from ..utils.notify import notify


@notify('train')
def train(
    directory,
    dataset=None,
    train_partition='train',
    valid_partition='valid',
    adapt_from=None,
    gpu=None,
    steps=None
):
    """Train a model (reference: promonet/train/core.py:17-24)

    Arguments
        directory: run directory for checkpoints and logs
        dataset: dataset name (defaults to TRAINING_DATASET)
        train_partition / valid_partition: partition names
        adapt_from: checkpoint directory to adapt from
        gpu: unused (API parity; device selection is mesh-based on TPU)
        steps: override total step count (testing)
    """
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    if dataset is None:
        dataset = promonet_tpu.TRAINING_DATASET

    # Total number of steps (promonet/train/core.py:111-115)
    if steps is None:
        steps = promonet_tpu.STEPS
        if adapt_from:
            steps += promonet_tpu.ADAPTATION_STEPS

    # Device mesh; batch shards over 'data', params replicate
    mesh = promonet_tpu.parallel.create_mesh()

    # Device-resident corpus or host loader (data/resident.py rationale)
    resident = promonet_tpu.RESIDENT_DATA
    if resident is None:
        resident = (
            jax.default_backend() == 'tpu'
            and not promonet_tpu.SPECTROGRAM_ONLY)

    # Data loaders (promonet/train/core.py:38-47)
    if resident:
        from ..data import resident as resident_module
        train_data = resident_module.to_device(
            resident_module.pack(dataset, train_partition), mesh)
        train_loader = None
    else:
        train_loader = promonet_tpu.data.loader(
            dataset, train_partition, adapt_from is not None)
    valid_loader = promonet_tpu.data.loader(
        dataset, valid_partition, adapt_from is not None)

    # Models + optimizers
    state = create_state(jax.random.PRNGKey(promonet_tpu.RANDOM_SEED))

    # Auto-resume or adapt (promonet/train/core.py:70-105)
    latest = promonet_tpu.utils.checkpoint.latest_path(directory)
    source = latest if latest is not None else adapt_from
    if source is not None:
        state, step, epoch = load_checkpoint(directory, state, source)
    else:
        step, epoch = 0, 0

    # Restored arrays are committed to their load device; re-place the
    # state on the mesh or the jitted step sees mixed device sets when
    # the batch spans more than one device.
    state = promonet_tpu.parallel.shard_pytree(state, mesh)

    # Loss-warmup gating (promonet/train/core.py:236,264) is static in
    # the compiled step; rebuild the step function at each boundary
    def step_fn_for(step):
        return make_train_step(
            discriminate=step >= promonet_tpu.DISCRIMINATOR_START_STEP,
            adversarial=step >= promonet_tpu.ADVERSARIAL_LOSS_START_STEP,
            resident=resident,
            total_steps=steps,
            mesh=mesh)

    boundaries = sorted({
        promonet_tpu.DISCRIMINATOR_START_STEP,
        promonet_tpu.ADVERSARIAL_LOSS_START_STEP})
    step_fn = step_fn_for(step)
    rng = jax.random.PRNGKey(promonet_tpu.RANDOM_SEED + 1)

    progress_interval = 2000
    progress_clock, progress_step = time.time(), step

    def batches():
        """Per-step inputs: the resident corpus handle, or host batches"""
        nonlocal epoch
        if resident:
            while True:
                yield train_data
        else:
            while True:
                train_loader.sampler.set_epoch(epoch)
                for batch in train_loader:
                    # Skip examples that are too short
                    # (promonet/train/core.py:154)
                    if batch['audio'].shape[-1] < promonet_tpu.CHUNK_SIZE:
                        continue
                    yield promonet_tpu.parallel.shard_batch(batch, mesh)
                epoch += 1

    advance = steps_per_dispatch(steps) if resident else 1

    # Cap in-flight dispatches: async enqueue without backpressure can
    # queue hundreds of programs ahead of the device, which wedges
    # tunneled attachments (observed: client blocked, chip idle). Depth
    # 2 still overlaps host dispatch with device execution. The sync
    # must MATERIALIZE a value: on tunneled backends block_until_ready
    # returns before execution completes (measured), device_get does not.
    import collections
    pending = collections.deque()

    def sync(metrics):
        return float(jax.device_get(metrics['loss/generator/total']))

    def drain():
        while pending:
            sync(pending.popleft())

    # Benchmarks may request exclusive device access (utils/pause.py)
    from ..utils import pause
    pause.register_trainer()

    for batch in batches():

        pause.heartbeat()
        pause.maybe_pause(
            drain,
            on_pause=lambda: save_checkpoint(directory, state, step, epoch))

        if step in boundaries:
            step_fn = step_fn_for(step)

        rng, step_rng = jax.random.split(rng)
        state, metrics = step_fn(state, batch, step_rng)
        pending.append(metrics)
        if len(pending) > 2:
            sync(pending.popleft())

        if step and step % progress_interval < advance:
            # Sync so the rate is true device throughput, not the
            # async enqueue rate
            sync(metrics)
            now = time.time()
            rate = (step - progress_step) / max(now - progress_clock, 1e-9)
            print(
                f'[{time.strftime("%H:%M:%S")}] '
                f'step {step}/{steps} · {rate:.1f} steps/s · '
                f'eta {(steps - step) / max(rate, 1e-9) / 3600:.2f} h',
                flush=True)
            progress_clock, progress_step = now, step

        if step % promonet_tpu.EVALUATION_INTERVAL == 0:
            scalars = {
                k: float(v) for k, v in
                jax.device_get(metrics).items()}
            promonet_tpu.utils.log.update(directory, step, scalars=scalars)
            evaluate(directory, step, state, valid_loader, mesh)

        if step and step % promonet_tpu.CHECKPOINT_INTERVAL == 0:
            save_checkpoint(directory, state, step, epoch)

        step += advance
        if step >= steps:
            break

    drain()
    pause.unregister_trainer()
    save_checkpoint(directory, state, step, epoch)
    return state


###############################################################################
# State
###############################################################################


def build_optimizer():
    """Resolve the configured optimizer spec to optax

    Matches torch AdamW(lr=2e-4, betas=(.8,.99), eps=1e-9) semantics
    including decoupled weight decay scaled by the learning rate
    (promonet/config/defaults.py:390-394).
    """
    spec = dict(promonet_tpu.OPTIMIZER)
    name = spec.pop('name', 'adamw')
    if name == 'adamw':
        return optax.adamw(
            learning_rate=spec.get('lr', 2e-4),
            b1=spec.get('b1', .8),
            b2=spec.get('b2', .99),
            eps=spec.get('eps', 1e-9),
            weight_decay=spec.get('weight_decay', 1e-2))
    if name == 'adam':
        return optax.adam(
            learning_rate=spec.get('lr', 2e-4),
            b1=spec.get('b1', .9),
            b2=spec.get('b2', .999),
            eps=spec.get('eps', 1e-8))
    if name == 'sgd':
        return optax.sgd(
            learning_rate=spec.get('lr', 1e-3),
            momentum=spec.get('momentum', 0.))
    raise ValueError(f'Optimizer {name} is not defined')


def example_batch(batch_size=1, frames=None):
    """A correctly-shaped zero batch for initialization/compile checks"""
    if frames is None:
        frames = promonet_tpu.CHUNK_SIZE // promonet_tpu.HOPSIZE
    num_freqs = promonet_tpu.WINDOW_SIZE // 2 + 1
    samples = frames * promonet_tpu.HOPSIZE
    return {
        'loudness': np.full((batch_size, num_freqs, frames), -60., np.float32),
        'pitch': np.full((batch_size, frames), 150., np.float32),
        'periodicity': np.full((batch_size, frames), .5, np.float32),
        'ppg': np.full(
            (batch_size, promonet_tpu.PPG_CHANNELS, frames),
            1. / promonet_tpu.PPG_CHANNELS,
            np.float32),
        'speakers': np.zeros((batch_size,), np.int32),
        'spectral_balance_ratios': np.ones((batch_size,), np.float32),
        'loudness_ratios': np.ones((batch_size,), np.float32),
        'spectrograms': np.full(
            (batch_size, num_freqs, frames), 1e-3, np.float32),
        'audio': np.zeros((batch_size, 1, samples), np.float32),
    }


def generator_module(remat=False):
    if promonet_tpu.SPECTROGRAM_ONLY:
        return promonet_tpu.models.MelGenerator.create(remat=remat)
    return promonet_tpu.models.Generator.create(remat=remat)


def generator_args(batch, slice_frames=0):
    """Bundle generator input from a batch (promonet/train/core.py:183-214)"""
    if promonet_tpu.SPECTROGRAM_ONLY:
        return (
            batch['spectrograms'][..., slice_frames:],
            batch['speakers'],
            batch['spectral_balance_ratios'],
            batch['loudness_ratios'])
    return (
        batch['loudness'][..., slice_frames:],
        batch['pitch'][..., slice_frames:],
        batch['periodicity'][..., slice_frames:],
        batch['ppg'][..., slice_frames:],
        batch['speakers'],
        batch['spectral_balance_ratios'],
        batch['loudness_ratios'])


def previous_samples_of(batch):
    """Autoregressive context from the batch (promonet/train/core.py:183-197)"""
    audio = batch['audio']
    if promonet_tpu.MODEL == 'cargan':
        return audio[..., :promonet_tpu.CARGAN_INPUT_SIZE]
    if promonet_tpu.MODEL == 'fargan':
        return audio[
            ...,
            :promonet_tpu.HOPSIZE * promonet_tpu.FARGAN_PREVIOUS_FRAMES]
    return None


def create_state(rng):
    """Initialize generator/discriminator parameters and optimizer state"""
    remat = bool(promonet_tpu.REMAT)
    generator = generator_module(remat=remat)
    discriminators = promonet_tpu.models.Discriminator.create(remat=remat)

    batch = example_batch()
    g_rng, d_rng, noise_rng = jax.random.split(rng, 3)
    init_rngs = {'params': g_rng}
    if promonet_tpu.MODEL == 'fargan':
        init_rngs['noise'] = noise_rng
    # Inits run under jit: eager flax init dispatches one device op per
    # primitive, which costs ~0.3 s each over the tunneled attachment —
    # 270+ s for the generator alone (measured r4; misdiagnosed as XLA
    # compile time in round 3). Compiled, the same init is seconds.
    g_params = jax.jit(generator.init)(
        init_rngs,
        *generator_args(batch),
        previous_samples=previous_samples_of(batch))
    d_params = jax.jit(discriminators.init)(
        {'params': d_rng}, batch['audio'], batch['audio'])

    g_optimizer = build_optimizer()
    d_optimizer = build_optimizer()
    return {
        'generator': {
            'params': g_params,
            'opt_state': jax.jit(g_optimizer.init)(g_params),
        },
        'discriminator': {
            'params': d_params,
            'opt_state': jax.jit(d_optimizer.init)(d_params),
        },
    }


def save_checkpoint(directory, state, step, epoch):
    """Checkpoint both models (promonet/train/core.py:426-438)"""
    state = jax.device_get(state)
    promonet_tpu.utils.checkpoint.save(
        Path(directory) / f'generator-{step:08d}',
        state['generator']['params'],
        state['generator']['opt_state'],
        step=step,
        epoch=epoch)
    promonet_tpu.utils.checkpoint.save(
        Path(directory) / f'discriminator-{step:08d}',
        state['discriminator']['params'],
        state['discriminator']['opt_state'],
        step=step,
        epoch=epoch)
    promonet_tpu.utils.checkpoint.prune(directory)


def load_checkpoint(directory, state, generator_path):
    """Restore models + optimizers for auto-resume or adaptation

    Release checkpoints ship generator params only (no optimizer state,
    no discriminator) — warm-starting from one keeps the trained
    generator and step count but re-initializes both optimizers and the
    discriminator, like adapting from a published checkpoint
    (promonet/adapt/core.py:73-91).
    """
    generator_path = Path(generator_path)
    keys = promonet_tpu.utils.checkpoint.top_level_keys(generator_path)
    restore = promonet_tpu.utils.checkpoint.load(
        generator_path,
        template={
            key: (np.asarray(0) if key in ('step', 'epoch')
                  else state['generator'][key])
            for key in keys})
    state['generator']['params'] = restore['params']
    if 'opt_state' in restore:
        state['generator']['opt_state'] = restore['opt_state']
    step = int(restore['step'])
    epoch = int(restore['epoch'])

    d_path = generator_path.parent / generator_path.name.replace(
        'generator', 'discriminator')
    if d_path.exists():
        d_payload = promonet_tpu.utils.checkpoint.load(
            d_path,
            template={
                'params': state['discriminator']['params'],
                'opt_state': state['discriminator']['opt_state'],
                'step': np.asarray(0),
                'epoch': np.asarray(0)})
        state['discriminator']['params'] = d_payload['params']
        state['discriminator']['opt_state'] = d_payload['opt_state']
    return state, step, epoch


###############################################################################
# Train step
###############################################################################


def steps_per_dispatch(total_steps=None):
    """Optimizer steps fused into one dispatch (resident mode).

    Auto (STEPS_PER_DISPATCH=None): the largest K ≤ 32 that divides
    every step-count cadence — evaluation/checkpoint intervals, the
    loss-warmup boundaries, and the total budget — so every interval
    event lands exactly on a dispatch boundary.
    """
    import math

    configured = getattr(promonet_tpu, 'STEPS_PER_DISPATCH', None)
    if configured is not None:
        return max(1, int(configured))
    cadence = math.gcd(
        promonet_tpu.EVALUATION_INTERVAL, promonet_tpu.CHECKPOINT_INTERVAL)
    for boundary in (
        promonet_tpu.DISCRIMINATOR_START_STEP,
        promonet_tpu.ADVERSARIAL_LOSS_START_STEP,
        total_steps or 0,
    ):
        if boundary:
            cadence = math.gcd(cadence, boundary)
    for k in range(min(32, cadence), 0, -1):
        if cadence % k == 0:
            return k
    return 1


def make_train_step(
    discriminate=None,
    adversarial=None,
    resident=False,
    total_steps=None,
    mesh=None,
):
    """Build the jitted GAN train step

    Loss-warmup gating (DISCRIMINATOR_START_STEP /
    ADVERSARIAL_LOSS_START_STEP, promonet/train/core.py:236,264) is
    resolved statically: the trainer rebuilds the step function at the
    warmup boundary instead of branching inside the program.

    With resident=True the step takes the device-resident corpus
    (data/resident.py) instead of a host batch: crop sampling, the
    mel-loss target spectrogram, and the GAN update all fuse into the
    ONE compiled program — per-step host traffic is a PRNG key.
    """
    if discriminate is None:
        discriminate = promonet_tpu.DISCRIMINATOR_START_STEP == 0
    if adversarial is None:
        adversarial = promonet_tpu.ADVERSARIAL_LOSS_START_STEP == 0

    # Rematerialized variants when configured (REMAT): full-batch GAN
    # training on small-HBM parts does not fit storing every conv
    # activation for the backward pass; with ample HBM, skipping remat
    # saves the recompute FLOPs
    remat = bool(promonet_tpu.REMAT)
    generator = generator_module(remat=remat)
    discriminators = promonet_tpu.models.Discriminator.create(remat=remat)
    g_optimizer = build_optimizer()
    d_optimizer = build_optimizer()
    loss = loss_module

    model = promonet_tpu.MODEL
    prev_len = (
        promonet_tpu.HOPSIZE * promonet_tpu.FARGAN_PREVIOUS_FRAMES
        if model == 'fargan' else None)

    def step_body(state, batch, rng):
        # Trace-time: pin the training conv lowering for everything the
        # step traces (generator fwd/VJP + discriminators). The shifted
        # -matmul lowering wins at inference batch sizes but loses at
        # the training batch (see config TRAIN_CONV_LOWERING); scoping
        # it here re-reads the flag on every (re)trace, avoiding the
        # stale-jit-cache hazard of a module-level toggle.
        from ..models.modules import conv_lowering
        with conv_lowering(getattr(
                promonet_tpu, 'TRAIN_CONV_LOWERING', None)):
            return _step_body(state, batch, rng)

    def _step_body(state, batch, rng):
        audio = batch['audio']
        previous_samples = previous_samples_of(batch)
        gen_args = generator_args(batch)

        def forward(g_params):
            kwargs = {'previous_samples': previous_samples, 'train': True}
            rngs = {'noise': rng} if model == 'fargan' else None
            generated = generator.apply(g_params, *gen_args, rngs=rngs, **kwargs)
            # Evaluate the boundary of autoregressive models
            # (promonet/train/core.py:226-234)
            if model == 'fargan':
                generated = jnp.concatenate(
                    [previous_samples, generated[..., prev_len:]], axis=-1)
            return generated

        generated, g_vjp = jax.vjp(forward, state['generator']['params'])
        # Fusion barrier: without it, XLA's TPU fusion pass crashes
        # combining the generator's output window ops with downstream
        # discriminator/mel consumers at full batch (fusion_util.cc
        # TransformWindow check failure). Gradients pass through.
        generated = jax.lax.optimization_barrier(generated)

        metrics = {}

        #######################
        # Train discriminator #
        #######################

        d_params = state['discriminator']['params']
        d_opt_state = state['discriminator']['opt_state']
        if discriminate:

            def d_loss_fn(d_params):
                real_logits, fake_logits, _, _ = discriminators.apply(
                    d_params, audio, jax.lax.stop_gradient(generated))
                total, real_losses, fake_losses = loss.discriminator(
                    real_logits, fake_logits)
                return total, (real_losses, fake_losses)

            (d_total, (real_losses, fake_losses)), d_grads = \
                jax.value_and_grad(d_loss_fn, has_aux=True)(d_params)
            d_updates, d_opt_state = d_optimizer.update(
                d_grads, d_opt_state, d_params)
            d_params = optax.apply_updates(d_params, d_updates)

            metrics['loss/discriminator/total'] = d_total
            for i, value in enumerate(real_losses):
                metrics[f'loss/discriminator/real-{i:02d}'] = value
            for i, value in enumerate(fake_losses):
                metrics[f'loss/discriminator/fake-{i:02d}'] = value

        ###################
        # Train generator #
        ###################

        def g_loss_fn(generated):
            total = 0.
            aux = {}
            if promonet_tpu.MEL_LOSS:
                mel_loss = loss.mel(batch['spectrograms'], generated)
                total += promonet_tpu.MEL_LOSS_WEIGHT * mel_loss
                aux['loss/generator/mels'] = mel_loss
            if promonet_tpu.SPECTRAL_CONVERGENCE_LOSS:
                spectral = loss.multi_resolution_spectral_convergence(
                    generated, audio)
                total += spectral
                aux['loss/generator/spectral-convergence'] = spectral
            if promonet_tpu.SIGNAL_LOSS:
                signal_loss = loss.signal(
                    audio.reshape(audio.shape[0], -1),
                    generated.reshape(generated.shape[0], -1))
                total += promonet_tpu.SIGNAL_LOSS_WEIGHT * signal_loss
                aux['loss/generator/signal'] = signal_loss
            if adversarial:
                # Uses the freshly-updated discriminator, matching the
                # reference ordering (promonet/train/core.py:262-272)
                _, fake_logits, real_fmaps, fake_fmaps = \
                    discriminators.apply(d_params, audio, generated)
                fm_loss = loss.feature_matching(real_fmaps, fake_fmaps)
                total += promonet_tpu.FEATURE_MATCHING_LOSS_WEIGHT * fm_loss
                adv_loss, adv_losses = loss.generator(fake_logits)
                total += promonet_tpu.ADVERSARIAL_LOSS_WEIGHT * adv_loss
                aux['loss/generator/feature-matching'] = fm_loss
                for i, value in enumerate(adv_losses):
                    aux[f'loss/generator/adversarial-{i:02d}'] = value
            return total, aux

        (g_total, g_aux), gen_cotangent = jax.value_and_grad(
            g_loss_fn, has_aux=True)(generated)
        (g_grads,) = g_vjp(gen_cotangent)

        # Gradient statistics (promonet/train/core.py:341-345)
        leaves = jax.tree.leaves(g_grads)
        grad_max = jnp.max(
            jnp.stack([jnp.max(leaf) for leaf in leaves]))
        grad_min = jnp.min(
            jnp.stack([jnp.min(leaf) for leaf in leaves]))
        metrics['gradients/max'] = grad_max
        metrics['gradients/min'] = grad_min

        # Maybe inf-norm clip (promonet/train/core.py:348-363)
        if promonet_tpu.GRADIENT_CLIP_GENERATOR is not None:
            bound = promonet_tpu.GRADIENT_CLIP_GENERATOR
            over = jnp.maximum(grad_max, -grad_min) > bound
            g_grads = jax.tree.map(
                lambda g: jnp.where(over, jnp.clip(g, -bound, bound), g),
                g_grads)

        g_updates, g_opt_state = g_optimizer.update(
            g_grads,
            state['generator']['opt_state'],
            state['generator']['params'])
        g_params = optax.apply_updates(
            state['generator']['params'], g_updates)

        metrics['loss/generator/total'] = g_total
        metrics.update(g_aux)

        new_state = {
            'generator': {'params': g_params, 'opt_state': g_opt_state},
            'discriminator': {'params': d_params, 'opt_state': d_opt_state},
        }
        return new_state, metrics

    if resident:
        from ..data import resident as resident_module

        # Multi-chip: per-device sampling over the stem-sharded corpus
        # (data/resident.py sample_sharded); the batch comes out already
        # sharded along the data axis and GSPMD handles the rest
        sharded = (
            mesh is not None
            and 'data' in mesh.axis_names
            and mesh.shape['data'] > 1)

        def sampled_step(state, data, key):
            sample_rng, step_rng = jax.random.split(key)
            if sharded:
                batch = resident_module.sample_sharded(
                    data, sample_rng, mesh)
            else:
                batch = resident_module.sample(data, sample_rng)
            # Mel-loss target from the crop itself (device STFT)
            batch['spectrograms'] = \
                promonet_tpu.preprocess.spectrogram.from_audio(
                    batch['audio'])
            return step_body(state, batch, step_rng)

        # Amortize dispatch latency: scan K optimizer steps inside ONE
        # compiled program (viable only because sampling is on-device —
        # there is no host batch to feed per step). On a tunneled or
        # contended attachment, per-dispatch overhead otherwise rivals
        # the 17 ms step itself.
        k = steps_per_dispatch(total_steps)
        if k == 1:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def train_step(state, data, rng):
                return sampled_step(state, data, rng)
        else:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def train_step(state, data, rng):
                def body(carry, key):
                    return sampled_step(carry, data, key)
                state, metrics = jax.lax.scan(
                    body, state, jax.random.split(rng, k))
                # Report the final step's losses of the window
                return state, jax.tree.map(lambda m: m[-1], metrics)
    else:

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, batch, rng):
            return step_body(state, batch, rng)

    return train_step


###############################################################################
# In-training evaluation
###############################################################################


def evaluate(directory, step, state, valid_loader, mesh, max_batches=None):
    """Validation-time evaluation.

    Mirrors the reference's in-train evaluation (promonet/train/
    core.py:487-813): synthesize reconstructions from validation
    features, re-extract features from the generated audio, score with
    the Metrics bundle, and log scalars plus waveforms and prosody
    figures for the first PLOT_EXAMPLES examples.
    """
    if max_batches is None:
        max_batches = promonet_tpu.DEFAULT_EVALUATION_STEPS
    generator = generator_module()
    loss = loss_module

    @jax.jit
    def reconstruct(g_params, batch, frames):
        generated = generator.apply(
            g_params,
            *generator_args(batch),
            previous_samples=previous_samples_of(batch))
        mask = jnp.arange(batch['spectrograms'].shape[-1]) < frames
        return generated, loss.mel(
            batch['spectrograms'], generated, mask[None])

    metrics = promonet_tpu.evaluate.Metrics(include_wer=False)
    mel_total, count = 0., 0
    audio_logs, figure_logs = {}, {}

    from ..utils import pause

    for i, batch in enumerate(valid_loader):
        if i >= max_batches:
            break
        # Validation can legitimately run minutes with low client CPU
        # (server-side compiles); keep the wedge watchdog fed
        pause.heartbeat()
        # Validation batches are batch-size-1 (promonet/data/sampler.py:
        # 18-22) and may not divide the data axis: replicate them
        device_batch = promonet_tpu.parallel.replicate_batch(batch, mesh)
        length = int(batch['lengths'][0])
        generated, mel_loss = reconstruct(
            state['generator']['params'],
            device_batch,
            jnp.int32(length))
        mel_total += float(mel_loss)
        count += 1

        if promonet_tpu.SPECTROGRAM_ONLY:
            continue

        # Re-extract features from the generated audio and score
        waveform = np.asarray(
            generated)[0, :, :length * promonet_tpu.HOPSIZE]
        predicted = promonet_tpu.preprocess.from_audio(
            waveform,
            features=('loudness', 'pitch', 'periodicity', 'ppg'),
            loudness_bands=None)
        metrics.update(
            np.asarray(batch['loudness'][0, :, :length]).mean(axis=-2),
            np.asarray(predicted[0]).mean(axis=-2)[:length],
            batch['pitch'][0, :length],
            batch['periodicity'][0, :length],
            np.asarray(predicted[1])[0, :length],
            np.asarray(predicted[2])[0, :length],
            batch['ppg'][0, :, :length],
            np.asarray(predicted[3])[:, :length])

        if i < promonet_tpu.PLOT_EXAMPLES:
            stem = batch['stems'][0].replace('/', '-')
            audio_logs[f'audio/{stem}'] = waveform
            try:
                figure_logs[f'prosody/{stem}'] = \
                    promonet_tpu.plot.from_features(
                        audio=waveform,
                        loudness=np.asarray(predicted[0]),
                        pitch=np.asarray(predicted[1]),
                        periodicity=np.asarray(predicted[2]),
                        ppg=np.asarray(predicted[3]),
                        target_pitch=batch['pitch'][0, :length],
                        target_periodicity=batch['periodicity'][0, :length],
                        target_loudness=batch['loudness'][0, :, :length])
            except Exception as error:
                # Figures are a training signal in the reference
                # (promonet/train/core.py:375-420); report failures once
                # per run instead of silently dropping them
                if not getattr(evaluate, '_figure_error_logged', False):
                    evaluate._figure_error_logged = True
                    import traceback
                    print(
                        f'prosody figure for {stem} failed '
                        f'(suppressing further reports): {error!r}')
                    traceback.print_exc()

    if not count:
        return
    scalars = {'validation/mels': mel_total / count}
    if not promonet_tpu.SPECTROGRAM_ONLY:
        for name, value in metrics().items():
            if isinstance(value, dict):
                for sub, subvalue in value.items():
                    scalars[f'validation/{sub}'] = subvalue
            else:
                scalars[f'validation/{name}'] = value
    promonet_tpu.utils.log.update(
        directory,
        step,
        scalars=scalars,
        audio=audio_logs or None,
        sample_rate=promonet_tpu.SAMPLE_RATE,
        figures=figure_logs or None)
