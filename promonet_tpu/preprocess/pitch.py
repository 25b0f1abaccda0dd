"""Pitch and periodicity estimation.

TPU-native replacement for the reference's external `penn` + `torbi`
dependency (promonet/preprocess/core.py:64-86): frame-rate pitch in Hz and
periodicity in [0, 1], with optional Viterbi decoding.

The estimator is a normalized cross-correlation (NCCF) front-end — fully
jittable, FFT-based, batched over frames — producing a posteriorgram over
log-spaced candidate frequencies in [FMIN, FMAX], decoded either by argmax
or by the Pallas/scan Viterbi (ops/viterbi.py) with a triangular local
transition, mirroring penn's `decoder='viterbi'` with `center='half-hop'`
frame placement. Periodicity is the correlation value at the decoded lag.

A learned FCNF0++-style CNN can be swapped in for weight parity with penn
in a later stage; the interface (`from_audio` returning (pitch,
periodicity)) is identical.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import promonet_tpu
from ..ops import viterbi as viterbi_ops

# Analysis configuration
WINDOW = 512           # correlation window (samples)
CANDIDATES = 256       # number of log-spaced frequency candidates
TRANSITION_WIDTH = 9.  # triangular transition half-width (bins)
SOFTMAX_SCALE = 40.    # observation sharpening before decoding


def candidate_frequencies(fmin=None, fmax=None, num=CANDIDATES):
    """Log-spaced candidate frequencies in Hz"""
    fmin = promonet_tpu.FMIN if fmin is None else fmin
    fmax = promonet_tpu.FMAX if fmax is None else fmax
    return np.exp(
        np.linspace(np.log(fmin), np.log(fmax), num)).astype(np.float32)


@functools.partial(jax.jit, static_argnames=('hopsize', 'sample_rate'))
def posteriorgram(audio, sample_rate, hopsize):
    """Per-frame NCC over candidate frequencies

    Arguments
        audio: (1, T)
    Returns
        ncc: (frames, CANDIDATES) normalized cross-correlation in [-1, 1]
    """
    freqs = candidate_frequencies()
    max_lag = int(np.ceil(sample_rate / freqs[0])) + 1
    context = WINDOW + max_lag

    samples = audio[0]
    num_frames = samples.shape[-1] // hopsize

    # Frame centers at (i + 0.5) * hop (penn center='half-hop')
    centers = (np.arange(num_frames) + 0.5) * hopsize
    starts = np.round(centers - context / 2).astype(np.int64)
    pad_left = max(0, -starts.min())
    pad_right = max(0, int(starts.max()) + context - samples.shape[-1])
    padded = jnp.pad(samples, (pad_left, pad_right))
    idx = (starts + pad_left)[:, None] + np.arange(context)[None, :]
    frames = padded[idx]  # (frames, context)

    # Remove DC per frame
    frames = frames - frames.mean(axis=-1, keepdims=True)

    # Cross-correlation r[tau] = sum_{n<W} x[n] x[n+tau] via FFT
    n_fft = int(2 ** np.ceil(np.log2(context + WINDOW)))
    head = frames[:, :WINDOW]
    spec_head = jnp.fft.rfft(head, n=n_fft)
    spec_full = jnp.fft.rfft(frames, n=n_fft)
    corr = jnp.fft.irfft(jnp.conj(spec_head) * spec_full, n=n_fft)
    corr = corr[:, :max_lag + 1]  # r[0..max_lag]

    # Energy of the shifted window: e[tau] = sum_{n<W} x[n+tau]^2
    energy_kernel = jnp.ones((WINDOW,))
    sq = frames * frames
    cumsum = jnp.cumsum(
        jnp.pad(sq, ((0, 0), (1, 0))), axis=-1)
    # e[tau] = cumsum[tau + W] - cumsum[tau]
    tau = np.arange(max_lag + 1)
    energy = cumsum[:, tau + WINDOW] - cumsum[:, tau]
    e0 = energy[:, 0:1]

    ncc = corr / jnp.sqrt(e0 * energy + 1e-9)

    # Sample NCC at fractional candidate lags (log-spaced frequencies)
    lags = sample_rate / freqs  # descending, in (lag_min, max_lag]
    lag_left = np.floor(lags).astype(np.int32)
    lag_frac = jnp.asarray(lags - lag_left, dtype=ncc.dtype)
    ncc_left = ncc[:, lag_left]
    ncc_right = ncc[:, np.minimum(lag_left + 1, max_lag)]
    return ncc_left * (1 - lag_frac) + ncc_right * lag_frac


###############################################################################
# Learned estimator (penn-replacement slot)
###############################################################################


class PitchCNN:
    """FCNF0-style framewise pitch-posterior CNN.

    A learned alternative to the NCC front-end, matching penn's
    inference contract: audio frames in, per-frame posteriors over the
    candidate frequency bins out, decoded by the same Viterbi/argmax
    path. Weights load from ASSETS_DIR/checkpoints/pitch (e.g. ported
    penn FCNF0++ weights re-laid-out for these modules); without a
    checkpoint the DSP front-end should be used instead
    (PITCH_ESTIMATOR = 'dsp').
    """

    FRAME_SIZE = 1024

    class Model(nn.Module):
        channels: tuple = (128, 32, 32, 64, 128, 256)
        kernel_sizes: tuple = (32, 16, 8, 8, 8, 4)
        strides: tuple = (4, 2, 2, 1, 1, 1)
        num_bins: int = CANDIDATES

        @nn.compact
        def __call__(self, frames):
            """frames: (B, FRAME_SIZE) -> logits (B, num_bins)"""
            x = frames[..., None]  # (B, T, 1)
            for features, kernel, stride in zip(
                self.channels, self.kernel_sizes, self.strides
            ):
                x = nn.Conv(features, (kernel,), strides=(stride,))(x)
                x = nn.LayerNorm()(x)
                x = nn.relu(x)
            x = x.reshape(x.shape[0], -1)
            return nn.Dense(self.num_bins)(x)

    def __init__(self):
        self.module = self.Model()
        self.voicing_threshold = None
        checkpoint = promonet_tpu.ASSETS_DIR / 'checkpoints' / 'pitch'
        if checkpoint.exists():
            payload = promonet_tpu.utils.checkpoint.load(checkpoint)
            # device_put once: host numpy leaves would re-upload per
            # call. Init may run lazily inside an enclosing jit trace
            # (instance() from _front_end); the cache must hold real
            # arrays, not tracers
            with jax.ensure_compile_time_eval():
                self.params = jax.device_put(payload['params'])
            if 'voicing_threshold' in payload:
                self.voicing_threshold = float(payload['voicing_threshold'])
        else:
            with jax.ensure_compile_time_eval():
                self.params = jax.jit(self.module.init)(
                    jax.random.PRNGKey(0), jnp.zeros((1, self.FRAME_SIZE)))

    @classmethod
    def instance(cls):
        if not hasattr(cls, '_instance'):
            cls._instance = cls()
        return cls._instance

    def posteriorgram(self, audio, sample_rate, hopsize):
        """Per-frame bin scores, same layout as the NCC front-end"""
        return cnn_posteriorgram(self.params, audio, sample_rate, hopsize)


def cnn_posteriorgram(params, audio, sample_rate, hopsize):
    """Per-frame CNN bin logits with params passed EXPLICITLY.

    Must be a function of `params`, not of a cached instance: a jitted
    caller that closed over `PitchCNN.instance().params` would bake the
    weights into the compiled program as constants, and a same-shape
    call after the checkpoint changes (training writes a new one;
    test suites swap ASSETS_DIR) would silently reuse the stale weights
    (round-5 bug: order-dependent 2100-cent pitch errors).
    """
    samples = audio[0]
    num_frames = samples.shape[-1] // hopsize
    frame_size = PitchCNN.FRAME_SIZE
    centers = (np.arange(num_frames) + 0.5) * hopsize
    starts = np.round(centers - frame_size / 2).astype(np.int64)
    pad_left = max(0, -int(starts.min()))
    pad_right = max(
        0, int(starts.max()) + frame_size - samples.shape[-1])
    padded = jnp.pad(samples, (pad_left, pad_right))
    idx = (starts + pad_left)[:, None] + np.arange(frame_size)[None]
    frames = padded[idx]
    # Per-frame normalization (penn-style)
    frames = frames - frames.mean(axis=-1, keepdims=True)
    frames = frames / jnp.maximum(
        frames.std(axis=-1, keepdims=True), 1e-6)
    return PitchCNN.Model().apply(params, frames)


def _tone_frames(rng, count, frame_size, hopsize):
    """Domain-randomized harmonic-tone training data.

    The speech corpus concentrates F0 in the modal register; a CNN
    trained on it alone fails on out-of-domain signals (measured: 80%
    octave errors on a 500→315 Hz glide). Randomized tones cover the
    full [FMIN, FMAX] candidate range with randomized trajectories
    (constant/glide/vibrato/random-walk), harmonic rolloffs, amplitude
    modulation, and noise floors, so the learned front-end matches the
    NCC front-end's domain robustness.

    Returns (frames, bins, voiced): all frames are voiced.
    """
    sample_rate = promonet_tpu.SAMPLE_RATE
    log_fmin = np.log2(promonet_tpu.FMIN * 1.05)
    log_fmax = np.log2(promonet_tpu.FMAX * 0.95)
    freqs = candidate_frequencies()
    log_freqs = np.log(freqs)

    frames_list, bins_list = [], []
    collected = 0
    while collected < count:
        num_frames = int(rng.integers(32, 128))
        samples = num_frames * hopsize
        t = np.arange(samples) / sample_rate

        # F0 trajectory in log2-Hz
        kind = rng.integers(4)
        lo, hi = sorted(rng.uniform(log_fmin, log_fmax, 2))
        if kind == 0:                                   # constant
            logf = np.full(samples, rng.uniform(log_fmin, log_fmax))
        elif kind == 1:                                 # glide
            logf = np.linspace(lo, hi, samples)
            if rng.random() < 0.5:
                logf = logf[::-1].copy()
        elif kind == 2:                                 # vibrato
            center = rng.uniform(log_fmin + 0.1, log_fmax - 0.1)
            rate = rng.uniform(0.5, 7.)
            depth = rng.uniform(0.01, 0.1)
            logf = center + depth * np.sin(
                2 * np.pi * rate * t + rng.uniform(0, 2 * np.pi))
        else:                                           # random walk
            walk = np.cumsum(rng.standard_normal(num_frames)) * 0.02
            walk = np.clip(
                walk - walk.mean() + rng.uniform(lo, hi), log_fmin, log_fmax)
            logf = np.repeat(walk, hopsize)
        f0 = 2. ** np.clip(logf, log_fmin, log_fmax)

        # Harmonic stack with randomized rolloff and phases
        num_harmonics = int(rng.integers(1, 9))
        rolloff = rng.uniform(0.3, 0.95)
        phase = 2 * np.pi * np.cumsum(f0) / sample_rate
        audio = np.zeros(samples)
        nyquist = sample_rate / 2
        for k in range(1, num_harmonics + 1):
            amp = rolloff ** (k - 1)
            audio += amp * np.sin(k * phase + rng.uniform(0, 2 * np.pi)) * (
                (k * f0) < nyquist)

        # Amplitude modulation + noise floor
        mod_rate = rng.uniform(0.5, 6.)
        audio *= 0.55 + 0.45 * np.sin(
            2 * np.pi * mod_rate * t + rng.uniform(0, 2 * np.pi))
        peak = np.abs(audio).max() + 1e-9
        audio = audio / peak * rng.uniform(0.1, 0.9)
        snr_db = rng.uniform(10., 40.)
        noise = rng.standard_normal(samples)
        noise *= np.sqrt((audio ** 2).mean() / 10 ** (snr_db / 10))
        audio = (audio + noise).astype(np.float32)

        centers = (np.arange(num_frames) + 0.5) * hopsize
        starts = np.round(centers - frame_size / 2).astype(np.int64)
        padded = np.pad(audio, (frame_size, frame_size))
        idx = (starts + frame_size)[:, None] + np.arange(frame_size)[None]
        frames_list.append(padded[idx].astype(np.float32))

        frame_f0 = f0.reshape(num_frames, hopsize).mean(axis=-1)
        bins_list.append(np.abs(
            np.log(frame_f0)[:, None] - log_freqs[None]
        ).argmin(axis=-1).astype(np.int32))
        collected += num_frames

    frames = np.concatenate(frames_list)[:count]
    bins = np.concatenate(bins_list)[:count]
    return frames, bins, np.ones(len(frames), bool)


def train(
    dataset='synthetic',
    steps=4000,
    batch_size=128,
    learning_rate=2e-4,
    max_frames=120000,
    tone_fraction=0.4,
    output=None,
):
    """Train the FCNF0-style pitch CNN on ground-truth F0.

    The reference relies on pretrained penn weights
    (promonet/preprocess/core.py:64-86); zero-egress, supervision comes
    from the formant-synthesis corpus (data/synthetic.py), whose
    glottal-source frequency is known exactly at every frame.
    Cross-entropy over the candidate-frequency bins on voiced frames;
    after training, a voicing threshold over the posterior mass at the
    decoded bin is calibrated on held-out voiced/unvoiced frames and
    stored in the checkpoint (used by from_audio's unvoiced
    interpolation when PITCH_ESTIMATOR='cnn').

    Returns (median cents error, voicing accuracy) on held-out frames.
    """
    import optax

    cache = promonet_tpu.CACHE_DIR / dataset
    truths = sorted(cache.glob('*/*-truepitch.npy'))
    if not truths:
        raise FileNotFoundError(
            f'No F0 ground truth under {cache}; generate the corpus '
            'with promonet_tpu.data.synthetic.create(...)')

    hopsize = promonet_tpu.HOPSIZE
    frame_size = PitchCNN.FRAME_SIZE
    rng = np.random.default_rng(promonet_tpu.RANDOM_SEED)
    freqs = candidate_frequencies()
    log_freqs = np.log(freqs)

    frames_list, bins_list, voiced_list, speech_list = [], [], [], []
    collected = 0
    for truth in truths:
        stem = str(truth)[:-len('-truepitch.npy')]
        f0 = np.load(truth)
        voiced = np.load(f'{stem}-voiced.npy')
        audio = np.asarray(promonet_tpu.load.audio(f'{stem}.wav'))[0]
        num_frames = min(len(f0), audio.shape[-1] // hopsize)

        centers = ((np.arange(num_frames) + 0.5) * hopsize)
        starts = np.round(centers - frame_size / 2).astype(np.int64)
        pad = frame_size
        padded = np.pad(audio, (pad, pad))
        idx = (starts + pad)[:, None] + np.arange(frame_size)[None]
        frames = padded[idx]

        # Keep all voiced frames + a sample of unvoiced (for voicing
        # calibration)
        keep = voiced[:num_frames] | (rng.random(num_frames) < 0.25)
        frames_list.append(frames[keep].astype(np.float32))
        bins_list.append(np.abs(
            np.log(f0[:num_frames][keep])[:, None] -
            log_freqs[None]).argmin(axis=-1).astype(np.int32))
        voiced_list.append(voiced[:num_frames][keep])
        speech_list.append(np.ones(int(keep.sum()), bool))
        collected += int(keep.sum())
        if collected >= max_frames:
            break

    # Domain-randomized tones alongside the speech corpus (see
    # _tone_frames): coverage of the full candidate range
    if tone_fraction > 0:
        num_tones = int(collected * tone_fraction / (1 - tone_fraction))
        tone_frames, tone_bins, tone_voiced = _tone_frames(
            rng, num_tones, frame_size, hopsize)
        frames_list.append(tone_frames)
        bins_list.append(tone_bins)
        voiced_list.append(tone_voiced)
        speech_list.append(np.zeros(len(tone_voiced), bool))

    frames = np.concatenate(frames_list)
    bins = np.concatenate(bins_list)
    voiced = np.concatenate(voiced_list)
    speech = np.concatenate(speech_list)
    # Per-frame normalization matching inference
    frames = frames - frames.mean(axis=-1, keepdims=True)
    frames = frames / np.maximum(frames.std(axis=-1, keepdims=True), 1e-6)

    order = rng.permutation(len(frames))
    num_valid = max(1, len(order) // 20)
    valid_idx, train_idx = order[:num_valid], order[num_valid:]
    train_voiced = train_idx[voiced[train_idx]]

    module = PitchCNN.Model()
    params = module.init(
        jax.random.PRNGKey(promonet_tpu.RANDOM_SEED),
        jnp.zeros((1, frame_size)))
    optimizer = optax.adamw(
        optax.cosine_decay_schedule(learning_rate, steps), weight_decay=1e-4)
    opt_state = optimizer.init(params)

    # Device-resident frame bank: the tunneled attachment uploads at
    # ~1-2 MB/s, so shipping each 512 KB batch would dominate the step.
    # Upload once, gather batches on-device from host-sampled indices.
    # bf16 halves the one-time upload; inputs are unit-normalized so the
    # precision loss is inaudible to the classifier. The bank must be an
    # explicit jit ARGUMENT — a closure capture becomes a compile-time
    # constant shipped inside the (size-limited) remote-compile request.
    dev_frames = jax.device_put(frames.astype(jnp.bfloat16))
    dev_bins = jax.device_put(bins)

    @jax.jit
    def step_fn(params, opt_state, bank, bank_bins, batch_idx):
        batch_frames = jnp.take(
            bank, batch_idx, axis=0).astype(jnp.float32)
        targets = jnp.take(bank_bins, batch_idx, axis=0)

        def loss_fn(params):
            logits = module.apply(params, batch_frames)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, targets).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for step in range(steps):
        batch = rng.choice(train_voiced, batch_size).astype(np.int32)
        params, opt_state, loss = step_fn(
            params, opt_state, dev_frames, dev_bins, batch)
        if step % 1000 == 0:
            print(f'pitch train step {step}: loss {float(loss):.3f}',
                  flush=True)

    # Held-out evaluation: cents error on voiced frames, posterior-mass
    # voicing calibration over all frames
    @jax.jit
    def infer(params, bank, batch_idx):
        logits = module.apply(params, jnp.take(
            bank, batch_idx, axis=0).astype(jnp.float32))
        posterior = jax.nn.softmax(logits, axis=-1)
        decoded = jnp.argmax(logits, axis=-1)
        confidence = jnp.take_along_axis(
            posterior, decoded[:, None], axis=-1)[:, 0]
        return decoded, confidence

    pad_to = ((len(valid_idx) + 255) // 256) * 256
    vidx = np.concatenate([
        valid_idx, valid_idx[:pad_to - len(valid_idx)]]).astype(np.int32)
    decoded, confidence = (
        np.asarray(x)[:len(valid_idx)]
        for x in infer(params, dev_frames, vidx))
    vmask = voiced[valid_idx]
    cents = np.abs(
        log_freqs[decoded[vmask]] -
        log_freqs[bins[valid_idx][vmask]]) * 1200 / np.log(2)
    median_cents = float(np.median(cents)) if vmask.any() else float('nan')

    # Voicing threshold: best balanced accuracy over confidence quantiles.
    # Calibrated on SPEECH frames only — the domain-randomized tones
    # include extreme SNRs that would skew the operating point for the
    # signals this runs on at inference
    smask = speech[valid_idx]
    s_confidence = confidence[smask] if smask.any() else confidence
    s_voiced = vmask[smask] if smask.any() else vmask
    candidates = np.quantile(s_confidence, np.linspace(0.02, 0.98, 97))
    best_threshold, best_score = 0.5, -1.
    for threshold in candidates:
        predicted = s_confidence > threshold
        tpr = (predicted & s_voiced).sum() / max(s_voiced.sum(), 1)
        tnr = (~predicted & ~s_voiced).sum() / max((~s_voiced).sum(), 1)
        score = 0.5 * (tpr + tnr)
        if score > best_score:
            best_score, best_threshold = score, float(threshold)

    if output is None:
        output = promonet_tpu.ASSETS_DIR / 'checkpoints' / 'pitch'
    promonet_tpu.utils.checkpoint.save(
        output,
        jax.device_get(params),
        step=steps,
        voicing_threshold=np.asarray(best_threshold),
        median_cents=np.asarray(median_cents),
        voicing_accuracy=np.asarray(best_score))
    if hasattr(PitchCNN, '_instance'):
        del PitchCNN._instance
    return median_cents, float(best_score)


def _front_end(audio, sample_rate, hopsize, kind, cnn_params=None):
    """Posteriorgram front-end selected by EXPLICIT kind.

    Returns scores: NCC correlations in [-1, 1] for 'dsp', classifier
    logits for 'cnn' — _decode normalizes each to a proper observation
    distribution. `kind` and `cnn_params` are arguments (not config /
    instance reads) because this runs under jit: the program cache must
    key on the estimator and take the weights as inputs.
    """
    if kind == 'cnn':
        return cnn_posteriorgram(cnn_params, audio, sample_rate, hopsize)
    return posteriorgram(audio, sample_rate, hopsize)


def _decode(scores, decoder, kind='dsp'):
    freqs = jnp.asarray(candidate_frequencies())
    # Observation log-distribution: NCC values need sharpening to act
    # like log-probabilities; CNN logits are already calibrated by the
    # cross-entropy objective
    logits = SOFTMAX_SCALE * scores if kind == 'dsp' else scores
    if decoder == 'viterbi':
        observation = jax.nn.log_softmax(logits, axis=-1)
        transition = viterbi_ops.triangular_transition(
            scores.shape[-1], TRANSITION_WIDTH)
        initial = jnp.full((scores.shape[-1],), -jnp.log(scores.shape[-1]))
        bins = viterbi_ops.decode(observation, transition, initial)
    else:
        bins = jnp.argmax(scores, axis=-1)

    # Sub-bin refinement: the 256 log-spaced bins quantize pitch to
    # ~16 cents; take the local expected value of the observation
    # posterior in log-frequency around the decoded bin (penn's
    # "local expected value" decoding), recovering sub-bin precision
    # without changing the decoded path
    window = 4
    offsets = jnp.arange(-window, window + 1)
    neighbor_bins = jnp.clip(
        bins[:, None] + offsets[None, :], 0, scores.shape[-1] - 1)
    neighbor_scores = jnp.take_along_axis(logits, neighbor_bins, axis=-1)
    weights = jax.nn.softmax(neighbor_scores, axis=-1)
    log_freqs = jnp.log(freqs)
    refined_log = jnp.sum(weights * log_freqs[neighbor_bins], axis=-1)
    pitch = jnp.exp(refined_log)

    if kind == 'cnn':
        # Periodicity = posterior mass at the decoded bin (penn-style);
        # voicing confidence of a calibrated classifier
        posterior = jax.nn.softmax(logits, axis=-1)
        periodicity = jnp.take_along_axis(
            posterior, bins[:, None], axis=-1)[:, 0]
    else:
        # Periodicity = normalized autocorrelation at the decoded lag
        periodicity = jnp.clip(
            jnp.take_along_axis(scores, bins[:, None], axis=-1)[:, 0],
            0., 1.)
    return pitch, periodicity


@functools.partial(
    jax.jit,
    static_argnames=('sample_rate', 'hopsize', 'decoder', 'interp_at', 'kind'))
def _from_audio_jit(
        audio, cnn_params, sample_rate, hopsize, decoder, interp_at,
        kind='dsp'):
    """Full device-resident pitch extraction: front-end → decode → interp

    `kind` is a static cache key and `cnn_params` a program INPUT — see
    cnn_posteriorgram for why neither may be read from config/instance
    state inside the trace.
    """
    scores = _front_end(audio, sample_rate, hopsize, kind, cnn_params)
    pitch, periodicity = _decode(scores, decoder, kind)
    if interp_at is not None:
        # Interpolate pitch through unvoiced regions in log space
        # (penn interp_unvoiced_at semantics), with static shapes
        from ..ops import grid as grid_ops
        voiced = periodicity > interp_at
        pitch = jnp.exp(grid_ops.masked_interp(jnp.log(pitch), voiced))
    return pitch[None], periodicity[None]


def from_audio(
    audio,
    sample_rate=None,
    hopsize=None,
    fmin=None,
    fmax=None,
    decoder=None,
    interp_unvoiced_at='default'
):
    """Estimate pitch and periodicity

    Mirrors the reference's penn call signature semantics
    (promonet/preprocess/core.py:71-86). One device dispatch; results
    stay on device for fusion with downstream consumers.

    Arguments
        audio: (1, T)
    Returns
        pitch: (1, frames) in Hz
        periodicity: (1, frames) in [0, 1]
    """
    sample_rate = promonet_tpu.SAMPLE_RATE if sample_rate is None else sample_rate
    hopsize = promonet_tpu.HOPSIZE if hopsize is None else hopsize
    if decoder is None:
        decoder = (
            'viterbi' if promonet_tpu.VITERBI_DECODE_PITCH else 'argmax')
    kind = 'cnn' if promonet_tpu.PITCH_ESTIMATOR == 'cnn' else 'dsp'
    if interp_unvoiced_at == 'default':
        interp_unvoiced_at = promonet_tpu.VOICING_THRESHOLD
        if kind == 'cnn':
            # CNN periodicity is posterior mass, not correlation; use
            # the threshold calibrated on held-out data at train time
            calibrated = PitchCNN.instance().voicing_threshold
            if calibrated is not None:
                interp_unvoiced_at = calibrated
    cnn_params = PitchCNN.instance().params if kind == 'cnn' else {}
    return _from_audio_jit(
        jnp.asarray(audio), cnn_params, sample_rate, hopsize, decoder,
        interp_unvoiced_at, kind)


def from_file(audio_file, **kwargs):
    """Estimate pitch and periodicity from an audio file"""
    return from_audio(promonet_tpu.load.audio(audio_file), **kwargs)


def from_file_to_file(audio_file, output_prefix, **kwargs):
    """Estimate pitch/periodicity from a file and save with the reference's
    viterbi naming convention (promonet/edit/core.py:223-226)"""
    pitch, periodicity = from_file(audio_file, **kwargs)
    viterbi = '-viterbi' if promonet_tpu.VITERBI_DECODE_PITCH else ''
    promonet_tpu.load.save_array(f'{output_prefix}{viterbi}-pitch.npy', pitch)
    promonet_tpu.load.save_array(
        f'{output_prefix}{viterbi}-periodicity.npy', periodicity)
