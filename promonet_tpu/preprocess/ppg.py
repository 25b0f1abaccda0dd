"""Phonetic posteriorgrams (PPGs).

TPU-native replacement for the external `ppgs` package the reference
depends on (promonet/preprocess/core.py:87-103): a frame-rate categorical
distribution over 40 phonemes.

The encoder is a jittable convolutional network over log-mels. Pretrained
`ppgs` weights can be ported into this architecture via
`load_params`; without a checkpoint the module still provides the full
interface (sparsify/grid/distance live in ops.sparse and ops.grid) so the
end-to-end pipeline runs, and the encoder can be trained from forced
alignments with `promonet_tpu.train`-style supervision.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import promonet_tpu

# 39 CMUdict phonemes + silence (the reference uses ppgs.PHONEMES;
# promonet/config/defaults.py:102 fixes PPG_CHANNELS = 40)
PHONEMES = [
    'aa', 'ae', 'ah', 'ao', 'aw', 'ay', 'b', 'ch', 'd', 'dh',
    'eh', 'er', 'ey', 'f', 'g', 'hh', 'ih', 'iy', 'jh', 'k',
    'l', 'm', 'n', 'ng', 'ow', 'oy', 'p', 'r', 's', 'sh',
    't', 'th', 'uh', 'uw', 'v', 'w', 'y', 'z', 'zh', '<silence>']

PHONEME_TO_INDEX_MAPPING = {p: i for i, p in enumerate(PHONEMES)}

SILENCE = '<silence>'

# Voiced phonemes (vowels, semivowels, nasals, voiced obstruents) — used by
# the PPG-aware time-stretch to exempt frames (promonet/edit/core.py:60-76)
VOICED = [
    'aa', 'ae', 'ah', 'ao', 'aw', 'ay', 'b', 'd', 'dh', 'eh', 'er', 'ey',
    'g', 'ih', 'iy', 'jh', 'l', 'm', 'n', 'ng', 'ow', 'oy', 'r', 'uh',
    'uw', 'v', 'w', 'y', 'z', 'zh']


class PPGEncoder(nn.Module):
    """Frame-rate phoneme classifier over log-mels"""

    channels: int = 256
    num_layers: int = 6
    num_phonemes: int = 40
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mels):
        """mels: (B, T, NUM_MELS) → log-posteriors (B, T, num_phonemes)"""
        x = mels.astype(self.dtype)
        for _ in range(self.num_layers):
            y = nn.Conv(
                self.channels,
                (self.kernel_size,),
                padding='SAME',
                dtype=self.dtype)(x)
            y = nn.LayerNorm(dtype=self.dtype)(y)
            y = nn.gelu(y)
            x = y if x.shape[-1] != self.channels else x + y
        x = nn.Dense(self.num_phonemes, dtype=self.dtype)(x)
        return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)


def _model():
    if not hasattr(_model, 'cache'):
        module = PPGEncoder(num_phonemes=promonet_tpu.PPG_CHANNELS)
        params = None
        checkpoint = promonet_tpu.ASSETS_DIR / 'checkpoints' / 'ppg'
        if checkpoint.exists():
            # device_put once: host numpy leaves would re-upload per
            # call (outside any enclosing trace — the cache must hold
            # real arrays, not tracers)
            with jax.ensure_compile_time_eval():
                params = jax.device_put(
                    promonet_tpu.utils.checkpoint.load(
                        checkpoint)['params'])
        else:
            # Init must run outside any enclosing trace: the cache holds
            # concrete arrays (a tracer here would leak across jits)
            with jax.ensure_compile_time_eval():
                params = jax.jit(module.init)(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 16, promonet_tpu.NUM_MELS)))
        _model.cache = (module, params)
    return _model.cache


@functools.partial(jax.jit, static_argnames=())
def _infer(params, mels):
    module = _model()[0]
    return module.apply(params, mels)


###############################################################################
# Training (zero-egress weight provenance)
###############################################################################


def train(
    dataset='synthetic',
    steps=3000,
    batch_size=32,
    window=256,
    learning_rate=1e-3,
    output=None,
):
    """Train the PPG encoder on frame-aligned phoneme labels.

    The reference gets PPGs from the pretrained `ppgs` package
    (promonet/preprocess/core.py:87-103); zero-egress, the equivalent
    supervision comes from the formant-synthesis corpus
    (data/synthetic.py), which writes the exact frame-rate phoneme
    alignment it spoke next to every waveform. Cross-entropy over
    40 phoneme classes on log-mel windows; the checkpoint lands at
    ASSETS_DIR/checkpoints/ppg where `from_audio` auto-loads it.

    Returns the held-out frame accuracy.
    """
    import optax

    cache = promonet_tpu.CACHE_DIR / dataset
    alignments = sorted(cache.glob('*/*-phonemes.npy'))
    if not alignments:
        raise FileNotFoundError(
            f'No phoneme alignments under {cache}; generate the corpus '
            'with promonet_tpu.data.synthetic.create(...)')

    # Build fixed-shape (window, NUM_MELS) examples with masks. Audio is
    # padded to a whole number of windows so mel extraction compiles for
    # a small set of shapes.
    spectrogram = promonet_tpu.preprocess.spectrogram
    hopsize = promonet_tpu.HOPSIZE

    @functools.partial(jax.jit)
    def mels_of(audio):
        return jnp.swapaxes(
            spectrogram.from_audio(audio, mels=True), -1, -2)

    examples, targets, masks = [], [], []
    for alignment in alignments:
        stem = str(alignment)[:-len('-phonemes.npy')]
        labels = np.load(alignment)
        audio = promonet_tpu.load.audio(f'{stem}.wav')
        frames = min(labels.shape[0], audio.shape[-1] // hopsize)
        padded_frames = ((frames + window - 1) // window) * window
        audio = np.pad(
            np.asarray(audio)[:, :frames * hopsize],
            ((0, 0), (0, (padded_frames - frames) * hopsize)))
        mels = np.asarray(mels_of(jnp.asarray(audio)))[:padded_frames]
        labels = np.pad(labels[:frames], (0, padded_frames - frames))
        mask = np.arange(padded_frames) < frames
        for start in range(0, padded_frames, window):
            sl = slice(start, start + window)
            examples.append(mels[sl])
            targets.append(labels[sl])
            masks.append(mask[sl])
    examples = np.stack(examples).astype(np.float32)
    targets = np.stack(targets).astype(np.int32)
    masks = np.stack(masks)

    # Held-out split by window
    rng = np.random.default_rng(promonet_tpu.RANDOM_SEED)
    order = rng.permutation(len(examples))
    num_valid = max(2, len(order) // 20)
    valid_idx, train_idx = order[:num_valid], order[num_valid:]

    module = PPGEncoder(num_phonemes=promonet_tpu.PPG_CHANNELS)
    params = module.init(
        jax.random.PRNGKey(promonet_tpu.RANDOM_SEED),
        jnp.zeros((1, window, promonet_tpu.NUM_MELS)))
    optimizer = optax.adamw(
        optax.cosine_decay_schedule(learning_rate, steps), weight_decay=1e-4)
    opt_state = optimizer.init(params)

    @jax.jit
    def step_fn(params, opt_state, mels, labels, mask):
        def loss_fn(params):
            log_probs = module.apply(params, mels)
            nll = -jnp.take_along_axis(
                log_probs, labels[..., None], axis=-1)[..., 0]
            return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy_fn(params, mels, labels, mask):
        predicted = jnp.argmax(module.apply(params, mels), axis=-1)
        correct = (predicted == labels) * mask
        return jnp.sum(correct) / jnp.maximum(jnp.sum(mask), 1.)

    for step in range(steps):
        batch = rng.choice(train_idx, batch_size)
        params, opt_state, loss = step_fn(
            params, opt_state,
            examples[batch], targets[batch], masks[batch])
        if step % 500 == 0:
            acc = accuracy_fn(
                params,
                examples[valid_idx], targets[valid_idx], masks[valid_idx])
            print(f'ppg train step {step}: loss {float(loss):.3f}, '
                  f'valid acc {float(acc):.3f}')

    accuracy = float(accuracy_fn(
        params, examples[valid_idx], targets[valid_idx], masks[valid_idx]))

    if output is None:
        output = promonet_tpu.ASSETS_DIR / 'checkpoints' / 'ppg'
    promonet_tpu.utils.checkpoint.save(
        output,
        jax.device_get(params),
        step=steps,
        accuracy=np.asarray(accuracy))
    # Invalidate the inference cache so new extractions use the weights
    if hasattr(_model, 'cache'):
        del _model.cache
    return accuracy


def from_audio(audio, sample_rate=None, gpu=None):
    """Compute PPGs from audio (1, T) → (PPG_CHANNELS, frames)"""
    module, params = _model()
    mels = promonet_tpu.preprocess.spectrogram.from_audio(
        jnp.asarray(audio), mels=True)
    log_probs = _infer(params, jnp.swapaxes(mels, -1, -2)[None])
    return jnp.exp(jnp.swapaxes(log_probs[0], -1, -2))


def from_file(audio_file, **kwargs):
    return from_audio(promonet_tpu.load.audio(audio_file), **kwargs)


def from_file_to_file(audio_file, output_file, **kwargs):
    promonet_tpu.load.save_array(
        output_file, np.asarray(from_file(audio_file, **kwargs)))


def from_files_to_files(audio_files, output_files, **kwargs):
    for audio_file, output_file in zip(audio_files, output_files):
        from_file_to_file(audio_file, output_file, **kwargs)
