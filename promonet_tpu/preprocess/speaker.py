"""Speaker embeddings for zero-shot conditioning.

Reference: promonet/preprocess/speaker.py (WavLM x-vectors via
transformers). Resolution order here:

1. the WavLM x-vector checkpoint, when cached locally (exact parity);
2. the in-repo x-vector-style encoder trained on the formant-synthesis
   corpus (`train` below — zero-egress weight provenance, like the
   pitch/PPG extractors);
3. a deterministic spectral-statistics embedding, so the zero-shot
   pipeline stays functional with no weights at all.
"""
import functools

import numpy as np

import promonet_tpu

WAVLM_SAMPLE_RATE = 16000


def _wavlm():
    """Load the WavLM x-vector model if available; None otherwise"""
    if not hasattr(_wavlm, 'model'):
        try:
            from transformers import WavLMForXVector
            _wavlm.model = WavLMForXVector.from_pretrained(
                'microsoft/wavlm-base-plus-sv', local_files_only=True)
            _wavlm.model.eval()
        except Exception:
            _wavlm.model = None
    return _wavlm.model


def from_audio(audio, sample_rate=None):
    """Compute a unit-norm speaker embedding (WAVLM_EMBEDDING_CHANNELS,)

    Reference: promonet/preprocess/speaker.py:26-91 (L2-normalized
    x-vectors).
    """
    if sample_rate is None:
        sample_rate = promonet_tpu.SAMPLE_RATE
    audio = np.asarray(audio)
    if audio.ndim == 1:
        audio = audio[None]

    model = _wavlm()
    if model is not None:
        import torch
        resampled = promonet_tpu.utils.audio.resample(
            audio, sample_rate, WAVLM_SAMPLE_RATE)
        with torch.inference_mode():
            embedding = model(
                torch.from_numpy(resampled.astype(np.float32))
            ).embeddings[0].numpy()
        return embedding / np.linalg.norm(embedding)

    if (promonet_tpu.ASSETS_DIR / 'checkpoints' / 'speaker').exists():
        if sample_rate != promonet_tpu.SAMPLE_RATE:
            audio = promonet_tpu.utils.audio.resample(
                audio, sample_rate, promonet_tpu.SAMPLE_RATE)
        return encoder_embedding(audio)

    return spectral_embedding(audio)


###############################################################################
# Trained x-vector-style encoder
###############################################################################


class SpeakerEncoder:
    """x-vector-style embedding: mels → dilated TDNN → stats pool → dense

    Follows the x-vector recipe the reference's WavLM-SV head implements
    (promonet/preprocess/speaker.py:64-91): frame-level feature
    extraction, utterance-level statistics pooling (masked mean+std so
    padding does not bias the statistics), then a linear projection to
    the embedding space.
    """

    def __init__(self, embedding_channels=None, channels=192):
        import flax.linen as nn

        if embedding_channels is None:
            embedding_channels = promonet_tpu.WAVLM_EMBEDDING_CHANNELS

        class _Module(nn.Module):
            @nn.compact
            def __call__(self, mels, frames):
                # mels: (B, T, NUM_MELS); frames: (B,) valid frame counts
                import jax.numpy as jnp
                x = mels
                for kernel, dilation in ((5, 1), (3, 2), (3, 3), (1, 1)):
                    x = nn.Conv(
                        channels, (kernel,),
                        kernel_dilation=(dilation,),
                        padding='SAME')(x)
                    x = nn.LayerNorm()(x)
                    x = nn.relu(x)
                mask = (
                    jnp.arange(x.shape[-2])[None, :, None] <
                    frames[:, None, None])
                denom = jnp.maximum(frames[:, None].astype(x.dtype), 1.)
                mean = jnp.sum(x * mask, axis=-2) / denom
                var = jnp.sum(
                    ((x - mean[:, None]) ** 2) * mask, axis=-2) / denom
                pooled = jnp.concatenate(
                    [mean, jnp.sqrt(var + 1e-6)], axis=-1)
                return nn.Dense(embedding_channels)(pooled)

        self.module = _Module()


def _encoder():
    import jax
    import jax.numpy as jnp

    if not hasattr(_encoder, 'cache'):
        encoder = SpeakerEncoder()
        checkpoint = promonet_tpu.ASSETS_DIR / 'checkpoints' / 'speaker'
        if checkpoint.exists():
            # device_put once: host numpy leaves would re-upload per
            # call (outside any enclosing trace — the cache must hold
            # real arrays, not tracers)
            with jax.ensure_compile_time_eval():
                params = jax.device_put(
                    promonet_tpu.utils.checkpoint.load(
                        checkpoint)['params'])
        else:
            with jax.ensure_compile_time_eval():
                params = jax.jit(encoder.module.init)(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 16, promonet_tpu.NUM_MELS)),
                    jnp.full((1,), 16, jnp.int32))
        _encoder.cache = (encoder, params)
    return _encoder.cache


def encoder_embedding(audio):
    """Unit-norm embedding from the in-repo trained encoder"""
    import jax
    import jax.numpy as jnp

    encoder, params = _encoder()
    mels = np.swapaxes(np.asarray(
        promonet_tpu.preprocess.spectrogram.from_audio(
            np.asarray(audio), mels=True)), -1, -2)
    if mels.ndim == 2:
        mels = mels[None]
    frames = mels.shape[-2]
    # Pad to a small set of compiled lengths
    padded = 128 * ((frames + 127) // 128)
    mels = np.pad(mels, ((0, 0), (0, padded - frames), (0, 0)))

    @functools.partial(jax.jit)
    def apply(params, mels, count):
        return encoder.module.apply(params, mels, count)

    embedding = np.asarray(
        apply(params, mels, np.asarray([frames], np.int32)))[0]
    norm = np.linalg.norm(embedding)
    return (embedding / norm if norm > 0 else embedding).astype(np.float32)


def train(
    dataset='synthetic',
    steps=4000,
    batch_size=32,
    window=256,
    learning_rate=3e-4,
    output=None,
):
    """Train the speaker encoder on the formant-synthesis corpus.

    Zero-egress analogue of WavLM-SV pretraining
    (promonet/preprocess/speaker.py:64-91): cross-entropy speaker
    classification over mel windows through the x-vector architecture;
    the classifier head is discarded and the embedding trunk saved to
    ASSETS_DIR/checkpoints/speaker where `from_audio` auto-loads it.

    Returns held-out window classification accuracy.
    """
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import optax

    cache = promonet_tpu.CACHE_DIR / dataset
    wavs = sorted(cache.glob('*/*.wav'))
    speakers = sorted({w.parent.name for w in wavs})
    speaker_index = {s: i for i, s in enumerate(speakers)}
    if len(speakers) < 2:
        raise FileNotFoundError(
            f'Need ≥2 speakers under {cache}; generate the corpus with '
            'promonet_tpu.data.synthetic.create(...)')

    spectrogram = promonet_tpu.preprocess.spectrogram

    @functools.partial(jax.jit)
    def mels_of(audio):
        return jnp.swapaxes(
            spectrogram.from_audio(audio, mels=True), -1, -2)

    import re

    examples, labels, lengths = [], [], []
    for wav in wavs:
        # Original stems are NNNNNN-100 (ratio 1.00); skip augmented
        # copies (-pNNN / -lNNN suffixes and non-unit ratios)
        if not re.fullmatch(r'\d+-100', wav.stem):
            continue
        audio = np.asarray(promonet_tpu.load.audio(wav))
        frames = audio.shape[-1] // promonet_tpu.HOPSIZE
        padded_frames = ((frames + window - 1) // window) * window
        audio = np.pad(
            audio[:, :frames * promonet_tpu.HOPSIZE],
            ((0, 0), (0, (padded_frames - frames) * promonet_tpu.HOPSIZE)))
        mels = np.asarray(mels_of(jnp.asarray(audio)))[:padded_frames]
        for start in range(0, padded_frames, window):
            valid = min(window, frames - start)
            if valid < window // 4:
                continue
            examples.append(mels[start:start + window])
            labels.append(speaker_index[wav.parent.name])
            lengths.append(valid)
    examples = np.stack(examples).astype(np.float32)
    labels = np.asarray(labels, np.int32)
    lengths = np.asarray(lengths, np.int32)

    rng = np.random.default_rng(promonet_tpu.RANDOM_SEED)
    order = rng.permutation(len(examples))
    num_valid = max(1, len(order) // 20)
    valid_idx, train_idx = order[:num_valid], order[num_valid:]

    encoder = SpeakerEncoder()
    head = nn.Dense(len(speakers))
    key_enc, key_head = jax.random.split(
        jax.random.PRNGKey(promonet_tpu.RANDOM_SEED))
    params = encoder.module.init(
        key_enc,
        jnp.zeros((1, window, promonet_tpu.NUM_MELS)),
        jnp.full((1,), window, jnp.int32))
    head_params = head.init(
        key_head, jnp.zeros((1, promonet_tpu.WAVLM_EMBEDDING_CHANNELS)))

    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init((params, head_params))

    @jax.jit
    def step_fn(params, head_params, opt_state, mels, labels, counts):
        def loss_fn(both):
            params, head_params = both
            logits = head.apply(
                head_params, encoder.module.apply(params, mels, counts))
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        loss, grads = jax.value_and_grad(loss_fn)((params, head_params))
        updates, opt_state = optimizer.update(
            grads, opt_state, (params, head_params))
        (params, head_params) = optax.apply_updates(
            (params, head_params), updates)
        return params, head_params, opt_state, loss

    @jax.jit
    def accuracy_fn(params, head_params, mels, labels, counts):
        logits = head.apply(
            head_params, encoder.module.apply(params, mels, counts))
        return (jnp.argmax(logits, axis=-1) == labels).mean()

    for step in range(steps):
        batch = rng.choice(train_idx, batch_size)
        params, head_params, opt_state, loss = step_fn(
            params, head_params, opt_state,
            examples[batch], labels[batch], lengths[batch])
        if step % 500 == 0:
            acc = accuracy_fn(
                params, head_params,
                examples[valid_idx], labels[valid_idx], lengths[valid_idx])
            print(f'speaker train step {step}: loss {float(loss):.3f}, '
                  f'valid acc {float(acc):.3f}')

    accuracy = float(accuracy_fn(
        params, head_params,
        examples[valid_idx], labels[valid_idx], lengths[valid_idx]))

    if output is None:
        output = promonet_tpu.ASSETS_DIR / 'checkpoints' / 'speaker'
    promonet_tpu.utils.checkpoint.save(
        output,
        jax.device_get(params),
        step=steps,
        accuracy=np.asarray(accuracy))
    if hasattr(_encoder, 'cache'):
        del _encoder.cache
    return accuracy


def spectral_embedding(audio):
    """Deterministic fallback: per-band mel statistics, unit-normalized"""
    channels = promonet_tpu.WAVLM_EMBEDDING_CHANNELS
    mels = np.asarray(
        promonet_tpu.preprocess.spectrogram.from_audio(audio, mels=True))
    stats = np.concatenate([
        mels.mean(axis=-1),
        mels.std(axis=-1),
        np.percentile(mels, 10, axis=-1),
        np.percentile(mels, 90, axis=-1)]).ravel()
    if len(stats) < channels:
        stats = np.pad(stats, (0, channels - len(stats)))
    embedding = stats[:channels]
    norm = np.linalg.norm(embedding)
    return (embedding / norm if norm > 0 else embedding).astype(np.float32)


def from_file(audio_file):
    return from_audio(promonet_tpu.load.audio(audio_file))


def from_file_to_file(audio_file, output_file):
    promonet_tpu.load.save_array(output_file, from_file(audio_file))


def from_files_to_files(audio_files, output_files):
    for audio_file, output_file in zip(audio_files, output_files):
        from_file_to_file(audio_file, output_file)
