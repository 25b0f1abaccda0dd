"""Mel-vocoder baseline: reconstruction from spectrograms only.

Reference: promonet/baseline/mels.py (MelGenerator-based with the same
model-cache idiom as synthesis).
"""
import jax
import jax.numpy as jnp
import numpy as np

import promonet_tpu


def _cached_model(checkpoint):
    if not hasattr(_cached_model, 'cache'):
        _cached_model.cache = {}
    key = str(checkpoint)
    if key not in _cached_model.cache:
        model = promonet_tpu.models.MelGenerator.create()
        if checkpoint is None:
            num_freqs = promonet_tpu.WINDOW_SIZE // 2 + 1
            params = jax.jit(model.init)(
                jax.random.PRNGKey(0),
                jnp.full((1, num_freqs, 64), 1e-3),
                jnp.zeros((1,), jnp.int32),
                jnp.ones((1,)),
                jnp.ones((1,)))
        else:
            params = promonet_tpu.synthesize.load_params(checkpoint)
        apply = jax.jit(model.apply)
        _cached_model.cache[key] = (model, params, apply)
    return _cached_model.cache[key]


def from_features(
    spectrogram,
    speaker=0,
    spectral_balance_ratio=1.,
    loudness_ratio=1.,
    checkpoint=None,
    gpu=None
):
    """Reconstruct audio from a linear spectrogram (F, T)"""
    _, params, apply = _cached_model(checkpoint)
    audio = apply(
        params,
        jnp.asarray(spectrogram)[None],
        jnp.asarray([speaker], jnp.int32),
        jnp.asarray([spectral_balance_ratio], jnp.float32),
        jnp.asarray([loudness_ratio], jnp.float32))
    return np.asarray(audio[0])


def from_audio(audio, **kwargs):
    """Round-trip: spectrogram analysis then vocoding"""
    spectrogram = promonet_tpu.preprocess.spectrogram.from_audio(
        jnp.asarray(audio))
    return from_features(spectrogram, **kwargs)
