"""One optimizer step per model family / config variant.

Covers the reference's config matrix dimensions: backbone selection
(hifigan/vocos/fargan), spectrogram-only (MelGenerator), zero-shot
speaker conditioning, and the FARGAN loss recipe (no mel loss +
spectral convergence, config/fargan.py).
"""
import numpy as np
import jax
import pytest

import promonet_tpu

import pytest as _pytest

pytestmark = _pytest.mark.slow
from promonet_tpu.train.core import (
    create_state,
    example_batch,
    make_train_step)


FRAMES = 8


def _shrink(monkeypatch):
    monkeypatch.setattr(promonet_tpu, 'HIFIGAN_UPSAMPLE_INITIAL_SIZE', 64)
    monkeypatch.setattr(promonet_tpu, 'VOCOS_CHANNELS', 64)
    monkeypatch.setattr(promonet_tpu, 'VOCOS_POINTWISE_CHANNELS', 128)
    monkeypatch.setattr(promonet_tpu, 'VOCOS_LAYERS', 2)
    monkeypatch.setattr(promonet_tpu, 'MULTI_PERIOD_DISCRIMINATOR', False)
    # Adversary-off: these tests cover the GENERATOR families, and the
    # discriminator fwd/bwd dominates the one-step CPU compile. The
    # full adversarial step stays covered by tests/test_train.py and
    # tests/test_models.py
    monkeypatch.setattr(promonet_tpu, 'DISCRIMINATOR_START_STEP', 10**9)
    monkeypatch.setattr(
        promonet_tpu, 'ADVERSARIAL_LOSS_START_STEP', 10**9)


def _step(batch_size=2):
    batch = example_batch(batch_size, FRAMES)
    if promonet_tpu.ZERO_SHOT:
        batch['speakers'] = np.zeros(
            (batch_size, promonet_tpu.WAVLM_EMBEDDING_CHANNELS), np.float32)
    state = create_state(jax.random.PRNGKey(0))
    step_fn = make_train_step()
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(state)
    return jax.device_get(metrics)


def test_vocos_train_step(monkeypatch):
    _shrink(monkeypatch)
    monkeypatch.setattr(promonet_tpu, 'MODEL', 'vocos')
    metrics = _step()
    assert np.isfinite(metrics['loss/generator/total'])


def test_fargan_train_step(monkeypatch):
    """FARGAN with its loss recipe (configs/fargan.py)"""
    _shrink(monkeypatch)
    monkeypatch.setattr(promonet_tpu, 'MODEL', 'fargan')
    monkeypatch.setattr(promonet_tpu, 'MEL_LOSS', False)
    monkeypatch.setattr(promonet_tpu, 'SPECTRAL_CONVERGENCE_LOSS', True)
    metrics = _step()
    assert np.isfinite(metrics['loss/generator/total'])
    assert 'loss/generator/spectral-convergence' in metrics


def test_spectrogram_only_train_step(monkeypatch):
    """MelGenerator path (configs/baselines/mels.py)"""
    _shrink(monkeypatch)
    monkeypatch.setattr(promonet_tpu, 'SPECTROGRAM_ONLY', True)
    metrics = _step()
    assert np.isfinite(metrics['loss/generator/total'])


def test_zero_shot_forward(monkeypatch):
    """WavLM x-vector conditioning (configs/promonet-zeroshot.py)"""
    _shrink(monkeypatch)
    monkeypatch.setattr(promonet_tpu, 'ZERO_SHOT', True)
    import jax.numpy as jnp
    from promonet_tpu.train.core import generator_args
    batch = example_batch(2, FRAMES)
    batch['speakers'] = np.random.default_rng(0).standard_normal(
        (2, promonet_tpu.WAVLM_EMBEDDING_CHANNELS)).astype(np.float32)
    model = promonet_tpu.models.Generator.create(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), *generator_args(batch))
    audio = model.apply(params, *generator_args(batch))
    assert audio.shape == (2, 1, FRAMES * promonet_tpu.HOPSIZE)
    assert bool(jnp.isfinite(audio).all())
