"""Model shape/jit tests (SURVEY.md §4)"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import promonet_tpu

import pytest as _pytest

pytestmark = _pytest.mark.slow
from promonet_tpu.train.core import example_batch, generator_args


FRAMES = 16


def small_batch(batch_size=2):
    return example_batch(batch_size, FRAMES)


def test_generator_forward_shape():
    batch = small_batch()
    model = promonet_tpu.models.Generator.create(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), *generator_args(batch))
    audio = jax.jit(model.apply)(params, *generator_args(batch))
    assert audio.shape == (2, 1, FRAMES * promonet_tpu.HOPSIZE)
    assert audio.dtype == jnp.float32
    assert bool(jnp.isfinite(audio).all())
    assert float(jnp.abs(audio).max()) <= 1.


def test_generator_parameter_count():
    """HiFiGAN generator should be in the reference's ~15-40M range"""
    batch = small_batch(1)
    model = promonet_tpu.models.Generator.create(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), *generator_args(batch))
    count = sum(x.size for x in jax.tree.leaves(params))
    assert 10_000_000 < count < 50_000_000, count


def test_feature_prep_width():
    """Prepared features must match NUM_FEATURES (static.py:48-53)"""
    batch = small_batch()
    model = promonet_tpu.models.Generator.create(dtype=jnp.float32)
    features = model.apply(
        model.init(jax.random.PRNGKey(0), *generator_args(batch)),
        batch['loudness'],
        batch['pitch'],
        batch['periodicity'],
        batch['ppg'],
        method='prepare_features')
    assert features.shape == (2, FRAMES, promonet_tpu.NUM_FEATURES)


def test_discriminator_outputs():
    model = promonet_tpu.models.Discriminator.create(dtype=jnp.float32)
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (1, 1, FRAMES * 256)).astype(np.float32) * 0.1)
    params = model.init(jax.random.PRNGKey(0), audio, audio)
    logits_r, logits_f, fmaps_r, fmaps_f = model.apply(params, audio, audio)
    # Default config: 5 MPD + 1 CMB (defaults.py:170-181)
    assert len(logits_r) == len(logits_f) == 6
    assert len(fmaps_r) == len(fmaps_f) == 6
    # Real and fake structures match
    for fr, ff in zip(fmaps_r, fmaps_f):
        assert len(fr) == len(ff)
        for a, b in zip(fr, ff):
            assert a.shape == b.shape


def test_vocos_backbone():
    model = promonet_tpu.models.Vocos(dtype=jnp.float32)
    features = jnp.zeros((1, FRAMES, promonet_tpu.NUM_FEATURES))
    global_features = jnp.zeros((1, 1, promonet_tpu.GLOBAL_CHANNELS))
    params = model.init(jax.random.PRNGKey(0), features, global_features)
    audio = jax.jit(model.apply)(params, features, global_features)
    assert audio.shape == (1, FRAMES * promonet_tpu.HOPSIZE, 1)
    assert bool(jnp.isfinite(audio).all())


def test_fargan_backbone():
    model = promonet_tpu.models.FARGAN(dtype=jnp.float32)
    # +1 channel: pitch period (promonet/model/generator.py:191-195)
    features = jnp.concatenate(
        [
            jnp.zeros((1, FRAMES, promonet_tpu.NUM_FEATURES)),
            jnp.full((1, FRAMES, 1), 147.),
        ],
        axis=-1)
    global_features = jnp.zeros((1, 1, promonet_tpu.GLOBAL_CHANNELS))
    previous = jnp.zeros((1, 1, 512))
    params = model.init(
        {'params': jax.random.PRNGKey(0)},
        features, global_features, previous)
    audio = jax.jit(model.apply)(params, features, global_features, previous)
    assert audio.shape == (1, FRAMES * promonet_tpu.HOPSIZE, 1)
    assert bool(jnp.isfinite(audio).all())


def test_weight_norm_decomposition():
    """Effective kernel preserves the init values: g = ||v|| at init"""
    from promonet_tpu.models.modules import WNConv1d
    module = WNConv1d(8, 3, padding=1)
    x = jnp.zeros((1, 16, 4))
    params = module.init(jax.random.PRNGKey(0), x)
    v = params['params']['kernel_v']
    g = params['params']['kernel_g']
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
    np.testing.assert_allclose(np.asarray(g), np.asarray(norm), rtol=1e-5)


def test_slice_segments():
    segments = jnp.arange(24.).reshape(2, 1, 12)
    starts = jnp.asarray([2, -2])
    sliced = promonet_tpu.models.slice_segments(segments, starts, 4)
    np.testing.assert_allclose(
        np.asarray(sliced[0, 0]), [2., 3., 4., 5.])
    # Negative start -> left fill
    np.testing.assert_allclose(
        np.asarray(sliced[1, 0]), [0., 0., 12., 13.])


def test_default_checkpoint_resolution(monkeypatch, tmp_path):
    """Implicit default checkpoints resolve from RUNS_DIR/CONFIG and
    are rejected (None) when their shapes don't match the active config

    Reference behavior: synthesize defaults to a published trained
    model (promonet/synthesize/core.py:234-237); zero-egress, the
    run directory's latest checkpoint plays that role.
    """
    import jax
    import promonet_tpu
    from promonet_tpu.synthesize import core
    from promonet_tpu.train.core import example_batch, generator_args

    monkeypatch.setattr(promonet_tpu, 'HIFIGAN_UPSAMPLE_INITIAL_SIZE', 64)
    monkeypatch.setattr(promonet_tpu, 'RUNS_DIR', tmp_path)
    run = tmp_path / promonet_tpu.CONFIG

    # No run directory → no default
    assert core.default_checkpoint() is None

    # A checkpoint matching the active config resolves
    model = promonet_tpu.models.Generator.create()
    params = model.init(
        jax.random.PRNGKey(0), *generator_args(example_batch()))
    promonet_tpu.utils.checkpoint.save(
        run / 'generator-00000123', jax.device_get(params))
    core.default_checkpoint._compatible = {}
    resolved = core.default_checkpoint()
    assert resolved is not None and resolved.name == 'generator-00000123'

    # A checkpoint from a different architecture config is rejected
    monkeypatch.setattr(promonet_tpu, 'HIFIGAN_UPSAMPLE_INITIAL_SIZE', 32)
    core.default_checkpoint._compatible = {}
    assert core.default_checkpoint() is None
