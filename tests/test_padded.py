"""Bucket-resident feature threading (ops/padded.py).

The api chain preprocess → edit → synthesize keeps features padded to
bucket shapes on device; these tests pin (a) the wrapper's array
protocols, (b) numerical parity between the padded fast path and the
exact-length path, and (c) that the fast path actually engages.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import promonet_tpu
from promonet_tpu.ops.padded import PaddedFeature, as_padded, unwrap


def test_protocols():
    data = jnp.arange(24., dtype=jnp.float32).reshape(2, 12)
    feature = PaddedFeature(data, 9)
    assert feature.shape == (2, 9)
    assert feature.bucket == 12
    assert feature.ndim == 2
    assert len(feature) == 2
    np.testing.assert_array_equal(
        np.asarray(feature), np.asarray(data)[:, :9])
    np.testing.assert_array_equal(
        np.asarray(jnp.asarray(feature)), np.asarray(data)[:, :9])
    np.testing.assert_array_equal(
        np.asarray(feature[0]), np.asarray(data)[0, :9])
    np.testing.assert_allclose(
        np.asarray(feature * 2.), 2. * np.asarray(data)[:, :9])
    np.testing.assert_allclose(
        np.asarray(1. + feature), 1. + np.asarray(data)[:, :9])


def test_as_padded_edge_fill():
    value = np.array([[1., 2., 3.]], np.float32)
    feature = as_padded(value, bucket=8)
    assert feature.frames == 3 and feature.bucket == 8
    # Edge replication keeps the tail finite AND log-safe
    np.testing.assert_array_equal(np.asarray(feature.data)[0, 3:], 3.)


def test_unwrap_mismatch():
    a = PaddedFeature(jnp.zeros((1, 8)), 5)
    b = PaddedFeature(jnp.zeros((1, 8)), 6)
    assert unwrap(a, b) is None
    assert unwrap(a, np.zeros((1, 5))) is None
    arrays, frames = unwrap(a, PaddedFeature(jnp.ones((2, 8)), 5))
    assert frames == 5 and len(arrays) == 2


@pytest.mark.slow
def test_padded_chain_parity(audio):
    """Padded api chain ≈ exact-length chain through host numpy"""
    features = promonet_tpu.preprocess.from_audio(
        np.asarray(audio), loudness_bands=None)
    assert all(isinstance(f, PaddedFeature) for f in features)

    kwargs = dict(
        pitch_shift_cents=150., time_stretch_ratio=1.25,
        loudness_scale_db=-2.)
    edited = promonet_tpu.edit.from_features(*features, **kwargs)
    assert all(isinstance(f, PaddedFeature) for f in edited)

    # Exact-length reference: same inputs through the host path
    host = [np.asarray(f) for f in features]
    expected = promonet_tpu.edit.from_features(*host, **kwargs)
    for fast, exact in zip(edited, expected):
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(exact), rtol=1e-4, atol=1e-4)

    # Synthesis: identical program inputs except pad-tail contents, which
    # only perturb the trimmed output inside the conv receptive field of
    # the boundary; compare the interior, with the margin derived from
    # the generator's ACTUAL receptive field (28 frames at the default
    # architecture — the full MRF kernel extent, an upper bound on how
    # far the pad tail reaches)
    from promonet_tpu.models.hifigan import receptive_field_frames
    out_fast = promonet_tpu.synthesize.from_features(*edited, speaker=0)
    out_exact = promonet_tpu.synthesize.from_features(
        *[np.asarray(f) for f in expected], speaker=0)
    assert out_fast.shape == out_exact.shape
    margin = receptive_field_frames() * promonet_tpu.HOPSIZE
    assert out_fast.shape[-1] > 2 * margin, 'test clip too short for margin'

    # PCM16 wire format: same program modulo the output quantization
    out_pcm = promonet_tpu.synthesize.from_features(
        *edited, speaker=0, output_dtype='int16')
    assert np.asarray(out_pcm).dtype == np.int16
    np.testing.assert_allclose(
        np.asarray(out_pcm).astype(np.float32) / 32767.,
        np.clip(np.asarray(out_fast), -1., 1.),
        atol=1.5 / 32767.)
    np.testing.assert_allclose(
        np.asarray(out_fast)[..., :-margin],
        np.asarray(out_exact)[..., :-margin],
        rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_padded_no_stretch(audio):
    features = promonet_tpu.preprocess.from_audio(
        np.asarray(audio), loudness_bands=None)
    edited = promonet_tpu.edit.from_features(
        *features, pitch_shift_cents=100.)
    assert all(isinstance(f, PaddedFeature) for f in edited)
    assert edited[1].frames == features[1].frames
    host = promonet_tpu.edit.from_features(
        *[np.asarray(f) for f in features], pitch_shift_cents=100.)
    for fast, exact in zip(edited, host):
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(exact), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_padded_return_grid(audio):
    features = promonet_tpu.preprocess.from_audio(
        np.asarray(audio), loudness_bands=None)
    *edited, grid = promonet_tpu.edit.from_features(
        *features, time_stretch_ratio=1.5, return_grid=True)
    frames = features[1].frames
    out_frames = round(frames / 1.5)
    assert np.asarray(grid).shape == (out_frames,)
    np.testing.assert_allclose(float(np.asarray(grid)[-1]), frames - 1)
    assert edited[1].frames == out_frames
