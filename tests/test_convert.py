"""Unit-conversion tests (reference semantics: promonet/convert.py)"""
import numpy as np
import jax.numpy as jnp

import promonet_tpu


def test_db_ratio_roundtrip():
    assert np.isclose(promonet_tpu.convert.db_to_ratio(10.), 2.)
    assert np.isclose(promonet_tpu.convert.ratio_to_db(2.), 10.)
    for db in (-20., -3., 0., 6.):
        assert np.isclose(
            promonet_tpu.convert.ratio_to_db(
                promonet_tpu.convert.db_to_ratio(db)),
            db)


def test_cents_ratio_roundtrip():
    assert np.isclose(promonet_tpu.convert.cents_to_ratio(1200.), 2.)
    assert np.isclose(promonet_tpu.convert.ratio_to_cents(2.), 1200.)


def test_time_conversions():
    assert promonet_tpu.convert.seconds_to_frames(1.) == 86
    assert promonet_tpu.convert.frames_to_samples(10) == 2560
    assert promonet_tpu.convert.samples_to_frames(16384) == 64


def test_hz_to_bins_variable():
    distribution = np.exp(
        np.linspace(np.log(50.), np.log(550.), 256)).astype(np.float32)
    hz = jnp.asarray([50., 100., 550.])
    bins = promonet_tpu.convert.hz_to_bins(
        hz, pitch_distribution=distribution)
    assert bins.shape == (3,)
    assert int(bins[0]) <= 1
    assert int(bins[2]) == 255
    # Monotonic
    assert int(bins[0]) <= int(bins[1]) <= int(bins[2])


def test_bins_to_hz_within_range():
    distribution = np.exp(
        np.linspace(np.log(50.), np.log(550.), 256)).astype(np.float32)
    bins = jnp.asarray([0, 100, 255])
    hz = promonet_tpu.convert.bins_to_hz(
        bins, pitch_distribution=distribution)
    assert float(hz.min()) >= 50.
    assert float(hz.max()) <= 560.
