"""Native C++ data-IO runtime tests"""
import numpy as np
import pytest

import promonet_tpu
from promonet_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason='native toolchain unavailable')


@pytest.fixture
def tone(tmp_path):
    sr = promonet_tpu.SAMPLE_RATE
    signal = (0.5 * np.sin(
        2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)[None]
    path = tmp_path / 'tone.wav'
    promonet_tpu.utils.audio.save(path, signal, sr)
    return path, signal


def test_frames(tone):
    path, signal = tone
    assert native.wav_frames(path) == signal.shape[-1]


def test_chunk_parity(tone):
    """Native decode matches the scipy loader bit-for-bit (post-quantize)"""
    path, _ = tone
    reference, _ = promonet_tpu.utils.audio.load(path)
    chunk = native.wav_chunk(path, 1000, 2048)
    np.testing.assert_allclose(chunk, reference[0, 1000:3048], atol=1e-4)


def test_chunk_zero_padding(tone):
    path, signal = tone
    total = signal.shape[-1]
    out = native.wav_chunk(path, total - 100, 300)
    assert (out[100:] == 0).all()
    assert (out[:100] != 0).any()


def test_batch(tone):
    path, _ = tone
    reference, _ = promonet_tpu.utils.audio.load(path)
    batch = native.wav_batch([path] * 16, list(range(16)), 4096, threads=4)
    assert batch.shape == (16, 4096)
    for i in range(16):
        np.testing.assert_allclose(
            batch[i], reference[0, i:i + 4096], atol=1e-4)


def test_malformed_file(tmp_path):
    bad = tmp_path / 'bad.wav'
    bad.write_bytes(b'not a wav file at all')
    assert native.wav_frames(bad) == -1
    with pytest.raises(IOError):
        native.wav_chunk(bad, 0, 128)
