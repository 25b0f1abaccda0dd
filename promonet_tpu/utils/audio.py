"""Audio file IO and resampling without torchaudio/librosa.

Replaces the reference's torchaudio.load/save + resample
(promonet/load.py:16-28, promonet/data/download/core.py:302-313) with
scipy-based IO. Returns numpy float32 in the reference's (channels, time)
layout.
"""
import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def load(file, target_sample_rate=None):
    """Load a wav file as float32 (1, T), resampled and downmixed to mono"""
    sample_rate, data = wavfile.read(file)

    # Normalize integer PCM to [-1, 1]
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.) / 128.
    else:
        data = data.astype(np.float32)

    # Mono
    if data.ndim == 2:
        data = data.mean(axis=1)

    # Resample
    if target_sample_rate is not None and sample_rate != target_sample_rate:
        data = resample(data, sample_rate, target_sample_rate)
        sample_rate = target_sample_rate

    return data[None], sample_rate


def resample(audio, sample_rate, target_sample_rate):
    """Polyphase resampling (replaces torchaudio.functional.resample)

    Near-coprime rate pairs (e.g. the pitch-augmentation trick's
    22050*ratio → 22050) would make resample_poly design filters with
    10^5+ taps; those fall back to FFT resampling, which is exact for
    band-limited signals and orders of magnitude faster.
    """
    if sample_rate == target_sample_rate:
        return audio
    gcd = np.gcd(int(sample_rate), int(target_sample_rate))
    up = int(target_sample_rate) // gcd
    down = int(sample_rate) // gcd
    if max(up, down) > 512:
        from scipy.signal import resample as fft_resample
        num = int(round(
            audio.shape[-1] * target_sample_rate / sample_rate))
        return fft_resample(audio, num, axis=-1).astype(np.float32)
    return resample_poly(audio, up, down, axis=-1).astype(np.float32)


def duration(file):
    """Audio file duration in seconds from the header (no data read)

    Replaces torchaudio.info (promonet/partition/core.py:308-313).
    """
    import wave
    with wave.open(str(file), 'rb') as handle:
        return handle.getnframes() / handle.getframerate()


def save(file, audio, sample_rate):
    """Save float32 audio (T,) or (1, T) as 16-bit PCM wav"""
    audio = np.asarray(audio)
    if audio.ndim == 2:
        audio = audio[0]
    audio = np.clip(audio, -1., 1.)
    wavfile.write(file, int(sample_rate), (audio * 32767).astype(np.int16))
