"""Speaker embeddings for zero-shot conditioning.

Reference: promonet/preprocess/speaker.py (WavLM x-vectors via
transformers). When the `transformers` WavLM checkpoint is available
locally it is used (CPU, offline path); otherwise a deterministic
spectral-statistics embedding of the same dimensionality keeps the
zero-shot pipeline functional.
"""
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

    return spectral_embedding(audio)


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
