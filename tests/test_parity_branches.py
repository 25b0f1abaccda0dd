"""The gated pretrained-extractor parity branches must actually execute.

The WavLM x-vector and Whisper transcription branches only run when a
locally cached checkpoint exists (zero-egress), which this environment
never has — so a typo in those branches would ship unnoticed
(VERDICT round-2 weak #7). These tests install tiny local stand-ins at
the same seams the real models occupy (`speaker._wavlm.model`,
`text._pipeline.cache`) and drive the full branch: resampling, torch
inference, output extraction, normalization.

Reference behavior: promonet/preprocess/speaker.py:26-91,
promonet/preprocess/text.py:24-106.
"""
import numpy as np
import pytest
import torch

import promonet_tpu
from promonet_tpu.preprocess import speaker, text


class FakeWavLMForXVector(torch.nn.Module):
    """Same calling convention as transformers.WavLMForXVector:
    (batch, samples) float32 in, `.embeddings` (batch, dim) out."""

    def __init__(self, dim):
        super().__init__()
        self.proj = torch.nn.Linear(64, dim)
        self.calls = []

    def forward(self, audio):
        self.calls.append(tuple(audio.shape))
        # Deterministic non-trivial features: first 64 binned energies
        frames = audio.shape[-1] // 64 * 64
        feats = audio[:, :frames].reshape(audio.shape[0], -1, 64).mean(1)
        out = type('XVectorOutput', (), {})()
        out.embeddings = self.proj(feats)
        return out


def test_wavlm_branch(monkeypatch):
    """from_audio routes through a (fake) cached WavLM x-vector model"""
    dim = promonet_tpu.WAVLM_EMBEDDING_CHANNELS
    fake = FakeWavLMForXVector(dim)
    monkeypatch.setattr(speaker._wavlm, 'model', fake, raising=False)

    seconds = 1.0
    audio = np.sin(
        2 * np.pi * 220 * np.arange(int(seconds * promonet_tpu.SAMPLE_RATE))
        / promonet_tpu.SAMPLE_RATE).astype(np.float32)
    embedding = speaker.from_audio(audio, promonet_tpu.SAMPLE_RATE)

    assert embedding.shape == (dim,)
    assert np.isclose(np.linalg.norm(embedding), 1.0, atol=1e-5)
    # The branch resampled to WavLM's 16 kHz before inference
    (batch, samples), = fake.calls
    assert batch == 1
    assert abs(samples - seconds * speaker.WAVLM_SAMPLE_RATE) < 32


def test_whisper_branch(monkeypatch):
    """from_audio routes through a (fake) cached Whisper pipeline"""
    calls = []

    def fake_pipeline(audio_array):
        calls.append(np.asarray(audio_array))
        return {'text': ' Hello world.'}

    monkeypatch.setattr(text._pipeline, 'cache', fake_pipeline,
                        raising=False)

    seconds = 0.5
    audio = np.random.default_rng(0).standard_normal(
        (1, int(seconds * promonet_tpu.SAMPLE_RATE))).astype(np.float32)
    transcript = text.from_audio(audio)

    assert transcript == ' Hello world.'
    resampled, = calls
    # Whisper receives mono 16 kHz audio
    assert resampled.ndim == 1
    assert abs(len(resampled) - seconds * text.WHISPER_SAMPLE_RATE) < 32
    assert text.normalize(transcript) == 'hello world'


def test_whisper_unavailable_falls_back_to_ppg(monkeypatch):
    """No cached Whisper → phoneme decoding via the trained PPG encoder"""
    monkeypatch.setattr(
        text._pipeline, 'cache',
        RuntimeError('no local whisper'), raising=False)
    assert (promonet_tpu.ASSETS_DIR / 'checkpoints' / 'ppg').exists()

    from promonet_tpu.data import synthetic
    audio = synthetic.generate_utterance(
        np.random.default_rng(5), 1.0)
    transcript = text.from_audio(audio)
    # Phone-string fallback: space-separated phoneme tokens
    assert isinstance(transcript, str)
    assert all(
        token in promonet_tpu.preprocess.ppg.PHONEMES
        for token in transcript.split())


def test_transcriber_available_with_ppg_checkpoint(monkeypatch):
    monkeypatch.setattr(
        text._pipeline, 'cache',
        RuntimeError('no local whisper'), raising=False)
    assert text.available()
