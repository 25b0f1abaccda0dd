"""Speech transcription (for WER evaluation).

Reference: promonet/preprocess/text.py (Whisper-large-v3 via the
transformers pipeline). Transcription is an offline, CPU-side evaluation
utility; when no local Whisper checkpoint is available the functions
raise with a clear message rather than attempting a download (zero-egress
environments).
"""
import promonet_tpu

WHISPER_SAMPLE_RATE = 16000


def _pipeline():
    if not hasattr(_pipeline, 'cache'):
        try:
            from transformers import pipeline
            _pipeline.cache = pipeline(
                'automatic-speech-recognition',
                model='openai/whisper-large-v3',
                chunk_length_s=30,
                model_kwargs={'local_files_only': True})
        except Exception as error:
            _pipeline.cache = error
    if isinstance(_pipeline.cache, Exception):
        raise RuntimeError(
            'Whisper checkpoint unavailable locally; transcription requires '
            'a cached openai/whisper-large-v3 model'
        ) from _pipeline.cache
    return _pipeline.cache


def from_audio(audio, sample_rate=None):
    """Transcribe speech audio (promonet/preprocess/text.py:24-99)"""
    import numpy as np
    if sample_rate is None:
        sample_rate = promonet_tpu.SAMPLE_RATE
    resampled = promonet_tpu.utils.audio.resample(
        np.asarray(audio), sample_rate, WHISPER_SAMPLE_RATE)
    return _pipeline()(resampled.squeeze(0))['text']


def from_file(audio_file):
    return from_audio(promonet_tpu.load.audio(audio_file))


def from_file_to_file(audio_file, output_file):
    with open(output_file, 'w', encoding='utf-8') as file:
        file.write(from_file(audio_file))


def from_files_to_files(audio_files, output_files):
    for audio_file, output_file in zip(audio_files, output_files):
        from_file_to_file(audio_file, output_file)


def normalize(text):
    """Lint text for WER computation

    Reference: promonet/preprocess/text.py:102-106 (Whisper's
    EnglishTextNormalizer); a dependency-free normalization with the same
    role: lowercase, strip punctuation, collapse whitespace.
    """
    import re
    text = text.lower()
    text = re.sub(r"[^\w\s']", ' ', text)
    text = re.sub(r'\s+', ' ', text)
    return text.strip()
