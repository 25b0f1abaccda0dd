"""Speech transcription (for WER evaluation).

Reference: promonet/preprocess/text.py (Whisper-large-v3 via the
transformers pipeline). Transcription is an offline, CPU-side evaluation
utility; when no local Whisper checkpoint is available, transcription
falls back to phoneme decoding through the trained PPG encoder
(CTC-style collapse of the frame posteriors) — on the formant-synthesis
corpus, whose reference transcripts ARE phone strings
(data/synthetic.py), WER over phone tokens is a phoneme error rate and
measures the same thing the reference's Whisper WER does:
intelligibility of the synthesized audio
(promonet/evaluate/metrics.py:306-310). With neither Whisper nor a PPG
checkpoint the functions raise rather than attempting a download
(zero-egress environments).
"""
import promonet_tpu

WHISPER_SAMPLE_RATE = 16000


def _pipeline():
    if not hasattr(_pipeline, 'cache'):
        try:
            # Never touch the network (zero egress): resolving the model
            # card online can hang for minutes on connection timeouts
            import os
            os.environ.setdefault('HF_HUB_OFFLINE', '1')
            os.environ.setdefault('TRANSFORMERS_OFFLINE', '1')
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


def available():
    """Whether some transcriber can run: cached Whisper, or a trained
    PPG-encoder checkpoint for the phoneme-decoding fallback"""
    if (promonet_tpu.ASSETS_DIR / 'checkpoints' / 'ppg').exists():
        return True
    try:
        _pipeline()
        return True
    except RuntimeError:
        return False


def from_audio(audio, sample_rate=None):
    """Transcribe speech audio (promonet/preprocess/text.py:24-99)"""
    import numpy as np
    if sample_rate is None:
        sample_rate = promonet_tpu.SAMPLE_RATE
    try:
        resampled = promonet_tpu.utils.audio.resample(
            np.asarray(audio), sample_rate, WHISPER_SAMPLE_RATE)
        return _pipeline()(resampled.squeeze(0))['text']
    except RuntimeError:
        if (promonet_tpu.ASSETS_DIR / 'checkpoints' / 'ppg').exists():
            return phonemes_from_audio(audio, sample_rate)
        raise


def phonemes_from_audio(audio, sample_rate=None):
    """Phone-string transcription by decoding the trained PPG encoder

    Frame argmax over the 40-phoneme posteriors, CTC-style collapse of
    repeats, silence dropped. Short blips (single frames) are removed —
    they are transition artifacts, not spoken phones.
    """
    import numpy as np
    from . import ppg as ppg_module
    if sample_rate is None:
        sample_rate = promonet_tpu.SAMPLE_RATE
    if sample_rate != promonet_tpu.SAMPLE_RATE:
        audio = promonet_tpu.utils.audio.resample(
            np.asarray(audio), sample_rate, promonet_tpu.SAMPLE_RATE)
    posteriors = np.asarray(ppg_module.from_audio(audio))
    ids = posteriors.argmax(axis=0)

    silence = ppg_module.PHONEME_TO_INDEX_MAPPING[ppg_module.SILENCE]
    phones, run_id, run_len = [], None, 0
    for i in np.concatenate([ids, [-1]]):
        if i == run_id:
            run_len += 1
            continue
        # Emit the finished run if it is long enough and not silence
        if run_id is not None and run_id != silence and run_len >= 2:
            phones.append(ppg_module.PHONEMES[run_id])
        run_id, run_len = i, 1
    return ' '.join(phones)


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
