"""Few-shot speaker adaptation.

Reference: promonet/adapt/core.py — cache the new speaker's audio,
augment, preprocess, partition, then continue training from a base
checkpoint for ADAPTATION_STEPS.
"""
import promonet_tpu


def speaker(name, files, checkpoint=None, gpu=None):
    """Perform speaker adaptation (promonet/adapt/core.py:17-98)

    Arguments
        name: speaker/dataset name for the adaptation run
        files: list of audio files of the target speaker
        checkpoint: base generator checkpoint directory
        gpu: unused (API parity)

    Returns
        The adaptation run directory
    """
    cache = promonet_tpu.CACHE_DIR / name
    speaker_dir = cache / '0000'
    speaker_dir.mkdir(parents=True, exist_ok=True)

    # Cache audio at the native rate with quiet-audio gain-up
    # (promonet/adapt/core.py:39-53)
    for i, file in enumerate(sorted(files)):
        audio, _ = promonet_tpu.utils.audio.load(
            file, promonet_tpu.SAMPLE_RATE)
        audio = promonet_tpu.data.download.normalize_gain(audio)
        promonet_tpu.utils.audio.save(
            speaker_dir / f'{i:06d}-100.wav',
            audio,
            promonet_tpu.SAMPLE_RATE)

    # Augment (promonet/adapt/core.py:55-58)
    promonet_tpu.data.augment.datasets([name])

    # Preprocess (promonet/adapt/core.py:61-64)
    promonet_tpu.data.preprocess.datasets([name])

    # Partition (promonet/adapt/core.py:67)
    promonet_tpu.partition.dataset(name)

    # Train from the base checkpoint (promonet/adapt/core.py:94-98)
    directory = promonet_tpu.RUNS_DIR / name
    promonet_tpu.train(
        directory,
        dataset=name,
        adapt_from=checkpoint)
    return directory
