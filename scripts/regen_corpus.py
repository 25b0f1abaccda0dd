"""Regenerate the formant-synthesis training corpus after a host wipe.

The corpus itself is not version-controlled (data/cache is ~GB of wavs +
features); only its deterministic inputs are: the partition JSON, the
fixed augmentation-ratio JSONs, and the pitch-distribution stats
(promonet_tpu/assets/). This script rebuilds the on-disk corpus to match
those committed assets:

1. formant-synthesize 24 speakers x 56 utterances (seeded RNG)
2. preprocess the originals (full-band loudness, like the reference's
   dataset preprocessing at promonet/data/preprocess/core.py:33-46)
3. apply pitch/loudness augmentation; verify the ratio JSONs reproduce
   the committed ones bit-for-bit (same seed, fixed sampler)
4. preprocess the augmented wavs
5. keep the committed pitch-distribution stats (the variable-bin pitch
   embedding of the released 100k checkpoint is defined against them)

Note: the original round-2 corpus randomized per-utterance duration in a
way that was not committed, so waveforms are statistically - not
bit- - identical to the wiped corpus. Speaker profiles drift with the
RNG stream, so continued training warm-starts from the released
generator params and lets the speaker table re-adapt.
"""
import json
import os
import sys
import time
from pathlib import Path

# Self-locate the repo instead of requiring PYTHONPATH (overwriting
# PYTHONPATH drops the TPU plugin's site dir from sys.path and breaks
# backend discovery)
sys.path.insert(0, str(Path(__file__).parent.parent))

# The corpus must be extracted with the SAME front-ends the flagship
# run trains against (runs/promonet/synthetic.py pins
# PITCH_ESTIMATOR='dsp'); extracting with the framework default ('cnn')
# silently shifts the stored pitch/periodicity distributions under the
# warm-started checkpoint
os.environ.setdefault(
    'PROMONET_TPU_CONFIG',
    str((__import__('pathlib').Path(__file__).parent.parent /
         'configs' / 'synthetic.py')))

import numpy as np

import promonet_tpu
from promonet_tpu.data import synthetic


def main():
    start = time.time()

    # 1 + 2. Generate + preprocess originals, write partition
    print('generating + preprocessing originals...', flush=True)
    synthetic.create(
        'synthetic',
        speakers=24,
        utterances=56,
        seconds=2.85,
        preprocess=True,
        formant=True)
    print(f'originals done in {time.time() - start:.1f}s', flush=True)

    # 3. Augment (deterministic; must reproduce the committed JSONs)
    committed = {}
    for kind in ('pitch', 'loudness'):
        file = promonet_tpu.AUGMENT_DIR / f'synthetic-{kind}.json'
        if file.exists():
            with open(file) as f:
                committed[kind] = json.load(f)
    t = time.time()
    promonet_tpu.data.augment.datasets(['synthetic'])
    print(f'augmented in {time.time() - t:.1f}s', flush=True)
    for kind, mapping in committed.items():
        file = promonet_tpu.AUGMENT_DIR / f'synthetic-{kind}.json'
        with open(file) as f:
            regenerated = json.load(f)
        if regenerated != mapping:
            diff = sum(
                1 for k in mapping
                if regenerated.get(k) != mapping[k])
            print(
                f'WARNING: {kind} ratios diverge from committed JSON '
                f'({diff}/{len(mapping)} stems)', flush=True)

    # 4. Preprocess augmented wavs
    cache = promonet_tpu.CACHE_DIR / 'synthetic'
    wavs = sorted(
        w for w in cache.glob('*/*.wav') if not w.stem.endswith('-100'))
    print(f'preprocessing {len(wavs)} augmented wavs...', flush=True)
    t = time.time()
    promonet_tpu.preprocess.from_files_to_files(
        wavs,
        [w.parent / w.stem for w in wavs],
        features=('loudness', 'pitch', 'periodicity', 'spectrogram', 'ppg'),
        loudness_bands=None)
    print(f'preprocessed in {time.time() - t:.1f}s', flush=True)

    # 5. Pitch distribution: committed stats stay authoritative
    stats = (
        promonet_tpu.ASSETS_DIR / 'stats' /
        'synthetic-256-loudness-pitch-viterbi.npy')
    if stats.exists():
        print(f'keeping committed pitch distribution {stats.name}',
              flush=True)
    else:
        dist = promonet_tpu.load.pitch_distribution('synthetic', 'train')
        print(f'recomputed pitch distribution: '
              f'min {dist.min():.1f} max {dist.max():.1f}', flush=True)

    print(f'corpus regenerated in {time.time() - start:.1f}s', flush=True)


if __name__ == '__main__':
    sys.exit(main())
