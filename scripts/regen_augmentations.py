"""Regenerate augmented stems after the ratio-sampler fix.

Round-2's augment sampler deduped two-decimal ratio keys GLOBALLY across
all 1344 stems, walking collisions far out of range (keys up to 1393 →
13.9× pitch shifts). 89% of pitch-augmented training stems had ratios
beyond AUGMENTATION_RATIO_MAX=2, with F0 clipped at FMAX — teaching the
model to ignore its pitch input (the round-2 pitch-shift eval failure).
The reference only guards the ==100 alias
(promonet/data/augment/core.py:83-93).

This script:
1. deletes every augmented artifact (-p*/-l* wavs + cached features)
2. deletes stale pitch-distribution stats (they included the garbage)
3. re-runs augmentation with the fixed sampler
4. re-preprocesses the new augmented wavs (threaded, warm-first)
5. recomputes the pitch distribution for variable-bin embeddings
"""
import sys
import time

import promonet_tpu


def main():
    cache = promonet_tpu.CACHE_DIR / 'synthetic'

    # 1. Remove augmented artifacts
    removed = 0
    for path in sorted(cache.glob('*/*')):
        stem = path.stem
        # augmented stems look like '<utt>-100-p194' / '<utt>-100-l102'
        parts = stem.split('-')
        if len(parts) >= 3 and parts[-1][:1] in ('p', 'l') \
                and parts[-1][1:].isdigit():
            path.unlink()
            removed += 1
    print(f'removed {removed} augmented artifacts', flush=True)

    # 2. Stale stats
    stats_dir = promonet_tpu.ASSETS_DIR / 'stats'
    if stats_dir.exists():
        for f in stats_dir.glob('*.npy'):
            print(f'removing stale stats {f.name}', flush=True)
            f.unlink()

    # 3. Re-augment (same seed; fixed sampler keeps ratios in range)
    start = time.time()
    promonet_tpu.data.augment.datasets(['synthetic'])
    print(f'augmented in {time.time() - start:.1f}s', flush=True)

    # 4. Preprocess ONLY the new augmented wavs
    wavs = sorted(
        w for w in cache.glob('*/*.wav') if not w.stem.endswith('-100'))
    print(f'preprocessing {len(wavs)} augmented wavs', flush=True)
    start = time.time()
    promonet_tpu.preprocess.from_files_to_files(
        wavs,
        [w.parent / w.stem for w in wavs],
        features=('loudness', 'pitch', 'periodicity', 'spectrogram', 'ppg'),
        loudness_bands=None)
    print(f'preprocessed in {time.time() - start:.1f}s', flush=True)

    # 5. Recompute pitch distribution (train partition, new data)
    start = time.time()
    dist = promonet_tpu.load.pitch_distribution('synthetic', 'train')
    print(
        f'pitch distribution recomputed in {time.time() - start:.1f}s: '
        f'min {dist.min():.1f} max {dist.max():.1f}', flush=True)


if __name__ == '__main__':
    sys.exit(main())
