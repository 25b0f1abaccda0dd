"""Aggregate evaluation results across configs/datasets into a table.

Script-equivalent of the reference's notebooks/parse_results.ipynb:
reads results/<config>/<dataset>/results.json trees and prints a
per-condition metric table plus RTF benchmarks.
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        '--results_dir',
        type=Path,
        default=None,
        help='Results directory (defaults to configured RESULTS_DIR)')
    args = parser.parse_args()

    if args.results_dir is None:
        import promonet_tpu
        args.results_dir = promonet_tpu.RESULTS_DIR

    rows = []
    for results_file in sorted(args.results_dir.glob('*/*/results.json')):
        config = results_file.parent.parent.name
        dataset = results_file.parent.name
        with open(results_file) as file:
            results = json.load(file)
        for condition, metrics in results.get('objective', {}).items():
            loudness = metrics.get('loudness', {})
            rows.append({
                'config': config,
                'dataset': dataset,
                'condition': condition,
                'pitch_cents': metrics.get('pitch'),
                'periodicity': metrics.get('periodicity'),
                'loudness_db': (
                    loudness.get('loudness')
                    if isinstance(loudness, dict) else loudness),
                'ppg_jsd': metrics.get('ppg'),
                'wer': metrics.get('wer'),
            })
        for phase, bench in results.get('benchmark', {}).items():
            rows.append({
                'config': config,
                'dataset': dataset,
                'condition': f'rtf/{phase}',
                'pitch_cents': None,
                'periodicity': None,
                'loudness_db': None,
                'ppg_jsd': bench.get('rtf'),
                'wer': None,
            })

    if not rows:
        print(f'No results found under {args.results_dir}')
        return

    columns = list(rows[0].keys())
    widths = {
        c: max(len(c), *(len(_fmt(r[c])) for r in rows)) for c in columns}
    print('  '.join(c.ljust(widths[c]) for c in columns))
    for row in rows:
        print('  '.join(_fmt(row[c]).ljust(widths[c]) for c in columns))


def _fmt(value):
    if value is None:
        return '-'
    if isinstance(value, float):
        return f'{value:.3f}'
    return str(value)


if __name__ == '__main__':
    main()
