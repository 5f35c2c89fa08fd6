"""Run the full BASELINE.json benchmark suite; prints one JSON line per config.

Usage: python benchmarks/run_all.py [--quick] [--out artifacts/run_rNN.jsonl]

``--out`` also appends each result line to the given file, so a full run
leaves a committable artifact that the RESULTS.md tables trace to.
"""
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.configs import ALL_BENCHMARKS  # noqa: E402


def main():
    quick = '--quick' in sys.argv
    out_path = None
    if '--out' in sys.argv:
        out_path = sys.argv[sys.argv.index('--out') + 1]
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    kwargs = {'epochs': 200} if quick else {}
    for bench in ALL_BENCHMARKS:
        try:
            result = bench(**kwargs)
        except Exception as e:  # pragma: no cover
            result = {'name': bench.__name__, 'error': f'{type(e).__name__}: {e}'}
        line = json.dumps(result)
        print(line, flush=True)
        if out_path:
            with open(out_path, 'a') as f:
                f.write(line + '\n')


if __name__ == '__main__':
    main()
