"""Run the full BASELINE.json benchmark suite; prints one JSON line per config.

Usage: python benchmarks/run_all.py [--quick]
"""
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.configs import ALL_BENCHMARKS  # noqa: E402


def main():
    quick = '--quick' in sys.argv
    kwargs = {'epochs': 200} if quick else {}
    for bench in ALL_BENCHMARKS:
        try:
            result = bench(**kwargs)
        except Exception as e:  # pragma: no cover
            result = {'name': bench.__name__, 'error': f'{type(e).__name__}: {e}'}
        print(json.dumps(result), flush=True)


if __name__ == '__main__':
    main()
