"""Matmul-precision A/B over the five BASELINE configs.

Round-2 roofline analysis (RESULTS.md) showed the flagship step is VPU
(elementwise) bound with skinny matmuls, predicting bf16 matmuls change
nothing. This script checks that prediction on EVERY BASELINE config by
running each under the default f32 ("highest") matmul precision and under
``jax.default_matmul_precision('bfloat16')``, reporting throughput and the
final solution-quality number side by side.

Run: python benchmarks/precision_ab.py [--epochs N]
Prints one JSON line per (config, precision).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from benchmarks.configs import ALL_BENCHMARKS  # noqa: E402


def main():
    epochs = None
    if '--epochs' in sys.argv:
        epochs = int(sys.argv[sys.argv.index('--epochs') + 1])
    rows = []
    for bench in ALL_BENCHMARKS:
        for precision in ('default', 'bfloat16'):
            kwargs = {} if epochs is None else {'epochs': epochs}
            try:
                if precision == 'default':
                    result = bench(**kwargs)
                else:
                    with jax.default_matmul_precision('bfloat16'):
                        result = bench(**kwargs)
                result['matmul_precision'] = precision
            except Exception as e:  # pragma: no cover
                result = {'name': bench.__name__, 'matmul_precision': precision,
                          'error': f'{type(e).__name__}: {e}'}
            rows.append(result)
            print(json.dumps(result), flush=True)

    # compact side-by-side table
    names = sorted({r['name'] for r in rows if 'error' not in r})
    print("\n| config | f32 pts/s | bf16-matmul pts/s | f32 quality | bf16 quality |")
    print("|---|---|---|---|---|")
    for n in names:
        a = next(r for r in rows if r['name'] == n and r['matmul_precision'] == 'default')
        b = next(r for r in rows if r['name'] == n and r['matmul_precision'] == 'bfloat16')
        qk = next((k for k in a if 'err' in k or 'loss' in k.replace('epochs', '')), None)
        print(f"| {n} | {a.get('points_per_sec')} | {b.get('points_per_sec')} | "
              f"{a.get(qk)} | {b.get(qk)} |")


if __name__ == '__main__':
    main()
