"""Chunk-boundary overhead A/B: no-op callback @100 vs no callbacks.

Round-3 measurement (benchmarks/RESULTS.md "callbacks off the critical
path"): a no-op callback at period 100 cost 3.4× because every chunk
boundary paid dispatch + a BLOCKING history fetch (~2 tunnel round trips).
Round 4 made history commits lazy (packed device buffers queued, folded into
host lists only on first `metrics_history` READ), so counter-only callback
boundaries cost dispatch only. Target: no-op @100 within ~1.5× of
no-callbacks over the tunnel.

Arms are interleaved within one process; medians of N segments per arm.
Also reports `solver._history_syncs` per arm (must be 0 during the fit for
the counter-only no-op arm).

Run on the TPU: python benchmarks/callback_overhead_ab.py [--epochs 2000]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_solver():
    from __graft_entry__ import _flagship_solver
    from neurodiffeq_tpu.utils import set_seed
    set_seed(0)
    return _flagship_solver(n_batches_valid=0)


class _Noop:
    """Counter-only no-op: fires every `period` local epochs, reads nothing."""

    def __init__(self, period=100):
        from neurodiffeq_tpu import callbacks as cb
        self._cond = cb.PeriodLocal(period=period)

    def make(self):
        from neurodiffeq_tpu import callbacks as cb

        class NoopAction(cb.ActionCallback):
            def __call__(self, solver):
                pass

        return NoopAction().conditioned_on(self._cond)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=2000)
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--period', type=int, default=100)
    args = ap.parse_args()

    solvers = {'plain': build_solver(), 'noop': build_solver()}
    noop = _Noop(args.period)

    def segment(name):
        solver = solvers[name]
        callbacks = [noop.make()] if name == 'noop' else []
        t0 = time.perf_counter()
        solver.fit(max_epochs=args.epochs, callbacks=callbacks, tqdm_file=None)
        # force sync WITHOUT reading metrics_history (that itself is the
        # lazy-history path under test): read back one param element
        _ = float(np.asarray(solver.params[0]['layers'][0]['b'])[0])
        dt = time.perf_counter() - t0
        syncs = solver._history_syncs
        solver._history_syncs = 0
        return args.epochs / dt, syncs

    # warmup/compile both arms
    for name in solvers:
        segment(name)
        solvers[name]._history_syncs = 0

    eps = {'plain': [], 'noop': []}
    syncs = {'plain': 0, 'noop': 0}
    for _ in range(args.reps):
        for name in ('plain', 'noop'):
            e, s = segment(name)
            eps[name].append(e)
            syncs[name] += s

    plain = float(np.median(eps['plain']))
    noop_eps = float(np.median(eps['noop']))
    print(json.dumps({
        'config': f'flagship laplace2d, {args.epochs} epochs, '
                  f'no-op callback @{args.period}, interleaved medians of {args.reps}',
        'no_callbacks_eps': round(plain, 1),
        'noop_at_period_eps': round(noop_eps, 1),
        'slowdown': round(plain / noop_eps, 2),
        'history_syncs_during_fit': syncs,
        'plain_reps': [round(x, 1) for x in eps['plain']],
        'noop_reps': [round(x, 1) for x in eps['noop']],
    }))


if __name__ == '__main__':
    main()
