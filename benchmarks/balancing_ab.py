"""A/B study: automatic residual-weight balancing on a stiff ODE system.

The reference supports no loss weighting at all; this repo adds static
per-equation ``residual_weights`` (solvers.py) and, measured here, the
adaptive :class:`~neurodiffeq_tpu.callbacks.AutoResidualWeightCallback`.

Test problem: the coupled oscillator ``u' = v, v' = -omega^2 u`` with
``omega = 10`` — the two residuals' scales (and gradient norms) differ by
``omega^2``, so unweighted training underfits badly, and the known-good
hand weight from nondimensionalizing the system is ``w = [1, 1/omega^2]``.

Arms:

- ``unweighted``      — reference behavior (all weights 1).
- ``hand``            — the nondimensionalization weight ``[1, 1/omega^2]``.
- ``gradnorm-raw``    — the popular inverse-gradient-norm prescription
                        (Wang/Teng/Perdikaris-style), applied UNDAMPED from
                        the first epoch. Demonstrates the starvation spiral:
                        weights collapse geometrically to the floor and the
                        run converges to a degenerate optimum (tiny loss,
                        useless solution).
- ``scale-raw``       — inverse-residual-scale weighting (w_k = 1/mean r_k^2),
                        the other obvious prescription; collapses the same
                        way (rich-get-richer: the already-well-fit equation
                        gets up-weighted).
- ``auto (shipped)``  — AutoResidualWeightCallback defaults: damped log-space
                        step, per-fire clip, min-weight floor, auto-freeze.

Run: ``python benchmarks/balancing_ab.py [--epochs 10000]``.
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])

OMEGA = 10.0


def make_solver(residual_weights=None):
    from neurodiffeq_tpu import diff
    from neurodiffeq_tpu.solvers import Solver1D
    from neurodiffeq_tpu.conditions import IVP
    from neurodiffeq_tpu.networks import FCNN, SinActv

    eqs = lambda u, v, t: [diff(u, t) - v, diff(v, t) + OMEGA ** 2 * u]
    return Solver1D(
        ode_system=eqs,
        conditions=[IVP(0.0, 1.0), IVP(0.0, 0.0)],
        t_min=0.0, t_max=1.0,
        nets=[FCNN(hidden_units=(64, 64), actv=SinActv) for _ in range(2)],
        residual_weights=residual_weights,
    )


def solution_error(solver):
    ts = np.linspace(0.0, 1.0, 400)
    u, v = solver.get_solution()(ts, to_numpy=True)
    return float(max(np.abs(u - np.cos(OMEGA * ts)).max(),
                     np.abs(v + OMEGA * np.sin(OMEGA * ts)).max() / OMEGA))


def run_arm(name, epochs, residual_weights=None, callback=None, seed=11):
    from neurodiffeq_tpu.utils import set_seed
    from neurodiffeq_tpu import callbacks as cb

    set_seed(seed)
    solver = make_solver(residual_weights=residual_weights)
    callbacks = []
    if callback is not None:
        callbacks = [callback.conditioned_on(
            cb.OnFirstLocal() | cb.PeriodLocal(period=500))]
    t0 = time.perf_counter()
    solver.fit(epochs, callbacks=callbacks, tqdm_file=None)
    dt = time.perf_counter() - t0
    err = solution_error(solver)
    w = solver.residual_weights
    print(f"{name:16s} err={err:.4f}  final_loss="
          f"{solver.metrics_history['train_loss'][-1]:.3e}  "
          f"weights={['%.5f' % x for x in w] if w else 'None'}  ({dt:.0f}s)")
    return err


def _raw_gradnorm():
    """The undamped prescription, for the collapse demonstration:
    rate=1, no clip — w jumps straight to the measured target each fire."""
    from neurodiffeq_tpu.callbacks import AutoResidualWeightCallback
    return AutoResidualWeightCallback(rate=1.0, clip=1e9, min_weight=1e-30,
                                      freeze_tol=1e-12,
                                      freeze_patience=10 ** 9)


def _raw_scale():
    """Inverse-residual-scale weighting (w_k = 1/mean r_k^2), undamped."""
    import jax.numpy as jnp
    from neurodiffeq_tpu.callbacks import ActionCallback
    from neurodiffeq_tpu.utils import next_rng_key

    class _Cb(ActionCallback):
        def __call__(self, solver):
            cols = solver.generator['train'].sample(next_rng_key())
            funcs, coords = solver._forward(solver.params, cols)
            ms = np.asarray(jnp.mean(
                solver._residuals(funcs, coords, weighted=False).value ** 2,
                axis=0), dtype=float)
            w = 1.0 / np.maximum(ms, 1e-30)
            w = np.maximum(w / w.max(), 1e-30)
            solver.residual_weights = [float(x) for x in w]
            solver._invalidate_compiled()

    return _Cb()


def main():
    from neurodiffeq_tpu.callbacks import AutoResidualWeightCallback

    p = argparse.ArgumentParser()
    p.add_argument('--epochs', type=int, default=10000)
    args = p.parse_args()

    run_arm('unweighted', args.epochs)
    run_arm('hand 1/omega^2', args.epochs,
            residual_weights=[1.0, 1.0 / OMEGA ** 2])
    run_arm('gradnorm-raw', args.epochs, callback=_raw_gradnorm())
    run_arm('scale-raw', args.epochs, callback=_raw_scale())
    run_arm('auto (shipped)', args.epochs,
            callback=AutoResidualWeightCallback())


if __name__ == '__main__':
    main()
