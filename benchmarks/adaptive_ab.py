"""Uniform vs residual-adaptive collocation A/B (ResidualAdaptiveGenerator).

The testbed is a 2-D Poisson problem with a manufactured sharp Gaussian
solution (length scale sigma) in the SCARCE-POINTS regime (256 trained
points/step vs a sigma=0.03 bump): uniform collocation under-resolves the
feature, while the RAD sampler (power strategy, Wu et al. 2023) concentrates
points where the residual lives — it reaches a given error in ~half the
steps, up to 3.4x lower max error at equal small budgets, converging to
parity at large ones (full curve in RESULTS.md). Both arms get the SAME
number of trained points per step; the adaptive arm additionally pays for
scoring `oversample x` candidates (forward-only residual, no parameter
gradient).

Honest flip side (measured, see RESULTS.md): on smooth/well-resolved
problems residual-adaptive selection converges SLOWER than uniform at equal
epochs (the score feedback adds gradient variance chasing the residual
tail); it is a tool for under-resolved sharp features, not a default.

Run: python benchmarks/adaptive_ab.py [--epochs N] [--sigma S]
Prints one JSON line per arm, then a side-by-side table.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neurodiffeq_tpu import diff  # noqa: E402
from neurodiffeq_tpu.conditions import DirichletBVP2D  # noqa: E402
from neurodiffeq_tpu.fields import exp as fexp  # noqa: E402
from neurodiffeq_tpu.generators import Generator2D, ResidualAdaptiveGenerator  # noqa: E402
from neurodiffeq_tpu.networks import FCNN  # noqa: E402
from neurodiffeq_tpu.solvers import Solver2D  # noqa: E402
from neurodiffeq_tpu.utils import set_seed  # noqa: E402


def make_problem(sigma):
    """Manufactured solution u* = exp(-(r/sigma)^2 / 2)-style Gaussian bump."""
    s2 = 2 * sigma ** 2

    def exact(x, y):
        return np.exp(-((x - 0.5) ** 2 + (y - 0.5) ** 2) / s2)

    def pde(u, x, y):
        g = fexp(-((x - 0.5) ** 2 + (y - 0.5) ** 2) / s2)
        lap_g = g * (((2 * (x - 0.5) / s2) ** 2 + (2 * (y - 0.5) / s2) ** 2) - 4 / s2)
        return [diff(u, x, 2) + diff(u, y, 2) - lap_g]

    return pde, exact


def run_arm(adaptive, epochs, sigma, grid=16, oversample=8, seed=1):
    pde, exact = make_problem(sigma)
    set_seed(seed)
    base = Generator2D((grid, grid), (0, 0), (1, 1), method='equally-spaced-noisy')
    gen = ResidualAdaptiveGenerator(base, oversample=oversample) if adaptive else base
    cond = DirichletBVP2D(
        x_min=0, x_min_val=lambda y: 0, x_max=1, x_max_val=lambda y: 0,
        y_min=0, y_min_val=lambda x: 0, y_max=1, y_max_val=lambda x: 0)
    solver = Solver2D(pde_system=pde, conditions=[cond], xy_min=(0, 0), xy_max=(1, 1),
                      nets=[FCNN(2, 1, hidden_units=(64, 64))],
                      train_generator=gen, n_batches_valid=0)
    t0 = time.perf_counter()
    solver.fit(max_epochs=epochs, tqdm_file=None)
    # force sync before stopping the timer (axon tunnel)
    final_loss = float(solver.metrics_history['train_loss'][-1])
    dt = time.perf_counter() - t0

    xs, ys = np.meshgrid(np.linspace(0, 1, 101), np.linspace(0, 1, 101))
    sol = solver.get_solution(best=False)
    u = np.asarray(sol(xs.ravel(), ys.ravel())).reshape(-1)
    max_err = float(np.abs(u - exact(xs.ravel(), ys.ravel())).max())
    n_points = grid * grid
    return dict(
        name='poisson2d_sharp_gaussian', arm='adaptive' if adaptive else 'uniform',
        sigma=sigma, epochs=epochs, trained_points_per_step=n_points,
        oversample=oversample if adaptive else 1,
        epochs_per_sec=round(epochs / dt, 1),
        points_per_sec=round(epochs * n_points / dt, 1),
        max_err_vs_exact=round(max_err, 5), final_train_loss=round(final_loss, 6))


def main():
    epochs = 4000
    sigma = 0.03
    if '--epochs' in sys.argv:
        epochs = int(sys.argv[sys.argv.index('--epochs') + 1])
    if '--sigma' in sys.argv:
        sigma = float(sys.argv[sys.argv.index('--sigma') + 1])
    rows = []
    # interleave arms in one process (tunnel variance; see RESULTS.md)
    for arm in (False, True):
        r = run_arm(arm, epochs, sigma)
        rows.append(r)
        print(json.dumps(r), flush=True)
    print("\n| arm | pts/s (trained) | max err vs exact | final loss |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['arm']} | {r['points_per_sec']} | {r['max_err_vs_exact']} "
              f"| {r['final_train_loss']} |")


if __name__ == '__main__':
    main()
