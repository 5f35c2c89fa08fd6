"""A/B for Deep Ritz variational training (`losses.variational`) and its
synergy with quasi-Monte-Carlo sampling (`method='halton'`).

One problem, four interleaved arms (R,S,R,S,... per rep, medians reported,
per the repo's tunnel-noise hygiene):

    -laplacian(u) = 2 pi^2 sin(pi x) sin(pi y)  on [0,1]^2, u|boundary = 0
    analytic solution u = sin(pi x) sin(pi y)

- ``strong`` / ``strong-halton``: residual ``u_xx + u_yy + f``, l2 loss
  (order-2 Taylor propagation).
- ``ritz`` / ``ritz-halton``: energy density ``1/2 |grad u|^2 - f u``,
  'variational' loss (order-1 propagation only). Exact Dirichlet
  reparameterization (DirichletBVP2D) replaces classic Deep Ritz's
  boundary penalty.

What the measured numbers show (TPU v5e, 5000 epochs, 1024 pts, seed 0 —
see `benchmarks/artifacts/ritz_ab_r04.jsonl` and RESULTS.md):

- Ritz trains ~1.4-1.7x more epochs/s (first derivatives only;
  the committed artifact's interleaved medians give 1.69x), BUT
- with iid/noisy-grid sampling it plateaus at ~27x worse error than the
  strong form (0.027 vs 0.001): the energy's Monte-Carlo integration
  noise, not optimization, is the floor.
- 'halton' sampling cuts the Ritz floor 4.1x (0.0272 -> 0.0066) while
  leaving the strong form unchanged — direct evidence the floor is
  integration error, and the reason the `variational` docstring
  recommends pairing it with QMC sampling.

Run: python benchmarks/ritz_ab.py [--quick]   (prints JSON lines)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')

from neurodiffeq_tpu import fields as F  # noqa: E402
from neurodiffeq_tpu.fields import diff  # noqa: E402
from neurodiffeq_tpu.conditions import DirichletBVP2D  # noqa: E402
from neurodiffeq_tpu.generators import Generator2D  # noqa: E402
from neurodiffeq_tpu.solvers import Solver2D  # noqa: E402
from neurodiffeq_tpu.utils import set_seed  # noqa: E402

PI = np.pi


def f_term(x, y):
    return 2 * PI ** 2 * F.sin(PI * x) * F.sin(PI * y)


def strong_form(u, x, y):
    return [diff(u, x, 2) + diff(u, y, 2) + f_term(x, y)]


def energy_density(u, x, y):
    return [0.5 * (diff(u, x) ** 2 + diff(u, y) ** 2) - f_term(x, y) * u]


ARMS = {
    'strong': (strong_form, 'l2', 'equally-spaced-noisy'),
    'ritz': (energy_density, 'variational', 'equally-spaced-noisy'),
    'strong_halton': (strong_form, 'l2', 'halton'),
    'ritz_halton': (energy_density, 'variational', 'halton'),
}


def run(formulation, loss_fn, method, epochs):
    set_seed(0)
    cond = DirichletBVP2D(
        x_min=0.0, x_min_val=lambda y: 0 * y,
        x_max=1.0, x_max_val=lambda y: 0 * y,
        y_min=0.0, y_min_val=lambda x: 0 * x,
        y_max=1.0, y_max_val=lambda x: 0 * x,
    )
    solver = Solver2D(
        pde_system=formulation, conditions=[cond],
        xy_min=(0.0, 0.0), xy_max=(1.0, 1.0), loss_fn=loss_fn,
        train_generator=Generator2D((32, 32), (0, 0), (1, 1), method=method),
        valid_generator=Generator2D((32, 32), (0, 0), (1, 1),
                                    method='equally-spaced'),
    )
    t0 = time.perf_counter()
    solver.fit(max_epochs=epochs, tqdm_file=None)
    dt = time.perf_counter() - t0
    xs, ys = np.meshgrid(np.linspace(0, 1, 101), np.linspace(0, 1, 101))
    pred = np.asarray(solver.get_solution(best=False)(xs.ravel(), ys.ravel()))
    exact = np.sin(PI * xs.ravel()) * np.sin(PI * ys.ravel())
    return float(np.max(np.abs(pred - exact))), epochs / dt


def main():
    quick = '--quick' in sys.argv
    epochs = 300 if quick else 5000
    reps = 1 if quick else 3

    eps = {k: [] for k in ARMS}
    errs = {k: [] for k in ARMS}
    for rep in range(reps):
        for name, (form, lf, method) in ARMS.items():
            err, e = run(form, lf, method, epochs)
            eps[name].append(e)
            errs[name].append(err)
            print(f"# rep {rep} {name:>14}: max err {err:.5f}, "
                  f"{e:,.0f} epochs/s", file=sys.stderr, flush=True)

    row = {'name': 'poisson_ritz_ab', 'epochs': epochs, 'reps': reps,
           'points': 1024}
    for name in ARMS:
        # medians across reps on both axes (same-seed reps are typically
        # bit-identical in error; the median guards against retrace jitter)
        row[f'{name}_max_err'] = round(float(np.median(errs[name])), 5)
        row[f'{name}_eps_median'] = round(float(np.median(eps[name])), 1)
    row['ritz_speedup'] = round(row['ritz_eps_median']
                                / row['strong_eps_median'], 3)
    row['halton_ritz_err_ratio'] = round(row['ritz_max_err']
                                         / row['ritz_halton_max_err'], 2)
    print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
