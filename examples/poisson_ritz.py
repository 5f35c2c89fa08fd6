"""Deep Ritz vs strong form on 2-D Poisson — the variational-loss showcase.

    -laplacian(u) = 2 pi^2 sin(pi x) sin(pi y),  (x,y) in [0,1]^2
    u = 0 on the boundary,  analytic solution u = sin(pi x) sin(pi y)

Two formulations of the same problem through the same public API:

- **strong form**: residual ``u_xx + u_yy + f``, ``loss_fn='l2'`` —
  needs SECOND derivatives of the network (order-2 Taylor propagation).
- **Deep Ritz** (E & Yu 2018, arXiv:1710.00211): energy density
  ``1/2 (u_x^2 + u_y^2) - f u``, ``loss_fn='variational'`` — FIRST
  derivatives only (order-1 propagation), cheaper per collocation point.
  Classic Deep Ritz needs a boundary-penalty term; here ``DirichletBVP2D``
  enforces the boundary exactly by reparameterization
  (reference ``conditions.py:438-509``), so there is no penalty weight to
  tune and the energy's minimizer is the PDE solution outright.

No reference counterpart for the variational loss
(`/root/reference/neurodiffeq/losses.py` stops at residual norms).

Arms are interleaved in one process (R,S,R,S,...) and epochs/s reported as
medians, per the repo's benchmark hygiene (single-run TPU-tunnel timings
swing +-50%).

Measured (TPU v5e, 5000 epochs, 1024 pts, seed 0 — full 4-arm study in
`benchmarks/ritz_ab.py` / RESULTS.md): Ritz ~1.4-1.7x more epochs/s
(first derivatives only; artifact medians: 1.69x), max err 0.0066 with the 'halton' QMC sampler
used below vs 0.001 for the strong form. With iid sampling Ritz plateaus
at 0.027 — the energy's Monte-Carlo integration noise is the floor, which
is why this example pairs 'variational' with 'halton'.

Run: python examples/poisson_ritz.py [epochs] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.conditions import DirichletBVP2D
from neurodiffeq_tpu.generators import Generator2D
from neurodiffeq_tpu.solvers import Solver2D
from neurodiffeq_tpu.utils import set_seed

PI = np.pi


def f_term(x, y):
    return 2 * PI ** 2 * F.sin(PI * x) * F.sin(PI * y)


def strong_form(u, x, y):
    return [diff(u, x, 2) + diff(u, y, 2) + f_term(x, y)]


def energy_density(u, x, y):
    return [0.5 * (diff(u, x) ** 2 + diff(u, y) ** 2) - f_term(x, y) * u]


def solve(formulation, loss_fn, epochs, method):
    set_seed(0)
    cond = DirichletBVP2D(
        x_min=0.0, x_min_val=lambda y: 0 * y,
        x_max=1.0, x_max_val=lambda y: 0 * y,
        y_min=0.0, y_min_val=lambda x: 0 * x,
        y_max=1.0, y_max_val=lambda x: 0 * x,
    )
    solver = Solver2D(
        pde_system=formulation,
        conditions=[cond],
        xy_min=(0.0, 0.0), xy_max=(1.0, 1.0),
        loss_fn=loss_fn,
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
    return float(np.max(np.abs(pred - exact))), dt


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    results = {'ritz': [], 'strong': []}
    errs = {}
    for rep in range(reps):
        for name, formulation, loss_fn, method in (
                ('ritz', energy_density, 'variational', 'halton'),
                ('strong', strong_form, 'l2', 'equally-spaced-noisy')):
            err, dt = solve(formulation, loss_fn, epochs, method)
            results[name].append(epochs / dt)
            errs[name] = err
            print(f'rep {rep} {name:>6}: max err {err:.5f}, '
                  f'{epochs / dt:,.0f} epochs/s', flush=True)

    r = float(np.median(results['ritz']))
    s = float(np.median(results['strong']))
    print(f"\nmedian epochs/s over {reps} interleaved reps "
          f"({epochs} epochs, 1024 pts):")
    print(f"  Deep Ritz + halton (order-1): {r:,.0f} epochs/s, "
          f"max err {errs['ritz']:.5f}")
    print(f"  strong form (order-2):        {s:,.0f} epochs/s, "
          f"max err {errs['strong']:.5f}")
    print(f"  Ritz speedup: {r / s:.2f}x")


if __name__ == '__main__':
    main()
