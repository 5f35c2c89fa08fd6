"""1-D heat equation with exact initial + boundary enforcement (IBVP1D),
checked against the separable analytic solution and animated.

The reference's README/docs teach this workflow with Solver2D over (x, t)
(reference conditions.py:512-712 for IBVP1D, pde.py:341-375 for
make_animation). Here the whole train loop runs as one chunked on-device
scan, and the trained solution is exported as a portable StableHLO artifact
at the end (no reference analog).

Problem: u_t = k u_xx on x in [0, L], t in [0, T]
  - insulated-ends variant (Neumann): u(x,0) = cos(pi x / L),
    u_x(0,t) = u_x(L,t) = 0  ->  u* = cos(pi x/L) exp(-k (pi/L)^2 t)
  - fixed-ends variant (Dirichlet): u(x,0) = sin(pi x / L),
    u(0,t) = u(L,t) = 0      ->  u* = sin(pi x/L) exp(-k (pi/L)^2 t)

Run: python examples/heat_equation.py [epochs] [dirichlet|neumann]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.conditions import IBVP1D
from neurodiffeq_tpu.generators import Generator2D
from neurodiffeq_tpu.solvers import Solver2D
from neurodiffeq_tpu.utils import set_seed

K = 0.3
L = 2.0
T = 1.5


def build(variant='dirichlet'):
    if variant == 'dirichlet':
        cond = IBVP1D(
            x_min=0.0, x_max=L, t_min=0.0,
            t_min_val=lambda x: F.sin(np.pi / L * x),
            x_min_val=lambda t: 0 * t,
            x_max_val=lambda t: 0 * t,
        )
        exact = lambda x, t: np.sin(np.pi * x / L) * np.exp(-K * (np.pi / L) ** 2 * t)
    elif variant == 'neumann':
        cond = IBVP1D(
            x_min=0.0, x_max=L, t_min=0.0,
            t_min_val=lambda x: F.cos(np.pi / L * x),
            x_min_prime=lambda t: 0 * t,
            x_max_prime=lambda t: 0 * t,
        )
        exact = lambda x, t: np.cos(np.pi * x / L) * np.exp(-K * (np.pi / L) ** 2 * t)
    else:
        raise ValueError(f"unknown variant {variant!r}")

    solver = Solver2D(
        pde_system=lambda u, x, t: [diff(u, t) - K * diff(u, x, 2)],
        conditions=[cond],
        xy_min=(0, 0), xy_max=(L, T),
        train_generator=Generator2D((32, 32), (0, 0), (L, T), method='equally-spaced-noisy'),
        valid_generator=Generator2D((32, 32), (0, 0), (L, T), method='equally-spaced'),
    )
    return solver, exact


def main(epochs=3000, variant='dirichlet'):
    set_seed(1)
    solver, exact = build(variant)
    t0 = time.perf_counter()
    solver.fit(max_epochs=epochs, tqdm_file=None)
    dt = time.perf_counter() - t0
    print(f"{variant}: {epochs} epochs in {dt:.1f}s ({epochs / dt:.0f} ep/s), "
          f"final train loss {solver.metrics_history['train_loss'][-1]:.3e}")

    sol = solver.get_solution()
    xs = np.random.rand(200) * L
    ts = np.random.rand(200) * T
    err = np.abs(np.asarray(sol(xs, ts)) - exact(xs, ts)).max()
    print(f"max |u - analytic| on random points: {err:.2e}")

    # initial condition holds exactly (by construction, untrained or trained)
    x0 = np.linspace(0, L, 9)
    ic_err = np.abs(np.asarray(sol(x0, 0 * x0)) - exact(x0, 0 * x0)).max()
    print(f"initial-condition error (exact by construction): {ic_err:.1e}")

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        xs_g = np.linspace(0, L, 101)
        fig, ax = plt.subplots(figsize=(6, 4))
        for frac in (0.0, 0.25, 0.5, 1.0):
            t_val = frac * T
            u = np.asarray(sol(xs_g, t_val * np.ones_like(xs_g))).reshape(-1)
            ax.plot(xs_g, u, label=f't = {t_val:.2f}')
            ax.plot(xs_g, exact(xs_g, t_val), 'k:', lw=1)
        ax.legend()
        ax.set_xlabel('x')
        ax.set_ylabel('u')
        ax.set_title(f'heat equation ({variant}), dotted = analytic')
        fig.savefig('heat_profiles.png', dpi=110, bbox_inches='tight')
        print('saved heat_profiles.png')
    except Exception as e:  # pragma: no cover
        print(f'(plot skipped: {e})')

    # serving artifact: portable StableHLO with a symbolic batch dimension
    try:
        blob = sol.export(n_coords=2, path='heat_solution.stablehlo')
        print(f'exported serving artifact: heat_solution.stablehlo '
              f'({len(blob) / 1024:.0f} KB)')
    except Exception as e:  # pragma: no cover
        print(f'(export skipped: {e})')


if __name__ == '__main__':
    main(epochs=int(sys.argv[1]) if len(sys.argv) > 1 else 3000,
         variant=sys.argv[2] if len(sys.argv) > 2 else 'dirichlet')
