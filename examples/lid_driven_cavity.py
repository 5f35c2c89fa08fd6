"""Steady lid-driven cavity flow at Re=100 (the reference's
experiments/lid-driven-cavity-RE100.ipynb workload): coupled (u, v, p)
Navier-Stokes, one shared FCNN(2 -> 256 -> 3).

Two formulations:

- ``hard`` (default; the notebook's): constraints are built into the trial
  solution —

  * u = x(1-x)y(1-y)·ANN_u + y·u_T(x)  with the smoothed lid profile
    u_T(x) = (1 - e^{-50x})(1 - e^{50(x-1)}),
  * v = x(1-x)y(1-y)·ANN_v   (zero on all walls),
  * p = (1-e^{-x})(1-e^{-y})·ANN_p  (pins the pressure gauge).

- ``penalty``: soft boundary losses (the temporal-subsystem style).

Run: python examples/lid_driven_cavity.py [epochs] [hard|penalty]
(The reference notebook trains 50,000 epochs; a few thousand shows the vortex.)
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.networks import FCNN
from neurodiffeq_tpu.conditions import BaseCondition, NoCondition
from neurodiffeq_tpu.generators import Generator2D
from neurodiffeq_tpu.solvers import Solver2D
from neurodiffeq_tpu.utils import set_seed


def u_lid(x):
    """Smoothed lid velocity profile (the notebook's u_T_approximation)."""
    return (1 - F.exp(-50.0 * x)) * (1 - F.exp(50.0 * (x - 1)))


class HardCavityU(BaseCondition):
    """u vanishes on the three walls and equals u_T(x) on the lid (y=1)."""

    def parameterize(self, out, x, y):
        return x * (1 - x) * y * (1 - y) * out + y * u_lid(x)


class HardCavityV(BaseCondition):
    """v vanishes on all four boundaries."""

    def parameterize(self, out, x, y):
        return x * (1 - x) * y * (1 - y) * out


class HardCavityP(BaseCondition):
    """Pressure gauge: p(0, y) = p(x, 0) = 0."""

    def parameterize(self, out, x, y):
        return (1 - F.exp(-x)) * (1 - F.exp(-y)) * out


def navier_stokes(Re):
    nu = 1.0 / Re

    def ns(u, v, p, x, y):
        mom_x = (u * diff(u, x) + v * diff(u, y) + diff(p, x)
                 - nu * (diff(u, x, 2) + diff(u, y, 2)))
        mom_y = (u * diff(v, x) + v * diff(v, y) + diff(p, y)
                 - nu * (diff(v, x, 2) + diff(v, y, 2)))
        continuity = diff(u, x) + diff(v, y)
        return [mom_x, mom_y, continuity]

    return ns


def build_hard(Re=100.0, grid=64, hidden=256):
    """The notebook's configuration: shared FCNN(2, 3), hard constraints,
    64x64 random collocation grid."""
    import warnings
    net = FCNN(n_input_units=2, n_output_units=3, hidden_units=(hidden,))
    conds = [HardCavityU(), HardCavityV(), HardCavityP()]
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', DeprecationWarning)
        for i, c in enumerate(conds):
            c.set_impose_on(i)
    return Solver2D(
        pde_system=navier_stokes(Re),
        conditions=conds,
        xy_min=(0, 0), xy_max=(1, 1),
        nets=[net, net, net],
        train_generator=Generator2D((grid, grid), (0, 0), (1, 1), method='equally-spaced-noisy'),
        valid_generator=Generator2D((grid, grid), (0, 0), (1, 1), method='equally-spaced'),
        n_batches_valid=0,
    )


def build_penalty(Re=100.0, grid=32, hidden=256):
    class CavitySolver(Solver2D):
        def additional_loss(self, residual, funcs, coords):
            u, v, p = funcs
            x, y = coords
            xv, yv = x.value, y.value
            uv, vv = u.value, v.value
            on_wall = ((xv < 1e-2) | (xv > 1 - 1e-2) | (yv < 1e-2)).astype(xv.dtype)
            on_lid = (yv > 1 - 1e-2).astype(xv.dtype)
            bc = (((on_wall * uv) ** 2).mean() + ((on_wall * vv) ** 2).mean()
                  + ((on_lid * (uv - 1.0)) ** 2).mean() + ((on_lid * vv) ** 2).mean())
            return 10.0 * bc

    return CavitySolver(
        pde_system=navier_stokes(Re),
        conditions=[NoCondition(), NoCondition(), NoCondition()],
        xy_min=(0, 0), xy_max=(1, 1),
        nets=[FCNN(2, 1, hidden_units=(hidden,)) for _ in range(3)],
        train_generator=Generator2D((grid, grid), (0, 0), (1, 1), method='equally-spaced-noisy'),
        valid_generator=Generator2D((grid, grid), (0, 0), (1, 1), method='equally-spaced'),
    )


def main(epochs=3000, mode='hard', Re=100.0, plot_prefix='cavity'):
    set_seed(0)
    solver = build_hard(Re) if mode == 'hard' else build_penalty(Re)
    import time
    t0 = time.perf_counter()
    solver.fit(max_epochs=epochs)
    dt = time.perf_counter() - t0
    print(f"{mode}: {epochs} epochs in {dt:.1f}s ({epochs / dt:.0f} ep/s), "
          f"final train loss: {solver.metrics_history['train_loss'][-1]:.3e}")

    # center-line velocity profiles (classic cavity diagnostic, Ghia et al. 1982)
    sol = solver.get_solution()
    ys = np.linspace(0, 1, 17)
    u_mid, v_mid, _ = sol(0.5 * np.ones(17), ys)
    print("u(0.5, y):", np.round(np.asarray(u_mid).reshape(-1), 4))
    xs = np.linspace(0, 1, 17)
    _, v_x, _ = sol(xs, 0.5 * np.ones(17))
    print("v(x, 0.5):", np.round(np.asarray(v_x).reshape(-1), 4))

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        from neurodiffeq_tpu.monitors import StreamPlotMonitor2D

        # u / v / p field heatmaps
        n = 64
        gx, gy = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n), indexing='ij')
        uu, vv, pp = sol(gx.ravel(), gy.ravel())
        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        for ax, f, name in zip(axes, (uu, vv, pp), ('u', 'v', 'p')):
            im = ax.pcolormesh(gx, gy, np.asarray(f).reshape(n, n), shading='auto', cmap='RdBu_r')
            fig.colorbar(im, ax=ax)
            ax.set_title(name)
            ax.set_aspect('equal')
        fig.savefig(f'{plot_prefix}_fields.png', bbox_inches='tight', dpi=120)
        print(f"field plots saved to {plot_prefix}_fields.png")

        m = StreamPlotMonitor2D(xy_min=(0, 0), xy_max=(1, 1), pairs=[(0, 1)],
                                nx=24, ny=24, field_names=['velocity'])
        m.check(solver.nets, solver.conditions, solver.metrics_history,
                params=solver._expand_params(solver.params))
        m.fig.savefig(f'{plot_prefix}_streamlines.png', bbox_inches='tight')
        print(f"streamline plot saved to {plot_prefix}_streamlines.png")
    except Exception as e:
        print(f"(plotting skipped: {e})")
    return solver


if __name__ == '__main__':
    main(epochs=int(sys.argv[1]) if len(sys.argv) > 1 else 3000,
         mode=sys.argv[2] if len(sys.argv) > 2 else 'hard')
