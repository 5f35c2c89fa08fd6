"""Steady lid-driven cavity flow at Re=100 (the reference's
experiments/lid-driven-cavity-RE100.ipynb workload): coupled (u, v, p)
Navier-Stokes with penalty boundary conditions.

Run: python examples/lid_driven_cavity.py [epochs]
(The reference notebook trains 50,000 epochs; a few thousand shows the vortex.)
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.networks import FCNN
from neurodiffeq_tpu.conditions import NoCondition
from neurodiffeq_tpu.generators import Generator2D
from neurodiffeq_tpu.solvers import Solver2D
from neurodiffeq_tpu.utils import set_seed


def main(epochs=3000, Re=100.0, grid=32, hidden=256):
    set_seed(0)
    nu = 1.0 / Re

    def navier_stokes(u, v, p, x, y):
        mom_x = (u * diff(u, x) + v * diff(u, y) + diff(p, x)
                 - nu * (diff(u, x, 2) + diff(u, y, 2)))
        mom_y = (u * diff(v, x) + v * diff(v, y) + diff(p, y)
                 - nu * (diff(v, x, 2) + diff(v, y, 2)))
        continuity = diff(u, x) + diff(v, y)
        return [mom_x, mom_y, continuity]

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

    solver = CavitySolver(
        pde_system=navier_stokes,
        conditions=[NoCondition(), NoCondition(), NoCondition()],
        xy_min=(0, 0), xy_max=(1, 1),
        nets=[FCNN(2, 1, hidden_units=(hidden,)) for _ in range(3)],
        train_generator=Generator2D((grid, grid), (0, 0), (1, 1), method='equally-spaced-noisy'),
        valid_generator=Generator2D((grid, grid), (0, 0), (1, 1), method='equally-spaced'),
    )
    solver.fit(max_epochs=epochs)
    print(f"final train loss: {solver.metrics_history['train_loss'][-1]:.3e}")

    # center-line velocity profile (classic cavity diagnostic)
    sol = solver.get_solution()
    ys = np.linspace(0, 1, 11)
    u_mid, v_mid, _ = sol(0.5 * np.ones(11), ys)
    print("u(0.5, y):", np.round(np.asarray(u_mid), 3))

    try:
        import matplotlib
        matplotlib.use('Agg')
        from neurodiffeq_tpu.monitors import StreamPlotMonitor2D
        m = StreamPlotMonitor2D(xy_min=(0, 0), xy_max=(1, 1), pairs=[(0, 1)],
                                nx=24, ny=24, field_names=['velocity'])
        m.check(solver.nets, solver.conditions, solver.metrics_history, params=solver.params)
        m.fig.savefig('cavity_streamlines.png', bbox_inches='tight')
        print("streamline plot saved to cavity_streamlines.png")
    except Exception as e:
        print(f"(plotting skipped: {e})")


if __name__ == '__main__':
    main(epochs=int(sys.argv[1]) if len(sys.argv) > 1 else 3000)
