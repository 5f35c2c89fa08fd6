"""End-to-end 3-D cartesian solve: GenericSolver + Generator3D + a custom
hard-constraint condition (the reference exercises 3-D only through the
spherical solvers; this pins the dimension-agnostic path with a
manufactured solution)."""
import numpy as np

from neurodiffeq_tpu.conditions import BaseCondition
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.generators import Generator3D
from neurodiffeq_tpu.networks import FCNN
from neurodiffeq_tpu.solvers import GenericSolver
from neurodiffeq_tpu.utils import set_seed


class ZeroBoundaryBox(BaseCondition):
    """u = 64 x(1-x) y(1-y) z(1-z) * ANN: Dirichlet-zero on the unit cube
    (the 64 normalizes the bump's 1/64 peak so the net works at O(1))."""

    def parameterize(self, out, x, y, z):
        return 64 * x * (1 - x) * y * (1 - y) * z * (1 - z) * out


def test_poisson_3d_manufactured_solution():
    # Delta u = -3 pi^2 sin(pi x) sin(pi y) sin(pi z), u = 0 on the boundary
    # -> u* = sin(pi x) sin(pi y) sin(pi z)
    from neurodiffeq_tpu import fields as F

    def pde(u, x, y, z):
        src = -3 * np.pi ** 2 * F.sin(np.pi * x) * F.sin(np.pi * y) * F.sin(np.pi * z)
        return [diff(u, x, 2) + diff(u, y, 2) + diff(u, z, 2) - src]

    set_seed(0)
    solver = GenericSolver(
        diff_eqs=pde,
        conditions=[ZeroBoundaryBox()],
        nets=[FCNN(n_input_units=3, n_output_units=1, hidden_units=(32, 32))],
        train_generator=Generator3D((10, 10, 10), (0, 0, 0), (1, 1, 1),
                                    method='equally-spaced-noisy'),
        valid_generator=Generator3D((10, 10, 10), (0, 0, 0), (1, 1, 1),
                                    method='equally-spaced'),
    )
    solver.fit(max_epochs=3000, tqdm_file=None)
    sol = solver.get_solution()

    rng = np.random.RandomState(0)
    pts = rng.rand(200, 3)
    u = np.asarray(sol(pts[:, 0], pts[:, 1], pts[:, 2])).reshape(-1)
    exact = np.sin(np.pi * pts[:, 0]) * np.sin(np.pi * pts[:, 1]) * np.sin(np.pi * pts[:, 2])
    assert np.abs(u - exact).max() < 5e-2

    # exact zero-Dirichlet on all six faces with the trained net
    face = rng.rand(20, 2)
    for fixed_axis in range(3):
        for val in (0.0, 1.0):
            coords = [face[:, 0], face[:, 1]]
            coords.insert(fixed_axis, np.full(20, val))
            ub = np.asarray(sol(*coords)).reshape(-1)
            assert np.abs(ub).max() < 1e-8
