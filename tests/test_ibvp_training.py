"""Training-convergence test for IBVP1D: the 1-D heat equation with exact
initial+boundary enforcement (incl. a Neumann variant exercising the
boundary-anchor machinery inside the differentiated solution)."""
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


def _solve(cond, epochs):
    solver = Solver2D(
        pde_system=lambda u, x, t: [diff(u, t) - K * diff(u, x, 2)],
        conditions=[cond],
        xy_min=(0, 0), xy_max=(L, T),
        train_generator=Generator2D((16, 16), (0, 0), (L, T), method='equally-spaced-noisy'),
        valid_generator=Generator2D((16, 16), (0, 0), (L, T), method='equally-spaced'),
    )
    solver.fit(max_epochs=epochs, tqdm_file=None)
    return solver.get_solution()


def test_heat_equation_dirichlet_dirichlet():
    set_seed(1)
    # u(x,0)=sin(pi x/L), u(0,t)=u(L,t)=0 -> sin(pi x/L) exp(-K (pi/L)^2 t)
    cond = IBVP1D(
        x_min=0.0, x_max=L, t_min=0.0,
        t_min_val=lambda x: F.sin(np.pi / L * x),
        x_min_val=lambda t: 0 * t,
        x_max_val=lambda t: 0 * t,
    )
    sol = _solve(cond, epochs=1500)
    xs = np.random.rand(60) * L
    ts = np.random.rand(60) * T
    us = np.asarray(sol(xs, ts))
    expected = np.sin(np.pi * xs / L) * np.exp(-K * (np.pi / L) ** 2 * ts)
    assert np.abs(us - expected).max() < 5e-2


def test_heat_equation_neumann_neumann():
    set_seed(1)
    # insulated ends: u(x,0)=cos(pi x/L), u_x(0,t)=u_x(L,t)=0
    # -> cos(pi x/L) exp(-K (pi/L)^2 t)
    cond = IBVP1D(
        x_min=0.0, x_max=L, t_min=0.0,
        t_min_val=lambda x: F.cos(np.pi / L * x),
        x_min_prime=lambda t: 0 * t,
        x_max_prime=lambda t: 0 * t,
    )
    sol = _solve(cond, epochs=2000)
    xs = np.random.rand(60) * L
    ts = np.random.rand(60) * T
    us = np.asarray(sol(xs, ts))
    expected = np.cos(np.pi * xs / L) * np.exp(-K * (np.pi / L) ** 2 * ts)
    assert np.abs(us - expected).max() < 8e-2
