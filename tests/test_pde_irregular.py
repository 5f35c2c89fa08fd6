"""Irregular-domain boundary toolkit test: MacFall TPS enforcement makes the
solution exact at Dirichlet control points (atol=1e-4) and accurate in normal
derivative at Neumann control points (atol=1e-2) with only 1 training epoch
(parity with reference tests/test_pde.py:209-404 and BASELINE.md anchors)."""
import numpy as np
import pytest

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.networks import FCNN, Module
from neurodiffeq_tpu.generators import PredefinedGenerator
from neurodiffeq_tpu.monitors import Monitor2D
from neurodiffeq_tpu.pde import (
    solve2D, Point, DirichletControlPoint, NeumannControlPoint, CustomBoundaryCondition,
)

import jax.numpy as jnp


class ELU(Module):
    def init(self, key, dtype=None):
        return None

    def apply(self, params, x):
        import jax
        return jax.nn.elu(x)


def _solution_analytical(x, y):
    return np.log(1 + x ** 2 + y ** 2)


def _gradient_analytical(x, y):
    return 2 * x / (1 + x ** 2 + y ** 2), 2 * y / (1 + x ** 2 + y ** 2)


def _build_cbc():
    """Hexagram domain: Dirichlet on one 6-edge half, Neumann on the other,
    with dummy circular control points closing each domain (the reference's
    problem-c geometry, tests/test_pde.py:216-330)."""
    edge_length = 2.0 / np.sin(np.pi / 3) / 4
    points_on_each_edge = 11
    step_size = edge_length / (points_on_each_edge - 1)

    direction_theta = np.pi * 2 / 3
    left_turn_theta = np.pi * 1 / 3
    right_turn_theta = -np.pi * 2 / 3

    dirichlet_cps = []
    px, py = 0.0, -1.0
    for i_edge in range(6):
        for _ in range(points_on_each_edge - 1):
            dirichlet_cps.append(DirichletControlPoint(
                loc=(px, py), val=_solution_analytical(px, py)))
            px += step_size * np.cos(direction_theta)
            py += step_size * np.sin(direction_theta)
        direction_theta += left_turn_theta if (i_edge % 2 == 0) else right_turn_theta

    radius_circle = 1.0 / np.sin(np.pi / 6)
    ccx = radius_circle * np.cos(np.pi / 6)
    dirichlet_dummy = []
    for theta in np.linspace(-np.pi * 5 / 6, np.pi * 5 / 6, 60):
        px = ccx + radius_circle * np.cos(theta)
        py = radius_circle * np.sin(theta)
        dirichlet_dummy.append(DirichletControlPoint(
            loc=(px, py), val=_solution_analytical(px, py)))

    normal_theta = np.pi / 6
    direction_theta = -np.pi * 1 / 3
    neumann_cps = []
    px, py = 0.0, 1.0
    for i_edge in range(6):
        nx_, ny_ = np.cos(normal_theta), np.sin(normal_theta)
        px += step_size * np.cos(direction_theta)
        py += step_size * np.sin(direction_theta)
        for _ in range(points_on_each_edge - 2):
            gx, gy = _gradient_analytical(px, py)
            neumann_cps.append(NeumannControlPoint(
                loc=(px, py), val=gx * nx_ + gy * ny_, normal_vector=(nx_, ny_)))
            px += step_size * np.cos(direction_theta)
            py += step_size * np.sin(direction_theta)
        direction_theta += left_turn_theta if (i_edge % 2 == 0) else right_turn_theta
        normal_theta += left_turn_theta if (i_edge % 2 == 0) else right_turn_theta

    ccx_n = -radius_circle * np.cos(np.pi / 6)
    neumann_dummy = []
    for theta in np.linspace(np.pi * 1 / 6, np.pi * 11 / 6, 60):
        px = ccx_n + radius_circle * np.cos(theta)
        py = radius_circle * np.sin(theta)
        nx_, ny_ = np.cos(theta), np.sin(theta)
        gx, gy = _gradient_analytical(px, py)
        neumann_dummy.append(NeumannControlPoint(
            loc=(px, py), val=gx * nx_ + gy * ny_, normal_vector=(nx_, ny_)))

    cbc = CustomBoundaryCondition(
        center_point=Point(loc=(0.0, 0.0)),
        dirichlet_control_points=dirichlet_cps + dirichlet_dummy,
        neumann_control_points=neumann_cps + neumann_dummy,
    )
    return cbc, dirichlet_cps, neumann_cps


def test_arbitrary_boundary():
    cbc, dirichlet_cps, neumann_cps = _build_cbc()

    def get_grid(n):
        x = np.linspace(-1, 1, n)
        y = np.linspace(-1, 1, n)
        return np.meshgrid(x, y)

    xx_train, yy_train = get_grid(28)
    mask = np.asarray(cbc.in_domain(xx_train, yy_train))
    train_gen = PredefinedGenerator(xx_train[mask], yy_train[mask])
    xx_valid, yy_valid = get_grid(10)
    mask_v = np.asarray(cbc.in_domain(xx_valid, yy_valid))
    valid_gen = PredefinedGenerator(xx_valid[mask_v], yy_valid[mask_v])

    def rmse(u, x, y):
        true_u = jnp.log(1 + x ** 2 + y ** 2)
        return jnp.mean((u - true_u) ** 2) ** 0.5

    def de_problem_c(u, x, y):
        return (diff(u, x, order=2) + diff(u, y, order=2) + F.exp(u)
                - 1.0 - x ** 2 - y ** 2 - 4.0 / (1.0 + x ** 2 + y ** 2) ** 2)

    net = FCNN(n_input_units=2, hidden_units=(100, 100), actv=ELU)

    with pytest.warns((FutureWarning, DeprecationWarning)):
        solution, history = solve2D(
            pde=de_problem_c, condition=cbc,
            xy_min=(-1, -1), xy_max=(1, 1),
            train_generator=train_gen, valid_generator=valid_gen,
            net=net, max_epochs=1,
            monitor=Monitor2D(check_every=1, xy_min=(-1, -1), xy_max=(1, 1),
                              valid_generator=valid_gen),
            metrics={'rmse': rmse},
        )

    # Dirichlet control points: exact by TPS construction (atol=1e-4)
    xs = np.array([p.loc[0] for p in dirichlet_cps])
    ys = np.array([p.loc[1] for p in dirichlet_cps])
    us = np.asarray(solution(xs, ys, to_numpy=True))
    true_us = _solution_analytical(xs, ys)
    assert np.isclose(us, true_us, atol=1e-4).all(), \
        f"max dev at Dirichlet control points: {np.abs(us - true_us).max()}"

    # Neumann control points: normal derivative within atol=1e-2
    xs = np.array([p.loc[0] for p in neumann_cps])
    ys = np.array([p.loc[1] for p in neumann_cps])
    nxs = np.array([p.normal_vector[0] for p in neumann_cps])
    nys = np.array([p.normal_vector[1] for p in neumann_cps])

    xf, yf = F.coordinates(xs, ys)
    params = solution.params
    uf = solution.conditions[0].enforce(solution.nets[0], params[0], xf, yf)
    normal_derivative = (
        nxs.reshape(-1, 1) * np.asarray(diff(uf, xf).value)
        + nys.reshape(-1, 1) * np.asarray(diff(uf, yf).value)
    ).flatten()
    true_normal_derivative = np.array([p.val for p in neumann_cps])
    assert np.isclose(normal_derivative, true_normal_derivative, atol=1e-2).all(), \
        f"max dev in normal derivative: {np.abs(normal_derivative - true_normal_derivative).max()}"


def test_in_domain_mask():
    cbc, _, _ = _build_cbc()
    # center is inside, far corner is outside
    assert np.asarray(cbc.in_domain(np.array([0.0]), np.array([0.0]))).all()
    assert not np.asarray(cbc.in_domain(np.array([5.0]), np.array([5.0]))).any()
