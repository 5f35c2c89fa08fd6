"""Legacy v1 functional API tests: solve/solve_system, solve2D*,
solve_spherical*, deprecation contracts (parity with reference tests/test_ode.py,
test_pde.py, test_pde_spherical.py)."""
import numpy as np
import pytest

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.conditions import IVP, DirichletBVP2D, NoCondition
from neurodiffeq_tpu.networks import FCNN
from neurodiffeq_tpu import ode, pde, pde_spherical


def test_solve_exponential_decay():
    with pytest.warns(FutureWarning):
        solution, history = ode.solve(
            ode=lambda u, t: diff(u, t) + u,
            condition=IVP(t_0=0.0, u_0=1.0),
            t_min=0.0, t_max=2.0,
            max_epochs=200,
        )
    assert 'train_loss' in history and len(history['train_loss']) == 200
    ts = np.linspace(0, 2, 20)
    us = np.asarray(solution(ts))
    assert us.shape == (20,)
    assert np.isclose(float(np.asarray(solution(np.zeros(1)))[0]), 1.0, atol=1e-10)


def test_solve_system_shared_single_net():
    with pytest.warns((FutureWarning, DeprecationWarning)):
        solution, history = ode.solve_system(
            ode_system=lambda u1, u2, t: [diff(u1, t) - u2, diff(u2, t) + u1],
            conditions=[IVP(t_0=0.0, u_0=0.0), IVP(t_0=0.0, u_0=1.0)],
            t_min=0.0, t_max=1.0,
            max_epochs=20,
        )
    us = solution(np.linspace(0, 1, 7))
    assert len(us) == 2
    # shared net + exact ICs
    u1_0, u2_0 = solution(np.zeros(1))
    assert np.isclose(float(np.asarray(u1_0)[0]), 0.0, atol=1e-10)
    assert np.isclose(float(np.asarray(u2_0)[0]), 1.0, atol=1e-10)


def test_solve_system_return_internal():
    with pytest.warns((FutureWarning, DeprecationWarning)):
        solution, history, internal = ode.solve_system(
            ode_system=lambda u, t: [diff(u, t) + u],
            conditions=[IVP(t_0=0.0, u_0=1.0)],
            t_min=0.0, t_max=1.0,
            max_epochs=3,
            return_internal=True,
        )
    assert set(internal.keys()) == {'nets', 'conditions', 'train_generator', 'valid_generator',
                                    'optimizer', 'criterion'}


def test_solve_with_additional_loss():
    calls = []

    def extra(u, t):
        calls.append(1)
        return 0.01 * (u.value ** 2).mean()

    with pytest.warns((FutureWarning, DeprecationWarning)):
        solution, history = ode.solve(
            ode=lambda u, t: diff(u, t) + u,
            condition=IVP(t_0=0.0, u_0=1.0),
            t_min=0.0, t_max=1.0,
            additional_loss_term=extra,
            max_epochs=3,
        )
    assert calls


def test_solve2d_laplace():
    cond = DirichletBVP2D(
        x_min=0.0, x_min_val=lambda y: 0 * y,
        x_max=1.0, x_max_val=lambda y: 0 * y,
        y_min=0.0, y_min_val=lambda x: F.sin(np.pi * x),
        y_max=1.0, y_max_val=lambda x: 0 * x,
    )
    with pytest.warns((FutureWarning, DeprecationWarning)):
        solution, history = pde.solve2D(
            pde=lambda u, x, y: diff(u, x, 2) + diff(u, y, 2),
            condition=cond,
            xy_min=(0, 0), xy_max=(1, 1),
            max_epochs=10,
        )
    xs, ys = np.random.rand(12), np.random.rand(12)
    assert np.asarray(solution(xs, ys)).shape == (12,)


def test_make_animation():
    with pytest.warns((FutureWarning, DeprecationWarning)):
        solution, _ = pde.solve2D(
            pde=lambda u, x, t: diff(u, t) - diff(u, x, 2),
            condition=NoCondition(),
            xy_min=(0, 0), xy_max=(1, 1),
            max_epochs=2,
        )
    anim = pde.make_animation(solution, xs=np.linspace(0, 1, 8), ts=np.linspace(0, 1, 5))
    assert anim is not None


def test_solve_spherical():
    with pytest.warns((FutureWarning, DeprecationWarning)):
        solution, history = pde_spherical.solve_spherical(
            pde=lambda u, r, theta, phi: diff(u, r) + u,
            condition=NoCondition(),
            r_min=0.5, r_max=2.0,
            max_epochs=3,
        )
    rs = np.random.rand(9) + 0.5
    ths = np.random.rand(9) * np.pi
    phs = np.random.rand(9) * np.pi * 2
    assert np.asarray(solution(rs, ths, phs)).shape == (9,)


def test_solve_spherical_system_harmonics():
    from neurodiffeq_tpu.function_basis import RealSphericalHarmonics
    K = 9
    harmonics = RealSphericalHarmonics(max_degree=2)
    with pytest.warns((FutureWarning, DeprecationWarning)):
        solution, history = pde_spherical.solve_spherical_system(
            pde_system=lambda u, r, theta, phi: [diff(u, r, shape_check=False)],
            conditions=[NoCondition()],
            r_min=0.5, r_max=2.0,
            nets=[FCNN(1, K, hidden_units=(8,))],
            harmonics_fn=harmonics,
            max_epochs=3,
        )
    rs = np.random.rand(9) + 0.5
    ths = np.random.rand(9) * np.pi
    phs = np.random.rand(9) * np.pi * 2
    assert np.asarray(solution(rs, ths, phs)).shape == (9,)


def test_deprecated_class_aliases():
    with pytest.warns(FutureWarning):
        ode.ExampleGenerator(16)
    with pytest.warns(FutureWarning):
        pde.ExampleGenerator2D((4, 4))
    with pytest.warns(FutureWarning):
        pde_spherical.ExampleGeneratorSpherical(16)
    with pytest.warns(FutureWarning):
        pde_spherical.SphericalSolver(
            pde_system=lambda u, r, theta, phi: [diff(u, r) + u],
            conditions=[NoCondition()],
            r_min=0.5, r_max=1.0,
        )


def test_solve2d_system():
    """Two coupled trivial PDEs through the deprecated system API
    (reference pde.py:55-338)."""
    with pytest.warns((FutureWarning, DeprecationWarning)):
        solution, history = pde.solve2D_system(
            pde_system=lambda u, v, x, y: [diff(u, x) + u - v, diff(v, y) + v - u],
            conditions=[NoCondition(), NoCondition()],
            xy_min=(0, 0), xy_max=(1, 1),
            max_epochs=5,
        )
    xs, ys = np.random.rand(9), np.random.rand(9)
    out = solution(xs, ys)
    assert len(out) == 2 and np.asarray(out[0]).shape == (9,)
    assert len(history['train_loss']) == 5
