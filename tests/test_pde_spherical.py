"""Spherical-solver integration tests: electric potential of a gaussian charge
in both direct and harmonics-basis formulations (parity with reference
tests/test_pde_spherical.py:103-174), plus a real convergence check the
reference only smoke-tests."""
import numpy as np
import pytest
from scipy.special import erf

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.networks import FCNN
from neurodiffeq_tpu.operators import spherical_laplacian
from neurodiffeq_tpu.function_basis import RealSphericalHarmonics, HarmonicsLaplacian
from neurodiffeq_tpu.conditions import DirichletBVPSpherical, DirichletBVPSphericalBasis
from neurodiffeq_tpu.generators import GeneratorSpherical
from neurodiffeq_tpu.monitors import MonitorSpherical, MonitorSphericalHarmonics
from neurodiffeq_tpu.pde_spherical import solve_spherical
from neurodiffeq_tpu.solvers import SolverSpherical

Q = 1.
SIGMA = 1.
EPSILON = 1.
K = 1 / (4 * np.pi * EPSILON)
GAUSSIAN_COEFF = Q / (SIGMA ** 3) / np.power(2 * np.pi, 1.5)
R0, R1 = 0.1, 3.

rho_f = lambda r: GAUSSIAN_COEFF * F.exp(-(r ** 2) / (2 * SIGMA ** 2))  # noqa: E731


def analytic_solution_np(r):
    return (K * Q / r) * erf(r / (np.sqrt(2) * SIGMA))


V0 = float(analytic_solution_np(R0))
V1 = float(analytic_solution_np(R1))


def _validate_shapes(solution):
    gen = GeneratorSpherical(512, r_min=R0, r_max=R1)
    rs, thetas, phis = gen.get_examples()
    us = solution(np.asarray(rs), np.asarray(thetas), np.asarray(phis), to_numpy=True)
    assert us.shape == np.asarray(rs).shape


def test_electric_potential_direct_formulation():
    pde = lambda u, r, th, ph: spherical_laplacian(u, r, th, ph) + rho_f(r) / EPSILON  # noqa: E731
    condition = DirichletBVPSpherical(R0, lambda th, ph: V0 + 0 * th, R1, lambda th, ph: V1 + 0 * th)
    monitor = MonitorSpherical(R0, R1, check_every=50, shape=(4, 4, 4))
    with pytest.warns((FutureWarning, DeprecationWarning)):
        solution, metrics_history = solve_spherical(
            pde, condition, R0, R1,
            max_epochs=2,
            return_best=True,
            analytic_solution=lambda r, th, ph: (K * Q / r) * F.erf(r / (np.sqrt(2) * SIGMA)),
            monitor=monitor,
        )
    _validate_shapes(solution)
    assert 'train__analytic_mse' in metrics_history


def test_electric_potential_harmonics_formulation():
    max_degree = 2
    n_components = (max_degree + 1) ** 2
    harmonics_fn = RealSphericalHarmonics(max_degree=max_degree)
    harmonic_laplacian = HarmonicsLaplacian(max_degree=max_degree)
    pde = lambda R, r, th, ph: harmonic_laplacian(R, r, th, ph) + rho_f(r) / EPSILON  # noqa: E731
    R_0 = np.array([V0 * 2] + [0.0] * (n_components - 1))
    R_1 = np.array([V1 * 2] + [0.0] * (n_components - 1))
    condition = DirichletBVPSphericalBasis(r_0=R0, R_0=R_0, r_1=R1, R_1=R_1)
    monitor = MonitorSphericalHarmonics(R0, R1, check_every=50, shape=(4, 4, 4),
                                        harmonics_fn=harmonics_fn)
    net = FCNN(n_input_units=1, n_output_units=n_components)
    with pytest.warns((FutureWarning, DeprecationWarning)):
        solution, metrics_history = solve_spherical(
            pde, condition, R0, R1,
            net=net,
            max_epochs=2,
            return_best=True,
            monitor=monitor,
            harmonics_fn=harmonics_fn,
        )
    _validate_shapes(solution)


def test_electric_potential_converges_to_analytic():
    """Beyond the reference's 2-epoch smoke test: actually converge."""
    pde = lambda u, r, th, ph: spherical_laplacian(u, r, th, ph) + rho_f(r) / EPSILON  # noqa: E731
    condition = DirichletBVPSpherical(R0, lambda th, ph: V0 + 0 * th, R1, lambda th, ph: V1 + 0 * th)
    solver = SolverSpherical(
        pde_system=lambda u, r, th, ph: [pde(u, r, th, ph)],
        conditions=[condition],
        r_min=R0, r_max=R1,
    )
    solver.fit(max_epochs=2500, tqdm_file=None)
    solution = solver.get_solution()

    rs = np.linspace(R0, R1, 64)
    thetas = np.random.rand(64) * np.pi * 0.9 + 0.05
    phis = np.random.rand(64) * 2 * np.pi
    us = np.asarray(solution(rs, thetas, phis))
    expected = analytic_solution_np(rs)
    rel_err = np.abs(us - expected) / np.abs(expected)
    assert rel_err.max() < 0.08, f"max rel err {rel_err.max()}"


def test_spherical_laplacian_consistency():
    """Two formulations of the spherical laplacian of an harmonics-expanded
    function must agree (reference test_spherical_laplacian,
    tests/test_pde_spherical.py:285-315) — covered in depth by
    tests/test_function_basis.py; here we check through the solver's enforce."""
    max_degree = 2
    n_components = (max_degree + 1) ** 2
    net = FCNN(1, n_components, hidden_units=(8, 8))
    import jax
    params = net.init(jax.random.PRNGKey(0))
    harmonics_fn = RealSphericalHarmonics(max_degree=max_degree)
    hl = HarmonicsLaplacian(max_degree=max_degree)

    r = np.random.rand(50) * 1.5 + 0.5
    th = np.random.rand(50) * np.pi * 0.9 + 0.05
    ph = np.random.rand(50) * 2 * np.pi
    rf, thf, phf = F.coordinates(r, th, ph)

    cond = DirichletBVPSphericalBasis(r_0=0.5, R_0=np.zeros(n_components))
    coeffs = cond.enforce(net, params, rf)
    lap_basis = hl(coeffs, rf, thf, phf)
    u = (coeffs * harmonics_fn(thf, phf)).sum(axis=1, keepdims=True)
    lap_direct = spherical_laplacian(u, rf, thf, phf)
    assert np.allclose(np.asarray(lap_basis.value), np.asarray(lap_direct.value), atol=1e-6)
