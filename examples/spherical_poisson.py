"""Electric potential of a Gaussian charge (spherical Poisson equation).

The reference's hardest spherical test case
(tests/test_pde_spherical.py:103-174 — which its CI only shape-checks at 2
epochs); here it trains to ~0.5% max relative error vs the analytic
potential in ~20 s on one chip. Demonstrates SolverSpherical with a
two-ended Dirichlet radial condition, and the harmonics-basis variant of
the same problem (radial net + real spherical harmonics, basis-space
Laplacian).

  nabla^2 V = -rho / eps0,  rho = Q exp(-r^2 / 2 sigma^2) / (2 pi)^{3/2} sigma^3
  analytic:  V(r) = (Q / 4 pi eps0 r) erf(r / sqrt(2) sigma)

Run: python examples/spherical_poisson.py [epochs] [direct|harmonics]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.special import erf

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.conditions import DirichletBVPSpherical, DirichletBVPSphericalBasis
from neurodiffeq_tpu.function_basis import RealSphericalHarmonics, HarmonicsLaplacian
from neurodiffeq_tpu.networks import FCNN
from neurodiffeq_tpu.operators import spherical_laplacian
from neurodiffeq_tpu.solvers import SolverSpherical
from neurodiffeq_tpu.utils import set_seed

Q = SIGMA = EPS_0 = 1.0
K = 1 / (4 * np.pi * EPS_0)
R0, R1 = 0.1, 3.0


def analytic(r):
    return K * Q / r * erf(r / np.sqrt(2))


def build_direct(epochs):
    import optax
    coeff = Q / SIGMA ** 3 / np.power(2 * np.pi, 1.5)
    rho = lambda r: coeff * F.exp(-(r ** 2) / 2)
    return SolverSpherical(
        pde_system=lambda u, r, th, ph: [spherical_laplacian(u, r, th, ph) + rho(r) / EPS_0],
        conditions=[DirichletBVPSpherical(R0, lambda th, ph: analytic(R0) + 0 * th,
                                          R1, lambda th, ph: analytic(R1) + 0 * th)],
        r_min=R0, r_max=R1,
        nets=[FCNN(n_input_units=3, n_output_units=1, hidden_units=(64, 64))],
        optimizer=optax.adam(optax.cosine_decay_schedule(1e-3, epochs, alpha=1e-2)),
    )


def build_harmonics(epochs, degrees=4):
    """Radial net outputs harmonics coefficients R_lm(r); the basis-space
    HarmonicsLaplacian avoids the 1/sin(theta) singularity entirely."""
    import optax
    basis = RealSphericalHarmonics(max_degree=degrees)
    n_coeffs = (degrees + 1) ** 2
    coeff = Q / SIGMA ** 3 / np.power(2 * np.pi, 1.5)
    rho = lambda r: coeff * F.exp(-(r ** 2) / 2)
    lap = HarmonicsLaplacian(max_degree=degrees)
    # boundary coefficient vectors: only the l=0 channel is nonzero.
    # This basis uses the reference's normalization (Y00 = 1/2,
    # function_basis.py:200), so R00(r) = 2 V(r).
    c0 = np.zeros(n_coeffs); c0[0] = 2 * analytic(R0)
    c1 = np.zeros(n_coeffs); c1[0] = 2 * analytic(R1)
    solver = SolverSpherical(
        pde_system=lambda R, r, th, ph: [lap(R, r, th, ph) + rho(r) / EPS_0],
        conditions=[DirichletBVPSphericalBasis(R0, c0, R1, c1)],
        r_min=R0, r_max=R1,
        nets=[FCNN(n_input_units=1, n_output_units=n_coeffs, hidden_units=(64, 64))],
        optimizer=optax.adam(optax.cosine_decay_schedule(1e-3, epochs, alpha=1e-2)),
    )
    return solver, basis


def main(epochs=20000, mode='direct'):
    set_seed(0)
    t0 = time.perf_counter()
    if mode == 'direct':
        solver = build_direct(epochs)
        solver.fit(max_epochs=epochs, tqdm_file=None)
        sol = solver.get_solution()
    else:
        solver, basis = build_harmonics(epochs)
        solver.fit(max_epochs=epochs, tqdm_file=None)
        sol = solver.get_solution(harmonics_fn=basis)
    dt = time.perf_counter() - t0

    rng = np.random.RandomState(42)
    rs = np.linspace(R0, R1, 256)
    ths = rng.rand(256) * np.pi * 0.9 + 0.05
    phs = rng.rand(256) * 2 * np.pi
    rel = np.abs(np.asarray(sol(rs, ths, phs)) - analytic(rs)) / np.abs(analytic(rs))
    print(f"{mode}: {epochs} epochs in {dt:.1f}s ({epochs / dt:.0f} ep/s), "
          f"final loss {solver.metrics_history['train_loss'][-1]:.3e}")
    print(f"max rel err vs analytic potential: {float(rel.max()):.4f}")


if __name__ == '__main__':
    main(epochs=int(sys.argv[1]) if len(sys.argv) > 1 else 20000,
         mode=sys.argv[2] if len(sys.argv) > 2 else 'direct')
