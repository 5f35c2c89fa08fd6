"""Burgers example: exact-solution oracle and exact-constraint invariants.

The convergence A/B (uniform vs adaptive sampling at full budgets) runs on
TPU and is recorded in examples/README.md; here we pin the pieces that can
break silently: the Cole-Hopf reference evaluator and the IBVP1D trial
function's exactness with an UNTRAINED network."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'examples'))

from burgers import burgers_exact, build, NU  # noqa: E402


def test_cole_hopf_reference_properties():
    # initial condition
    xs = np.linspace(-1, 1, 11)
    assert np.allclose(burgers_exact(xs, 0.0), -np.sin(np.pi * xs), atol=1e-12)
    # odd symmetry u(-x,t) = -u(x,t) and pinned zeros at x=0, +-1
    assert abs(burgers_exact(0.0, 0.5)) < 1e-12
    assert abs(burgers_exact(1.0, 0.5)) < 1e-10
    assert abs(burgers_exact(-0.3, 0.7) + burgers_exact(0.3, 0.7)) < 1e-10
    # the t=1 shock: |u| peaks ~0.65 just outside the layer (Raissi et al.)
    prof = burgers_exact(np.array([-0.1, 0.1]), 1.0)
    assert 0.6 < prof[0] < 0.72 and -0.72 < prof[1] < -0.6


def test_cole_hopf_converged_in_quadrature_order():
    xs = np.linspace(-0.9, 0.9, 7)
    a = burgers_exact(xs, 0.8, n_quad=64)
    b = burgers_exact(xs, 0.8, n_quad=96)
    assert np.allclose(a, b, atol=1e-8)


@pytest.mark.parametrize('mode', ['uniform', 'adaptive'])
def test_untrained_solver_satisfies_constraints_exactly(mode):
    s = build(mode)
    sol = s.get_solution(best=False)
    xs = np.linspace(-1.0, 1.0, 17)
    ts = np.linspace(0.0, 1.0, 9)
    # IC at t=0
    u0 = np.asarray(sol(xs, np.zeros_like(xs)))
    assert np.allclose(u0, -np.sin(np.pi * xs), atol=1e-8)
    # Dirichlet walls
    for xwall in (-1.0, 1.0):
        uw = np.asarray(sol(np.full_like(ts, xwall), ts))
        assert np.allclose(uw, 0.0, atol=1e-8)


def test_burgers_short_training_runs():
    s = build('adaptive')
    s.fit(max_epochs=3, tqdm_file=None)
    assert len(s.metrics_history['train_loss']) == 3
    assert np.isfinite(s.metrics_history['train_loss']).all()
