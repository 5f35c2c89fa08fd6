"""Streamfunction-vorticity cavity formulation (examples/cavity_streamfunction.py).

Pins the two invariants that make the formulation work:
- velocity BCs hold EXACTLY with an untrained network (u = psi_y matches the
  regularized lid profile on y=1 and vanishes on walls; v = -psi_x vanishes
  on the whole boundary) — the exact-constraint test pattern of the
  reference (tests/test_conditions.py);
- continuity u_x + v_y = 0 holds identically (streamfunction construction);
- a short training run reduces the coupled residual.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                'examples'))

import cavity_streamfunction as cs  # noqa: E402

from neurodiffeq_tpu.fields import coords_from_points, diff  # noqa: E402
from neurodiffeq_tpu.utils import set_seed  # noqa: E402


def _velocity_fields(solver, xs, ys):
    cols = [np.asarray(xs).reshape(-1, 1), np.asarray(ys).reshape(-1, 1)]
    funcs, coords = solver._forward(solver.params, cols)
    psi, x, y = funcs[0], coords[0], coords[1]
    return psi, x, y


def test_velocity_bcs_exact_with_untrained_net():
    set_seed(3)
    solver = cs.build(n_points=64, hidden=(16, 16), anneal_steps=10)
    t = np.linspace(0.0, 1.0, 33)

    # lid: u = u_lid(x), v = 0
    u, v = cs.velocities(solver, t, np.ones_like(t))
    pts = coords_from_points(np.stack([t, np.ones_like(t)], 1))
    lid = np.asarray(cs.u_lid(pts[0]).value).reshape(-1)
    assert np.abs(u - lid).max() < 1e-8
    assert np.abs(v).max() < 1e-8
    assert abs(lid[16] - 1.0) < 1e-6  # profile is ~1 mid-lid

    # the three no-slip walls
    for xs, ys in [(t, np.zeros_like(t)), (np.zeros_like(t), t), (np.ones_like(t), t)]:
        u, v = cs.velocities(solver, xs, ys)
        assert np.abs(u).max() < 1e-8
        assert np.abs(v).max() < 1e-8


def test_continuity_identically_zero():
    set_seed(1)
    solver = cs.build(n_points=64, hidden=(16, 16), anneal_steps=10)
    xs = np.random.RandomState(0).uniform(0.05, 0.95, 64)
    ys = np.random.RandomState(1).uniform(0.05, 0.95, 64)
    psi, x, y = _velocity_fields(solver, xs, ys)
    div = diff(diff(psi, y), x) - diff(diff(psi, x), y)
    assert np.abs(np.asarray(div.value)).max() < 1e-7


def test_short_training_reduces_residual():
    set_seed(0)
    solver = cs.build(n_points=256, hidden=(32, 32), anneal_steps=300)
    solver.fit(max_epochs=300, tqdm_file=None)
    hist = solver.metrics_history['train_loss']
    # per-step losses are heavy-tailed (the lid's A^2 corner layers are hit
    # only by occasional samples), so compare the best epoch against the
    # early-training median, not single noisy endpoints
    assert min(hist) < 0.3 * float(np.median(hist[:50]))
