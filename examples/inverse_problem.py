"""Inverse problem: recover an unknown equation parameter from data by
gradient descent THROUGH a frozen solution bundle (reference README.md:325-346
workflow).

Run: python examples/inverse_problem.py
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.conditions import BundleIVP
from neurodiffeq_tpu.solvers import BundleSolver1D
from neurodiffeq_tpu.utils import set_seed


def main():
    set_seed(0)

    # 1. learn a BUNDLE of solutions u(t; lambda) for du/dt = -lambda u, u(0)=1
    solver = BundleSolver1D(
        ode_system=lambda u, t, lam: [diff(u, t) + lam * u],
        conditions=[BundleIVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=1.0,
        theta_min=0.3, theta_max=2.0,
        eq_param_index=(0,),
    )
    solver.fit(max_epochs=2000)
    solution = solver.get_solution()

    # 2. observe noisy data generated with an unknown lambda
    true_lam = 1.23
    ts = np.linspace(0, 1, 25)
    data = np.exp(-true_lam * ts) + np.random.randn(25) * 1e-3

    # 3. recover lambda by descending the data misfit through the frozen bundle
    def mse(lam):
        us = solution(ts, jnp.ones(25) * lam)
        return ((us - data) ** 2).mean()

    lam = jnp.asarray(0.5)
    opt = optax.adam(5e-2)
    state = opt.init(lam)
    step = jax.jit(jax.value_and_grad(mse))
    for i in range(300):
        v, g = step(lam)
        upd, state = opt.update(g, state, lam)
        lam = optax.apply_updates(lam, upd)

    print(f"true lambda      = {true_lam}")
    print(f"recovered lambda = {float(lam):.4f}  (final mse {float(v):.2e})")


if __name__ == '__main__':
    main()
