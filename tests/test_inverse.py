"""Inverse-problem workflow: recover an equation parameter by gradient descent
THROUGH a frozen bundle solution (the reference's README-blessed use case,
README.md:325-346)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.conditions import BundleIVP
from neurodiffeq_tpu.solvers import BundleSolver1D
from neurodiffeq_tpu.utils import set_seed


def test_recover_equation_parameter_through_frozen_solution():
    set_seed(0)
    solver = BundleSolver1D(
        ode_system=lambda u, t, lam: [diff(u, t) + lam * u],
        conditions=[BundleIVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=1.0, theta_min=0.3, theta_max=2.0, eq_param_index=(0,),
    )
    solver.fit(max_epochs=2000, tqdm_file=None)
    sol = solver.get_solution()

    true_lam = 1.23
    ts = np.linspace(0, 1, 25)
    data = np.exp(-true_lam * ts)

    def mse(lam):
        us = sol(ts, jnp.ones(25) * lam)
        return ((us - data) ** 2).mean()

    lam = jnp.asarray(0.5)
    opt = optax.adam(5e-2)
    state = opt.init(lam)
    vg = jax.jit(jax.value_and_grad(mse))
    for _ in range(300):
        v, g = vg(lam)
        upd, state = opt.update(g, state, lam)
        lam = optax.apply_updates(lam, upd)

    assert abs(float(lam) - true_lam) < 0.05, f"recovered {float(lam)} vs true {true_lam}"
    assert float(v) < 1e-3
