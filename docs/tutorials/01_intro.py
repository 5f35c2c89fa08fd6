# %% [markdown]
# # Introduction: solving ODEs with neurodiffeq_tpu
#
# TPU-native counterpart of the reference tutorial
# (`/root/reference/docs/intro.ipynb`): train neural networks that *are* the
# solution of a differential equation. A network `u(t)` is reparameterized so
# initial/boundary conditions hold exactly, and trained to drive the equation
# residual to zero on sampled collocation points.
#
# Executable as a script (`python docs/tutorials/01_intro.py`) or cell-by-cell
# in any percent-format-aware editor. Set `NEURODIFF_TUTORIAL_QUICK=1` to run
# the CI-sized configuration.

# %%
import os

import numpy as np
import matplotlib
if not os.environ.get('DISPLAY'):
    matplotlib.use('Agg')
import matplotlib.pyplot as plt

from neurodiffeq_tpu import diff
from neurodiffeq_tpu.solvers import Solver1D
from neurodiffeq_tpu.conditions import IVP, DirichletBVP
from neurodiffeq_tpu.networks import FCNN, SinActv
from neurodiffeq_tpu.utils import set_seed

QUICK = bool(os.environ.get('NEURODIFF_TUTORIAL_QUICK'))
set_seed(42)

# %% [markdown]
# ## An initial value problem: exponential decay
#
# Solve du/dt + u = 0 with u(0) = 1. The equation is written as a *residual*
# callable returning a list — one entry per equation. `diff(u, t)` is the
# derivative of the (condition-enforced) network output with respect to the
# coordinate; arbitrary orders and mixtures are allowed.

# %%
exponential = lambda u, t: [diff(u, t) + u]

solver = Solver1D(
    ode_system=exponential,
    conditions=[IVP(t_0=0.0, u_0=1.0)],  # u(0) = 1, enforced EXACTLY
    t_min=0.0, t_max=2.0,
)
solver.fit(max_epochs=200 if QUICK else 1000, tqdm_file=None)

solution = solver.get_solution()
ts = np.linspace(0, 2, 100)
err = np.abs(np.asarray(solution(ts)) - np.exp(-ts)).max()
print(f"max |u - exp(-t)| = {err:.2e}")
assert err < (0.1 if QUICK else 2e-2)

# %% [markdown]
# ## A boundary value problem
#
# u'' + u = 0 with u(0) = 0, u(pi/2) = 1 — solution sin(t). Only the
# condition changes: `DirichletBVP` pins both ends exactly.

# %%
solver_bvp = Solver1D(
    ode_system=lambda u, t: [diff(u, t, order=2) + u],
    conditions=[DirichletBVP(t_0=0.0, u_0=0.0, t_1=np.pi / 2, u_1=1.0)],
    t_min=0.0, t_max=np.pi / 2,
)
solver_bvp.fit(max_epochs=200 if QUICK else 1000, tqdm_file=None)
ts = np.linspace(0, np.pi / 2, 100)
err = np.abs(np.asarray(solver_bvp.get_solution()(ts)) - np.sin(ts)).max()
print(f"max |u - sin(t)| = {err:.2e}")
assert err < (0.1 if QUICK else 2e-2)

# %% [markdown]
# ## A system of ODEs: Lotka–Volterra
#
# The predator–prey system (the reference README's flagship example):
#
#     u' = u - u v        u(0.1) = 1.5   (prey)
#     v' = u v - v        v(0.1) = 1.0   (predators)
#
# Two equations, two networks, two conditions. `SinActv` networks capture the
# oscillatory dynamics well.

# %%
lotka_volterra = lambda u, v, t: [diff(u, t) - (u - u * v),
                                  diff(v, t) - (u * v - v)]

solver_lv = Solver1D(
    ode_system=lotka_volterra,
    conditions=[IVP(t_0=0.1, u_0=1.5), IVP(t_0=0.1, u_0=1.0)],
    t_min=0.1, t_max=12.0,
    nets=[FCNN(actv=SinActv), FCNN(actv=SinActv)],
)
solver_lv.fit(max_epochs=300 if QUICK else 3000, tqdm_file=None)

# %% [markdown]
# Validate against scipy's `odeint` and plot both populations.

# %%
from scipy.integrate import odeint

ts = np.linspace(0.1, 12.0, 500)
prey, pred = solver_lv.get_solution()(ts, to_numpy=True)
ref = odeint(lambda y, t: [y[0] - y[0] * y[1], y[0] * y[1] - y[1]],
             [1.5, 1.0], ts)
err = max(np.abs(prey - ref[:, 0]).max(), np.abs(pred - ref[:, 1]).max())
print(f"max deviation vs odeint: {err:.3f}")
if not QUICK:
    assert err < 0.05

fig, ax = plt.subplots(figsize=(7, 3.2))
ax.plot(ts, prey, label='prey u(t)')
ax.plot(ts, pred, label='predators v(t)')
ax.plot(ts, ref[:, 0], 'k--', lw=0.8, label='odeint')
ax.plot(ts, ref[:, 1], 'k--', lw=0.8)
ax.set_xlabel('t'), ax.legend(), fig.tight_layout()
fig.savefig('/tmp/tutorial_lotka_volterra.png', dpi=100)
print("saved /tmp/tutorial_lotka_volterra.png")

# %% [markdown]
# ## Where to go next
#
# - `02_how_it_works.py` — the residual/condition machinery, 2-D PDEs, and
#   training monitors;
# - `03_advanced.py` — custom networks/optimizers/losses, solution bundles,
#   and inverse problems;
# - `docs/migrating-from-neurodiffeq.md` — the one-page mapping from the
#   PyTorch reference API.
