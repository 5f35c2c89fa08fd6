# %% [markdown]
# # How it works: residuals, exact constraints, and 2-D PDEs
#
# TPU-native counterpart of `/root/reference/docs/how.ipynb`. Covers the two
# ideas every PINN framework rests on — residual minimization and
# condition reparameterization — plus this framework's third: the batched
# Taylor evaluation engine that makes derivatives cheap on TPU. Ends with a
# 2-D Laplace problem trained with a live monitor.
#
# Set `NEURODIFF_TUTORIAL_QUICK=1` for the CI-sized run.

# %%
import os

import numpy as np
import matplotlib
if not os.environ.get('DISPLAY'):
    matplotlib.use('Agg')

from neurodiffeq_tpu import diff
from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.utils import set_seed

QUICK = bool(os.environ.get('NEURODIFF_TUTORIAL_QUICK'))
set_seed(42)

# %% [markdown]
# ## 1. Satisfying the equation: residual minimization
#
# For an equation `D[u] = 0`, the training loss is `mean(D[net](t_i)^2)` over
# sampled collocation points. Writing `D` needs derivatives of the network
# with respect to its *inputs*. In torch this is `autograd.grad` on a tape; in
# JAX there is no tape, so this framework represents every dependent variable
# as a `Field` — an array *plus* the per-sample function that produced it.
# `diff` composes those functions, and a batched Taylor engine evaluates the
# whole derivative DAG in one shared network pass (ops/taylor.py).

# %%
# Fields are created for you inside a solver, but they are a public API:
ts, = F.coordinates(np.linspace(0, 1, 16))
u = F.sin(3 * ts) * ts          # any field-aware expression
du = diff(u, ts)                # d/dt [t sin 3t] = sin 3t + 3t cos 3t
expected = np.sin(3 * np.linspace(0, 1, 16)) + 3 * np.linspace(0, 1, 16) * np.cos(3 * np.linspace(0, 1, 16))
print("diff matches closed form:", np.allclose(np.asarray(du.value)[:, 0], expected, atol=1e-5))

# Raw jnp functions on Fields raise on purpose (silent conversion would sever
# the recorded dependence and corrupt later derivatives):
import jax.numpy as jnp
try:
    jnp.exp(u)
except TypeError as e:
    print("jnp.exp(field) raises:", type(e).__name__)

# %% [markdown]
# ## 2. Satisfying the conditions: exact reparameterization
#
# Instead of penalizing boundary violations, conditions *transform the
# network* so constraints hold identically. For an IVP `u(t0) = u0`:
#
#     u(t) = u0 + (1 - exp(-(t - t0))) * ANN(t)
#
# At `t = t0` the second term vanishes regardless of the network — so the
# constraint costs nothing to learn and holds to machine precision even
# before training:

# %%
from neurodiffeq_tpu.conditions import IVP
from neurodiffeq_tpu.networks import FCNN
import jax

net = FCNN()                        # UNTRAINED network
params = net.init(jax.random.PRNGKey(0))
cond = IVP(t_0=0.0, u_0=1.0)
t0s, = F.coordinates(np.zeros(8))
enforced = cond.enforce(net, params, t0s)
print("u(t0) with an untrained net:", np.asarray(enforced.value)[:2, 0])

# %% [markdown]
# ## 3. A 2-D PDE with a monitor
#
# Laplace's equation on the unit square with Dirichlet data (the reference
# README's PDE example):
#
#     u_xx + u_yy = 0,  u(x,0) = sin(pi x), zero on the other three edges
#
# Analytic solution: `sin(pi x) sinh(pi (1-y)) / sinh(pi)`.
# `Monitor2D` plots the solution surface as training progresses;
# `PeriodLocal(period=...)` controls the cadence — and `fit()` still fuses
# all epochs *between* monitor fires into single on-device scans, so
# monitoring is nearly free (see ARCHITECTURE.md on callback chunking).

# %%
from neurodiffeq_tpu.solvers import Solver2D
from neurodiffeq_tpu.conditions import DirichletBVP2D
from neurodiffeq_tpu.generators import Generator2D
from neurodiffeq_tpu.monitors import Monitor2D
from neurodiffeq_tpu.callbacks import MonitorCallback, PeriodLocal

condition = DirichletBVP2D(
    x_min=0.0, x_min_val=lambda y: 0 * y,
    x_max=1.0, x_max_val=lambda y: 0 * y,
    y_min=0.0, y_min_val=lambda x: F.sin(np.pi * x),
    y_max=1.0, y_max_val=lambda x: 0 * x,
)

epochs = 200 if QUICK else 2000
monitor = Monitor2D(xy_min=(0, 0), xy_max=(1, 1))
solver2d = Solver2D(
    pde_system=lambda u, x, y: [diff(u, x, 2) + diff(u, y, 2)],
    conditions=[condition],
    xy_min=(0, 0), xy_max=(1, 1),
    train_generator=Generator2D((32, 32), (0, 0), (1, 1), method='equally-spaced-noisy'),
    valid_generator=Generator2D((32, 32), (0, 0), (1, 1), method='equally-spaced'),
)
solver2d.fit(
    max_epochs=epochs,
    callbacks=[MonitorCallback(monitor).conditioned_on(PeriodLocal(period=epochs // 2))],
    tqdm_file=None,
)

xs, ys = np.random.rand(400), np.random.rand(400)
analytic = np.sin(np.pi * xs) * np.sinh(np.pi * (1 - ys)) / np.sinh(np.pi)
err = np.abs(np.asarray(solver2d.get_solution()(xs, ys)) - analytic).max()
print(f"max |u - analytic| = {err:.2e}")
assert err < (0.2 if QUICK else 2e-2)

# %% [markdown]
# ## 4. What the engine did underneath
#
# Every epoch above compiled to one XLA program: sample points -> enforce the
# condition -> evaluate u, u_xx, u_yy from ONE shared Taylor series of the
# network -> residual -> loss -> gradient -> Adam update. Chunks of epochs run
# inside a single `lax.scan` dispatch. On a TPU the same code runs the
# matmuls in the MXU and shards the collocation batch across chips when the
# solver is given a `jax.sharding` mesh (see `neurodiffeq_tpu.parallel` and
# `docs/advanced.md`).
