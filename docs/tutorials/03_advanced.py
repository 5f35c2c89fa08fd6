# %% [markdown]
# # Advanced uses: tuning, bundles, and inverse problems
#
# TPU-native counterpart of `/root/reference/docs/advanced.ipynb`: customizing
# every part of the solver (networks, generators, optimizer, loss), accessing
# internals, then two capabilities beyond single-equation solving — solution
# *bundles* over equation parameters, and an *inverse* problem recovering an
# unknown coefficient from data.
#
# Set `NEURODIFF_TUTORIAL_QUICK=1` for the CI-sized run.

# %%
import os

import numpy as np
import matplotlib
if not os.environ.get('DISPLAY'):
    matplotlib.use('Agg')
import optax

from neurodiffeq_tpu import diff
from neurodiffeq_tpu.solvers import Solver1D, BundleSolver1D
from neurodiffeq_tpu.conditions import IVP, BundleIVP
from neurodiffeq_tpu.networks import FCNN, SinActv
from neurodiffeq_tpu.generators import Generator1D
from neurodiffeq_tpu.utils import set_seed

QUICK = bool(os.environ.get('NEURODIFF_TUTORIAL_QUICK'))
set_seed(42)
EPOCHS = 300 if QUICK else 3000

# %% [markdown]
# ## Tuning the solver: simple harmonic oscillator
#
# u'' + u = 0, u(0) = 0, u'(0) = 1 — solution sin(t). Everything the
# reference lets you specify, you specify the same way:
#
# - **networks**: any architecture per equation (`FCNN`, `Resnet`,
#   `MonomialNN`, or your own `Module`);
# - **training/validation sets**: `Generator1D` with nine sampling methods
#   (and combinators: `+` concatenates, `*` duplicates, `^` meshes);
# - **optimizer**: any optax transform — schedules compose freely, and
#   closure-style optimizers like `optax.lbfgs` are detected automatically;
# - **loss**: a registry name ('l2', 'l1', 'inf', 'h1', 'h1 semi') or a
#   callable `(residual, funcs, coords) -> scalar`.

# %%
oscillator = lambda u, t: [diff(u, t, order=2) + u]

solver = Solver1D(
    ode_system=oscillator,
    conditions=[IVP(t_0=0.0, u_0=0.0, u_0_prime=1.0)],
    t_min=0.0, t_max=2 * np.pi,
    nets=[FCNN(hidden_units=(32, 32), actv=SinActv)],
    train_generator=Generator1D(64, 0.0, 2 * np.pi, method='equally-spaced-noisy'),
    valid_generator=Generator1D(64, 0.0, 2 * np.pi, method='equally-spaced'),
    optimizer=optax.adam(optax.cosine_decay_schedule(2e-3, EPOCHS, alpha=0.1)),
    loss_fn='l2',
)
solver.fit(max_epochs=EPOCHS, tqdm_file=None)
ts = np.linspace(0, 2 * np.pi, 200)
err = np.abs(np.asarray(solver.get_solution()(ts)) - np.sin(ts)).max()
print(f"oscillator max err: {err:.2e}")
if not QUICK:  # the quick run is a smoke test; convergence needs the full epochs
    assert err < 3e-2

# %% [markdown]
# ## Accessing the internals
#
# The solver exposes its full training state — loss/metric history, the best
# parameters so far, the networks, and the residuals of the trained solution:

# %%
print("epochs run:     ", solver.global_epoch)
print("final train loss:", solver.metrics_history['train_loss'][-1])
print("lowest valid loss:", solver.lowest_loss)
residuals = solver.get_residuals(ts, best=True, to_numpy=True)
print("mean |residual| of the trained solution:", np.abs(residuals).mean())

# Checkpointing: save/load round-trips the whole state (see also
# `CheckpointCallback` for periodic saves inside fit()).
import tempfile
with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, 'osc.ndeq')
    solver.save(path)
    restored = Solver1D.load(path)  # everything (nets, params, config) round-trips
    same = np.allclose(np.asarray(restored.get_solution()(ts)),
                       np.asarray(solver.get_solution()(ts)))
    print("save/load round-trip exact:", same)

# %% [markdown]
# ## Solution bundles: one network, a family of equations
#
# `BundleSolver1D` trains u(t, lambda) over a RANGE of equation parameters:
# here du/dt + lambda u = 0 for lambda in [0.5, 1.5], with the initial value
# also free in the bundle. After one training run, the solution evaluates for
# ANY lambda in the range — no retraining.

# %%
bundle = BundleSolver1D(
    ode_system=lambda u, t, lam: [diff(u, t) + lam * u],
    conditions=[BundleIVP(t_0=0.0, u_0=1.0)],
    t_min=0.0, t_max=1.0,
    theta_min=0.5, theta_max=1.5,     # the lambda range
    eq_param_index=(0,),              # lambda feeds the equation (not the IC)
)
bundle.fit(max_epochs=EPOCHS // 2 if QUICK else 2000, tqdm_file=None)

ts = np.linspace(0, 1, 50)
for lam in (0.6, 1.0, 1.4):
    us = np.asarray(bundle.get_solution()(ts, lam * np.ones(50)))
    err = np.abs(us - np.exp(-lam * ts)).max()
    print(f"lambda={lam}: max err {err:.2e}")
    if not QUICK:
        assert err < 3e-2

# %% [markdown]
# ## Inverse problems: recovering an unknown coefficient
#
# Given noisy observations of u(t) = exp(-1.3 t), recover the decay rate k in
# du/dt + k u = 0. The trick: make k a *trainable scalar* via a tiny
# `MonomialNN`-style parameter net... here, simplest formulation — treat k as
# a bundle parameter and fit the observation loss over the bundle (see
# `examples/inverse_problem.py` for the full pattern with
# `additional_loss`):

# %%
from neurodiffeq_tpu.solvers import BaseSolver  # noqa: F401  (for docs x-ref)

k_true = 1.3
obs_t = np.linspace(0.05, 0.95, 32)
obs_u = np.exp(-k_true * obs_t) + np.random.RandomState(0).normal(0, 1e-3, 32)

inverse = BundleSolver1D(
    ode_system=lambda u, t, k: [diff(u, t) + k * u],
    conditions=[BundleIVP(t_0=0.0, u_0=1.0)],
    t_min=0.0, t_max=1.0,
    theta_min=0.8, theta_max=1.8,
    eq_param_index=(0,),
)
inverse.fit(max_epochs=EPOCHS // 2 if QUICK else 2000, tqdm_file=None)

# sweep k over the bundle, pick the value minimizing the data misfit
ks = np.linspace(0.8, 1.8, 201)
losses = [np.mean((np.asarray(inverse.get_solution()(obs_t, k * np.ones(32))) - obs_u) ** 2)
          for k in ks]
k_hat = ks[int(np.argmin(losses))]
print(f"recovered k = {k_hat:.3f} (true {k_true})")
if not QUICK:
    assert abs(k_hat - k_true) < 0.05

# %% [markdown]
# ## Beyond the reference
#
# Capabilities with no reference analog, covered in `docs/advanced.md`:
#
# - **multi-chip training**: pass `mesh=make_mesh(...)` for data-parallel
#   points sharding, or `make_mesh(model_axis_size=...)` for Megatron tensor
#   parallelism over a 2-D (points x model) mesh;
# - **residual-adaptive sampling**: wrap any generator in
#   `ResidualAdaptiveGenerator` for RAD/RAR-D collocation selection inside
#   the jitted step;
# - **serving**: `solution.export()` produces a framework-free StableHLO
#   artifact with a symbolic batch dimension (`load_exported_solution`);
# - **per-equation residual weights**: `residual_weights=[...]` on any
#   solver.
