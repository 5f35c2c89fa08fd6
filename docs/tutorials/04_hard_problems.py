# %% [markdown]
# # Hard problems: spectral bias, causality, and where to put your points
#
# The previous tutorials solve *easy* equations — smooth, low-frequency,
# short-horizon. This one covers the classic ways a physics-informed
# fit fails on harder ones, and the tool this framework ships for each
# (none of these exist in the reference `neurodiffeq`):
#
# | failure mode | symptom | tool |
# |---|---|---|
# | spectral bias | loss plateaus; solution looks low-pass filtered | `FourierFCNN` |
# | causality violation | residual is low but the trajectory is wrong far from t=0 | `losses.causal` |
# | wasted collocation | error concentrates in a thin feature your uniform points miss | `ResidualAdaptiveGenerator` |
# | unaffordable derivative order | step time dominated by high-order Taylor chains | `'variational'` + `'halton'` |
#
# Set `NEURODIFF_TUTORIAL_QUICK=1` for the CI-sized run.

# %%
import os

import numpy as np
import optax

from neurodiffeq_tpu import diff
from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.solvers import Solver1D
from neurodiffeq_tpu.conditions import DirichletBVP
from neurodiffeq_tpu.networks import FCNN, FourierFCNN
from neurodiffeq_tpu.generators import Generator1D
from neurodiffeq_tpu.utils import set_seed

QUICK = bool(os.environ.get('NEURODIFF_TUTORIAL_QUICK'))
set_seed(0)
EPOCHS = 200 if QUICK else 2000

# %% [markdown]
# ## 1. Spectral bias — `FourierFCNN`
#
# Coordinate MLPs learn low frequencies first (Tancik et al. 2020). Ask a
# tanh FCNN for a frequency-3 solution and it will happily sit at the mean
# for thousands of epochs. A random Fourier-feature front end
# `x -> [cos(xB), sin(xB)]` (with `B ~ N(0, (2*pi*sigma)^2)` fixed at init)
# makes frequency-`sigma` content a *linear* function of the features:
#
#     u'' = -(2 pi k)^2 sin(2 pi k t),  u(0) = u(1) = 0,  k = 3
#
# `sigma` is roughly the highest frequency (cycles/unit) you expect.

# %%
k = 3.0
w = 2 * np.pi * k
forced = lambda u, t: [diff(u, t, 2) + w ** 2 * F.sin(w * t)]


def solve_forced(net):
    s = Solver1D(
        ode_system=forced,
        conditions=[DirichletBVP(0.0, 0.0, 1.0, 0.0)],
        t_min=0.0, t_max=1.0, nets=[net],
        optimizer=optax.adam(3e-3),
        train_generator=Generator1D(64, 0.0, 1.0, method='equally-spaced-noisy'),
        valid_generator=Generator1D(64, 0.0, 1.0, method='equally-spaced'),
    )
    s.fit(max_epochs=EPOCHS, tqdm_file=None)
    ts = np.linspace(0, 1, 201)
    return float(np.max(np.abs(np.asarray(s.get_solution(best=False)(ts))
                               - np.sin(w * ts))))


err_fourier = solve_forced(FourierFCNN(n_features=32, sigma=k, hidden_units=(32, 32)))
err_plain = solve_forced(FCNN(hidden_units=(32, 32)))
print(f"max err at {EPOCHS} epochs: FourierFCNN {err_fourier:.3f}, plain FCNN {err_plain:.3f}")
assert err_fourier < err_plain  # the gap grows with budget: 0.005 vs 1.43 at 2000

# %% [markdown]
# At full budget (2000 epochs) this prints ~`0.005` vs ~`1.43` — the plain
# net is not slower, it is *stuck*. The same module scales to PDEs: see
# `examples/poisson_high_frequency.py` (k=4 two-dimensional Poisson, max err
# 0.109 vs 2.39 at 20k epochs on one TPU chip). `FourierFCNN` propagates
# batched Taylor series like every other network here, so derivatives stay
# on the fast path.
#
# The other standard cure is `networks.SIREN` — sine activations with the
# Sitzmann et al. (2020) initialization, so every frequency is *trainable*
# rather than fixed at init. One caveat, measured in
# `tests/test_networks.py::test_siren_fits_high_frequency`: for residual
# training use a moderate `w0` (5-10). Each derivative order multiplies
# hidden frequencies by `w0`, so the paper's image-fitting default
# (`w0=30`) makes the PINN loss landscape noisy — it stalls at ~0.78 on
# this exact problem while `w0=10` reaches 0.04. Prefer `FourierFCNN` when
# you know the target bandwidth (set `sigma` to it); prefer `SIREN` when
# you don't and want the net to find it.
#
# ## 2. Causality — `losses.causal`
#
# On stiff nonlinear PDEs the optimizer can drive the residual down along a
# *wrong* trajectory far from t=0 — by the time gradient information from
# early times arrives, the fit is in the wrong basin. `losses.causal`
# (Wang, Sankaran & Perdikaris 2022) sorts the collocation points by time,
# bins their residuals, and weights bin `i` by
# `exp(-epsilon * sum of earlier bins' losses)` — later times only start
# mattering once earlier times are fitted. It is a drop-in `loss_fn`:

# %%
from neurodiffeq_tpu.conditions import IVP
from neurodiffeq_tpu.losses import causal

decay = lambda u, t: [diff(u, t) + u]
s = Solver1D(ode_system=decay, conditions=[IVP(0.0, 1.0)],
             t_min=0.0, t_max=2.0,
             loss_fn=causal(epsilon=1.0, n_bins=8))
s.fit(max_epochs=EPOCHS * 2, tqdm_file=None)
ts = np.linspace(0, 2, 101)
err = float(np.max(np.abs(np.asarray(s.get_solution(best=False)(ts)) - np.exp(-ts))))
print(f"causal-loss exponential decay: max err {err:.4f}")
assert err < (0.2 if QUICK else 0.01)

# %% [markdown]
# **Use it deliberately.** Measured A/B (`benchmarks/causal_ab.py`, TPU,
# same seed both arms): on Allen-Cahn (`u_t = 1e-4 u_xx - 5u^3 + 5u`, exact
# IC/BC) causal cuts the final-time rel-L2 error ~1.5x at every epoch
# budget (0.108 -> 0.073 at 30k). But on a long-horizon *linear* oscillator
# whose ICs are enforced exactly — enforcement is exact-by-construction in
# this framework, unlike penalty-method PINNs — the pathology it targets
# never happens, and the causal front just slows convergence. Vanilla loss
# first; reach for `causal` when the trained solution is *plausible but
# wrong* at late times.
#
# ## 3. Where to put your points — `ResidualAdaptiveGenerator`
#
# When the solution has a thin feature (a shock, a boundary layer), uniform
# collocation wastes almost all its points. `ResidualAdaptiveGenerator`
# wraps any generator and re-draws each batch from a proposal oversampled
# toward high residual (RAD/RAR-D, Wu et al. 2023) — a pure static-shape
# selection *inside* the jitted step, so it costs no host round-trips.
# The Burgers shock walkthrough (`examples/burgers.py`) measures it: 0.391
# vs 0.637 max error at 5k Adam epochs against the Cole-Hopf exact
# solution, and `benchmarks/RESULTS.md` documents when it does NOT help
# (frozen L-BFGS point sets). The auto-balanced multi-equation weighting
# (`AutoResidualWeightCallback`, tutorial 3) composes with all of the
# above.
#
# ## 4. Trading derivative order for sampling quality — Deep Ritz + QMC
#
# For problems with an energy functional (symmetric elliptic operators),
# you can avoid high-order derivatives entirely: write the *energy
# density* and minimize its Monte-Carlo integral with
# `loss_fn='variational'` (E & Yu 2018). For Poisson `-u'' = f` the
# density is `1/2 u'^2 - f u` — first derivatives only, so a second-order
# problem trains on order-1 Taylor propagation, ~1.4-1.7x more epochs/s
# on the 2-D study (`benchmarks/ritz_ab.py`). Exact boundary
# reparameterization replaces classic Deep Ritz's penalty term.
#
# The catch, measured in that A/B: with iid sampling the energy's
# integration noise floors the error 27x above the strong form. The fix is
# free: `method='halton'` — randomized low-discrepancy collocation points
# (quasi-Monte-Carlo), which cut the floor 4.1x. Always pair them:

# %%
pi = np.pi
ritz = lambda u, x: [0.5 * diff(u, x) ** 2 - (pi ** 2) * F.sin(pi * x) * u]
s = Solver1D(ode_system=ritz,
             conditions=[DirichletBVP(0.0, 0.0, 1.0, 0.0)],
             t_min=0.0, t_max=1.0, loss_fn='variational',
             optimizer=optax.adam(1e-3),
             train_generator=Generator1D(64, 0.0, 1.0, method='halton'),
             valid_generator=Generator1D(64, 0.0, 1.0,
                                         method='equally-spaced'))
s.fit(max_epochs=EPOCHS, tqdm_file=None)
ts = np.linspace(0, 1, 101)
err = float(np.max(np.abs(np.asarray(s.get_solution(best=False)(ts))
                          - np.sin(pi * ts))))
final_energy = float(s.metrics_history['valid_loss'][-1])
print(f"Deep Ritz 1-D Poisson: max err {err:.4f}, "
      f"final energy {final_energy:.4f} (analytic minimum {-pi**2/4:.4f})")
assert err < (0.5 if QUICK else 0.06)
# the loss is an ENERGY: negative at the optimum, not a quality metric
assert final_energy < 0 or QUICK

# %%
print("tutorial 04 complete")
