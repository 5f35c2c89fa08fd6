# %% [markdown]
# # High-dimensional and fourth-order PDEs
#
# Physics-informed training has no mesh, so nothing *in principle* stops it
# at d = 3 — but three practical walls appear as the dimension grows, and
# this tutorial walks the tool this framework ships for each (none exist in
# the reference `neurodiffeq`, whose samplers are per-axis meshgrids and
# whose operators stop at second order):
#
# | wall | symptom | tool |
# |---|---|---|
# | meshgrid sampling | point count = product of axis grids; hopeless past d≈3 | `GeneratorHypercube` |
# | boundary enforcement | 2d faces to penalize, one weight to tune per problem | `DirichletBoxND` (exact, by construction) |
# | exact derivatives | Laplacian costs one 2nd-derivative chain *per coordinate* | `stde_laplacian` (O(n_est), unbiased) |
# | fourth order | d(d+1)/2 fourth-order terms | `biharmonic` (vmapped, compile-flat in d) / `stde_biharmonic` |
#
# Everything below runs the manufactured Poisson family
#
#     -Δu = (π²/d) Σᵢ sin(π xᵢ)   on [0,1]^d,   u* = (1/d) Σᵢ sin(π xᵢ)
#
# whose analytic solution lets us report true errors at any d.
# Set `NEURODIFF_TUTORIAL_QUICK=1` for the CI-sized run.

# %%
import os

import jax
import numpy as np

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.conditions import DirichletBoxND
from neurodiffeq_tpu.generators import GeneratorHypercube
from neurodiffeq_tpu.networks import FCNN, SinActv
from neurodiffeq_tpu.operators import (
    laplacian, stde_laplacian, biharmonic, stde_biharmonic,
)
from neurodiffeq_tpu.solvers import GenericSolver
from neurodiffeq_tpu.utils import set_seed

QUICK = bool(os.environ.get('NEURODIFF_TUTORIAL_QUICK'))
EPOCHS = 300 if QUICK else 3000
D = 5  # high enough that meshgrid sampling is already dead (33^5 ≈ 39M pts)
PI = np.pi
set_seed(0)


def u_star(pts):
    return np.sin(PI * pts).sum(axis=1, keepdims=True) / pts.shape[1]


def rel_l2(solution, d, n=2048):
    pts = np.random.default_rng(7).random((n, d))
    pred = np.asarray(solution(*[pts[:, i] for i in range(d)],
                               to_numpy=True)).reshape(-1, 1)
    return float(np.linalg.norm(pred - u_star(pts)) / np.linalg.norm(u_star(pts)))


# %% [markdown]
# ## 1. Sampling and exact boundaries in d dimensions
#
# `GeneratorHypercube(n, dim=d)` draws n iid points in `[r_min, r_max]^d` —
# the point budget is whatever you choose, independent of d. With
# `boundary=True` it snaps each point onto a face (chosen with probability
# proportional to face measure, so boundary integrals stay unbiased on
# anisotropic boxes).
#
# `DirichletBoxND(d, boundary_fn=g)` imposes `u = g` on **every face of the
# box exactly, by construction**: the trial function is
# `u = g + φ(x)·ANN(x)` with a mask φ that vanishes on each face (product
# form at low d, a saturated form past d≈10 where the product underflows,
# or a smooth ADF — `mask='auto'` picks for you). There is no boundary
# penalty and therefore no weight to tune; the committed A/B artifact
# (`benchmarks/artifacts/stde_ab_r05.jsonl`) shows the penalty arm's error
# swinging with its weight while the exact arm has no knob and roundoff-level
# boundary defect.
#
# The exactness holds *before any training* — the defining invariant of this
# framework (and of the reference's low-dimensional condition classes):

# %%
g = lambda *xs: sum(F.sin(PI * x) for x in xs) / len(xs)   # u* extended inward
cond = DirichletBoxND(D, boundary_fn=g)
net = FCNN(n_input_units=D, n_output_units=1, hidden_units=(64, 64),
           actv=SinActv)
params = net.init(jax.random.PRNGKey(0))

face_pts = np.random.default_rng(0).random((256, D))
face_pts[np.arange(256), np.random.default_rng(1).integers(0, D, 256)] = \
    np.random.default_rng(2).integers(0, 2, 256).astype(float)  # snap to faces
coords = F.coordinates(*[face_pts[:, i] for i in range(D)])
u0 = np.asarray(cond.enforce(net, params, *coords).value)
defect = np.abs(u0 - u_star(face_pts)).max()
print(f"untrained-net boundary defect at d={D}: {defect:.2e}")
assert defect < 1e-6   # by construction, not by training

# %% [markdown]
# ## 2. Solving 5-dimensional Poisson with the exact Laplacian
#
# `GenericSolver` takes any number of coordinates. At d=5 the exact
# Laplacian (d second-derivative chains off the shared batched Taylor
# series) is still cheap, so use it:

# %%
def poisson_exact(u, *xs):
    f = sum(F.sin(PI * x) for x in xs) * (PI ** 2 / len(xs))
    return [laplacian(u, *xs) + f]


set_seed(0)
solver = GenericSolver(
    diff_eqs=poisson_exact,
    conditions=[DirichletBoxND(D, boundary_fn=g)],
    nets=[FCNN(n_input_units=D, n_output_units=1, hidden_units=(64, 64),
               actv=SinActv)],
    train_generator=GeneratorHypercube(512, dim=D),
    valid_generator=GeneratorHypercube(512, dim=D),
    n_batches_valid=0,
)
solver.fit(max_epochs=EPOCHS, tqdm_file=None)
err_exact = rel_l2(solver.get_solution(best=False), D)
print(f"d={D} Poisson, exact laplacian, {EPOCHS} epochs: rel L2 {err_exact:.4f}")
assert err_exact < (0.2 if QUICK else 0.02)

# %% [markdown]
# ## 3. The stochastic Laplacian — cost independent of d
#
# Past a few dozen dimensions the exact Laplacian's O(d) second-derivative
# chains dominate the step. `stde_laplacian(u, *xs, n_est=16)` replaces them
# with an unbiased Hutchinson-style estimate from `n_est` random second
# directional derivatives (Shi et al. 2024): Rademacher probes v give
# `E[vᵀ(∇²u)v] = Δu`, and each probe is ONE forward-over-forward sweep
# whatever d is. The estimator is *exact* on quadratics and unbiased in
# general (`tests/test_operators.py` pins both).
#
# The residual becomes stochastic — Adam sees extra gradient noise — so at
# low d the exact form converges slightly tighter per epoch. The crossover
# is measured, not guessed: the committed artifact shows stde a wash at
# d=10 (1.09× at identical error) and **8.9× faster at d=100** (0.104 vs
# 0.068 rel L2 at equal epochs — spend part of the speedup on more epochs
# or a larger n_est if that noise floor binds)
# (`benchmarks/artifacts/stde_ab_r05.jsonl`; reproduce with
# `python benchmarks/stde_ab.py` or `examples/poisson_highdim.py` at d=100).

# %%
def poisson_stde(u, *xs):
    f = sum(F.sin(PI * x) for x in xs) * (PI ** 2 / len(xs))
    return [stde_laplacian(u, *xs, n_est=16) + f]


set_seed(0)
solver = GenericSolver(
    diff_eqs=poisson_stde,
    conditions=[DirichletBoxND(D, boundary_fn=g)],
    nets=[FCNN(n_input_units=D, n_output_units=1, hidden_units=(64, 64),
               actv=SinActv)],
    train_generator=GeneratorHypercube(512, dim=D),
    valid_generator=GeneratorHypercube(512, dim=D),
    n_batches_valid=0,
)
solver.fit(max_epochs=EPOCHS, tqdm_file=None)
err_stde = rel_l2(solver.get_solution(best=False), D)
print(f"d={D} Poisson, stde_laplacian(16), {EPOCHS} epochs: rel L2 {err_stde:.4f}")
assert err_stde < (0.3 if QUICK else 0.03)

# %% [markdown]
# ## 4. Fourth order: the clamped plate
#
# The biharmonic operator Δ²u has d(d+1)/2 fourth-order terms. Two forms
# ship:
#
# - **`biharmonic(u, *xs)`** — exact. All terms evaluate as ONE vmapped
#   basis-pair directional-derivative kernel, so XLA compile time is flat
#   in d (measured 17 s at d=4 vs 96 s for the naive composed
#   `laplacian(laplacian(u))`, which Python-unrolls d² fourth-order chains).
#   Runtime is O(d²): fine to d≈30.
# - **`stde_biharmonic(u, *xs, n_est=16)`** — unbiased stochastic estimator
#   over independent Rademacher probe *pairs*, O(n_est) at any d. The pairs
#   matter: a single shared probe is provably biased
#   (`E[D⁴u[v,v,v,v]] = 3Δ²u − 2Σᵢu_iiii`).
#
# Clamped boundary conditions (`u = g` **and** `∂u/∂n = ∂g/∂n`) come from
# the same condition class: `DirichletBoxND(d, boundary_fn=g, power=2)`
# squares the mask, which vanishes to *second* order on every face — both
# conditions hold by construction, with `g` extending values and normal
# derivatives. Solving Δ²u = (π⁴/d)Σᵢ sin(π xᵢ) (same u*):

# %%
D4 = 3 if QUICK else 4


def plate_exact(u, *xs):
    f = sum(F.sin(PI * x) for x in xs) * (PI ** 4 / len(xs))
    return [biharmonic(u, *xs) - f]


set_seed(0)
solver = GenericSolver(
    diff_eqs=plate_exact,
    conditions=[DirichletBoxND(D4, boundary_fn=g, power=2)],
    nets=[FCNN(n_input_units=D4, n_output_units=1, hidden_units=(64, 64),
               actv=SinActv)],
    train_generator=GeneratorHypercube(512, dim=D4),
    valid_generator=GeneratorHypercube(512, dim=D4),
    n_batches_valid=0,
)
solver.fit(max_epochs=EPOCHS, tqdm_file=None)
err_plate = rel_l2(solver.get_solution(best=False), D4)
print(f"d={D4} clamped plate, exact biharmonic, {EPOCHS} epochs: "
      f"rel L2 {err_plate:.4f}")
assert err_plate < (0.5 if QUICK else 0.02)

# %% [markdown]
# At d ≳ 10, swap `biharmonic` → `stde_biharmonic(u, *xs, n_est=16)` — no
# other change. The committed clamped-plate A/B
# (`benchmarks/artifacts/biharmonic_ab_r05.jsonl`) measures the crossover:
# exact wins at d=4, stde trains 1.77× faster at d=10 and 1.41× at d=31,
# at statistically identical error and roundoff-level boundary defect
# everywhere. `examples/plate_clamped.py` is the runnable version.
#
# ## 5. Choosing, in one table
#
# | regime | Laplacian | Δ² | boundary |
# |---|---|---|---|
# | d ≤ ~10 | `laplacian` (exact) | `biharmonic` (exact) | `DirichletBoxND` (`mask='product'` auto) |
# | d ~ 10–30 | either (measure) | `stde_biharmonic` | `DirichletBoxND` (`mask='sat'` auto) |
# | d ≫ 30 | `stde_laplacian` | `stde_biharmonic` | `DirichletBoxND(mask='sat')` |
#
# Raising `n_est` lowers estimator variance linearly in cost; 16 matched
# the exact arm's converged error at every measured d. For *second*-order
# problems keep the default `power=1` mask — a squared mask would
# over-constrain them (it forces ∂u/∂n to match g's normal derivative,
# which a second-order problem does not prescribe).

# %%
print("tutorial 05 complete:",
      f"exact {err_exact:.4f} / stde {err_stde:.4f} / plate {err_plate:.4f}")
