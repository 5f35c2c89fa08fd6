"""Viscous Burgers' equation — the canonical PINN shock benchmark.

    u_t + u u_x = nu u_xx,   x in [-1, 1], t in [0, 1],  nu = 0.01/pi
    u(x, 0) = -sin(pi x),    u(-1, t) = u(1, t) = 0

(the Raissi et al. 2019 configuration). The solution steepens into a thin
internal layer at x = 0 of width O(nu) — exactly the regime where
residual-adaptive collocation (``ResidualAdaptiveGenerator``, no reference
analog) earns its keep: the sampler concentrates points on the shock where
the residual lives.

Workflow parity: IBVP1D exact initial+boundary enforcement (reference
``conditions.py:512-712``) + Solver2D over (x, t) (reference
``solvers.py:1422-1593``). The analytic reference solution is evaluated from
the Cole–Hopf transform with Gauss–Hermite quadrature — the standard exact
solution for this benchmark.

Run: python examples/burgers.py [epochs] [uniform|adaptive]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.conditions import IBVP1D
from neurodiffeq_tpu.generators import (
    Generator1D, Generator2D, ResidualAdaptiveGenerator,
)
from neurodiffeq_tpu.networks import FCNN
from neurodiffeq_tpu.solvers import Solver2D
from neurodiffeq_tpu.utils import set_seed

NU = 0.01 / np.pi


def burgers_exact(x, t, n_quad=64):
    """Cole–Hopf solution via Gauss–Hermite quadrature.

    u(x,t) = -2 nu d/dx log(phi) where phi solves the heat equation with
    phi(x,0) = exp(-cos(pi x)/(2 pi nu)). Substituting eta = (x - y)/sqrt(4 nu t)
    turns both integrals into Gauss–Hermite form (weight e^{-eta^2}).
    """
    x = np.asarray(x, dtype=np.float64)
    t = np.asarray(t, dtype=np.float64)
    eta, w = np.polynomial.hermite.hermgauss(n_quad)
    out = np.empty(np.broadcast(x, t).shape)
    xb, tb = np.broadcast_arrays(x, t)
    flat_x, flat_t = xb.ravel(), tb.ravel()
    for i, (xi, ti) in enumerate(zip(flat_x, flat_t)):
        if ti < 1e-12:
            out.ravel()[i] = -np.sin(np.pi * xi)
            continue
        y = xi - np.sqrt(4.0 * NU * ti) * eta
        expo = -np.cos(np.pi * y) / (2.0 * np.pi * NU)
        expo -= expo.max()  # stabilize: common factor cancels in the ratio
        f = np.exp(expo)
        num = np.sum(w * f * np.sin(np.pi * y))
        den = np.sum(w * f)
        out.ravel()[i] = -num / den
    return out


def build(sampling='adaptive', n_points=2048):
    cond = IBVP1D(
        x_min=-1.0, x_max=1.0, t_min=0.0,
        t_min_val=lambda x: -F.sin(np.pi * x),
        x_min_val=lambda t: 0 * t,
        x_max_val=lambda t: 0 * t,
    )
    eq = lambda u, x, t: [diff(u, t) + u * diff(u, x) - NU * diff(u, x, order=2)]
    # uniform-in-the-box sampling: ensemble of independent uniform axes
    # (the generator `*` algebra, reference generators.py:66-76)
    base = (Generator1D(n_points, -1.0, 1.0, method='uniform')
            * Generator1D(n_points, 0.0, 1.0, method='uniform'))
    if sampling == 'adaptive':
        train_gen = ResidualAdaptiveGenerator(base, oversample=8,
                                              strategy='power', alpha=1.0, c=1.0)
    else:
        train_gen = base
    # Raissi et al.'s 8x20 tanh: depth resolves the sharp layer better than
    # width — measured vs (64, 64, 64): Adam train loss 1.9e-2 vs 4.8e-2,
    # post-polish loss 6.5e-3 vs 1.2e-2, mean err 0.0126 vs 0.0141.
    net = FCNN(n_input_units=2, hidden_units=(20,) * 8)
    return Solver2D(
        pde_system=eq, conditions=[cond],
        xy_min=(-1.0, 0.0), xy_max=(1.0, 1.0),
        nets=[net], train_generator=train_gen,
        valid_generator=Generator2D((32, 32), xy_min=(-1.0, 0.0),
                                    xy_max=(1.0, 1.0), method='equally-spaced'),
    )


def polish_lbfgs(solver, epochs=500, n_points=8192):
    """Full-batch L-BFGS fine-tune on a frozen UNIFORM point set.

    The standard PINN recipe (Adam explores, L-BFGS polishes): freeze one
    dense uniform draw so every L-BFGS step sees the same deterministic
    objective, and hot-swap the draw + optax.lbfgs via
    ``set_generator``/``set_optimizer`` (the closure-style optimizer path).

    Measured (examples/README.md): shock-concentrated frozen draws make the
    polish WORSE, monotonically in concentration — uniform reaches mean err
    0.014 (L-BFGS loss 1.9e-2 -> 1.2e-2); RAD-weighted (|r|/mean|r| + 1,
    Wu et al. 2023) stalls at loss 4e-2 with max err degraded 0.263 -> 0.299;
    greedy top-half-by-residual degrades both. A frozen objective dominated
    by the irreducible O(nu) shock residual polishes the shock at the
    expense of everywhere else, so residual-adaptive selection belongs in
    the stochastic Adam phase (where it does win — see README table), NOT
    in the deterministic polish. Set ``BURGERS_POLISH_DRAW=rad`` to rerun
    that A/B arm."""
    import optax
    from neurodiffeq_tpu.generators import PredefinedGenerator

    rng = np.random.default_rng(1)
    cand_x = rng.uniform(-1.0, 1.0, size=8 * n_points)
    cand_t = rng.uniform(0.0, 1.0, size=8 * n_points)
    if os.environ.get('BURGERS_POLISH_DRAW', 'uniform') == 'rad':
        score = np.abs(solver.get_residuals(cand_x, cand_t, to_numpy=True,
                                            best=False))
        p = score / score.mean() + 1.0
    else:  # uniform frozen draw (measured default)
        p = np.ones_like(cand_x)
    idx = rng.choice(len(p), size=n_points, replace=False, p=p / p.sum())
    solver.set_generator(PredefinedGenerator(cand_x[idx], cand_t[idx]),
                         phase='train')
    solver.set_optimizer(optax.lbfgs())
    solver.fit(max_epochs=epochs, tqdm_file=None)


def evaluate(solver):
    """Max/mean abs error on a 201x101 grid plus the t=1 shock profile."""
    xs = np.linspace(-1.0, 1.0, 201)
    ts = np.linspace(0.0, 1.0, 101)
    X, Tm = np.meshgrid(xs, ts, indexing='ij')
    sol = solver.get_solution()
    u = np.asarray(sol(X.ravel(), Tm.ravel())).reshape(X.shape)
    u_ref = burgers_exact(X, Tm)
    err = np.abs(u - u_ref)
    return float(err.max()), float(err.mean())


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    sampling = sys.argv[2] if len(sys.argv) > 2 else 'adaptive'
    polish = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    set_seed(0)
    solver = build(sampling)
    t0 = time.time()
    solver.fit(max_epochs=epochs, tqdm_file=None)
    dt = time.time() - t0
    mx, mean = evaluate(solver)
    print(f'{sampling}: {epochs} Adam epochs in {dt:.1f}s '
          f'({epochs / dt:.0f} eps) | max err {mx:.4f} mean err {mean:.5f}')
    tl = solver.metrics_history['train_loss']
    print(f'  adam train loss: {tl[0]:.3e} -> {tl[-1]:.3e}')
    if polish:
        t0 = time.time()
        polish_lbfgs(solver, epochs=polish)
        mx, mean = evaluate(solver)
        tl = solver.metrics_history['train_loss'][-polish:]
        print(f'+ L-BFGS x{polish} ({time.time() - t0:.1f}s): '
              f'max err {mx:.4f} mean err {mean:.5f}')
        print(f'  lbfgs train loss: {tl[0]:.3e} -> min {min(tl):.3e} '
              f'-> last {tl[-1]:.3e}')


if __name__ == '__main__':
    main()
