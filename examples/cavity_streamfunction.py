"""Lid-driven cavity Re=100 in streamfunction-vorticity form (beyond the
reference's formulation).

Instead of the primitive-variable (u, v, p) system the reference's notebook
uses (experiments/lid-driven-cavity-RE100.ipynb), solve for the
streamfunction psi and vorticity w with ONE shared FCNN(2 -> ... -> 2):

    u = psi_y,  v = -psi_x            (continuity holds EXACTLY)
    r1 = w + psi_xx + psi_yy          (vorticity definition)
    r2 = psi_y w_x - psi_x w_y - (1/Re)(w_xx + w_yy)   (steady transport)

and build ALL velocity boundary conditions into the trial function:

    psi = y^2 (y-1) e^{-k(1-y)} u_lid(x) + [x(1-x) y(1-y)]^2 * ANN_psi

The squared bump factor zeroes both psi and grad(psi) from the network term
on the boundary, so no-slip on the three walls and the lid profile are exact
by construction; the particular term supplies psi_y(x, 1) = u_lid(x), with
the e^{-k(1-y)} factor (k=20) localizing it to a band under the lid — the
essential detail: the global k=0 variant stalls training (see PsiCavity's
docstring and benchmarks/RESULTS.md). The lid is a C^1 regularized profile
u_lid(x) = (1 - e^{-(Ax)^2})(1 - e^{-(A(x-1))^2}) (zero value AND slope at
the corners, boundary-layer width 1/A like the notebook's profile). There is
no pressure field, hence no gauge to pin.

Everything is 1st/2nd-order same-direction derivatives, so the whole coupled
system stays on the batched Taylor fast path. Compare: the pure-psi
(biharmonic) form needs mixed 3rd/4th partials, and the reference's torch
implementation would pay quartic autograd chains.

Measured (one v5e chip, 16,384 points/step, FCNN 2-(128x5)-2): 20k steps in
~1 min reach max centerline deviation **u 0.015 / v 0.027** vs the Ghia et
al. (1982) tables — 3x more accurate than the primitive-variable deep
config (0.047/0.054) in a QUARTER of its steps, because continuity is exact
and there is no pressure field to resolve. See benchmarks/RESULTS.md.

Run: python examples/cavity_streamfunction.py [steps] [--adaptive]
(~20k steps converge; --adaptive trains on RAD-selected points)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.networks import FCNN
from neurodiffeq_tpu.conditions import BaseCondition
from neurodiffeq_tpu.generators import Generator1D, Generator2D, ResidualAdaptiveGenerator
from neurodiffeq_tpu.solvers import Solver2D
from neurodiffeq_tpu.utils import set_seed

from lid_driven_cavity import GHIA_X, GHIA_Y, GHIA_U, GHIA_V

A = 50.0  # lid-profile boundary-layer sharpness (the notebook uses 50)


def u_lid(x):
    """C^1 regularized lid profile: 1 in the interior, 0 value AND slope at
    the corners (required for psi-form compatibility: v = -psi_x must vanish
    on the side walls, which needs u_lid'(0) = u_lid'(1) = 0)."""
    return (1 - F.exp(-((A * x) ** 2))) * (1 - F.exp(-((A * (x - 1)) ** 2)))


class PsiCavity(BaseCondition):
    """All four velocity BCs, exactly:

        psi = y^2 (y-1) e^{-k(1-y)} u_lid(x) + B^2 ANN,  B = x(1-x)y(1-y)

    The e^{-k(1-y)} factor localizes the particular term to a ~1/k band
    below the lid. Without it (k=0) the term's x-curvature u_lid'' ~ 2A^2
    extends down the ENTIRE side-wall strips, demanding O(A^2) vorticity
    where the B^2-damped network cannot supply it — measured to stall
    training at loss ~1e3. With the band, the implied vorticity lives only
    near the lid (physical corner shear, O(2k + A)). All boundary values
    stay exact: at y=1 the factor is 1 (psi_y = u_lid), and the y^2(y-1)
    prefactor still zeroes psi, psi_x, psi_y on the other three walls.
    """

    def __init__(self, lid_band_k=20.0):
        super().__init__()
        self.k = lid_band_k

    def parameterize(self, out, x, y):
        bump = x * (1 - x) * y * (1 - y)
        particular = y * y * (y - 1) * F.exp(-self.k * (1 - y)) * u_lid(x)
        return particular + bump * bump * out


class ScaledOutput(BaseCondition):
    """Free field with an output scale (vorticity reaches O(30) at the lid)."""

    def __init__(self, scale=1.0):
        super().__init__()
        self.scale = scale

    def parameterize(self, out, x, y):
        return self.scale * out


def stream_vorticity(Re):
    nu = 1.0 / Re

    def eqs(psi, w, x, y):
        u = diff(psi, y)
        v = -diff(psi, x)
        r_def = w + diff(psi, x, 2) + diff(psi, y, 2)
        r_transport = u * diff(w, x) + v * diff(w, y) - nu * (diff(w, x, 2) + diff(w, y, 2))
        return [r_def, r_transport]

    return eqs


def build(Re=100.0, n_points=16384, hidden=(128,) * 5, anneal_steps=20000,
          w_scale=50.0, w_weight=0.3, lid_band_k=20.0, adaptive=False, seed=4,
          **solver_kwargs):
    import optax
    import warnings
    set_seed(seed)
    net = FCNN(n_input_units=2, n_output_units=2, hidden_units=tuple(hidden))
    conds = [PsiCavity(lid_band_k), ScaledOutput(w_scale)]
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', DeprecationWarning)
        for i, c in enumerate(conds):
            c.set_impose_on(i)
    gen = (Generator1D(n_points, 0.0, 1.0, method='uniform')
           * Generator1D(n_points, 0.0, 1.0, method='uniform'))
    if adaptive:
        gen = ResidualAdaptiveGenerator(gen, oversample=2)
    # w_weight down-weights the vorticity-definition residual relative to
    # transport (hand-tuned 0.3; equivalent quadratic loss weight w_weight^2)
    return Solver2D(
        pde_system=stream_vorticity(Re),
        residual_weights=[w_weight ** 2, 1.0],
        conditions=conds,
        xy_min=(0, 0), xy_max=(1, 1),
        nets=[net, net],
        train_generator=gen,
        valid_generator=Generator2D((32, 32), (0, 0), (1, 1), method='equally-spaced'),
        n_batches_valid=0,
        optimizer=optax.adam(optax.cosine_decay_schedule(1e-3, anneal_steps, alpha=0.01)),
        **solver_kwargs,
    )


def velocities(solver, xs, ys, best=False):
    """u = psi_y, v = -psi_x evaluated through the trained trial function."""
    params = solver.best_params if (best and solver.best_params is not None) else solver.params
    cols = [np.asarray(xs, dtype=np.float64).reshape(-1, 1),
            np.asarray(ys, dtype=np.float64).reshape(-1, 1)]
    funcs, coords = solver._forward(params, cols)
    psi, x, y = funcs[0], coords[0], coords[1]
    u = diff(psi, y).value
    v = -diff(psi, x).value
    return np.asarray(u).reshape(-1), np.asarray(v).reshape(-1)


def ghia_errors(solver, best=False):
    u_mid, _ = velocities(solver, 0.5 * np.ones_like(GHIA_Y), GHIA_Y, best=best)
    _, v_mid = velocities(solver, GHIA_X, 0.5 * np.ones_like(GHIA_X), best=best)
    return float(np.abs(u_mid - GHIA_U).max()), float(np.abs(v_mid - GHIA_V).max())


def main(steps=20000, adaptive=False):
    solver = build(anneal_steps=steps, adaptive=adaptive)
    t0 = time.perf_counter()
    solver.fit(max_epochs=steps, tqdm_file=None)
    loss = solver.metrics_history['train_loss'][-1]
    dt = time.perf_counter() - t0
    print(f"{steps} steps in {dt:.1f}s ({steps / dt:.0f} st/s), final loss {loss:.3e}")
    u_err, v_err = ghia_errors(solver)
    print(f"max |u - Ghia| on centerline: {u_err:.4f}; max |v - Ghia|: {v_err:.4f}")

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        n = 64
        g = np.linspace(0, 1, n)
        X, Y = np.meshgrid(g, g)
        u, v = velocities(solver, X.ravel(), Y.ravel())
        fig, ax = plt.subplots(figsize=(5, 5))
        speed = np.hypot(u, v).reshape(n, n)
        ax.streamplot(X, Y, u.reshape(n, n), v.reshape(n, n),
                      color=speed, cmap='viridis', density=1.4)
        ax.set_title(f'cavity Re=100, psi-omega form ({steps} steps)')
        fig.savefig('cavity_psi_streamlines.png', dpi=110, bbox_inches='tight')
        print('saved cavity_psi_streamlines.png')
    except Exception as e:  # pragma: no cover
        print(f'(plot skipped: {e})')


if __name__ == '__main__':
    main(steps=int(sys.argv[1]) if len(sys.argv) > 1 else 20000,
         adaptive='--adaptive' in sys.argv)
