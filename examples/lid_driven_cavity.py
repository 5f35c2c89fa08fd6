"""Steady lid-driven cavity flow at Re=100 (the reference's
experiments/lid-driven-cavity-RE100.ipynb workload): coupled (u, v, p)
Navier-Stokes, one shared FCNN(2 -> 256 -> 3).

Two formulations:

- ``hard`` (default; the notebook's): constraints are built into the trial
  solution —

  * u = x(1-x)y(1-y)·ANN_u + y·u_T(x)  with the smoothed lid profile
    u_T(x) = (1 - e^{-50x})(1 - e^{50(x-1)}),
  * v = x(1-x)y(1-y)·ANN_v   (zero on all walls),
  * p = (1-e^{-x})(1-e^{-y})·ANN_p  (pins the pressure gauge).

- ``penalty``: soft boundary losses (the temporal-subsystem style).

- ``deep`` (RECOMMENDED): same hard constraints with a 5x128 net and 16,384
  uniform points per step — converges to ~0.05 max centerline deviation from
  Ghia et al. (1982) in ~80k steps (~9 min on one v5e chip). The shallow
  notebook configuration is basin-unstable in both frameworks (see
  benchmarks/RESULTS.md).

Run: python examples/lid_driven_cavity.py [epochs] [deep|hard|penalty]
(e.g. `python examples/lid_driven_cavity.py 80000 deep`)
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.networks import FCNN
from neurodiffeq_tpu.conditions import BaseCondition, NoCondition
from neurodiffeq_tpu.generators import Generator2D
from neurodiffeq_tpu.solvers import Solver2D
from neurodiffeq_tpu.utils import set_seed


def u_lid(x):
    """Smoothed lid velocity profile (the notebook's u_T_approximation)."""
    return (1 - F.exp(-50.0 * x)) * (1 - F.exp(50.0 * (x - 1)))


class HardCavityU(BaseCondition):
    """u vanishes on the three walls and equals u_T(x) on the lid (y=1)."""

    def parameterize(self, out, x, y):
        return x * (1 - x) * y * (1 - y) * out + y * u_lid(x)


class HardCavityV(BaseCondition):
    """v vanishes on all four boundaries."""

    def parameterize(self, out, x, y):
        return x * (1 - x) * y * (1 - y) * out


class HardCavityP(BaseCondition):
    """Pressure gauge: p(0, y) = p(x, 0) = 0."""

    def parameterize(self, out, x, y):
        return (1 - F.exp(-x)) * (1 - F.exp(-y)) * out


def navier_stokes(Re):
    nu = 1.0 / Re

    def ns(u, v, p, x, y):
        mom_x = (u * diff(u, x) + v * diff(u, y) + diff(p, x)
                 - nu * (diff(u, x, 2) + diff(u, y, 2)))
        mom_y = (u * diff(v, x) + v * diff(v, y) + diff(p, y)
                 - nu * (diff(v, x, 2) + diff(v, y, 2)))
        continuity = diff(u, x) + diff(v, y)
        return [mom_x, mom_y, continuity]

    return ns


def build_hard(Re=100.0, grid=64, hidden=256):
    """The notebook's configuration: shared FCNN(2, 3), hard constraints,
    uniform random collocation points strictly INSIDE the domain (the
    notebook's generator_2dspatial_rectangle(random=True)).

    In-domain sampling matters here: the lid profile's e^{+-50x} layers make
    the residual explode just OUTSIDE [0,1], so grid-plus-gaussian-noise
    sampling (which steps out of the domain near walls) poisons the loss.
    """
    import warnings
    from neurodiffeq_tpu.generators import Generator1D
    net = FCNN(n_input_units=2, n_output_units=3, hidden_units=(hidden,))
    conds = [HardCavityU(), HardCavityV(), HardCavityP()]
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', DeprecationWarning)
        for i, c in enumerate(conds):
            c.set_impose_on(i)
    n = grid * grid
    uniform2d = (Generator1D(n, 0.0, 1.0, method='uniform')
                 * Generator1D(n, 0.0, 1.0, method='uniform'))
    return Solver2D(
        pde_system=navier_stokes(Re),
        conditions=conds,
        xy_min=(0, 0), xy_max=(1, 1),
        nets=[net, net, net],
        train_generator=uniform2d,
        valid_generator=Generator2D((grid, grid), (0, 0), (1, 1), method='equally-spaced'),
        n_batches_valid=0,
    )


def build_deep(Re=100.0, n_points=16384, hidden=(128,) * 5, anneal_steps=80000):
    """The RECOMMENDED configuration (round-2 study): the notebook's shallow
    256-unit net cannot hold both the lid corner layers and the interior
    vortex — training transits the physical basin around step ~8k and then
    drifts out (in the reference's own torch implementation too; gradients
    are bit-identical, see tests/test_torch_parity.py). Depth + points fix
    it: a 5x128 net on 16,384 fresh uniform points per step with one cosine
    anneal reaches max centerline deviation ~0.05 from Ghia et al. (1982)
    in ~9 minutes on one TPU v5e chip (~540x more steps/s than the
    reference's torch-CPU protocol).
    """
    import optax
    import warnings
    from neurodiffeq_tpu.generators import Generator1D
    net = FCNN(n_input_units=2, n_output_units=3, hidden_units=tuple(hidden))
    conds = [HardCavityU(), HardCavityV(), HardCavityP()]
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', DeprecationWarning)
        for i, c in enumerate(conds):
            c.set_impose_on(i)
    uniform2d = (Generator1D(n_points, 0.0, 1.0, method='uniform')
                 * Generator1D(n_points, 0.0, 1.0, method='uniform'))
    return Solver2D(
        pde_system=navier_stokes(Re),
        conditions=conds,
        xy_min=(0, 0), xy_max=(1, 1),
        nets=[net, net, net],
        train_generator=uniform2d,
        valid_generator=Generator2D((32, 32), (0, 0), (1, 1), method='equally-spaced'),
        n_batches_valid=0,
        optimizer=optax.adam(optax.cosine_decay_schedule(1e-3, anneal_steps, alpha=0.01)),
    )


def build_penalty(Re=100.0, grid=32, hidden=256):
    class CavitySolver(Solver2D):
        def additional_loss(self, residual, funcs, coords):
            u, v, p = funcs
            x, y = coords
            xv, yv = x.value, y.value
            uv, vv = u.value, v.value
            on_wall = ((xv < 1e-2) | (xv > 1 - 1e-2) | (yv < 1e-2)).astype(xv.dtype)
            on_lid = (yv > 1 - 1e-2).astype(xv.dtype)
            bc = (((on_wall * uv) ** 2).mean() + ((on_wall * vv) ** 2).mean()
                  + ((on_lid * (uv - 1.0)) ** 2).mean() + ((on_lid * vv) ** 2).mean())
            return 10.0 * bc

    return CavitySolver(
        pde_system=navier_stokes(Re),
        conditions=[NoCondition(), NoCondition(), NoCondition()],
        xy_min=(0, 0), xy_max=(1, 1),
        nets=[FCNN(2, 1, hidden_units=(hidden,)) for _ in range(3)],
        train_generator=Generator2D((grid, grid), (0, 0), (1, 1), method='equally-spaced-noisy'),
        valid_generator=Generator2D((grid, grid), (0, 0), (1, 1), method='equally-spaced'),
    )


# Ghia, Ghia & Shin (1982) benchmark profiles for Re=100 (129x129 grid):
# u along the vertical centerline x=0.5 and v along the horizontal
# centerline y=0.5 (the same tables the reference notebook plots against,
# experiments/lid-driven-cavity-RE100.ipynb cell 11).
GHIA_Y = np.array([1.0000, 0.9766, 0.9688, 0.9609, 0.9531, 0.8516,
                   0.7344, 0.6172, 0.5000, 0.4531, 0.2813, 0.1719,
                   0.1016, 0.0703, 0.0625, 0.0547, 0.0000])
GHIA_U = np.array([1.00000, 0.84123, 0.78871, 0.73722, 0.68717, 0.23151,
                   0.00332, -.13641, -.20581, -.21090, -.15662, -.10150,
                   -.06434, -.04775, -.04192, -.03717, 0.00000])
GHIA_X = np.array([1.0000, 0.9688, 0.9609, 0.9531, 0.9453, 0.9063,
                   0.8594, 0.8047, 0.5000, 0.2344, 0.2266, 0.1563,
                   0.0938, 0.0781, 0.0703, 0.0625, 0.0000])
GHIA_V = np.array([0.00000, -.05906, -.07391, -.08864, -.10313, -.16914,
                   -.22445, -.24533, 0.05454, 0.17527, 0.17507, 0.16077,
                   0.12317, 0.10890, 0.10091, 0.09233, 0.00000])


def ghia_errors(sol):
    """Max abs deviation of centerline u/v profiles from the Ghia tables."""
    u_mid, _, _ = sol(0.5 * np.ones_like(GHIA_Y), GHIA_Y)
    _, v_mid, _ = sol(GHIA_X, 0.5 * np.ones_like(GHIA_X))
    u_err = np.abs(np.asarray(u_mid).reshape(-1) - GHIA_U).max()
    v_err = np.abs(np.asarray(v_mid).reshape(-1) - GHIA_V).max()
    return float(u_err), float(v_err)


def main(epochs=3000, mode='hard', Re=100.0, plot_prefix='cavity', grid=None):
    set_seed(4 if mode == 'deep' else 0)
    kwargs = {} if grid is None else {'grid': grid}
    if mode == 'deep':
        solver = build_deep(Re, anneal_steps=epochs)
    elif mode == 'hard':
        solver = build_hard(Re, **kwargs)
    else:
        solver = build_penalty(Re, **kwargs)
    import time
    t0 = time.perf_counter()
    # tqdm_file=None keeps fit() on the chunked on-device scan (a live
    # progress bar would force one host sync per epoch — 10-100x slower)
    solver.fit(max_epochs=epochs, tqdm_file=None)
    dt = time.perf_counter() - t0
    print(f"{mode}: {epochs} epochs in {dt:.1f}s ({epochs / dt:.0f} ep/s), "
          f"final train loss: {solver.metrics_history['train_loss'][-1]:.3e}")

    # center-line velocity profiles (classic cavity diagnostic, Ghia et al. 1982)
    sol = solver.get_solution()
    ys = np.linspace(0, 1, 17)
    u_mid, v_mid, _ = sol(0.5 * np.ones(17), ys)
    print("u(0.5, y):", np.round(np.asarray(u_mid).reshape(-1), 4))
    xs = np.linspace(0, 1, 17)
    _, v_x, _ = sol(xs, 0.5 * np.ones(17))
    print("v(x, 0.5):", np.round(np.asarray(v_x).reshape(-1), 4))
    u_err, v_err = ghia_errors(sol)
    print(f"max |u - Ghia| on centerline: {u_err:.4f}; max |v - Ghia|: {v_err:.4f}")

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        from neurodiffeq_tpu.monitors import StreamPlotMonitor2D

        # u / v / p field heatmaps
        n = 64
        gx, gy = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n), indexing='ij')
        uu, vv, pp = sol(gx.ravel(), gy.ravel())
        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        for ax, f, name in zip(axes, (uu, vv, pp), ('u', 'v', 'p')):
            im = ax.pcolormesh(gx, gy, np.asarray(f).reshape(n, n), shading='auto', cmap='RdBu_r')
            fig.colorbar(im, ax=ax)
            ax.set_title(name)
            ax.set_aspect('equal')
        fig.savefig(f'{plot_prefix}_fields.png', bbox_inches='tight', dpi=120)
        print(f"field plots saved to {plot_prefix}_fields.png")

        m = StreamPlotMonitor2D(xy_min=(0, 0), xy_max=(1, 1), pairs=[(0, 1)],
                                nx=24, ny=24, field_names=['velocity'])
        m.check(solver.nets, solver.conditions, solver.metrics_history,
                params=solver._expand_params(solver.params))
        m.fig.savefig(f'{plot_prefix}_streamlines.png', bbox_inches='tight')
        print(f"streamline plot saved to {plot_prefix}_streamlines.png")
    except Exception as e:
        print(f"(plotting skipped: {e})")
    return solver


if __name__ == '__main__':
    main(epochs=int(sys.argv[1]) if len(sys.argv) > 1 else 3000,
         mode=sys.argv[2] if len(sys.argv) > 2 else 'hard',
         grid=int(sys.argv[3]) if len(sys.argv) > 3 else None)
