"""A/Bs for the high-dimensional Poisson workflow: the stochastic Laplacian
estimator (`operators.stde_laplacian`) and the exact box condition
(`conditions.DirichletBoxND`).

One manufactured problem per dimension d, interleaved arms (per the repo's
tunnel-noise hygiene: arms alternate within each rep, medians reported):

    -laplacian(u) = (pi^2/d) sum_i sin(pi x_i)   on [0,1]^d
    u = g on the boundary,  analytic solution u* = (1/d) sum_i sin(pi x_i)

Two A/B axes:

1. **Laplacian** (``poisson_{d}d_stde_ab`` rows):
   - ``exact``: `operators.laplacian` — d second partials off the batched
     Taylor series (order-2, d directions).
   - ``stde``:  `operators.stde_laplacian(n_est=16)` — 16 Rademacher probes,
     nested forward-mode, cost independent of d.
   Expect: at low d the exact Laplacian wins (no estimator noise); past
   d ~ a few dozen the STDE arm trains more epochs/s at matching error,
   and the gap widens linearly in d.

2. **Boundary treatment** (``poisson_{d}d_bc_ab`` rows):
   - ``exact``: `DirichletBoxND` — u = g + phi * ANN with phi vanishing on
     every face, so the boundary is satisfied *by construction* at every
     epoch and there is no weight to tune. The extension g is deliberately
     perturbed away from u* by a mask-shaped O(1) term (see
     `perturbed_extension`) so the net must learn a real correction.
   - ``penalty w``: `NoCondition` + `additional_loss` pulling face samples
     (`GeneratorHypercube(boundary=True)`) to the data, at weights
     w in {1, 20, 400} — the knob the exact form eliminates. Total batch
     size is equal across arms (the exact arm spends the penalty arm's
     boundary-point budget on extra interior points).
   Expect: exact <= best-tuned penalty at equal epochs, with zero boundary
   defect; the penalty arms' errors spread with w (the sensitivity the
   artifact records).

There is no reference counterpart for any of this: the reference's
operators (`/root/reference/neurodiffeq/operators.py:77-89`) compute every
second partial explicitly, its samplers cannot reach d >> 3, and its
condition classes (`/root/reference/neurodiffeq/conditions.py`) stop at
DirichletBVP2D.

Run: python benchmarks/stde_ab.py [--quick]   (prints one JSON line per row)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')

import jax.numpy as jnp  # noqa: E402

from neurodiffeq_tpu import fields as F  # noqa: E402
from neurodiffeq_tpu.conditions import DirichletBoxND, NoCondition  # noqa: E402
from neurodiffeq_tpu.generators import GeneratorHypercube  # noqa: E402
from neurodiffeq_tpu.networks import FCNN, SinActv  # noqa: E402
from neurodiffeq_tpu.operators import laplacian, stde_laplacian  # noqa: E402
from neurodiffeq_tpu.solvers import GenericSolver  # noqa: E402
from neurodiffeq_tpu.utils import set_seed  # noqa: E402

PI = np.pi
BC_WEIGHT = 20.0
N_INTERIOR, N_BOUNDARY = 512, 256


def u_star(pts):
    """Analytic solution at an (n, d) array of points."""
    return np.sin(PI * pts).sum(axis=1, keepdims=True) / pts.shape[1]


def perturbed_extension(d):
    """A smooth extension g of the boundary data u*|faces with an O(1)
    interior gap: g = u* + phi * cos(pi x1) cos(pi x2), phi the exact-arm
    mask. With the natural extension g = u* the exact arm's optimum would
    be ANN = 0 and the A/B would hand it a free win; with this g the net
    must learn -cos(pi x1) cos(pi x2), an O(1) target comparable to the
    penalty arm's task of learning u* itself."""
    maskc = DirichletBoxND(d)

    def g(*xs):
        base = sum(F.sin(PI * x) for x in xs) / d
        return base + maskc.mask_field(*xs) * F.cos(PI * xs[0]) * F.cos(PI * xs[1])

    return g


def poisson_system(d, arm, n_est):
    def pde(u, *xs):
        f = sum(F.sin(PI * x) for x in xs) * (PI ** 2 / d)
        if arm == 'stde':
            return [stde_laplacian(u, *xs, n_est=n_est) + f]
        return [laplacian(u, *xs) + f]
    return pde


class CubePoissonPenaltySolver(GenericSolver):
    """GenericSolver + boundary penalty: points ON a face (any coordinate
    exactly at its bound — `GeneratorHypercube(boundary=True)` snaps them
    there) are pulled to the known boundary values of u*."""

    bc_weight = BC_WEIGHT

    def additional_loss(self, residual, funcs, coords):
        vals = [c.value for c in coords]
        on_boundary = jnp.zeros_like(vals[0])
        for v in vals:
            on_boundary = jnp.maximum(
                on_boundary, ((v == 0.0) | (v == 1.0)).astype(v.dtype))
        g = sum(jnp.sin(PI * v) for v in vals) / len(vals)
        u = funcs[0].value.reshape(-1)
        return self.bc_weight * jnp.mean(on_boundary * (u - g.reshape(-1)) ** 2)


def build_solver(d, arm, n_est=16, bc='exact', bc_weight=BC_WEIGHT):
    set_seed(0)
    kwargs = dict(
        diff_eqs=poisson_system(d, arm, n_est),
        nets=[FCNN(n_input_units=d, n_output_units=1,
                   hidden_units=(64, 64), actv=SinActv)],
        valid_generator=GeneratorHypercube(N_INTERIOR, dim=d),
        n_batches_valid=0,
    )
    if bc == 'exact':
        return GenericSolver(
            conditions=[DirichletBoxND(d, boundary_fn=perturbed_extension(d))],
            train_generator=GeneratorHypercube(N_INTERIOR + N_BOUNDARY, dim=d),
            **kwargs)
    solver = CubePoissonPenaltySolver(
        conditions=[NoCondition()],
        train_generator=(GeneratorHypercube(N_INTERIOR, dim=d)
                         + GeneratorHypercube(N_BOUNDARY, dim=d, boundary=True)),
        **kwargs)
    solver.bc_weight = bc_weight
    return solver


def run(d, arm, epochs, n_est=16, bc='exact', bc_weight=BC_WEIGHT):
    solver = build_solver(d, arm, n_est=n_est, bc=bc, bc_weight=bc_weight)
    t0 = time.perf_counter()
    solver.fit(max_epochs=epochs, tqdm_file=None)
    dt = time.perf_counter() - t0
    rng = np.random.default_rng(7)
    pts = rng.random((4096, d))
    sol = solver.get_solution(best=False)
    pred = np.asarray(sol(
        *[pts[:, i] for i in range(d)], to_numpy=True)).reshape(-1, 1)
    rel_l2 = float(np.linalg.norm(pred - u_star(pts))
                   / np.linalg.norm(u_star(pts)))
    # boundary defect: max |u - u*| over points snapped onto random faces
    bpts = rng.random((1024, d))
    bpts[np.arange(1024), rng.integers(0, d, 1024)] = \
        rng.integers(0, 2, 1024).astype(float)
    bpred = np.asarray(sol(
        *[bpts[:, i] for i in range(d)], to_numpy=True)).reshape(-1, 1)
    bdef = float(np.abs(bpred - u_star(bpts)).max())
    return rel_l2, epochs / dt, bdef


def main():
    quick = '--quick' in sys.argv
    dims = (10, 100)
    epochs = 300 if quick else 2000
    reps = 1 if quick else 3

    # Axis 1: exact vs stochastic Laplacian (both on the exact condition).
    for d in dims:
        eps = {'exact': [], 'stde': []}
        errs = {'exact': [], 'stde': []}
        for rep in range(reps):
            for arm in ('exact', 'stde'):
                err, e, _ = run(d, arm, epochs)
                eps[arm].append(e)
                errs[arm].append(err)
                print(f"# d={d} rep {rep} {arm:>5}: rel L2 {err:.4f}, "
                      f"{e:,.1f} epochs/s", file=sys.stderr, flush=True)
        row = {'name': f'poisson_{d}d_stde_ab', 'dim': d, 'epochs': epochs,
               'reps': reps, 'n_est': 16, 'points': N_INTERIOR + N_BOUNDARY,
               'bc': 'exact'}
        for arm in ('exact', 'stde'):
            row[f'{arm}_rel_l2'] = round(float(np.median(errs[arm])), 4)
            row[f'{arm}_eps_median'] = round(float(np.median(eps[arm])), 1)
        row['stde_speedup'] = round(row['stde_eps_median']
                                    / row['exact_eps_median'], 3)
        print(json.dumps(row), flush=True)

    # Axis 2: exact condition vs boundary penalty at 3 weights (stde arm).
    weights = (1.0, 20.0, 400.0)
    for d in dims:
        arms = [('exact', None)] + [('penalty', w) for w in weights]
        recs = {label: [] for label, _ in
                [('exact', None)] + [(f'penalty_w{w:g}', w) for w in weights]}
        for rep in range(reps):
            for bc, w in arms:
                label = 'exact' if w is None else f'penalty_w{w:g}'
                err, _, bdef = run(d, 'stde', epochs, bc=bc,
                                   bc_weight=BC_WEIGHT if w is None else w)
                recs[label].append((err, bdef))
                print(f"# d={d} rep {rep} bc={label}: rel L2 {err:.4f}, "
                      f"boundary defect {bdef:.2e}",
                      file=sys.stderr, flush=True)
        row = {'name': f'poisson_{d}d_bc_ab', 'dim': d, 'epochs': epochs,
               'reps': reps, 'laplacian': 'stde'}
        for label, pairs in recs.items():
            row[f'{label}_rel_l2'] = round(
                float(np.median([e for e, _ in pairs])), 4)
            row[f'{label}_boundary_defect'] = float(
                f"{np.median([b for _, b in pairs]):.3g}")
        print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
