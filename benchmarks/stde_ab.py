"""A/B for the stochastic Laplacian estimator (`operators.stde_laplacian`)
on high-dimensional Poisson — where the exact Laplacian's cost grows with
dimension d (one second-derivative chain per coordinate) while STDE's stays
O(n_est).

One manufactured problem per dimension d, two interleaved arms
(E,S,E,S,... per rep, medians reported, per the repo's tunnel-noise hygiene):

    -laplacian(u) = (pi^2/d) sum_i sin(pi x_i)   on [0,1]^d
    u = g on the boundary,  analytic solution u* = (1/d) sum_i sin(pi x_i)

- ``exact``: `operators.laplacian` — d second partials off the batched
  Taylor series (order-2, d directions).
- ``stde``:  `operators.stde_laplacian(n_est=16)` — 16 Rademacher probes,
  nested forward-mode, cost independent of d.

The boundary is imposed by penalty at points sampled exactly ON the cube
faces (`GeneratorHypercube(boundary=True)` concatenated with the interior
generator); there is no reference counterpart for any of this — the
reference's operators (`/root/reference/neurodiffeq/operators.py:77-89`)
compute every second partial explicitly and its samplers cannot reach
d >> 3.

What to expect: at low d the exact Laplacian wins (no estimator noise, few
extra directions); past d ~ a few dozen the STDE arm trains more epochs/s
with matching converged error, and the gap widens linearly in d.

Run: python benchmarks/stde_ab.py [--quick]   (prints one JSON line per d)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')

import jax.numpy as jnp  # noqa: E402

from neurodiffeq_tpu import fields as F  # noqa: E402
from neurodiffeq_tpu.conditions import NoCondition  # noqa: E402
from neurodiffeq_tpu.generators import GeneratorHypercube  # noqa: E402
from neurodiffeq_tpu.networks import FCNN, SinActv  # noqa: E402
from neurodiffeq_tpu.operators import laplacian, stde_laplacian  # noqa: E402
from neurodiffeq_tpu.solvers import GenericSolver  # noqa: E402
from neurodiffeq_tpu.utils import set_seed  # noqa: E402

PI = np.pi
BC_WEIGHT = 20.0


def u_star(pts):
    """Analytic solution at an (n, d) array of points."""
    return np.sin(PI * pts).sum(axis=1, keepdims=True) / pts.shape[1]


def poisson_system(d, arm, n_est):
    def pde(u, *xs):
        f = sum(F.sin(PI * x) for x in xs) * (PI ** 2 / d)
        if arm == 'stde':
            return [stde_laplacian(u, *xs, n_est=n_est) + f]
        return [laplacian(u, *xs) + f]
    return pde


class CubePoissonSolver(GenericSolver):
    """GenericSolver + boundary penalty: points ON a face (any coordinate
    exactly at its bound — `GeneratorHypercube(boundary=True)` snaps them
    there) are pulled to the known boundary values of u*."""

    def additional_loss(self, residual, funcs, coords):
        vals = [c.value for c in coords]
        on_boundary = jnp.zeros_like(vals[0])
        for v in vals:
            on_boundary = jnp.maximum(
                on_boundary, ((v == 0.0) | (v == 1.0)).astype(v.dtype))
        g = sum(jnp.sin(PI * v) for v in vals) / len(vals)
        u = funcs[0].value.reshape(-1)
        return BC_WEIGHT * jnp.mean(on_boundary * (u - g.reshape(-1)) ** 2)


def build_solver(d, arm, n_interior=512, n_boundary=256, n_est=16):
    set_seed(0)
    gen = (GeneratorHypercube(n_interior, dim=d)
           + GeneratorHypercube(n_boundary, dim=d, boundary=True))
    return CubePoissonSolver(
        diff_eqs=poisson_system(d, arm, n_est),
        conditions=[NoCondition()],
        nets=[FCNN(n_input_units=d, n_output_units=1,
                   hidden_units=(64, 64), actv=SinActv)],
        train_generator=gen,
        valid_generator=GeneratorHypercube(n_interior, dim=d),
        n_batches_valid=0,
    )


def run(d, arm, epochs, n_est=16):
    solver = build_solver(d, arm, n_est=n_est)
    t0 = time.perf_counter()
    solver.fit(max_epochs=epochs, tqdm_file=None)
    dt = time.perf_counter() - t0
    rng = np.random.default_rng(7)
    pts = rng.random((4096, d))
    pred = np.asarray(solver.get_solution(best=False)(
        *[pts[:, i] for i in range(d)], to_numpy=True)).reshape(-1, 1)
    exact = u_star(pts)
    rel_l2 = float(np.linalg.norm(pred - exact) / np.linalg.norm(exact))
    return rel_l2, epochs / dt


def main():
    quick = '--quick' in sys.argv
    dims = (10, 100)
    epochs = 300 if quick else 2000
    reps = 1 if quick else 3

    for d in dims:
        eps = {'exact': [], 'stde': []}
        errs = {'exact': [], 'stde': []}
        for rep in range(reps):
            for arm in ('exact', 'stde'):
                err, e = run(d, arm, epochs)
                eps[arm].append(e)
                errs[arm].append(err)
                print(f"# d={d} rep {rep} {arm:>5}: rel L2 {err:.4f}, "
                      f"{e:,.1f} epochs/s", file=sys.stderr, flush=True)
        row = {'name': f'poisson_{d}d_stde_ab', 'dim': d, 'epochs': epochs,
               'reps': reps, 'n_est': 16, 'points': 512 + 256}
        for arm in ('exact', 'stde'):
            row[f'{arm}_rel_l2'] = round(float(np.median(errs[arm])), 4)
            row[f'{arm}_eps_median'] = round(float(np.median(eps[arm])), 1)
        row['stde_speedup'] = round(row['stde_eps_median']
                                    / row['exact_eps_median'], 3)
        print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
