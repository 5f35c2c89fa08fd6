"""A/B for the stochastic biharmonic estimator (`operators.stde_biharmonic`)
on a high-dimensional clamped-plate problem — the 4th-order companion to
`benchmarks/stde_ab.py`'s Laplacian A/B, and the workload where exact
differentiation is at its worst: the full biharmonic needs one 4th-order
chain per coordinate *pair*, O(d^2), vs O(n_est) probe pairs for STDE.

One manufactured problem per dimension d, interleaved arms (per the repo's
tunnel-noise hygiene: arms alternate within each rep, medians reported):

    Delta^2 u = (pi^4/d) sum_i sin(pi x_i)   on [0,1]^d
    clamped BCs: u = g and du/dn = dg/dn on every face,
    analytic solution u* = (1/d) sum_i sin(pi x_i)

Boundary treatment: `DirichletBoxND(power=2)` — the squared mask vanishes
to SECOND order on every face so both u and its normal derivative match the
extension g by construction, at every epoch, with no penalty weight. The
extension is deliberately perturbed away from u* by a mask^2-shaped O(1)
term (same trick as `stde_ab.perturbed_extension`) so the net must learn a
real correction.

Arms:

- ``exact``: `operators.biharmonic` — all d(d+1)/2 fourth-order terms,
  evaluated as one vmapped basis-pair directional-derivative kernel
  (compile-flat in d; runtime O(d^2)). The naive composed
  `laplacian(laplacian(u))` is NOT used: it Python-unrolls d^2
  fourth-order chains and its XLA compile alone took 96 s at d=4 /
  >10 min at d=10 inside a train step (measured; see the `biharmonic`
  docstring).
- ``stde``: `stde_biharmonic(n_est=16)` — 16 independent Rademacher probe
  *pairs*, four nested jvp levels each, cost independent of d.

Expect: the exact arm's epochs/s falls ~quadratically with d while STDE's
stays flat; converged errors match where both are feasible. There is no
reference counterpart: `/root/reference/neurodiffeq/operators.py` stops at
second-order operators entirely.

Run: python benchmarks/biharmonic_ab.py [--quick]  (one JSON line per d)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')

from neurodiffeq_tpu import fields as F  # noqa: E402
from neurodiffeq_tpu.conditions import DirichletBoxND  # noqa: E402
from neurodiffeq_tpu.generators import GeneratorHypercube  # noqa: E402
from neurodiffeq_tpu.networks import FCNN, SinActv  # noqa: E402
from neurodiffeq_tpu.operators import biharmonic, stde_biharmonic  # noqa: E402
from neurodiffeq_tpu.solvers import GenericSolver  # noqa: E402
from neurodiffeq_tpu.utils import set_seed  # noqa: E402

PI = np.pi
N_POINTS = 512


def u_star(pts):
    """Analytic solution at an (n, d) array of points."""
    return np.sin(PI * pts).sum(axis=1, keepdims=True) / pts.shape[1]


def perturbed_extension(d):
    """g = u* + phi^2 * cos(pi x1) cos(pi x2): matches u* AND its normal
    derivatives on the boundary (phi^2 vanishes to 2nd order), but sits an
    O(1) mask^2-shaped gap away in the interior, so the clamped arm's net
    must learn -cos(pi x1) cos(pi x2) rather than winning with ANN = 0."""
    maskc = DirichletBoxND(d)

    def g(*xs):
        base = sum(F.sin(PI * x) for x in xs) / d
        phi = maskc.mask_field(*xs)
        return base + phi * phi * F.cos(PI * xs[0]) * F.cos(PI * xs[1])

    return g


def biharmonic_system(d, arm, n_est):
    def pde(u, *xs):
        f = sum(F.sin(PI * x) for x in xs) * (PI ** 4 / d)
        if arm == 'exact':
            bh = biharmonic(u, *xs)
        else:
            bh = stde_biharmonic(u, *xs, n_est=n_est)
        return [bh - f]
    return pde


def build_solver(d, arm, n_est=16):
    set_seed(0)
    return GenericSolver(
        diff_eqs=biharmonic_system(d, arm, n_est),
        conditions=[DirichletBoxND(d, boundary_fn=perturbed_extension(d),
                                   power=2)],
        nets=[FCNN(n_input_units=d, n_output_units=1,
                   hidden_units=(64, 64), actv=SinActv)],
        train_generator=GeneratorHypercube(N_POINTS, dim=d),
        valid_generator=GeneratorHypercube(N_POINTS, dim=d),
        n_batches_valid=0,
    )


def run(d, arm, epochs, n_est=16):
    solver = build_solver(d, arm, n_est=n_est)
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
    # clamped-boundary defect: max |u - u*| over points snapped onto faces
    bpts = rng.random((1024, d))
    bpts[np.arange(1024), rng.integers(0, d, 1024)] = \
        rng.integers(0, 2, 1024).astype(float)
    bpred = np.asarray(sol(
        *[bpts[:, i] for i in range(d)], to_numpy=True)).reshape(-1, 1)
    bdef = float(np.abs(bpred - u_star(bpts)).max())
    return rel_l2, epochs / dt, bdef


def main():
    quick = '--quick' in sys.argv
    dims = (4, 10) if quick else (4, 10, 31)
    epochs = 300 if quick else 3000
    reps = 1 if quick else 3
    # the vmapped basis-pair kernel keeps the exact arm's COMPILE flat in d
    # (measured: 17 s at d=4, 39 s at d=10 vs 96 s / >10 min for the
    # composed form), so the exact arm runs at every benchmark dim; the cap
    # only guards hypothetical d >> 31 extensions where O(d^2) runtime bites
    exact_dmax = 31

    for d in dims:
        arms = ('exact', 'stde') if d <= exact_dmax else ('stde',)
        eps = {a: [] for a in arms}
        errs = {a: [] for a in arms}
        bdefs = {a: [] for a in arms}
        for rep in range(reps):
            for arm in arms:
                err, e, bdef = run(d, arm, epochs)
                eps[arm].append(e)
                errs[arm].append(err)
                bdefs[arm].append(bdef)
                print(f"# d={d} rep {rep} {arm:>5}: rel L2 {err:.4f}, "
                      f"{e:,.1f} epochs/s, boundary defect {bdef:.2e}",
                      file=sys.stderr, flush=True)
        row = {'name': f'biharmonic_{d}d_stde_ab', 'dim': d, 'epochs': epochs,
               'reps': reps, 'n_est': 16, 'points': N_POINTS,
               'bc': 'clamped (DirichletBoxND power=2)'}
        for arm in arms:
            row[f'{arm}_rel_l2'] = round(float(np.median(errs[arm])), 4)
            row[f'{arm}_eps_median'] = round(float(np.median(eps[arm])), 1)
            row[f'{arm}_boundary_defect'] = float(
                f"{np.median(bdefs[arm]):.3g}")
        if 'exact' in arms:
            row['stde_speedup'] = round(row['stde_eps_median']
                                        / row['exact_eps_median'], 3)
        else:
            row['exact_arm'] = f'skipped (O(d^2) infeasible past d={exact_dmax})'
        print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
