"""Deep Ritz vs strong form on 2-D Poisson — the variational-loss showcase.

    -laplacian(u) = 2 pi^2 sin(pi x) sin(pi y),  (x,y) in [0,1]^2
    u = 0 on the boundary,  analytic solution u = sin(pi x) sin(pi y)

Two formulations of the same problem through the same public API:

- **strong form**: residual ``u_xx + u_yy + f``, ``loss_fn='l2'`` —
  needs SECOND derivatives of the network (order-2 Taylor propagation).
- **Deep Ritz** (E & Yu 2018, arXiv:1710.00211): energy density
  ``1/2 (u_x^2 + u_y^2) - f u``, ``loss_fn='variational'`` — FIRST
  derivatives only (order-1 propagation), cheaper per collocation point.
  Classic Deep Ritz needs a boundary-penalty term; here ``DirichletBVP2D``
  enforces the boundary exactly by reparameterization
  (reference ``conditions.py:438-509``), so there is no penalty weight to
  tune and the energy's minimizer is the PDE solution outright.

No reference counterpart for the variational loss
(`/root/reference/neurodiffeq/losses.py` stops at residual norms).

The problem setup and runner are shared with `benchmarks/ritz_ab.py` (the
full 4-arm study whose committed artifact backs the numbers below); this
example runs the two headline arms interleaved (R,S,R,S,...) with medians,
per the repo's benchmark hygiene (single-run TPU-tunnel timings swing
+-50%).

Measured (TPU v5e, 5000 epochs, 1024 pts, seed 0 —
`benchmarks/artifacts/ritz_ab_r04.jsonl` / RESULTS.md): Ritz ~1.4-1.7x
more epochs/s (first derivatives only; artifact medians: 1.69x), max err
0.0066 with the 'halton' QMC sampler used below vs 0.001 for the strong
form. With iid sampling Ritz plateaus at 0.027 — the energy's Monte-Carlo
integration noise is the floor, which is why this example pairs
'variational' with 'halton'.

Run: python examples/poisson_ritz.py [epochs] [reps]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.ritz_ab import energy_density, strong_form, run


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    arms = {
        'ritz': (energy_density, 'variational', 'halton'),
        'strong': (strong_form, 'l2', 'equally-spaced-noisy'),
    }
    eps = {k: [] for k in arms}
    errs = {k: [] for k in arms}
    for rep in range(reps):
        for name, (formulation, loss_fn, method) in arms.items():
            err, e = run(formulation, loss_fn, method, epochs)
            eps[name].append(e)
            errs[name].append(err)
            print(f'rep {rep} {name:>6}: max err {err:.5f}, '
                  f'{e:,.0f} epochs/s', flush=True)

    r, s = float(np.median(eps['ritz'])), float(np.median(eps['strong']))
    print(f"\nmedians over {reps} interleaved reps ({epochs} epochs, 1024 pts):")
    print(f"  Deep Ritz + halton (order-1): {r:,.0f} epochs/s, "
          f"max err {float(np.median(errs['ritz'])):.5f}")
    print(f"  strong form (order-2):        {s:,.0f} epochs/s, "
          f"max err {float(np.median(errs['strong'])):.5f}")
    print(f"  Ritz speedup: {r / s:.2f}x")


if __name__ == '__main__':
    main()
