"""100-dimensional Poisson — the high-dimensional PDE showcase.

    -laplacian(u) = (pi^2/d) sum_i sin(pi x_i)   on [0,1]^d
    u = g on the boundary,  analytic solution u* = (1/d) sum_i sin(pi x_i)

Three pieces make d=100 tractable, none of which exist in the reference:

- **`operators.stde_laplacian`** (Shi et al. 2024, arXiv:2412.00088):
  an unbiased Hutchinson-trace estimate of the Laplacian from ``n_est``
  random second directional derivatives — cost O(n_est) instead of one
  second-derivative chain per coordinate (the reference's operators,
  `/root/reference/neurodiffeq/operators.py:77-89`, are exact and O(d)).
- **`GeneratorHypercube`**: n iid points in a d-dimensional box (the
  reference's GeneratorND is a per-axis meshgrid — its point count is the
  product of axis grids, hopeless at d=100).
- **`DirichletBoxND`**: the boundary condition imposed EXACTLY by
  construction — u = g + phi(x) * ANN(x) with phi a saturated-product mask
  vanishing on every face — the d-dimensional generalization of the
  framework's (and the reference's, `conditions.py:438-509`) exact
  reparameterizations. No penalty weight to tune, and the trained solution
  matches the boundary data to floating-point roundoff at every epoch
  (`benchmarks/stde_ab.py` carries the penalty-vs-exact A/B artifact:
  equal epochs, the penalty arm's error swings with its weight while the
  exact arm has no knob and zero boundary defect).

The problem setup and runner are shared with `benchmarks/stde_ab.py` (the
interleaved A/B whose committed artifact backs the numbers in
benchmarks/RESULTS.md); this example trains the STDE + exact-condition arm
once at d=100 and prints the error against the analytic solution and the
boundary defect (which is roundoff, not a converged penalty residual).

Run: python examples/poisson_highdim.py [d] [epochs]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.stde_ab import run


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    rel_l2, eps, bdef = run(d, 'stde', epochs, bc='exact')
    print(f"d={d} Poisson via stde_laplacian(n_est=16) + DirichletBoxND, "
          f"{epochs} epochs ({eps:,.1f} epochs/s)")
    print(f"rel L2 error vs analytic u* on 4096 interior points: {rel_l2:.4f}")
    print(f"max boundary defect on 1024 face points: {bdef:.2e} "
          f"(exact by construction — floating-point roundoff only)")


if __name__ == '__main__':
    main()
