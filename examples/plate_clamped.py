"""Clamped-plate (biharmonic) equation in d dimensions with EXACT clamped
boundary conditions — the 4th-order companion to `poisson_highdim.py`.

    Delta^2 u = (pi^4/d) sum_i sin(pi x_i)   on [0,1]^d
    u = g and  du/dn = dg/dn  on every face (clamped)
    analytic solution u* = (1/d) sum_i sin(pi x_i)

Three pieces make this tractable, none of which exist in the reference
(`/root/reference/neurodiffeq/operators.py` stops at second-order
operators; its condition classes stop at DirichletBVP2D):

- **`biharmonic`** (d <= ~10): all d(d+1)/2 fourth-order terms as ONE
  vmapped basis-pair directional-derivative kernel — XLA compile time is
  flat in d (the naive composed `laplacian(laplacian(u))` Python-unrolls
  d^2 fourth-order chains: 96 s compile at d=4, >10 min at d=10).
- **`stde_biharmonic`** (d >> 10): unbiased stochastic estimator over
  independent Rademacher probe *pairs*, O(n_est) cost independent of d.
- **`DirichletBoxND(power=2)`**: the squared mask vanishes to SECOND order
  on every face, so both u and its normal derivative match the extension g
  by construction at every epoch — no penalty weights anywhere.

The problem setup and runner are shared with `benchmarks/biharmonic_ab.py`
(the interleaved A/B whose committed artifact backs the numbers in
benchmarks/RESULTS.md).

Run: python examples/plate_clamped.py [d] [epochs] [exact|stde]
"""
import sys

sys.path.insert(0, '.')

from benchmarks.biharmonic_ab import run  # noqa: E402


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    arm = sys.argv[3] if len(sys.argv) > 3 else ('exact' if d <= 10 else 'stde')

    rel_l2, eps, bdef = run(d, arm, epochs)
    op = 'biharmonic' if arm == 'exact' else 'stde_biharmonic(n_est=16)'
    print(f"d={d} clamped plate via {op} + DirichletBoxND(power=2), "
          f"{epochs} epochs ({eps:,.1f} epochs/s)")
    print(f"rel L2 error vs analytic u* on 4096 interior points: {rel_l2:.4f}")
    print(f"max boundary defect on 1024 face points: {bdef:.2e} "
          f"(clamped by construction — floating-point roundoff only)")


if __name__ == '__main__':
    main()
