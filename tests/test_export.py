"""Serving-path tests: solutions export to portable StableHLO artifacts with a
symbolic batch dimension and reload without the framework."""
import numpy as np

from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.conditions import IVP, NoCondition, BundleIVP, DirichletBVPSpherical
from neurodiffeq_tpu.operators import spherical_laplacian
from neurodiffeq_tpu.solvers import (
    Solver1D, Solver2D, SolverSpherical, BundleSolver1D, load_exported_solution)
from neurodiffeq_tpu.utils import set_seed


def test_export_roundtrip_1d(tmp_path):
    set_seed(0)
    solver = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
    )
    solver.fit(max_epochs=200, tqdm_file=None)
    sol = solver.get_solution()

    path = str(tmp_path / 'solution.stablehlo')
    blob = sol.export(n_coords=1, path=path)
    assert len(blob) > 0

    serve = load_exported_solution(path)
    for n in (7, 50):  # symbolic batch dimension: any size works
        ts = np.linspace(0, 2, n)
        (us,) = serve(ts.reshape(-1, 1).astype(np.asarray(sol.params[0]['layers'][0]['W']).dtype))
        expected = np.asarray(sol(ts))
        assert np.allclose(np.asarray(us)[:, 0], expected, atol=1e-6)


def test_export_roundtrip_2d_system():
    set_seed(0)
    solver = Solver2D(
        pde_system=lambda u, v, x, y: [diff(u, x) + v, diff(v, y) - u],
        conditions=[NoCondition(), NoCondition()],
        xy_min=(0, 0), xy_max=(1, 1),
    )
    solver.fit(max_epochs=3, tqdm_file=None)
    sol = solver.get_solution()
    blob = sol.export(n_coords=2)

    serve = load_exported_solution(blob)
    pts = np.random.rand(11, 2).astype(np.asarray(sol.params[0]['layers'][0]['W']).dtype)
    us, vs = serve(pts)
    ref_u, ref_v = sol(pts[:, 0], pts[:, 1])
    assert np.allclose(np.asarray(us)[:, 0], np.asarray(ref_u), atol=1e-6)
    assert np.allclose(np.asarray(vs)[:, 0], np.asarray(ref_v), atol=1e-6)


def test_export_spherical_solution():
    set_seed(0)
    solver = SolverSpherical(
        pde_system=lambda u, r, th, ph: [spherical_laplacian(u, r, th, ph)],
        conditions=[DirichletBVPSpherical(
            0.5, lambda th, ph: 1.0 + 0 * th, 2.0, lambda th, ph: 0 * th)],
        r_min=0.5, r_max=2.0,
    )
    solver.fit(max_epochs=3, tqdm_file=None)
    sol = solver.get_solution()
    blob = sol.export(n_coords=3)

    serve = load_exported_solution(blob)
    dtype = np.asarray(sol.params[0]['layers'][0]['W']).dtype
    rng = np.random.RandomState(1)
    rs = rng.rand(13) * 1.5 + 0.5
    ths = rng.rand(13) * 2.0 + 0.5
    phs = rng.rand(13) * 3.0
    (us,) = serve(np.stack([rs, ths, phs], axis=1).astype(dtype))
    ref = np.asarray(sol(rs, ths, phs))
    assert np.allclose(np.asarray(us)[:, 0], ref, atol=1e-6)


def test_export_bundle_solution():
    set_seed(0)
    solver = BundleSolver1D(
        ode_system=lambda u, t, lam: [diff(u, t) + lam * u],
        conditions=[BundleIVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=1.0,
        theta_min=0.5, theta_max=1.5,
        eq_param_index=(0,),
    )
    solver.fit(max_epochs=3, tqdm_file=None)
    sol = solver.get_solution()
    blob = sol.export(n_coords=2)  # (t, lambda)

    serve = load_exported_solution(blob)
    dtype = np.asarray(sol.params[0]['layers'][0]['W']).dtype
    ts = np.linspace(0, 1, 9)
    lams = np.full(9, 1.1)
    (us,) = serve(np.stack([ts, lams], axis=1).astype(dtype))
    ref = np.asarray(sol(ts, lams))
    assert np.allclose(np.asarray(us)[:, 0], ref, atol=1e-6)


def test_export_siren_and_fourier_nets(tmp_path):
    """Export is net-agnostic: SIREN and FourierFCNN solutions round-trip
    through StableHLO (the Fourier B matrix and the w0 folding must be baked
    into the artifact)."""
    from neurodiffeq_tpu.networks import SIREN, FourierFCNN

    for net in (SIREN(hidden_units=(8, 8), w0=5.0),
                FourierFCNN(n_features=6, sigma=1.0, hidden_units=(8,))):
        set_seed(0)
        solver = Solver1D(
            ode_system=lambda u, t: [diff(u, t) + u],
            conditions=[IVP(t_0=0.0, u_0=1.0)],
            t_min=0.0, t_max=2.0, nets=[net],
        )
        solver.fit(max_epochs=5, tqdm_file=None)
        sol = solver.get_solution()
        serve = load_exported_solution(sol.export(n_coords=1))
        ts = np.linspace(0, 2, 13)
        dtype = np.asarray(jax_tree_first_leaf(sol.params)).dtype
        (us,) = serve(ts.reshape(-1, 1).astype(dtype))
        assert np.allclose(np.asarray(us)[:, 0], np.asarray(sol(ts)),
                           atol=1e-6), type(net).__name__


def jax_tree_first_leaf(tree):
    import jax
    return jax.tree.leaves(tree)[0]
