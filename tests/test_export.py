"""Serving-path tests: solutions export to portable StableHLO artifacts with a
symbolic batch dimension and reload without the framework."""
import numpy as np

from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.conditions import IVP, NoCondition
from neurodiffeq_tpu.solvers import Solver1D, Solver2D, load_exported_solution
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
