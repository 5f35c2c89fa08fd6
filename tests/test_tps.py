"""Unit tests for the array-first thin-plate-spline engine behind
CustomBoundaryCondition (fast: no training, host-side numpy + tiny Field
evaluations). Pins the invariants MacFall's method relies on — interpolation
exactness at control points, the polynomial-orthogonality constraints, and
the clockwise control-point ordering that the circular length-factor targets
assume (reference semantics: /root/reference/neurodiffeq/pde.py:598-646)."""
import numpy as np
import pytest

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.pde import (
    Point,
    DirichletControlPoint,
    NeumannControlPoint,
    CustomBoundaryCondition,
    InterpolatorCreator,
    _ThinPlateSpline,
)


def _random_points(n, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.0, 1.0, size=(n, 2))


def test_spline_exact_at_centers_multi_column():
    centers = _random_points(17, seed=0)
    targets = np.stack([np.sin(centers[:, 0]), centers.prod(axis=1)], axis=1)
    spline = _ThinPlateSpline(centers, targets)
    got = spline.eval_np([centers[:, 0], centers[:, 1]])
    assert got.shape == (17, 2)
    np.testing.assert_allclose(got, targets, atol=1e-9)


def test_spline_multi_column_matches_per_column_fits():
    centers = _random_points(12, seed=1)
    targets = np.stack([centers[:, 0] ** 2, np.cos(centers[:, 1])], axis=1)
    joint = _ThinPlateSpline(centers, targets)
    probe = _random_points(40, seed=2)
    got = joint.eval_np([probe[:, 0], probe[:, 1]])
    for j in range(2):
        single = _ThinPlateSpline(centers, targets[:, j])
        np.testing.assert_allclose(
            got[..., j], single.eval_np([probe[:, 0], probe[:, 1]])[..., 0], atol=1e-9)


def test_spline_orthogonality_constraints():
    centers = _random_points(15, seed=3)
    spline = _ThinPlateSpline(centers, np.sin(centers.sum(axis=1)))
    w = spline.kernel_weights[:, 0]
    assert abs(w.sum()) < 1e-9
    np.testing.assert_allclose(w @ centers, 0.0, atol=1e-9)


def test_field_path_matches_numpy_path():
    cps = [DirichletControlPoint(loc=p, val=np.hypot(*p)) for p in _random_points(10, seed=4)]
    surf = InterpolatorCreator.fit_surface(cps)
    lf = InterpolatorCreator.fit_length_factor(cps)
    probe = _random_points(25, seed=5)
    xf, yf = F.coordinates(probe[:, 0], probe[:, 1])
    for interp in (surf, lf):
        via_field = np.asarray(interp.interpolate((xf, yf)).value).ravel()
        via_np = np.asarray(interp.interpolate_np((probe[:, 0], probe[:, 1]))).ravel()
        np.testing.assert_allclose(via_field, via_np, rtol=1e-5, atol=1e-6)


def test_normal_vector_interpolation_exact_at_control_points():
    thetas = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    ncps = [NeumannControlPoint(loc=(np.cos(t), np.sin(t)), val=0.0,
                                normal_vector=(np.cos(t), np.sin(t)))
            for t in thetas]
    interp = InterpolatorCreator.fit_normal_vector(ncps)
    nx, ny = interp.interpolate_np((np.cos(thetas), np.sin(thetas)))
    np.testing.assert_allclose(nx, np.cos(thetas), atol=1e-8)
    np.testing.assert_allclose(ny, np.sin(thetas), atol=1e-8)


def test_clockwise_ordering_reference_semantics():
    # Clockwise from the +x axis: +x first, then the (dx>0, dy<0) quadrant,
    # -y axis, (dx<0, dy<0), -x axis, (dx<0, dy>0), +y axis, (dx>0, dy>0).
    seq = [(1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1)]
    pts = [DirichletControlPoint(loc=p, val=0.0) for p in reversed(seq)]
    cleaned = CustomBoundaryCondition._clean_control_points(pts, Point((0, 0)))
    assert [p.loc for p in cleaned] == [(float(x), float(y)) for x, y in seq]


def test_clockwise_ordering_snaps_near_axis_points():
    # A point a hair above the +x axis must sort FIRST (tier 0), not wrap to
    # the end of the cycle.
    pts = [DirichletControlPoint(loc=(0.5, -0.5), val=0.0),
           DirichletControlPoint(loc=(1.0, 1e-9), val=0.0)]
    cleaned = CustomBoundaryCondition._clean_control_points(pts, Point((0, 0)))
    assert cleaned[0].loc == (1.0, 1e-9)


def test_adjacent_duplicate_control_points_dropped():
    thetas = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    pts = [DirichletControlPoint(loc=(np.cos(t), np.sin(t)), val=0.0) for t in thetas]
    dup = DirichletControlPoint(loc=(pts[3].loc[0] + 1e-9, pts[3].loc[1]), val=0.0)
    cleaned = CustomBoundaryCondition._clean_control_points(pts + [dup], Point((0, 0)))
    assert len(cleaned) == 8


def test_enforced_solution_exact_at_dirichlet_points_untrained():
    # Exact-constraint invariant with an UNTRAINED net: the TPS construction
    # itself guarantees u = A_D and L_D = 0 on the boundary.
    from neurodiffeq_tpu.networks import FCNN
    thetas = np.linspace(0, 2 * np.pi, 24, endpoint=False)
    cps = [DirichletControlPoint(loc=(np.cos(t), np.sin(t)), val=np.sin(3 * t))
           for t in thetas]
    cbc = CustomBoundaryCondition(Point((0, 0)), cps)
    import jax
    net = FCNN(n_input_units=2, hidden_units=(8,))
    params = net.init(jax.random.PRNGKey(0))
    xs = np.array([p.loc[0] for p in cps])
    ys = np.array([p.loc[1] for p in cps])
    xf, yf = F.coordinates(xs, ys)
    u = np.asarray(cbc.enforce(net, params, xf, yf).value).ravel()
    np.testing.assert_allclose(u, [p.val for p in cps], atol=1e-5)
