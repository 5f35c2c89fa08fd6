"""Exact-constraint tests: every condition must satisfy its BCs/ICs EXACTLY
with an untrained random network (the reference's most important invariant,
tests/test_conditions.py)."""
import numpy as np
import pytest
import jax

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.networks import FCNN
from neurodiffeq_tpu import conditions as C

N = 64
ATOL = 1e-8

x0, x1 = np.random.rand() + 0.5, np.random.rand() + 2.5
y0, y1 = np.random.rand() + 0.5, np.random.rand() + 2.5
ones = np.ones(N)


def _net(n_in, n_out=1, seed=0):
    net = FCNN(n_input_units=n_in, n_output_units=n_out, hidden_units=(8, 8))
    return net, net.init(jax.random.PRNGKey(seed))


def test_no_condition():
    net, params = _net(2)
    x, y = F.coordinates(np.random.rand(N), np.random.rand(N))
    u = C.NoCondition().enforce(net, params, x, y)
    raw = F.network_field(lambda xs: net.apply(params, xs), (x, y))
    assert np.allclose(u.value, raw.value)


def test_ivp_dirichlet():
    net, params = _net(1)
    t0, u0 = 0.3, 1.7
    cond = C.IVP(t_0=t0, u_0=u0)
    t, = F.coordinates(t0 * ones)
    u = cond.enforce(net, params, t)
    assert np.allclose(u.value, u0, atol=ATOL)


def test_ivp_neumann():
    net, params = _net(1)
    t0, u0, u0p = 0.3, 1.7, -0.4
    cond = C.IVP(t_0=t0, u_0=u0, u_0_prime=u0p)
    t, = F.coordinates(t0 * ones)
    u = cond.enforce(net, params, t)
    assert np.allclose(u.value, u0, atol=ATOL)
    assert np.allclose(diff(u, t).value, u0p, atol=ATOL)


def test_dirichlet_bvp():
    net, params = _net(1)
    u0, u1 = 1.1, -0.7
    cond = C.DirichletBVP(t_0=x0, u_0=u0, t_1=x1, u_1=u1)
    t, = F.coordinates(x0 * ones)
    assert np.allclose(cond.enforce(net, params, t).value, u0, atol=ATOL)
    t, = F.coordinates(x1 * ones)
    assert np.allclose(cond.enforce(net, params, t).value, u1, atol=ATOL)


def test_dirichlet_bvp_2d():
    net, params = _net(2)
    f0 = lambda y: F.sin(y)
    f1 = lambda y: y ** 2
    g0 = lambda x: F.cos(x)
    g1 = lambda x: x * 0.5
    # boundary functions must agree at corners for exactness: use compatible fns
    # here we use the standard construction which interpolates despite corners
    cond = C.DirichletBVP2D(
        x_min=0.0, x_min_val=f0, x_max=1.0, x_max_val=f1,
        y_min=0.0, y_min_val=g0, y_max=1.0, y_max_val=g1,
    )
    ys = np.random.rand(N)
    x, y = F.coordinates(0.0 * ones, ys)
    u = cond.enforce(net, params, x, y)
    expected = (np.sin(ys) + (1 - ys) * (np.cos(0) - np.sin(0)) + ys * (0.0 - np.sin(1)))
    # at x=x0: u = f0(y) + (1-ỹ)(g0(x0) - f0(y0_interp)) ... the construction
    # guarantees exactness only when corners are compatible; instead verify
    # invariance: value must not depend on the network
    net2, params2 = _net(2, seed=99)
    u2 = cond.enforce(net2, params2, x, y)
    assert np.allclose(u.value, u2.value, atol=ATOL)
    # and on all 4 edges the value is independent of the net
    for (xs_, ys_) in [(ones * 1.0, ys), (np.random.rand(N), 0.0 * ones), (np.random.rand(N), ones * 1.0)]:
        x, y = F.coordinates(xs_, ys_)
        a = cond.enforce(net, params, x, y)
        b = cond.enforce(net2, params2, x, y)
        assert np.allclose(a.value, b.value, atol=ATOL)


def test_dirichlet_bvp_2d_exact_with_compatible_corners():
    net, params = _net(2)
    # classic Laplace problem boundary: u(x,0)=sin(pi x), zero elsewhere
    cond = C.DirichletBVP2D(
        x_min=0.0, x_min_val=lambda y: 0 * y,
        x_max=1.0, x_max_val=lambda y: 0 * y,
        y_min=0.0, y_min_val=lambda x: F.sin(np.pi * x),
        y_max=1.0, y_max_val=lambda x: 0 * x,
    )
    xs = np.random.rand(N)
    x, y = F.coordinates(xs, 0.0 * ones)
    assert np.allclose(cond.enforce(net, params, x, y).value[:, 0], np.sin(np.pi * xs), atol=ATOL)
    x, y = F.coordinates(xs, ones)
    assert np.allclose(cond.enforce(net, params, x, y).value, 0.0, atol=ATOL)
    x, y = F.coordinates(0.0 * ones, np.random.rand(N))
    assert np.allclose(cond.enforce(net, params, x, y).value, 0.0, atol=ATOL)
    x, y = F.coordinates(ones, np.random.rand(N))
    assert np.allclose(cond.enforce(net, params, x, y).value, 0.0, atol=ATOL)


@pytest.mark.parametrize("d", [2, 5, 10])
@pytest.mark.parametrize("mask", ['adf', 'product', 'sat'])
def test_dirichlet_box_nd_exact_on_faces(d, mask):
    """u == g on every face of the d-dim box with an untrained net, for both
    mask forms — including edge/corner points (several coords snapped)."""
    net, params = _net(d, seed=d)
    g = lambda *xs: sum(F.sin(np.pi * x) for x in xs) / len(xs) + 0.7  # noqa: E731
    cond = C.DirichletBoxND(d, boundary_fn=g, mask=mask)
    rng = np.random.default_rng(d)
    pts = rng.random((N, d))
    # snap 1 coordinate on the first half, 2 (an edge) on the second half
    rows = np.arange(N)
    pts[rows, rng.integers(0, d, N)] = rng.integers(0, 2, N).astype(float)
    half = rows[N // 2:]
    pts[half, rng.integers(0, d, N // 2)] = rng.integers(0, 2, N // 2).astype(float)
    coords = F.coordinates(*[pts[:, i] for i in range(d)])
    u = cond.enforce(net, params, *coords)
    gv = np.sin(np.pi * pts).sum(axis=1, keepdims=True) / d + 0.7
    assert np.allclose(np.asarray(u.value), gv, atol=ATOL)
    # ... while the interior is NOT pinned to g (the net can act)
    ipts = rng.random((N, d)) * 0.9 + 0.05
    icoords = F.coordinates(*[ipts[:, i] for i in range(d)])
    ui = np.asarray(cond.enforce(net, params, *icoords).value)
    gi = np.sin(np.pi * ipts).sum(axis=1, keepdims=True) / d + 0.7
    assert np.abs(ui - gi).max() > 1e-4


def test_dirichlet_box_nd_anisotropic_homogeneous_and_derivatives():
    """Per-axis bounds; boundary_fn=None means u == 0 on the boundary; the
    ADF mask's Laplacian stays finite at near-corner interior points."""
    from neurodiffeq_tpu.operators import laplacian
    d = 4
    net, params = _net(d)
    lo, hi = (0.0, -1.0, 2.0, 0.5), (1.0, 1.0, 5.0, 0.6)
    cond = C.DirichletBoxND(d, None, r_min=lo, r_max=hi)
    rng = np.random.default_rng(1)
    pts = lo + rng.random((N, d)) * (np.asarray(hi) - np.asarray(lo))
    axes = rng.integers(0, d, N)
    sides = rng.integers(0, 2, N)
    pts[np.arange(N), axes] = np.where(
        sides == 0, np.asarray(lo)[axes], np.asarray(hi)[axes])
    coords = F.coordinates(*[pts[:, i] for i in range(d)])
    assert np.allclose(np.asarray(cond.enforce(net, params, *coords).value),
                       0.0, atol=ATOL)
    # derivatives: laplacian finite even with one coordinate 1e-6 from a face
    ipts = lo + rng.random((32, d)) * (np.asarray(hi) - np.asarray(lo))
    ipts[:, 0] = lo[0] + 1e-6
    ic = F.coordinates(*[ipts[:, i] for i in range(d)])
    lap = np.asarray(laplacian(cond.enforce(net, params, *ic), *ic).value)
    assert np.all(np.isfinite(lap))


def test_dirichlet_box_nd_sat_mask_scale_and_exactness_at_high_d():
    """The saturated-product mask keeps a dimension-free interior magnitude
    (median ~0.68 at any d with k=dim) while still vanishing exactly on
    faces — the property that makes exact constraints usable at d >> 10."""
    d = 40
    cond = C.DirichletBoxND(d)  # auto -> 'sat', k=dim
    assert cond.mask == 'sat' and cond.k == d
    rng = np.random.default_rng(2)
    pts = rng.random((256, d))
    coords = F.coordinates(*[pts[:, i] for i in range(d)])
    m = np.asarray(cond.mask_field(*coords).value).ravel()
    assert 0.4 < np.median(m) < 0.9, f"interior mask median {np.median(m):.3f}"
    pts[np.arange(64), rng.integers(0, d, 64)] = rng.integers(0, 2, 64).astype(float)
    coords = F.coordinates(*[pts[:64, i] for i in range(d)])
    m = np.asarray(cond.mask_field(*coords).value).ravel()
    assert np.all(m == 0.0), "sat mask must vanish exactly on faces"


def test_dirichlet_box_nd_clamped_power2_pins_value_and_normal_derivative():
    """power=2 (the clamped condition for 4th-order problems, e.g.
    `stde_biharmonic`): with an untrained net, BOTH u == g and
    du/dn == dg/dn hold on every face — while the default power=1 pins the
    value only (its first-order-vanishing mask leaves du/dn trainable)."""
    d = 3
    net, params = _net(d)
    g = lambda *xs: sum(F.sin(np.pi * x) for x in xs) / d + 0.3  # noqa: E731
    rng = np.random.default_rng(5)
    pts = rng.random((N, d))
    pts[:, 0] = 0.0  # every point on the x1 = 0 face
    g_n = np.pi / d * np.ones(N)  # dg/dx1 at x1=0
    for power, pinned in ((2, True), (1, False)):
        cond = C.DirichletBoxND(d, boundary_fn=g, power=power)
        coords = F.coordinates(*[pts[:, i] for i in range(d)])
        u = cond.enforce(net, params, *coords)
        gv = np.sin(np.pi * pts).sum(axis=1, keepdims=True) / d + 0.3
        assert np.allclose(np.asarray(u.value), gv, atol=ATOL), \
            f"power={power} broke the value pin"
        dn = np.asarray(diff(u, coords[0]).value).ravel()
        if pinned:
            assert np.allclose(dn, g_n, atol=1e-6), \
                "clamped mask must pin the normal derivative"
        else:
            assert np.abs(dn - g_n).max() > 1e-4, \
                "power=1 must leave the normal derivative free"
    # the clamped reparameterization stays 4th-order differentiable: the
    # biharmonic of u is finite at near-face interior points
    from neurodiffeq_tpu.operators import stde_biharmonic
    cond = C.DirichletBoxND(d, boundary_fn=g, power=2)
    ipts = rng.random((32, d))
    ipts[:, 1] = 1e-5
    ic = F.coordinates(*[ipts[:, i] for i in range(d)])
    bh = np.asarray(stde_biharmonic(
        cond.enforce(net, params, *ic), *ic, n_est=2).value)
    assert np.all(np.isfinite(bh))


def test_dirichlet_box_nd_validation():
    with pytest.raises(ValueError):
        C.DirichletBoxND(0)
    with pytest.raises(ValueError, match="power"):
        C.DirichletBoxND(3, power=0)
    with pytest.raises(ValueError, match="power"):
        C.DirichletBoxND(3, power=1.5)
    with pytest.raises(ValueError):
        C.DirichletBoxND(3, mask='gaussian')
    with pytest.raises(ValueError, match="underflows"):
        C.DirichletBoxND(40, mask='product')
    with pytest.raises(ValueError, match="saturation"):
        C.DirichletBoxND(3, mask='product', k=4)
    with pytest.raises(ValueError, match="saturation"):
        C.DirichletBoxND(3, mask='sat', k=0)
    assert C.DirichletBoxND(5).mask == 'product'   # auto, low d
    assert C.DirichletBoxND(11).mask == 'sat'      # auto, high d
    assert C.DirichletBoxND(11, mask='sat', k=30).k == 30
    with pytest.raises(ValueError):
        C.DirichletBoxND(3, r_min=(0.0, 0.0), r_max=1.0)
    with pytest.raises(ValueError):
        C.DirichletBoxND(2, r_min=1.0, r_max=0.0)
    with pytest.raises(TypeError):
        C.DirichletBoxND(2, boundary_fn=3.14)
    net, params = _net(3)
    cond = C.DirichletBoxND(3)
    x, y = F.coordinates(np.random.rand(N), np.random.rand(N))
    with pytest.raises(ValueError, match="coordinates"):
        cond.enforce(net, params, x, y)


@pytest.mark.parametrize("bc", ['dd', 'dn', 'nd', 'nn'])
def test_ibvp_1d(bc):
    net, params = _net(2)
    t_min = 0.1
    u0fn = lambda x: x ** 2  # noqa: E731
    g = lambda t: F.cos(t)  # Dirichlet left  # noqa: E731
    h = lambda t: F.sin(t) + 1  # Dirichlet right  # noqa: E731
    p = lambda t: t * 0.3  # Neumann left  # noqa: E731
    q = lambda t: -t * 0.2  # Neumann right  # noqa: E731

    # initial conditions must be compatible at the boundary anchors:
    # reference uses A(x,t) construction where IC term u_0(x) appears raw, so
    # compatibility means g(t0)=u0(x0) etc. The construction subtracts g(t0),
    # so exactness of the IC holds everywhere and BCs hold up to IC consistency.
    kwargs = dict(x_min=x0, x_max=x1, t_min=t_min, t_min_val=u0fn)
    if bc == 'dd':
        kwargs.update(x_min_val=g, x_max_val=h)
    elif bc == 'dn':
        kwargs.update(x_min_val=g, x_max_prime=q)
    elif bc == 'nd':
        kwargs.update(x_min_prime=p, x_max_val=h)
    else:
        kwargs.update(x_min_prime=p, x_max_prime=q)
    cond = C.IBVP1D(**kwargs)

    # initial condition: u(x, t0) = u0(x) + (bc-term at t0 vanishes)
    xs = np.random.rand(N) * (x1 - x0) + x0
    x, t = F.coordinates(xs, t_min * ones)
    u = cond.enforce(net, params, x, t)
    if bc == 'dd':
        expected = u0fn(xs)
    elif bc == 'dn':
        expected = u0fn(xs)
    elif bc == 'nd':
        expected = u0fn(xs)
    else:
        expected = u0fn(xs)
    assert np.allclose(u.value[:, 0], expected, atol=1e-7)

    ts = np.random.rand(N) + t_min
    t0c = t_min * ones

    def val(fn, arr):
        out = fn(F.coordinates(arr)[0])
        return np.asarray(out.value)[:, 0] if isinstance(out, F.Field) else np.asarray(arr) * 0 + out

    if bc in ('dd', 'dn'):
        # Dirichlet left: u(x0, t) = u0(x0) + g(t) - g(t0)
        x, t = F.coordinates(x0 * ones, ts)
        u = cond.enforce(net, params, x, t)
        expected = u0fn(x0) + val(g, ts) - val(g, t0c)
        assert np.allclose(u.value[:, 0], expected, atol=1e-7)
    if bc in ('dd', 'nd'):
        # Dirichlet right: u(x1, t) = u0(x1) + h(t) - h(t0)
        x, t = F.coordinates(x1 * ones, ts)
        u = cond.enforce(net, params, x, t)
        expected = u0fn(x1) + val(h, ts) - val(h, t0c)
        assert np.allclose(u.value[:, 0], expected, atol=1e-7)
    if bc in ('nd', 'nn'):
        # Neumann left: u_x(x0, t) = u0'(x0) + p(t) - p(t0)
        x, t = F.coordinates(x0 * ones, ts)
        u = cond.enforce(net, params, x, t)
        expected = 2 * x0 + val(p, ts) - val(p, t0c)
        assert np.allclose(diff(u, x).value[:, 0], expected, atol=1e-6)
    if bc in ('dn', 'nn'):
        # Neumann right: u_x(x1, t) = u0'(x1) + q(t) - q(t0)
        x, t = F.coordinates(x1 * ones, ts)
        u = cond.enforce(net, params, x, t)
        expected = 2 * x1 + val(q, ts) - val(q, t0c)
        assert np.allclose(diff(u, x).value[:, 0], expected, atol=1e-6)


@pytest.mark.parametrize("bc", ['dd', 'dn', 'nd', 'nn'])
def test_double_ended_bvp_1d(bc):
    net, params = _net(1)
    u0, u1 = 0.7, -0.3
    u0p, u1p = 0.4, -0.9
    kwargs = dict(x_min=x0, x_max=x1)
    if bc == 'dd':
        kwargs.update(x_min_val=u0, x_max_val=u1)
    elif bc == 'dn':
        kwargs.update(x_min_val=u0, x_max_prime=u1p)
    elif bc == 'nd':
        kwargs.update(x_min_prime=u0p, x_max_val=u1)
    else:
        kwargs.update(x_min_prime=u0p, x_max_prime=u1p)
    cond = C.DoubleEndedBVP1D(**kwargs)

    if bc in ('dd', 'dn'):
        x, = F.coordinates(x0 * ones)
        assert np.allclose(cond.enforce(net, params, x).value, u0, atol=ATOL)
    if bc in ('dd', 'nd'):
        x, = F.coordinates(x1 * ones)
        assert np.allclose(cond.enforce(net, params, x).value, u1, atol=ATOL)
    if bc in ('nd', 'nn'):
        x, = F.coordinates(x0 * ones)
        u = cond.enforce(net, params, x)
        assert np.allclose(diff(u, x).value, u0p, atol=1e-6)
    if bc in ('dn', 'nn'):
        x, = F.coordinates(x1 * ones)
        u = cond.enforce(net, params, x)
        assert np.allclose(diff(u, x).value, u1p, atol=1e-6)


def test_dirichlet_bvp_spherical():
    net, params = _net(3)
    r0, r1 = 0.5, 2.0
    f = lambda th, ph: F.sin(th) * F.cos(ph)  # noqa: E731
    g = lambda th, ph: F.cos(th) + ph * 0.1  # noqa: E731
    cond = C.DirichletBVPSpherical(r_0=r0, f=f, r_1=r1, g=g)

    th = np.random.rand(N) * np.pi
    ph = np.random.rand(N) * 2 * np.pi
    r, theta, phi = F.coordinates(r0 * ones, th, ph)
    u = cond.enforce(net, params, r, theta, phi)
    assert np.allclose(u.value[:, 0], np.sin(th) * np.cos(ph), atol=ATOL)
    r, theta, phi = F.coordinates(r1 * ones, th, ph)
    u = cond.enforce(net, params, r, theta, phi)
    assert np.allclose(u.value[:, 0], np.cos(th) + ph * 0.1, atol=ATOL)

    # single-boundary variant
    cond = C.DirichletBVPSpherical(r_0=r0, f=f)
    r, theta, phi = F.coordinates(r0 * ones, th, ph)
    u = cond.enforce(net, params, r, theta, phi)
    assert np.allclose(u.value[:, 0], np.sin(th) * np.cos(ph), atol=ATOL)


def test_inf_dirichlet_bvp_spherical():
    net, params = _net(3)
    r0 = 0.5
    f = lambda th, ph: F.sin(th)  # noqa: E731
    g = lambda th, ph: F.cos(th)  # noqa: E731
    cond = C.InfDirichletBVPSpherical(r_0=r0, f=f, g=g, order=1)
    th = np.random.rand(N) * np.pi
    ph = np.random.rand(N) * 2 * np.pi
    r, theta, phi = F.coordinates(r0 * ones, th, ph)
    u = cond.enforce(net, params, r, theta, phi)
    assert np.allclose(u.value[:, 0], np.sin(th), atol=ATOL)
    # large-r limit -> g
    r, theta, phi = F.coordinates(1e4 * ones, th, ph)
    u = cond.enforce(net, params, r, theta, phi)
    assert np.allclose(u.value[:, 0], np.cos(th), atol=1e-5)


def test_dirichlet_bvp_spherical_basis():
    K = 9
    net, params = _net(1, n_out=K)
    r0, r1 = 0.5, 2.0
    R0 = np.random.rand(K)
    R1 = np.random.rand(K)
    cond = C.DirichletBVPSphericalBasis(r_0=r0, R_0=R0, r_1=r1, R_1=R1)
    r, = F.coordinates(r0 * ones)
    u = cond.enforce(net, params, r)
    assert u.shape == (N, K)
    assert np.allclose(u.value, R0[None, :], atol=ATOL)
    r, = F.coordinates(r1 * ones)
    assert np.allclose(cond.enforce(net, params, r).value, R1[None, :], atol=ATOL)


def test_inf_dirichlet_bvp_spherical_basis():
    K = 4
    net, params = _net(1, n_out=K)
    r0 = 0.5
    R0, Rinf = np.random.rand(K), np.random.rand(K)
    cond = C.InfDirichletBVPSphericalBasis(r_0=r0, R_0=R0, R_inf=Rinf)
    r, = F.coordinates(r0 * ones)
    assert np.allclose(cond.enforce(net, params, r).value, R0[None, :], atol=ATOL)
    r, = F.coordinates(1e4 * ones)
    assert np.allclose(cond.enforce(net, params, r).value, Rinf[None, :], atol=1e-5)


def test_bundle_ivp_fixed_and_sampled():
    # fixed params: behaves like IVP
    net, params = _net(2)
    cond = C.BundleIVP(t_0=0.2, u_0=1.5)
    t, th1 = F.coordinates(0.2 * ones, np.random.rand(N))
    u = cond.enforce(net, params, t, th1)
    assert np.allclose(u.value, 1.5, atol=ATOL)

    # u_0 sampled from theta column
    cond = C.BundleIVP(t_0=0.2, bundle_param_lookup={'u_0': 0})
    u0s = np.random.rand(N)
    t, th1 = F.coordinates(0.2 * ones, u0s)
    u = cond.enforce(net, params, t, th1)
    assert np.allclose(u.value[:, 0], u0s, atol=ATOL)

    # t_0 sampled (polynomial branch)
    cond = C.BundleIVP(u_0=2.0, bundle_param_lookup={'t_0': 0})
    t0s = np.random.rand(N)
    t, th1 = F.coordinates(t0s, t0s)
    u = cond.enforce(net, params, t, th1)
    assert np.allclose(u.value, 2.0, atol=ATOL)


def test_bundle_ivp_neumann_sampled():
    net, params = _net(3)
    cond = C.BundleIVP(t_0=0.1, u_0=None, bundle_param_lookup={'u_0': 0, 'u_0_prime': 1})
    u0s = np.random.rand(N)
    u0ps = np.random.rand(N)
    t, a, b = F.coordinates(0.1 * ones, u0s, u0ps)
    u = cond.enforce(net, params, t, a, b)
    assert np.allclose(u.value[:, 0], u0s, atol=ATOL)
    assert np.allclose(diff(u, t).value[:, 0], u0ps, atol=1e-6)


def test_bundle_dirichlet_bvp():
    net, params = _net(2)
    cond = C.BundleDirichletBVP(t_0=0., u_0=1., t_1=1., u_1=-1., bundle_param_lookup={'u_0': 0})
    u0s = np.random.rand(N)
    t, th = F.coordinates(0.0 * ones, u0s)
    assert np.allclose(cond.enforce(net, params, t, th).value[:, 0], u0s, atol=ATOL)
    t, th = F.coordinates(ones, u0s)
    assert np.allclose(cond.enforce(net, params, t, th).value, -1., atol=ATOL)


def test_bundle_param_validation():
    with pytest.raises(ValueError):
        C.BundleIVP(t_0=0, u_0=1, bundle_param_lookup={'bogus': 0})


def test_ensemble_condition():
    net, params = _net(1, n_out=2)
    c1 = C.IVP(t_0=0.0, u_0=1.0)
    c2 = C.IVP(t_0=0.0, u_0=-2.0)
    cond = C.EnsembleCondition(c1, c2)
    t, = F.coordinates(0.0 * ones)
    u = cond.enforce(net, params, t)
    assert u.shape == (N, 2)
    assert np.allclose(u.value[:, 0], 1.0, atol=ATOL)
    assert np.allclose(u.value[:, 1], -2.0, atol=ATOL)


def test_ensemble_condition_rejects_enforce_overrides():
    c1 = C.IVP(t_0=0.0, u_0=1.0)
    c2 = C.IBVP1D(x_min=0, x_max=1, t_min=0, t_min_val=lambda x: 0 * x,
                  x_min_val=lambda t: 0 * t, x_max_prime=lambda t: 0 * t)
    with pytest.raises(ValueError):
        C.EnsembleCondition(c1, c2)
    with pytest.warns(UserWarning):
        C.EnsembleCondition(c1, c2, force=True)


def test_irregular_boundary_in_domain_default():
    cond = C.IrregularBoundaryCondition()
    xs = np.random.rand(N, 1)
    assert cond.in_domain(xs, xs).all()


def test_deprecated_set_impose_on():
    net, params = _net(1, n_out=3)
    cond = C.IVP(t_0=0.0, u_0=1.0)
    with pytest.warns(DeprecationWarning):
        cond.set_impose_on(1)
    t, = F.coordinates(0.0 * ones)
    u = cond.enforce(net, params, t)
    assert u.shape == (N, 1)
    assert np.allclose(u.value, 1.0, atol=ATOL)


def test_ivp_legacy_signature():
    """Deprecated x_0/x_0_prime kwargs alias to u_0/u_0_prime with a
    FutureWarning; passing both old and new names is an error
    (reference tests/test_conditions.py:240-250)."""
    with pytest.warns(FutureWarning):
        c = C.IVP(0, x_0=1)
    assert c.u_0 == 1
    with pytest.warns(FutureWarning):
        c = C.IVP(0, 1, x_0_prime=2)
    assert c.u_0_prime == 2
    with pytest.warns(FutureWarning):
        c = C.IVP(0, x_0=1, x_0_prime=2)
    assert c.u_0 == 1 and c.u_0_prime == 2
    with pytest.raises(KeyError):
        C.IVP(0, x_0=1, u_0=2)
    with pytest.raises(KeyError):
        C.IVP(0, 1, x_0_prime=1, u_0_prime=2)


def test_bvp_legacy_signature():
    """DirichletBVP legacy t_0/x_0/t_1/x_1 spelling
    (reference tests/test_conditions.py:333-350)."""
    with pytest.warns(FutureWarning):
        c = C.DirichletBVP(t_0=0, t_1=1, x_0=2, x_1=3)
    assert (c.t_0, c.t_1, c.u_0, c.u_1) == (0, 1, 2, 3)
    with pytest.warns(FutureWarning):
        C.DirichletBVP(0, 2, t_1=1, x_1=0)
    with pytest.raises(KeyError):
        C.DirichletBVP(t_0=0, u_0=0, x_0=0, t_1=1, x_1=0)
    with pytest.raises(KeyError):
        C.DirichletBVP(t_0=0, x_0=0, t_1=1, x_1=0, u_1=0)


def test_bundle_conditions_legacy_signature():
    """bundle_conditions= is the deprecated name of bundle_param_lookup=
    (reference tests/test_conditions.py:327-331)."""
    with pytest.warns(FutureWarning):
        c = C.BundleIVP(0.0, 1.0, bundle_conditions={'t_0': 0})
    assert c.bundle_param_lookup == {'t_0': 0}
    with pytest.warns(FutureWarning):
        c = C.BundleDirichletBVP(0.0, 1.0, 2.0, 3.0, bundle_conditions={'t_0': 0})
    assert c.bundle_param_lookup == {'t_0': 0}
