"""Function-basis tests: harmonics vs scipy/reference values, basis-space
Laplacians vs direct spherical laplacian (parity with reference
tests/test_function_basis.py and test_pde_spherical.py:285-315)."""
import numpy as np
import pytest
import jax

from scipy.special import legendre

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.networks import FCNN
from neurodiffeq_tpu import function_basis as fb
from neurodiffeq_tpu.operators import spherical_laplacian

N = 100


def test_legendre_polynomials():
    x = np.random.rand(N) * 2 - 1
    xf, = F.coordinates(x)
    for d in range(6):
        P = fb.LegendrePolynomial(d)
        expected = np.polyval(legendre(d).coefficients, x)
        out = P(xf)
        out = np.asarray(out.value)[:, 0] if isinstance(out, F.Field) else out
        assert np.allclose(out, expected, atol=1e-8), f"degree {d}"


def test_legendre_basis():
    x, = F.coordinates(np.random.rand(N) * 2 - 1)
    basis = fb.LegendreBasis(max_degree=4)
    out = basis(x)
    assert out.shape == (N, 5)


def test_zonal_spherical_harmonics_match_scipy():
    from scipy.special import sph_harm_y
    th = np.random.rand(N) * np.pi
    ph = np.random.rand(N) * 2 * np.pi
    thf, phf = F.coordinates(th, ph)
    Z = fb.ZonalSphericalHarmonics(max_degree=3)
    out = np.asarray(Z(thf, phf).value)
    for l in range(4):
        expected = sph_harm_y(l, 0, th, ph).real
        assert np.allclose(out[:, l], expected, atol=1e-8), f"l={l}"


def test_zonal_requires_exactly_one_spec():
    with pytest.raises(ValueError):
        fb.ZonalSphericalHarmonics()
    with pytest.raises(ValueError):
        fb.ZonalSphericalHarmonics(max_degree=2, degrees=[1, 2])


def test_real_spherical_harmonics_orthonormal_up_to_pi():
    """Columns are orthonormal up to the reference's missing 1/pi factor:
    integral(Y_i * Y_j) = pi * delta_ij over the sphere."""
    n = 200_000
    rng = np.random.default_rng(0)
    u = rng.uniform(-1, 1, n)
    th = np.arccos(u)
    ph = rng.uniform(0, 2 * np.pi, n)
    Y = fb.RealSphericalHarmonics(max_degree=2)
    out = np.asarray(Y(th.reshape(-1, 1), ph.reshape(-1, 1)))
    # MC integral over sphere: 4*pi*mean
    G = 4 * np.pi * (out.T @ out) / n
    assert np.allclose(G, np.pi * np.eye(9), atol=0.15)


def test_harmonics_laplacian_matches_direct_laplacian():
    """The basis-space laplacian must agree with the coordinate-space
    spherical laplacian of the expanded function (the reference's
    test_spherical_laplacian consistency check)."""
    K = 9  # max_degree = 2
    net = FCNN(1, K, hidden_units=(8, 8))
    params = net.init(jax.random.PRNGKey(0))

    r = np.random.rand(N) * 1.5 + 0.5
    th = np.random.rand(N) * np.pi * 0.9 + 0.05
    ph = np.random.rand(N) * 2 * np.pi
    rf, thf, phf = F.coordinates(r, th, ph)

    coeffs = F.network_field(lambda xs: net.apply(params, xs[0:1]), (rf, thf, phf))
    hl = fb.HarmonicsLaplacian(max_degree=2)
    lap_basis = hl(coeffs, rf, thf, phf)

    Y = fb.RealSphericalHarmonics(max_degree=2)
    u = (coeffs * Y(thf, phf)).sum(axis=1, keepdims=True)
    lap_direct = spherical_laplacian(u, rf, thf, phf)

    assert np.allclose(lap_basis.value, lap_direct.value, atol=1e-6)


def test_fourier_series_shapes():
    phi = np.random.rand(N) * 2 * np.pi
    phif, = F.coordinates(phi)
    S = fb.RealFourierSeries(max_degree=3)
    out = S(phif)
    assert out.shape == (N, 7)
    v = np.asarray(out.value)
    assert np.allclose(v[:, 0], 0.5 / np.sqrt(np.pi))
    assert np.allclose(v[:, 1], np.cos(phi) / np.sqrt(np.pi), atol=1e-8)
    assert np.allclose(v[:, 2], np.sin(phi) / np.sqrt(np.pi), atol=1e-8)


def test_fourier_laplacian_matches_direct():
    """Polar laplacian in basis space vs coordinate space."""
    from neurodiffeq_tpu.fields import diff
    K = 7
    net = FCNN(1, K, hidden_units=(8, 8))
    params = net.init(jax.random.PRNGKey(1))

    r = np.random.rand(N) * 1.5 + 0.5
    ph = np.random.rand(N) * 2 * np.pi
    rf, phf = F.coordinates(r, ph)

    coeffs = F.network_field(lambda xs: net.apply(params, xs[0:1]), (rf, phf))
    FL = fb.FourierLaplacian(max_degree=3)
    lap_basis = FL(coeffs, rf, phf)

    S = fb.RealFourierSeries(max_degree=3)
    u = (coeffs * S(phf)).sum(axis=1, keepdims=True)
    # polar laplacian: u_rr + u_r / r + u_phiphi / r^2
    lap_direct = diff(u, rf, 2) + diff(u, rf) / rf + diff(u, phf, 2) / rf ** 2

    assert np.allclose(lap_basis.value, lap_direct.value, atol=1e-6)


def test_custom_basis():
    x, = F.coordinates(np.random.rand(N))
    basis = fb.CustomBasis([lambda x: x, lambda x: x ** 2])
    out = basis(x)
    assert out.shape == (N, 2)


def test_zonal_harmonics_laplacian_matches_direct_laplacian():
    """Zonal basis-space laplacian vs direct spherical laplacian of the
    expanded function (reference function_basis.py:92-118)."""
    K = 3  # degrees 0..2
    net = FCNN(1, K, hidden_units=(8, 8))
    params = net.init(jax.random.PRNGKey(2))

    r = np.random.rand(N) * 1.5 + 0.5
    th = np.random.rand(N) * np.pi * 0.9 + 0.05
    ph = np.random.rand(N) * 2 * np.pi
    rf, thf, phf = F.coordinates(r, th, ph)

    coeffs = F.network_field(lambda xs: net.apply(params, xs[0:1]), (rf, thf, phf))
    zl = fb.ZonalSphericalHarmonicsLaplacian(max_degree=2)
    lap_basis = zl(coeffs, rf, thf, phf)

    Y = fb.ZonalSphericalHarmonics(max_degree=2)
    u = (coeffs * Y(thf, phf)).sum(axis=1, keepdims=True)
    lap_direct = spherical_laplacian(u, rf, thf, phf)

    assert np.allclose(lap_basis.value, lap_direct.value, atol=1e-6)


def test_module_level_Y_names_match_closed_forms():
    """The 25 module-level Y0_0..Y4p4 (reference function_basis.py:200-232)
    exist and match the reference's published closed forms (Wikipedia real
    harmonics table, normalization without the sqrt(1/pi) factor)."""
    th = np.random.rand(N) * np.pi
    ph = np.random.rand(N) * 2 * np.pi
    s, c = np.sin(th), np.cos(th)
    closed_forms = {
        'Y0_0': np.ones_like(th) * 0.5,
        'Y1n1': s * np.sin(ph) * 0.866025404,
        'Y1_0': c * 0.866025404,
        'Y1p1': s * np.cos(ph) * 0.866025404,
        'Y2n2': s ** 2 * np.sin(ph) * np.cos(ph) * 1.936491673,
        'Y2n1': s * c * np.sin(ph) * 1.936491673,
        'Y2_0': (2 * c ** 2 - s ** 2) * 0.559016994,
        'Y2p1': s * c * np.cos(ph) * 1.936491673,
        'Y2p2': s ** 2 * np.cos(2 * ph) * 0.968245837,
        'Y3_0': (2 * c ** 3 - 3 * c * s ** 2) * 0.661437828,
        'Y4_0': (35 * c ** 4 - 30 * c ** 2 + 3) * 0.1875,
        'Y4p4': s ** 4 * (np.cos(ph) ** 4 - 6 * np.cos(ph) ** 2 * np.sin(ph) ** 2
                          + np.sin(ph) ** 4) * 1.109264959,
    }
    for name, expected in closed_forms.items():
        got = np.asarray(getattr(fb, name)(th, ph))
        assert np.allclose(got, expected, atol=1e-6), name
    # all 25 names exist and agree column-by-column with RealSphericalHarmonics
    basis = fb.RealSphericalHarmonics(max_degree=4)
    thf, phf = F.coordinates(th, ph)
    cols = np.asarray(basis(thf, phf).value)
    i = 0
    for l in range(5):
        for m in range(-l, l + 1):
            name = f'Y{l}_0' if m == 0 else f'Y{l}{"n" if m < 0 else "p"}{abs(m)}'
            assert np.allclose(np.asarray(getattr(fb, name)(th, ph)).ravel(),
                               cols[:, i], atol=1e-6), name
            i += 1


def test_zero_order_harmonics_deprecated_aliases():
    """ZeroOrderSphericalHarmonics(Laplacian) warn and alias the Zonal classes
    (reference function_basis.py:89,118)."""
    with pytest.warns(FutureWarning):
        obj = fb.ZeroOrderSphericalHarmonics(max_degree=2)
    assert isinstance(obj, fb.ZonalSphericalHarmonics)
    with pytest.warns(FutureWarning):
        obj = fb.ZeroOrderSphericalHarmonicsLaplacian(max_degree=2)
    assert isinstance(obj, fb.ZonalSphericalHarmonicsLaplacian)
