r"""Function bases: Legendre polynomials, Fourier series, real spherical
harmonics, and basis-space Laplacians.

Capability parity with the reference's ``neurodiffeq/function_basis.py``
(LegendreBasis, ZonalSphericalHarmonics(+Laplacian), RealFourierSeries +
FourierLaplacian, RealSphericalHarmonics (l<=4) + HarmonicsLaplacian,
``function_basis.py:11-300``). All bases are Field-aware: called with
coordinate Fields they return an ``(N, K)`` Field usable inside residuals;
called with plain arrays they return arrays.

The real spherical harmonics here use the standard orthonormalized real-form
:math:`Y_{lm}(\theta,\phi)` (physics convention: theta = polar angle); they
are generated from closed-form associated-Legendre recurrences rather than
hard-coded per-(l, m) lambdas, so any ``max_degree`` is supported (the
reference caps at l<=4, ``function_basis.py:200-232``).
"""
import numpy as np
import jax.numpy as jnp
from scipy.special import legendre

from .fields import Field, cat, diff
from .fields import sin as fsin, cos as fcos
from ._version_utils import warn_deprecate_class


def _y_name(l, m):
    """Reference naming for the module-level harmonics: Y2_0, Y2n1, Y2p1, ..."""
    return f'Y{l}_0' if m == 0 else f'Y{l}{"n" if m < 0 else "p"}{abs(m)}'


__all__ = [
    'LegendrePolynomial', 'LegendreBasis', 'CustomBasis', 'ZonalSphericalHarmonics',
    'ZonalSphericalHarmonicsLaplacian', 'RealFourierSeries', 'FourierLaplacian',
    'RealSphericalHarmonics', 'HarmonicsLaplacian',
    'FunctionBasis', 'BasisOperator',
    'ZeroOrderSphericalHarmonics', 'ZeroOrderSphericalHarmonicsLaplacian',
] + [  # the reference's 25 module-level harmonics (function_basis.py:200-232)
    _y_name(l, m) for l in range(5) for m in range(-l, l + 1)
]


class FunctionBasis:
    """Base class of all function bases; callables mapping coordinate Field(s)
    to an (N, K) basis Field."""


class BasisOperator:
    """Base class of all basis-space operators (e.g. basis-space Laplacians)."""


class LegendrePolynomial:
    """The degree-``degree`` Legendre polynomial, evaluated Horner-style from
    scipy coefficients (reference ``function_basis.py:11-42``)."""

    def __init__(self, degree):
        self.degree = degree
        self.coefficients = [float(c) for c in legendre(degree).coefficients]

    def __call__(self, x):
        if self.degree == 0:
            return x * 0 + 1
        elif self.degree == 1:
            return x * 1
        # Horner evaluation keeps everything Field-composable
        result = self.coefficients[0]
        for c in self.coefficients[1:]:
            result = result * x + c
        return result


class CustomBasis(FunctionBasis):
    """Column-concatenation of arbitrary callables
    (reference ``function_basis.py:45-51``)."""

    def __init__(self, fns):
        self.fns = fns

    def __call__(self, *xs):
        outs = [fn(*xs) for fn in self.fns]
        if any(isinstance(o, Field) for o in outs):
            return cat(outs)
        return jnp.concatenate([jnp.atleast_2d(o) for o in outs], axis=1)


class LegendreBasis(FunctionBasis):
    """Legendre polynomials 0..max_degree as a basis
    (reference ``function_basis.py:45-51``)."""

    def __init__(self, max_degree):
        polynomials = [LegendrePolynomial(d) for d in range(max_degree + 1)]
        self.basis_module = CustomBasis(polynomials)

    def __call__(self, x):
        return self.basis_module(x)


class ZonalSphericalHarmonics(FunctionBasis):
    r"""Zonal harmonics (spherical harmonics with order m=0):
    :math:`\sqrt{(2l+1)/(4\pi)}\,P_l(\cos\theta)`
    (reference ``function_basis.py:54-89``).

    :param max_degree: highest degree l (inclusive); degrees = 0..max_degree.
    :param degrees: explicit list of degrees (overrides max_degree).
    """

    def __init__(self, max_degree=None, degrees=None):
        if max_degree is None and degrees is None:
            raise ValueError("Either `max_degree` or `degrees` must be specified")
        if max_degree is not None and degrees is not None:
            raise ValueError("Only one of `max_degree` and `degrees` can be specified")
        if degrees is None:
            degrees = list(range(max_degree + 1))
        self.degrees = degrees

        coefficients = [np.sqrt((2 * l + 1) / (4 * np.pi)) for l in self.degrees]
        polynomials = [LegendrePolynomial(d) for d in self.degrees]

        fns = [
            (lambda theta, c=c, fn=fn: fn(fcos(theta)) * c)
            for c, fn in zip(coefficients, polynomials)
        ]
        self.basis_module = CustomBasis(fns)

    @property
    def max_degree(self):
        return max(self.degrees)

    def __call__(self, theta, phi):
        return self.basis_module(theta)


class ZonalSphericalHarmonicsLaplacian(BasisOperator):
    r"""Basis-space laplacian for zonal harmonics: the angular part reduces to
    the closed-form coefficients :math:`-l(l+1)/r^2` while the radial part is
    computed as :math:`\partial_r^2 (R\,r)/r` (reference ``function_basis.py:92-118``)."""

    def __init__(self, max_degree=None, degrees=None):
        self.harmonics_fn = ZonalSphericalHarmonics(max_degree=max_degree, degrees=degrees)
        laplacian_coefficients = [-l * (l + 1) for l in self.harmonics_fn.degrees]
        self.laplacian_coefficients = np.asarray(laplacian_coefficients, dtype=np.float64)

    def __call__(self, base_coeffs, r, theta, phi):
        coeffs_times_r = base_coeffs * r
        radial_components = [
            diff(coeffs_times_r[:, j:j + 1], r, order=2)
            for j in range(base_coeffs.shape[1])
        ]
        radial_components = cat(radial_components) / r

        angular_components = self.laplacian_coefficients * base_coeffs / r ** 2
        products = (radial_components + angular_components) * self.harmonics_fn(theta, phi)
        return products.sum(axis=1, keepdims=True)


# deprecated aliases kept for reference parity (reference ``function_basis.py:89,118``)
ZeroOrderSphericalHarmonics = warn_deprecate_class(ZonalSphericalHarmonics)
ZeroOrderSphericalHarmonicsLaplacian = warn_deprecate_class(ZonalSphericalHarmonicsLaplacian)


class RealFourierSeries(FunctionBasis):
    r"""Real Fourier series on an angle:
    ``[1/sqrt(2pi), cos(phi)/sqrt(pi), sin(phi)/sqrt(pi), cos(2 phi)/sqrt(pi), ...]``
    (reference ``function_basis.py:121-155``).

    :param max_degree: highest degree of the series; defaults to 12.
    """

    def __init__(self, max_degree=12):
        self.max_degree = max_degree
        fns = [lambda phi: phi * 0 + 0.5 / np.sqrt(np.pi)]
        for deg in range(1, self.max_degree + 1):
            fns.append(lambda phi, deg=deg: fcos(deg * phi) / np.sqrt(np.pi))
            fns.append(lambda phi, deg=deg: fsin(deg * phi) / np.sqrt(np.pi))
        self.basis_module = CustomBasis(fns)

    def __call__(self, phi):
        """:param phi: a vector of angles, (N, 1) Field (or array).
        :return: Fourier basis evaluated at each angle, (N, 2*max_degree+1)."""
        return self.basis_module(phi)


class FourierLaplacian(BasisOperator):
    r"""A Laplacian operator (in polar coordinates) acting on
    :math:`\sum_i R_i(r)F_i(\phi)` where :math:`F_i` is a Fourier component
    (reference ``function_basis.py:158-191``): per-column radial derivatives
    plus closed-form angular coefficients :math:`-\mathrm{deg}_i^2`.
    """

    def __init__(self, max_degree=12):
        self.harmonics_fn = RealFourierSeries(max_degree=max_degree)
        laplacian_coefficients = [0] + [- deg ** 2 for deg in range(1, max_degree + 1) for sign in range(2)]
        self.laplacian_coefficients = np.asarray(laplacian_coefficients, dtype=np.float64)

    def __call__(self, base_coeffs, r, phi):
        """:param base_coeffs: coefficients R_i(r), an (N, K) Field.
        :param r, phi: polar coordinate Fields, (N, 1) each.
        :return: the scalar laplacian evaluated at (r, phi), an (N, 1) Field."""
        radial_components = [
            diff(base_coeffs[:, j:j + 1], r) / r + diff(base_coeffs[:, j:j + 1], r, order=2)
            for j in range(base_coeffs.shape[1])
        ]
        radial_components = cat(radial_components)

        angular_components = self.laplacian_coefficients * base_coeffs / r ** 2
        products = (radial_components + angular_components) * self.harmonics_fn(phi)
        return products.sum(axis=1, keepdims=True)


def _assoc_legendre_fns(l, m):
    r"""Closed-form associated Legendre :math:`P_l^m(\cos\theta)` as a function
    of ``cos_t`` and ``sin_t`` (|sin| branch), for small l via stable explicit
    formulas; valid for 0 <= m <= l <= 10 (well beyond the reference's l<=4)."""
    from math import comb, factorial

    def P(cos_t, sin_t):
        # P_l^m(x) = (-1)^m 2^l (1-x^2)^{m/2} sum_{k=m}^{l} k!/(k-m)! x^{k-m} C(l,k) C((l+k-1)/2, l)
        total = 0.
        for k in range(m, l + 1):
            c = (factorial(k) / factorial(k - m)) * comb(l, k) * _gen_binom((l + k - 1) / 2.0, l)
            total = total + c * cos_t ** (k - m)
        return ((-1) ** m * 2 ** l) * (sin_t ** m) * total

    return P


def _gen_binom(alpha, k):
    """Generalized binomial coefficient C(alpha, k) for real alpha."""
    out = 1.0
    for i in range(k):
        out *= (alpha - i) / (k - i)
    return out


class RealSphericalHarmonics(FunctionBasis):
    r"""Real (orthonormal) spherical harmonics :math:`Y_{lm}(\theta, \phi)` up
    to ``max_degree`` (reference hardcodes l<=4 at ``function_basis.py:200-262``;
    here any degree is generated from closed forms). Output columns are ordered
    (l=0,m=0), (l=1,m=-1..1), (l=2,m=-2..2), ...

    :param max_degree: highest degree l for the harmonics.
    """

    def __init__(self, max_degree=4):
        self.max_degree = max_degree

        fns = []
        for l in range(max_degree + 1):
            for m in range(-l, l + 1):
                fns.append(self._make_fn(l, m))
        self.basis_module = CustomBasis(fns)

    @staticmethod
    def _make_fn(l, m):
        from math import factorial
        am = abs(m)
        # real-form normalization WITHOUT the 1/sqrt(pi) factor, matching the
        # reference's convention (see comment at reference function_basis.py:195-197:
        # "the normalization term doesn't include the factor sqrt(1/pi)");
        # the (-1)^m below cancels the Condon-Shortley phase of P_l^m.
        norm = np.sqrt((2 * l + 1) / 4 * factorial(l - am) / factorial(l + am))
        if m != 0:
            norm *= np.sqrt(2.0)
        P = _assoc_legendre_fns(l, am)

        if m < 0:
            def fn(theta, phi):
                return ((-1) ** am) * norm * P(fcos(theta), fsin(theta)) * fsin(am * phi)
        elif m == 0:
            def fn(theta, phi):
                return norm * P(fcos(theta), fsin(theta)) + 0 * phi
        else:
            def fn(theta, phi):
                return ((-1) ** am) * norm * P(fcos(theta), fsin(theta)) * fcos(am * phi)
        return fn

    def __call__(self, theta, phi):
        """:param theta: polar angles, (N, 1) Field (or array).
        :param phi: azimuthal angles, (N, 1) Field (or array).
        :return: basis values, (N, (max_degree+1)^2)."""
        return self.basis_module(theta, phi)


# Module-level per-(l, m) real spherical harmonics Y0_0 ... Y4p4. The reference
# hardcodes these as 25 torch lambdas (``function_basis.py:200-232``); here each
# is generated from the same closed-form associated-Legendre machinery that
# powers :class:`RealSphericalHarmonics`, with the identical normalization
# convention (no ``sqrt(1/pi)`` factor).
for _l in range(5):
    for _m in range(-_l, _l + 1):
        globals()[_y_name(_l, _m)] = RealSphericalHarmonics._make_fn(_l, _m)
del _l, _m


class HarmonicsLaplacian(BasisOperator):
    r"""Basis-space spherical laplacian for real spherical harmonics
    (reference ``function_basis.py:274-300``): with
    :math:`u = \sum_{l,m} R_{l,m}(r) Y_{l,m}(\theta,\phi)`, the angular part
    contributes :math:`-l(l+1)R/r^2` and the radial part is evaluated as
    :math:`\partial_r^2(R\,r)/r`, avoiding the :math:`1/\sin\theta` singularity.
    """

    def __init__(self, max_degree=4):
        self.harmonics_fn = RealSphericalHarmonics(max_degree=max_degree)
        laplacian_coefficients = [
            -l * (l + 1) for l in range(max_degree + 1) for m in range(-l, l + 1)
        ]
        self.laplacian_coefficients = np.asarray(laplacian_coefficients, dtype=np.float64)

    def __call__(self, base_coeffs, r, theta, phi):
        coeffs_times_r = base_coeffs * r
        radial_components = [
            diff(coeffs_times_r[:, j:j + 1], r, order=2)
            for j in range(base_coeffs.shape[1])
        ]
        radial_components = cat(radial_components) / r

        angular_components = self.laplacian_coefficients * base_coeffs / r ** 2
        products = (radial_components + angular_components) * self.harmonics_fn(theta, phi)
        return products.sum(axis=1, keepdims=True)
