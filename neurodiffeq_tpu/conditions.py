r"""Initial/boundary condition reparameterizations (exact-constraint enforcement).

Capability parity with the reference's ``neurodiffeq/conditions.py`` (all 14
condition classes: IVP/BundleIVP, DirichletBVP(+Bundle), DirichletBVP2D,
IBVP1D, DoubleEndedBVP1D, spherical/infinite/basis variants, Ensemble/No/
Irregular, ``conditions.py:8-1166``).

Design: a condition transforms the *function*, not just an output tensor. Here
``enforce(net, params, *coords)`` composes the network and the reparameterizing
formula into a single per-sample :class:`~neurodiffeq_tpu.fields.Field`, so
arbitrary-order derivatives of the *constrained* solution flow through the
condition exactly — the JAX equivalent of the reference's
``parameterize(net(cat(coords)), *coords)`` under ``create_graph=True``
(``conditions.py:41-57``). Boundary-anchor evaluations (IBVP1D etc.) use
:func:`~neurodiffeq_tpu.fields.substitute` which pins a coordinate while
keeping its derivative direction alive.
"""
import warnings

import numpy as np
import jax.numpy as jnp

from .fields import Field, exp, tanh, cat, pin
from .fields import abs as fabs
from ._version_utils import deprecated_alias

__all__ = [
    'BaseCondition', 'IrregularBoundaryCondition', 'EnsembleCondition', 'NoCondition',
    'IVP', 'BundleIVP', 'DirichletBVP', 'BundleDirichletBVP', 'DirichletBVP2D',
    'DirichletBoxND', 'IBVP1D', 'DoubleEndedBVP1D', 'DirichletBVPSpherical',
    'InfDirichletBVPSpherical',
    'DirichletBVPSphericalBasis', 'InfDirichletBVPSphericalBasis',
]


def _ann_field(net, params, coordinates, ith_unit=None):
    """Build the raw network-output Field ANN(*coordinates).

    ``coordinates`` may be a subset of the full coordinate set (e.g. a radial
    net in a harmonics basis); the network consumes exactly the passed
    components, in order. When the network supports batched Taylor propagation
    the field gets the hot evaluation path (one shared forward pass for all
    derivatives of the enforced solution).
    """
    cs = coordinates[0].coords
    idxs = tuple(c.index for c in coordinates)
    for c in coordinates:
        if c.index is None:
            raise TypeError("enforce expects raw coordinate Fields")

    def fn(xs):
        inp = jnp.stack([xs[i] for i in idxs])
        out = jnp.atleast_1d(net.apply(params, inp))
        if ith_unit is not None:
            out = out[ith_unit:ith_unit + 1]
        return out

    trule = None
    if getattr(net, 'supports_taylor', False):
        def trule(ctx):
            from .ops.taylor import TSeries, slice_series
            sub = list(idxs)
            c0 = ctx.points[:, sub]
            # constant tangents, in the context's layout
            if ctx.stacked:
                d1 = ctx.directions[:, sub][:, None, :]  # (D, 1, len)
                zeros = jnp.zeros_like(d1)
            else:
                d1 = tuple(ctx.directions[d, sub][None, :] for d in range(ctx.n_dirs))
                zeros = tuple(jnp.zeros_like(x) for x in d1)
            derivs = ([d1] + [zeros] * (ctx.order - 1))[:ctx.order]
            meta = ('raw_coords' if (ctx.is_axes and sub == list(range(ctx.points.shape[1])))
                    else None)
            out = net.taylor_apply(params, TSeries(c0, derivs, meta=meta), ctx)
            if ith_unit is not None:
                out = slice_series(out, ith_unit)
            return out

    return Field(fn, cs, trule=trule)


def _const_field(value, like_field):
    """A Field with constant value (still differentiable: derivative zero)."""
    cs = like_field.coords

    def fn(xs):
        # anchor dtype/shape to the coordinate array without depending on it
        return jnp.asarray(value, dtype=xs.dtype)

    def trule(ctx):
        from .ops.taylor import constant_series
        return constant_series(value, ctx, ctx.points.shape[0])

    return Field(fn, cs, trule=trule)


class BaseCondition:
    r"""Base class for all conditions.

    A condition re-parameterizes the output(s) of a neural network so that the
    re-parameterized output(s) automatically satisfy initial/boundary
    conditions of the ODE/PDE being solved.

    .. note::
        - *(re-)parameterize* is said of network outputs;
        - *enforce* is said of networks themselves.
    """

    def __init__(self):
        self.ith_unit = None

    def parameterize(self, output_tensor, *input_tensors):
        r"""Re-parameterize output(s) of a network (all arguments are Fields).

        :param output_tensor: Output Field of the neural network.
        :param input_tensors: Coordinate Fields (independent variables).
        :return: The re-parameterized output as a Field.
        """
        raise ValueError(f"Abstract {self.__class__.__name__} cannot be parameterized")  # pragma: no cover

    def enforce(self, net, params, *coordinates):
        r"""Enforce this condition on a network.

        :param net: The network module (init/apply pair).
        :param params: The network's parameter pytree.
        :param coordinates: Coordinate Fields, inputs of the network.
        :return: The re-parameterized output Field, condition exactly satisfied.
        """
        network_output = _ann_field(net, params, coordinates, ith_unit=self.ith_unit)
        # NOTE: op-by-op Taylor propagation through the parameterization
        # measured FASTER than fusing it into one `fields.composite` call
        # (21.7M vs 16.8M pts/s on the Laplace headline) — the closed-form
        # per-op rules beat path-jvp re-evaluation of the whole formula.
        return self.parameterize(network_output, *coordinates)

    def set_impose_on(self, ith_unit):
        r"""**[DEPRECATED]** Track which output unit of a shared multi-output
        network is being parameterized (reference ``conditions.py:59-75``)."""
        warnings.warn(
            f"`{self.__class__.__name__}.set_impose_on` is deprecated and will be "
            f"removed in the future", DeprecationWarning,
        )
        self.ith_unit = ith_unit


class _BundleConditionMixin:
    """Mixin for bundle conditions whose parameters (t_0, u_0, ...) may be
    dynamically sampled by generators (reference ``conditions.py:78-135``).

    :param bundle_param_lookup: maps parameter name -> index into the sampled
        ``theta`` tuple passed to ``parameterize``.
    :param allowed_params: legal names for ``bundle_param_lookup`` keys.
    """

    def __init__(self, bundle_param_lookup=None, allowed_params=None):
        self.bundle_param_lookup = bundle_param_lookup or {}
        if isinstance(allowed_params, str):
            allowed_params = set(allowed_params)
        if allowed_params:
            illegal_params = set(self.bundle_param_lookup) - set(allowed_params)
            if illegal_params:
                raise ValueError(
                    f"The following parameter(s) are not allowed in `bundle_parameters_lookup`: "
                    f"{illegal_params}.\nSupported parameter name(s) are: {allowed_params}.")

    def _get_parameter(self, param_name, thetas, override_name=None):
        if param_name in self.bundle_param_lookup:
            return thetas[self.bundle_param_lookup[param_name]]
        return getattr(self, override_name or param_name)


class IrregularBoundaryCondition(BaseCondition):
    """Base for conditions on irregular domains; adds an ``in_domain`` mask
    hook used by monitors (reference ``conditions.py:138-154``)."""

    def in_domain(self, *coordinates):
        """Boolean array: whether each (numpy) point lies within the domain."""
        return np.ones_like(coordinates[0], dtype=bool)


class EnsembleCondition(BaseCondition):
    r"""Enforces sub-conditions on individual output units of a multi-output
    network (reference ``conditions.py:157-202``).

    :param sub_conditions: Condition(s) to be ensemble'd.
    :param force: Whether to force ensembl'ing even when ``.enforce`` is
        overridden in a sub-condition.
    """

    def __init__(self, *sub_conditions, force=False):
        super().__init__()
        for i, c in enumerate(sub_conditions):
            if c.__class__.enforce != BaseCondition.enforce:
                msg = (f"{c.__class__.__name__} (index={i})'s overrides BaseCondition's "
                       f"`.enforce` method. Ensembl'ing is likely not going to work.")
                if force:
                    warnings.warn(msg)
                else:
                    raise ValueError(msg + "\nTry with `force=True` if you know what you are doing.")
        self.conditions = sub_conditions

    def parameterize(self, output_tensor, *input_tensors):
        r"""Re-parameterize each column individually with its sub-condition and
        concatenate the results."""
        if output_tensor.shape[1] != len(self.conditions):
            raise ValueError(f"number of output units ({output_tensor.shape[1]}) "
                             f"differs from number of conditions ({len(self.conditions)})")
        return cat([
            con.parameterize(output_tensor[:, i:i + 1], *input_tensors)
            for i, con in enumerate(self.conditions)
        ])


class NoCondition(BaseCondition):
    r"""A polymorphic condition performing no re-parameterization
    (reference ``conditions.py:205-222``)."""

    def parameterize(self, output_tensor, *input_tensors):
        return output_tensor


class IVP(BaseCondition):
    r"""An initial value problem:

    - Dirichlet: :math:`u(t_0)=u_0`, enforced as
      :math:`u(t) = u_0 + (1 - e^{-(t-t_0)})\,\mathrm{ANN}(t)`;
    - Neumann: :math:`u'(t_0)=u_0'`, enforced as
      :math:`u(t) = u_0 + (t-t_0)u_0' + (1 - e^{-(t-t_0)})^2\,\mathrm{ANN}(t)`.

    (Reference ``conditions.py:225-267``.)

    :param t_0: The initial time.
    :param u_0: The initial value of u.
    :param u_0_prime: The initial derivative of u w.r.t. t, defaults to None.
    """

    @deprecated_alias(x_0='u_0', x_0_prime='u_0_prime')
    def __init__(self, t_0, u_0=None, u_0_prime=None):
        super().__init__()
        self.t_0, self.u_0, self.u_0_prime = t_0, u_0, u_0_prime

    def parameterize(self, output_tensor, t):
        if self.u_0_prime is None:
            return self.u_0 + (1 - exp(-t + self.t_0)) * output_tensor
        return (self.u_0 + (t - self.t_0) * self.u_0_prime
                + ((1 - exp(-t + self.t_0)) ** 2) * output_tensor)


class BundleIVP(BaseCondition, _BundleConditionMixin):
    r"""An IVP over a bundle of parameters: any of t_0/u_0/u_0' may come from
    sampled theta columns (reference ``conditions.py:270-345``). When t_0 is
    itself sampled, the exponential blending factor is replaced by polynomial
    ``(t - t_0)`` factors.

    :param bundle_param_lookup: allowed keys 't_0', 'u_0', 'u_0_prime'.
    """

    @deprecated_alias(x_0='u_0', x_0_prime='u_0_prime', bundle_conditions='bundle_param_lookup')
    def __init__(self, t_0=None, u_0=None, u_0_prime=None, bundle_param_lookup=None):
        BaseCondition.__init__(self)
        _BundleConditionMixin.__init__(
            self, bundle_param_lookup=bundle_param_lookup,
            allowed_params=['t_0', 'u_0', 'u_0_prime'],
        )
        self.t_0, self.u_0, self.u_0_prime = t_0, u_0, u_0_prime

    def parameterize(self, output_tensor, t, *theta):
        t_0 = self._get_parameter('t_0', theta)
        u_0 = self._get_parameter('u_0', theta)
        u_0_prime = self._get_parameter('u_0_prime', theta)

        if 't_0' in self.bundle_param_lookup:
            # polynomial factors keep the constraint exact for *sampled* t_0
            if u_0_prime is None:
                return u_0 + (t - t_0) * output_tensor
            return u_0 + (t - t_0) * u_0_prime + ((t - t_0) ** 2) * output_tensor

        if u_0_prime is None:
            return u_0 + (1 - exp(-t + t_0)) * output_tensor
        return u_0 + (t - t_0) * u_0_prime + ((1 - exp(-t + t_0)) ** 2) * output_tensor


class BundleDirichletBVP(BaseCondition, _BundleConditionMixin):
    r"""Double-ended Dirichlet BVP with bundle-able parameters
    (reference ``conditions.py:348-395``):
    :math:`u(t)=(1-\tilde t)u_0+\tilde t u_1+(1-e^{(1-\tilde t)\tilde t})\mathrm{ANN}(t)`.

    :param bundle_param_lookup: allowed keys 't_0', 'u_0', 't_1', 'u_1'.
    """

    @deprecated_alias(bundle_conditions='bundle_param_lookup')
    def __init__(self, t_0, u_0, t_1, u_1, bundle_param_lookup=None):
        BaseCondition.__init__(self)
        _BundleConditionMixin.__init__(
            self, bundle_param_lookup=bundle_param_lookup,
            allowed_params=['t_0', 'u_0', 't_1', 'u_1'],
        )
        self.t_0, self.u_0, self.t_1, self.u_1 = t_0, u_0, t_1, u_1

    def parameterize(self, output_tensor, t, *theta):
        u_0 = self._get_parameter('u_0', theta)
        u_1 = self._get_parameter('u_1', theta)
        t_0 = self._get_parameter('t_0', theta)
        t_1 = self._get_parameter('t_1', theta)
        t_tilde = (t - t_0) / (t_1 - t_0)
        return u_0 * (1 - t_tilde) + u_1 * t_tilde + (1 - exp((1 - t_tilde) * t_tilde)) * output_tensor


class DirichletBVP(BaseCondition):
    r"""A double-ended Dirichlet boundary condition :math:`u(t_0)=u_0`,
    :math:`u(t_1)=u_1` (reference ``conditions.py:398-435``)."""

    @deprecated_alias(x_0='u_0', x_1='u_1')
    def __init__(self, t_0, u_0, t_1, u_1):
        super().__init__()
        self.t_0, self.u_0, self.t_1, self.u_1 = t_0, u_0, t_1, u_1

    def parameterize(self, output_tensor, t):
        t_tilde = (t - self.t_0) / (self.t_1 - self.t_0)
        return (self.u_0 * (1 - t_tilde) + self.u_1 * t_tilde
                + (1 - exp((1 - t_tilde) * t_tilde)) * output_tensor)


class DirichletBVP2D(BaseCondition):
    r"""A Dirichlet condition on all four sides of
    :math:`[x_0, x_1] \times [y_0, y_1]` (reference ``conditions.py:438-509``):
    an additive boundary interpolant ``A(x, y)`` plus
    :math:`\tilde x(1-\tilde x)\tilde y(1-\tilde y)\,\mathrm{ANN}(x,y)`.

    :param x_min, x_max, y_min, y_max: domain bounds.
    :param x_min_val, x_max_val: callables f0(y), f1(y) (written with
        Field-aware math from :mod:`neurodiffeq_tpu.fields`).
    :param y_min_val, y_max_val: callables g0(x), g1(x).
    """

    def __init__(self, x_min, x_min_val, x_max, x_max_val, y_min, y_min_val, y_max, y_max_val):
        super().__init__()
        self.x0, self.f0 = x_min, x_min_val
        self.x1, self.f1 = x_max, x_max_val
        self.y0, self.g0 = y_min, y_min_val
        self.y1, self.g1 = y_max, y_max_val

    def parameterize(self, output_tensor, x, y):
        x_tilde = (x - self.x0) / (self.x1 - self.x0)
        y_tilde = (y - self.y0) / (self.y1 - self.y0)
        # constant-valued inputs for corner evaluations, polymorphic over
        # Fields and raw arrays (`x * 0 + c` keeps the differentiable type)
        x0 = x * 0 + self.x0
        x1 = x * 0 + self.x1
        Axy = ((1 - x_tilde) * self.f0(y) + x_tilde * self.f1(y)
               + (1 - y_tilde) * (self.g0(x) - ((1 - x_tilde) * self.g0(x0) + x_tilde * self.g0(x1)))
               + y_tilde * (self.g1(x) - ((1 - x_tilde) * self.g1(x0) + x_tilde * self.g1(x1))))
        return Axy + x_tilde * (1 - x_tilde) * y_tilde * (1 - y_tilde) * output_tensor


class DirichletBoxND(BaseCondition):
    r"""An exact Dirichlet condition on a ``dim``-dimensional box
    :math:`[a_1, b_1] \times \dots \times [a_d, b_d]`:

    .. math:: u(x) = g(x) + \phi(x)\,\mathrm{ANN}(x),

    where ``g`` is a user-supplied smooth extension of the boundary data over
    the closed box (``u \equiv g`` on every face by construction) and
    :math:`\phi` vanishes on the whole boundary. This is the d-dimensional
    generalization of :class:`DirichletBVP2D`'s
    :math:`\tilde x(1-\tilde x)\tilde y(1-\tilde y)` factor (reference
    ``conditions.py:438-509``) — the reference has no high-dimensional
    condition class at all; pair this one with
    :class:`~neurodiffeq_tpu.generators.GeneratorHypercube` and
    :func:`~neurodiffeq_tpu.operators.stde_laplacian` for d ≫ 3 problems,
    keeping boundaries exact instead of falling back to a tuned boundary
    penalty.

    Three masks, all vanishing exactly (and to *first* order — a mask
    vanishing quadratically would also pin :math:`\partial u/\partial n` to
    ``g``'s, over-constraining the trial space) on every face, built from
    the normalized per-face factors
    :math:`\phi_i = 4(x_i - a_i)(b_i - x_i)/(b_i - a_i)^2 \in [0, 1]`:

    - ``mask='product'``: :math:`\phi = \prod_i \phi_i` — a polynomial,
      :math:`C^\infty` everywhere including corners (exactly DirichletBVP2D's
      bubble at d=2, up to the constant 16). Best conditioning at low d, but
      its typical interior magnitude decays like :math:`e^{-0.61 d}`
      (4·x(1-x) has mean log −0.61 on [0,1]), which un-trains the ANN past
      d ≈ 10-15; construction raises beyond ``dim=16``.
    - ``mask='sat'`` (saturated product):

      .. math:: \phi = \prod_i \bigl(1 - (1 - \phi_i)^k\bigr),
          \qquad k = \texttt{dim} \text{ by default.}

      Each factor saturates to ~1 unless :math:`x_i` is within O(1/k) of
      its faces, so with :math:`k = d` only O(1) factors are below 1 at a
      random point and the mask's interior magnitude is *dimension-free*
      (median ≈ 0.68 at d = 5 and at d = 100, measured over iid points).
      Still polynomial and :math:`C^\infty`; curvature is bounded by
      O(:math:`k^2`) in a 1/k-layer at each face. This is the mask that
      makes exact constraints train at d ≫ 10 — measured on the d-dim
      Poisson benchmark (`benchmarks/stde_ab.py`): rel-L2 0.006 at d=5,
      0.012 at d=20 (3000 epochs, stde Laplacian), where 'adf' stalls at
      0.28 and 'product' has underflowed.
    - ``mask='adf'``: the R-function approximate-distance combination
      (Sukumar & Srivastava 2022, "Exact imposition of boundary conditions
      with distance functions in physics-informed deep networks", CMAME
      389:114333; m=1 R-equivalence), :math:`\phi = d / \sum_i 1/\phi_i`,
      scaled so :math:`\phi = 1` at the box center at any dimension.
      **Caveat (measured):** its second derivatives grow like the inverse
      distance to the nearest *edge* (any degree-1 homogeneous min-like
      combination does), so **strong-form** residuals near edges blow up
      and training stalls (rel-L2 0.28 vs 0.006 for 'sat' on the d=5
      benchmark above). Use it with the ``'variational'`` (Deep Ritz) loss,
      where only the mask's bounded *first* derivatives enter, or for pure
      interpolation; prefer ``'sat'`` for strong-form PINN training.

    ``mask='auto'`` (the default) picks ``'product'`` for ``dim`` <= 10 and
    ``'sat'`` above.

    :param dim: Number of coordinates d.
    :type dim: int
    :param boundary_fn: The boundary-data extension ``g``: a callable of the
        d coordinate Fields (written with the math in
        :mod:`neurodiffeq_tpu.fields`), defined on the *closed* box, whose
        restriction to the boundary is the Dirichlet data. Pass ``None`` for
        homogeneous (g = 0) data. In practice boundary data usually comes as
        the restriction of a known closed-form ambient function — pass that
        function.
    :param r_min: scalar or length-d lower bounds :math:`a_i`. Defaults to 0.
    :param r_max: scalar or length-d upper bounds :math:`b_i`. Defaults to 1.
    :param mask: ``'auto'``, ``'product'``, ``'sat'``, or ``'adf'``, see above.
    :type mask: str
    :param k: Saturation order of the ``'sat'`` mask; defaults to ``dim``.
        Larger k -> mask closer to 1 in the interior but curvature O(k^2)
        near faces; smaller k drifts toward the product's decay.
    :type k: int, optional
    :param power: Vanishing order of the mask in the reparameterization
        :math:`u = g + \phi^{\text{power}}\,\mathrm{ANN}`. The default 1
        pins only :math:`u = g` on the boundary (a quadratic mask would
        over-constrain a second-order problem, see above). ``power=2`` is
        the **clamped** condition for fourth-order problems (plate
        equation / :func:`~neurodiffeq_tpu.operators.stde_biharmonic`):
        :math:`\phi^2` vanishes to second order on every face, so *both*
        :math:`u = g` and :math:`\partial u/\partial n = \partial g/
        \partial n` hold by construction — ``g`` must then extend both the
        boundary values and the boundary normal derivatives.
    :type power: int

    .. note::
        The ADF mask computes :math:`1/(\phi_i + \epsilon)` with
        :math:`\epsilon = \sqrt{\text{tiny}}` of the active dtype
        (~1e-154 in float64, ~1e-19 in float32) instead of a hard clamp:
        the formula stays smooth (no ``where`` branches — safe for
        arbitrary-order Taylor/jet differentiation) and evaluating exactly
        ON a face returns ``g`` to within :math:`d\,\epsilon\,|\mathrm{ANN}|`,
        which rounds to ``g`` at both precisions.
    """

    def __init__(self, dim, boundary_fn=None, r_min=0.0, r_max=1.0, mask='auto',
                 k=None, power=1):
        super().__init__()
        if dim < 1:
            raise ValueError(f"dim must be >= 1, got {dim}")
        if int(power) != power or power < 1:
            raise ValueError(
                f"power must be a positive integer (1 = Dirichlet, 2 = "
                f"clamped), got {power!r}")
        if mask == 'auto':
            mask = 'product' if dim <= 10 else 'sat'
        if mask not in ('adf', 'product', 'sat'):
            raise ValueError(
                f"mask must be 'auto', 'product', 'sat' or 'adf', got {mask!r}")
        if mask == 'product' and dim > 16:
            raise ValueError(
                f"mask='product' underflows/un-trains past d~10-15 (typical "
                f"interior magnitude e^(-0.61*{dim}) here); use mask='sat'")
        if k is not None and (mask != 'sat' or k < 1):
            raise ValueError("k is the saturation order of mask='sat' (k >= 1)")
        self.k = int(k) if k is not None else dim
        r_min = tuple(float(v) for v in np.atleast_1d(r_min)) if np.ndim(r_min) \
            else (float(r_min),) * dim
        r_max = tuple(float(v) for v in np.atleast_1d(r_max)) if np.ndim(r_max) \
            else (float(r_max),) * dim
        if len(r_min) != dim or len(r_max) != dim:
            raise ValueError(
                f"r_min/r_max must be scalars or length-{dim}: "
                f"got {len(r_min)}/{len(r_max)}")
        if any(hi <= lo for lo, hi in zip(r_min, r_max)):
            raise ValueError(f"Illegal box [{r_min}, {r_max}]")
        if boundary_fn is not None and not callable(boundary_fn):
            raise TypeError("boundary_fn must be a callable of the coordinate "
                            "Fields (or None for homogeneous data)")
        self.dim = dim
        self.boundary_fn = boundary_fn
        self.r_min, self.r_max = r_min, r_max
        self.mask = mask
        self.power = int(power)

    def mask_field(self, *xs):
        """The mask :math:`\\phi` as a Field of the given coordinates —
        exposed so benchmarks/users can reuse the exact vanishing factor
        (e.g. to manufacture solutions with known boundary gaps)."""
        phis = [4.0 * (x - a) * (b - x) / (b - a) ** 2
                for x, a, b in zip(xs, self.r_min, self.r_max)]
        if self.mask == 'product':
            phi = phis[0]
            for p in phis[1:]:
                phi = phi * p
            return phi
        if self.mask == 'sat':
            phi = 1.0 - (1.0 - phis[0]) ** self.k
            for p in phis[1:]:
                phi = phi * (1.0 - (1.0 - p) ** self.k)
            return phi
        from .utils import get_default_dtype
        eps = float(np.sqrt(np.finfo(np.dtype(get_default_dtype())).tiny))
        s = 1.0 / (phis[0] + eps)
        for p in phis[1:]:
            s = s + 1.0 / (p + eps)
        return float(self.dim) / s

    def parameterize(self, output_tensor, *xs):
        if len(xs) != self.dim:
            raise ValueError(f"expected {self.dim} coordinates, got {len(xs)}")
        phi = self.mask_field(*xs)
        if self.power > 1:
            phi = phi ** self.power
        u = phi * output_tensor
        if self.boundary_fn is not None:
            u = self.boundary_fn(*xs) + u
        return u


class IBVP1D(BaseCondition):
    r"""An initial & boundary condition on a 1-D range :math:`x\in[x_0, x_1]`,
    time starting at :math:`t_0` (reference ``conditions.py:512-712``):

    - :math:`u(x, t_0) = u_0(x)`,
    - Dirichlet or Neumann condition at each of :math:`x_0` and :math:`x_1`.

    Exactly two of {x_min_val, x_min_prime, x_max_val, x_max_prime} must be
    given, at most one per endpoint. Neumann variants evaluate the network (and
    its x-derivative) at boundary anchors; this implementation pins the anchor
    with :func:`~neurodiffeq_tpu.fields.substitute` so the anchor derivative
    remains exact under further differentiation.
    """

    def __init__(self, x_min, x_max, t_min, t_min_val,
                 x_min_val=None, x_min_prime=None,
                 x_max_val=None, x_max_prime=None):
        super().__init__()
        n_conditions = sum(c is not None for c in [x_min_val, x_min_prime, x_max_val, x_max_prime])
        if n_conditions != 2 or (x_min_val and x_min_prime) or (x_max_val and x_max_prime):
            raise NotImplementedError('Sorry, this boundary condition is not implemented.')
        self.x_min, self.x_min_val, self.x_min_prime = x_min, x_min_val, x_min_prime
        self.x_max, self.x_max_val, self.x_max_prime = x_max, x_max_val, x_max_prime
        self.t_min, self.t_min_val = t_min, t_min_val

    def enforce(self, net, params, x, t):
        """Anchored terms: ``pin(uxt, x.index, c, k)`` is the k-th x-derivative
        of the raw network output evaluated at x=c — constant w.r.t. x, exactly
        like the reference's independent anchor tensors (conditions.py:576-598)."""
        uxt = _ann_field(net, params, (x, t), ith_unit=self.ith_unit)
        if self.x_min_val and self.x_max_val:
            return self.parameterize(uxt, x, t)
        elif self.x_min_val and self.x_max_prime:
            ux1t = pin(uxt, x.index, self.x_max)
            dux1t = pin(uxt, x.index, self.x_max, derivative_order=1)
            return self.parameterize(uxt, x, t, ux1t, dux1t)
        elif self.x_min_prime and self.x_max_val:
            ux0t = pin(uxt, x.index, self.x_min)
            dux0t = pin(uxt, x.index, self.x_min, derivative_order=1)
            return self.parameterize(uxt, x, t, ux0t, dux0t)
        elif self.x_min_prime and self.x_max_prime:
            ux0t = pin(uxt, x.index, self.x_min)
            dux0t = pin(uxt, x.index, self.x_min, derivative_order=1)
            ux1t = pin(uxt, x.index, self.x_max)
            dux1t = pin(uxt, x.index, self.x_max, derivative_order=1)
            return self.parameterize(uxt, x, t, ux0t, dux0t, ux1t, dux1t)
        else:
            raise NotImplementedError('Sorry, this boundary condition is not implemented.')

    def parameterize(self, u, x, t, *additional_tensors):
        t0 = _const_field(self.t_min, t)
        x_tilde = (x - self.x_min) / (self.x_max - self.x_min)
        t_tilde = t - self.t_min

        if self.x_min_val and self.x_max_val:
            return self._parameterize_dd(u, x, t, x_tilde, t_tilde, t0)
        elif self.x_min_val and self.x_max_prime:
            return self._parameterize_dn(u, x, t, x_tilde, t_tilde, t0, *additional_tensors)
        elif self.x_min_prime and self.x_max_val:
            return self._parameterize_nd(u, x, t, x_tilde, t_tilde, t0, *additional_tensors)
        elif self.x_min_prime and self.x_max_prime:
            return self._parameterize_nn(u, x, t, x_tilde, t_tilde, t0, *additional_tensors)
        else:
            raise NotImplementedError('Sorry, this boundary condition is not implemented.')

    # Dirichlet on both ends
    def _parameterize_dd(self, uxt, x, t, x_tilde, t_tilde, t0):
        Axt = (self.t_min_val(x)
               + x_tilde * (self.x_max_val(t) - self.x_max_val(t0))
               + (1 - x_tilde) * (self.x_min_val(t) - self.x_min_val(t0)))
        return Axt + x_tilde * (1 - x_tilde) * (1 - exp(-t_tilde)) * uxt

    # Dirichlet left, Neumann right (dux1t = d(ANN)/dx pinned at x_max)
    def _parameterize_dn(self, uxt, x, t, x_tilde, t_tilde, t0, ux1t, dux1t):
        Axt = ((self.x_min_val(t) - self.x_min_val(t0)) + self.t_min_val(x)
               + x_tilde * (self.x_max - self.x_min) * (self.x_max_prime(t) - self.x_max_prime(t0)))
        return Axt + x_tilde * (1 - exp(-t_tilde)) * (
            uxt - (self.x_max - self.x_min) * dux1t - ux1t
        )

    # Neumann left, Dirichlet right
    def _parameterize_nd(self, uxt, x, t, x_tilde, t_tilde, t0, ux0t, dux0t):
        Axt = ((self.x_max_val(t) - self.x_max_val(t0)) + self.t_min_val(x)
               + (x_tilde - 1) * (self.x_max - self.x_min) * (self.x_min_prime(t) - self.x_min_prime(t0)))
        return Axt + (1 - x_tilde) * (1 - exp(-t_tilde)) * (
            uxt + (self.x_max - self.x_min) * dux0t - ux0t
        )

    # Neumann on both ends
    def _parameterize_nn(self, uxt, x, t, x_tilde, t_tilde, t0, ux0t, dux0t, ux1t, dux1t):
        Axt = (self.t_min_val(x)
               - 0.5 * (1 - x_tilde) ** 2 * (self.x_max - self.x_min) * (
                   self.x_min_prime(t) - self.x_min_prime(t0))
               + 0.5 * x_tilde ** 2 * (self.x_max - self.x_min) * (
                   self.x_max_prime(t) - self.x_max_prime(t0)))
        return Axt + (1 - exp(-t_tilde)) * (
            uxt
            - x_tilde * (self.x_max - self.x_min) * dux0t
            + 0.5 * x_tilde ** 2 * (self.x_max - self.x_min) * (dux0t - dux1t)
        )


class DoubleEndedBVP1D(BaseCondition):
    r"""Boundary conditions on a 1-D space-only range :math:`x\in[x_0, x_1]`
    with Dirichlet or Neumann conditions at each end
    (reference ``conditions.py:715-883``). Boundary *values* here are floats
    (not callables).
    """

    def __init__(self, x_min, x_max,
                 x_min_val=None, x_min_prime=None,
                 x_max_val=None, x_max_prime=None):
        super().__init__()
        n_conditions = sum(c is not None for c in [x_min_val, x_min_prime, x_max_val, x_max_prime])
        if n_conditions != 2 or (x_min_val and x_min_prime) or (x_max_val and x_max_prime):
            raise NotImplementedError('Sorry, this boundary condition is not implemented.')
        self.x_min, self.x_min_val, self.x_min_prime = x_min, x_min_val, x_min_prime
        self.x_max, self.x_max_val, self.x_max_prime = x_max, x_max_val, x_max_prime

    def enforce(self, net, params, x):
        ux = _ann_field(net, params, (x,), ith_unit=self.ith_unit)
        if self.x_min_val is not None and self.x_max_val is not None:
            return self.parameterize(ux, x)
        elif self.x_min_val is not None and self.x_max_prime is not None:
            ux1 = pin(ux, x.index, self.x_max)
            dux1 = pin(ux, x.index, self.x_max, derivative_order=1)
            return self.parameterize(ux, x, ux1, dux1)
        elif self.x_min_prime is not None and self.x_max_val is not None:
            ux0 = pin(ux, x.index, self.x_min)
            dux0 = pin(ux, x.index, self.x_min, derivative_order=1)
            return self.parameterize(ux, x, ux0, dux0)
        elif self.x_min_prime is not None and self.x_max_prime is not None:
            ux0 = pin(ux, x.index, self.x_min)
            dux0 = pin(ux, x.index, self.x_min, derivative_order=1)
            ux1 = pin(ux, x.index, self.x_max)
            dux1 = pin(ux, x.index, self.x_max, derivative_order=1)
            return self.parameterize(ux, x, ux0, dux0, ux1, dux1)
        else:
            raise NotImplementedError('Sorry, this boundary condition is not implemented.')

    def parameterize(self, u, x, *additional_tensors):
        x_tilde = (x - self.x_min) / (self.x_max - self.x_min)
        if self.x_min_val is not None and self.x_max_val is not None:
            return self._parameterize_dd(u, x, x_tilde)
        elif self.x_min_val is not None and self.x_max_prime is not None:
            return self._parameterize_dn(u, x, x_tilde, *additional_tensors)
        elif self.x_min_prime is not None and self.x_max_val is not None:
            return self._parameterize_nd(u, x, x_tilde, *additional_tensors)
        elif self.x_min_prime is not None and self.x_max_prime is not None:
            return self._parameterize_nn(u, x, x_tilde, *additional_tensors)
        else:
            raise NotImplementedError('Sorry, this boundary condition is not implemented.')

    def _parameterize_dd(self, ux, x, x_tilde):
        Ax = self.x_min_val * (1 - x_tilde) + self.x_max_val * x_tilde
        return Ax + x_tilde * (1 - x_tilde) * ux

    def _parameterize_dn(self, ux, x, x_tilde, ux1, dux1):
        Ax = (1 - x_tilde) * self.x_min_val + 0.5 * x_tilde ** 2 * self.x_max_prime * (self.x_max - self.x_min)
        return Ax + x_tilde * (ux - ux1 + self.x_min_val - dux1 * (self.x_max - self.x_min))

    def _parameterize_nd(self, ux, x, x_tilde, ux0, dux0):
        Ax = x_tilde * self.x_max_val - 0.5 * (1 - x_tilde) ** 2 * self.x_min_prime * (self.x_max - self.x_min)
        return Ax + (1 - x_tilde) * (ux - ux0 + self.x_max_val + dux0 * (self.x_max - self.x_min))

    def _parameterize_nn(self, ux, x, x_tilde, ux0, dux0, ux1, dux1):
        Ax = (-0.5 * (1 - x_tilde) ** 2 * (self.x_max - self.x_min) * self.x_min_prime
              + 0.5 * x_tilde ** 2 * (self.x_max - self.x_min) * self.x_max_prime)
        return (Ax
                + 0.5 * x_tilde ** 2 * (ux - ux1 - 0.5 * dux1 * (self.x_max - self.x_min))
                + 0.5 * (1 - x_tilde) ** 2 * (ux - ux0 + 0.5 * dux0 * (self.x_max - self.x_min)))


class DirichletBVPSpherical(BaseCondition):
    r"""Dirichlet conditions on interior/exterior spherical boundaries
    (reference ``conditions.py:887-956``):

    - :math:`u(r_0,\theta,\phi)=f(\theta,\phi)` (and optionally
      :math:`u(r_1,\theta,\phi)=g(\theta,\phi)`).
    """

    def __init__(self, r_0, f, r_1=None, g=None):
        super().__init__()
        if (r_1 is None) ^ (g is None):
            raise ValueError(f'r_1 and g must be both/neither set to None; got r_1={r_1}, g={g}')
        self.r_0, self.r_1 = r_0, r_1
        self.f, self.g = f, g

    def parameterize(self, output_tensor, r, theta, phi):
        if self.r_1 is None:
            return (1 - exp(-fabs(r - self.r_0))) * output_tensor + self.f(theta, phi)
        r_tilde = (r - self.r_0) / (self.r_1 - self.r_0)
        return (self.f(theta, phi) * (1 - r_tilde)
                + self.g(theta, phi) * r_tilde
                + (1. - exp((1 - r_tilde) * r_tilde)) * output_tensor)


class InfDirichletBVPSpherical(BaseCondition):
    r"""Like :class:`DirichletBVPSpherical` but with :math:`r_1\to+\infty`
    (reference ``conditions.py:960-1019``): exponential decay toward the
    interior value, ``tanh`` saturation toward the value at infinity.

    :param order: smallest k such that u decays like :math:`e^{-kr}`.
    """

    def __init__(self, r_0, f, g, order=1):
        super().__init__()
        self.r_0 = r_0
        self.f = f
        self.g = g
        self.order = order

    def parameterize(self, output_tensor, r, theta, phi):
        dr = r - self.r_0
        return (self.f(theta, phi) * exp(-self.order * dr)
                + self.g(theta, phi) * tanh(dr)
                + exp(-self.order * dr) * tanh(dr) * output_tensor)


class DirichletBVPSphericalBasis(BaseCondition):
    r"""Dirichlet condition on the vector of harmonic coefficients
    :math:`\mathbf{R}(r)` of a radial-only network
    (reference ``conditions.py:1023-1096``):
    :math:`\mathbf{R}(r_0)=\mathbf{R}_0` (and optionally
    :math:`\mathbf{R}(r_1)=\mathbf{R}_1`).
    """

    def __init__(self, r_0, R_0, r_1=None, R_1=None, max_degree=None):
        super().__init__()
        if max_degree is not None:
            warnings.warn("`max_degree` is deprecated and ignored", FutureWarning)
        if (r_1 is None) ^ (R_1 is None):
            raise ValueError(f'r_1 and R_1 must be both/neither set to None; got r_1={r_1}, R_1={R_1}')
        self.r_0, self.r_1 = r_0, r_1
        self.R_0 = jnp.asarray(R_0) if R_0 is not None else None
        self.R_1 = jnp.asarray(R_1) if R_1 is not None else None

    def parameterize(self, output_tensor, r):
        if self.r_1 is None:
            return (1 - exp(-r + self.r_0)) * output_tensor + self.R_0
        r_tilde = (r - self.r_0) / (self.r_1 - self.r_0)
        return (self.R_0 * (1 - r_tilde) + self.R_1 * r_tilde
                + (1. - exp((1 - r_tilde) * r_tilde)) * output_tensor)


class InfDirichletBVPSphericalBasis(BaseCondition):
    r"""Like :class:`DirichletBVPSphericalBasis` with the outer boundary at
    infinity (reference ``conditions.py:1100-1166``)."""

    def __init__(self, r_0, R_0, R_inf, order=1, max_degree=None):
        super().__init__()
        if max_degree is not None:
            warnings.warn("`max_degree` is deprecated and ignored", FutureWarning)
        self.r_0 = r_0
        self.R_0 = jnp.asarray(R_0)
        self.R_inf = jnp.asarray(R_inf)
        self.order = order

    def parameterize(self, output_tensor, r):
        dr = r - self.r_0
        return (self.R_0 * exp(-self.order * dr)
                + self.R_inf * tanh(dr)
                + exp(-self.order * dr) * tanh(dr) * output_tensor)
