r"""Legacy functional API (v1) for 2-D PDEs + the irregular-domain BC toolkit.

Capability parity with the reference's ``neurodiffeq/pde.py``:
``solve2D``/``solve2D_system`` deprecated wrappers around
:class:`~neurodiffeq_tpu.solvers.Solver2D` (``pde.py:55-338``),
``make_animation`` (``pde.py:341-375``), and MacFall's thin-plate-spline
method for arbitrary 2-D boundaries (``Point``, ``DirichletControlPoint``,
``NeumannControlPoint``, ``CustomBoundaryCondition``, interpolators —
``pde.py:378-789``). TPS coefficients are fitted host-side with numpy; the
interpolators evaluate through Field-aware math so boundary enforcement stays
differentiable to arbitrary order.
"""
import warnings

import numpy as np
import matplotlib.pyplot as plt
import matplotlib.animation as animation

from .networks import FCNN, Tanh
from .fields import diff
from . import fields as F
from .generators import Generator2D, PredefinedGenerator
from ._version_utils import warn_deprecate_class
from .conditions import IrregularBoundaryCondition, _ann_field
from .conditions import NoCondition, DirichletBVP2D, IBVP1D  # noqa: F401 (re-exported for parity)
from .monitors import Monitor2D
from .solvers import Solution2D
from .solvers import Solver2D

ExampleGenerator2D = warn_deprecate_class(Generator2D)
PredefinedExampleGenerator2D = warn_deprecate_class(PredefinedGenerator)
Solution = warn_deprecate_class(Solution2D)


def solve2D(
        pde, condition, xy_min=None, xy_max=None,
        net=None, train_generator=None, valid_generator=None, optimizer=None,
        criterion=None, n_batches_train=1, n_batches_valid=4,
        additional_loss_term=None, metrics=None, max_epochs=1000,
        monitor=None, return_internal=False, return_best=False, batch_size=None, shuffle=None,
):
    r"""**[DEPRECATED]** Train a neural network to solve a 2-input PDE
    (use :class:`~neurodiffeq_tpu.solvers.Solver2D` instead).

    :return: ``(solution, metrics_history[, internals])``.
    """
    nets = None if not net else [net]
    return solve2D_system(
        pde_system=lambda u, x, y: [pde(u, x, y)], conditions=[condition],
        xy_min=xy_min, xy_max=xy_max, nets=nets,
        train_generator=train_generator, shuffle=shuffle, valid_generator=valid_generator,
        optimizer=optimizer, criterion=criterion, n_batches_train=n_batches_train,
        n_batches_valid=n_batches_valid,
        additional_loss_term=additional_loss_term, metrics=metrics, batch_size=batch_size,
        max_epochs=max_epochs, monitor=monitor, return_internal=return_internal,
        return_best=return_best,
    )


def solve2D_system(
        pde_system, conditions, xy_min=None, xy_max=None,
        single_net=None, nets=None, train_generator=None, valid_generator=None,
        optimizer=None, criterion=None, n_batches_train=1, n_batches_valid=4,
        additional_loss_term=None, metrics=None, max_epochs=1000,
        monitor=None, return_internal=False, return_best=False, batch_size=None, shuffle=None,
):
    r"""**[DEPRECATED]** Train a neural network to solve a system of 2-input PDEs
    (use :class:`~neurodiffeq_tpu.solvers.Solver2D` instead).

    :return: ``(solution, metrics_history[, internals])``.
    """
    warnings.warn(
        "The `solve2D_system` function is deprecated, use a `neurodiffeq_tpu.solvers.Solver2D` instance instead",
        FutureWarning,
    )
    if single_net and nets:
        raise ValueError('Only one of net and nets should be specified')

    if (not single_net) and (not nets):
        single_net = FCNN(
            n_input_units=2,
            n_output_units=len(conditions),
            hidden_units=(32, 32),
            actv=Tanh,
        )

    if single_net:
        for ith, con in enumerate(conditions):
            con.set_impose_on(ith)
        nets = [single_net] * len(conditions)

    if additional_loss_term:
        class CustomSolver2D(Solver2D):
            def additional_loss(self, residual, funcs, coords):
                return additional_loss_term(*funcs, *coords)
    else:
        class CustomSolver2D(Solver2D):
            pass

    solver = CustomSolver2D(
        pde_system=pde_system,
        conditions=conditions,
        xy_min=xy_min,
        xy_max=xy_max,
        nets=nets,
        train_generator=train_generator,
        valid_generator=valid_generator,
        optimizer=optimizer,
        loss_fn=criterion,
        n_batches_train=n_batches_train,
        n_batches_valid=n_batches_valid,
        metrics=metrics,
        batch_size=batch_size,
        shuffle=shuffle,
    )

    solver.fit(max_epochs=max_epochs, monitor=monitor)
    solution = solver.get_solution(copy=True, best=return_best)
    ret = (solution, solver.metrics_history)
    if return_internal:
        param_names = ['nets', 'conditions', 'train_generator', 'valid_generator', 'optimizer', 'criterion']
        internals = solver.get_internals(param_names, return_type="dict")
        ret = ret + (internals,)
    return ret


def make_animation(solution, xs, ts):
    r"""Create an animation of a 1-D time-dependent solution
    (reference ``pde.py:341-375``).

    :param solution: Solution function returned by ``solve2D``.
    :param xs: locations to evaluate the solution.
    :param ts: time points to evaluate the solution.
    :rtype: ``matplotlib.animation.FuncAnimation``
    """
    xx, tt = np.meshgrid(xs, ts)
    sol_net = solution(xx, tt, to_numpy=True)

    def u_gen():
        for net in sol_net:
            yield net

    fig, ax = plt.subplots()
    line, = ax.plot([], [], lw=2)

    umin, umax = sol_net.min(), sol_net.max()
    scale = umax - umin
    ax.set_ylim(umin - scale * 0.1, umax + scale * 0.1)
    ax.set_xlim(xs.min(), xs.max())

    def run(data):
        line.set_data(xs, data)
        return line,

    return animation.FuncAnimation(
        fig, run, u_gen, blit=True, interval=50, repeat=False
    )


# ======================= arbitrary boundary conditions =======================

# values below ROUND_TO_ZERO are considered zero
ROUND_TO_ZERO = 1e-7
K = 5.0
ALPHA = 5.0


class Point:
    r"""A 2-D point.

    :param loc: location as ``(x, y)``.
    """

    def __repr__(self):
        return f'Point({self.loc})'

    def __init__(self, loc):
        self.loc = tuple(float(d) for d in loc)
        self.dim = len(loc)


class DirichletControlPoint(Point):
    r"""A 2-D point on the Dirichlet boundary.

    :param loc: location as ``(x, y)``.
    :param val: expected value of u at this location.
    """

    def __repr__(self):
        return f'DirichletControlPoint({self.loc}, val={self.val})'

    def __init__(self, loc, val):
        super().__init__(loc)
        self.val = float(val)


class NeumannControlPoint(Point):
    r"""A 2-D point on the Neumann boundary (normal-derivative constraint).

    :param loc: location as ``(x, y)``.
    :param val: expected normal derivative of u at this location.
    :param normal_vector: outward normal at this location (normalized here).
    """

    def __repr__(self):
        return (f'NeumannControlPoint({self.loc}, val={self.val}, '
                f'normal_vector={self.normal_vector})')

    def __init__(self, loc, val, normal_vector):
        super().__init__(loc)
        self.val = float(val)
        scale = sum(d ** 2 for d in normal_vector) ** 0.5
        self.normal_vector = tuple(d / scale for d in normal_vector)


class CustomBoundaryCondition(IrregularBoundaryCondition):
    r"""A boundary condition on an irregularly-shaped 2-D domain, implementing
    MacFall's length-factor thin-plate-spline method
    (reference ``pde.py:442-596``): the enforced solution is
    ``A_D + A_M + L_D * ANN`` where A_D interpolates Dirichlet values, L_D is a
    length factor vanishing on the boundary (built by TPS-mapping the boundary
    onto a circle), and A_M handles Neumann terms.

    :param center_point: a point roughly at the domain center (used to sort
        control points clockwise).
    :param dirichlet_control_points: points on the Dirichlet boundary.
    :param neumann_control_points: points on the Neumann boundary (optional).
    """

    def __init__(self, center_point, dirichlet_control_points, neumann_control_points=None):
        super().__init__()

        self.dirichlet_control_points = self._clean_control_points(dirichlet_control_points, center_point)
        # A_D(x) in MacFall's paper
        self.a_d_interp = InterpolatorCreator.fit_surface(self.dirichlet_control_points)
        # L_D(x) in MacFall's paper
        self.l_d_interp = InterpolatorCreator.fit_length_factor(self.dirichlet_control_points)

        if neumann_control_points is None:
            neumann_control_points = []
        if len(neumann_control_points) > 0:
            self.neumann_control_points = self._clean_control_points(neumann_control_points, center_point)
            self.g_interp = InterpolatorCreator.fit_surface(self.neumann_control_points)
            self.l_m_interp = InterpolatorCreator.fit_length_factor(self.neumann_control_points)
            self.n_hat_interp = InterpolatorCreator.fit_normal_vector(self.neumann_control_points)
        else:
            self.neumann_control_points = None
            self.g_interp = None
            self.l_m_interp = None
            self.n_hat_interp = None

    def a_d(self, *dimensions):
        return self.a_d_interp.interpolate(dimensions)

    def l_d(self, *dimensions):
        return self.l_d_interp.interpolate(dimensions)

    def g(self, *dimensions):
        return self.g_interp.interpolate(dimensions)

    def l_m(self, *dimensions):
        return self.l_m_interp.interpolate(dimensions)

    def f(self, net, params, *dimensions):
        # F(x) in MacFall's paper: L_D * ANN
        ann = _ann_field(net, params, dimensions, ith_unit=self.ith_unit)
        return self.l_d(*dimensions) * ann

    def n_hat(self, *dimensions):
        return self.n_hat_interp.interpolate(dimensions)

    def a_m(self, net, params, *dimensions):
        # A_M(x) in MacFall's paper (Neumann term)
        if self.neumann_control_points is None:
            return 0.0

        fs = self.f(net, params, *dimensions)
        a_ds = self.a_d(*dimensions)
        l_ds = self.l_d(*dimensions)
        l_ms = self.l_m(*dimensions)
        n_hats = self.n_hat(*dimensions)

        numer = self.g(*dimensions) - sum(
            nk * (diff(a_ds, d) + diff(fs, d))
            for nk, d in zip(n_hats, dimensions)
        )
        denom = l_ds * sum(
            nk * diff(l_ms, d)
            for nk, d in zip(n_hats, dimensions)
        ) + K * (1 - F.exp(-ALPHA * l_ms))

        return l_ds * l_ms * numer / denom

    def in_domain(self, *dimensions):
        """Mask for monitors: positive length factor(s) == inside the domain."""
        ld = self.l_d_interp.interpolate_np(dimensions)
        if self.neumann_control_points is None:
            return ld > 0.0
        lm = self.l_m_interp.interpolate_np(dimensions)
        return (ld > 0.0) & (lm > 0.0)

    def enforce(self, net, params, *dimensions):
        # equation [10] in MacFall's paper
        return self.a_d(*dimensions) + self.a_m(net, params, *dimensions) + self.f(net, params, *dimensions)

    @staticmethod
    def _clean_control_points(control_points, center_point):
        """Drop near-duplicate control points and sort them clockwise around
        ``center_point`` (so they map to ordered points on a circle)."""

        def gt_zero(number):
            return number >= ROUND_TO_ZERO

        def lt_zero(number):
            return number <= -ROUND_TO_ZERO

        def eq_zero(number):
            return abs(number) < ROUND_TO_ZERO

        def clockwise(cp):
            px, py = cp.loc
            cx, cy = center_point.loc
            dx, dy = px - cx, py - cy
            if gt_zero(dx) and eq_zero(dy):
                tier = 0
            elif gt_zero(dx) and lt_zero(dy):
                tier = 1
            elif eq_zero(dx) and lt_zero(dy):
                tier = 2
            elif lt_zero(dx) and lt_zero(dy):
                tier = 3
            elif lt_zero(dx) and eq_zero(dy):
                tier = 4
            elif lt_zero(dx) and gt_zero(dy):
                tier = 5
            elif eq_zero(dx) and gt_zero(dy):
                tier = 6
            elif gt_zero(dx) and gt_zero(dy):
                tier = 7
            return (tier, dx / dy if not eq_zero(dy) else 0)

        control_points.sort(key=clockwise)

        def same_point(p1, p2):
            return eq_zero(p1.loc[0] - p2.loc[0]) and eq_zero(p1.loc[1] - p2.loc[1])

        unique_control_points = [control_points[0]]
        for cp in control_points[1:]:
            if not same_point(cp, unique_control_points[-1]):
                unique_control_points.append(cp)
        return unique_control_points


class InterpolatorCreator:
    """Factory fitting thin-plate-spline interpolators (host-side numpy solve
    of the (M + dim + 1)^2 system; reference ``pde.py:649-694``)."""

    @staticmethod
    def fit_surface(dirichlet_or_neumann_control_points):
        from_points = dirichlet_or_neumann_control_points
        to_values = [dncp.val for dncp in dirichlet_or_neumann_control_points]
        coefs = InterpolatorCreator._solve_thin_plate_spline(from_points, to_values)
        return SurfaceInterpolator(coefs, dirichlet_or_neumann_control_points)

    @staticmethod
    def fit_length_factor(control_points, radius=0.5):
        from_points = control_points
        to_points = InterpolatorCreator._create_circular_targets(control_points, radius)
        n_dim = to_points[0].dim
        to_values_each_dim = [[tp.loc[i] for tp in to_points] for i in range(n_dim)]
        coefs_each_dim = [
            InterpolatorCreator._solve_thin_plate_spline(from_points, to_values)
            for to_values in to_values_each_dim
        ]
        return LengthFactorInterpolator(coefs_each_dim, control_points, radius)

    @staticmethod
    def fit_normal_vector(neumann_control_points):
        from_points = neumann_control_points
        to_points = [
            Point(loc=(ncp.normal_vector[0], ncp.normal_vector[1]))
            for ncp in neumann_control_points
        ]
        n_dim = to_points[0].dim
        to_values_each_dim = [[tp.loc[i] for tp in to_points] for i in range(n_dim)]
        coefs_each_dim = [
            InterpolatorCreator._solve_thin_plate_spline(from_points, to_values)
            for to_values in to_values_each_dim
        ]
        return NormalVectorInterpolator(coefs_each_dim, neumann_control_points)

    @staticmethod
    def _solve_thin_plate_spline(from_points, to_values):
        assert len(from_points) == len(to_values)
        n_dims = from_points[0].dim
        n_pnts = len(from_points)
        n_eqs = n_dims + n_pnts + 1

        def equation_weights(eq_no):
            weights = np.zeros(n_eqs)
            if eq_no < n_pnts:
                p = from_points[eq_no]
                for i, fp in enumerate(from_points):
                    ri_sq = Interpolator._ri_sq_thin_plate_spline_pretrain(p, fp)
                    weights[i] = ri_sq * np.log(ri_sq)
                weights[n_pnts] = 1.0
                for j in range(n_dims):
                    weights[n_pnts + 1 + j] = p.loc[j]
            elif eq_no < n_pnts + n_dims:
                j = eq_no - n_pnts
                for i in range(n_pnts):
                    weights[i] = from_points[i].loc[j]
            elif eq_no == n_pnts + n_dims:
                weights[:n_pnts] = 1.0
            else:
                raise ValueError(f'Invalid equation number: {eq_no}')
            return weights

        W = np.zeros((n_eqs, n_eqs))
        for eq_no in range(n_eqs):
            W[eq_no] = equation_weights(eq_no)
        b = np.zeros(n_eqs)
        b[:n_pnts] = to_values
        return np.linalg.solve(W, b)

    @staticmethod
    def _create_circular_targets(control_points, radius):
        return [
            Point((radius * np.cos(theta), radius * np.sin(theta)))
            for theta in -np.linspace(0, 2 * np.pi, len(control_points), endpoint=False)
        ]


class Interpolator:
    """Thin-plate-spline evaluation; Field-aware (``interpolate``) for the
    differentiated training path, numpy (``interpolate_np``) for monitor masks.

    The Field path evaluates the whole M-point TPS basis as ONE vectorized
    per-sample computation (distances to an (M, 2) constant, a log, two dot
    products) rather than a Python loop over control points — this keeps the
    traced XLA graph O(1) in the number of control points, which matters
    because the enforced solution (and its second derivatives) differentiate
    through the spline."""

    def interpolate(self, dimensions):
        raise NotImplementedError  # pragma: no cover

    @staticmethod
    def _interpolate_by_thin_plate_spline(coefs, control_points, dimensions, stiffness=0.01):
        from .fields import Field, composite
        import jax.numpy as jnp

        fields = [d for d in dimensions if isinstance(d, Field)]
        if not fields:
            return Interpolator._interpolate_np(coefs, control_points, dimensions)

        n_pnts = len(control_points)
        cp_locs = np.asarray([cp.loc for cp in control_points])          # (M, d)
        w_basis = np.asarray(coefs[:n_pnts])                             # (M,)
        w_const = float(coefs[n_pnts])
        w_linear = np.asarray(coefs[n_pnts + 1:])                        # (d,)

        def tps(*vals):
            # shape-polymorphic: per-sample scalars or (N, 1) columns
            pt = jnp.stack([jnp.reshape(v, (-1,) if jnp.ndim(v) else ()) for v in vals], axis=-1)
            diff2 = (pt[..., None, :] - cp_locs) ** 2                    # (..., M, d)
            r2 = diff2.sum(axis=-1) + stiffness ** 2                     # (..., M)
            out = (w_basis * (r2 * jnp.log(r2))).sum(axis=-1) + w_const + (pt * w_linear).sum(axis=-1)
            return out[..., None] if out.ndim else out

        # `composite` gives the interpolant a Taylor rule (one fused expression),
        # so irregular-boundary enforcement joins the hot evaluation path
        return composite(tps, *dimensions)

    @staticmethod
    def _interpolate_np(coefs, control_points, dimensions):
        n_pnts = len(control_points)
        dims = [np.asarray(d, dtype=np.float64) for d in dimensions]
        to_value = np.zeros_like(dims[0])
        for coef, cp in zip(coefs, control_points):
            ri_sq = sum((d - di) ** 2 for di, d in zip(cp.loc, dims)) + 0.01 ** 2
            to_value = to_value + coef * ri_sq * np.log(ri_sq)
        to_value = to_value + coefs[n_pnts]
        for j, d in enumerate(dims):
            to_value = to_value + coefs[n_pnts + 1 + j] * d
        return to_value

    @staticmethod
    def _ri_sq_thin_plate_spline_pretrain(point_i, point_j, stiffness=0.01):
        return sum((di - dj) ** 2 for di, dj in zip(point_i.loc, point_j.loc)) + stiffness ** 2

    @staticmethod
    def _ri_sq_thin_plate_spline_trainval(point_i, dimensions, stiffness=0.01):
        return sum((d - di) ** 2 for di, d in zip(point_i.loc, dimensions)) + stiffness ** 2


class SurfaceInterpolator(Interpolator):
    """Interpolates (x, y) -> A_D(x, y)."""

    def __init__(self, coefs, control_points):
        self.coefs = coefs
        self.control_points = control_points

    def interpolate(self, dimensions):
        return Interpolator._interpolate_by_thin_plate_spline(
            self.coefs, self.control_points, dimensions
        )

    def interpolate_np(self, dimensions):
        return Interpolator._interpolate_np(self.coefs, self.control_points, dimensions)


class LengthFactorInterpolator(Interpolator):
    """Interpolates (x, y) -> L_D(x, y) = radius^2 - |TPS-mapped point|^2."""

    def __init__(self, coefs_each_dim, control_points, radius):
        self.coefs_each_dim = coefs_each_dim
        self.control_points = control_points
        self.radius = radius

    def interpolate(self, dimensions):
        dimensions_mapped = tuple(
            Interpolator._interpolate_by_thin_plate_spline(
                coefs_dim, self.control_points, dimensions
            )
            for coefs_dim in self.coefs_each_dim
        )
        return self.radius ** 2 - sum(d ** 2 for d in dimensions_mapped)

    def interpolate_np(self, dimensions):
        dimensions_mapped = tuple(
            Interpolator._interpolate_np(coefs_dim, self.control_points, dimensions)
            for coefs_dim in self.coefs_each_dim
        )
        return self.radius ** 2 - sum(d ** 2 for d in dimensions_mapped)


class NormalVectorInterpolator(Interpolator):
    """Interpolates (x, y) -> n_hat(x, y) on the Neumann boundary."""

    def __init__(self, coefs_each_dim, neumann_control_points):
        self.coefs_each_dim = coefs_each_dim
        self.neumann_control_points = neumann_control_points

    def interpolate(self, dimensions):
        dimensions_mapped = tuple(
            Interpolator._interpolate_by_thin_plate_spline(
                coefs_dim, self.neumann_control_points, dimensions
            )
            for coefs_dim in self.coefs_each_dim
        )
        return dimensions_mapped

    def interpolate_np(self, dimensions):
        return tuple(
            Interpolator._interpolate_np(coefs_dim, self.neumann_control_points, dimensions)
            for coefs_dim in self.coefs_each_dim
        )
