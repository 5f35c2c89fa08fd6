r"""The alternate "temporal" subsystem: penalty-based boundary conditions.

Capability parity with the reference's ``neurodiffeq/temporal.py`` (Approximator
ABC + the four SingleNetworkApproximator variants, penalty boundary conditions,
python-generator samplers, four monitors, and the mini-batched training
routines — ``temporal.py:25-1084``). Unlike the main solver stack, boundary
conditions here are *soft* (squared-residual penalty terms in the loss,
``temporal.py:87-96``) and initial conditions are enforced by an
``exp(-t)``-blend transform of the network output (``temporal.py:76``).

Adaptation to JAX: losses are pure functions of the parameters; each
mini-batch step is a jitted value_and_grad + optax update (one compile per
distinct batch shape). Sampling stays host-side python generators for exact
API parity.

Conventions follow the reference: ``u`` before ``x``, ``x`` before ``t``;
``xx``/``tt`` are paired (cartesian-product) coordinates while ``x``/``t`` are
the underlying axes.
"""
from abc import ABC, abstractmethod

import numpy as np
import jax
import jax.numpy as jnp
import optax
import matplotlib
import matplotlib.cm as cm
import matplotlib.pyplot as plt
import matplotlib.tri as tri

from . import fields as F
from .utils import get_default_dtype

__all__ = [
    'Approximator',
    'SingleNetworkApproximator1DSpatialTemporal', 'SingleNetworkApproximator2DSpatial',
    'SingleNetworkApproximator2DSpatialSystem', 'SingleNetworkApproximator2DSpatialTemporal',
    'FirstOrderInitialCondition', 'SecondOrderInitialCondition', 'BoundaryCondition',
    'generator_1dspatial', 'generator_2dspatial_segment', 'generator_2dspatial_rectangle',
    'generator_temporal',
    'MonitorMinimal', 'Monitor1DSpatialTemporal', 'Monitor2DSpatialTemporal', 'Monitor2DSpatial',
    '_solve_1dspatial_temporal', '_solve_2dspatial_temporal', '_solve_2dspatial',
]


def _cartesian_prod_dims(x, t):
    """Return the cartesian product of x and t as two paired 1-D arrays."""
    x = jnp.asarray(x)
    t = jnp.asarray(t)
    xx = jnp.repeat(x, t.shape[0])
    tt = jnp.tile(t, x.shape[0])
    return xx, tt


def _field_expr(fn_of_scalars, *coord_arrays):
    """Build a Field for a per-sample expression over paired coordinate arrays."""
    coords = F.coordinates(*coord_arrays)
    return fn_of_scalars(coords), coords


class Approximator(ABC):
    r"""Base class of approximators: knows its parameters and how to compute
    the loss and metrics (reference ``temporal.py:25-44``)."""

    @abstractmethod
    def __call__(self):
        raise NotImplementedError  # pragma: no cover

    @abstractmethod
    def parameters(self):
        raise NotImplementedError  # pragma: no cover

    @abstractmethod
    def calculate_loss(self):
        raise NotImplementedError  # pragma: no cover

    @abstractmethod
    def calculate_metrics(self):
        raise NotImplementedError  # pragma: no cover


class _SingleNetworkApproximatorBase(Approximator):
    """Shared plumbing: owns (net, params) and jit caches."""

    def __init__(self, single_network, params=None, key=None):
        from .utils import next_rng_key
        self.single_network = single_network
        self.params = params if params is not None else single_network.init(key or next_rng_key())
        self._jit_cache = {}

    def parameters(self):
        return self.params

    def set_parameters(self, params):
        self.params = params


class SingleNetworkApproximator1DSpatialTemporal(_SingleNetworkApproximatorBase):
    r"""Approximates the solution of a 1-D time-dependent problem
    (reference ``temporal.py:46-104``): the initial condition is enforced by
    the transform :math:`u = e^{-t} u_0(x) + (1 - e^{-t})\,\mathrm{ANN}(x, t)`;
    boundary conditions are penalty terms.

    :param single_network: network with 2 inputs (x, t) and 1 output.
    :param pde: maps ``(u, x, t)`` to the residual F(u, x, t).
    :param initial_condition: a :class:`FirstOrderInitialCondition` whose
        ``u0`` is written with Field-aware math.
    :param boundary_conditions: list of :class:`BoundaryCondition`.
    :param boundary_strictness: penalty weight, defaults to 1.
    """

    def __init__(self, single_network, pde, initial_condition, boundary_conditions, boundary_strictness=1.):
        super().__init__(single_network)
        self.pde = pde
        self.initial_condition = initial_condition
        self.boundary_conditions = boundary_conditions
        self.boundary_strictness = boundary_strictness

    def _u_field(self, params, coords):
        xf, tf = coords
        ann = F.network_field(lambda xs: self.single_network.apply(params, xs), coords)
        return F.exp(-tf) * self.initial_condition.u0(xf) + (1 - F.exp(-tf)) * ann

    def __call__(self, xx, tt):
        coords = F.coordinates(xx, tt)
        return np.asarray(self._u_field(self.params, coords).value).flatten()

    def _loss(self, params, xx, tt, boundary_samples):
        coords = F.coordinates(xx, tt)
        uu = self._u_field(params, coords)
        residual = self.pde(uu, *coords)
        equation_mse = (residual.value ** 2).mean()

        boundary_mse = 0.0
        for bc, (bxx, btt) in zip(self.boundary_conditions, boundary_samples):
            bcoords = F.coordinates(bxx, btt)
            buu = self._u_field(params, bcoords)
            boundary_mse = boundary_mse + (bc.form(buu, *bcoords).value ** 2).mean()
        return equation_mse + self.boundary_strictness * boundary_mse

    def _boundary_samples(self, t):
        samples = []
        for bc in self.boundary_conditions:
            x = next(bc.points_generator)
            samples.append(_cartesian_prod_dims(x, t))
        return tuple(samples)

    def calculate_loss(self, xx, tt, x, t, params=None):
        params = self.params if params is None else params
        return self._loss(params, jnp.asarray(xx), jnp.asarray(tt), self._boundary_samples(jnp.asarray(t)))

    def calculate_metrics(self, xx, tt, x, t, metrics):
        uu = self.__call__(xx, tt)
        return {
            metric_name: metric_func(uu, np.asarray(xx), np.asarray(tt))
            for metric_name, metric_func in metrics.items()
        }


class SingleNetworkApproximator2DSpatial(_SingleNetworkApproximatorBase):
    r"""Approximates the solution of a 2-D steady-state problem with penalty
    boundary conditions (reference ``temporal.py:107-158``)."""

    def __init__(self, single_network, pde, boundary_conditions, boundary_strictness=1.):
        super().__init__(single_network)
        self.pde = pde
        self.boundary_conditions = boundary_conditions
        self.boundary_strictness = boundary_strictness

    def _u_field(self, params, coords):
        return F.network_field(lambda xs: self.single_network.apply(params, xs), coords)

    def __call__(self, xx, yy):
        coords = F.coordinates(xx, yy)
        return np.asarray(self._u_field(self.params, coords).value).flatten()

    def _loss(self, params, xx, yy, boundary_samples):
        coords = F.coordinates(xx, yy)
        uu = self._u_field(params, coords)
        residual = self.pde(uu, *coords)
        equation_mse = (residual.value ** 2).mean()

        boundary_mse = 0.0
        for bc, (bxx, byy) in zip(self.boundary_conditions, boundary_samples):
            bcoords = F.coordinates(bxx, byy)
            buu = self._u_field(params, bcoords)
            boundary_mse = boundary_mse + (bc.form(buu, *bcoords).value ** 2).mean()
        return equation_mse + self.boundary_strictness * boundary_mse

    def _boundary_samples(self):
        return tuple(next(bc.points_generator) for bc in self.boundary_conditions)

    def calculate_loss(self, xx, yy, params=None):
        params = self.params if params is None else params
        return self._loss(params, jnp.asarray(xx), jnp.asarray(yy), self._boundary_samples())

    def calculate_metrics(self, xx, yy, metrics):
        uu = self.__call__(xx, yy)
        return {
            metric_name: metric_func(uu, np.asarray(xx), np.asarray(yy))
            for metric_name, metric_func in metrics.items()
        }


class SingleNetworkApproximator2DSpatialSystem(_SingleNetworkApproximatorBase):
    r"""Approximates a system of 2-D steady-state equations with one
    multi-output network (reference ``temporal.py:161-222``)."""

    def __init__(self, single_network, pde, boundary_conditions, boundary_strictness=1.):
        super().__init__(single_network)
        self.pde = pde
        self.boundary_conditions = boundary_conditions
        self.boundary_strictness = boundary_strictness

    def _u_fields(self, params, coords):
        ann = F.network_field(lambda xs: self.single_network.apply(params, xs), coords)
        n_out = ann.shape[1]
        return tuple(ann[:, i:i + 1] for i in range(n_out))

    def __call__(self, xx, yy):
        coords = F.coordinates(xx, yy)
        return tuple(np.asarray(u.value).flatten() for u in self._u_fields(self.params, coords))

    def _loss(self, params, xx, yy, boundary_samples):
        coords = F.coordinates(xx, yy)
        uu = self._u_fields(params, coords)
        residuals = self.pde(*uu, *coords)
        equation_mse = sum((eq.value ** 2).mean() for eq in residuals)

        boundary_mse = 0.0
        for bc, (bxx, byy) in zip(self.boundary_conditions, boundary_samples):
            bcoords = F.coordinates(bxx, byy)
            buu = self._u_fields(params, bcoords)
            boundary_mse = boundary_mse + (bc.form(*buu, *bcoords).value ** 2).mean()
        return equation_mse + self.boundary_strictness * boundary_mse

    def _boundary_samples(self):
        return tuple(next(bc.points_generator) for bc in self.boundary_conditions)

    def calculate_loss(self, xx, yy, params=None):
        params = self.params if params is None else params
        return self._loss(params, jnp.asarray(xx), jnp.asarray(yy), self._boundary_samples())

    def calculate_metrics(self, xx, yy, metrics):
        uu = self.__call__(xx, yy)
        return {
            metric_name: metric_func(*uu, np.asarray(xx), np.asarray(yy))
            for metric_name, metric_func in metrics.items()
        }


class SingleNetworkApproximator2DSpatialTemporal(_SingleNetworkApproximatorBase):
    r"""Approximates a 2-D time-dependent problem; first- or second-order
    initial conditions enforced by ``exp(-t)``-blends
    (reference ``temporal.py:225-296``)."""

    def __init__(self, single_network, pde, initial_condition, boundary_conditions, boundary_strictness=1.):
        super().__init__(single_network)
        self.pde = pde
        self.u0 = initial_condition.u0
        self.u0dot = initial_condition.u0dot if hasattr(initial_condition, 'u0dot') else None
        self.boundary_conditions = boundary_conditions
        self.boundary_strictness = boundary_strictness

    def _u_field(self, params, coords):
        xf, yf, tf = coords
        ann = F.network_field(lambda xs: self.single_network.apply(params, xs), coords)
        decay = 1 - F.exp(-tf)
        if self.u0dot is None:
            return F.exp(-tf) * self.u0(xf, yf) + decay * ann
        return ((1 - decay ** 2) * self.u0(xf, yf)
                + decay * self.u0dot(xf, yf)
                + decay ** 2 * ann)

    def __call__(self, xx, yy, tt):
        coords = F.coordinates(xx, yy, tt)
        return np.asarray(self._u_field(self.params, coords).value).flatten()

    def _loss(self, params, xx, yy, tt, boundary_samples):
        coords = F.coordinates(xx, yy, tt)
        uu = self._u_field(params, coords)
        residual = self.pde(uu, *coords)
        equation_mse = (residual.value ** 2).mean()

        boundary_mse = 0.0
        for bc, (bxx, byy, btt) in zip(self.boundary_conditions, boundary_samples):
            bcoords = F.coordinates(bxx, byy, btt)
            buu = self._u_field(params, bcoords)
            boundary_mse = boundary_mse + (bc.form(buu, *bcoords).value ** 2).mean()
        return equation_mse + self.boundary_strictness * boundary_mse

    def _boundary_samples(self, t):
        samples = []
        for bc in self.boundary_conditions:
            x, y = next(bc.points_generator)
            bxx, btt = _cartesian_prod_dims(x, t)
            byy, _ = _cartesian_prod_dims(y, t)
            samples.append((bxx, byy, btt))
        return tuple(samples)

    def calculate_loss(self, xx, yy, tt, x, y, t, params=None):
        params = self.params if params is None else params
        return self._loss(params, jnp.asarray(xx), jnp.asarray(yy), jnp.asarray(tt),
                          self._boundary_samples(jnp.asarray(t)))

    def calculate_metrics(self, xx, yy, tt, x, y, t, metrics):
        uu = self.__call__(xx, yy, tt)
        return {
            metric_name: metric_func(uu, np.asarray(xx), np.asarray(yy), np.asarray(tt))
            for metric_name, metric_func in metrics.items()
        }


class FirstOrderInitialCondition:
    r"""A first-order initial condition: ``u0`` maps spatial coordinate
    Field(s) to :math:`u|_{t=0}` (reference ``temporal.py:299-314``)."""

    def __init__(self, u0):
        self.u0 = u0


class SecondOrderInitialCondition:
    r"""A second-order initial condition: ``u0`` and ``u0dot`` map spatial
    coordinate Field(s) to the initial value and initial time-derivative
    (reference ``temporal.py:317-343``)."""

    def __init__(self, u0, u0dot):
        self.u0 = u0
        self.u0dot = u0dot


class BoundaryCondition:
    r"""A penalty boundary condition: ``form`` has the same signature as the
    PDE and should vanish on the boundary; ``points_generator`` yields boundary
    points (reference ``temporal.py:346-371``)."""

    def __init__(self, form, points_generator):
        self.form = form
        self.points_generator = points_generator


# ------------------------------------------------------------- samplers

def generator_1dspatial(size, x_min, x_max, random=True):
    r"""Infinite generator of 1-D spatial points in [x_min, x_max]
    (reference ``temporal.py:374-403``): bin centers plus uniform in-bin noise."""
    seg_len = (x_max - x_min) / size
    linspace_lo = x_min + seg_len * 0.5
    linspace_hi = x_max - seg_len * 0.5
    center = np.linspace(linspace_lo, linspace_hi, size)
    noise_lo = -seg_len * 0.5
    dtype = get_default_dtype()
    while True:
        if random:
            noise = seg_len * np.random.rand(size) + noise_lo
            yield jnp.asarray(center + noise, dtype=dtype)
        else:
            yield jnp.asarray(center, dtype=dtype)


def generator_2dspatial_segment(size, start, end, random=True):
    r"""Infinite generator of 2-D points on a line segment
    (reference ``temporal.py:406-441``)."""
    x1, y1 = start
    x2, y2 = end
    step = 1. / size
    center = np.linspace(0. + 0.5 * step, 1. - 0.5 * step, size)
    noise_lo = -step * 0.5
    dtype = get_default_dtype()
    while True:
        if random:
            noise = step * np.random.rand(size) + noise_lo
            pos = center + noise
        else:
            pos = center
        yield (jnp.asarray(x1 + (x2 - x1) * pos, dtype=dtype),
               jnp.asarray(y1 + (y2 - y1) * pos, dtype=dtype))


def generator_2dspatial_rectangle(size, x_min, x_max, y_min, y_max, random=True):
    r"""Infinite generator of 2-D points in a rectangle: cartesian product of
    two 1-D generators (reference ``temporal.py:444-472``)."""
    x_size, y_size = size
    x_generator = generator_1dspatial(x_size, x_min, x_max, random)
    y_generator = generator_1dspatial(y_size, y_min, y_max, random)
    while True:
        x = next(x_generator)
        y = next(y_generator)
        xx, yy = _cartesian_prod_dims(x, y)
        yield xx, yy


def generator_temporal(size, t_min, t_max, random=True):
    r"""Infinite generator of 1-D temporal points in [t_min, t_max]
    (reference ``temporal.py:475-504``)."""
    seg_len = (t_max - t_min) / size
    linspace_lo = t_min + seg_len * 0.5
    linspace_hi = t_max - seg_len * 0.5
    center = np.linspace(linspace_lo, linspace_hi, size)
    noise_lo = -seg_len * 0.5
    dtype = get_default_dtype()
    while True:
        if random:
            noise = seg_len * np.random.rand(size) + noise_lo
            yield jnp.asarray(center + noise, dtype=dtype)
        else:
            yield jnp.asarray(center, dtype=dtype)


# ------------------------------------------------------------- monitors

def _plot_loss_metrics(ax_loss, ax_metrics, history):
    ax_loss.clear()
    ax_loss.plot(history['train_loss'], label='training loss')
    ax_loss.plot(history['valid_loss'], label='validation loss')
    ax_loss.set_title('loss during training')
    ax_loss.set_ylabel('loss')
    ax_loss.set_xlabel('epochs')
    ax_loss.set_yscale('log')
    ax_loss.legend()

    ax_metrics.clear()
    for metric_name, metric_values in history.items():
        if metric_name in ('train_loss', 'valid_loss'):
            continue
        ax_metrics.plot(metric_values, label=metric_name)
    ax_metrics.set_title('metrics during training')
    ax_metrics.set_ylabel('metrics')
    ax_metrics.set_xlabel('epochs')
    ax_metrics.set_yscale('log')
    if len(history) > 2:
        ax_metrics.legend()


class MonitorMinimal:
    r"""Shows only the loss and custom metrics (reference ``temporal.py:507-544``)."""

    def __init__(self, check_every):
        self.using_non_gui_backend = matplotlib.get_backend().lower() == 'agg'
        self.check_every = check_every
        self.fig = plt.figure(figsize=(20, 8))
        self.ax1 = self.fig.add_subplot(121)
        self.ax2 = self.fig.add_subplot(122)

    def check(self, approximator, history):
        _plot_loss_metrics(self.ax1, self.ax2, history)
        self.fig.canvas.draw()
        if not self.using_non_gui_backend:  # pragma: no cover
            plt.pause(0.05)


class Monitor1DSpatialTemporal:
    r"""Monitor for 1-D time-dependent problems (reference ``temporal.py:547-602``)."""

    def __init__(self, check_on_x, check_on_t, check_every):
        self.using_non_gui_backend = matplotlib.get_backend().lower() == 'agg'
        self.xx_array, self.tt_array = _cartesian_prod_dims(check_on_x, check_on_t)
        self.x_array = np.asarray(check_on_x)
        self.t_array = np.asarray(check_on_t)
        self.check_every = check_every
        self.t_color = np.linspace(0, 1, len(self.t_array))

        self.fig = plt.figure(figsize=(30, 8))
        self.ax1 = self.fig.add_subplot(131)
        self.ax2 = self.fig.add_subplot(132)
        self.ax3 = self.fig.add_subplot(133)

    def check(self, approximator, history):
        uu_array = np.asarray(approximator(self.xx_array, self.tt_array))

        self.ax1.clear()
        for i, (t, c) in enumerate(zip(self.t_array, self.t_color)):
            u_t = uu_array[i::len(self.t_array)]
            self.ax1.plot(self.x_array, u_t, color=cm.viridis(c), label=f't = {float(t):.2E}')
        self.ax1.legend()
        self.ax1.set_title('approximation')

        _plot_loss_metrics(self.ax2, self.ax3, history)
        self.fig.canvas.draw()
        if not self.using_non_gui_backend:  # pragma: no cover
            plt.pause(0.05)


class Monitor2DSpatialTemporal:
    r"""Monitor for 2-D time-dependent problems (reference ``temporal.py:605-684``)."""

    def __init__(self, check_on_x, check_on_y, check_on_t, check_every):
        self.using_non_gui_backend = matplotlib.get_backend().lower() == 'agg'
        xx, yy = _cartesian_prod_dims(check_on_x, check_on_y)
        self.xx_array = np.asarray(xx)
        self.yy_array = np.asarray(yy)
        self.tt_arrays = [np.ones(len(self.xx_array)) * float(t) for t in np.asarray(check_on_t)]
        self.t_array = np.asarray(check_on_t)
        self.check_every = check_every
        self.fig = None
        self.axs = []
        self.cbs = []

    @staticmethod
    def _create_contour(ax, xx, yy, uu):
        triang = tri.Triangulation(xx, yy)
        contour = ax.tricontourf(triang, uu, cmap='coolwarm')
        ax.set_xlabel('x')
        ax.set_ylabel('y')
        ax.set_aspect('equal', adjustable='box')
        return contour

    def check(self, approximator, history):
        if not self.fig:
            n_axs = len(self.t_array) + 2
            n_row, n_col = (n_axs + 1) // 2, 2
            self.fig = plt.figure(figsize=(20, 8 * n_row))
            for i in range(n_axs):
                self.axs.append(self.fig.add_subplot(n_row, n_col, i + 1))
            for i in range(n_axs - 2):
                self.cbs.append(None)

        for i, ax in enumerate(self.axs[:-2]):
            ax.clear()
            uu_array = np.asarray(approximator(self.xx_array, self.yy_array, self.tt_arrays[i]))
            cs = self._create_contour(ax, self.xx_array, self.yy_array, uu_array)
            if self.cbs[i] is None:
                self.cbs[i] = self.fig.colorbar(cs, format='%.0e', ax=ax)
            else:
                self.cbs[i].mappable.set_clim(vmin=uu_array.min(), vmax=uu_array.max())
            ax.set_title(f'approximation t = {self.t_array[i]:.2E}')

        _plot_loss_metrics(self.axs[-2], self.axs[-1], history)
        self.fig.canvas.draw()
        if not self.using_non_gui_backend:  # pragma: no cover
            plt.pause(0.05)


class Monitor2DSpatial:
    r"""Monitor for 2-D steady-state problems (reference ``temporal.py:687-753``)."""

    def __init__(self, check_on_x, check_on_y, check_every):
        self.using_non_gui_backend = matplotlib.get_backend().lower() == 'agg'
        xx, yy = _cartesian_prod_dims(check_on_x, check_on_y)
        self.xx_array = np.asarray(xx)
        self.yy_array = np.asarray(yy)
        self.check_every = check_every

        self.fig = plt.figure(figsize=(30, 8))
        self.ax1 = self.fig.add_subplot(131)
        self.cb1 = None
        self.ax2 = self.fig.add_subplot(132)
        self.ax3 = self.fig.add_subplot(133)

    @staticmethod
    def _create_contour(ax, xx, yy, uu):
        triang = tri.Triangulation(xx, yy)
        contour = ax.tricontourf(triang, uu, cmap='coolwarm')
        ax.set_xlabel('x')
        ax.set_ylabel('y')
        ax.set_aspect('equal', adjustable='box')
        return contour

    def check(self, approximator, history):
        self.ax1.clear()
        uu_array = np.asarray(approximator(self.xx_array, self.yy_array))
        cs = self._create_contour(self.ax1, self.xx_array, self.yy_array, uu_array)
        if self.cb1 is None:
            self.cb1 = self.fig.colorbar(cs, format='%.0e', ax=self.ax1)
        else:
            self.cb1.mappable.set_clim(vmin=uu_array.min(), vmax=uu_array.max())
        self.ax1.set_title('approximation')

        _plot_loss_metrics(self.ax2, self.ax3, history)
        self.fig.canvas.draw()
        if not self.using_non_gui_backend:  # pragma: no cover
            plt.pause(0.05)


# ------------------------------------------------------- training routines

def _make_sgd_step(approximator, optimizer):
    """One jitted mini-batch SGD step over the approximator's pure loss."""

    @jax.jit
    def step(params, opt_state, batch_args, boundary_samples):
        loss, grads = jax.value_and_grad(
            lambda p: approximator._loss(p, *batch_args, boundary_samples))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


class _OptimizerState:
    """Holds optax state across epochs for a (approximator, optimizer) pair."""

    def __init__(self, approximator, optimizer):
        self.optimizer = optimizer
        self.opt_state = optimizer.init(approximator.params)
        self.step = _make_sgd_step(approximator, optimizer)


def _get_opt_state(approximator, optimizer):
    cache = approximator._jit_cache
    if 'opt' not in cache or cache['opt'].optimizer is not optimizer:
        cache['opt'] = _OptimizerState(approximator, optimizer)
    return cache['opt']


def _minibatch_train(approximator, optimizer, coord_arrays, boundary_samples, shuffle, batch_size):
    """Reference mini-batch loop (``temporal.py:934-958``): SGD over slices of
    the cartesian-product points, one optimizer step per batch."""
    opt = _get_opt_state(approximator, optimizer)
    n = len(coord_arrays[0])
    idx = np.random.permutation(n) if shuffle else np.arange(n)

    params, opt_state = approximator.params, opt.opt_state
    batch_start = 0
    while batch_start < n:
        batch_idx = idx[batch_start:batch_start + batch_size]
        batch_args = tuple(jnp.asarray(a)[batch_idx] for a in coord_arrays)
        params, opt_state, _ = opt.step(params, opt_state, batch_args, boundary_samples)
        batch_start += batch_size
    approximator.params = params
    opt.opt_state = opt_state


def _train_1dspatial_temporal(train_generator_spatial, train_generator_temporal,
                              approximator, optimizer, metrics, shuffle, batch_size):
    x = next(train_generator_spatial)
    t = next(train_generator_temporal)
    xx, tt = _cartesian_prod_dims(x, t)
    boundary_samples = approximator._boundary_samples(t)
    _minibatch_train(approximator, optimizer, (xx, tt), boundary_samples, shuffle, batch_size)

    epoch_loss = float(approximator._loss(approximator.params, xx, tt, boundary_samples))
    epoch_metrics = approximator.calculate_metrics(xx, tt, x, t, metrics)
    return epoch_loss, {k: float(v) for k, v in epoch_metrics.items()}


def _train_2dspatial(train_generator_spatial, train_generator_temporal,
                     approximator, optimizer, metrics, shuffle, batch_size):
    xx, yy = next(train_generator_spatial)
    boundary_samples = approximator._boundary_samples()
    _minibatch_train(approximator, optimizer, (xx, yy), boundary_samples, shuffle, batch_size)

    epoch_loss = float(approximator._loss(approximator.params, xx, yy, boundary_samples))
    epoch_metrics = approximator.calculate_metrics(xx, yy, metrics)
    return epoch_loss, {k: float(v) for k, v in epoch_metrics.items()}


def _valid_2dspatial(valid_generator_spatial, valid_generator_temporal, approximator, metrics):
    xx, yy = next(valid_generator_spatial)
    epoch_loss = float(approximator.calculate_loss(xx, yy))
    epoch_metrics = approximator.calculate_metrics(xx, yy, metrics)
    return epoch_loss, {k: float(v) for k, v in epoch_metrics.items()}


def _train_2dspatial_temporal(train_generator_spatial, train_generator_temporal,
                              approximator, optimizer, metrics, shuffle, batch_size):
    x, y = next(train_generator_spatial)
    t = next(train_generator_temporal)
    xx, tt = _cartesian_prod_dims(x, t)
    yy, _ = _cartesian_prod_dims(y, t)
    boundary_samples = approximator._boundary_samples(t)
    _minibatch_train(approximator, optimizer, (xx, yy, tt), boundary_samples, shuffle, batch_size)

    epoch_loss = float(approximator._loss(approximator.params, xx, yy, tt, boundary_samples))
    epoch_metrics = approximator.calculate_metrics(xx, yy, tt, x, y, t, metrics)
    return epoch_loss, {k: float(v) for k, v in epoch_metrics.items()}


def _valid_1dspatial_temporal(valid_generator_spatial, valid_generator_temporal, approximator, metrics):
    x = next(valid_generator_spatial)
    t = next(valid_generator_temporal)
    xx, tt = _cartesian_prod_dims(x, t)
    epoch_loss = float(approximator.calculate_loss(xx, tt, x, t))
    epoch_metrics = approximator.calculate_metrics(xx, tt, x, t, metrics)
    return epoch_loss, {k: float(v) for k, v in epoch_metrics.items()}


def _valid_2dspatial_temporal(valid_generator_spatial, valid_generator_temporal, approximator, metrics):
    x, y = next(valid_generator_spatial)
    t = next(valid_generator_temporal)
    xx, tt = _cartesian_prod_dims(x, t)
    yy, _ = _cartesian_prod_dims(y, t)
    epoch_loss = float(approximator.calculate_loss(xx, yy, tt, x, y, t))
    epoch_metrics = approximator.calculate_metrics(xx, yy, tt, x, y, t, metrics)
    return epoch_loss, {k: float(v) for k, v in epoch_metrics.items()}


def _solve_1dspatial_temporal(
        train_generator_spatial, train_generator_temporal, valid_generator_spatial, valid_generator_temporal,
        approximator, optimizer, batch_size, max_epochs, shuffle, metrics, monitor
):
    r"""Solve a 1-D time-dependent problem (reference ``temporal.py:756-803``).
    Returns ``(approximator, history)``."""
    return _solve_spatial_temporal(
        train_generator_spatial, train_generator_temporal, valid_generator_spatial, valid_generator_temporal,
        approximator, optimizer, batch_size, max_epochs, shuffle, metrics, monitor,
        train_routine=_train_1dspatial_temporal, valid_routine=_valid_1dspatial_temporal
    )


def _solve_2dspatial_temporal(
        train_generator_spatial, train_generator_temporal, valid_generator_spatial, valid_generator_temporal,
        approximator, optimizer, batch_size, max_epochs, shuffle, metrics, monitor
):
    r"""Solve a 2-D time-dependent problem (reference ``temporal.py:806-854``).
    Returns ``(approximator, history)``."""
    return _solve_spatial_temporal(
        train_generator_spatial, train_generator_temporal, valid_generator_spatial, valid_generator_temporal,
        approximator, optimizer, batch_size, max_epochs, shuffle, metrics, monitor,
        train_routine=_train_2dspatial_temporal, valid_routine=_valid_2dspatial_temporal
    )


def _solve_2dspatial(
        train_generator_spatial, valid_generator_spatial,
        approximator, optimizer, batch_size, max_epochs, shuffle, metrics, monitor
):
    r"""Solve a 2-D steady-state problem (reference ``temporal.py:856-898``).
    Returns ``(approximator, history)``."""
    return _solve_spatial_temporal(
        train_generator_spatial, None, valid_generator_spatial, None,
        approximator, optimizer, batch_size, max_epochs, shuffle, metrics, monitor,
        train_routine=_train_2dspatial, valid_routine=_valid_2dspatial
    )


def _solve_spatial_temporal(
        train_generator_spatial, train_generator_temporal, valid_generator_spatial, valid_generator_temporal,
        approximator, optimizer, batch_size, max_epochs, shuffle, metrics, monitor,
        train_routine, valid_routine
):
    history = {'train_loss': [], 'valid_loss': []}
    for metric_name in metrics:
        history['train_' + metric_name] = []
        history['valid_' + metric_name] = []

    for epoch in range(max_epochs):
        train_epoch_loss, train_epoch_metrics = train_routine(
            train_generator_spatial, train_generator_temporal, approximator, optimizer, metrics, shuffle, batch_size
        )
        history['train_loss'].append(train_epoch_loss)
        for metric_name, metric_value in train_epoch_metrics.items():
            history['train_' + metric_name].append(metric_value)

        valid_epoch_loss, valid_epoch_metrics = valid_routine(
            valid_generator_spatial, valid_generator_temporal, approximator, metrics
        )
        history['valid_loss'].append(valid_epoch_loss)
        for metric_name, metric_value in valid_epoch_metrics.items():
            history['valid_' + metric_name].append(metric_value)

        if monitor and epoch % monitor.check_every == 0:
            monitor.check(approximator, history)

    return approximator, history
