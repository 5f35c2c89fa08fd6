r"""Hypersolver: learns a neural correction to a low-order ODE integrator.

Capability parity with the reference's
``neurodiffeq/hypersolver/hypersolver.py:6-84``: residual targets
:math:`R = (u_{i+1} - u_i - h f(u_i, t_i)) / h^{p+1}` are precomputed from a
known solution, the corrector net is trained with MSE on R (a single jitted
train step scanned over epochs), and inference is a ``lax.scan`` rollout with
the :math:`h^{p+1}`-scaled correction (:math:`h^2` for Euler, :math:`h^3`
for Heun; p = the base integrator's order).
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..networks import FCNN
from ..utils import next_rng_key, get_default_dtype

__all__ = ['Hypersolver', 'DiscreteSolution1D']


class DiscreteSolution1D:
    r"""Linear interpolation between solution values on a fixed time grid
    (reference ``hypersolver.py:6-22``). Vectorized with ``jnp.interp`` instead
    of a per-point Python scan."""

    def __init__(self, ts, *us):
        self.ts = jnp.asarray(ts)
        self.us_tuple = jnp.stack([jnp.asarray(u) for u in us], axis=1)

    def __call__(self, ts):
        ts = jnp.asarray(ts).reshape(-1)
        cols = [
            jnp.interp(ts, self.ts, self.us_tuple[:, j])
            for j in range(self.us_tuple.shape[1])
        ]
        return cols


class Hypersolver:
    r"""Train a network to correct a low-order integrator toward a known
    solution (reference ``hypersolver.py:25-84``).

    :param func: the ODE right-hand side, maps ``(*u, t)`` to du/dt components.
    :param u0: initial state (scalar or sequence).
    :param t0: initial time. :param tn: final time. :param n_steps: grid steps.
    :param sol: the known (ground-truth) solution, maps ts -> list of columns.
    :param numerical_solver: the base integrator (e.g. ``Euler()``).
    :param net: corrector network; defaults to FCNN(dim+1 -> dim, (32, 32)).
    :param optimizer: optax transformation; defaults to ``optax.adam(1e-3)``.
    """

    def __init__(self, func, u0, t0, tn, n_steps, sol, numerical_solver, net=None, optimizer=None):
        self.func = func
        if isinstance(u0, (int, float)):
            u0 = [float(u0)]
        elif not isinstance(u0, (list, tuple)):
            raise TypeError(f"u0 must be int, float, list, or tuple, not {type(u0)}")
        dtype = get_default_dtype()
        self.u0 = jnp.asarray(u0, dtype=dtype)
        self.t0 = t0
        self.tn = tn
        self.n_steps = n_steps
        self.h = (tn - t0) / n_steps
        self.ts = jnp.linspace(t0, tn, n_steps + 1, dtype=dtype)
        self.solution = sol
        self.numerical_solver = numerical_solver
        self.us = jnp.stack([jnp.asarray(u) for u in self.solution(self.ts)], axis=1)
        self.local_epoch = 0
        self._max_local_epoch = 1

        us_no_head = self.us[1:, :]
        us_no_tail = self.us[:-1, :]
        step_out = self.numerical_solver.step(
            self.func, [us_no_tail[:, j] for j in range(us_no_tail.shape[1])], self.ts[:-1], self.h)
        if not isinstance(step_out, (list, tuple)):
            step_out = [step_out]
        f_vals = jnp.stack([jnp.broadcast_to(jnp.asarray(s), us_no_tail[:, 0].shape)
                            for s in step_out], axis=1)
        R = us_no_head - us_no_tail - self.h * f_vals
        self.residual = R / self.h ** (self.numerical_solver.order + 1)

        if net is None:
            self.net = FCNN(n_input_units=self.u0.shape[0] + 1, n_output_units=self.u0.shape[0],
                            hidden_units=(32, 32))
        else:
            self.net = net
        self.params = self.net.init(next_rng_key())
        self.optimizer = optimizer if optimizer is not None else optax.adam(1e-3)
        self.opt_state = self.optimizer.init(self.params)

        self.metrics_history = {'train_loss': [], 'valid_loss': []}
        self._inputs = jnp.concatenate([self.ts.reshape(-1, 1), self.us], axis=1)

    def _loss(self, params):
        # Pair target R_i (the defect of the step t_i -> t_{i+1}) with the
        # net evaluated at the step START (t_i, u_i) — matching how the
        # rollout applies the correction (numerical_solvers.py solve()).
        # DIVERGENCE from the reference: hypersolver.py:71 trains against
        # output[1:], i.e. (t_{i+1}, u_{i+1}) — an off-by-one between
        # training and rollout that caps the corrector's benefit (~1.2x on
        # Heun); with the aligned pairing the corrector reaches its h^{p+1}
        # design accuracy (see tests/test_hypersolver.py).
        output = self.net.apply(params, self._inputs)
        return ((self.residual - output[:-1]) ** 2).mean()

    def fit(self, max_epochs):
        """Train the corrector for ``max_epochs`` epochs (scanned on device)."""
        self._max_local_epoch = max_epochs

        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(self._loss)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (self.params, self.opt_state), losses = jax.lax.scan(
            jax.jit(step), (self.params, self.opt_state), None, length=max_epochs)
        self.local_epoch += max_epochs
        self.metrics_history['train_loss'].extend(np.asarray(losses).tolist())

    @property
    def global_epoch(self):
        return len(self.metrics_history['train_loss'])

    def get_solution(self):
        """Roll out the corrected integrator; returns a DiscreteSolution1D."""
        ret = self.numerical_solver.solve(
            self.func, self.u0, self.t0, self.tn, self.n_steps,
            hypernet=self.net, params=self.params)
        return DiscreteSolution1D(*ret)
