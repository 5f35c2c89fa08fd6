r"""Numerical ODE integrators with optional neural correction.

Capability parity with the reference's
``neurodiffeq/hypersolver/numerical_solvers.py:5-31``, designed for XLA: the
inherently sequential rollout is a ``jax.lax.scan`` instead of a Python loop,
so the whole trajectory (with the hypernet correction applied every step)
compiles to one fused device program.
"""
from abc import ABC, abstractmethod

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['NumericalSolver', 'Euler']


class NumericalSolver(ABC):
    @abstractmethod
    def solve(self, func, u0, t0, tn, n_steps):
        pass  # pragma: no cover

    @abstractmethod
    def step(self, func, u, t, h):
        pass  # pragma: no cover


class Euler(NumericalSolver):
    r"""Forward Euler with optional neural corrector:
    :math:`u_{i+1} = u_i + h f(u_i, t_i) + h^2\,\mathrm{hypernet}(t_i, u_i)`.
    """
    order = 1

    def solve(self, func, u0, t0, tn, n_steps, hypernet=None, params=None):
        """Roll out the integrator over ``n_steps``; returns
        ``[ts, u_1(ts), ..., u_k(ts)]`` like the reference.

        :param hypernet: optional correction network module (init/apply pair).
        :param params: the hypernet's parameters (required if hypernet given).
        """
        ts = jnp.linspace(t0, tn, n_steps + 1)
        if isinstance(u0, (float, int)):
            u0 = (u0,)
        u0 = jnp.asarray(u0, dtype=ts.dtype).reshape(-1)
        h = (tn - t0) / n_steps

        def scan_step(u, t):
            du = jnp.stack([jnp.reshape(d, ()) for d in _as_seq(self.step(func, u, t, h))])
            u_new = u + h * du
            if hypernet is not None:
                inp = jnp.concatenate([jnp.reshape(t, (1,)), u])
                u_new = u_new + h ** 2 * jnp.reshape(hypernet.apply(params, inp), u.shape)
            return u_new, u_new

        _, us_tail = jax.lax.scan(scan_step, u0, ts[:-1])
        us = jnp.concatenate([u0[None, :], us_tail], axis=0)

        ans = [ts]
        for j in range(us.shape[1]):
            ans.append(us[:, j])
        return ans

    def step(self, func, u, t, h):
        return func(*u, t)


def _as_seq(x):
    if isinstance(x, (list, tuple)):
        return x
    if isinstance(x, (jnp.ndarray, np.ndarray)) and x.ndim >= 1:
        return [x[i] for i in range(x.shape[0])]
    return [x]
