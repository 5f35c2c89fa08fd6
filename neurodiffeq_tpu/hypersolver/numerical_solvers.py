r"""Numerical ODE integrators with optional neural correction.

Capability parity with the reference's
``neurodiffeq/hypersolver/numerical_solvers.py:5-31`` (which ships only
forward Euler), designed for XLA: the inherently sequential rollout is a
``jax.lax.scan`` instead of a Python loop, so the whole trajectory (with the
hypernet correction applied every step) compiles to one fused device
program. Beyond the reference, ``Heun`` provides a second-order base
integrator whose corrector learns the :math:`O(h^3)` local defect.
"""
from abc import ABC, abstractmethod

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['NumericalSolver', 'Euler', 'Heun', 'RK4']


class NumericalSolver(ABC):
    r"""Base integrator: subclasses define ``order`` (global order p) and
    ``step`` returning the increment slope :math:`\Phi(u, t, h)` so that
    :math:`u_{i+1} = u_i + h\,\Phi`. The shared rollout applies an optional
    neural corrector scaled by :math:`h^{p+1}` (the local truncation order).
    """

    order = None

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
                u_new = u_new + h ** (self.order + 1) * jnp.reshape(
                    hypernet.apply(params, inp), u.shape)
            return u_new, u_new

        _, us_tail = jax.lax.scan(scan_step, u0, ts[:-1])
        us = jnp.concatenate([u0[None, :], us_tail], axis=0)

        ans = [ts]
        for j in range(us.shape[1]):
            ans.append(us[:, j])
        return ans

    @abstractmethod
    def step(self, func, u, t, h):
        pass  # pragma: no cover


class Euler(NumericalSolver):
    r"""Forward Euler with optional neural corrector:
    :math:`u_{i+1} = u_i + h f(u_i, t_i) + h^2\,\mathrm{hypernet}(t_i, u_i)`
    (reference ``numerical_solvers.py:15-31``).
    """
    order = 1

    def step(self, func, u, t, h):
        return func(*u, t)


class Heun(NumericalSolver):
    r"""Heun's method (explicit trapezoidal, global order 2) with an
    :math:`h^3`-scaled neural corrector — no reference analog (the reference
    ships Euler only):
    :math:`\Phi = \tfrac12\left[f(u_i, t_i) + f(u_i + h f(u_i, t_i), t_i + h)\right]`.
    """
    order = 2

    def step(self, func, u, t, h):
        k1 = _normalize_rhs(func(*u, t), len(u))
        u_pred = [ui + h * k for ui, k in zip(u, k1)]
        k2 = _normalize_rhs(func(*u_pred, t + h), len(u))
        return [0.5 * (a + b) for a, b in zip(k1, k2)]


class RK4(NumericalSolver):
    r"""Classic fourth-order Runge-Kutta with an :math:`h^5`-scaled neural
    corrector — no reference analog (the reference ships Euler only,
    ``/root/reference/neurodiffeq/hypersolver/numerical_solvers.py:5-31``):
    :math:`\Phi = \tfrac16(k_1 + 2k_2 + 2k_3 + k_4)` with the standard
    half-step stages. As a hypersolver base it leaves the corrector only
    the :math:`O(h^5)` defect, so a coarse grid can reach fine-grid
    accuracy; as a plain integrator (``hypernet=None``) it doubles as the
    framework's reference-quality ODE rollout.
    """
    order = 4

    def step(self, func, u, t, h):
        n = len(u)
        k1 = _normalize_rhs(func(*u, t), n)
        u2 = [ui + 0.5 * h * k for ui, k in zip(u, k1)]
        k2 = _normalize_rhs(func(*u2, t + 0.5 * h), n)
        u3 = [ui + 0.5 * h * k for ui, k in zip(u, k2)]
        k3 = _normalize_rhs(func(*u3, t + 0.5 * h), n)
        u4 = [ui + h * k for ui, k in zip(u, k3)]
        k4 = _normalize_rhs(func(*u4, t + h), n)
        return [(a + 2 * b + 2 * c + d) / 6.0
                for a, b, c, d in zip(k1, k2, k3, k4)]


def _normalize_rhs(out, n_eq):
    """Normalize a user RHS return to one entry per equation.

    Unlike ``_as_seq``, a bare array from a single-equation func (e.g.
    ``lambda u, t: -u`` over an (N,)-batched grid) stays ONE equation — it
    must not be split into N per-point entries, which would silently
    misalign the zip over equations in multi-stage steps.
    """
    if isinstance(out, (list, tuple)):
        return list(out)
    if n_eq == 1:
        return [out]
    return _as_seq(out)


def _as_seq(x):
    if isinstance(x, (list, tuple)):
        return x
    if isinstance(x, (jnp.ndarray, np.ndarray)) and x.ndim >= 1:
        return [x[i] for i in range(x.shape[0])]
    return [x]
