r"""Loss registry: residual norms used for training.

Parity with the reference's ``neurodiffeq/losses.py:5-35`` (``l1``, ``l2``,
``infinity``, ``h1``, ``h1 semi``). Each entry maps
``(residual, funcs, coords) -> scalar`` where ``residual`` is an ``(N, n_eq)``
:class:`~neurodiffeq_tpu.fields.Field` and ``coords`` are coordinate Fields.
The H1 norms differentiate the residual itself, which is why residuals stay
Fields all the way to the loss.
"""
from .fields import Field

__all__ = ['_losses', 'causal', 'variational']


def _value(r):
    return r.value if isinstance(r, Field) else r


def _l1_norm(residual, funcs, coords):
    return abs(_value(residual)).mean()


# degree-1 in the residual: `residual_weights` must multiply equation k's
# contribution by w_k, not sqrt(w_k) (see BaseSolver._apply_residual_weights)
_l1_norm.residual_power = 1


def _l2_norm(residual, funcs, coords):
    return (_value(residual) ** 2).mean()


def _infinity_norm(residual, funcs, coords):
    return abs(_value(residual)).max(axis=1).mean()


# also degree-1: scaling column k by w_k weights it inside the per-point max
_infinity_norm.residual_power = 1


def _residual_grads(residual, coords):
    """d(sum of residual columns)/d(coords): the torch ``grad_outputs=ones``
    semantics of the reference (``losses.py:17-26``)."""
    from .operators import grad
    r_scalar = residual.sum(axis=1, keepdims=True) if residual.shape[1] > 1 else residual
    return grad(r_scalar, *coords)


def _h1_norm(residual, funcs, coords):
    import jax.numpy as jnp
    g = _residual_grads(residual, coords)
    rg = jnp.concatenate([_value(residual)] + [_value(gi) for gi in g], axis=1)
    return (rg ** 2).mean()


def _h1_semi_norm(residual, funcs, coords):
    import jax.numpy as jnp
    g = _residual_grads(residual, coords)
    rg = jnp.concatenate([_value(gi) for gi in g], axis=1)
    return (rg ** 2).mean()


def causal(epsilon=1.0, n_bins=32, t_index=-1):
    r"""Causal training loss for time-dependent problems (Wang, Sankaran &
    Perdikaris 2022, "Respecting causality is all you need...",
    arXiv:2203.07404). No reference counterpart
    (`/root/reference/neurodiffeq/losses.py` stops at the norm registry).

    Collocation points are sorted by the time coordinate, their squared
    residuals averaged into ``n_bins`` contiguous bins
    :math:`L_1, \dots, L_M`, and the loss is
    :math:`\frac{1}{M}\sum_i w_i L_i` with
    :math:`w_i = \exp(-\epsilon \sum_{j<i} L_j)` (weights detached from the
    graph). Early times must be fitted before later bins contribute
    gradient, targeting the long-horizon failure mode where the network
    satisfies the equation along the wrong trajectory far from the initial
    condition.

    **When to use it** (measured, `benchmarks/causal_ab.py`): on stiff
    nonlinear PDEs it consistently helps — Allen-Cahn final-time rel-L2
    drops ~1.5x at equal epoch budgets (0.108 -> 0.073 at 30k epochs,
    0.063 -> 0.041 at 100k). On problems whose initial conditions this
    framework already enforces *exactly* via reparameterization and whose
    solution a plain fit can reach (e.g. a long-horizon linear oscillator),
    causal weighting measurably *slows* convergence — the front must sweep
    the whole domain before late-time residuals matter. Prefer vanilla
    loss there.

    Returns a callable usable as any solver's ``loss_fn``. Static shapes:
    binning uses trace-time slice bounds, so the whole loss stays inside the
    jitted train step.

    :param epsilon: Causality strength. Larger = stricter ordering; the
        weights reach ~1 only once all earlier bins' residuals are
        :math:`\ll 1/\epsilon`. Defaults to 1.0.
    :type epsilon: float
    :param n_bins: Number of time bins M (clipped to the batch size).
        Defaults to 32.
    :type n_bins: int
    :param t_index: Which coordinate is time, defaults to -1 (the last one:
        ``t`` for ODEs, ``(x, t)`` ordering for IBVPs).
    :type t_index: int
    """
    import jax
    import jax.numpy as jnp

    def loss(residual, funcs, coords):
        r2 = (_value(residual) ** 2).mean(axis=1)
        n = r2.shape[0]
        t = _value(coords[t_index]).reshape(-1)
        r2 = r2[jnp.argsort(t)]
        m = min(int(n_bins), n)
        # trace-time bin bounds (as even as possible)
        bounds = [round(i * n / m) for i in range(m + 1)]
        L = jnp.stack([r2[a:b].mean() for a, b in zip(bounds[:-1], bounds[1:])])
        cum = jnp.concatenate([jnp.zeros((1,), L.dtype), jnp.cumsum(L)[:-1]])
        w = jax.lax.stop_gradient(jnp.exp(-epsilon * cum))
        return (w * L).mean()

    return loss


def variational(residual, funcs, coords):
    r"""Deep Ritz / variational loss (E & Yu 2018, "The Deep Ritz Method",
    arXiv:1710.00211). No reference counterpart
    (`/root/reference/neurodiffeq/losses.py` stops at residual norms).

    Use with equations written as an **energy density** instead of a
    strong-form residual: ``diff_eqs`` returns the integrand of the energy
    functional, and this loss is its Monte-Carlo integral — the *mean* of
    the returned columns, **not** a squared norm. For Poisson
    :math:`-\nabla^2 u = f` the energy is
    :math:`E[u] = \int \tfrac12 |\nabla u|^2 - f\,u`, so::

        pde = lambda u, x, y: [0.5 * (diff(u, x) ** 2 + diff(u, y) ** 2)
                               - f(x, y) * u]
        Solver2D(pde_system=pde, loss_fn='variational', ...)

    Why bother, when the strong form works: the energy density contains
    only **first** derivatives, so a second-order problem trains with
    order-1 Taylor propagation — measurably cheaper per collocation point
    than the strong form's order-2 path (see
    ``examples/poisson_ritz.py``). Classic Deep Ritz pays for this with a
    boundary *penalty* term; here conditions enforce boundaries exactly by
    reparameterization, so no penalty (and no penalty weight to tune) is
    needed.

    Caveats, honestly: (1) the minimizer equals the PDE solution only for
    problems with a genuine energy functional (symmetric elliptic
    operators — Poisson, linear elasticity; not advection). (2) The loss
    is an energy, not a residual norm: it is typically *negative* at the
    optimum, and its value is not a quality metric — track error against
    a validation metric instead. Best-net tracking still works (lowest
    energy = best). (3) The Monte-Carlo integral assumes *uniform*
    collocation sampling; residual-adaptive generators would bias it.
    (4) ``residual_weights`` multiply the density columns *linearly*
    (``sum_k w_k mean(d_k)``): the loss declares ``residual_power = 1``,
    so solvers skip the sqrt(w) scaling they apply for quadratic losses.

    **Measured guidance** (`benchmarks/ritz_ab.py`, TPU, 2-D Poisson,
    5000 epochs, 1024 pts): Ritz trains ~1.4-1.7x more epochs/s than the
    strong form (interleaved-median spread across runs; the committed
    artifact records 1.69x), but with iid sampling its *accuracy floor* is the
    integration noise of the energy estimate — 0.027 max err vs the
    strong form's 0.001. Pair it with quasi-Monte-Carlo sampling
    (``Generator2D(..., method='halton')``), which cuts that floor 4.1x
    (to 0.0066) at zero cost. Prefer the strong form when second
    derivatives are affordable and the solution is smooth; prefer Ritz +
    'halton' when derivative order is the bottleneck or the solution has
    low regularity.
    """
    v = _value(residual)
    return v.sum(axis=1).mean() if v.ndim > 1 else v.mean()


# the variational loss is LINEAR in the density columns; solvers use this to
# apply `residual_weights` as w (not sqrt(w), the quadratic-loss scaling)
variational.residual_power = 1


_losses = {
    'variational': variational,
    'l1': _l1_norm,
    'l2': _l2_norm,
    'infinity': _infinity_norm,
    'h1': _h1_norm,
    'h1 semi': _h1_semi_norm,
}
