r"""Loss registry: residual norms used for training.

Parity with the reference's ``neurodiffeq/losses.py:5-35`` (``l1``, ``l2``,
``infinity``, ``h1``, ``h1 semi``). Each entry maps
``(residual, funcs, coords) -> scalar`` where ``residual`` is an ``(N, n_eq)``
:class:`~neurodiffeq_tpu.fields.Field` and ``coords`` are coordinate Fields.
The H1 norms differentiate the residual itself, which is why residuals stay
Fields all the way to the loss.
"""
from .fields import Field

__all__ = ['_losses']


def _value(r):
    return r.value if isinstance(r, Field) else r


def _l1_norm(residual, funcs, coords):
    return abs(_value(residual)).mean()


def _l2_norm(residual, funcs, coords):
    return (_value(residual) ** 2).mean()


def _infinity_norm(residual, funcs, coords):
    return abs(_value(residual)).max(axis=1).mean()


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


_losses = {
    'l1': _l1_norm,
    'l2': _l2_norm,
    'infinity': _infinity_norm,
    'h1': _h1_norm,
    'h1 semi': _h1_semi_norm,
}
