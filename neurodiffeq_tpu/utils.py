"""Global configuration utilities (dtype, seeding, RNG key plumbing, misc).

Capability parity with the reference's ``neurodiffeq/utils.py:10-107``
(``set_tensor_type``, ``set_seed``, ``safe_mkdir``, column split/stack helpers),
re-designed for JAX: instead of a mutable global torch device/dtype, we keep a
module-level default dtype and a splittable global PRNG key store (JAX has no
global RNG; stateful convenience APIs like ``Generator1D.get_examples()`` pull
fresh subkeys from here).
"""
import os
import random

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    'set_tensor_type', 'set_seed', 'safe_mkdir', 'split_columns', 'hstack', 'vstack',
    'get_default_dtype', 'next_rng_key', 'as_2d_column',
]

_DEFAULT_DTYPE = jnp.float32


class _KeyStore:
    """A splittable global PRNG key used by stateful convenience APIs.

    The key is materialized lazily: constructing ``jax.random.PRNGKey`` forces
    JAX backend initialization, and doing that at module import would make
    ``import neurodiffeq_tpu`` require (and block on) an accelerator runtime
    even for pure-host uses (docs builds, introspection, pickling helpers).
    ``seed()`` therefore only records the seed; the first ``next_key()`` pays
    the backend init.
    """

    def __init__(self, seed=0):
        self._seed = seed
        self._key = None

    def seed(self, n):
        self._seed = n
        self._key = None

    def next_key(self):
        if self._key is None:
            self._key = jax.random.PRNGKey(self._seed)
        self._key, sub = jax.random.split(self._key)
        return sub

    def seed_value(self):
        """The configured seed as a host int — safe to read inside a traced
        function (``next_key`` is NOT: splitting under trace would store a
        tracer in ``self._key`` and leak it past the transform's scope)."""
        return self._seed


GLOBAL_KEYS = _KeyStore(seed=0)


def next_rng_key():
    """Return a fresh PRNG subkey from the global key store."""
    return GLOBAL_KEYS.next_key()


def set_tensor_type(device_type=None, float_bits=32):
    """Set the default floating-point precision (and optionally platform).

    Mirrors the reference API (``utils.py:10-41``) where a global default
    device+dtype is configured. On TPU the sensible default is float32
    (fp64 is emulated and slow); pass ``float_bits=64`` to enable
    ``jax_enable_x64`` (useful on CPU for high-precision tests).

    :param device_type: 'cpu', 'tpu'/'axon', or None to keep the current platform.
    :type device_type: str, optional
    :param float_bits: Precision of floating-point numbers: 32 or 64.
    :type float_bits: int
    """
    global _DEFAULT_DTYPE
    if float_bits == 32:
        _DEFAULT_DTYPE = jnp.float32
    elif float_bits == 64:
        jax.config.update('jax_enable_x64', True)
        _DEFAULT_DTYPE = jnp.float64
    elif float_bits == 16:
        _DEFAULT_DTYPE = jnp.bfloat16
    else:
        raise ValueError(f"float_bits must be 16, 32 or 64, got {float_bits}")

    if device_type is not None:
        if not isinstance(device_type, str):
            raise TypeError(f"device_type must be a str, got {device_type}")
        jax.config.update('jax_platforms', device_type)


def get_default_dtype():
    """Current default floating dtype for newly created coordinate arrays."""
    if jax.config.jax_enable_x64 and _DEFAULT_DTYPE == jnp.float32:
        return jnp.float64
    return _DEFAULT_DTYPE


def set_seed(seed_value, ignore_numpy=False, ignore_random=False, ignore_jax=False, **kwargs):
    """Set random seed for `numpy`, `random`, and the global JAX key store.

    :param seed_value: The value of the seed.
    :type seed_value: int
    :param ignore_numpy: If True, the seed for ``numpy`` is not set.
    :type ignore_numpy: bool
    :param ignore_random: If True, the seed for builtin ``random`` is not set.
    :type ignore_random: bool
    :param ignore_jax: If True, the global JAX key store is not reseeded.
    :type ignore_jax: bool
    """
    # accept and ignore the reference's `ignore_torch` kwarg for drop-in parity
    kwargs.pop('ignore_torch', None)
    if kwargs:
        raise ValueError(f"Unknown keyword argument(s): {list(kwargs)}")
    if not ignore_numpy:
        np.random.seed(seed_value)
    if not ignore_random:
        random.seed(seed_value)
    if not ignore_jax:
        GLOBAL_KEYS.seed(seed_value)


def safe_mkdir(path):
    """Create a directory, ignoring if it already exists."""
    os.makedirs(path, exist_ok=True)


def get_residual_info(solution_fields, coords, diff_eqs, highest_order=0, detach=True):
    """Evaluate equation residuals and (optionally) their derivative tensors up
    to ``highest_order`` (parity with reference ``utils.py:71-93``, which is
    marked untested there; this one is tested).

    :param solution_fields: list of solution Fields (e.g. built by enforcing
        conditions on networks over ``coords``).
    :param coords: list of coordinate Fields.
    :param diff_eqs: the equation system; maps (*funcs, *coords) to residuals.
    :param highest_order: how many derivative levels of the residuals to take.
    :param detach: if True, return raw (N, 1) arrays instead of Fields.
    :return: ``[residuals, first_derivatives, ...]`` where level k >= 1 is a
        nested list ``[per-residual [per-coordinate derivative]]``.
    """
    from .fields import diff, Field

    residuals = diff_eqs(*solution_fields, *coords)
    if isinstance(residuals, Field):
        residuals = [residuals]

    ret = [list(residuals)]
    for _ in range(1, highest_order + 1):
        prev = ret[-1]

        def _diff_level(entry):
            if isinstance(entry, Field):
                return [diff(entry, x) for x in coords]
            return [_diff_level(e) for e in entry]

        ret.append([_diff_level(e) for e in prev])

    if detach:
        def recurse(level):
            if isinstance(level, Field):
                return level.value
            return [recurse(e) for e in level]

        ret = [recurse(level) for level in ret]
    return ret


def as_2d_column(x, dtype=None):
    """Coerce numpy/JAX input to a ``(N, 1)``-or-wider 2-D float array."""
    arr = jnp.asarray(x, dtype=dtype or get_default_dtype())
    if arr.ndim <= 1:
        arr = arr.reshape(-1, 1)
    return arr


def split_columns(mat):
    """Convert a 2-D array into a list of its columns.

    :param mat: The matrix to be split, with shape (N, C).
    :type mat: array
    :return: a list of C arrays, each of shape (N,).
    :rtype: list
    """
    if len(mat.shape) != 2:
        raise ValueError(f'matrix must have 2 dimensions, but matrix shape = {mat.shape}')
    return [mat[:, j] for j in range(mat.shape[1])]


def hstack(tensors):
    """Stack a list of (N,) arrays into a (N, C) matrix."""
    return jnp.stack(tensors, axis=1)


def vstack(tensors):
    """Stack a list of (N,) arrays into a (C, N) matrix."""
    return jnp.stack(tensors, axis=0)
