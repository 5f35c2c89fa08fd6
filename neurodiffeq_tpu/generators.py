r"""Collocation-point generators: atomic samplers + a combinator algebra.

Capability parity with the reference's ``neurodiffeq/generators.py`` (atomic
``Generator1D/2D/3D/ND/Spherical`` and the ``+``/``*``/``^`` combinator algebra
plus Concat/Static/Predefined/Transform/Ensemble/Mesh/Filter/Resample/Batch/
Sampler wrappers, ``generators.py:51-1064``), re-designed for JAX: every
generator exposes a **pure** ``sample(key)`` function on static shapes, so
sampling runs *inside* the jitted train step on device (torch's stateful RNG
becomes explicit key-splitting). The stateful ``get_examples()`` convenience
API is kept for drop-in parity; it draws subkeys from the global key store.

Generators whose semantics are inherently dynamic-shaped (``FilterGenerator``
with ``update_size=True``, ``BatchGenerator``'s rolling cache) are flagged
``jittable = False`` and are sampled host-side by the solvers — XLA requires
static shapes, so these fall back to a slower but fully compatible path.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .utils import next_rng_key, get_default_dtype

__all__ = [
    'BaseGenerator', 'Generator1D', 'Generator2D', 'Generator3D', 'GeneratorND',
    'GeneratorSpherical', 'GeneratorHypercube', 'ConcatGenerator', 'StaticGenerator', 'PredefinedGenerator',
    'TransformGenerator', 'EnsembleGenerator', 'MeshGenerator', 'FilterGenerator',
    'ResampleGenerator', 'BatchGenerator', 'SamplerGenerator',
    'ResidualAdaptiveGenerator',
]


def _dtype():
    return get_default_dtype()


def _chebyshev_first(a, b, n):
    nodes = jnp.cos(((jnp.arange(n, dtype=_dtype()) + 0.5) / n) * np.pi)
    return ((a + b) + (b - a) * nodes) / 2


def _chebyshev_second(a, b, n):
    nodes = jnp.cos(jnp.arange(n, dtype=_dtype()) / float(n - 1) * np.pi)
    return ((a + b) + (b - a) * nodes) / 2


def _chebyshev_second_noisy(key, a, b, n):
    noise = jax.random.uniform(key, (n,), dtype=_dtype()) * 2 - 1
    nodes = jnp.cos((jnp.arange(n, dtype=_dtype()) + noise) / float(n - 1) * np.pi)
    return ((a + b) + (b - a) * nodes) / 2


def _latin_hypercube(key, a, b, n):
    k1, k2 = jax.random.split(key)
    step = (b - a) / n
    lowers = a + step * jnp.arange(n, dtype=_dtype())
    points = lowers + jax.random.uniform(k1, (n,), dtype=_dtype()) * step
    return jax.random.permutation(k2, points)


_HALTON_PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47)


def _halton(key, n, dim):
    r"""Randomized Halton points in ``[0, 1)^dim``: the radical-inverse
    sequence in the first ``dim`` prime bases with a Cranley-Patterson
    rotation drawn from ``key``. No reference counterpart (the reference's
    method set, ``generators.py:107-191``, stops at latin-hypercube).

    Pure jnp on static shapes — the digit loop unrolls at trace time — so
    it runs inside the jitted train step like every other method. A fresh
    key per call randomizes the rotation (keeping training stochastic and
    the integral estimate unbiased) while each batch retains
    low-discrepancy structure: quasi-Monte-Carlo integration error scales
    like O(log^d n / n) vs O(n^-1/2) for iid uniform sampling.

    Dimensions beyond the sixth (prime bases >= 17) additionally get
    Matousek-style linear digit scrambling (digit -> (a*digit + c_j) mod b
    with keyed random a, c_j): plain radical inverses in neighboring high
    bases have strongly correlated 2-D projections at typical batch sizes
    (n < b_i * b_j), which a Cranley-Patterson rotation randomizes but does
    not decorrelate. Scrambling breaks the stripes while preserving the
    (t, s)-net structure per dimension. QMC's edge over iid still shrinks
    as d grows (the log^d n factor); past ~8-10 dims expect parity with
    'uniform' rather than a win.
    """
    dtype = _dtype()
    cols = []
    idx0 = jnp.arange(1, n + 1)
    for d in range(dim):
        b = _HALTON_PRIMES[d]
        n_digits = int(np.log(max(n, 2)) / np.log(b)) + 2
        scramble = b >= 17
        if scramble:
            kd = jax.random.fold_in(key, 10007 + d)
            a = jax.random.randint(jax.random.fold_in(kd, 0), (), 1, b)
            c = jax.random.randint(jax.random.fold_in(kd, 1), (n_digits,), 0, b)
        x = jnp.zeros((n,), dtype)
        f = 1.0 / b
        idx = idx0
        for j in range(n_digits):
            digit = idx % b
            if scramble:
                digit = (a * digit + c[j]) % b
            x = x + f * digit.astype(dtype)
            idx = idx // b
            f = f / b
        cols.append(x)
    u = jnp.stack(cols, axis=-1)
    shift = jax.random.uniform(key, (dim,), dtype=dtype)
    return (u + shift) % 1.0


def _compute_log_negative(t_min, t_max, whence):
    if t_min <= 0 or t_max <= 0:
        raise ValueError(
            f"In this version, the interval [{t_min}, {t_max}] cannot be used for "
            f"log-sampling in {whence}. If you meant to sample from the interval "
            f"[10 ^ {t_min}, 10 ^ {t_max}], please pass in {10 ** t_min} and {10 ** t_max}"
        )
    return np.log10(t_min), np.log10(t_max)


class BaseGenerator:
    """Base class for all generators.

    Children implement ``sample(key)`` (pure; returns an array of shape
    ``(size,)`` or a tuple of such arrays) and a ``size`` attribute.
    """

    jittable = True
    adaptive = False

    def __init__(self):
        self.size = None

    def sample(self, key):
        raise NotImplementedError  # pragma: no cover

    def get_examples(self):
        """Stateful convenience API: draw a fresh subkey and sample."""
        out = self.sample(next_rng_key())
        if isinstance(out, tuple) and len(out) == 1:
            return out[0]
        return out

    @staticmethod
    def check_generator(obj):
        if not isinstance(obj, BaseGenerator):
            raise ValueError(f"{obj} is not a generator")

    def __add__(self, other):
        self.check_generator(other)
        return ConcatGenerator(self, other)

    def __mul__(self, other):
        self.check_generator(other)
        return EnsembleGenerator(self, other)

    def __xor__(self, other):
        self.check_generator(other)
        return MeshGenerator(self, other)

    def _internal_vars(self) -> dict:
        return dict(size=self.size)

    @staticmethod
    def _obj_repr(obj) -> str:
        if isinstance(obj, tuple):
            return '(' + ', '.join(BaseGenerator._obj_repr(item) for item in obj) + ')'
        if isinstance(obj, list):
            return '[' + ', '.join(BaseGenerator._obj_repr(item) for item in obj) + ']'
        if isinstance(obj, set):
            return '{' + ', '.join(BaseGenerator._obj_repr(item) for item in obj) + '}'
        if isinstance(obj, dict):
            return '{' + ', '.join(
                BaseGenerator._obj_repr(k) + ': ' + BaseGenerator._obj_repr(obj[k])
                for k in obj
            ) + '}'
        if isinstance(obj, (jnp.ndarray, jax.Array, np.ndarray)):
            return f'array(shape={tuple(obj.shape)})'
        return repr(obj)

    def __repr__(self):
        d = self._internal_vars()
        keys = ', '.join(f'{k}={self._obj_repr(d[k])}' for k in d)
        return f'{self.__class__.__name__}({keys})'


def _as_tuple(out):
    if isinstance(out, (tuple, list)):
        return tuple(out)
    return (out,)


def contains_buried_adaptive(gen):
    """True if a ResidualAdaptiveGenerator sits INSIDE a combinator (where
    its adaptive selection cannot run — only the outermost generator's
    ``adaptive`` flag is honored by the solvers). Used to warn loudly
    instead of silently training without adaptivity."""
    stack, seen = [gen], set()
    top = True
    while stack:
        g = stack.pop()
        if id(g) in seen:
            continue
        seen.add(id(g))
        if getattr(g, 'adaptive', False) and not top:
            return True
        top = False
        sub = getattr(g, 'generator', None)
        if isinstance(sub, BaseGenerator):
            stack.append(sub)
        for s in getattr(g, 'generators', ()) or ():
            if isinstance(s, BaseGenerator):
                stack.append(s)
    return False


class Generator1D(BaseGenerator):
    """An example generator for generating 1-D training points.

    :param size: Number of points generated each time ``get_examples`` is called.
    :type size: int
    :param t_min: Lower bound of the 1-D points generated, defaults to 0.0.
    :type t_min: float, optional
    :param t_max: Upper bound of the 1-D points generated, defaults to 1.0.
    :type t_max: float, optional
    :param method: one of 'uniform', 'equally-spaced', 'equally-spaced-noisy',
        'log-spaced', 'log-spaced-noisy', 'chebyshev'/'chebyshev1', 'chebyshev2',
        'chebyshev2-noisy', 'latin-hypercube'; defaults to 'uniform'.
        (Same set as reference ``generators.py:107-178``; plus 'halton' —
        randomized low-discrepancy points, no reference analog, see
        :func:`_halton`.)
    :type method: str, optional
    :param noise_std: standard deviation of the noise for noisy methods;
        defaults to ``((t_max - t_min) / size) / 4``.
    :raises ValueError: When provided with an unknown method.
    """

    def __init__(self, size, t_min=0.0, t_max=1.0, method='uniform', noise_std=None):
        super().__init__()
        self.size = size
        self.t_min, self.t_max = t_min, t_max
        self.method = method
        self.noise_std = noise_std if noise_std else ((t_max - t_min) / size) / 4.0

        if method in ('log-spaced', 'log-spaced-noisy'):
            self._log_bounds = _compute_log_negative(t_min, t_max, self.__class__)
        elif method not in (
                'uniform', 'equally-spaced', 'equally-spaced-noisy',
                'chebyshev', 'chebyshev1', 'chebyshev2', 'chebyshev2-noisy',
                'latin-hypercube', 'halton'):
            raise ValueError(f'Unknown method: {method}')

    def sample(self, key):
        m, n = self.method, self.size
        if m == 'uniform':
            return jax.random.uniform(key, (n,), dtype=_dtype()) * (self.t_max - self.t_min) + self.t_min
        if m == 'equally-spaced':
            return jnp.linspace(self.t_min, self.t_max, n, dtype=_dtype())
        if m == 'equally-spaced-noisy':
            base = jnp.linspace(self.t_min, self.t_max, n, dtype=_dtype())
            return base + jax.random.normal(key, (n,), dtype=_dtype()) * self.noise_std
        if m == 'log-spaced':
            lo, hi = self._log_bounds
            return jnp.logspace(lo, hi, n, dtype=_dtype())
        if m == 'log-spaced-noisy':
            lo, hi = self._log_bounds
            base = jnp.logspace(lo, hi, n, dtype=_dtype())
            return base + jax.random.normal(key, (n,), dtype=_dtype()) * self.noise_std
        if m in ('chebyshev', 'chebyshev1'):
            return _chebyshev_first(self.t_min, self.t_max, n)
        if m == 'chebyshev2':
            return _chebyshev_second(self.t_min, self.t_max, n)
        if m == 'chebyshev2-noisy':
            return _chebyshev_second_noisy(key, self.t_min, self.t_max, n)
        if m == 'latin-hypercube':
            return _latin_hypercube(key, self.t_min, self.t_max, n)
        if m == 'halton':
            u = _halton(key, n, 1)[:, 0]
            return self.t_min + (self.t_max - self.t_min) * u
        raise ValueError(f'Unknown method: {m}')  # pragma: no cover

    def _internal_vars(self):
        d = super()._internal_vars()
        d.update(dict(t_min=self.t_min, t_max=self.t_max, method=self.method, noise_std=self.noise_std))
        return d


class Generator2D(BaseGenerator):
    r"""An example generator for generating 2-D training points on an
    ``m x n`` grid (flattened), with the same method set as the reference
    (``generators.py:194-303``).

    :param grid: grid shape ``(m, n)``, defaults to ``(10, 10)``.
    :param xy_min: lower bounds ``(x_0, y_0)``, defaults to ``(0.0, 0.0)``.
    :param xy_max: upper bounds ``(x_1, y_1)``, defaults to ``(1.0, 1.0)``.
    :param method: 'equally-spaced', 'equally-spaced-noisy', 'chebyshev'/
        'chebyshev1', 'chebyshev2', 'chebyshev2-noisy', or 'latin-hypercube';
        defaults to 'equally-spaced-noisy'. Also accepts 'halton' (no
        reference analog): ``grid[0]*grid[1]`` randomized low-discrepancy
        points filling the rectangle directly rather than a mesh of per-axis
        nodes — see :func:`_halton`.
    :param xy_noise_std: per-axis noise std; defaults to grid-step / 4 per axis.
    """

    def __init__(self, grid=(10, 10), xy_min=(0.0, 0.0), xy_max=(1.0, 1.0), method='equally-spaced-noisy',
                 xy_noise_std=None):
        super().__init__()
        self.grid = grid
        self.size = grid[0] * grid[1]
        self.xy_min = xy_min
        self.xy_max = xy_max
        self.method = method
        self.xy_noise_std = xy_noise_std
        if method not in ('equally-spaced', 'equally-spaced-noisy', 'chebyshev', 'chebyshev1',
                          'chebyshev2', 'chebyshev2-noisy', 'latin-hypercube', 'halton'):
            raise ValueError(f'Unknown method: {method}')

    def _axes(self, key):
        m = self.method
        k1, k2 = jax.random.split(key)
        axes = []
        for i, k in zip(range(2), (k1, k2)):
            a, b, n = self.xy_min[i], self.xy_max[i], self.grid[i]
            if m in ('equally-spaced', 'equally-spaced-noisy'):
                axes.append(jnp.linspace(a, b, n, dtype=_dtype()))
            elif m in ('chebyshev', 'chebyshev1'):
                axes.append(_chebyshev_first(a, b, n))
            elif m == 'chebyshev2':
                axes.append(_chebyshev_second(a, b, n))
            elif m == 'chebyshev2-noisy':
                axes.append(_chebyshev_second_noisy(k, a, b, n))
            elif m == 'latin-hypercube':
                axes.append(_latin_hypercube(k, a, b, n))
        return axes

    def sample(self, key):
        key, k1, k2 = jax.random.split(key, 3)
        if self.method == 'halton':
            u = _halton(key, self.size, 2)
            gx = self.xy_min[0] + (self.xy_max[0] - self.xy_min[0]) * u[:, 0]
            gy = self.xy_min[1] + (self.xy_max[1] - self.xy_min[1]) * u[:, 1]
            return gx, gy
        x, y = self._axes(key)
        gx, gy = jnp.meshgrid(x, y, indexing='ij')
        gx, gy = gx.flatten(), gy.flatten()
        if self.method == 'equally-spaced-noisy':
            if self.xy_noise_std:
                sx, sy = self.xy_noise_std
            else:
                sx = ((self.xy_max[0] - self.xy_min[0]) / self.grid[0]) / 4.0
                sy = ((self.xy_max[1] - self.xy_min[1]) / self.grid[1]) / 4.0
            gx = gx + jax.random.normal(k1, gx.shape, dtype=_dtype()) * sx
            gy = gy + jax.random.normal(k2, gy.shape, dtype=_dtype()) * sy
        return gx, gy

    def _internal_vars(self) -> dict:
        d = super()._internal_vars()
        d.update(dict(grid=self.grid, xy_min=self.xy_min, xy_max=self.xy_max,
                      method=self.method, xy_noise_std=self.xy_noise_std))
        return d


class Generator3D(BaseGenerator):
    r"""An example generator for generating 3-D training points on an
    ``m x n x k`` grid. NOT TO BE CONFUSED with ``GeneratorSpherical``.
    (Reference ``generators.py:317-416``; plus 'halton' — randomized
    low-discrepancy points filling the box directly, no reference analog.)
    """

    def __init__(self, grid=(10, 10, 10), xyz_min=(0.0, 0.0, 0.0), xyz_max=(1.0, 1.0, 1.0),
                 method='equally-spaced-noisy'):
        super().__init__()
        self.size = grid[0] * grid[1] * grid[2]
        self.grid = grid
        self.xyz_min = xyz_min
        self.xyz_max = xyz_max
        self.method = method
        if method not in ('equally-spaced', 'equally-spaced-noisy', 'chebyshev', 'chebyshev1',
                          'chebyshev2', 'latin-hypercube', 'halton'):
            raise ValueError(f"Unknown method: {method}")

    def sample(self, key):
        keys = jax.random.split(key, 6)
        if self.method == 'halton':
            u = _halton(keys[0], self.size, 3)
            return tuple(
                self.xyz_min[i] + (self.xyz_max[i] - self.xyz_min[i]) * u[:, i]
                for i in range(3))
        axes = []
        for i in range(3):
            a, b, n = self.xyz_min[i], self.xyz_max[i], self.grid[i]
            m = self.method
            if m in ('equally-spaced', 'equally-spaced-noisy'):
                axes.append(jnp.linspace(a, b, n, dtype=_dtype()))
            elif m in ('chebyshev', 'chebyshev1'):
                axes.append(_chebyshev_first(a, b, n))
            elif m == 'chebyshev2':
                axes.append(_chebyshev_second(a, b, n))
            elif m == 'latin-hypercube':
                axes.append(_latin_hypercube(keys[i], a, b, n))
        gx, gy, gz = jnp.meshgrid(*axes, indexing='ij')
        gx, gy, gz = gx.flatten(), gy.flatten(), gz.flatten()
        if self.method == 'equally-spaced-noisy':
            stds = [((self.xyz_max[i] - self.xyz_min[i]) / self.grid[i]) / 4.0 for i in range(3)]
            gx = gx + jax.random.normal(keys[3], gx.shape, dtype=_dtype()) * stds[0]
            gy = gy + jax.random.normal(keys[4], gy.shape, dtype=_dtype()) * stds[1]
            gz = gz + jax.random.normal(keys[5], gz.shape, dtype=_dtype()) * stds[2]
        return gx, gy, gz

    def _internal_vars(self) -> dict:
        d = super()._internal_vars()
        d.update(dict(grid=self.grid, xyz_min=self.xyz_min, xyz_max=self.xyz_max, method=self.method))
        return d


class GeneratorND(BaseGenerator):
    r"""An example generator for generating N-D training points as a meshgrid
    with a per-axis method list (reference ``generators.py:419-557``).

    :param grid: per-axis node counts; int allowed if N=1.
    :param r_min: per-axis lower bounds.
    :param r_max: per-axis upper bounds.
    :param methods: per-axis method: 'uniform', 'equally-spaced', 'log-spaced',
        'exp-spaced', 'chebyshev'/'chebyshev1', 'chebyshev2'. The whole-box
        string ``methods='halton'`` (no reference analog) instead fills the
        N-D box with ``prod(grid)`` randomized low-discrepancy points — see
        :func:`_halton`; ``noisy``/``cut`` do not apply to it.
    :param noisy: add per-axis gaussian noise if True (default).
    :param r_noise_std: per-axis noise std overrides.
    :param cut: per-axis (start, stop) slices of the node set. (kwarg)
    :param base: per-axis log base for 'exp-spaced'. (kwarg)
    :param abs_value: take abs of noisy samples. (kwarg)
    """

    def __init__(self, grid=(10, 10), r_min=(0.0, 0.0), r_max=(1.0, 1.0),
                 methods=['equally-spaced', 'equally-spaced'], noisy=True, r_noise_std=None,
                 **kwargs):
        super().__init__()
        self.grid = grid
        self.r_min = r_min
        self.r_max = r_max
        self.methods = methods
        self.noisy = noisy
        self.r_noise_std = r_noise_std

        if isinstance(methods, str):
            methods = [methods]
        if isinstance(grid, int):
            grid = (grid,)
        if isinstance(r_min, (float, int)):
            r_min = (r_min,)
        if isinstance(r_max, (float, int)):
            r_max = (r_max,)
        if isinstance(r_noise_std, (float, int)):
            r_noise_std = (r_noise_std,)

        N = len(grid)
        self._halton_box = isinstance(self.methods, str) and self.methods == 'halton'
        if not self._halton_box and 'halton' in methods:
            raise ValueError(
                "'halton' is a whole-box method, not a per-axis one: pass "
                "methods='halton' (a string) to fill the N-D box with "
                "low-discrepancy points")
        cut = kwargs.pop('cut', None)
        if self._halton_box:
            if cut is not None:
                raise ValueError("'cut' does not apply to methods='halton' "
                                 "(points fill the box, not a per-axis mesh)")
            if N > len(_HALTON_PRIMES):
                raise ValueError(f"methods='halton' supports up to "
                                 f"{len(_HALTON_PRIMES)} dimensions, got {N}")
        if cut is None:
            cut = tuple((None, None) for _ in range(N))
        base = kwargs.pop('base', tuple(10 for _ in range(N)))
        abs_value = kwargs.pop('abs_value', False)
        if kwargs:
            raise ValueError(f'Unknown keyword argument(s): {list(kwargs.keys())}')
        if isinstance(base, (float, int)):
            base = (base,)
        if isinstance(cut[0], (float, int)) or cut[0] is None:
            cut = (cut,)

        self._N = N
        self._grid = grid
        self._r_min, self._r_max = r_min, r_max
        self._methods = methods
        self._cut = cut
        self._base = base
        self._abs_value = abs_value
        self._r_noise_std_tuple = r_noise_std

        # node sets and noise-std vectors are fixed (except 'uniform' axes,
        # which resample every call); compute sizes after cutting
        axis_sizes = []
        for i in range(N):
            n = grid[i]
            lo, hi = cut[i]
            axis_sizes.append(len(range(*slice(lo, hi).indices(n))))
        self.size = int(np.prod(axis_sizes))

    def _axis_nodes(self, i, key):
        method = self._methods[i]
        a, b, n = self._r_min[i], self._r_max[i], self._grid[i]
        if self._r_noise_std_tuple:
            noise_rstd = self._r_noise_std_tuple[i]
        else:
            noise_rstd = ((b - a) / n) / 4.0

        if method == 'equally-spaced':
            x = jnp.linspace(a, b, n, dtype=_dtype())
            std = noise_rstd * jnp.ones((n,), dtype=_dtype())
        elif method == 'uniform':
            x = jax.random.uniform(key, (n,), dtype=_dtype()) * (b - a) + a
            std = jnp.zeros((n,), dtype=_dtype())
        elif method == 'log-spaced':
            x = jnp.logspace(np.log10(a), np.log10(b), n, dtype=_dtype())
            std = noise_rstd * jnp.logspace(np.log10(a), np.log10(b), n, dtype=_dtype())
        elif method == 'exp-spaced':
            lo_exp = self._base[i] ** a
            hi_exp = self._base[i] ** b
            lin = jnp.linspace(lo_exp, hi_exp, n, dtype=_dtype())
            x = jnp.log(lin) / np.log(self._base[i])
            std = noise_rstd * x
        elif method in ('chebyshev', 'chebyshev1'):
            x = _chebyshev_first(a, b, n)
            std = noise_rstd * jnp.ones((n,), dtype=_dtype())
        elif method == 'chebyshev2':
            x = _chebyshev_second(a, b, n)
            std = noise_rstd * jnp.ones((n,), dtype=_dtype())
        else:
            raise ValueError(f'Unknown method: {method}')

        lo, hi = self._cut[i]
        return x[lo:hi], std[lo:hi]

    def sample(self, key):
        if self._halton_box:
            u = _halton(key, self.size, self._N)
            return tuple(
                self._r_min[i] + (self._r_max[i] - self._r_min[i]) * u[:, i]
                for i in range(self._N))
        keys = jax.random.split(key, 2 * self._N)
        nodes, stds = [], []
        for i in range(self._N):
            x, s = self._axis_nodes(i, keys[i])
            nodes.append(x)
            stds.append(s)
        grids = jnp.meshgrid(*nodes, indexing='ij')
        grid_stds = jnp.meshgrid(*stds, indexing='ij')
        out = []
        for i in range(self._N):
            g = grids[i].flatten()
            if self.noisy:
                g = g + jax.random.normal(keys[self._N + i], g.shape, dtype=_dtype()) * grid_stds[i].flatten()
                if self._abs_value:
                    g = jnp.abs(g)
            out.append(g)
        return tuple(out)

    def _internal_vars(self) -> dict:
        d = super()._internal_vars()
        d.update(dict(grid=self.grid, r_min=self.r_min, r_max=self.r_max,
                      methods=self.methods, noisy=self.noisy, r_noise_std=self.r_noise_std))
        return d


class GeneratorSpherical(BaseGenerator):
    r"""A generator of points in spherical coordinates, uniform on the sphere,
    with volume-uniform (``r^2 ~ U``) or radius-uniform (``r ~ U``) radii
    (reference ``generators.py:572-646``).

    :param size: number of points.
    :param r_min: interior radius.
    :param r_max: exterior radius.
    :param method: 'equally-spaced-noisy' (``r^2 ~ U``) or 'equally-radius-noisy'
        (``r ~ U``).
    """

    def __init__(self, size, r_min=0., r_max=1., method='equally-spaced-noisy'):
        super().__init__()
        if r_min < 0 or r_max < r_min:
            raise ValueError(f"Illegal range [{r_min}, {r_max}]")
        if method not in ('equally-spaced-noisy', 'equally-radius-noisy'):
            raise ValueError(f'Unknown method: {method}')
        self.size = size
        self.r_min = r_min
        self.r_max = r_max
        self.method = method
        self.shape = (size,)

    def sample(self, key):
        ka, kb, kc, ksx, ksy, ksz, kr = jax.random.split(key, 7)
        shape = self.shape
        a = jax.random.uniform(ka, shape, dtype=_dtype())
        b = jax.random.uniform(kb, shape, dtype=_dtype())
        c = jax.random.uniform(kc, shape, dtype=_dtype())
        denom = a + b + c
        eps = 1e-6
        x = jnp.sqrt(a / denom) + eps
        y = jnp.sqrt(b / denom) + eps
        z = jnp.sqrt(c / denom) + eps
        x = x * (jax.random.randint(ksx, shape, 0, 2).astype(x.dtype) * 2 - 1)
        y = y * (jax.random.randint(ksy, shape, 0, 2).astype(y.dtype) * 2 - 1)
        z = z * (jax.random.randint(ksz, shape, 0, 2).astype(z.dtype) * 2 - 1)

        theta = jnp.arccos(z)
        phi = -jnp.arctan2(y, x) + np.pi  # atan2 ranges (-pi, pi]; shift to [0, 2pi)

        u = jax.random.uniform(kr, shape, dtype=_dtype())
        if self.method == 'equally-spaced-noisy':
            lower, upper = self.r_min ** 2, self.r_max ** 2
            r = jnp.sqrt((upper - lower) * u + lower)
        else:
            r = (self.r_max - self.r_min) * u + self.r_min
        return r, theta, phi

    def _internal_vars(self) -> dict:
        d = super()._internal_vars()
        d.update(dict(r_min=self.r_min, r_max=self.r_max, method=self.method))
        return d


class GeneratorHypercube(BaseGenerator):
    r"""IID (or quasi-Monte-Carlo) points in a ``dim``-dimensional box — the
    high-dimensional companion to :func:`operators.stde_laplacian`. No
    reference counterpart (the reference's most general sampler,
    ``generators.py:419-569`` GeneratorND, is a per-axis meshgrid whose point
    count is the *product* of the axis grids — unusable past a handful of
    dimensions).

    With ``boundary=True`` the points land ON the box boundary: a uniform
    interior draw with one coordinate snapped to its min or max face. The
    face is chosen with probability proportional to its (d-1)-measure
    (:math:`\prod_{j \ne i} (b_j - a_j)`, i.e. axis ``i`` with probability
    :math:`\propto 1/(b_i - a_i)`, either side equally), and the draw is
    uniform within each face — so the sample is uniform on the *whole*
    boundary and an unweighted mean over it is an unbiased boundary-integral
    estimate even for anisotropic boxes. Concatenate interior + boundary
    generators (``g_in + g_bnd``) to feed a boundary-penalty loss.

    :param size: number of points.
    :param dim: number of dimensions (columns returned).
    :param r_min: scalar or per-axis lower bounds. Defaults to 0.
    :param r_max: scalar or per-axis upper bounds. Defaults to 1.
    :param method: 'uniform' (iid) or 'halton' (randomized low-discrepancy,
        ``dim`` <= 15, interior only).
    :param boundary: sample the boundary instead of the interior.
    """

    def __init__(self, size, dim, r_min=0.0, r_max=1.0, method='uniform', boundary=False):
        super().__init__()
        if dim < 1:
            raise ValueError(f"dim must be >= 1, got {dim}")
        r_min = tuple(r_min) if np.ndim(r_min) else (float(r_min),) * dim
        r_max = tuple(r_max) if np.ndim(r_max) else (float(r_max),) * dim
        if len(r_min) != dim or len(r_max) != dim:
            raise ValueError(
                f"r_min/r_max must be scalars or length-{dim}: got {len(r_min)}/{len(r_max)}")
        if any(hi <= lo for lo, hi in zip(r_min, r_max)):
            raise ValueError(f"Illegal box [{r_min}, {r_max}]")
        if method not in ('uniform', 'halton'):
            raise ValueError(f'Unknown method: {method}')
        if method == 'halton':
            if boundary:
                raise ValueError("method='halton' samples the interior; use "
                                 "method='uniform' with boundary=True")
            if dim > len(_HALTON_PRIMES):
                raise ValueError(f"method='halton' supports up to "
                                 f"{len(_HALTON_PRIMES)} dimensions, got {dim}")
        self.size = size
        self.dim = dim
        self.r_min, self.r_max = r_min, r_max
        self.method = method
        self.boundary = boundary

    def sample(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        n, d = self.size, self.dim
        lo = jnp.asarray(self.r_min, dtype=_dtype())
        hi = jnp.asarray(self.r_max, dtype=_dtype())
        if self.method == 'halton':
            u = _halton(k1, n, d)
        else:
            u = jax.random.uniform(k1, (n, d), dtype=_dtype())
        pts = lo + (hi - lo) * u
        if self.boundary:
            # face measure prod_{j!=i} L_j  =>  P(axis i) ∝ 1/L_i
            inv_len = 1.0 / (jnp.asarray(self.r_max, dtype=jnp.float32)
                             - jnp.asarray(self.r_min, dtype=jnp.float32))
            face_dim = jax.random.categorical(k2, jnp.log(inv_len), shape=(n,))
            side = jax.random.randint(k3, (n, 1), 0, 2).astype(pts.dtype)
            onehot = jax.nn.one_hot(face_dim, d, dtype=pts.dtype)
            face_val = lo * (1 - side) + hi * side
            pts = pts * (1 - onehot) + face_val * onehot
        return tuple(pts[:, i] for i in range(d))

    def _internal_vars(self) -> dict:
        d = super()._internal_vars()
        d.update(dict(dim=self.dim, r_min=self.r_min, r_max=self.r_max,
                      method=self.method, boundary=self.boundary))
        return d


# ------------------------------------------------------------- combinators

class ConcatGenerator(BaseGenerator):
    r"""Concatenates the sample vectors of its sub-generators
    (``g1 + g2``; reference ``generators.py:658-688``)."""

    def __init__(self, *generators):
        super().__init__()
        self.generators = generators
        self.size = sum(gen.size for gen in generators)

    @property
    def jittable(self):
        return all(g.jittable for g in self.generators)

    def sample(self, key):
        keys = jax.random.split(key, len(self.generators))
        all_examples = [_as_tuple(g.sample(k)) for g, k in zip(self.generators, keys)]
        n_cols = len(all_examples[0])
        if any(len(e) != n_cols for e in all_examples):
            raise ValueError("Sub-generators return different numbers of columns")
        cols = tuple(jnp.concatenate([e[j] for e in all_examples]) for j in range(n_cols))
        return cols[0] if n_cols == 1 else cols

    def _internal_vars(self) -> dict:
        d = super()._internal_vars()
        d.update(dict(generators=self.generators))
        return d


class StaticGenerator(BaseGenerator):
    """Samples the sub-generator once at construction and returns the same
    samples every time (reference ``generators.py:691-714``)."""

    def __init__(self, generator):
        super().__init__()
        self.generator = generator
        self.size = generator.size
        self.examples = generator.sample(next_rng_key())

    def sample(self, key):
        return self.examples

    def _internal_vars(self) -> dict:
        d = super()._internal_vars()
        d.update(dict(generator=self.generator, examples=self.examples))
        return d


class PredefinedGenerator(BaseGenerator):
    """A generator of fixed, user-provided points (reference ``generators.py:717-749``)."""

    def __init__(self, *xs):
        super().__init__()
        self.size = len(xs[0])
        for x in xs:
            if self.size != len(x):
                raise ValueError(f'tensors of different lengths encountered {self.size} != {len(x)}')
        self.xs = tuple(jnp.asarray(x, dtype=_dtype()).flatten() for x in xs)

    def sample(self, key):
        if len(self.xs) == 1:
            return self.xs[0]
        return self.xs

    def _internal_vars(self) -> dict:
        d = super()._internal_vars()
        d.update(dict(xs=self.xs))
        return d


class TransformGenerator(BaseGenerator):
    """Applies transformations to the sample vectors
    (reference ``generators.py:752-801``).

    :param generator: base generator.
    :param transforms: list of per-column callables (None = identity).
    :param transform: a single callable applied to the whole output tuple.
    """

    def __init__(self, generator, transforms=None, transform=None):
        super().__init__()
        self.generator = generator
        self.size = generator.size
        if transforms is not None and transform is not None:
            raise ValueError("transform and transforms cannot be both specified")
        if transforms is not None:
            self.trans = [(lambda x: x) if t is None else t for t in transforms]
        elif transform is not None:
            self.trans = transform
        else:
            self.trans = lambda x: x

    @property
    def jittable(self):
        return self.generator.jittable

    def sample(self, key):
        xs = self.generator.sample(key)
        if not isinstance(xs, tuple):
            if callable(self.trans):
                return self.trans(xs)
            return self.trans[0](xs)
        if callable(self.trans):
            return self.trans(*xs)
        return tuple(t(x) for t, x in zip(self.trans, xs))

    def _internal_vars(self) -> dict:
        d = super()._internal_vars()
        d.update(dict(generator=self.generator, trans=self.trans))
        return d


class EnsembleGenerator(BaseGenerator):
    r"""Returns ALL the samples of its sub-generators as one tuple
    (``g1 * g2``; reference ``generators.py:804-845``). Sub-generators must
    have equal sizes."""

    def __init__(self, *generators):
        super().__init__()
        self.size = generators[0].size
        for i, gen in enumerate(generators):
            if gen.size != self.size:
                raise ValueError(f"gens[{i}].size ({gen.size}) != gens[0].size ({self.size})")
        self.generators = generators

    @property
    def jittable(self):
        return all(g.jittable for g in self.generators)

    def sample(self, key):
        keys = jax.random.split(key, len(self.generators))
        ret = tuple()
        for g, k in zip(self.generators, keys):
            ret += _as_tuple(g.sample(k))
        return ret[0] if len(ret) == 1 else ret

    def _internal_vars(self) -> dict:
        d = super()._internal_vars()
        d.update(dict(generators=self.generators))
        return d


class MeshGenerator(BaseGenerator):
    r"""Returns a meshgrid of the samples of its sub-generators
    (``g1 ^ g2``; reference ``generators.py:848-894``). Nested MeshGenerators
    are flattened so ``(g1 ^ g2) ^ g3 == MeshGenerator(g1, g2, g3)``."""

    def __init__(self, *generators):
        super().__init__()
        self.generators = []
        for g in generators:
            if isinstance(g, MeshGenerator):
                self.generators.extend(g.generators)
            else:
                self.generators.append(g)
        self.size = int(np.prod(tuple(g.size for g in self.generators)))

    @property
    def jittable(self):
        return all(g.jittable for g in self.generators)

    def sample(self, key):
        keys = jax.random.split(key, len(self.generators))
        ret = tuple()
        for g, k in zip(self.generators, keys):
            ret += _as_tuple(g.sample(k))
        if len(ret) == 1:
            return ret[0]
        grids = jnp.meshgrid(*ret, indexing='ij')
        return tuple(g.flatten() for g in grids)

    def _internal_vars(self) -> dict:
        d = super()._internal_vars()
        d.update(dict(generators=self.generators))
        return d


class FilterGenerator(BaseGenerator):
    """Applies a boolean filter to the samples before returning them
    (reference ``generators.py:904-944``).

    Two modes:

    - **dynamic** (default, reference semantics): the output size varies with
      the mask; incompatible with XLA's static shapes, so the generator is
      not jittable and solvers fall back to host-side sampling.
    - **fixed_size=True** (TPU-native): always returns exactly ``size``
      points, drawn uniformly with replacement from the points that pass the
      filter (rejection sampling with replacement — the same conditional
      distribution). Static shapes make the generator jittable, so ``fit()``
      stays on the chunked on-device scan.

    ``filter_fn`` maps a list of arrays to a boolean mask.
    """

    def __init__(self, generator, filter_fn, size=None, update_size=True,
                 fixed_size=False):
        super().__init__()
        self.generator = generator
        self.filter_fn = filter_fn
        self.size = generator.size if size is None else size
        self.fixed_size = bool(fixed_size)
        self.update_size = False if fixed_size else update_size

    @property
    def jittable(self):
        return self.fixed_size and self.generator.jittable

    def sample(self, key):
        if self.fixed_size:
            return self._sample_fixed(key)
        xs = self.generator.sample(key)
        single = not isinstance(xs, tuple)
        xs = list(_as_tuple(xs))
        mask = self.filter_fn(xs)
        xs = [x[mask] for x in xs]
        if self.update_size:
            self.size = len(xs[0])
        return xs[0] if single or len(xs) == 1 else tuple(xs)

    def _sample_fixed(self, key):
        """Static-shape filtering: uniform choice (with replacement) among the
        mask-passing indices via a size-bounded ``nonzero``. Undefined when NO
        point passes (the count is clamped to 1 to stay finite)."""
        k1, k2 = jax.random.split(key)
        xs = self.generator.sample(k1)
        single = not isinstance(xs, tuple)
        xs = list(_as_tuple(xs))
        mask = jnp.asarray(self.filter_fn(xs)).reshape(-1)
        n = xs[0].shape[0]
        idx_valid = jnp.nonzero(mask, size=n, fill_value=0)[0]
        count = jnp.maximum(mask.sum(), 1)
        choice = jax.random.randint(k2, (self.size,), 0, count)
        picked = idx_valid[choice]
        out = [x[picked] for x in xs]
        return out[0] if single or len(out) == 1 else tuple(out)

    def _internal_vars(self) -> dict:
        d = super()._internal_vars()
        d.update(dict(generator=self.generator, filter_fn=self.filter_fn,
                      fixed_size=self.fixed_size))
        return d


class ResampleGenerator(BaseGenerator):
    """Shuffles and resamples the sub-generator's output, with or without
    replacement (reference ``generators.py:955-993``)."""

    def __init__(self, generator, size=None, replacement=False):
        super().__init__()
        self.generator = generator
        self.size = generator.size if size is None else size
        self.replacement = replacement

    @property
    def jittable(self):
        return self.generator.jittable

    def sample(self, key):
        k1, k2 = jax.random.split(key)
        if self.replacement:
            indices = jax.random.randint(k1, (self.size,), 0, self.generator.size)
        else:
            indices = jax.random.permutation(k1, self.generator.size)[:self.size]
        xs = self.generator.sample(k2)
        if not isinstance(xs, tuple):
            return xs[indices]
        return tuple(x[indices] for x in xs)

    def _internal_vars(self) -> dict:
        d = super()._internal_vars()
        d.update(dict(generator=self.generator, replacement=self.replacement))
        return d


class BatchGenerator(BaseGenerator):
    """Caches samples and returns fixed-size batches, refilling the cache as
    needed (reference ``generators.py:996-1036``). Stateful across calls, so
    not jittable; solvers use the host path."""

    jittable = False

    def __init__(self, generator, batch_size):
        super().__init__()
        if generator.size <= 0:
            raise ValueError(f"generator has size {generator.size} <= 0")
        self.generator = generator
        self.size = batch_size
        self.cached_xs = list(_as_tuple(generator.sample(next_rng_key())))

    def sample(self, key):
        while len(self.cached_xs[0]) < self.size:
            key, sub = jax.random.split(key)
            new = _as_tuple(self.generator.sample(sub))
            self.cached_xs = [jnp.concatenate([x, n]) for x, n in zip(self.cached_xs, new)]
        batch = [x[:self.size] for x in self.cached_xs]
        self.cached_xs = [x[self.size:] for x in self.cached_xs]
        return batch[0] if len(batch) == 1 else tuple(batch)

    def _internal_vars(self) -> dict:
        d = super()._internal_vars()
        d.update(dict(generator=self.generator))
        return d


class ResidualAdaptiveGenerator(BaseGenerator):
    """Residual-based adaptive collocation sampling (no reference analog).

    Every training step draws ``oversample`` independent batches from the
    wrapped generator, scores each candidate point by the magnitude of the
    current equation residual, and keeps ``generator.size`` of them:

    - ``strategy='power'`` (default): indices are drawn with probability
      proportional to ``score**alpha / mean(score**alpha) + c`` — the RAD
      scheme of Wu et al. (2023), *A comprehensive study of non-adaptive and
      residual-based adaptive sampling for PINNs* (``alpha=1, c=1`` defaults).
    - ``strategy='topk'``: greedily keep the worst-residual points (RAR-D
      style). Sharper but can starve low-residual regions; prefer ``power``.

    The reference library has no adaptive sampling — its only batch
    adaptation is the Eve callback doubling ``n_batches`` (reference
    ``callbacks.py:187-230``). Here selection is a pure static-shape function
    of ``(key, params)``, so it runs *inside* the jitted train step: solvers
    detect ``adaptive`` generators and inject a residual scorer
    (``BaseSolver._residual_scores``). Used standalone or as a validation
    generator it degenerates to the base generator's plain sampling.
    """

    adaptive = True

    def __init__(self, generator, oversample=4, strategy='power', alpha=1.0, c=1.0):
        super().__init__()
        self.check_generator(generator)
        if not generator.jittable:
            raise ValueError('ResidualAdaptiveGenerator requires a jittable base generator')
        if strategy not in ('power', 'topk'):
            raise ValueError(f"unknown strategy {strategy!r}; expected 'power' or 'topk'")
        if int(oversample) < 1:
            raise ValueError(f'oversample must be >= 1, got {oversample}')
        if c < 0:
            raise ValueError(f'c must be >= 0, got {c}')
        self.generator = generator
        self.size = generator.size
        self.oversample = int(oversample)
        self.strategy = strategy
        self.alpha = alpha
        self.c = c

    def sample(self, key):
        return self.generator.sample(key)

    def sample_scored(self, key, scorer):
        """Draw ``oversample * size`` candidates, keep ``size`` by score.

        ``scorer`` maps a tuple of coordinate arrays to per-point scores
        ``(M,)``; selection is detached (integer gather of stop_gradient
        scores), so no gradient flows through the chosen points.
        """
        keys = jax.random.split(key, self.oversample + 1)
        draws = [_as_tuple(self.generator.sample(k)) for k in keys[1:]]
        cand = tuple(jnp.concatenate([d[i] for d in draws]) for i in range(len(draws[0])))
        scores = jax.lax.stop_gradient(scorer(cand)).reshape(-1)
        if self.strategy == 'topk':
            _, idx = jax.lax.top_k(scores, self.size)
        else:
            w = jnp.power(scores, self.alpha)
            # floor keeps log(p) finite when c == 0 and all residuals vanish
            p = jnp.maximum(w / (jnp.mean(w) + jnp.finfo(w.dtype).tiny) + self.c,
                            jnp.finfo(w.dtype).tiny)
            idx = jax.random.categorical(keys[0], jnp.log(p), shape=(self.size,))
        out = tuple(c[idx] for c in cand)
        return out if len(out) > 1 else out[0]

    def _internal_vars(self) -> dict:
        d = super()._internal_vars()
        d.update(dict(generator=self.generator, oversample=self.oversample,
                      strategy=self.strategy, alpha=self.alpha, c=self.c))
        return d


class SamplerGenerator(BaseGenerator):
    """Wraps a generator so every sample comes back as a list of ``(N, 1)``
    column arrays (what the solvers consume; reference ``generators.py:1046-1064``)."""

    def __init__(self, generator):
        super().__init__()
        self.generator = generator
        self.size = generator.size

    @property
    def jittable(self):
        return self.generator.jittable

    @property
    def adaptive(self):
        return getattr(self.generator, 'adaptive', False)

    def sample(self, key):
        samples = _as_tuple(self.generator.sample(key))
        return [u.reshape(-1, 1) for u in samples]

    def sample_scored(self, key, scorer):
        """Adaptive variant of ``sample``; adapts the solver's column-wise
        scorer to the wrapped generator's raw coordinate tuples."""
        samples = _as_tuple(self.generator.sample_scored(
            key, lambda cand: scorer([u.reshape(-1, 1) for u in cand])))
        return [u.reshape(-1, 1) for u in samples]

    def get_examples(self):
        return self.sample(next_rng_key())

    def _internal_vars(self) -> dict:
        d = super()._internal_vars()
        d.update(dict(generator=self.generator))
        return d
