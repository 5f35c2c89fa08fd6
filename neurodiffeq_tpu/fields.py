r"""The autodiff primitive layer: per-sample differentiable fields.

This is the TPU-native counterpart of the reference's tape-based ``diff``
(``/root/reference/neurodiffeq/neurodiffeq.py:7-82``). PyTorch builds a dynamic
autograd graph over ``(N, 1)`` tensors and differentiates with repeated
``autograd.grad(create_graph=True)``. JAX has no global tape, so we represent a
dependent variable as a :class:`Field`: an array-like ``(N, m)`` value **plus**
the underlying per-sample scalar function of the coordinates.

Because every Field is a composition of **per-sample scalar functions**, the
point-to-point Jacobian is diagonal *by construction* — the cross-sample
leakage the reference guards against with shape checks (reference issue #63,
``neurodiffeq.py:9-10``) is impossible here.

Evaluation strategies (hot path first):

1. **Batched Taylor mode** (default; :mod:`neurodiffeq_tpu.ops.taylor`).
   Fields built from known structure — coordinates, networks with Taylor
   rules, elementwise ops with jet rules — carry a ``trule`` that propagates
   truncated Taylor series *in batch* with the whole expression DAG memoized
   per collocation set: u, du/dx, d2u/dx2, du/dy, d2u/dy2 share ONE forward
   pass. Measured ~4x over strategy 2 on TPU for Laplacian workloads.
2. **Per-sample forward-mode composition** (always available). Derivatives
   compose nested ``jax.jvp`` (or single-direction jets) on the per-sample
   function and ``vmap`` over points. Anything the Taylor rules don't cover —
   anchored boundary terms, exotic ops, derivatives of derivative
   combinations — falls back here automatically, per sub-expression.
"""
import numbers
import functools

import jax
import jax.numpy as jnp

from ._version_utils import deprecated_alias

__all__ = [
    'Field', 'CoordSet', 'coordinates', 'coords_from_points', 'scalar_field',
    'network_field', 'composite', 'pin', 'substitute', 'cat', 'diff', 'safe_diff', 'unsafe_diff',
    'set_diff_method', 'get_diff_method', 'set_eval_mode', 'get_eval_mode',
    # field-aware math
    'exp', 'log', 'sin', 'cos', 'tan', 'tanh', 'sinh', 'cosh', 'sqrt', 'abs',
    'sigmoid', 'atan', 'atan2', 'asin', 'acos', 'erf', 'power', 'where', 'maximum', 'minimum',
]

# How high-order derivatives are computed in the per-sample fallback:
#   'jvp'  — nested forward-mode (always correct, O(2^k) for order k)
#   'jet'  — Taylor-mode jets (O(k^2); requires jet rules for all primitives)
#   'auto' — try jet for order >= 2, fall back to nested jvp when a primitive
#            has no jet rule (checked via abstract eval)
_DIFF_METHOD = 'auto'

# Field evaluation strategy: 'taylor' (batched series propagation with
# per-subexpression fallback) or 'compose' (always per-sample vmap).
_EVAL_MODE = 'taylor'


def set_diff_method(method):
    """Set the fallback high-order differentiation strategy: 'auto', 'jet', or 'jvp'."""
    global _DIFF_METHOD
    if method not in ('auto', 'jet', 'jvp'):
        raise ValueError(f"Unknown diff method {method}")
    _DIFF_METHOD = method


def get_diff_method():
    return _DIFF_METHOD


def set_eval_mode(mode):
    """Set the Field evaluation strategy: 'taylor' (default) or 'compose'."""
    global _EVAL_MODE
    if mode not in ('taylor', 'compose'):
        raise ValueError(f"Unknown eval mode {mode}")
    _EVAL_MODE = mode


def get_eval_mode():
    return _EVAL_MODE


class eval_mode:
    """Context manager scoping the evaluation strategy: ``with eval_mode('compose'): ...``.

    The default 'taylor' mode measures at or below per-sample 'compose' cost
    (FLOPs and bytes, XLA cost analysis) on every operator family and at
    every batch scale tested — see benchmarks/mixed_jets_cost.py and
    benchmarks/RESULTS.md. 'compose' remains available as the always-correct
    reference path (it is also what unsupported primitives fall back to
    per-subexpression)."""

    def __init__(self, mode):
        if mode not in ('taylor', 'compose'):
            raise ValueError(f"Unknown eval mode {mode}")
        self.mode = mode
        self._prev = None

    def __enter__(self):
        global _EVAL_MODE
        self._prev = _EVAL_MODE
        _EVAL_MODE = self.mode
        return self

    def __exit__(self, *exc):
        global _EVAL_MODE
        _EVAL_MODE = self._prev
        return False


class CoordSet:
    """The shared batch of collocation points underlying a family of Fields.

    Holds a single ``(N, d)`` array. Coordinate components and all fields
    derived from them reference the same CoordSet instance; combining fields
    from different CoordSets is an error (they live on different samples).
    Also owns the memoized Taylor-evaluation context for the hot path.
    """

    __slots__ = ('points', '_tctx')

    def __init__(self, points):
        points = jnp.asarray(points)
        if points.ndim != 2:
            raise ValueError(f"points must be (N, d), got shape {points.shape}")
        self.points = points
        self._tctx = None

    @property
    def n_samples(self):
        return self.points.shape[0]

    @property
    def n_dims(self):
        return self.points.shape[1]

    def get_ctx(self, order):
        """Taylor context of at least the given order (shared & memoized)."""
        from .ops.taylor import TContext
        if self._tctx is None or self._tctx.order < order:
            self._tctx = TContext(self.points, order)
        return self._tctx

    def coord_fields(self):
        """Return the d coordinate components as Fields (each knows its index)."""
        return tuple(
            Field(_make_coord_fn(i), self, index=i, trule=_make_coord_trule(i))
            for i in range(self.n_dims)
        )


def _make_coord_fn(i):
    return lambda xs: xs[i]


def _make_coord_trule(i):
    def trule(ctx):
        from .ops.taylor import coordinate_series
        return coordinate_series(i, ctx)

    return trule


def coordinates(*arrays, dtype=None):
    """Build coordinate Fields from per-component arrays.

    :param arrays: d arrays, each of shape (N,) or (N, 1), numpy or JAX.
    :return: A tuple of d coordinate Fields sharing one CoordSet.
    """
    from .utils import get_default_dtype
    dtype = dtype or get_default_dtype()
    cols = [jnp.asarray(a, dtype=dtype).reshape(-1) for a in arrays]
    n = cols[0].shape[0]
    for c in cols:
        if c.shape[0] != n:
            raise ValueError(f"coordinate arrays must have equal lengths, got {n} != {c.shape[0]}")
    cs = CoordSet(jnp.stack(cols, axis=1))
    return cs.coord_fields()


def coords_from_points(points):
    """Build coordinate Fields from a single ``(N, d)`` array."""
    return CoordSet(points).coord_fields()


class Field:
    r"""An ``(N, m)`` array-like quantity that remembers how it depends on the coordinates.

    ``fn(xs, *aux) -> ()`` or ``(m,)`` is the per-sample function; ``aux`` are
    per-sample constant arrays (each ``(N, k)``) vmapped alongside the points —
    they carry values that combine with the field but are *constant with
    respect to the coordinates* (matching torch semantics for tensors outside
    the autograd graph).

    Optional hot-path metadata:

    - ``trule(ctx) -> TSeries``: batched Taylor propagation rule;
    - ``_combine = (kind, op, specs, operands)``: how to rebuild the value from
      batched operand values (elementwise/cat/slice/sum);
    - ``_dinfo = (parent, alpha)``: this field is the mixed partial
      :math:`\partial^\alpha` of ``parent`` (``alpha``: tuple of
      ``(axis, order)`` pairs) — its value reads off the parent's Taylor
      series, with genuinely mixed indices recovered by polarization
      (:func:`neurodiffeq_tpu.ops.taylor.partial_entry`);
    - ``torder``: the series order this field's value needs.
    """

    __slots__ = ('fn', 'coords', 'aux', 'index', '_value',
                 'trule', 'torder', '_combine', '_dinfo', '_shape')

    def __init__(self, fn, coords, aux=(), index=None, value=None,
                 trule=None, torder=0, combine=None, dinfo=None):
        self.fn = fn
        self.coords = coords
        self.aux = tuple(aux)
        self.index = index  # set only for raw coordinate components
        self._value = value
        self.trule = trule
        self.torder = torder
        self._combine = combine
        self._dinfo = dinfo
        self._shape = None

    # ------------------------------------------------------------------ value
    @property
    def value(self):
        """Evaluate (and cache) the field on its collocation points -> (N, m)."""
        if self._value is None:
            if _EVAL_MODE == 'taylor':
                ctx = self.coords.get_ctx(self.torder)
                self._value = self._value_with_ctx(ctx)
            else:
                self._value = self._vmap_value()
        return self._value

    def _vmap_value(self):
        out = jax.vmap(self.fn)(self.coords.points, *self.aux)
        if out.ndim == 1:
            out = out[:, None]
        return out

    def _value_with_ctx(self, ctx):
        def compute():
            if self._dinfo is not None:
                parent, alpha = self._dinfo
                from .ops.taylor import partial_entry
                d = partial_entry(parent, alpha, ctx)
                # series coefficients may be broadcast-shaped; readers get (N, m)
                return jnp.broadcast_to(d, (self.coords.n_samples, d.shape[-1]))
            if self.trule is not None:
                from .ops.taylor import teval
                # value-only read: order 0 (a deeper cached series serves it free)
                return teval(self, ctx, order=0).c0
            if self._combine is not None:
                kind, op, specs, operands = self._combine
                vals = []
                op_iter = iter(operands)
                for skind, payload in specs:
                    if skind == 'field':
                        vals.append(next(op_iter)._value_with_ctx(ctx))
                    else:  # const or aux: payload is the raw array/scalar
                        vals.append(payload)
                if kind == 'elementwise':
                    return jnp.broadcast_to(
                        op(*vals), _broadcast_shape(vals, self.coords.n_samples))
                if kind == 'cat':
                    return jnp.concatenate([_as_2d(v, self.coords.n_samples) for v in vals], axis=1)
                if kind == 'slice':
                    col = op
                    if isinstance(col, int):
                        sl = slice(col, col + 1) if col != -1 else slice(-1, None)
                    else:
                        sl = col
                    return vals[0][:, sl]
                if kind == 'sum':
                    return vals[0].sum(axis=1, keepdims=True)
                raise RuntimeError(f"unknown combine kind {kind}")  # pragma: no cover
            global _TAYLOR_FALLBACKS
            _TAYLOR_FALLBACKS += 1
            return self._vmap_value()

        return ctx.memo(self, 'v', compute)

    @property
    def values(self):
        return self.value

    def detach(self):
        return self.value

    def numpy(self):
        import numpy as np
        return np.asarray(self.value)

    @property
    def shape(self):
        if self._value is not None:
            return self._value.shape
        if self._shape is None:
            d = self.coords.n_dims
            dtype = self.coords.points.dtype
            out = jax.eval_shape(
                self.fn,
                jax.ShapeDtypeStruct((d,), dtype),
                *[jax.ShapeDtypeStruct(a.shape[1:], a.dtype) for a in self.aux],
            )
            m = 1 if out.ndim == 0 else out.shape[0]
            self._shape = (self.coords.n_samples, m)
        return self._shape

    @property
    def ndim(self):
        return 2

    def __len__(self):
        return self.coords.n_samples

    # NOTE: Field deliberately does NOT implement __jax_array__ / __array__.
    # An implicit conversion would silently sever the field's dependence on the
    # coordinates and make later derivatives (H1 losses, operators) wrong, so
    # `jnp.exp(field)` fails loudly; use `field.value` for the raw array or the
    # field-aware math functions in this module (exp, sin, tanh, ...).
    # __array_ufunc__ = None makes numpy defer binary ops to our reflected
    # methods (np_array * field -> Field.__rmul__) instead of iterating.
    __array_ufunc__ = None

    # ------------------------------------------------------------- arithmetic
    def __add__(self, other):
        return _lift_call(jnp.add, self, other)

    def __radd__(self, other):
        return _lift_call(jnp.add, other, self)

    def __sub__(self, other):
        return _lift_call(jnp.subtract, self, other)

    def __rsub__(self, other):
        return _lift_call(jnp.subtract, other, self)

    def __mul__(self, other):
        return _lift_call(jnp.multiply, self, other)

    def __rmul__(self, other):
        return _lift_call(jnp.multiply, other, self)

    def __truediv__(self, other):
        return _lift_call(jnp.divide, self, other)

    def __rtruediv__(self, other):
        return _lift_call(jnp.divide, other, self)

    def __pow__(self, other):
        return _lift_call(jnp.power, self, other)

    def __rpow__(self, other):
        return _lift_call(jnp.power, other, self)

    def __neg__(self):
        return _lift_call(jnp.negative, self)

    def __abs__(self):
        return _lift_call(jnp.abs, self)

    def abs(self):
        return _lift_call(jnp.abs, self)

    # comparisons evaluate eagerly to plain boolean arrays
    def __lt__(self, other):
        return self.value < _raw(other)

    def __le__(self, other):
        return self.value <= _raw(other)

    def __gt__(self, other):
        return self.value > _raw(other)

    def __ge__(self, other):
        return self.value >= _raw(other)

    # ---------------------------------------------------------------- slicing
    def __getitem__(self, key):
        """Support column selection: u[:, i] and u[:, a:b] (keeps 2-D value)."""
        if not (isinstance(key, tuple) and len(key) == 2 and key[0] == slice(None)):
            raise TypeError(
                "Fields only support column indexing of the form u[:, i] or u[:, a:b]"
            )
        col = key[1]
        inner = self.fn

        if isinstance(col, int):
            # col+1 would wrap to an empty slice for col == -1; use [-1:None]
            # (matching slice_series / _value_with_ctx in ops.taylor).
            sl = slice(col, col + 1) if col != -1 else slice(-1, None)

            def fn(xs, *aux):
                return jnp.atleast_1d(inner(xs, *aux))[sl]
        elif isinstance(col, slice):
            def fn(xs, *aux):
                return jnp.atleast_1d(inner(xs, *aux))[col]
        else:
            raise TypeError(f"Unsupported column index {col}")

        trule = None
        if self.trule is not None:
            def trule(ctx, _parent=self, _col=col):
                from .ops.taylor import teval, slice_series
                return slice_series(teval(_parent, ctx), _col)

        return Field(fn, self.coords, self.aux, trule=trule, torder=self.torder,
                     combine=('slice', col, [('field', None)], [self]))

    def reshape(self, *shape):
        """Only identity/(N,1) reshapes are meaningful for fields; returns self
        when the target matches, else the raw reshaped value."""
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        if shape in ((-1, 1), self.shape):
            return self
        return self.value.reshape(*shape)

    # -------------------------------------------------------------- reductions
    def mean(self, axis=None):
        return self.value.mean(axis=axis)

    def sum(self, axis=None, keepdims=False):
        """Full reduction returns a raw scalar; axis=1 keeps a Field."""
        if axis in (1, -1):
            inner = self.fn

            def fn(xs, *aux):
                out = jnp.atleast_1d(inner(xs, *aux)).sum()
                return jnp.atleast_1d(out) if keepdims else out

            trule = None
            if self.trule is not None:
                def trule(ctx, _parent=self):
                    from .ops.taylor import teval, sum_series
                    return sum_series(teval(_parent, ctx), keepdims)

            return Field(fn, self.coords, self.aux, trule=trule, torder=self.torder,
                         combine=('sum', None, [('field', None)], [self]))
        return self.value.sum(axis=axis)

    def max(self, axis=None):
        return self.value.max(axis=axis)

    def min(self, axis=None):
        return self.value.min(axis=axis)

    def item(self):
        return self.value.item()

    def __repr__(self):
        return f"Field(shape={self.shape})"


# Count of Fields whose batched Taylor evaluation fell back to the per-sample
# vmap path (no trule / no combine plan). Zero across a jitted residual means
# the whole loss ran on the batched engine; tests assert this for the operator
# suite. NOTE: incremented at TRACE time — read it after building/tracing, and
# reset first.
_TAYLOR_FALLBACKS = 0


def taylor_fallback_count():
    """Number of per-sample fallback evaluations since the last reset."""
    return _TAYLOR_FALLBACKS


def reset_taylor_fallback_count():
    global _TAYLOR_FALLBACKS
    _TAYLOR_FALLBACKS = 0


def _raw(x):
    return x.value if isinstance(x, Field) else x


def _as_2d(v, n):
    v = jnp.asarray(v)
    if v.ndim == 0:
        v = jnp.broadcast_to(v[None, None], (n, 1))
    elif v.ndim == 1:
        v = jnp.broadcast_to(v[None, :], (n, v.shape[0]))
    return v


def _broadcast_shape(vals, n):
    m = 1
    for v in vals:
        va = jnp.asarray(v)
        if va.ndim >= 1:
            m = max(m, va.shape[-1])
    return (n, m)


def _is_scalar_like(x):
    if isinstance(x, numbers.Number):
        return True
    if isinstance(x, (jnp.ndarray, jax.Array)) or hasattr(x, 'ndim'):
        return getattr(x, 'ndim', None) == 0
    return False


# elementwise ops with jet rules: safe for batched Taylor propagation
# (tan/atan/atan2/asin/acos/where lack jet rules or take non-float operands)
_JET_SAFE_OPS = None


def _jet_safe_ops():
    global _JET_SAFE_OPS
    if _JET_SAFE_OPS is None:
        _JET_SAFE_OPS = {
            jnp.add, jnp.subtract, jnp.multiply, jnp.divide, jnp.power,
            jnp.negative, jnp.exp, jnp.log, jnp.sin, jnp.cos, jnp.tanh,
            jnp.sinh, jnp.cosh, jnp.sqrt, jnp.abs, jax.nn.sigmoid,
            jax.scipy.special.erf, jnp.maximum, jnp.minimum,
        }
    return _JET_SAFE_OPS


def composite(fn, *args):
    """Combine several Fields through ONE composite elementwise function.

    ``fn`` receives raw per-sample (or batched — it must be shape-polymorphic,
    which plain jnp formulas are) values and returns one array. Compared to
    building the same expression op-by-op, the whole formula propagates its
    Taylor series as a single unit: its partial derivatives are evaluated with
    ``jax.jvp`` on the fused formula, which keeps condition-reparameterization
    overhead negligible next to the network evaluation.
    """
    return _lift_call(fn, *args, _composite=True)


def _lift_call(op, *args, _composite=False, **op_kwargs):
    """Apply an elementwise jnp op across Fields / scalars / per-sample arrays.

    Non-Field array arguments whose leading dimension equals N are treated as
    per-sample constants (constant w.r.t. the coordinates); other arrays are
    broadcast constants.
    """
    fields = [a for a in args if isinstance(a, Field)]
    if not fields:
        return op(*args, **op_kwargs)

    cs = fields[0].coords
    for f in fields[1:]:
        if f.coords is not cs:
            raise ValueError(
                "Cannot combine Fields defined on different coordinate sets "
                "(they correspond to different collocation batches)."
            )
    n = cs.n_samples

    # build per-arg evaluation plan
    specs = []  # (kind, payload)
    aux_all = []
    operand_fields = []
    for a in args:
        if isinstance(a, Field):
            specs.append(('field', (a.fn, len(aux_all), len(aux_all) + len(a.aux))))
            aux_all.extend(a.aux)
            operand_fields.append(a)
        elif _is_scalar_like(a):
            specs.append(('const', a))
        else:
            arr = jnp.asarray(a)
            if arr.ndim >= 1 and arr.shape[0] == n and arr.ndim <= 2:
                if arr.ndim == 1:
                    arr = arr[:, None]
                specs.append(('aux', (len(aux_all), len(aux_all) + 1)))
                aux_all.append(arr)
            else:
                specs.append(('const', arr))

    def fn(xs, *aux):
        vals = []
        for kind, payload in specs:
            if kind == 'field':
                sub_fn, lo, hi = payload
                vals.append(sub_fn(xs, *aux[lo:hi]))
            elif kind == 'aux':
                lo, hi = payload
                v = aux[lo]
                vals.append(v[0] if v.shape == (1,) else v)
            else:
                vals.append(payload)
        return op(*vals, **op_kwargs)

    # batched-value combine plan: operand values / raw consts / aux arrays
    combine_specs = []
    for (kind, payload), a in zip(specs, args):
        if kind == 'field':
            combine_specs.append(('field', None))
        elif kind == 'aux':
            combine_specs.append(('aux', jnp.asarray(a).reshape(n, -1)))
        else:
            combine_specs.append(('const', a))

    torder = max(f.torder for f in operand_fields)

    # Taylor rule when every Field operand has one and the op is jet-safe;
    # scalar constants stay symbolic (zero derivatives handled algebraically,
    # and `x ** 2` keeps its closed-form power rule instead of jet's
    # exp(log x) float-pow path, which NaNs at 0).
    trule = None
    if (not op_kwargs and (_composite or op in _jet_safe_ops())
            and all(f.trule is not None for f in operand_fields)):
        def trule(ctx, _specs=tuple(combine_specs), _operands=tuple(operand_fields), _op=op):
            from .ops.taylor import teval, lifted_series
            arg_descs = []
            it = iter(_operands)
            for kind, payload in _specs:
                if kind == 'field':
                    arg_descs.append(('series', teval(next(it), ctx)))
                elif kind == 'aux':
                    arg_descs.append(('const', payload))
                else:
                    arg_descs.append(('const', payload))
            return lifted_series(_op, arg_descs, ctx)

    return Field(fn, cs, tuple(aux_all), trule=trule, torder=torder,
                 combine=('elementwise', op, combine_specs, operand_fields))


def lift(op):
    """Wrap an elementwise jnp function to be Field-aware."""

    @functools.wraps(op)
    def lifted(*args, **kwargs):
        return _lift_call(op, *args, **kwargs)

    return lifted


exp = lift(jnp.exp)
log = lift(jnp.log)
sin = lift(jnp.sin)
cos = lift(jnp.cos)
tan = lift(jnp.tan)
tanh = lift(jnp.tanh)
sinh = lift(jnp.sinh)
cosh = lift(jnp.cosh)
sqrt = lift(jnp.sqrt)
abs = lift(jnp.abs)  # noqa: A001 - deliberate parity with torch.abs usage
sigmoid = lift(jax.nn.sigmoid)
atan = lift(jnp.arctan)
atan2 = lift(jnp.arctan2)
asin = lift(jnp.arcsin)
acos = lift(jnp.arccos)
erf = lift(jax.scipy.special.erf)
power = lift(jnp.power)
where = lift(jnp.where)
maximum = lift(jnp.maximum)
minimum = lift(jnp.minimum)


def scalar_field(per_sample_fn, coords):
    """Build a Field from a per-sample function of the coordinate components.

    :param per_sample_fn: maps d scalar coordinates to a scalar (or (m,) vector).
    :type per_sample_fn: callable
    :param coords: coordinate Fields (as returned by :func:`coordinates`) or a CoordSet.
    """
    cs = coords if isinstance(coords, CoordSet) else coords[0].coords
    d = cs.n_dims

    def fn(xs):
        return per_sample_fn(*[xs[i] for i in range(d)])

    return Field(fn, cs)


def network_field(apply_fn, coords, ith_unit=None, module=None, params=None):
    """Build the raw-network-output Field ANN(coords).

    :param apply_fn: maps an ``(d,)`` input vector to an ``(m,)`` output vector.
    :param coords: coordinate Fields or a CoordSet.
    :param ith_unit: if set, select a single output column (kept as (1,)).
    :param module: optionally, the network module — if it supports batched
        Taylor propagation (``supports_taylor``), the field gets the fast
        evaluation path.
    :param params: the module's parameters (required with ``module``).
    """
    if isinstance(coords, CoordSet):
        cs = coords
        idxs = tuple(range(cs.n_dims))
    else:
        cs = coords[0].coords
        idxs = tuple(c.index for c in coords)

    if ith_unit is None:
        fn = apply_fn
    else:
        def fn(xs):
            return jnp.atleast_1d(apply_fn(xs))[ith_unit:ith_unit + 1]

    trule = None
    if module is not None and getattr(module, 'supports_taylor', False):
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
            in_series = TSeries(c0, derivs, meta=meta)
            out = module.taylor_apply(params, in_series, ctx)
            if ith_unit is not None:
                out = slice_series(out, ith_unit)
            return out

    return Field(fn, cs, trule=trule)


def pin(field, coord_index, const, derivative_order=0):
    r"""Evaluate a field — or its k-th derivative along one coordinate — at a
    pinned (constant) value of that coordinate.

    This reproduces the reference's boundary-anchor evaluations: IBVP1D builds
    ``x1 = x_max * ones_like(x).requires_grad_()``, evaluates ``ANN(x1, t)``
    and later ``diff(ux1t, x1)`` (``conditions.py:576-598``). Crucially the
    anchor is an *independent* autograd leaf there: ``ANN(x1, t)`` is constant
    w.r.t. ``x``, while its derivative w.r.t. the anchor probes the network's
    own partial. ``pin(u, i, c, k)`` returns exactly
    :math:`\partial^k u/\partial x_i^k` evaluated at ``x_i = c`` — a field of
    the remaining coordinates, with zero derivative in direction ``i``.

    :param field: the Field to anchor.
    :param coord_index: which coordinate to pin.
    :param const: the anchored value.
    :param derivative_order: order of the derivative in the pinned direction
        taken *before* anchoring; 0 returns the pinned field itself.
    """
    if isinstance(field, Field) and field.index is not None:
        raise ValueError("Cannot pin a raw coordinate field")
    inner = field.fn

    def fn(xs, *aux):
        c0 = jnp.asarray(const, dtype=xs.dtype)

        def f_of_c(c):
            return inner(xs.at[coord_index].set(c), *aux)

        g = f_of_c
        for _ in range(derivative_order):
            g = (lambda g_: lambda c: jax.jvp(g_, (c,), (jnp.ones((), xs.dtype),))[1])(g)
        return g(c0)

    return Field(fn, field.coords, field.aux)


# Backward-compatible alias (value-only anchoring)
def substitute(field, coord_index, const):
    """Alias of :func:`pin` with ``derivative_order=0``."""
    return pin(field, coord_index, const)


def cat(fields, dim=1):
    """Concatenate Fields (and/or arrays) along the column axis -> one Field."""
    if dim not in (1, -1):
        raise ValueError("Fields can only be concatenated along columns (dim=1)")
    args = list(fields)
    field_args = [a for a in args if isinstance(a, Field)]
    if not field_args:
        return jnp.concatenate([jnp.atleast_2d(a) for a in args], axis=1)
    cs = field_args[0].coords
    n = cs.n_samples

    # per-sample fn (for derivative composition)
    specs = []
    aux_all = []
    for a in args:
        if isinstance(a, Field):
            if a.coords is not cs:
                raise ValueError("Cannot concatenate Fields on different coordinate sets")
            specs.append(('field', (a.fn, len(aux_all), len(aux_all) + len(a.aux))))
            aux_all.extend(a.aux)
        elif _is_scalar_like(a):
            specs.append(('const', a))
        else:
            arr = jnp.asarray(a)
            if arr.ndim >= 1 and arr.shape[0] == n and arr.ndim <= 2:
                if arr.ndim == 1:
                    arr = arr[:, None]
                specs.append(('aux', (len(aux_all), len(aux_all) + 1)))
                aux_all.append(arr)
            else:
                specs.append(('const', arr))

    def fn(xs, *aux):
        vals = []
        for kind, payload in specs:
            if kind == 'field':
                sub_fn, lo, hi = payload
                vals.append(jnp.atleast_1d(sub_fn(xs, *aux[lo:hi])))
            elif kind == 'aux':
                lo, hi = payload
                vals.append(aux[lo])
            else:
                vals.append(jnp.atleast_1d(jnp.asarray(payload)))
        return jnp.concatenate(vals)

    combine_specs = []
    for (kind, payload), a in zip(specs, args):
        if kind == 'field':
            combine_specs.append(('field', None))
        elif kind == 'aux':
            combine_specs.append(('aux', jnp.asarray(a).reshape(n, -1)))
        else:
            combine_specs.append(('const', a))

    torder = max(f.torder for f in field_args)
    trule = None
    if all(f.trule is not None for f in field_args):
        def trule(ctx, _specs=tuple(combine_specs), _operands=tuple(field_args)):
            from .ops.taylor import teval, constant_series, concat_series
            series = []
            it = iter(_operands)
            for kind, payload in _specs:
                if kind == 'field':
                    series.append(teval(next(it), ctx))
                else:
                    series.append(constant_series(payload, ctx, ctx.points.shape[0]))
            return concat_series(series, ctx.order, ctx.n_dirs)

    return Field(fn, cs, tuple(aux_all), trule=trule, torder=torder,
                 combine=('cat', None, combine_specs, field_args))


# ---------------------------------------------------------------------- diff

def _directional_derivative_fn(fn, idx, order):
    """Nested forward-mode directional derivative of a per-sample function."""

    def dfn(xs, *aux):
        tangent = jnp.zeros_like(xs).at[idx].set(jnp.ones((), xs.dtype))

        f = lambda z: fn(z, *aux)
        for _ in range(order):
            f = _jvp_once(f, tangent)
        return f(xs)

    return dfn


def _jvp_once(f, tangent):
    return lambda z: jax.jvp(f, (z,), (tangent,))[1]


def _jet_derivative_fn(fn, idx, order):
    """Taylor-mode k-th directional derivative: one jet pass, O(k^2) work."""
    from jax.experimental.jet import jet

    def dfn(xs, *aux):
        tangent = jnp.zeros_like(xs).at[idx].set(jnp.ones((), xs.dtype))
        series = [tangent] + [jnp.zeros_like(tangent)] * (order - 1)
        _, out_series = jet(lambda z: fn(z, *aux), (xs,), (series,))
        return out_series[order - 1]

    return dfn


def _jet_supported(fn, idx, order, coords, aux):
    """Abstract-eval the jet derivative to detect missing jet rules."""
    try:
        dfn = _jet_derivative_fn(fn, idx, order)
        jax.eval_shape(
            dfn,
            jax.ShapeDtypeStruct((coords.n_dims,), coords.points.dtype),
            *[jax.ShapeDtypeStruct(a.shape[1:], a.dtype) for a in aux],
        )
        return True
    except Exception:
        return False


@deprecated_alias(x='u')
def unsafe_diff(u, t, order=1):
    """Like :func:`diff` but skips shape validation (reference ``neurodiffeq.py:7``)."""
    return diff(u, t, order=order, shape_check=False)


@deprecated_alias(x='u')
def safe_diff(u, t, order=1):
    """Like :func:`diff` with mandatory shape validation (reference ``neurodiffeq.py:38``)."""
    return diff(u, t, order=order, shape_check=True)


@deprecated_alias(x='u')
def diff(u, t, order=1, shape_check=True):
    r"""The derivative of a field with respect to a coordinate: du/dt of given order.

    TPU-native counterpart of the reference ``diff`` (``neurodiffeq.py:64-82``).
    When ``u`` carries a Taylor rule, the derivative's value is read off the
    shared batched Taylor series of ``u`` (one network forward for all
    derivatives of all orders/directions); otherwise it composes forward-mode
    derivatives of the per-sample function. Either way the result is a lazy
    Field that can be differentiated further.

    :param u: The dependent variable, a Field of column width 1.
    :type u: :class:`Field`
    :param t: The independent variable: a coordinate Field.
    :type t: :class:`Field`
    :param order: Derivative order, defaults to 1.
    :type order: int
    :param shape_check: Validate that both u and t are (N, 1)-shaped fields on
        the same collocation batch. Defaults to True.
    :type shape_check: bool
    :return: The derivative as a Field evaluated on the same points.
    :rtype: :class:`Field`
    """
    if not isinstance(u, Field):
        raise TypeError(
            f"diff expects a Field as the dependent variable, got {type(u)}. "
            f"(Raw arrays have no recorded dependence on the coordinates.)"
        )
    if not isinstance(t, Field) or t.index is None:
        raise TypeError(
            "diff expects the independent variable to be a coordinate Field "
            "(a component returned by `coordinates(...)` or passed into the equation)."
        )
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")

    if shape_check:
        if u.coords is not t.coords:
            raise ValueError(
                "u and t must live on the same collocation batch; "
                "got fields from different coordinate sets"
            )
        if u.shape[1] != 1:
            raise ValueError(
                f"Input shapes must both be (n_samples, 1); got {u.shape} for the "
                f"dependent variable. Pass shape_check=False for multi-column fields."
            )

    method = _DIFF_METHOD
    if order == 1 or method == 'jvp':
        dfn = _directional_derivative_fn(u.fn, t.index, order)
    elif method == 'jet':
        dfn = _jet_derivative_fn(u.fn, t.index, order)
    else:  # auto
        if _jet_supported(u.fn, t.index, order, u.coords, u.aux):
            dfn = _jet_derivative_fn(u.fn, t.index, order)
        else:
            dfn = _directional_derivative_fn(u.fn, t.index, order)

    dinfo = None
    torder = 0
    trule = None
    if u._dinfo is not None:
        # derivative-of-derivative: fold the multi-index into the parent's
        # (same-direction chains extend the order; cross-direction chains
        # become genuinely mixed indices, recovered batched by polarization —
        # ops.taylor.partial_entry)
        from .ops.taylor import _merge_alpha
        parent, palpha = u._dinfo
        alpha = _merge_alpha(palpha, t.index, order)
        dinfo = (parent, alpha)
        torder = parent.torder + sum(o for _, o in alpha)
        trule = _make_deriv_trule(parent, alpha)
    elif u.trule is not None:
        # hot path: the value reads off u's shared Taylor series; the field
        # also carries its OWN series rule (partials along t, read from
        # u's series evaluated `order` deeper) so expressions built from it —
        # e.g. the spherical pattern diff(r**2 * u_r, r) — stay batched.
        alpha = ((t.index, order),)
        dinfo = (u, alpha)
        torder = u.torder + order
        trule = _make_deriv_trule(u, alpha)

    return Field(dfn, u.coords, u.aux, dinfo=dinfo, torder=torder, trule=trule)


def _make_deriv_trule(parent, alpha):
    def trule(ctx):
        from .ops.taylor import derivative_series
        return derivative_series(parent, alpha, ctx)

    return trule
