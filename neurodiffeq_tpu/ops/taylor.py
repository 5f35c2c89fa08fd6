r"""Batched Taylor-mode series propagation for Fields.

The TPU-first replacement for per-derivative nested-``jvp`` chains
(cf. PAPERS.md: Taylor-mode AD / STDE). A :class:`TSeries` holds, for one
batch of N collocation points:

- ``c0``: the value, shape ``(N, m)``;
- ``derivs[k-1]``: the k-th directional derivatives along each of D probe
  directions (the coordinate axes), in one of two layouts chosen PER CONTEXT
  by batch size (``TContext.stacked``):

  * *stacked*: one ``(D, N|1, m)`` array — fewest kernels; wins at small
    batches where per-kernel overhead dominates (24.9M vs 19.5M pts/s at 1k
    points on v5e, tanh MLP 2-512-1 laplacian train step);
  * *per-direction*: a D-tuple of ``(N|1, m)`` arrays — lets XLA fuse each
    direction's whole chain into the surrounding elementwise pipeline; wins
    at large batches where HBM traffic dominates (28-33M vs 11.7M pts/s at
    65k points; the stacked layout forces (D, N, H) materializations and
    batched dots that break fusion).

  Layouts never mix within a context (a mixed pipeline measured WORSE than
  either pure layout: the stack/unstack boundary breaks fusion on both
  sides). The rules below are layout-polymorphic via ``_dmap`` + trailing-dim
  broadcasting; only the series constructors and stack-producing fallbacks
  branch.

*Broadcast shapes* carry the rest of the performance: coordinate tangents
are CONSTANT across the batch (they are unit vectors) and stay constant
through every affine layer — so the first-order tangent of a width-H hidden
layer is a ``(1, H)`` / ``(D, 1, H)`` array, not full-batch. Materialization
happens only where a nonlinearity mixes in batch-dependent values. For an
MLP Laplacian this reproduces the hand-derived structure (second derivative
= ``sigma''(h) * row_norms(W1)^2 @ W2``) automatically.

Rules:

- *Coordinate* components and constants have closed-form series.
- *Linear layers* map series coefficient-wise (exact; preserves broadcasting).
- *Elementwise ops* (activations, condition formulas) propagate by manual
  chain rules for order <= 2 (first/second partials of the op are computed
  ONCE on ``(N, m)`` data via ``jax.jvp`` and broadcast over directions), and
  by ``jax.experimental.jet`` for higher orders.
- The expression DAG is memoized per :class:`TContext`, so e.g. the network
  forward pass is computed ONCE for u, u_x, u_xx, u_y, u_yy.
"""
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.jet import jet

__all__ = ['TSeries', 'TContext', 'teval', 'elementwise_series', 'constant_series',
           'affine_series', 'concat_series', 'slice_series', 'sum_series', 'add_series',
           'derivative_series', 'partial_entry']


class TSeries:
    __slots__ = ('c0', 'derivs', 'meta')

    def __init__(self, c0, derivs, meta=None):
        self.c0 = c0          # (N, m)
        self.derivs = derivs  # list over orders 1..K of D-tuples of (N|1, m)
        self.meta = meta      # e.g. 'raw_coords': c0 = points, tangents = I

    @property
    def order(self):
        return len(self.derivs)


# Batch-size crossover between the two derivative layouts (measured on TPU
# v5e, tanh MLP 2-512-1 laplacian train step, interleaved A/B):
# - stacked (D, N, m) arrays issue ~half the kernels -> 25% faster at 1k pts
#   where per-kernel overhead dominates (24.9M vs 19.5M pts/s);
# - per-direction (N, m) tuples let XLA fuse each direction's whole chain ->
#   2.8x faster at 65k pts (33M vs 11.7M) where HBM traffic dominates, and
#   already +5-12% at 4096 pts; the two tie at 2048 (measurement floor).
_STACKED_MAX_BATCH = 2048


class TContext:
    """Evaluation context for one collocation set: probe directions are the
    coordinate axes; ``cache`` memoizes (field -> TSeries / value) by id.

    ``stacked`` picks the derivative layout for every series built under this
    context: ``True`` -> each ``derivs[k]`` is one stacked ``(D, N|1, m)``
    array; ``False`` -> a D-tuple of ``(N|1, m)`` arrays. The rules below are
    layout-polymorphic (see ``_dmap``); layouts never mix within a context."""

    def __init__(self, points, order):
        self.points = points
        self.order = order
        n, d = points.shape
        self.directions = jnp.eye(d, dtype=points.dtype)  # (D=d, d)
        self.n_dirs = d
        try:
            self.stacked = bool(n <= _STACKED_MAX_BATCH)
        except Exception:
            # symbolic batch dimension (jax.export): size unknown, assume big
            self.stacked = False
        # (id, kind) -> (field, payload); the field reference keeps ids stable
        self.cache = {}
        # Mixed-partial support: the MAIN context's probe directions are the
        # coordinate axes (is_axes=True); auxiliary contexts carry synthetic
        # direction combinations over a subset of axes, from which mixed
        # partials are extracted by polarization (see partial_entry). All
        # auxiliary contexts and extracted entries memoize on ``base.cache``.
        self.base = self
        self.is_axes = True
        self.axes = None       # aux only: coordinate indices the dirs span
        self.dirs_sub = None   # aux only: static (J, len(axes)) direction matrix

    def memo(self, field, kind, compute):
        key = (id(field), kind)
        hit = self.cache.get(key)
        if hit is not None:
            return hit[1]
        out = compute()
        self.cache[key] = (field, out)
        return out

    def at_order(self, order):
        """A view of this context with a different target series order.

        Shares points/directions/layout and the memo cache, so order-aware
        evaluation (e.g. a derivative field reading its parent's series one
        order deeper) composes with full memoization."""
        if order == self.order:
            return self
        view = object.__new__(TContext)
        view.points = self.points
        view.order = order
        view.directions = self.directions
        view.n_dirs = self.n_dirs
        view.stacked = self.stacked
        view.cache = self.cache
        view.base = self.base
        view.is_axes = self.is_axes
        view.axes = self.axes
        view.dirs_sub = self.dirs_sub
        return view

    def aux_for(self, axes, order):
        """The auxiliary polarization context for mixed partials over ``axes``
        at total ``order``: probe directions are the extraction-plan direction
        combinations embedded into the full coordinate space. Memoized on the
        base context, so every extraction over the same (axes, order) — e.g.
        both u_xy and u_yx entries of a vector operator — shares one series
        evaluation of each field."""
        base = self.base
        key = ('auxctx', axes, order)
        hit = base.cache.get(key)
        if hit is not None:
            return hit[1]
        dirs = _extraction_plan(len(axes), order)[2]
        full = np.zeros((dirs.shape[0], base.points.shape[1]))
        full[:, list(axes)] = dirs
        ctx = object.__new__(TContext)
        ctx.points = base.points
        ctx.order = order
        ctx.directions = jnp.asarray(full, dtype=base.points.dtype)
        ctx.n_dirs = dirs.shape[0]
        ctx.stacked = base.stacked
        ctx.cache = {}
        ctx.base = base
        ctx.is_axes = False
        ctx.axes = axes
        ctx.dirs_sub = dirs
        base.cache[key] = (None, ctx)
        return ctx


def teval(field, ctx, order=None):
    """Memoized Taylor evaluation of a Field under a context.

    :param order: series order to evaluate to; defaults to ``ctx.order``.
        The cache keeps the DEEPEST series computed so far per field —
        shallower requests are served from it (rules index only the orders
        they need), deeper requests re-evaluate and replace it (identical
        sub-computations are CSE'd by XLA under jit).
    """
    want = ctx.order if order is None else order
    key = (id(field), 's')
    hit = ctx.cache.get(key)
    if hit is not None and hit[1].order >= want:
        return hit[1]
    out = field.trule(ctx.at_order(want))
    ctx.cache[key] = (field, out)
    return out


def _compositions(n, m):
    """All m-tuples of nonnegative ints summing to n, in lexicographic order."""
    if m == 1:
        return [(n,)]
    out = []
    for first in range(n + 1):
        for rest in _compositions(n - first, m - 1):
            out.append((first,) + rest)
    return out


def _multinomial(n, beta):
    c = math.factorial(n)
    for b in beta:
        c //= math.factorial(b)
    return c


_EXTRACTION_PLANS = {}


def _extraction_plan(m, n):
    r"""Static polarization plan for the FULL-SUPPORT mixed partials of total
    order ``n`` over ``m`` coordinate axes (every axis order >= 1).

    The n-th directional derivative along :math:`v` expands as
    :math:`D^n_v u = \sum_{|\beta|=n} \binom{n}{\beta} v^\beta \partial^\beta u`.
    Partials whose support misses an axis are *cheaper* problems (pure ones
    read straight off the axis-aligned series; smaller-support mixed ones
    recurse) — so the plan solves only for the :math:`J = \binom{n-1}{m-1}`
    full-support unknowns, subtracting the known terms from each directional
    derivative first. The workhorse case u_xy needs exactly ONE synthetic
    direction: :math:`u_{xy} = D^2_{(x+y)/\sqrt2}u - (u_{xx}+u_{yy})/2`.

    Returns ``(betas_full, betas_partial, dirs, Minv, Mpartial)``:

    - ``betas_full``: the J solved multi-indices (each a tuple of m orders);
    - ``betas_partial``: multi-indices of order n with at least one zero axis
      (their values are supplied by the caller, recursively);
    - ``dirs``: (J, m) float64 directions — half-circle angles avoiding the
      axes for m=2 (Vandermonde in tan, well-conditioned at PINN orders),
      deterministic rank-checked unit vectors for m>=3;
    - ``Minv``: (J, J) inverse of the full-support coefficient matrix;
    - ``Mpartial``: (J, len(betas_partial)) coefficients of the known terms.
    """
    key = (m, n)
    hit = _EXTRACTION_PLANS.get(key)
    if hit is not None:
        return hit
    all_betas = _compositions(n, m)
    betas_full = [b for b in all_betas if all(x >= 1 for x in b)]
    betas_partial = [b for b in all_betas if not all(x >= 1 for x in b)]
    J = len(betas_full)
    if m == 1:
        dirs = np.ones((1, 1))
    elif m == 2:
        thetas = np.pi * (np.arange(J) + 1.0) / (2 * (J + 1))
        dirs = np.stack([np.cos(thetas), np.sin(thetas)], axis=1)
    else:
        for seed in range(64):
            rng = np.random.RandomState(seed)
            dirs = rng.normal(size=(J, m))
            dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
            M = _plan_matrix(dirs, betas_full, n)
            if np.linalg.cond(M) < 1e7:
                break
        else:  # pragma: no cover - 64 seeds never all ill-conditioned
            raise RuntimeError(f"no well-conditioned direction set for m={m}, n={n}")
    Minv = np.linalg.inv(_plan_matrix(dirs, betas_full, n))
    Mpartial = _plan_matrix(dirs, betas_partial, n)
    plan = (betas_full, betas_partial, dirs, Minv, Mpartial)
    _EXTRACTION_PLANS[key] = plan
    return plan


def _plan_matrix(dirs, betas, n):
    M = np.empty((len(dirs), len(betas)))
    for j, v in enumerate(dirs):
        for b, beta in enumerate(betas):
            M[j, b] = _multinomial(n, beta) * np.prod(v ** np.asarray(beta))
    return M


def _merge_alpha(alpha, axis, order):
    """Add ``order`` derivatives along ``axis`` to a multi-index (tuple of
    (axis, order) pairs sorted by axis)."""
    d = dict(alpha)
    d[axis] = d.get(axis, 0) + order
    return tuple(sorted(d.items()))


def partial_entry(field, alpha, ctx):
    r"""The (possibly mixed) partial :math:`\partial^\alpha` of a
    Taylor-capable field, as a broadcast-shaped ``(N|1, m)`` array.

    ``alpha`` is a tuple of ``(axis, order)`` pairs (orders >= 1). Derivative
    fields fold into their parent first (:math:`\partial^\alpha \partial^p_a u
    = \partial^{\alpha + p e_a} u`), so chains of ``diff`` always extract from
    the innermost trule-bearing field. Pure partials read off the main
    context's axis-aligned series; genuinely mixed ones are recovered from an
    auxiliary polarization context (see :func:`_extraction_plan`). Everything
    memoizes on the base context.
    """
    base = ctx.base
    while getattr(field, '_dinfo', None) is not None:
        parent, palpha = field._dinfo
        for ax, o in palpha:
            alpha = _merge_alpha(alpha, ax, o)
        field = parent
    key = ('pent', id(field), alpha)
    hit = base.cache.get(key)
    if hit is not None:
        return hit[1]
    if len(alpha) == 1:
        axis, order = alpha[0]
        hit = base.cache.get((id(field), 's'))
        have = hit[1].order if hit is not None else 0
        if have >= order or base.n_dirs <= 1:
            # free (or as cheap as it gets): the main axis-aligned series
            ps = teval(field, base, order=order)
            out = ps.derivs[order - 1][axis]
        else:
            # deepening the main series would propagate order `order` tangents
            # along ALL axes; a single-direction context costs 1/D of that
            aux = ctx.aux_for((axis,), order)
            ps = teval(field, aux, order=order)
            out = ps.derivs[order - 1][0]
    else:
        axes = tuple(ax for ax, _ in alpha)
        n_total = sum(o for _, o in alpha)
        betas_full, betas_partial, _, Minv, Mpartial = _extraction_plan(
            len(axes), n_total)
        aux = ctx.aux_for(axes, n_total)
        ps = teval(field, aux, order=n_total)
        entries = ps.derivs[n_total - 1]
        dtype = ps.c0.dtype
        if isinstance(entries, tuple):
            dvals = list(entries)
        else:
            dvals = [entries[j] for j in range(entries.shape[0])]
        # known smaller-support terms (pure reads / recursive extractions)
        partial_vals = []
        for beta in betas_partial:
            al = tuple((ax, b) for ax, b in zip(axes, beta) if b)
            partial_vals.append(partial_entry(field, al, ctx))
        row = Minv[betas_full.index(tuple(o for _, o in alpha))]
        out = None
        for j, w in enumerate(row):
            rhs = dvals[j]
            for c, pv in zip(Mpartial[j], partial_vals):
                rhs = rhs - jnp.asarray(c, dtype) * pv
            term = jnp.asarray(w, dtype) * rhs
            out = term if out is None else out + term
    base.cache[key] = (field, out)
    return out


def derivative_series(parent, alpha, ctx):
    r"""Series of the derivative field :math:`\partial^\alpha u` (``alpha``: a
    tuple of ``(axis, order)`` pairs).

    For a pure single-axis derivative under an axis-aligned context, the
    entries along its own axis are read off the parent's series evaluated
    ``p`` orders deeper (one shared network pass; the reason spherical
    patterns like ``diff(r^2 * u_r, r)`` stay on the batched hot path —
    reference ``operators.py:116-279`` builds them this way). Every OTHER
    entry is a genuinely mixed partial, recovered batched via
    :func:`partial_entry`'s polarization contexts — so cross-direction
    compositions (curl-of-curl, :math:`\partial^2/\partial r \partial\theta`
    chains) stay off the per-sample fallback too.
    """
    K = ctx.order
    n = ctx.points.shape[0]

    if len(alpha) == 1 and ctx.is_axes:
        dir_index, p = alpha[0]
        ps = teval(parent, ctx, order=p + K)
        m = ps.c0.shape[1]
        c0 = jnp.broadcast_to(ps.derivs[p - 1][dir_index], (n, m))
        derivs = []
        for k in range(1, K + 1):
            same = ps.derivs[p + k - 1][dir_index]
            row = [
                same if d == dir_index
                else partial_entry(parent, _merge_alpha(alpha, d, k), ctx)
                for d in range(ctx.n_dirs)
            ]
            derivs.append(_pack_dirs(row, ctx))
        return TSeries(c0, derivs)

    c0 = partial_entry(parent, alpha, ctx)
    m = c0.shape[1]
    c0 = jnp.broadcast_to(c0, (n, m))
    derivs = []
    if ctx.is_axes:
        for k in range(1, K + 1):
            row = [partial_entry(parent, _merge_alpha(alpha, d, k), ctx)
                   for d in range(ctx.n_dirs)]
            derivs.append(_pack_dirs(row, ctx))
        return TSeries(c0, derivs)

    # synthetic-direction context (this derivative field is an operand inside
    # an expression being polarization-evaluated): expand each directional
    # derivative over the context's axes —
    #   D^k_v (∂^alpha u) = sum_{|beta|=k} (k!/beta!) v^beta ∂^{alpha+beta} u
    axes = ctx.axes
    dirs = ctx.dirs_sub
    for k in range(1, K + 1):
        row = []
        for j in range(ctx.n_dirs):
            entry = None
            for beta in _compositions(k, len(axes)):
                coeff = _multinomial(k, beta) * float(np.prod(dirs[j] ** np.asarray(beta)))
                al = alpha
                for ax, b in zip(axes, beta):
                    if b:
                        al = _merge_alpha(al, ax, b)
                term = partial_entry(parent, al, ctx)
                term = jnp.asarray(coeff, term.dtype) * term
                entry = term if entry is None else entry + term
            row.append(entry)
        derivs.append(_pack_dirs(row, ctx))
    return TSeries(c0, derivs)


def _pack_dirs(row, ctx):
    """Assemble per-direction entries into the context's derivative layout,
    broadcasting mixed (1, m)-shaped extractions up to a common row count."""
    if not ctx.stacked:
        return tuple(row)
    rows = max(e.shape[0] for e in row)
    m = max(e.shape[1] for e in row)
    return jnp.stack([jnp.broadcast_to(e, (rows, m)) for e in row])


def _dmap(f, *ds):
    """Apply f across the direction axis of one or more derivative entries —
    elementwise over a per-direction tuple, or once on a stacked array (where
    trailing-dim broadcasting against (N, m) operands does the same job)."""
    if isinstance(ds[0], tuple):
        return tuple(f(*xs) for xs in zip(*ds))
    return f(*ds)


def constant_series(value, ctx, n_samples):
    """Series of a per-sample-constant (or broadcast-constant) array."""
    c0 = jnp.asarray(value, dtype=ctx.points.dtype)
    if c0.ndim == 0:
        c0 = c0[None, None]
    elif c0.ndim == 1:
        c0 = c0[None, :]
    c0 = jnp.broadcast_to(c0, (n_samples, c0.shape[-1]))
    if ctx.stacked:
        zeros = jnp.zeros((ctx.n_dirs, 1, 1), dtype=ctx.points.dtype)
    else:
        zero = jnp.zeros((1, 1), dtype=ctx.points.dtype)
        zeros = (zero,) * ctx.n_dirs
    return TSeries(c0, [zeros] * ctx.order)


def coordinate_series(index, ctx):
    """Series of the index-th coordinate component: value = points[:, i],
    first derivative = e_d[i] per direction (constant across the batch),
    higher derivatives = 0."""
    c0 = ctx.points[:, index:index + 1]                      # (N, 1)
    if ctx.stacked:
        d1 = ctx.directions[:, index][:, None, None]         # (D, 1, 1)
        zeros = jnp.zeros_like(d1)
    else:
        d1 = tuple(ctx.directions[d, index][None, None]      # D x (1, 1)
                   for d in range(ctx.n_dirs))
        zero = jnp.zeros((1, 1), dtype=ctx.points.dtype)
        zeros = (zero,) * ctx.n_dirs
    derivs = [d1] + [zeros] * (ctx.order - 1)
    return TSeries(c0, derivs[:ctx.order])


def affine_series(ts, W, b=None):
    """Exact propagation through x @ W (+ b); preserves broadcast shapes.

    NOTE: one dot per direction measured 2.2x FASTER than folding directions
    into one (D*N, H) matmul — the reshape forces XLA to materialize the
    coefficients and breaks elementwise fusion around the dot.
    """
    c0 = ts.c0 @ W
    if b is not None:
        c0 = c0 + b
    return TSeries(c0, [_dmap(lambda x: x @ W, d) for d in ts.derivs])


def elementwise_series(op, operands, order, n_dirs):
    r"""Propagate series through an elementwise op.

    :param op: elementwise function of ``len(operands)`` arrays.
    :param operands: list of TSeries with broadcast-compatible shapes.
    :param order: series order K (0 = value only).
    :param n_dirs: number of probe directions D.
    """
    c0_out = op(*[s.c0 for s in operands])
    if order == 0:
        return TSeries(c0_out, [])
    if order <= 2:
        return _elementwise_manual(op, operands, order, c0_out)
    return _elementwise_jet(op, operands, order, n_dirs, c0_out)


def _chain_unary(a, order, c0_out, f1, f2):
    """Assemble the unary chain rule from precomputed f'(x), f''(x)."""
    if order == 0:
        return TSeries(c0_out, [])
    a1 = a.derivs[0]
    derivs = [_dmap(lambda x: f1 * x, a1)]
    if order == 2:
        a2 = a.derivs[1]
        if f2 is None:
            c2 = _dmap(lambda x2: f1 * x2, a2)
        else:
            c2 = _dmap(lambda x1, x2: f1 * x2 + f2 * x1 * x1, a1, a2)
        derivs.append(c2)
    return TSeries(c0_out, derivs)


# closed-form (f', f'') for unary ops, reusing the forward value v where
# possible — ONE transcendental per op instead of the ~7 a generic
# jvp-of-jvp evaluation costs (tanh/exp dominate PINN residual time)
def _unary_rules():
    def d_tanh(x, v):
        f1 = 1 - v * v
        return f1, -2 * v * f1

    def d_exp(x, v):
        return v, v

    def d_sin(x, v):
        c = jnp.cos(x)
        return c, -v

    def d_cos(x, v):
        s = jnp.sin(x)
        return -s, -v

    def d_sinh(x, v):
        c = jnp.cosh(x)
        return c, v

    def d_cosh(x, v):
        s = jnp.sinh(x)
        return s, v

    def d_log(x, v):
        inv = 1 / x
        return inv, -inv * inv

    def d_sqrt(x, v):
        f1 = 0.5 / v
        return f1, -0.5 * f1 / x

    def d_sigmoid(x, v):
        f1 = v * (1 - v)
        return f1, f1 * (1 - 2 * v)

    def d_neg(x, v):
        return -jnp.ones_like(x), None

    def d_abs(x, v):
        return jnp.sign(x), None

    def d_erf(x, v):
        f1 = (2 / np.sqrt(np.pi)) * jnp.exp(-x * x)
        return f1, -2 * x * f1

    return {
        jnp.tanh: d_tanh, jnp.exp: d_exp, jnp.sin: d_sin, jnp.cos: d_cos,
        jnp.sinh: d_sinh, jnp.cosh: d_cosh, jnp.log: d_log, jnp.sqrt: d_sqrt,
        jax.nn.sigmoid: d_sigmoid, jnp.negative: d_neg, jnp.abs: d_abs,
        jax.scipy.special.erf: d_erf,
    }


_UNARY_RULES = None


def _elementwise_manual(op, operands, order, c0_out):
    """Chain rules for order <= 2 with closed forms for the common ops;
    partials are computed once on batch-shaped data and broadcast over
    directions — tangent shapes stay as small as broadcasting allows."""
    global _UNARY_RULES
    if _UNARY_RULES is None:
        _UNARY_RULES = _unary_rules()

    nops = len(operands)

    # exact algebraic rules (no partials needed); all maps are per direction
    if nops == 2:
        a, b = operands
        if op is jnp.add:
            derivs = [_dmap(lambda x, y: x + y, a.derivs[0], b.derivs[0])]
            if order == 2:
                derivs.append(_dmap(lambda x, y: x + y, a.derivs[1], b.derivs[1]))
            return TSeries(c0_out, derivs)
        if op is jnp.subtract:
            derivs = [_dmap(lambda x, y: x - y, a.derivs[0], b.derivs[0])]
            if order == 2:
                derivs.append(_dmap(lambda x, y: x - y, a.derivs[1], b.derivs[1]))
            return TSeries(c0_out, derivs)
        if op is jnp.multiply:
            a0, b0 = a.c0, b.c0
            derivs = [_dmap(lambda x, y: x * b0 + a0 * y, a.derivs[0], b.derivs[0])]
            if order == 2:
                derivs.append(_dmap(
                    lambda x1, y1, x2, y2: x2 * b0 + a0 * y2 + 2 * x1 * y1,
                    a.derivs[0], b.derivs[0], a.derivs[1], b.derivs[1]))
            return TSeries(c0_out, derivs)
        if op is jnp.divide:
            inv_b = 1 / b.c0
            q = c0_out
            # q' = (a' - q b') / b ;  q'' = (a'' - q b'' - 2 q' b') / b
            q1 = _dmap(lambda x, y: (x - q * y) * inv_b, a.derivs[0], b.derivs[0])
            derivs = [q1]
            if order == 2:
                derivs.append(_dmap(
                    lambda x2, y2, q1d, y1: (x2 - q * y2 - 2 * q1d * y1) * inv_b,
                    a.derivs[1], b.derivs[1], q1, b.derivs[0]))
            return TSeries(c0_out, derivs)

    if nops == 1:
        rule = _UNARY_RULES.get(op)
        if rule is not None:
            f1, f2 = rule(operands[0].c0, c0_out)
            return _chain_unary(operands[0], order, c0_out, f1, f2)

    # generic fallback: per-direction "path jvp" — nest jvp through a scalar
    # path parameter s, with args a(s) = a0 + a1 s + a2 s^2/2. The second
    # s-derivative at 0 is exactly the second directional derivative including
    # all cross terms, at ~4 formula evaluations per direction (vs the
    # quadratic cost of assembling explicit Hessian partials). Correct for any
    # differentiable elementwise op.
    stacked = not isinstance(operands[0].derivs[0], tuple)
    n_dirs = (operands[0].derivs[0].shape[0] if stacked
              else len(operands[0].derivs[0]))
    dtype = c0_out.dtype

    d1_parts, d2_parts = [], []
    for d in range(n_dirs):
        def path(s, _d=d):
            args = []
            for sr in operands:
                a = sr.c0 + s * sr.derivs[0][_d]
                if order == 2:
                    a = a + (0.5 * s * s) * sr.derivs[1][_d]
                args.append(a)
            return op(*args)

        zero = jnp.zeros((), dtype)
        one = jnp.ones((), dtype)
        if order == 1:
            d1_parts.append(jax.jvp(path, (zero,), (one,))[1])
        else:
            h1 = lambda s, _p=path: jax.jvp(_p, (s,), (one,))[1]
            d1, d2 = jax.jvp(h1, (zero,), (one,))
            d1_parts.append(d1)
            d2_parts.append(d2)

    pack = (lambda ps: jnp.stack(ps, axis=0)) if stacked else tuple
    derivs = [pack(d1_parts)]
    if order == 2:
        derivs.append(pack(d2_parts))
    return TSeries(c0_out, derivs)


def _elementwise_jet(op, operands, order, n_dirs, c0_out):
    """High-order fallback: one batched jet call on (D*N, m)-stacked series."""
    shape = c0_out.shape
    n = shape[0]

    stacked = not isinstance(operands[0].derivs[0], tuple)

    def flatten(d):
        if stacked:
            return jnp.broadcast_to(d, (n_dirs,) + shape).reshape((-1,) + shape[1:])
        return jnp.concatenate([jnp.broadcast_to(x, shape) for x in d], axis=0)

    primals = tuple(
        jnp.broadcast_to(s.c0, shape)[None].repeat(n_dirs, axis=0).reshape((-1,) + shape[1:])
        for s in operands
    )
    series = tuple([flatten(d) for d in s.derivs] for s in operands)
    _, out_series = jet(op, primals, series)

    def unflatten(o):
        o = o.reshape((n_dirs,) + shape)
        if stacked:
            return o
        return tuple(o[i] for i in range(n_dirs))

    return TSeries(c0_out, [unflatten(o) for o in out_series])


def lifted_series(op, arg_descs, ctx):
    """Series propagation for a lifted elementwise op with mixed arguments.

    :param op: the ORIGINAL jnp op (registry dispatch needs its identity).
    :param arg_descs: list of ('series', TSeries) / ('const', value) in call order.
    :param ctx: the Taylor context.
    """
    order, n_dirs = ctx.order, ctx.n_dirs
    series_args = [d[1] for d in arg_descs if d[0] == 'series']

    if order == 0:
        vals = [d[1].c0 if d[0] == 'series' else d[1] for d in arg_descs]
        return TSeries(op(*vals), [])

    # ---- constant-aware shortcuts, order <= 2 (keep zero-derivative
    # constants symbolic; higher orders go through the jet path below)
    if order <= 2 and len(arg_descs) == 2 and len(series_args) == 1:
        (k0, a0), (k1, a1) = arg_descs
        s = series_args[0]
        const = a1 if k0 == 'series' else a0
        const_first = (k0 == 'const')
        cval = jnp.asarray(const, dtype=ctx.points.dtype)
        if op in (jnp.add, jnp.subtract):
            c0 = op(cval, s.c0) if const_first else op(s.c0, cval)
            if op is jnp.subtract and const_first:
                return TSeries(c0, [_dmap(lambda x: -x, d) for d in s.derivs])
            return TSeries(c0, list(s.derivs))
        if op is jnp.multiply:
            c0 = s.c0 * cval
            return TSeries(c0, [_dmap(lambda x: x * cval, d) for d in s.derivs])
        if op is jnp.divide:
            if const_first:  # c / x: unary 1/x scaled
                c0 = cval / s.c0
                inv = 1 / s.c0
                f1 = -c0 * inv
                f2 = -2 * f1 * inv
                return _chain_unary(s, order, c0, f1, f2)
            c0 = s.c0 / cval
            inv = 1 / cval
            return TSeries(c0, [_dmap(lambda x: x * inv, d) for d in s.derivs])
        if op is jnp.power:
            if not const_first:  # x ** p, p constant
                p = const
                c0 = s.c0 ** p
                f1 = p * s.c0 ** (p - 1)
                try:
                    trivial = float(p) in (0.0, 1.0)
                except (TypeError, ValueError):  # pragma: no cover - array exponent
                    trivial = False
                f2 = None if trivial else (p * (p - 1)) * s.c0 ** (p - 2)
                return _chain_unary(s, order, c0, f1, f2)
            # a ** x, a constant
            c0 = cval ** s.c0
            ln_a = jnp.log(cval)
            return _chain_unary(s, order, c0, c0 * ln_a, c0 * ln_a * ln_a)
        if op in (jnp.maximum, jnp.minimum):
            c0 = op(s.c0, cval)
            picked = (c0 == s.c0)
            f1 = picked.astype(s.c0.dtype)
            return _chain_unary(s, order, c0, f1, None)

    # ---- all-series (or unhandled const patterns): materialize consts
    operands = []
    for kind, payload in arg_descs:
        if kind == 'series':
            operands.append(payload)
        else:
            operands.append(constant_series(payload, ctx, ctx.points.shape[0]))
    return elementwise_series(op, operands, order, n_dirs)


def concat_series(operands, order, n_dirs):
    """Column-concatenate series (the Taylor rule of fields.cat)."""
    c0 = jnp.concatenate([s.c0 for s in operands], axis=1)
    n = c0.shape[0]
    derivs = []
    if order and not isinstance(operands[0].derivs[0], tuple):  # stacked layout
        for k in range(order):
            parts = [
                jnp.broadcast_to(s.derivs[k], (n_dirs, n, s.c0.shape[1]))
                for s in operands
            ]
            derivs.append(jnp.concatenate(parts, axis=2))
        return TSeries(c0, derivs)
    for k in range(order):
        dirs = []
        for di in range(n_dirs):
            parts = [s.derivs[k][di] for s in operands]
            # keep the batch dimension broadcast (rows=1) when every part is
            # constant across the batch; materialize otherwise
            rows = 1 if all(p.shape[0] == 1 for p in parts) else n
            dirs.append(jnp.concatenate(
                [jnp.broadcast_to(p, (rows, s.c0.shape[1]))
                 for p, s in zip(parts, operands)], axis=1))
        derivs.append(tuple(dirs))
    return TSeries(c0, derivs)


def slice_series(ts, col):
    """Column-select series (the Taylor rule of field[:, col])."""
    if isinstance(col, int):
        sl = slice(col, col + 1) if col != -1 else slice(-1, None)
    else:
        sl = col

    def take(x):
        if x.shape[-1] == 1:  # broadcast over columns: slicing is a no-op
            return x
        return x[..., sl]

    return TSeries(ts.c0[:, sl], [_dmap(take, d) for d in ts.derivs])


def sum_series(ts, keepdims):
    """Column-sum series (the Taylor rule of field.sum(axis=1))."""
    m = ts.c0.shape[1]
    c0 = ts.c0.sum(axis=1, keepdims=True)

    def reduce(x):
        if x.shape[-1] == 1:  # broadcast over columns: sum = m * x
            return x * m
        return x.sum(axis=-1, keepdims=True)

    return TSeries(c0, [_dmap(reduce, d) for d in ts.derivs])


def add_series(a, b):
    """Exact sum of two series (used by Resnet's skip connection)."""
    return TSeries(a.c0 + b.c0,
                   [_dmap(lambda x, y: x + y, da, db)
                    for da, db in zip(a.derivs, b.derivs)])
