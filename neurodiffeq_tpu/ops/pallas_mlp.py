r"""Pallas TPU kernel: fused Taylor-mode FCNN evaluation.

One kernel computes, for a tile of collocation points, the network value AND
its first/second directional derivatives along all coordinate axes — the
entire per-layer pipeline (affine, tanh, tangent algebra) stays in VMEM, so
hidden activations and derivative coefficients never round-trip through HBM
between ops. This is the "FCNN forward + residual evaluation fuses into Pallas
batched-MLP kernels" path from the project north star.

Structure exploited (same as :mod:`neurodiffeq_tpu.ops.taylor`):

- first-layer tangents are the rows of W1 (constant across the batch);
- tanh derivatives reuse the forward value: s = 1 - a^2, a'' factor -2 a s;
- all directional chains share one forward pass.

Training integration: the forward runs in Pallas under a ``jax.custom_vjp``
whose backward re-derives gradients by ``jax.vjp`` over the pure-JAX series
implementation (a standard rematerialized backward — numerics identical).
Inference/serving (`Solution.__call__`, ``get_residuals``) uses the kernel
directly.

Enable with ``neurodiffeq_tpu.ops.enable_pallas()`` (off by default; requires
a TPU backend or interpreter mode for tests).

RESOLVED (round 3): XLA's automatic fusion is the right default at EVERY
shape family this workload produces, and the "fold residual+loss into the
kernel" idea is closed as not worth building. The evidence:

Large batches (tanh FCNN 2-512-1, order 2, fwd only, f32, TPU v5e, round 2):

==========  ===========  =========
batch       pallas       plain XLA
==========  ===========  =========
1,024       6.3M pts/s   7.8M
16,384      72.9M        110.1M
65,536      145.9M       288.7M
==========  ===========  =========

Here the step sits at the VPU elementwise roofline (benchmarks/RESULTS.md
round 2); a kernel with the same FLOPs cannot beat it, and the handwritten
schedule loses the fusion XLA finds.

Tiny batches (the other candidate regime: LV config, 2x sin FCNN 1-32-32-1,
batch 32, full train chunk incl. backward+Adam, interleaved A/B medians of 4,
round 3): pallas 12,865 epochs/s vs XLA 13,197 — a statistical tie (rep
spread 12,450-13,408). At this scale the compiled epoch is ~100 small fused
kernels in ~79 us — ~0.8 us each, the TPU's per-op floor — so replacing the
~15-op network-series group with one pallas launch (whose fixed cost is the
same ~1-2 us) moves nothing. The actual tiny-shape bottlenecks were dispatch
and per-span compiles, fixed host-side (dynamic-length fit chunks, flat
parameter carry: LV 3.5x -> 26.7x torch-CPU) — not kernel count. A
residual+loss mega-fusion would cut kernel count further, but its ceiling is
the same per-op floor already reached; the measured tie bounds the win at
~zero.

The kernel stays opt-in (``ops.enable_pallas()``) as a numerically tighter
path (f32 accumulation; the XLA path uses the TPU's default bf16 matmul
passes, ~4e-3 relative difference) and as the scaffold should a future
workload (deeper nets, higher orders) change the arithmetic.
"""
import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
try:  # TPU-specific memory spaces; absent on some builds
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

__all__ = ['fcnn_taylor_pallas', 'pallas_config', 'enable_pallas', 'disable_pallas',
           'pallas_enabled']

_CONFIG = {'enabled': False, 'interpret': False, 'tile': 256}


def enable_pallas(interpret=False, tile=256):
    """Turn on the fused Pallas path for FCNN Taylor evaluation.

    :param interpret: run the kernel in interpreter mode (for CPU tests).
    :param tile: points per grid step.
    """
    _CONFIG['enabled'] = True
    _CONFIG['interpret'] = interpret
    _CONFIG['tile'] = tile


def disable_pallas():
    _CONFIG['enabled'] = False


def pallas_enabled():
    return _CONFIG['enabled']


def pallas_config():
    return dict(_CONFIG)


def _actv_chain(z, actv):
    """(value, f', f'') of the activation, reusing the forward value."""
    if actv == 'tanh':
        a = jnp.tanh(z)
        f1 = 1 - a * a
        return a, f1, -2 * a * f1
    if actv == 'sin':
        a = jnp.sin(z)
        return a, jnp.cos(z), -a
    raise ValueError(f"unsupported pallas activation {actv}")  # pragma: no cover


def _kernel(x_ref, *refs, n_layers, order, n_dirs, actv):
    """Fused Taylor-MLP tile kernel. refs = [W1, b1, ..., WL, bL, out refs...]."""
    param_refs = refs[:2 * n_layers]
    out_refs = refs[2 * n_layers:]

    x = x_ref[:]                                   # (T, d)
    acc_dtype = x.dtype
    Ws = [param_refs[2 * i][:] for i in range(n_layers)]
    bs = [param_refs[2 * i + 1][:] for i in range(n_layers)]

    # ---- first affine + tanh: tangents are W1 rows (constant across tile)
    z0 = jnp.dot(x, Ws[0], preferred_element_type=acc_dtype) + bs[0]
    if n_layers == 1:
        a, u1, u2 = z0, None, None
        # single linear layer: derivatives are constant rows
        if order >= 1:
            out_refs[1][:] = jnp.broadcast_to(Ws[0][:, None, :], (n_dirs,) + z0.shape)
        if order >= 2:
            out_refs[2][:] = jnp.zeros((n_dirs,) + z0.shape, z0.dtype)
        out_refs[0][:] = z0
        return

    a, f1, f2 = _actv_chain(z0, actv)
    if order >= 1:
        u1 = f1[None, :, :] * Ws[0][:, None, :]     # (D, T, H)
    if order >= 2:
        u2 = f2[None, :, :] * (Ws[0] * Ws[0])[:, None, :]

    # ---- middle layers
    for li in range(1, n_layers - 1):
        W, b = Ws[li], bs[li]
        z0 = jnp.dot(a, W, preferred_element_type=acc_dtype) + b
        if order >= 1:
            z1 = jnp.stack([
                jnp.dot(u1[d], W, preferred_element_type=acc_dtype)
                for d in range(n_dirs)
            ])
        if order >= 2:
            z2 = jnp.stack([
                jnp.dot(u2[d], W, preferred_element_type=acc_dtype)
                for d in range(n_dirs)
            ])
        a, f1, f2 = _actv_chain(z0, actv)
        if order >= 1:
            new_u1 = f1[None] * z1
        if order >= 2:
            u2 = f1[None] * z2 + f2[None] * z1 * z1
        if order >= 1:
            u1 = new_u1

    # ---- output affine
    W, b = Ws[-1], bs[-1]
    out_refs[0][:] = jnp.dot(a, W, preferred_element_type=acc_dtype) + b
    if order >= 1:
        out_refs[1][:] = jnp.stack([
            jnp.dot(u1[d], W, preferred_element_type=acc_dtype)
            for d in range(n_dirs)
        ])
    if order >= 2:
        out_refs[2][:] = jnp.stack([
            jnp.dot(u2[d], W, preferred_element_type=acc_dtype)
            for d in range(n_dirs)
        ])


def _pallas_call(points, flat_params, n_layers, order, n_dirs, n_out, tile, interpret, actv):
    n, d = points.shape
    dtype = points.dtype

    grid = (n // tile,)
    in_specs = [pl.BlockSpec((tile, d), lambda i: (i, 0))]
    for p in flat_params:
        in_specs.append(pl.BlockSpec(p.shape, (lambda r: lambda i: (0,) * r)(p.ndim)))

    out_shapes = [jax.ShapeDtypeStruct((n, n_out), dtype)]
    out_specs = [pl.BlockSpec((tile, n_out), lambda i: (i, 0))]
    if order >= 1:
        out_shapes.append(jax.ShapeDtypeStruct((n_dirs, n, n_out), dtype))
        out_specs.append(pl.BlockSpec((n_dirs, tile, n_out), lambda i: (0, i, 0)))
    if order >= 2:
        out_shapes.append(jax.ShapeDtypeStruct((n_dirs, n, n_out), dtype))
        out_specs.append(pl.BlockSpec((n_dirs, tile, n_out), lambda i: (0, i, 0)))

    kernel = functools.partial(_kernel, n_layers=n_layers, order=order, n_dirs=n_dirs, actv=actv)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_shape=tuple(out_shapes),
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(points, *flat_params)
    return outs


def _pure_jax_taylor(points, flat_params, n_layers, order, n_dirs, actv='tanh'):
    """Reference implementation (also the rematerialized backward): plain
    batched Taylor propagation, numerically identical to the kernel."""
    Ws = [flat_params[2 * i] for i in range(n_layers)]
    bs = [flat_params[2 * i + 1] for i in range(n_layers)]

    z0 = points @ Ws[0] + bs[0]
    if n_layers == 1:
        c1 = jnp.broadcast_to(Ws[0][:, None, :], (n_dirs, points.shape[0], Ws[0].shape[1]))
        outs = [z0]
        if order >= 1:
            outs.append(c1)
        if order >= 2:
            outs.append(jnp.zeros_like(c1))
        return tuple(outs)

    a, f1, f2 = _actv_chain(z0, actv)
    u1 = f1[None] * Ws[0][:, None, :]
    u2 = f2[None] * (Ws[0] * Ws[0])[:, None, :] if order >= 2 else None

    for li in range(1, n_layers - 1):
        W, b = Ws[li], bs[li]
        z0 = a @ W + b
        z1 = u1 @ W
        z2 = u2 @ W if order >= 2 else None
        a, f1, f2 = _actv_chain(z0, actv)
        if order >= 2:
            u2 = f1[None] * z2 + f2[None] * z1 * z1
        u1 = f1[None] * z1

    W, b = Ws[-1], bs[-1]
    outs = [a @ W + b]
    if order >= 1:
        outs.append(u1 @ W)
    if order >= 2:
        outs.append(u2 @ W)
    return tuple(outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _fused(points, flat_params, n_layers, order, n_dirs, n_out, tile, interpret, actv):
    return _pallas_call(points, flat_params, n_layers, order, n_dirs, n_out, tile, interpret, actv)


def _fused_fwd(points, flat_params, n_layers, order, n_dirs, n_out, tile, interpret, actv):
    out = _pallas_call(points, flat_params, n_layers, order, n_dirs, n_out, tile, interpret, actv)
    return out, (points, flat_params)


def _fused_bwd(n_layers, order, n_dirs, n_out, tile, interpret, actv, res, g):
    points, flat_params = res
    _, vjp = jax.vjp(
        lambda pts, fp: _pure_jax_taylor(pts, fp, n_layers, order, n_dirs, actv),
        points, flat_params)
    d_points, d_params = vjp(tuple(g))
    return d_points, d_params


_fused.defvjp(_fused_fwd, _fused_bwd)


def fcnn_taylor_pallas(points, layer_params, order, n_dirs, tile=None, interpret=None, actv='tanh'):
    """Fused Taylor evaluation of a tanh FCNN on ``points``.

    :param points: (N, d) collocation points (the probe directions are the d
        coordinate axes).
    :param layer_params: list of {'W', 'b'} per layer (tanh between layers,
        none after the last).
    :param order: 0, 1, or 2.
    :param n_dirs: number of directions (must equal d).
    :return: tuple (c0, [c1, [c2]]) with c0 (N, out), ck (D, N, out).
    """
    tile = tile or _CONFIG['tile']
    interpret = _CONFIG['interpret'] if interpret is None else interpret
    n, d = points.shape
    assert n_dirs == d, "probe directions must be the coordinate axes"

    flat_params = []
    for lp in layer_params:
        flat_params.append(lp['W'])
        flat_params.append(lp['b'])
    # promote everything to one dtype (tests may mix f32 points / f64 params)
    dtype = jnp.result_type(points.dtype, *[p.dtype for p in flat_params])
    points = points.astype(dtype)
    flat_params = [p.astype(dtype) for p in flat_params]
    n_layers = len(layer_params)
    n_out = layer_params[-1]['W'].shape[1]

    # pad the batch to a tile multiple; slice the outputs back
    tile = min(tile, max(8, n))
    rem = n % tile
    if rem:
        pad = tile - rem
        points_p = jnp.concatenate([points, jnp.zeros((pad, d), points.dtype)])
    else:
        pad = 0
        points_p = points

    outs = _fused(points_p, tuple(flat_params), n_layers, order, n_dirs, n_out, tile, interpret, actv)
    if pad:
        outs = tuple(o[:n] if o.ndim == 2 else o[:, :n] for o in outs)
    return outs
