r"""Mesh construction and sharding helpers.

Two parallelism axes are supported:

- ``'points'`` — data parallelism over the collocation batch (the scaling
  axis of this workload; embarrassingly parallel, one psum of loss/grads).
- ``'model'`` — optional tensor parallelism over hidden units of wide
  networks, Megatron-style: even layers split output columns, odd layers
  split input rows, so activations alternate sharded/partial and XLA inserts
  one all-reduce per layer pair over ICI.
"""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'points_sharding', 'replicated_sharding', 'shard_points',
           'megatron_param_shardings', 'shard_params']


def make_mesh(n_devices=None, devices=None, axis_name='points', model_axis_size=None):
    """Build a device mesh over the collocation-point axis (and optionally a
    ``'model'`` tensor-parallel axis).

    :param n_devices: number of devices to use (defaults to all available).
    :param devices: explicit device list (overrides n_devices).
    :param axis_name: name of the batch axis, defaults to ``'points'``.
    :param model_axis_size: if given (> 1), the mesh becomes 2-D with shape
        ``(n // model_axis_size, model_axis_size)`` and axes
        ``(axis_name, 'model')``.
    :return: a ``jax.sharding.Mesh``.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.array(devices)
    if model_axis_size and model_axis_size > 1:
        n = devices.size
        if n % model_axis_size:
            raise ValueError(
                f"model_axis_size={model_axis_size} must divide the device count {n}")
        return Mesh(devices.reshape(n // model_axis_size, model_axis_size),
                    (axis_name, 'model'))
    return Mesh(devices, (axis_name,))


def points_sharding(mesh, axis_name='points'):
    """NamedSharding that splits the leading (points) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name, None))


def replicated_sharding(mesh):
    """NamedSharding that replicates a value on every device of the mesh."""
    return NamedSharding(mesh, P())


def shard_points(points, mesh, axis_name='points'):
    """Constrain a (N, d) batch of points to be sharded along the mesh."""
    return jax.lax.with_sharding_constraint(points, points_sharding(mesh, axis_name))


def megatron_param_shardings(params, mesh):
    """Build a NamedSharding pytree for FCNN-style parameters on a 2-D
    ``(points, model)`` mesh: even layers split their OUTPUT dimension over
    ``'model'``, odd layers their INPUT dimension (Megatron tensor
    parallelism), biases follow their layer's output split, and any leaf
    whose target dimension does not divide evenly stays replicated.

    Works on the dict layout produced by :class:`neurodiffeq_tpu.networks.FCNN`
    (``{'layers': [{'W': (in, out), 'b': (out,)}, ...], 'actv': [...]}``);
    anything else is replicated.
    """
    if 'model' not in mesh.axis_names:
        raise ValueError("megatron_param_shardings needs a mesh with a 'model' axis")
    m = mesh.shape['model']
    rep = NamedSharding(mesh, P())

    def _layer_specs(layers):
        specs = []
        for i, layer in enumerate(layers):
            W, b = layer.get('W'), layer.get('b')
            split_out = (i % 2 == 0)
            w_spec, b_spec = P(), P()
            if W is not None and W.ndim == 2:
                if split_out and W.shape[1] % m == 0 and W.shape[1] >= m:
                    w_spec = P(None, 'model')
                    if b is not None and b.shape[0] % m == 0:
                        b_spec = P('model')
                elif (not split_out) and W.shape[0] % m == 0 and W.shape[0] >= m:
                    w_spec = P('model', None)
            specs.append({k: NamedSharding(mesh, w_spec if k == 'W' else b_spec)
                          if k in ('W', 'b') else jax.tree.map(lambda _: rep, layer[k])
                          for k in layer})
        return specs

    def _one(net_params):
        if isinstance(net_params, dict) and 'layers' in net_params:
            out = {k: jax.tree.map(lambda _: rep, v)
                   for k, v in net_params.items() if k != 'layers'}
            out['layers'] = _layer_specs(net_params['layers'])
            return out
        return jax.tree.map(lambda _: rep, net_params)

    if isinstance(params, list):
        return [_one(p) for p in params]
    return _one(params)


def shard_params(params, mesh):
    """``device_put`` parameters with Megatron shardings on a 2-D mesh (or
    replicate them on a 1-D mesh). Optimizer states initialized from the
    result inherit the same layout."""
    if 'model' in mesh.axis_names:
        shardings = megatron_param_shardings(params, mesh)
    else:
        shardings = jax.tree.map(lambda _: replicated_sharding(mesh), params)
    return jax.device_put(params, shardings)
