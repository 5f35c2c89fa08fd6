r"""Mesh construction and sharding helpers."""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'points_sharding', 'replicated_sharding', 'shard_points']


def make_mesh(n_devices=None, devices=None, axis_name='points'):
    """Build a 1-D device mesh over the collocation-point axis.

    :param n_devices: number of devices to use (defaults to all available).
    :param devices: explicit device list (overrides n_devices).
    :param axis_name: mesh axis name, defaults to ``'points'``.
    :return: a ``jax.sharding.Mesh``.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def points_sharding(mesh, axis_name='points'):
    """NamedSharding that splits the leading (points) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name, None))


def replicated_sharding(mesh):
    """NamedSharding that replicates a value on every device of the mesh."""
    return NamedSharding(mesh, P())


def shard_points(points, mesh, axis_name='points'):
    """Constrain a (N, d) batch of points to be sharded along the mesh."""
    return jax.lax.with_sharding_constraint(points, points_sharding(mesh, axis_name))
