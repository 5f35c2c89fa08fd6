r"""Multi-device sharding utilities: the distributed layer the reference lacks.

The scaling axis of a PINN workload is the number of collocation points per
batch (SURVEY.md §5); this subpackage shards that axis over a 1-D
``jax.sharding.Mesh`` named ``'points'``. Every solver accepts ``mesh=``:
inside the jitted train step the sampled batch gets a
``with_sharding_constraint`` so XLA partitions the forward/residual work and
compiles the loss mean into a ``psum`` over ICI. Parameters stay replicated
(the models are tiny MLPs; data-parallel is the only axis worth sharding).
"""
from .sharding import make_mesh, points_sharding, replicated_sharding, shard_points

__all__ = ['make_mesh', 'points_sharding', 'replicated_sharding', 'shard_points']
