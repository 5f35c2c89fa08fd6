r"""Multi-device sharding utilities: the distributed layer the reference lacks.

The scaling axis of a PINN workload is the number of collocation points per
batch (SURVEY.md §5); this subpackage shards that axis over a
``jax.sharding.Mesh`` axis named ``'points'``. Every solver accepts ``mesh=``:
inside the jitted train step the sampled batch gets a
``with_sharding_constraint`` so XLA partitions the forward/residual work and
compiles the loss mean into a ``psum`` over ICI.

For wide networks a second ``'model'`` mesh axis adds Megatron-style tensor
parallelism: pass ``make_mesh(model_axis_size=k)`` and the solver shards each
FCNN layer's hidden dimension across it (even layers split output columns,
odd layers input rows), letting XLA insert one all-reduce per layer pair.
Small default nets keep parameters replicated — data parallelism is the only
axis worth sharding at those sizes.
"""
from .sharding import (make_mesh, points_sharding, replicated_sharding, shard_points,
                       megatron_param_shardings, shard_params)

__all__ = ['make_mesh', 'points_sharding', 'replicated_sharding', 'shard_points',
           'megatron_param_shardings', 'shard_params']
