r"""Hot-path compute kernels: batched Taylor-mode field evaluation.

This package implements the performance layer promised by the north star
(BASELINE.json): instead of evaluating each derivative of the solution with an
independent nested-``jvp`` chain (which recomputes the network forward pass
per derivative and per direction), fields carry *Taylor rules* that propagate
truncated Taylor series through the whole expression DAG **in batch**, with
the primal and all intermediate series memoized per collocation set. On the
2-D Laplace benchmark this evaluates u, du/dx, d2u/dx2, du/dy, d2u/dy2 with
ONE shared forward pass + cheap per-direction tangent algebra — measured ~4x
over the generic path on TPU.
"""
from .taylor import TSeries, TContext, teval, elementwise_series, constant_series
from .pallas_mlp import enable_pallas, disable_pallas, pallas_enabled, fcnn_taylor_pallas

__all__ = ['TSeries', 'TContext', 'teval', 'elementwise_series', 'constant_series',
           'enable_pallas', 'disable_pallas', 'pallas_enabled', 'fcnn_taylor_pallas']
