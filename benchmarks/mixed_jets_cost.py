"""Deterministic XLA cost analysis of the mixed-partial (round 3) engine.

Compares compiled FLOPs / HBM bytes of residual+grad steps for spherical
VECTOR problems — whose operator compositions (curl-of-curl, vector
Laplacian) produce genuinely mixed partials like d²/drdθ — between:

- ``taylor``: the batched engine with polarization-recovered mixed jets
  (round 3; previously these compositions left the batched path), and
- ``compose``: the per-sample nested-jvp path (what the mixed entries fell
  back to before round 3).

Methodology follows benchmarks/RESULTS.md round 2:
``jit(f).lower(args).compile().cost_analysis()`` — deterministic, immune to
tunnel variance.

Run: python benchmarks/mixed_jets_cost.py   (any backend; numbers are static)
"""
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu import operators as ops
from neurodiffeq_tpu.fields import coords_from_points
from neurodiffeq_tpu.networks import FCNN

N_POINTS = 512
HIDDEN = (32, 32)


def build_loss(kind, nets):
    """kind: 'veclap' or 'curlcurl'."""

    def loss(params, points):
        cf = coords_from_points(points)[0].coords
        r, th, ph = cf.coord_fields()
        us = []
        for net, p in zip(nets, params):
            us.append(F.network_field(
                (lambda _p, _net: lambda xs: jnp.atleast_1d(_net.apply(_p, xs)))(p, net),
                cf, module=net, params=p))
        if kind == 'veclap':
            a, b, c = ops.spherical_vector_laplacian(*us, r, th, ph)
        else:
            a, b, c = ops.spherical_curl(
                *ops.spherical_curl(*us, r, th, ph), r, th, ph)
        res = a + b + c
        return jnp.mean(res.value ** 2)

    return loss


def measure(kind, mode):
    nets = [FCNN(3, 1, hidden_units=HIDDEN) for _ in range(3)]
    params = [net.init(jax.random.PRNGKey(i)) for i, net in enumerate(nets)]
    rng = np.random.RandomState(0)
    points = jnp.asarray(rng.rand(N_POINTS, 3) + 0.3)

    loss = build_loss(kind, nets)

    def step(params, points):
        with F.eval_mode(mode):
            return jax.value_and_grad(loss)(params, points)

    compiled = jax.jit(step).lower(params, points).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return dict(flops=ca.get('flops', float('nan')),
                bytes=ca.get('bytes accessed', float('nan')))


def main():
    rows = []
    for kind, label in (('veclap', 'spherical_vector_laplacian'),
                        ('curlcurl', 'spherical_curl∘spherical_curl')):
        t = measure(kind, 'taylor')
        c = measure(kind, 'compose')
        rows.append(dict(
            problem=label,
            taylor_mflops=round(t['flops'] / 1e6, 1),
            compose_mflops=round(c['flops'] / 1e6, 1),
            flop_ratio=round(c['flops'] / t['flops'], 2),
            taylor_mb=round(t['bytes'] / 1e6, 1),
            compose_mb=round(c['bytes'] / 1e6, 1),
            byte_ratio=round(c['bytes'] / t['bytes'], 2),
        ))
        print(json.dumps(rows[-1], ensure_ascii=False))

    print(f"\n{N_POINTS} pts, 3x FCNN 3-{'-'.join(map(str, HIDDEN))}-1, "
          "value_and_grad of mean-square residual")
    print("| problem | batched (mixed jets) | per-sample compose | FLOP ratio | byte ratio |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['problem']} | {r['taylor_mflops']}M FLOP / {r['taylor_mb']}MB "
              f"| {r['compose_mflops']}M FLOP / {r['compose_mb']}MB "
              f"| {r['flop_ratio']}x | {r['byte_ratio']}x |")


if __name__ == "__main__":
    main()
