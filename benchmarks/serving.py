"""Serving benchmark: inference throughput of an exported solution artifact.

Trains the Laplace flagship briefly, exports the solution via jax.export, and
measures evaluation throughput of (a) the live Solution object, (b) the
deserialized StableHLO artifact.

Usage: python benchmarks/serving.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from neurodiffeq_tpu.utils import set_seed
    from neurodiffeq_tpu.solvers import load_exported_solution
    from __graft_entry__ import _flagship_solver

    set_seed(0)
    solver = _flagship_solver(grid=(32, 32), hidden=(512,))
    solver.fit(max_epochs=500, tqdm_file=None)
    sol = solver.get_solution()

    n = 1 << 16
    pts = np.random.rand(n, 2).astype(np.float32)

    # live Solution path
    _ = np.asarray(sol(pts[:, 0], pts[:, 1]))
    t0 = time.perf_counter()
    reps = 50
    for _ in range(reps):
        out = sol(pts[:, 0], pts[:, 1])
    _ = np.asarray(out)
    live = reps * n / (time.perf_counter() - t0)

    # exported artifact path (per-call: includes one dispatch per batch)
    blob = sol.export(n_coords=2, dtype=jnp.float32)
    serve = load_exported_solution(blob)
    serve_jit = jax.jit(lambda p: serve(p))
    _ = np.asarray(serve_jit(pts)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = serve_jit(pts)
    _ = np.asarray(out[0])
    exported = reps * n / (time.perf_counter() - t0)

    # device-side number: scan-chunk `reps` artifact evaluations into ONE
    # dispatch, with the carry feeding (a numerically-zero) perturbation into
    # the next batch so XLA cannot hoist the body out of the loop — the same
    # amortization trick the training path uses (benchmarks/RESULTS.md round
    # 2: per-call timings at this batch size measure the tunnel, not the
    # chip).
    jpts = jnp.asarray(pts)

    @jax.jit
    def chunk(p):
        def body(carry, _):
            (out,) = serve(p + carry * jnp.float32(1e-38))
            return jnp.tanh(out.sum()) * jnp.float32(1e-6), None

        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return final

    _ = float(np.asarray(chunk(jpts)))  # compile + warm
    t0 = time.perf_counter()
    _ = float(np.asarray(chunk(jpts)))
    device_side = reps * n / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "solution_inference_points_per_sec",
        "live_solution": round(live, 1),
        "exported_stablehlo_per_call": round(exported, 1),
        "exported_stablehlo_device_side": round(device_side, 1),
        "artifact_bytes": len(blob),
        "batch": n,
        "reps_per_dispatch": reps,
    }))


if __name__ == '__main__':
    main()
