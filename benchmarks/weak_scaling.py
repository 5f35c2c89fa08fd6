"""Weak-scaling of the sharded train step over a virtual CPU device mesh.

Runs the flagship 2-D Laplace train step (sample + enforce + residual + loss
+ grad + Adam) on 1/2/4/8-device ``points`` meshes with the collocation batch
scaled proportionally (constant work per device), and reports throughput.

The devices are *virtual* (``--xla_force_host_platform_device_count=8`` CPU
devices sharing one host's cores), so absolute speedup is not the point —
the table validates that (a) the sharded step compiles and runs at every
mesh size and (b) per-device throughput does not collapse as the mesh grows,
i.e. the collectives the sharding inserts (one psum for the loss/grads) stay
O(model), not O(points). Real-ICI scaling needs real chips.

Run: python benchmarks/weak_scaling.py
"""
import json
import os
import re
import subprocess
import sys
import time

N_DEVICES = 8
POINTS_PER_DEVICE = 2048  # grid (32, 64*k/32) per device below
HIDDEN = 64
EPOCHS = 200
CHUNK = 50


def _virtual_cpu_env_ok(n):
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        return False
    m = re.search(r"--xla_force_host_platform_device_count=(\d+)",
                  os.environ.get("XLA_FLAGS", ""))
    return bool(m) and int(m.group(1)) >= n


def main():
    if not _virtual_cpu_env_ok(N_DEVICES):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if not f.startswith("--xla_force_host_platform_device_count")]
        flags.append(f"--xla_force_host_platform_device_count={N_DEVICES}")
        env["XLA_FLAGS"] = " ".join(flags)
        subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env, check=True)
        return

    import jax
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _flagship_solver
    from neurodiffeq_tpu.parallel import make_mesh
    from neurodiffeq_tpu.utils import next_rng_key, set_seed

    devices = jax.devices()
    assert len(devices) >= N_DEVICES, f"need {N_DEVICES} virtual devices, got {len(devices)}"

    rows = []
    # 1-D points (DP) meshes at 1/2/4/8 devices, plus a 2-D DP x TP
    # (4 points x 2 model) Megatron mesh at 8 devices
    for k, model_axis in ((1, None), (2, None), (4, None), (8, None), (8, 2)):
        set_seed(0)
        mesh = make_mesh(devices=devices[:k], model_axis_size=model_axis)
        n_dp = mesh.shape['points']
        n_points = POINTS_PER_DEVICE * n_dp
        grid = (32, n_points // 32)
        solver = _flagship_solver(mesh=mesh, grid=grid, hidden=(HIDDEN,),
                                  n_batches_valid=0)
        chunk_fn = solver._get_compiled(
            f'fit_chunk_{CHUNK}', lambda: solver._build_fit_chunk(CHUNK))
        params, opt_state = solver.params, solver.opt_state
        best, lowest = params, jax.numpy.asarray(jax.numpy.inf, jax.numpy.float32)
        # warmup / compile
        (params, opt_state, best, lowest), outs = chunk_fn(
            params, opt_state, best, lowest, next_rng_key())
        _ = float(np.asarray(outs[0][-1]))

        t0 = time.perf_counter()
        last = None
        for _ in range(EPOCHS // CHUNK):
            (params, opt_state, best, lowest), outs = chunk_fn(
                params, opt_state, best, lowest, next_rng_key())
            last = outs[0]
        _ = float(np.asarray(last[-1]))  # sync
        dt = time.perf_counter() - t0
        pps = EPOCHS * n_points / dt
        mesh_desc = (f"{n_dp}dp x {model_axis}tp" if model_axis else f"{k}dp")
        rows.append(dict(devices=k, mesh=mesh_desc, points_per_batch=n_points,
                         points_per_sec=round(pps),
                         points_per_sec_per_device=round(pps / k),
                         final_loss=float(np.asarray(last[-1]))))
        print(json.dumps(rows[-1]))

    print("\n| devices | mesh | pts/batch | pts/s | pts/s/device |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['devices']} | {r['mesh']} | {r['points_per_batch']} | "
              f"{r['points_per_sec']:,} | {r['points_per_sec_per_device']:,} |")


if __name__ == "__main__":
    main()
