"""Benchmark: collocation residual evals/sec/chip on the Solver2D Laplace config.

North-star metric (BASELINE.json): collocation residual evaluations per second
per chip on the 2-D Laplace Dirichlet problem (FCNN 2->512->1, 1024 points per
batch), compared against a measured PyTorch-CPU baseline implementing the
reference's training step semantics (sample -> forward -> autograd second
derivatives -> MSE residual loss -> Adam step; reference solvers.py:366-407).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

GRID = (32, 32)           # 1024 collocation points per batch
HIDDEN = 512
WARMUP_EPOCHS = 20
BENCH_EPOCHS = 10000
BENCH_REPS = 3            # timed repetitions; report the median (tunnel variance)
TORCH_BENCH_EPOCHS = 60


def bench_ours():
    import jax
    import jax.numpy as jnp
    from neurodiffeq_tpu.utils import next_rng_key, set_seed
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _flagship_solver

    set_seed(0)
    # n_batches_valid=0: train-only, apples-to-apples with the torch baseline
    solver = _flagship_solver(grid=GRID, hidden=(HIDDEN,), n_batches_valid=0)
    n_points = GRID[0] * GRID[1]

    # chunked on-device epoch scan: the same path `fit()` uses without callbacks
    chunk = 500
    chunk_fn = solver._get_compiled(f'fit_chunk_{chunk}', lambda: solver._build_fit_chunk(chunk))
    params, opt_state = solver.params, solver.opt_state
    best, lowest = params, jnp.asarray(jnp.inf, jnp.float32)

    # warmup / compile (host transfer forces a real sync; block_until_ready is
    # unreliable on the axon remote-execution platform)
    (params, opt_state, best, lowest), outs = chunk_fn(params, opt_state, best, lowest, next_rng_key())
    _ = float(np.asarray(outs[0][-1]))

    n_chunks = max(BENCH_EPOCHS // chunk, 1)
    all_losses = []
    rep_throughputs = []
    total_dt = 0.0
    for _ in range(BENCH_REPS):
        rep_losses = []
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            (params, opt_state, best, lowest), outs = chunk_fn(
                params, opt_state, best, lowest, next_rng_key())
            rep_losses.append(outs[0])
        _ = float(np.asarray(rep_losses[-1][-1]))  # force sync before stopping timer
        dt = time.perf_counter() - t0
        total_dt += dt
        rep_throughputs.append(n_chunks * chunk * n_points / dt)
        all_losses.extend(rep_losses)
    final_loss = float(np.asarray(all_losses[-1][-1]))

    # median over repetitions: the axon tunnel varies +-50% between runs
    evals_per_sec = float(np.median(rep_throughputs))
    # second north-star metric: epochs + wall-clock to target residual MSE
    losses = np.concatenate([np.asarray(x) for x in all_losses])
    target = 1e-3
    hits = np.nonzero(losses < target)[0]
    epochs_to_target = int(hits[0]) + 1 if hits.size else None
    secs_to_target = (epochs_to_target / (len(losses) / total_dt)) if hits.size else None
    return evals_per_sec, rep_throughputs, final_loss, epochs_to_target, secs_to_target


def bench_torch_cpu():
    """Reference-semantics PyTorch-CPU step: fresh noisy sample, forward,
    create_graph autograd second derivatives, residual MSE, backward, Adam."""
    import torch
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    n_points = GRID[0] * GRID[1]

    net = torch.nn.Sequential(
        torch.nn.Linear(2, HIDDEN), torch.nn.Tanh(), torch.nn.Linear(HIDDEN, 1),
    ).double()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)

    gx, gy = np.meshgrid(np.linspace(0, 1, GRID[0]), np.linspace(0, 1, GRID[1]), indexing='ij')
    base = torch.tensor(np.stack([gx.ravel(), gy.ravel()], 1))
    noise = (1.0 / GRID[0]) / 4.0

    def step():
        pts = base + torch.randn_like(base) * noise
        x = pts[:, 0:1].requires_grad_()
        y = pts[:, 1:2].requires_grad_()
        xy = torch.cat([x, y], dim=1)
        out = net(xy)
        # DirichletBVP2D-style reparameterization (sin(pi x) bottom edge)
        u = (1 - y) * torch.sin(np.pi * x) + x * (1 - x) * y * (1 - y) * out
        ones = torch.ones_like(u)
        ux, = torch.autograd.grad(u, x, grad_outputs=ones, create_graph=True)
        uxx, = torch.autograd.grad(ux, x, grad_outputs=torch.ones_like(ux), create_graph=True)
        uy, = torch.autograd.grad(u, y, grad_outputs=ones, create_graph=True)
        uyy, = torch.autograd.grad(uy, y, grad_outputs=torch.ones_like(uy), create_graph=True)
        residual = uxx + uyy
        loss = (residual ** 2).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss

    for _ in range(5):
        step()
    t0 = time.perf_counter()
    for _ in range(TORCH_BENCH_EPOCHS):
        step()
    dt = time.perf_counter() - t0
    return TORCH_BENCH_EPOCHS * n_points / dt


def _run_with_retries():
    """Re-exec the measurement in a child process with a hard timeout.

    TPU device init goes through a remote tunnel here; when the tunnel flakes
    the PJRT client blocks in C (uninterruptible from Python), which would
    hang the benchmark forever. A child process can be killed and retried.
    Budget per attempt: compile of the chunked step has been measured at up
    to ~10 min on the remote compile service (see .claude/skills/verify),
    plus the timed reps and the torch baseline.
    """
    import subprocess

    attempts = int(os.environ.get('NEURODIFF_BENCH_ATTEMPTS', 3))
    timeout_s = float(os.environ.get('NEURODIFF_BENCH_TIMEOUT', 1800))
    env = {**os.environ, 'NEURODIFF_BENCH_CHILD': '1'}
    last = None
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=timeout_s, capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            print(f"bench attempt {i + 1}/{attempts} timed out after "
                  f"{timeout_s}s (TPU tunnel hang?), retrying", file=sys.stderr)
            continue
        sys.stderr.write(proc.stderr)
        lines = [l for l in proc.stdout.splitlines() if l.strip().startswith('{')]
        if proc.returncode == 0 and lines:
            print(lines[-1])
            return 0
        last = proc
        print(f"bench attempt {i + 1}/{attempts} failed "
              f"(rc={proc.returncode}), retrying", file=sys.stderr)
    if last is not None:
        sys.stdout.write(last.stdout)
    return 1


def main():
    ours, reps, final_loss, epochs_to_target, secs_to_target = bench_ours()
    try:
        baseline = bench_torch_cpu()
    except Exception:
        baseline = None

    result = {
        "metric": "laplace2d_collocation_residual_evals_per_sec_per_chip",
        "value": round(ours, 1),
        "unit": "points/s",
        "vs_baseline": round(ours / baseline, 2) if baseline else None,
        "extra": {
            "torch_cpu_baseline_points_per_sec": round(baseline, 1) if baseline else None,
            "rep_points_per_sec": [round(r, 1) for r in reps],
            "rep_min": round(min(reps), 1),
            "rep_max": round(max(reps), 1),
            "final_train_loss": final_loss,
            "epochs_to_residual_mse_1e-3": epochs_to_target,
            "seconds_to_residual_mse_1e-3": round(secs_to_target, 4) if secs_to_target else None,
            "batch_points": GRID[0] * GRID[1],
            "hidden": HIDDEN,
            "epochs_timed_per_rep": BENCH_EPOCHS,
            "reps": BENCH_REPS,
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    if os.environ.get('NEURODIFF_BENCH_CHILD') == '1':
        main()
    else:
        sys.exit(_run_with_retries())
