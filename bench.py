"""Benchmark: collocation residual evals/sec/chip on the Solver2D Laplace config.

North-star metric (BASELINE.json): collocation residual evaluations per second
per chip on the 2-D Laplace Dirichlet problem (FCNN 2->512->1, 1024 points per
batch), compared against a measured PyTorch-CPU baseline implementing the
reference's training step semantics (sample -> forward -> autograd second
derivatives -> MSE residual loss -> Adam step; reference solvers.py:366-407).

The two arms are INTERLEAVED (tpu, torch, tpu, torch, ...) and each reports
its median-of-reps: the round-3 verdict found the sequential-arm ratio swung
~3x run-to-run because the one-shot torch denominator absorbed whatever load
the box had at that moment. Interleaving + medians makes three consecutive
runs agree within 2x (measured; see benchmarks/RESULTS.md headline row).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

GRID = (32, 32)           # 1024 collocation points per batch
HIDDEN = 512
BENCH_EPOCHS = 10000
BENCH_REPS = 3            # timed repetitions per arm; medians reported
TORCH_EPOCHS_PER_REP = 30


def make_ours_rep():
    """Build the TPU arm; returns (rep_fn, finish_fn). rep_fn runs
    BENCH_EPOCHS epochs through the chunked on-device scan (the same path
    ``fit()`` uses without callbacks) and returns (points/s, losses)."""
    import jax.numpy as jnp
    from neurodiffeq_tpu.utils import next_rng_key, set_seed
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _flagship_solver

    set_seed(0)
    # n_batches_valid=0: train-only, apples-to-apples with the torch baseline
    solver = _flagship_solver(grid=GRID, hidden=(HIDDEN,), n_batches_valid=0)
    n_points = GRID[0] * GRID[1]

    chunk = 500
    chunk_fn = solver._get_compiled(f'fit_chunk_{chunk}', lambda: solver._build_fit_chunk(chunk))
    state = {}
    state['params'], state['opt_state'] = solver.params, solver.opt_state
    state['best'], state['lowest'] = state['params'], jnp.asarray(jnp.inf, jnp.float32)

    # warmup / compile (host transfer forces a real sync; block_until_ready is
    # unreliable on the axon remote-execution platform)
    (state['params'], state['opt_state'], state['best'], state['lowest']), outs = chunk_fn(
        state['params'], state['opt_state'], state['best'], state['lowest'], next_rng_key())
    _ = float(np.asarray(outs[0][-1]))

    n_chunks = max(BENCH_EPOCHS // chunk, 1)

    def rep():
        rep_losses = []
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            (state['params'], state['opt_state'], state['best'], state['lowest']), outs = chunk_fn(
                state['params'], state['opt_state'], state['best'], state['lowest'],
                next_rng_key())
            rep_losses.append(outs[0])
        _ = float(np.asarray(rep_losses[-1][-1]))  # force sync before stopping timer
        dt = time.perf_counter() - t0
        return n_chunks * chunk * n_points / dt, rep_losses, dt

    return rep


def make_torch_rep():
    """Build the torch-CPU arm (reference-semantics step: fresh noisy sample,
    forward, create_graph autograd second derivatives, residual MSE,
    backward, Adam); returns a rep fn measuring points/s."""
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

    def rep():
        t0 = time.perf_counter()
        for _ in range(TORCH_EPOCHS_PER_REP):
            step()
        dt = time.perf_counter() - t0
        return TORCH_EPOCHS_PER_REP * n_points / dt

    return rep


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
    ours_rep = make_ours_rep()
    try:
        torch_rep = make_torch_rep()
    except Exception:
        torch_rep = None

    ours_reps, torch_reps, all_losses = [], [], []
    total_dt = 0.0
    for _ in range(BENCH_REPS):
        pps, losses, dt = ours_rep()
        ours_reps.append(pps)
        all_losses.extend(losses)
        total_dt += dt
        if torch_rep is not None:
            torch_reps.append(torch_rep())

    final_loss = float(np.asarray(all_losses[-1][-1]))
    evals_per_sec = float(np.median(ours_reps))
    baseline = float(np.median(torch_reps)) if torch_reps else None

    # second north-star metric: epochs + wall-clock to target residual MSE
    losses = np.concatenate([np.asarray(x) for x in all_losses])
    target = 1e-3
    hits = np.nonzero(losses < target)[0]
    epochs_to_target = int(hits[0]) + 1 if hits.size else None
    secs_to_target = (epochs_to_target / (len(losses) / total_dt)) if hits.size else None

    result = {
        "metric": "laplace2d_collocation_residual_evals_per_sec_per_chip",
        "value": round(evals_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": round(evals_per_sec / baseline, 2) if baseline else None,
        "extra": {
            "torch_cpu_baseline_points_per_sec": round(baseline, 1) if baseline else None,
            "rep_points_per_sec": [round(r, 1) for r in ours_reps],
            "torch_rep_points_per_sec": [round(r, 1) for r in torch_reps],
            "rep_min": round(min(ours_reps), 1),
            "rep_max": round(max(ours_reps), 1),
            "final_train_loss": final_loss,
            "epochs_to_residual_mse_1e-3": epochs_to_target,
            "seconds_to_residual_mse_1e-3": round(secs_to_target, 4) if secs_to_target else None,
            "batch_points": GRID[0] * GRID[1],
            "hidden": HIDDEN,
            "epochs_timed_per_rep": BENCH_EPOCHS,
            "reps": BENCH_REPS,
            "interleaved": True,
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    if os.environ.get('NEURODIFF_BENCH_CHILD') == '1':
        main()
    else:
        sys.exit(_run_with_retries())
