"""The five BASELINE.json benchmark configurations, each returning a closure
that runs the workload and reports throughput + solution quality.

Configs (BASELINE.json "configs"):
1. Lotka-Volterra ODE system  (Solver1D + 2x FCNN(SinActv) + IVP)
2. 2-D Laplace Dirichlet BVP  (Solver2D + DirichletBVP2D)
3. Spherical Poisson           (SolverSpherical + harmonics basis)
4. Lid-driven cavity RE100     (coupled u, v, p nets; penalty BCs)
5. Bundle + hypersolver        (BundleSolver1D over lambda; Euler refinement)
"""
import time

import numpy as np

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.networks import FCNN, SinActv
from neurodiffeq_tpu.conditions import IVP, DirichletBVP2D, DirichletBVPSpherical, BundleIVP, NoCondition
from neurodiffeq_tpu.generators import Generator2D
from neurodiffeq_tpu.solvers import Solver1D, Solver2D, SolverSpherical, BundleSolver1D
from neurodiffeq_tpu.operators import spherical_laplacian
from neurodiffeq_tpu.utils import set_seed


def _timed_fit(solver, epochs, points_per_epoch):
    """Run `epochs` epochs through the chunked path; return (epochs/s, points/s)."""
    # one warmup fit compiles the dynamic-length chunk program, which serves
    # EVERY later chunk span — the timed run is compile-free
    solver.fit(max_epochs=min(epochs, 100), tqdm_file=None)
    t0 = time.perf_counter()
    solver.fit(max_epochs=epochs, tqdm_file=None)
    # force sync
    _ = float(solver.metrics_history['train_loss'][-1])
    dt = time.perf_counter() - t0
    return epochs / dt, epochs * points_per_epoch / dt


def bench_lotka_volterra(epochs=3000):
    """README exemplar config (reference README.md:85-94), with a torch-CPU
    baseline implementing the reference's exact training-step semantics."""
    set_seed(0)
    alpha = beta = delta = gamma = 1.0
    solver = Solver1D(
        ode_system=lambda u, v, t: [diff(u, t) - (alpha * u - beta * u * v),
                                    diff(v, t) - (delta * u * v - gamma * v)],
        conditions=[IVP(t_0=0.1, u_0=1.5), IVP(t_0=0.1, u_0=1.0)],
        t_min=0.1, t_max=12.0,
        nets=[FCNN(actv=SinActv), FCNN(actv=SinActv)],
    )
    eps, pps = _timed_fit(solver, epochs, 32)
    sol = solver.get_solution()
    ts = np.linspace(0.1, 12, 500)
    from scipy.integrate import odeint
    ref = odeint(lambda y, t: [y[0] - y[0] * y[1], y[0] * y[1] - y[1]], [1.5, 1.0], ts)
    prey, pred = sol(ts, to_numpy=True)
    err = max(np.abs(prey - ref[:, 0]).max(), np.abs(pred - ref[:, 1]).max())
    try:
        torch_eps = _torch_lotka_volterra_epochs_per_sec()
    except Exception:
        torch_eps = None
    return dict(name='lotka_volterra', epochs_per_sec=round(eps, 1),
                points_per_sec=round(pps, 1), max_err_vs_odeint=round(float(err), 5),
                torch_cpu_epochs_per_sec=round(torch_eps, 2) if torch_eps else None,
                vs_torch_cpu=round(eps / torch_eps, 1) if torch_eps else None)


def _torch_lotka_volterra_epochs_per_sec(n_epochs=40):
    """Reference-semantics torch step: 1 train batch (32 noisy pts, fresh
    autograd first derivatives, IVP reparameterization) + 4 valid batches."""
    import os
    import torch
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)

    def make_net():
        return torch.nn.Sequential(
            torch.nn.Linear(1, 32), _TorchSin(), torch.nn.Linear(32, 32),
            _TorchSin(), torch.nn.Linear(32, 1),
        ).double()

    net_u, net_v = make_net(), make_net()
    opt = torch.optim.Adam(list(net_u.parameters()) + list(net_v.parameters()), lr=1e-3)
    base = torch.linspace(0.1, 12.0, 32).double().reshape(-1, 1)
    noise = ((12.0 - 0.1) / 32) / 4

    def losses(t):
        t = t.requires_grad_()
        blend = 1 - torch.exp(-(t - 0.1))
        u = 1.5 + blend * net_u(t)
        v = 1.0 + blend * net_v(t)
        ones = torch.ones_like(u)
        du, = torch.autograd.grad(u, t, grad_outputs=ones, create_graph=True)
        dv, = torch.autograd.grad(v, t, grad_outputs=ones, create_graph=True)
        r1 = du - (u - u * v)
        r2 = dv - (u * v - v)
        return (r1 ** 2).mean() + (r2 ** 2).mean()

    def epoch():
        opt.zero_grad()
        loss = losses(base + torch.randn_like(base) * noise)
        loss.backward()
        opt.step()
        for _ in range(4):  # validation batches
            with torch.no_grad():
                pass
            losses(base.clone())

    for _ in range(5):
        epoch()
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        epoch()
    return n_epochs / (time.perf_counter() - t0)


class _TorchSin:
    """Sin activation for the torch baseline (module-level for picklability)."""

    def __new__(cls):
        import torch

        class Sin(torch.nn.Module):
            def forward(self, x):
                return torch.sin(x)

        return Sin()


def bench_laplace2d(epochs=2000):
    """README exemplar config (reference README.md:113-129): FCNN(2-512-1)."""
    set_seed(0)
    cond = DirichletBVP2D(
        x_min=0.0, x_min_val=lambda y: 0 * y,
        x_max=1.0, x_max_val=lambda y: 0 * y,
        y_min=0.0, y_min_val=lambda x: F.sin(np.pi * x),
        y_max=1.0, y_max_val=lambda x: 0 * x,
    )
    solver = Solver2D(
        pde_system=lambda u, x, y: [diff(u, x, 2) + diff(u, y, 2)],
        conditions=[cond],
        xy_min=(0, 0), xy_max=(1, 1),
        nets=[FCNN(2, 1, hidden_units=(512,))],
        train_generator=Generator2D((32, 32), (0, 0), (1, 1), method='equally-spaced-noisy'),
        valid_generator=Generator2D((32, 32), (0, 0), (1, 1), method='equally-spaced'),
    )
    eps, pps = _timed_fit(solver, epochs, 1024)
    sol = solver.get_solution()
    xs = np.random.rand(400)
    ys = np.random.rand(400)
    expected = np.sin(np.pi * xs) * np.sinh(np.pi * (1 - ys)) / np.sinh(np.pi)
    err = np.abs(np.asarray(sol(xs, ys)) - expected).max()
    return dict(name='laplace2d_dirichlet', epochs_per_sec=round(eps, 1),
                points_per_sec=round(pps, 1), max_err_vs_analytic=round(float(err), 5))


def bench_spherical_poisson(epochs=20000):
    """Gaussian-charge electric potential (reference tests/test_pde_spherical.py:103-174).

    Converged config (round 2): FCNN 3-64-64-1 with cosine lr decay 1e-3 ->
    1e-5 over the run reaches max rel err vs analytic ~0.5% (target <= 1%);
    the reference's own test only shape-checks this problem at 2 epochs.
    """
    import optax
    from scipy.special import erf
    set_seed(0)
    Q = SIGMA = EPS_0 = 1.0
    K = 1 / (4 * np.pi * EPS_0)
    coeff = Q / SIGMA ** 3 / np.power(2 * np.pi, 1.5)
    r0, r1 = 0.1, 3.0
    v0 = float(K * Q / r0 * erf(r0 / np.sqrt(2)))
    v1 = float(K * Q / r1 * erf(r1 / np.sqrt(2)))
    rho = lambda r: coeff * F.exp(-(r ** 2) / 2)  # noqa: E731

    solver = SolverSpherical(
        pde_system=lambda u, r, th, ph: [spherical_laplacian(u, r, th, ph) + rho(r) / EPS_0],
        conditions=[DirichletBVPSpherical(r0, lambda th, ph: v0 + 0 * th,
                                          r1, lambda th, ph: v1 + 0 * th)],
        r_min=r0, r_max=r1,
        nets=[FCNN(n_input_units=3, n_output_units=1, hidden_units=(64, 64))],
        optimizer=optax.adam(optax.cosine_decay_schedule(1e-3, epochs, alpha=1e-2)),
    )
    eps, pps = _timed_fit(solver, epochs, 512)
    sol = solver.get_solution()
    rng = np.random.RandomState(42)
    rs = np.linspace(r0, r1, 256)
    ths = rng.rand(256) * np.pi * 0.9 + 0.05
    phs = rng.rand(256) * 2 * np.pi
    expected = K * Q / rs * erf(rs / np.sqrt(2))
    rel = np.abs(np.asarray(sol(rs, ths, phs)) - expected) / np.abs(expected)
    return dict(name='spherical_poisson_gaussian_charge', epochs_per_sec=round(eps, 1),
                points_per_sec=round(pps, 1), max_rel_err_vs_analytic=round(float(rel.max()), 5))


def bench_lid_driven_cavity(epochs=80000, Re=100.0):
    """Steady lid-driven cavity at RE=100, quality-checked against the Ghia,
    Ghia & Shin (1982) centerline profiles (the same tables the reference
    notebook plots, experiments/lid-driven-cavity-RE100.ipynb cell 11).

    Round-2 finding (benchmarks/RESULTS.md): the notebook's shallow 256-unit
    configuration is basin-unstable under its own protocol in BOTH frameworks
    (training transits the physical vortex around step ~8k then drifts out;
    gradients are bit-identical to torch, tests/test_torch_parity.py). The
    benchmarked config is the converged recipe: hard-constraint trial
    functions, FCNN 2-(128x5)-3 shared net, 16,384 fresh uniform points per
    step, one cosine anneal 1e-3 -> 1e-5 over the run.
    """
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "._ldc", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                              "examples", "lid_driven_cavity.py"))
    ldc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ldc)

    set_seed(4)
    solver = ldc.build_deep(Re=Re, anneal_steps=epochs)
    eps, pps = _timed_fit(solver, epochs, 16384)
    sol = solver.get_solution(best=False)
    u_err, v_err = ldc.ghia_errors(sol)
    return dict(name='lid_driven_cavity_re100', epochs_per_sec=round(eps, 1),
                points_per_sec=round(pps, 1),
                ghia_centerline_max_err_u=round(u_err, 4),
                ghia_centerline_max_err_v=round(v_err, 4),
                final_train_loss=round(float(solver.metrics_history['train_loss'][-1]), 6))


def bench_bundle_hypersolver(epochs=1500):
    """Solution bundle over an equation parameter + hypersolver refinement
    (BASELINE.json config 5)."""
    from neurodiffeq_tpu.hypersolver import Hypersolver, Euler
    set_seed(0)

    solver = BundleSolver1D(
        ode_system=lambda u, t, lam: [diff(u, t) + lam * u],
        conditions=[BundleIVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=1.0,
        theta_min=0.5, theta_max=1.5,
        eq_param_index=(0,),
    )
    eps, pps = _timed_fit(solver, epochs, 32 * 32)
    sol = solver.get_solution()
    ts = np.linspace(0, 1, 40)
    errs = []
    for lam in (0.6, 1.0, 1.4):
        us = np.asarray(sol(ts, lam * np.ones(40)))
        errs.append(np.abs(us - np.exp(-lam * ts)).max())

    # hypersolver refinement: correct an Euler integrator against the bundle
    # solution at lam = 1
    t0 = time.perf_counter()
    hs = Hypersolver(
        func=lambda u, t: [-u], u0=1.0, t0=0.0, tn=1.0, n_steps=50,
        sol=lambda ts_: [np.asarray(sol(np.asarray(ts_), np.ones(len(np.asarray(ts_)))))],
        numerical_solver=Euler(),
    )
    hs.fit(max_epochs=1000)
    hyper_time = time.perf_counter() - t0
    us, = hs.get_solution()(ts)
    hyper_err = np.abs(np.asarray(us) - np.exp(-ts)).max()

    return dict(name='bundle_plus_hypersolver', epochs_per_sec=round(eps, 1),
                points_per_sec=round(pps, 1),
                bundle_max_err=round(float(max(errs)), 5),
                hypersolver_train_s=round(hyper_time, 2),
                hypersolver_max_err=round(float(hyper_err), 5))


def bench_cavity_streamfunction(epochs=20000, Re=100.0):
    """The cavity again in streamfunction-vorticity form (round 2,
    examples/cavity_streamfunction.py): exact continuity, C1 trial BCs, no
    pressure gauge — measured 3x more accurate than the primitive deep
    config in a quarter of the steps (benchmarks/RESULTS.md)."""
    import importlib.util
    import os
    import sys
    examples_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
    if examples_dir not in sys.path:  # the example imports its Ghia tables
        sys.path.insert(0, examples_dir)
    spec = importlib.util.spec_from_file_location(
        "._csf", os.path.join(examples_dir, "cavity_streamfunction.py"))
    csf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(csf)

    solver = csf.build(Re=Re, anneal_steps=epochs)
    eps, pps = _timed_fit(solver, epochs, 16384)
    u_err, v_err = csf.ghia_errors(solver)
    return dict(name='cavity_streamfunction_re100', epochs_per_sec=round(eps, 1),
                points_per_sec=round(pps, 1),
                ghia_centerline_max_err_u=round(u_err, 4),
                ghia_centerline_max_err_v=round(v_err, 4),
                final_train_loss=round(float(solver.metrics_history['train_loss'][-1]), 6))


ALL_BENCHMARKS = [
    bench_lotka_volterra,
    bench_laplace2d,
    bench_spherical_poisson,
    bench_lid_driven_cavity,
    bench_cavity_streamfunction,
    bench_bundle_hypersolver,
]
