"""Reference-semantics PyTorch-CPU training steps for every BASELINE config.

Each ``make_*`` builder returns a zero-argument *segment* closure: calling it
runs ``n_epochs`` full reference-semantics epochs (fresh collocation sample,
forward, ``create_graph=True`` autograd derivatives, residual loss, backward,
Adam step, plus the solver-default validation batches where the measured
config includes them) and returns epochs/sec. Builders warm up before
returning so segments are steady-state.

These are NOT ports of the reference's code — they re-implement the training
*step semantics* the reference executes (reference ``solvers.py:366-407``:
sample -> ``cond.enforce`` reparameterization -> ``diff`` residuals ->
norm loss -> ``backward`` -> optimizer step) as compact torch programs,
written the efficient way (first partials of one output w.r.t. several
inputs share one backward pass; second derivatives differentiate the first)
so the measured baseline is torch at its best, not a strawman. float64
throughout (the reference's default dtype, ``__init__.py:22``).

Interleaving/medians happen in ``benchmarks/configs.py::_interleaved_ab``.
"""
import os
import time

import numpy as np

__all__ = [
    'make_lotka_volterra_segment', 'make_laplace2d_segment',
    'make_spherical_poisson_segment', 'make_cavity_deep_segment',
    'make_cavity_psi_segment', 'make_bundle_segment',
]


def _torch():
    import torch
    torch.set_num_threads(os.cpu_count() or 8)
    return torch


def _fcnn(torch, n_in, n_out, hidden, actv):
    layers = []
    last = n_in
    for h in hidden:
        layers += [torch.nn.Linear(last, h), actv()]
        last = h
    layers.append(torch.nn.Linear(last, n_out))
    return torch.nn.Sequential(*layers).double()


def _sin_module(torch):
    class Sin(torch.nn.Module):
        def forward(self, x):
            return torch.sin(x)

    return Sin


def _segment(epoch_fn, warmup, n_epochs):
    """Wrap an epoch function into a timed segment closure."""
    for _ in range(warmup):
        epoch_fn()

    def run():
        t0 = time.perf_counter()
        for _ in range(n_epochs):
            epoch_fn()
        return n_epochs / (time.perf_counter() - t0)

    return run


def _d(torch, out, wrt, create_graph=True):
    """One first derivative (reference ``diff`` semantics: per-sample, the
    point-to-point Jacobian is diagonal so grad-of-sum == per-sample grad)."""
    g, = torch.autograd.grad(out, wrt, grad_outputs=torch.ones_like(out),
                             create_graph=create_graph)
    return g


def make_lotka_volterra_segment(n_epochs=40):
    """README exemplar (reference README.md:85-94): Solver1D, 2x
    FCNN(1-32-32-1, sin), IVP at t=0.1, 32 noisy points, 1 train + 4 valid
    batches per epoch."""
    torch = _torch()
    torch.manual_seed(0)
    Sin = _sin_module(torch)
    net_u = _fcnn(torch, 1, 1, (32, 32), Sin)
    net_v = _fcnn(torch, 1, 1, (32, 32), Sin)
    opt = torch.optim.Adam(list(net_u.parameters()) + list(net_v.parameters()), lr=1e-3)
    base = torch.linspace(0.1, 12.0, 32).double().reshape(-1, 1)
    noise = ((12.0 - 0.1) / 32) / 4

    def losses(t):
        t = t.requires_grad_()
        blend = 1 - torch.exp(-(t - 0.1))
        u = 1.5 + blend * net_u(t)
        v = 1.0 + blend * net_v(t)
        du = _d(torch, u, t)
        dv = _d(torch, v, t)
        r1 = du - (u - u * v)
        r2 = dv - (u * v - v)
        return (r1 ** 2).mean() + (r2 ** 2).mean()

    def epoch():
        opt.zero_grad()
        loss = losses(base + torch.randn_like(base) * noise)
        loss.backward()
        opt.step()
        for _ in range(4):  # validation batches: loss only, no backward
            losses(base.clone())

    return _segment(epoch, warmup=5, n_epochs=n_epochs)


def make_laplace2d_segment(n_epochs=20, grid=(32, 32), hidden=512, n_valid=4):
    """README exemplar (reference README.md:113-129): Solver2D Laplace,
    FCNN(2-512-1, tanh), DirichletBVP2D, 1024 noisy grid points."""
    torch = _torch()
    torch.manual_seed(0)
    net = _fcnn(torch, 2, 1, (hidden,), torch.nn.Tanh)
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    gx, gy = np.meshgrid(np.linspace(0, 1, grid[0]), np.linspace(0, 1, grid[1]),
                         indexing='ij')
    base = torch.tensor(np.stack([gx.ravel(), gy.ravel()], 1))
    noise = (1.0 / grid[0]) / 4.0

    def loss_at(pts):
        x = pts[:, 0:1].requires_grad_()
        y = pts[:, 1:2].requires_grad_()
        out = net(torch.cat([x, y], dim=1))
        # DirichletBVP2D additive interpolant for these edge values reduces
        # to (1-y)·sin(pi x); bump factor x(1-x)y(1-y) gates the net
        u = (1 - y) * torch.sin(np.pi * x) + x * (1 - x) * y * (1 - y) * out
        ux = _d(torch, u, x)
        uy = _d(torch, u, y)
        uxx = _d(torch, ux, x)
        uyy = _d(torch, uy, y)
        return ((uxx + uyy) ** 2).mean()

    def epoch():
        opt.zero_grad()
        loss_at(base + torch.randn_like(base) * noise).backward()
        opt.step()
        for _ in range(n_valid):
            loss_at(base.clone())

    return _segment(epoch, warmup=3, n_epochs=n_epochs)


def make_spherical_poisson_segment(n_epochs=20, n_points=512, hidden=(64, 64)):
    """Gaussian-charge spherical Poisson (reference
    tests/test_pde_spherical.py:103-174 problem; benchmarked at the round-2
    converged net size): SolverSpherical semantics — GeneratorSpherical
    sampling, DirichletBVPSpherical two-ended reparameterization, spherical
    Laplacian residual, 1 train + 4 valid batches."""
    torch = _torch()
    torch.manual_seed(0)
    r0, r1 = 0.1, 3.0
    from scipy.special import erf as _erf
    K = 1 / (4 * np.pi)
    v0 = float(K / r0 * _erf(r0 / np.sqrt(2)))
    v1 = float(K / r1 * _erf(r1 / np.sqrt(2)))
    coeff = 1 / np.power(2 * np.pi, 1.5)
    net = _fcnn(torch, 3, 1, tuple(hidden), torch.nn.Tanh)
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)

    def sample():
        # GeneratorSpherical: uniform on the sphere, volume-uniform radius
        u = torch.rand(n_points, 3).double()
        r = (r0 ** 3 + (r1 ** 3 - r0 ** 3) * u[:, 0:1]) ** (1 / 3)
        th = torch.acos(1 - 2 * u[:, 1:2])
        ph = 2 * np.pi * u[:, 2:3]
        return r, th, ph

    def loss_at(r, th, ph):
        r = r.requires_grad_()
        th = th.requires_grad_()
        ph = ph.requires_grad_()
        out = net(torch.cat([r, th, ph], dim=1))
        # DirichletBVPSpherical two-ended reparameterization
        rt = (r - r0) / (r1 - r0)
        u = v0 * (1 - rt) + v1 * rt + (1 - torch.exp((1 - rt) * rt)) * out
        ur = _d(torch, u, r)
        uth = _d(torch, u, th)
        uph = _d(torch, u, ph)
        sin_th = torch.sin(th)
        # conservative-form spherical Laplacian (reference operators.py:189)
        lap = (_d(torch, r ** 2 * ur, r)
               + _d(torch, sin_th * uth, th) / sin_th
               + _d(torch, uph, ph) / sin_th ** 2) / r ** 2
        rho = coeff * torch.exp(-(r ** 2) / 2)
        return ((lap + rho) ** 2).mean()

    def epoch():
        opt.zero_grad()
        loss_at(*sample()).backward()
        opt.step()
        for _ in range(4):
            loss_at(*sample())

    return _segment(epoch, warmup=3, n_epochs=n_epochs)


def _cavity_points(torch, n_points):
    pts = torch.rand(n_points, 2).double()
    x = pts[:, 0:1].requires_grad_()
    y = pts[:, 1:2].requires_grad_()
    return x, y


def make_cavity_deep_segment(n_epochs=2, n_points=16384, hidden=(128,) * 5,
                             Re=100.0):
    """Lid-driven cavity RE100, the converged deep config
    (benchmarks/configs.py::bench_lid_driven_cavity): shared FCNN
    2-(128x5)-3, hard-constraint trials, steady Navier-Stokes residuals,
    16,384 fresh uniform points per step, train-only."""
    torch = _torch()
    torch.manual_seed(0)
    nu = 1.0 / Re
    net = _fcnn(torch, 2, 3, tuple(hidden), torch.nn.Tanh)
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)

    def epoch():
        x, y = _cavity_points(torch, n_points)
        out = net(torch.cat([x, y], dim=1))
        bump = x * (1 - x) * y * (1 - y)
        u_lid = (1 - torch.exp(-50.0 * x)) * (1 - torch.exp(50.0 * (x - 1)))
        u = bump * out[:, 0:1] + y * u_lid
        v = bump * out[:, 1:2]
        p = (1 - torch.exp(-x)) * (1 - torch.exp(-y)) * out[:, 2:3]
        ux = _d(torch, u, x)
        uy = _d(torch, u, y)
        vx = _d(torch, v, x)
        vy = _d(torch, v, y)
        px = _d(torch, p, x)
        py = _d(torch, p, y)
        uxx = _d(torch, ux, x)
        uyy = _d(torch, uy, y)
        vxx = _d(torch, vx, x)
        vyy = _d(torch, vy, y)
        mom_x = u * ux + v * uy + px - nu * (uxx + uyy)
        mom_y = u * vx + v * vy + py - nu * (vxx + vyy)
        cont = ux + vy
        loss = ((mom_x ** 2).mean() + (mom_y ** 2).mean() + (cont ** 2).mean()) / 3
        opt.zero_grad()
        loss.backward()
        opt.step()

    # one torch epoch takes ~25 s on this box (measured); keep segments short —
    # the ratio has 2+ orders of magnitude of headroom over the 20x bar
    return _segment(epoch, warmup=1, n_epochs=n_epochs)


def make_cavity_psi_segment(n_epochs=3, n_points=16384, hidden=(128,) * 5,
                            Re=100.0, w_scale=50.0, w_weight=0.3, k=20.0, A=50.0):
    """Cavity RE100 in streamfunction-vorticity form
    (examples/cavity_streamfunction.py): shared FCNN 2-(128x5)-2, C^1 trial
    function, vorticity-definition + transport residuals, train-only."""
    torch = _torch()
    torch.manual_seed(0)
    nu = 1.0 / Re
    net = _fcnn(torch, 2, 2, tuple(hidden), torch.nn.Tanh)
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)

    def epoch():
        x, y = _cavity_points(torch, n_points)
        out = net(torch.cat([x, y], dim=1))
        u_lid = ((1 - torch.exp(-((A * x) ** 2)))
                 * (1 - torch.exp(-((A * (x - 1)) ** 2))))
        bump = x * (1 - x) * y * (1 - y)
        psi = (y * y * (y - 1) * torch.exp(-k * (1 - y)) * u_lid
               + bump * bump * out[:, 0:1])
        w = w_scale * out[:, 1:2]
        psix = _d(torch, psi, x)
        psiy = _d(torch, psi, y)
        psixx = _d(torch, psix, x)
        psiyy = _d(torch, psiy, y)
        wx = _d(torch, w, x)
        wy = _d(torch, w, y)
        wxx = _d(torch, wx, x)
        wyy = _d(torch, wy, y)
        r_def = w + psixx + psiyy
        r_tr = psiy * wx - psix * wy - nu * (wxx + wyy)
        loss = (w_weight ** 2 * (r_def ** 2).mean() + (r_tr ** 2).mean()) / 2
        opt.zero_grad()
        loss.backward()
        opt.step()

    return _segment(epoch, warmup=1, n_epochs=n_epochs)


def make_bundle_segment(n_epochs=30, grid=32):
    """Solution bundle over (t, lambda) (BundleSolver1D semantics,
    benchmarks/configs.py::bench_bundle_hypersolver): 32x32 mesh of noisy
    t-nodes x lambda-nodes, FCNN 2-32-32-1, BundleIVP reparameterization,
    first-order residual u' + lambda*u, 1 train + 4 valid batches."""
    torch = _torch()
    torch.manual_seed(0)
    net = _fcnn(torch, 2, 1, (32, 32), torch.nn.Tanh)
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    t_nodes = torch.linspace(0.0, 1.0, grid).double()
    lam_nodes = torch.linspace(0.5, 1.5, grid).double()
    t_noise = (1.0 / grid) / 4
    lam_noise = (1.0 / grid) / 4

    def mesh(noisy):
        t = t_nodes + (torch.randn(grid).double() * t_noise if noisy else 0)
        lam = lam_nodes + (torch.randn(grid).double() * lam_noise if noisy else 0)
        T, L = torch.meshgrid(t, lam, indexing='ij')
        return T.reshape(-1, 1), L.reshape(-1, 1)

    def loss_at(t, lam):
        t = t.requires_grad_()
        u = 1.0 + (1 - torch.exp(-t)) * net(torch.cat([t, lam], dim=1))
        du = _d(torch, u, t)
        return ((du + lam * u) ** 2).mean()

    def epoch():
        opt.zero_grad()
        loss_at(*mesh(True)).backward()
        opt.step()
        for _ in range(4):
            loss_at(*mesh(False))

    return _segment(epoch, warmup=3, n_epochs=n_epochs)
