"""A/B for the causal training loss (`losses.causal`, Wang et al. 2022).

Two experiments, one JSON line each:

1. **Allen-Cahn** (the causal paper's flagship):
   ``u_t = 1e-4 u_xx - 5u^3 + 5u`` on x in [-1,1], t in [0,1],
   ``u(x,0) = x^2 cos(pi x)`` and ``u(+-1,t) = -1`` — both enforced
   *exactly* via IBVP1D reparameterization. Quality = rel-L2 at t=1
   against a method-of-lines reference (LSODA on a 401-point grid,
   rtol=atol=1e-8). Measured result: causal(eps=5) cuts the final-time
   error ~1.5x at equal epoch budgets (see RESULTS.md).

2. **Long-horizon oscillator control**: ``u'' + 25u = 0`` on t in [0,12]
   with exact ICs. Here the collapse causal training targets is already
   prevented by exact-constraint enforcement, and causal *slows*
   convergence — the honest negative control; `losses.causal`'s docstring
   points users at this tradeoff.

Run: python benchmarks/causal_ab.py [--quick]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')

from neurodiffeq_tpu import fields as F  # noqa: E402
from neurodiffeq_tpu.fields import diff  # noqa: E402
from neurodiffeq_tpu.conditions import IBVP1D, IVP  # noqa: E402
from neurodiffeq_tpu.generators import Generator1D, Generator2D  # noqa: E402
from neurodiffeq_tpu.solvers import Solver1D, Solver2D  # noqa: E402
from neurodiffeq_tpu.networks import FCNN, SinActv  # noqa: E402
from neurodiffeq_tpu.losses import causal  # noqa: E402
from neurodiffeq_tpu.utils import set_seed  # noqa: E402


def allen_cahn_reference(nx=401):
    """Method-of-lines LSODA reference on a uniform grid; returns (x, u(x,1))."""
    from scipy.integrate import solve_ivp
    x = np.linspace(-1, 1, nx)
    dx = x[1] - x[0]
    u0 = x ** 2 * np.cos(np.pi * x)

    def rhs(t, u):
        du = np.empty_like(u)
        du[1:-1] = 1e-4 * (u[2:] - 2 * u[1:-1] + u[:-2]) / dx ** 2 \
            - 5 * u[1:-1] ** 3 + 5 * u[1:-1]
        du[0] = du[-1] = 0.0
        return du

    sol = solve_ivp(rhs, (0, 1), u0, method='LSODA', t_eval=[1.0],
                    rtol=1e-8, atol=1e-8)
    return x, sol.y[:, -1]


def run_allen_cahn(loss_fn, epochs, xr, ur):
    set_seed(7)
    cond = IBVP1D(
        x_min=-1.0, x_max=1.0, t_min=0.0,
        t_min_val=lambda x: x ** 2 * F.cos(np.pi * x),
        x_min_val=lambda t: 0 * t - 1.0,
        x_max_val=lambda t: 0 * t - 1.0,
    )
    s = Solver2D(
        pde_system=lambda u, x, t: [diff(u, t) - 1e-4 * diff(u, x, 2)
                                    + 5 * u ** 3 - 5 * u],
        conditions=[cond],
        xy_min=(-1.0, 0.0), xy_max=(1.0, 1.0),
        nets=[FCNN(n_input_units=2, n_output_units=1, hidden_units=(64, 64, 64))],
        train_generator=Generator2D((64, 32), (-1.0, 0.0), (1.0, 1.0),
                                    method='equally-spaced-noisy'),
        valid_generator=Generator2D((64, 32), (-1.0, 0.0), (1.0, 1.0),
                                    method='equally-spaced'),
        loss_fn=loss_fn,
    )
    t0 = time.perf_counter()
    s.fit(max_epochs=epochs, tqdm_file=None)
    dt = time.perf_counter() - t0
    pred = np.asarray(s.get_solution(best=False)(xr, np.full_like(xr, 1.0)))
    rel = float(np.linalg.norm(pred - ur) / np.linalg.norm(ur))
    return rel, dt


def run_oscillator(loss_fn, epochs, w0=5.0, T=12.0):
    set_seed(7)
    s = Solver1D(
        ode_system=lambda u, t: [diff(u, t, 2) + w0 ** 2 * u],
        conditions=[IVP(0.0, 1.0, 0.0)],
        t_min=0.0, t_max=T,
        nets=[FCNN(hidden_units=(64, 64), actv=SinActv)],
        train_generator=Generator1D(128, 0.0, T, method='equally-spaced-noisy'),
        valid_generator=Generator1D(128, 0.0, T, method='equally-spaced'),
        loss_fn=loss_fn,
    )
    s.fit(max_epochs=epochs, tqdm_file=None)
    ts = np.linspace(0, T, 801)
    pred = np.asarray(s.get_solution(best=False)(ts))
    return float(np.max(np.abs(pred - np.cos(w0 * ts))))


def main():
    quick = '--quick' in sys.argv
    budgets = (2000,) if quick else (30000, 100000)

    xr, ur = allen_cahn_reference()
    for epochs in budgets:
        row = {'name': 'allen_cahn_causal_ab', 'epochs': epochs}
        for label, lf in (('vanilla', None), ('causal_eps5', causal(epsilon=5.0))):
            rel, dt = run_allen_cahn(lf, epochs, xr, ur)
            row[f'{label}_rel_l2_t1'] = round(rel, 5)
            row[f'{label}_fit_s'] = round(dt, 1)
        row['error_ratio'] = round(row['vanilla_rel_l2_t1']
                                   / row['causal_eps5_rel_l2_t1'], 3)
        print(json.dumps(row), flush=True)

    osc_budgets = (2000,) if quick else (20000, 50000, 100000)
    row = {'name': 'oscillator_causal_control'}
    for epochs in osc_budgets:
        row[f'vanilla_{epochs}'] = round(run_oscillator(None, epochs), 4)
        row[f'causal1_{epochs}'] = round(
            run_oscillator(causal(epsilon=1.0), epochs), 4)
    print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
