"""Lotka-Volterra predator-prey system (the reference README's flagship example).

Run: python examples/lotka_volterra.py
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from neurodiffeq_tpu import diff
from neurodiffeq_tpu.solvers import Solver1D
from neurodiffeq_tpu.conditions import IVP
from neurodiffeq_tpu.networks import FCNN, SinActv
from neurodiffeq_tpu.utils import set_seed


def main():
    set_seed(42)
    alpha, beta, delta, gamma = 1., 1., 1., 1.

    def lotka_volterra(u, v, t):
        return [diff(u, t) - (alpha * u - beta * u * v),
                diff(v, t) - (delta * u * v - gamma * v)]

    solver = Solver1D(
        ode_system=lotka_volterra,
        conditions=[IVP(t_0=0.1, u_0=1.5), IVP(t_0=0.1, u_0=1.0)],
        t_min=0.1, t_max=12.0,
        nets=[FCNN(actv=SinActv), FCNN(actv=SinActv)],
    )
    solver.fit(max_epochs=3000)

    solution = solver.get_solution()
    ts = np.linspace(0.1, 12, 500)
    prey, predator = solution(ts, to_numpy=True)

    from scipy.integrate import odeint
    ref = odeint(lambda y, t: [y[0] - y[0] * y[1], y[0] * y[1] - y[1]], [1.5, 1.0], ts)
    print(f"max |prey - odeint|     = {np.abs(prey - ref[:, 0]).max():.4f}")
    print(f"max |predator - odeint| = {np.abs(predator - ref[:, 1]).max():.4f}")


if __name__ == '__main__':
    main()
