"""Hypersolver end-to-end tests vs analytic solutions (parity with reference
tests/test_hypersolver.py: rtol=1e-2 on exp decay and sin/cos system)."""
import numpy as np

from neurodiffeq_tpu.hypersolver import Hypersolver, Euler, DiscreteSolution1D


def test_euler_solve_and_interp():
    # du/dt = -u, u(0) = 1
    ret = Euler().solve(lambda u, t: [-u], 1.0, 0.0, 1.0, 100)
    sol = DiscreteSolution1D(*ret)
    ts = np.linspace(0, 1, 23)
    us, = sol(ts)
    assert np.allclose(np.asarray(us), np.exp(-ts), rtol=1e-2)


def test_hypersolver_exp_decay():
    sol_fn = lambda ts: [np.exp(-np.asarray(ts))]  # noqa: E731
    hs = Hypersolver(
        func=lambda u, t: [-u], u0=1.0, t0=0.0, tn=2.0, n_steps=50,
        sol=sol_fn, numerical_solver=Euler(),
    )
    hs.fit(max_epochs=2000)
    assert hs.global_epoch == 2000
    solution = hs.get_solution()
    ts = np.linspace(0, 2, 37)
    us, = solution(ts)
    assert np.allclose(np.asarray(us), np.exp(-ts), rtol=1e-2)


def test_hypersolver_beats_plain_euler():
    sol_fn = lambda ts: [np.exp(-np.asarray(ts))]  # noqa: E731
    hs = Hypersolver(
        func=lambda u, t: [-u], u0=1.0, t0=0.0, tn=2.0, n_steps=20,
        sol=sol_fn, numerical_solver=Euler(),
    )
    hs.fit(max_epochs=500)
    ts = np.linspace(0, 2, 37)
    us_corrected, = hs.get_solution()(ts)
    us_plain, = DiscreteSolution1D(*Euler().solve(lambda u, t: [-u], 1.0, 0.0, 2.0, 20))(ts)
    err_corrected = np.abs(np.asarray(us_corrected) - np.exp(-ts)).max()
    err_plain = np.abs(np.asarray(us_plain) - np.exp(-ts)).max()
    assert err_corrected < err_plain / 2


def test_hypersolver_sin_cos_system():
    # u1' = u2, u2' = -u1; u1(0)=0, u2(0)=1 -> (sin, cos)
    sol_fn = lambda ts: [np.sin(np.asarray(ts)), np.cos(np.asarray(ts))]  # noqa: E731
    hs = Hypersolver(
        func=lambda u1, u2, t: [u2, -u1], u0=(0.0, 1.0), t0=0.0, tn=np.pi, n_steps=60,
        sol=sol_fn, numerical_solver=Euler(),
    )
    hs.fit(max_epochs=2000)
    solution = hs.get_solution()
    ts = np.linspace(0, np.pi, 29)
    u1, u2 = solution(ts)
    assert np.allclose(np.asarray(u1), np.sin(ts), atol=1e-2)
    assert np.allclose(np.asarray(u2), np.cos(ts), atol=1e-2)


def test_heun_is_second_order():
    """Global error of plain Heun halves its rate vs Euler: quartering h
    should cut the error ~16x (order 2); accept anything > 3x per halving."""
    from neurodiffeq_tpu.hypersolver import Heun
    errs = []
    for n in (10, 20, 40):
        ts_ret = Heun().solve(lambda u, t: [-u], 1.0, 0.0, 2.0, n)
        ts, us = np.asarray(ts_ret[0]), np.asarray(ts_ret[1])
        errs.append(np.abs(us - np.exp(-ts)).max())
    assert errs[0] / errs[1] > 3.0
    assert errs[1] / errs[2] > 3.0


def test_heun_beats_euler_at_equal_steps():
    from neurodiffeq_tpu.hypersolver import Heun
    ts = np.linspace(0, 2, 37)
    us_heun, = DiscreteSolution1D(*Heun().solve(lambda u, t: [-u], 1.0, 0.0, 2.0, 20))(ts)
    us_euler, = DiscreteSolution1D(*Euler().solve(lambda u, t: [-u], 1.0, 0.0, 2.0, 20))(ts)
    err_heun = np.abs(np.asarray(us_heun) - np.exp(-ts)).max()
    err_euler = np.abs(np.asarray(us_euler) - np.exp(-ts)).max()
    assert err_heun < err_euler / 5


def test_hypersolver_with_heun_corrector():
    """The h^3 corrector should beat plain Heun on a coarse grid. Compare at
    the GRID points: between them both arms are limited by
    DiscreteSolution1D's linear interpolation (~u'' h^2/8 ≈ 5e-3 at h=0.2),
    which would mask the integrator improvement entirely."""
    from neurodiffeq_tpu.hypersolver import Heun
    sol_fn = lambda ts: [np.exp(-np.asarray(ts))]  # noqa: E731
    hs = Hypersolver(
        func=lambda u, t: [-u], u0=1.0, t0=0.0, tn=2.0, n_steps=10,
        sol=sol_fn, numerical_solver=Heun(),
    )
    hs.fit(max_epochs=3000)
    ts = np.asarray(hs.ts)
    us_corrected, = hs.get_solution()(ts)
    us_plain, = DiscreteSolution1D(*Heun().solve(lambda u, t: [-u], 1.0, 0.0, 2.0, 10))(ts)
    err_corrected = np.abs(np.asarray(us_corrected) - np.exp(-ts)).max()
    err_plain = np.abs(np.asarray(us_plain) - np.exp(-ts)).max()
    assert err_corrected < err_plain / 5
    assert err_corrected < 1e-4


def test_hypersolver_heun_system():
    from neurodiffeq_tpu.hypersolver import Heun
    sol_fn = lambda ts: [np.sin(np.asarray(ts)), np.cos(np.asarray(ts))]  # noqa: E731
    hs = Hypersolver(
        func=lambda u1, u2, t: [u2, -u1], u0=(0.0, 1.0), t0=0.0, tn=np.pi, n_steps=30,
        sol=sol_fn, numerical_solver=Heun(),
    )
    hs.fit(max_epochs=2000)
    ts = np.linspace(0, np.pi, 29)
    u1, u2 = hs.get_solution()(ts)
    assert np.allclose(np.asarray(u1), np.sin(ts), atol=2e-3)
    assert np.allclose(np.asarray(u2), np.cos(ts), atol=2e-3)


def test_heun_hypersolver_accepts_bare_array_rhs():
    """Regression: a single-equation func returning a bare array (not a
    list) must produce the same residual targets as the list-returning
    form — _as_seq used to split the (N,)-batched vectorized array into N
    fake equations, silently corrupting the corrector's targets."""
    from neurodiffeq_tpu.hypersolver import Heun
    sol_fn = lambda ts: [np.exp(-np.asarray(ts))]  # noqa: E731
    hs_bare = Hypersolver(func=lambda u, t: -u, u0=1.0, t0=0.0, tn=2.0,
                          n_steps=10, sol=sol_fn, numerical_solver=Heun())
    hs_list = Hypersolver(func=lambda u, t: [-u], u0=1.0, t0=0.0, tn=2.0,
                          n_steps=10, sol=sol_fn, numerical_solver=Heun())
    assert np.allclose(np.asarray(hs_bare.residual), np.asarray(hs_list.residual))
    # magnitudes must be O(u'''/6), not O(grid index)
    assert np.abs(np.asarray(hs_bare.residual)).max() < 1.0


def test_rk4_is_fourth_order():
    """Plain RK4 global error falls ~16x per halving of h (order 4);
    accept anything > 10x per halving. f64 keeps the small-h errors above
    roundoff at these step counts."""
    from neurodiffeq_tpu.hypersolver import RK4
    errs = []
    for n in (5, 10, 20):
        ts_ret = RK4().solve(lambda u, t: [-u], 1.0, 0.0, 2.0, n)
        ts, us = np.asarray(ts_ret[0]), np.asarray(ts_ret[1])
        errs.append(np.abs(us - np.exp(-ts)).max())
    assert errs[0] / errs[1] > 10.0
    assert errs[1] / errs[2] > 10.0


def test_rk4_system_and_vs_heun():
    """RK4 on the sin/cos system at the grid points: orders of magnitude
    below Heun at equal steps."""
    from neurodiffeq_tpu.hypersolver import Heun, RK4
    func = lambda u, v, t: [v, -u]  # noqa: E731
    ts_r = RK4().solve(func, (0.0, 1.0), 0.0, 2 * np.pi, 40)
    ts_h = Heun().solve(func, (0.0, 1.0), 0.0, 2 * np.pi, 40)
    ts = np.asarray(ts_r[0])
    err_r = max(np.abs(np.asarray(ts_r[1]) - np.sin(ts)).max(),
                np.abs(np.asarray(ts_r[2]) - np.cos(ts)).max())
    err_h = max(np.abs(np.asarray(ts_h[1]) - np.sin(ts)).max(),
                np.abs(np.asarray(ts_h[2]) - np.cos(ts)).max())
    assert err_r < 1e-4
    assert err_r < err_h / 50


def test_hypersolver_with_rk4_corrector():
    """The h^5 corrector trains and does not degrade plain RK4 on a coarse
    grid (at h=0.2 plain RK4 is already ~1e-6; the corrector's win margin
    is within training noise, so assert non-degradation instead)."""
    from neurodiffeq_tpu.hypersolver import RK4
    sol_fn = lambda ts: [np.exp(-np.asarray(ts))]  # noqa: E731
    hs = Hypersolver(
        func=lambda u, t: [-u], u0=1.0, t0=0.0, tn=2.0, n_steps=10,
        sol=sol_fn, numerical_solver=RK4(),
    )
    hs.fit(max_epochs=2000)
    ts_grid = np.linspace(0.0, 2.0, 11)
    us_corr, = hs.get_solution()(ts_grid)
    err_corr = np.abs(np.asarray(us_corr) - np.exp(-ts_grid)).max()
    us_plain, = DiscreteSolution1D(
        *RK4().solve(lambda u, t: [-u], 1.0, 0.0, 2.0, 10))(ts_grid)
    err_plain = np.abs(np.asarray(us_plain) - np.exp(-ts_grid)).max()
    assert err_corr < max(2 * err_plain, 1e-5), (err_corr, err_plain)
