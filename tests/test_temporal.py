"""Temporal (penalty-BC) subsystem tests: generators, approximators, training
routines, heat-equation convergence (parity with reference tests/test_temporal.py)."""
import numpy as np
import optax

from neurodiffeq_tpu import temporal
from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.networks import FCNN


def test_generator_1dspatial():
    g = temporal.generator_1dspatial(size=16, x_min=0, x_max=2, random=False)
    x = np.asarray(next(g))
    assert x.shape == (16,)
    assert (x >= 0).all() and (x <= 2).all()
    assert np.array_equal(np.asarray(next(g)), x)  # non-random: fixed
    g = temporal.generator_1dspatial(size=16, x_min=0, x_max=2, random=True)
    a, b = np.asarray(next(g)), np.asarray(next(g))
    assert not np.array_equal(a, b)


def test_generator_temporal():
    g = temporal.generator_temporal(size=8, t_min=0, t_max=1, random=False)
    assert np.asarray(next(g)).shape == (8,)


def test_generator_2dspatial_segment():
    g = temporal.generator_2dspatial_segment(size=10, start=(0, 0), end=(1, 2), random=False)
    x, y = next(g)
    assert np.allclose(np.asarray(y), 2 * np.asarray(x))


def test_generator_2dspatial_rectangle():
    g = temporal.generator_2dspatial_rectangle((4, 5), 0, 1, 2, 3, random=False)
    x, y = next(g)
    assert np.asarray(x).shape == (20,)
    assert (np.asarray(y) >= 2).all() and (np.asarray(y) <= 3).all()


def _heat_setup():
    k, L, T = 0.3, 2.0, 3.0
    pde = lambda u, x, t: diff(u, t) - k * diff(u, x, 2)  # noqa: E731
    ic = temporal.FirstOrderInitialCondition(u0=lambda x: F.sin(np.pi / L * x))
    bc1 = temporal.BoundaryCondition(
        form=lambda u, x, t: u,
        points_generator=temporal.generator_1dspatial(size=4, x_min=0, x_max=0, random=False))
    bc2 = temporal.BoundaryCondition(
        form=lambda u, x, t: u,
        points_generator=temporal.generator_1dspatial(size=4, x_min=L, x_max=L, random=False))
    net = FCNN(n_input_units=2, hidden_units=(32, 32))
    approximator = temporal.SingleNetworkApproximator1DSpatialTemporal(
        single_network=net, pde=pde, initial_condition=ic, boundary_conditions=[bc1, bc2])
    return approximator, k, L, T


def test_1dspatial_temporal_heat_equation_converges():
    approximator, k, L, T = _heat_setup()
    approx, history = temporal._solve_1dspatial_temporal(
        temporal.generator_1dspatial(32, 0, L),
        temporal.generator_temporal(32, 0, T),
        temporal.generator_1dspatial(32, 0, L, random=False),
        temporal.generator_temporal(32, 0, T, random=False),
        approximator, optax.adam(3e-3), batch_size=512, max_epochs=300,
        shuffle=True, metrics={}, monitor=None,
    )
    assert len(history['train_loss']) == 300
    assert history['train_loss'][-1] < history['train_loss'][0]

    # analytic solution of u_t = k u_xx with u(x,0)=sin(pi x/L), u(0)=u(L)=0
    xs = np.linspace(0, L, 21)
    ts = np.ones(21) * 1.0
    uu = np.asarray(approx(xs, ts))
    analytic = np.sin(np.pi * xs / L) * np.exp(-k * (np.pi / L) ** 2 * 1.0)
    assert np.abs(uu - analytic).max() < 0.12


def test_initial_condition_enforced_exactly():
    approximator, k, L, T = _heat_setup()
    xs = np.linspace(0, L, 15)
    uu0 = np.asarray(approximator(xs, np.zeros(15)))
    assert np.allclose(uu0, np.sin(np.pi * xs / L), atol=1e-9)


def test_2dspatial_approximator_and_training():
    # Laplace on unit square with penalty boundary u=0 on all sides
    pde = lambda u, x, y: diff(u, x, 2) + diff(u, y, 2)  # noqa: E731
    bcs = [
        temporal.BoundaryCondition(
            form=lambda u, x, y: u,
            points_generator=temporal.generator_2dspatial_segment(8, s, e, random=False))
        for s, e in [((0, 0), (1, 0)), ((1, 0), (1, 1)), ((1, 1), (0, 1)), ((0, 1), (0, 0))]
    ]
    net = FCNN(n_input_units=2, hidden_units=(16, 16))
    approximator = temporal.SingleNetworkApproximator2DSpatial(
        single_network=net, pde=pde, boundary_conditions=bcs)
    approx, history = temporal._solve_2dspatial(
        temporal.generator_2dspatial_rectangle((8, 8), 0, 1, 0, 1),
        temporal.generator_2dspatial_rectangle((8, 8), 0, 1, 0, 1, random=False),
        approximator, optax.adam(1e-3), batch_size=64, max_epochs=10,
        shuffle=True, metrics={}, monitor=None,
    )
    assert len(history['valid_loss']) == 10
    out = approx(np.random.rand(5), np.random.rand(5))
    assert np.asarray(out).shape == (5,)


def test_2dspatial_system_approximator():
    pde = lambda u, v, x, y: [diff(u, x) - v, diff(v, y) + u]  # noqa: E731
    net = FCNN(n_input_units=2, n_output_units=2, hidden_units=(8, 8))
    approximator = temporal.SingleNetworkApproximator2DSpatialSystem(
        single_network=net, pde=pde, boundary_conditions=[])
    approx, history = temporal._solve_2dspatial(
        temporal.generator_2dspatial_rectangle((6, 6), 0, 1, 0, 1),
        temporal.generator_2dspatial_rectangle((6, 6), 0, 1, 0, 1, random=False),
        approximator, optax.adam(1e-3), batch_size=36, max_epochs=5,
        shuffle=False, metrics={}, monitor=None,
    )
    u, v = approx(np.random.rand(4), np.random.rand(4))
    assert np.asarray(u).shape == (4,)
    assert np.asarray(v).shape == (4,)


def test_2dspatial_temporal_approximator():
    pde = lambda u, x, y, t: diff(u, t) - diff(u, x, 2) - diff(u, y, 2)  # noqa: E731
    ic = temporal.FirstOrderInitialCondition(u0=lambda x, y: F.sin(np.pi * x) * F.sin(np.pi * y))
    net = FCNN(n_input_units=3, hidden_units=(8, 8))
    approximator = temporal.SingleNetworkApproximator2DSpatialTemporal(
        single_network=net, pde=pde, initial_condition=ic, boundary_conditions=[])
    approx, history = temporal._solve_2dspatial_temporal(
        temporal.generator_2dspatial_rectangle((5, 5), 0, 1, 0, 1),
        temporal.generator_temporal(5, 0, 1),
        temporal.generator_2dspatial_rectangle((5, 5), 0, 1, 0, 1, random=False),
        temporal.generator_temporal(5, 0, 1, random=False),
        approximator, optax.adam(1e-3), batch_size=125, max_epochs=5,
        shuffle=True, metrics={}, monitor=None,
    )
    assert len(history['train_loss']) == 5
    # IC enforced exactly at t=0
    xs = np.random.rand(9)
    ys = np.random.rand(9)
    uu0 = np.asarray(approx(xs, ys, np.zeros(9)))
    assert np.allclose(uu0, np.sin(np.pi * xs) * np.sin(np.pi * ys), atol=1e-9)


def test_second_order_initial_condition():
    ic = temporal.SecondOrderInitialCondition(
        u0=lambda x, y: F.sin(np.pi * x) * F.sin(np.pi * y),
        u0dot=lambda x, y: 0 * x,
    )
    pde = lambda u, x, y, t: diff(u, t, 2) - diff(u, x, 2) - diff(u, y, 2)  # noqa: E731
    net = FCNN(n_input_units=3, hidden_units=(8, 8))
    approximator = temporal.SingleNetworkApproximator2DSpatialTemporal(
        single_network=net, pde=pde, initial_condition=ic, boundary_conditions=[])
    xs, ys = np.random.rand(7), np.random.rand(7)
    uu0 = np.asarray(approximator(xs, ys, np.zeros(7)))
    assert np.allclose(uu0, np.sin(np.pi * xs) * np.sin(np.pi * ys), atol=1e-9)


def test_monitors_smoke():
    approximator, k, L, T = _heat_setup()
    history = {'train_loss': [1.0, 0.5], 'valid_loss': [1.1, 0.6]}
    m = temporal.MonitorMinimal(check_every=1)
    m.check(approximator, history)
    m = temporal.Monitor1DSpatialTemporal(
        check_on_x=np.linspace(0, L, 8), check_on_t=np.linspace(0, T, 3), check_every=1)
    m.check(approximator, history)

    pde2 = lambda u, x, y: diff(u, x, 2) + diff(u, y, 2)  # noqa: E731
    net2 = FCNN(n_input_units=2, hidden_units=(8,))
    approx2 = temporal.SingleNetworkApproximator2DSpatial(
        single_network=net2, pde=pde2, boundary_conditions=[])
    m = temporal.Monitor2DSpatial(np.linspace(0, 1, 5), np.linspace(0, 1, 5), check_every=1)
    m.check(approx2, history)

    ic = temporal.FirstOrderInitialCondition(u0=lambda x, y: 0 * x)
    net3 = FCNN(n_input_units=3, hidden_units=(8,))
    approx3 = temporal.SingleNetworkApproximator2DSpatialTemporal(
        single_network=net3, pde=lambda u, x, y, t: diff(u, t), initial_condition=ic,
        boundary_conditions=[])
    m = temporal.Monitor2DSpatialTemporal(
        np.linspace(0, 1, 4), np.linspace(0, 1, 4), np.linspace(0, 1, 2), check_every=1)
    m.check(approx3, history)


def test_history_metric_bookkeeping():
    """metrics flow into history as train_<name>/valid_<name> per epoch
    (reference temporal.py train/valid routines)."""
    approximator, k, L, T = _heat_setup()
    metric = lambda uu, xx, tt: float(np.abs(np.asarray(uu)).mean())  # noqa: E731
    _, history = temporal._solve_1dspatial_temporal(
        temporal.generator_1dspatial(8, 0, L),
        temporal.generator_temporal(8, 0, T),
        temporal.generator_1dspatial(8, 0, L, random=False),
        temporal.generator_temporal(8, 0, T, random=False),
        approximator, optax.adam(1e-3), batch_size=64, max_epochs=4,
        shuffle=True, metrics={'mean_abs': metric}, monitor=None,
    )
    for key in ('train_loss', 'valid_loss', 'train_mean_abs', 'valid_mean_abs'):
        assert key in history
        assert len(history[key]) == 4
        assert all(np.isfinite(v) for v in history[key])


def test_2dspatial_converges_to_harmonic_boundary():
    """Laplace with u = xy on the boundary: the exact solution is u = xy
    (harmonic), so penalty training should approach it quickly."""
    pde = lambda u, x, y: diff(u, x, 2) + diff(u, y, 2)  # noqa: E731
    bcs = [
        temporal.BoundaryCondition(
            form=lambda u, x, y: u - x * y,
            points_generator=temporal.generator_2dspatial_segment(16, s, e, random=False))
        for s, e in [((0, 0), (1, 0)), ((1, 0), (1, 1)), ((1, 1), (0, 1)), ((0, 1), (0, 0))]
    ]
    net = FCNN(n_input_units=2, hidden_units=(16, 16))
    approximator = temporal.SingleNetworkApproximator2DSpatial(
        single_network=net, pde=pde, boundary_conditions=bcs, boundary_strictness=10.0)
    approx, history = temporal._solve_2dspatial(
        temporal.generator_2dspatial_rectangle((12, 12), 0, 1, 0, 1),
        temporal.generator_2dspatial_rectangle((12, 12), 0, 1, 0, 1, random=False),
        approximator, optax.adam(5e-3), batch_size=144, max_epochs=400,
        shuffle=True, metrics={}, monitor=None,
    )
    xs, ys = np.random.rand(30), np.random.rand(30)
    uu = np.asarray(approx(xs, ys))
    assert np.abs(uu - xs * ys).max() < 0.1


def test_boundary_condition_form_and_generator():
    """BoundaryCondition stores form/points_generator; the penalty decreases
    the boundary mismatch during training (reference test_boundary_condition)."""
    bc = temporal.BoundaryCondition(
        form=lambda u, x, t: u - 3.0,
        points_generator=temporal.generator_1dspatial(4, 0, 0, random=False))
    xs = np.asarray(next(bc.points_generator))
    assert xs.shape == (4,)
    assert np.allclose(xs, 0.0)


def test_calculate_metrics_2dspatial():
    pde = lambda u, x, y: diff(u, x, 2) + diff(u, y, 2)  # noqa: E731
    net = FCNN(n_input_units=2, hidden_units=(8,))
    approximator = temporal.SingleNetworkApproximator2DSpatial(
        single_network=net, pde=pde, boundary_conditions=[])
    out = approximator.calculate_metrics(
        np.random.rand(6), np.random.rand(6),
        {'m': lambda uu, xx, yy: float(np.asarray(uu).max())})
    assert set(out) == {'m'}
    assert np.isfinite(out['m'])
