"""Monitor smoke tests under the Agg backend (parity with reference
tests/test_monitors.py)."""
import numpy as np
import pytest

from neurodiffeq_tpu.monitors import (
    Monitor1D, Monitor2D, MonitorSpherical, MonitorSphericalHarmonics,
    MetricsMonitor, StreamPlotMonitor2D,
)
from neurodiffeq_tpu.solvers import Solver1D, Solver2D, SolverSpherical
from neurodiffeq_tpu.conditions import IVP, NoCondition, DirichletBVPSphericalBasis
from neurodiffeq_tpu.function_basis import RealSphericalHarmonics
from neurodiffeq_tpu.networks import FCNN
from neurodiffeq_tpu.fields import diff


@pytest.fixture
def solver1d():
    s = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
    )
    s.fit(max_epochs=2, tqdm_file=None)
    return s


def test_monitor_1d(solver1d):
    m = Monitor1D(0, 2, check_every=1)
    m.check(solver1d.nets, solver1d.conditions, solver1d.metrics_history, params=solver1d.params)
    assert m.fig is not None


def test_monitor_1d_requires_params(solver1d):
    m = Monitor1D(0, 2)
    with pytest.raises(ValueError):
        m.check(solver1d.nets, solver1d.conditions, solver1d.metrics_history)


def test_monitor_callback_with_shared_net():
    """regression: MonitorCallback must expand dedup'd params so they zip 1:1
    with a shared-net solver's nets list."""
    import warnings
    net = FCNN(n_input_units=1, n_output_units=2, hidden_units=(8,))
    conds = [IVP(t_0=0.0, u_0=1.0), IVP(t_0=0.0, u_0=2.0)]
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', DeprecationWarning)
        for i, c in enumerate(conds):
            c.set_impose_on(i)
    s = Solver1D(
        ode_system=lambda u, v, t: [diff(u, t) + u, diff(v, t) + v],
        conditions=conds,
        nets=[net, net],
        t_min=0.0, t_max=2.0,
    )
    m = Monitor1D(0, 2, check_every=1)
    cb = m.to_callback()
    s.fit(max_epochs=2, tqdm_file=None, callbacks=[cb])
    assert m.fig is not None


def test_monitor_to_callback(solver1d):
    m = Monitor1D(0, 2, check_every=2)
    callback = m.to_callback()
    solver1d.fit(max_epochs=3, callbacks=[callback], tqdm_file=None)
    assert m.fig is not None


def test_monitor_2d():
    s = Solver2D(
        pde_system=lambda u, x, y: [diff(u, x, 2) + diff(u, y, 2)],
        conditions=[NoCondition()],
        xy_min=(0, 0), xy_max=(1, 1),
    )
    s.fit(max_epochs=2, tqdm_file=None)
    for style in ('heatmap', 'curves'):
        m = Monitor2D((0, 0), (1, 1), check_every=1, solution_style=style)
        m.check(s.nets, s.conditions, s.metrics_history, params=s.params)
        assert m.fig is not None
    with pytest.raises(ValueError):
        Monitor2D((0, 0), (1, 1), solution_style='bogus')


def test_metrics_monitor(solver1d):
    m = MetricsMonitor(check_every=1)
    m.check(solver1d.nets, solver1d.conditions, solver1d.metrics_history, params=solver1d.params)


def test_monitor_spherical():
    s = SolverSpherical(
        pde_system=lambda u, r, theta, phi: [diff(u, r) + u],
        conditions=[NoCondition()],
        r_min=0.5, r_max=2.0,
    )
    s.fit(max_epochs=2, tqdm_file=None)
    m = MonitorSpherical(0.5, 2.0, check_every=1, shape=(4, 4, 4))
    m.check(s.nets, s.conditions, s.metrics_history, params=s.params)
    assert m.fig is not None
    # log-scale variant
    m2 = MonitorSpherical(0.5, 2.0, check_every=1, shape=(4, 4, 4), r_scale='log')
    m2.check(s.nets, s.conditions, s.metrics_history, params=s.params)


def test_monitor_spherical_harmonics():
    K = 9
    s = SolverSpherical(
        pde_system=lambda u, r, theta, phi: [diff(u, r, shape_check=False)],
        conditions=[DirichletBVPSphericalBasis(r_0=0.5, R_0=np.zeros(K))],
        r_min=0.5, r_max=2.0,
        nets=[FCNN(1, K, hidden_units=(8,))],
        n_output_units=K,
    )
    s.fit(max_epochs=1, tqdm_file=None)
    m = MonitorSphericalHarmonics(
        0.5, 2.0, check_every=1, shape=(4, 4, 4),
        harmonics_fn=RealSphericalHarmonics(max_degree=2))
    m.check(s.nets, s.conditions, s.metrics_history, params=s.params)
    assert m.max_degree == 2
    with pytest.raises(ValueError):
        MonitorSphericalHarmonics(0.5, 2.0, shape=(4, 4, 4))


def test_streamplot_monitor():
    s = Solver2D(
        pde_system=lambda u, v, x, y: [diff(u, x) + diff(v, y), diff(u, y) - diff(v, x)],
        conditions=[NoCondition(), NoCondition()],
        xy_min=(0, 0), xy_max=(1, 1),
    )
    s.fit(max_epochs=1, tqdm_file=None)
    m = StreamPlotMonitor2D(
        xy_min=(0, 0), xy_max=(1, 1), pairs=[(0, 1), 0], nx=8, ny=8,
        field_names=['velocity', 'potential'])
    m.check(s.nets, s.conditions, s.metrics_history, params=s.params)
    assert m.fig is not None
    with pytest.raises(ValueError):
        StreamPlotMonitor2D(xy_min=(0, 0), xy_max=(1, 1), pairs=[(0, 1)], field_names=['a', 'b'])


def test_monitor_2d_masks_irregular_domain():
    """Monitor2D must mask triangulation cells outside the condition's
    in_domain region (reference monitors.py:679-681)."""
    from neurodiffeq_tpu.conditions import IrregularBoundaryCondition

    class HalfPlane(IrregularBoundaryCondition):
        def parameterize(self, out, x, y):
            return out

        def in_domain(self, x, y):
            return np.asarray(x).flatten() < 0.5

    solver = Solver2D(
        pde_system=lambda u, x, y: [diff(u, x) + diff(u, y)],
        conditions=[HalfPlane()],
        xy_min=(0, 0), xy_max=(1, 1),
    )
    solver.fit(max_epochs=2, tqdm_file=None)
    m = Monitor2D((0, 0), (1, 1), check_every=1)
    m.check(solver.nets, solver.conditions, solver.metrics_history, params=solver.params)
    # the tricontour triangulation must carry a mask (some cells excluded)
    ax_objs = m.fig.axes
    assert len(ax_objs) >= 1


def test_adaptive_generator_repr_and_dill():
    from neurodiffeq_tpu.generators import Generator1D, ResidualAdaptiveGenerator
    import dill
    g = ResidualAdaptiveGenerator(Generator1D(16, 0.0, 1.0), oversample=3,
                                  strategy='topk')
    r = repr(g)
    assert 'ResidualAdaptiveGenerator' in r and 'topk' in r and 'oversample=3' in r
    g2 = dill.loads(dill.dumps(g))
    assert g2.oversample == 3 and g2.strategy == 'topk' and g2.size == 16
    import jax
    out = g2.sample_scored(jax.random.PRNGKey(0), lambda cand: cand[0])
    assert np.asarray(out).shape == (16,)


def test_enforce_jit_cache_bounded(monkeypatch):
    """The per-(net, cond, shape) jit cache must be LRU-bounded: each entry
    strong-refs a compiled executable, so an unbounded dict leaks across
    long hyperparameter sweeps."""
    import jax
    from neurodiffeq_tpu import monitors as mon

    monkeypatch.setattr(mon, '_ENFORCE_JIT_CACHE_MAX', 2)
    mon._ENFORCE_JIT_CACHE.clear()
    net = FCNN(n_input_units=1, n_output_units=1, hidden_units=(4,))
    params = net.init(jax.random.PRNGKey(0))
    cond = NoCondition()
    for n in (3, 4, 5):
        out = mon._enforce_np(net, params, cond, np.linspace(0, 1, n))
        assert out.shape[0] == n
    assert len(mon._ENFORCE_JIT_CACHE) == 2
    # re-hitting a cached shape must not grow the cache
    mon._enforce_np(net, params, cond, np.linspace(0, 1, 5))
    assert len(mon._ENFORCE_JIT_CACHE) == 2


def test_plot_history_drops_stale_series_and_survives_clear():
    """The cached Line2D artists must not outlive their data: a series absent
    from the current history (monitor reused across solvers with different
    metric sets) is removed, and an external ax.clear() (which detaches the
    cached artists) triggers a full rebuild instead of rendering nothing."""
    import matplotlib.pyplot as plt
    from neurodiffeq_tpu.monitors import BaseMonitor

    fig, ax = plt.subplots()
    try:
        hist_a = {'train_loss': [1.0, 0.5], 'valid_loss': [1.1, 0.6]}
        BaseMonitor._plot_history(ax, hist_a, losses=True)
        assert set(ax._ndq_history_lines) == {'train_loss', 'valid_loss'}

        # same ax reused with a history missing valid_loss: stale line removed
        BaseMonitor._plot_history(ax, {'train_loss': [2.0, 1.0]}, losses=True)
        assert set(ax._ndq_history_lines) == {'train_loss'}
        assert all(line.axes is ax for line in ax._ndq_history_lines.values())

        # external clear detaches the artists; next call must rebuild
        ax.clear()
        BaseMonitor._plot_history(ax, hist_a, losses=True)
        lines = ax._ndq_history_lines
        assert set(lines) == {'train_loss', 'valid_loss'}
        assert all(line.axes is ax for line in lines.values())
        np.testing.assert_allclose(lines['train_loss'].get_ydata(), [1.0, 0.5])
    finally:
        plt.close(fig)


def test_enforce_jit_cache_thread_safe():
    """Background monitor draws hit the module-global jit cache from a worker
    thread; concurrent get/insert/evict on the OrderedDict must not corrupt
    it (the cache serializes its bookkeeping behind a lock)."""
    import threading
    from neurodiffeq_tpu import monitors as monitors_mod
    from neurodiffeq_tpu.conditions import NoCondition
    from neurodiffeq_tpu.networks import FCNN

    n_threads, iters = 4, 30
    errors = []

    def worker(seed):
        try:
            import jax
            net = FCNN(n_input_units=1, hidden_units=(4,))
            params = net.init(jax.random.PRNGKey(seed))
            cond = NoCondition()
            for i in range(iters):
                x = np.linspace(0, 1, 8 + (seed + i) % 3)
                monitors_mod._enforce_np(net, params, cond, x)
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(monitors_mod._ENFORCE_JIT_CACHE) <= monitors_mod._ENFORCE_JIT_CACHE_MAX
