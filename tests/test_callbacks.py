"""Callback logic tests (parity with reference tests/test_callbacks.py)."""
import os
import random

import numpy as np
import pytest
import optax

from neurodiffeq_tpu import callbacks as cb
from neurodiffeq_tpu.solvers import Solver1D
from neurodiffeq_tpu.conditions import IVP
from neurodiffeq_tpu.fields import diff


@pytest.fixture
def solver():
    s = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
    )
    s.metrics_history['train_loss'] = [1.0, 0.8]
    s.metrics_history['valid_loss'] = [1.1, 0.9]
    s.local_epoch = 5
    s._max_local_epoch = 10
    return s


class _Flag(cb.ActionCallback):
    def __init__(self):
        super().__init__()
        self.called = 0

    def __call__(self, solver):
        self.called += 1


def test_true_false_callbacks(solver):
    assert cb.TrueCallback().condition(solver)
    assert not cb.FalseCallback().condition(solver)


def test_boolean_algebra(solver):
    t, f = cb.TrueCallback(), cb.FalseCallback()
    assert (t & t).condition(solver)
    assert not (t & f).condition(solver)
    assert (t | f).condition(solver)
    assert not (f | f).condition(solver)
    assert (~f).condition(solver)
    assert not (~t).condition(solver)
    assert (t ^ f).condition(solver)
    assert not (t ^ t).condition(solver)


def test_condition_runs_action(solver):
    flag = _Flag()
    c = cb.TrueCallback().set_action_callback(flag)
    c(solver)
    assert flag.called == 1
    c2 = cb.FalseCallback().set_action_callback(flag)
    c2(solver)
    assert flag.called == 1


def test_conditioned_on(solver):
    flag = _Flag()
    c = flag.conditioned_on(cb.TrueCallback())
    c(solver)
    assert flag.called == 1
    with pytest.raises(TypeError):
        flag.conditioned_on(flag)
    with pytest.raises(TypeError):
        cb.TrueCallback().set_action_callback(cb.TrueCallback())


def test_epoch_conditions(solver):
    solver.local_epoch = 1
    assert cb.OnFirstLocal().condition(solver)
    solver.local_epoch = 2
    assert not cb.OnFirstLocal().condition(solver)
    solver.local_epoch = 10
    assert cb.OnLastLocal().condition(solver)

    solver.metrics_history['train_loss'] = [0.5]
    assert cb.OnFirstGlobal().condition(solver)
    solver.metrics_history['train_loss'] = [0.5, 0.4]
    assert not cb.OnFirstGlobal().condition(solver)


def test_period_conditions(solver):
    hits = [e for e in range(1, 21) if _period_hits(solver, e)]
    assert hits == [3, 6, 9, 12, 15, 18]


def _period_hits(solver, epoch):
    solver.local_epoch = epoch
    return cb.PeriodLocal(period=3).condition(solver)


def test_closed_interval_conditions(solver):
    solver.local_epoch = 5
    assert cb.ClosedIntervalLocal(min=3, max=7).condition(solver)
    assert not cb.ClosedIntervalLocal(min=6).condition(solver)
    assert cb.ClosedIntervalLocal(max=5).condition(solver)
    solver.metrics_history['train_loss'] = [0.1] * 4
    assert cb.ClosedIntervalGlobal(min=4, max=4).condition(solver)


def test_random_condition(solver):
    random.seed(0)
    always = cb.Random(1.0)
    never = cb.Random(0.0)
    assert all(always.condition(solver) for _ in range(10))
    assert not any(never.condition(solver) for _ in range(10))
    with pytest.raises(ValueError):
        cb.Random(1.5)


def test_repeated_metric_down(solver):
    c = cb.RepeatedMetricDown(at_least_by=0.05, use_train=True, metric='loss', repetition=2)
    solver.metrics_history['train_loss'] = [1.0]
    assert not c.condition(solver)
    solver.metrics_history['train_loss'] = [1.0, 0.9]
    assert not c.condition(solver)
    solver.metrics_history['train_loss'] = [1.0, 0.9, 0.8]
    assert c.condition(solver)


def test_repeated_metric_up_converge_diverge(solver):
    up = cb.RepeatedMetricUp(at_least_by=0.05, repetition=1)
    solver.metrics_history['train_loss'] = [1.0, 1.1]
    assert up.condition(solver)

    conv = cb.RepeatedMetricConverge(epsilon=0.01, repetition=1)
    solver.metrics_history['train_loss'] = [1.0, 1.005]
    assert conv.condition(solver)

    div = cb.RepeatedMetricDiverge(gap=0.5, repetition=1)
    solver.metrics_history['train_loss'] = [1.0, 2.0]
    assert div.condition(solver)


def test_repeated_metric_below_above(solver):
    below = cb.RepeatedMetricBelow(threshold=0.5, repetition=1)
    solver.metrics_history['train_loss'] = [1.0, 0.4]
    assert below.condition(solver)
    above = cb.RepeatedMetricAbove(threshold=0.5, repetition=1)
    solver.metrics_history['train_loss'] = [1.0, 0.7]
    assert above.condition(solver)


def test_stop_callback(solver):
    cb.StopCallback()(solver)
    assert solver._stop_training


def test_eve_callback_doubles_batches(solver):
    eve = cb.EveCallback(base_value=1.0, double_at=0.1, n_0=1, n_max=16)
    solver.metrics_history['train_loss'] = [0.01]  # two decades below base
    eve(solver)
    assert solver.n_batches['train'] == 4
    solver.metrics_history['train_loss'] = [1e-9]
    eve(solver)
    assert solver.n_batches['train'] == 16  # capped at n_max


def test_checkpoint_callback(tmp_path, solver):
    ckpt = cb.CheckpointCallback(str(tmp_path))
    ckpt(solver)
    files = [f for f in os.listdir(tmp_path) if f.endswith('.internals')]
    assert len(files) == 1
    import dill
    with open(os.path.join(tmp_path, files[0]), 'rb') as f:
        internals = dill.load(f)
    assert 'params' in internals and internals['params'] is not None
    leaf = internals['params'][0]['layers'][0]['W']
    assert isinstance(leaf, np.ndarray)


def test_checkpoint_callback_orbax(tmp_path):
    pytest.importorskip('orbax.checkpoint')
    s = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
    )
    s.fit(max_epochs=3, tqdm_file=None)
    ckpt = cb.CheckpointCallback(str(tmp_path), format='orbax')
    ckpt(s)

    # restore into a fresh solver and check exact state recovery
    s2 = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
    )
    cb.CheckpointCallback.restore_orbax(s2, str(tmp_path), step=3)
    assert s2.global_epoch == 3
    import jax
    for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(s2.params)):
        assert np.allclose(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError):
        cb.CheckpointCallback(str(tmp_path), format='bogus')


def test_simple_tensorboard_callback(solver):
    # any object with add_scalar works; tensorboard itself is only needed
    # for the default writer (reference callbacks.py:233-262 semantics)
    class _Writer:
        def __init__(self):
            self.records = []

        def add_scalar(self, tag, scalar_value, global_step):
            self.records.append((tag, float(scalar_value), global_step))

    w = _Writer()
    cb.SimpleTensorboardCallback(writer=w)(solver)
    tags = {r[0] for r in w.records}
    assert 'train_loss' in tags and 'valid_loss' in tags
    assert all(r[2] == solver.global_epoch for r in w.records)


def test_set_loss_fn_callback(solver):
    c = cb.SetLossFn('l1')
    c(solver)
    from neurodiffeq_tpu.losses import _losses
    assert solver.loss_fn is _losses['l1']
    # without reset, a second call doesn't re-set
    solver.loss_fn = 'sentinel'
    c(solver)
    assert solver.loss_fn == 'sentinel'


def test_set_optimizer_callback(solver):
    c = cb.SetOptimizer(optax.sgd(1e-2))
    c(solver)
    solver.fit(max_epochs=2, tqdm_file=None)
    assert solver.global_epoch >= 2

    c2 = cb.SetOptimizer(optax.sgd, optimizer_args=(1e-3,))
    c2(solver)
    solver.fit(max_epochs=1, tqdm_file=None)


def test_report_callback_smoke(solver):
    cb.ReportCallback()(solver)


def test_deprecated_aliases():
    with pytest.warns(FutureWarning):
        cb.ReportOnFitCallback()
    with pytest.warns(FutureWarning):
        cb.SetCriterion('l2')


def test_integration_stop_on_converge():
    stop_cb = cb.StopCallback().conditioned_on(
        cb.RepeatedMetricConverge(epsilon=1e2, repetition=1))  # huge epsilon: trigger immediately
    s = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
    )
    s.fit(max_epochs=100, callbacks=[stop_cb], tqdm_file=None)
    assert s.global_epoch < 100


def test_set_loss_fn_reset_semantics(solver):
    """reset=False fires once; reset=True re-applies every epoch
    (reference tests/test_callbacks.py:365-387)."""
    calls = []
    orig = solver._set_loss_fn

    def spy(loss_fn):
        calls.append(loss_fn)
        return orig(loss_fn)

    solver._set_loss_fn = spy
    once = cb.SetLossFn('l1', reset=False)
    once(solver)
    once(solver)
    assert len(calls) == 1
    always = cb.SetLossFn('l2', reset=True)
    always(solver)
    always(solver)
    assert len(calls) == 3


def test_set_loss_fn_legacy_criterion_kwarg(solver):
    with pytest.warns(FutureWarning):
        c = cb.SetLossFn(criterion='l1')
    c(solver)
    assert len(solver.metrics_history['train_loss']) == 2  # untouched history


def test_set_optimizer_instance_and_factory(solver):
    old_params = solver.params
    inst = cb.SetOptimizer(optax.sgd(1e-2))
    inst(solver)
    assert solver.optimizer is not None
    st1 = solver.opt_state

    fact = cb.SetOptimizer(optax.adamw, optimizer_args=(1e-3,))
    fact(solver)
    assert solver.opt_state is not st1
    # params survive an optimizer swap
    assert solver.params is old_params or all(
        np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            __import__('jax').tree.leaves(old_params),
            __import__('jax').tree.leaves(solver.params)))


def test_monitor_callback_counts_checks(solver):
    class StubMonitor:
        def __init__(self):
            self.n = 0
            self.fig = None

        def check(self, nets, conditions, history, **kwargs):
            self.n += 1

    m = StubMonitor()
    mc = cb.MonitorCallback(m)
    mc(solver)
    mc(solver)
    assert m.n == 2


def test_monitor_callback_deprecated_kwargs():
    class StubMonitor:
        fig = None

        def check(self, *a, **k):
            pass

    with pytest.warns(FutureWarning):
        cb.MonitorCallback(StubMonitor(), check_against_local=True)


def test_on_first_global_and_last_local(solver):
    # global_epoch is a read-only property = len(train_loss history)
    solver.metrics_history['train_loss'] = [1.0]
    assert cb.OnFirstGlobal().condition(solver)
    solver.metrics_history['train_loss'] = [1.0, 0.9]
    assert not cb.OnFirstGlobal().condition(solver)

    solver.local_epoch = solver._max_local_epoch
    assert cb.OnLastLocal().condition(solver)
    solver.local_epoch = solver._max_local_epoch - 1
    assert not cb.OnLastLocal().condition(solver)


def test_progress_bar_callback(solver):
    pb = cb.ProgressBarCallBack()
    pb(solver)  # no tqdm bar attached: must be a no-op, not a crash


def test_monitor_callback_background_mode():
    """background=True: slow draws run on a worker thread, at most one in
    flight (busy fires skipped), and the final local epoch always draws
    synchronously so the last state is rendered."""
    import threading
    import time as _time
    from neurodiffeq_tpu.callbacks import MonitorCallback

    calls = []
    release = threading.Event()

    class SlowMonitor:
        fig = None
        using_non_gui_backend = True

        def check(self, nets, conditions, history, params=None, solver=None):
            calls.append(len(history['train_loss']))
            release.wait(timeout=5)

    class FakeSolver:
        nets = conditions = ()
        params = []
        local_epoch = 1
        global_epoch = 1
        _max_local_epoch = 10
        metrics_history = {'train_loss': [1.0]}

        def _expand_params(self, p):
            return []

    cb = MonitorCallback(SlowMonitor(), background=True)
    s = FakeSolver()
    cb(s)                      # starts worker (blocked on `release`)
    s.metrics_history = {'train_loss': [1.0, 2.0]}
    cb(s)                      # worker busy -> skipped
    assert calls == [1]
    release.set()
    cb.flush()
    s.local_epoch = 10         # last epoch: joins + draws synchronously
    s.metrics_history = {'train_loss': [1.0, 2.0, 3.0]}
    cb(s)
    assert calls == [1, 3]
    assert cb._worker is None or not cb._worker.is_alive()


def test_monitor_callback_background_gui_backend_falls_back():
    """GUI matplotlib backends must be driven from the main thread: with
    background=True and a GUI-backend monitor, the draw falls back to
    synchronous (with a warning) instead of spawning a worker."""
    from neurodiffeq_tpu.callbacks import MonitorCallback

    seen = []

    class GuiMonitor:
        fig = None
        using_non_gui_backend = False

        def check(self, nets, conditions, history, params=None, solver=None):
            seen.append(solver)

    class FakeSolver:
        nets = conditions = ()
        params = []
        local_epoch = 1
        global_epoch = 1
        _max_local_epoch = 10
        metrics_history = {'train_loss': [1.0]}

        def _expand_params(self, p):
            return []

    mc = MonitorCallback(GuiMonitor(), background=True)
    s = FakeSolver()
    with pytest.warns(UserWarning, match='non-GUI'):
        mc(s)
    assert mc._worker is None  # drew synchronously on this thread
    assert seen == [s]         # sync mode passes the live solver


def test_monitor_callback_background_freezes_solver_state():
    """Background draws must never see live training state: the monitor gets
    a frozen copy whose metrics_history is the fire-time snapshot."""
    import threading
    from neurodiffeq_tpu.callbacks import MonitorCallback

    seen = {}
    started = threading.Event()

    class SnapMonitor:
        fig = None
        using_non_gui_backend = True

        def check(self, nets, conditions, history, params=None, solver=None):
            seen['solver'] = solver
            seen['history'] = solver.metrics_history
            started.set()

    class FakeSolver:
        nets = conditions = ()
        params = []
        local_epoch = 1
        global_epoch = 1
        _max_local_epoch = 10

        def _expand_params(self, p):
            return []

    s = FakeSolver()
    s.metrics_history = {'train_loss': [1.0]}
    mc = MonitorCallback(SnapMonitor(), background=True)
    mc(s)
    assert started.wait(timeout=5)
    mc.flush()
    assert seen['solver'] is not s
    assert seen['history'] == {'train_loss': [1.0]}
    # mutations on the live solver after the fire are invisible to the draw
    s.metrics_history['train_loss'].append(2.0)
    assert seen['history'] == {'train_loss': [1.0]}


def test_fit_flushes_background_worker_on_return():
    """fit() must join any in-flight background monitor draw before
    returning: a worker still rendering after fit() races user-side
    matplotlib operations on the same figure. The fire cadence here ends
    BEFORE the last epoch (period 2, max_epochs 5), so only the end-of-fit
    flush can join the worker."""
    import threading
    import time as _time

    from neurodiffeq_tpu.callbacks import MonitorCallback, PeriodLocal
    from neurodiffeq_tpu.solvers import Solver1D
    from neurodiffeq_tpu.conditions import IVP
    from neurodiffeq_tpu.fields import diff

    drawing = threading.Event()
    done = []

    class SlowMonitor:
        fig = None
        using_non_gui_backend = True

        def check(self, nets, conditions, history, params=None, solver=None):
            drawing.set()
            _time.sleep(0.3)
            done.append(len(history['train_loss']))

    mc = MonitorCallback(SlowMonitor(), background=True)
    solver = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
    )
    solver.fit(5, callbacks=[mc.conditioned_on(PeriodLocal(period=2))],
               tqdm_file=None)
    # the period-2 fires (epochs 2 and 4) went to the worker; fit() returned
    # only after joining it
    assert drawing.is_set()
    assert mc._worker is None or not mc._worker.is_alive()
    assert len(done) >= 1


def _stiff_solver(residual_weights=None):
    from neurodiffeq_tpu.solvers import Solver1D
    from neurodiffeq_tpu.conditions import IVP
    from neurodiffeq_tpu.networks import FCNN, SinActv
    from neurodiffeq_tpu.fields import diff

    eqs = lambda u, v, t: [diff(u, t) - v, diff(v, t) + 100.0 * u]
    return Solver1D(
        ode_system=eqs,
        conditions=[IVP(0.0, 1.0), IVP(0.0, 0.0)],
        t_min=0.0, t_max=1.0,
        nets=[FCNN(hidden_units=(16,), actv=SinActv) for _ in range(2)],
        residual_weights=residual_weights,
    )


def test_auto_residual_weight_balances_stiff_system():
    """On u'=v, v'=-100u the second equation's gradient norm is ~100x the
    first's; the balancer must down-weight it (toward the 1/omega^2
    nondimensionalization weight) while keeping the chunked fit path."""
    from neurodiffeq_tpu.callbacks import (
        AutoResidualWeightCallback, OnFirstLocal, PeriodLocal)

    solver = _stiff_solver()
    ab = AutoResidualWeightCallback()
    solver.fit(600, callbacks=[ab.conditioned_on(OnFirstLocal() | PeriodLocal(period=100))],
               tqdm_file=None)
    assert len(ab.weight_history) >= 6
    w = solver.residual_weights
    assert w is not None and len(w) == 2
    assert w[0] == 1.0                     # renormalized: max weight is 1
    assert w[1] < 0.5                      # stiff equation down-weighted
    assert w[1] >= ab.min_weight           # floored, never starved to zero
    # the periodic fires have hints, so fit() still chunks between them
    assert solver._fit_chunk_sizes and max(solver._fit_chunk_sizes) >= 99


def test_auto_residual_weight_freezes_and_stops_recompiling():
    from neurodiffeq_tpu.callbacks import AutoResidualWeightCallback, PeriodLocal

    solver = _stiff_solver()
    # huge tolerance: every fire counts as converged -> freezes after 2
    ab = AutoResidualWeightCallback(freeze_tol=1e9, freeze_patience=2)
    solver.fit(500, callbacks=[ab.conditioned_on(PeriodLocal(period=100))],
               tqdm_file=None)
    assert ab.frozen
    assert len(ab.weight_history) == 2
    w_frozen = list(solver.residual_weights)
    compiled = solver._compiled
    solver.fit(200, callbacks=[ab.conditioned_on(PeriodLocal(period=100))],
               tqdm_file=None)
    assert solver.residual_weights == w_frozen
    assert solver._compiled is compiled    # no invalidation after freeze


def test_auto_residual_weight_single_equation_warns():
    from neurodiffeq_tpu.solvers import Solver1D
    from neurodiffeq_tpu.conditions import IVP
    from neurodiffeq_tpu.callbacks import AutoResidualWeightCallback, PeriodLocal
    from neurodiffeq_tpu.fields import diff

    solver = Solver1D(ode_system=lambda u, t: [diff(u, t) + u],
                      conditions=[IVP(0.0, 1.0)], t_min=0.0, t_max=2.0)
    ab = AutoResidualWeightCallback()
    with pytest.warns(UserWarning, match='single'):
        solver.fit(4, callbacks=[ab.conditioned_on(PeriodLocal(period=2))],
                   tqdm_file=None)
    assert ab.frozen
    assert solver.residual_weights is None


def test_auto_residual_weight_validation():
    from neurodiffeq_tpu.callbacks import AutoResidualWeightCallback

    with pytest.raises(ValueError):
        AutoResidualWeightCallback(rate=0.0)
    with pytest.raises(ValueError):
        AutoResidualWeightCallback(rate=1.5)
    with pytest.raises(ValueError):
        AutoResidualWeightCallback(clip=1.0)
    with pytest.raises(ValueError):
        AutoResidualWeightCallback(min_weight=0.0)
