"""Solver-engine behavioral tests (parity with reference tests/test_solvers.py
and the integration tests of tests/test_ode.py)."""
import io
import numpy as np
import pytest
import optax

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.conditions import IVP, NoCondition, DirichletBVP2D
from neurodiffeq_tpu.generators import Generator1D, Generator2D
from neurodiffeq_tpu.networks import FCNN, SinActv
from neurodiffeq_tpu.solvers import Solver1D, Solver2D, GenericSolver, BundleSolver1D
from neurodiffeq_tpu.conditions import BundleIVP


def exp_decay_solver(**kwargs):
    return Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
        **kwargs,
    )


def test_missing_generator_raises():
    with pytest.raises(ValueError):
        Solver1D(lambda u, t: [diff(u, t)], [IVP(0, 1)])


def test_history_bookkeeping():
    solver = exp_decay_solver()
    solver.fit(max_epochs=7, tqdm_file=None)
    assert len(solver.metrics_history['train_loss']) == 7
    assert len(solver.metrics_history['valid_loss']) == 7
    assert solver.global_epoch == 7
    assert solver.lowest_loss is not None
    assert solver.best_params is not None


def test_callback_path_matches_history():
    seen = []

    def cb(s):
        seen.append((s.local_epoch, s.global_epoch))

    solver = exp_decay_solver()
    solver.fit(max_epochs=5, callbacks=[cb], tqdm_file=None)
    assert len(seen) == 5
    assert seen[-1][0] == 5


def test_early_stopping():
    def cb(s):
        if s.local_epoch >= 3:
            s._stop_training = True

    solver = exp_decay_solver()
    solver.fit(max_epochs=100, callbacks=[cb], tqdm_file=None)
    assert solver.global_epoch == 3


def test_convergence_exp_decay():
    solver = exp_decay_solver()
    solver.fit(max_epochs=800, tqdm_file=None)
    sol = solver.get_solution()
    ts = np.linspace(0, 2, 100)
    err = np.abs(np.asarray(sol(ts)) - np.exp(-ts)).max()
    assert err < 2e-2, f"max error {err}"
    # exact constraint at t=0 regardless of training
    assert np.isclose(float(np.asarray(sol(np.zeros(1)))[0]), 1.0, atol=1e-10)


def test_solution_shapes_and_numpy():
    solver = exp_decay_solver()
    solver.fit(max_epochs=2, tqdm_file=None)
    sol = solver.get_solution()
    ts = np.linspace(0, 2, 12).reshape(3, 4)
    out = sol(ts, to_numpy=True)
    assert isinstance(out, np.ndarray) and out.shape == (3, 4)
    out = sol(ts.flatten())
    assert out.shape == (12,)


def test_get_residuals_shapes():
    solver = exp_decay_solver()
    solver.fit(max_epochs=2, tqdm_file=None)
    ts = np.linspace(0.1, 1.9, 10)
    res = solver.get_residuals(ts, to_numpy=True)
    assert res.shape == (10,)
    res = solver.get_residuals(ts.reshape(2, 5), best=False)
    assert res.shape == (2, 5)


def test_no_validation_best_from_train():
    solver = exp_decay_solver(n_batches_valid=0)
    solver.fit(max_epochs=5, tqdm_file=None)
    assert len(solver.metrics_history['valid_loss']) == 0
    assert solver.best_params is not None
    assert solver.lowest_loss is not None


def test_metrics_logged():
    def analytic_mse(u, t):
        return ((u - np.e ** (-t)) ** 2).mean()

    solver = exp_decay_solver(metrics={'analytic_mse': analytic_mse})
    solver.fit(max_epochs=3, tqdm_file=None)
    assert len(solver.metrics_history['train__analytic_mse']) == 3
    assert len(solver.metrics_history['valid__analytic_mse']) == 3


def test_deprecated_analytic_solutions():
    with pytest.warns(FutureWarning):
        solver = Solver1D(
            ode_system=lambda u, t: [diff(u, t) + u],
            conditions=[IVP(t_0=0.0, u_0=1.0)],
            t_min=0.0, t_max=2.0,
            analytic_solutions=lambda t: [np.e ** (-t)],
        )
    solver.fit(max_epochs=2, tqdm_file=None)
    assert len(solver.metrics_history['train__analytic_mse']) == 2


def test_gradient_accumulation_n_batches():
    solver = exp_decay_solver(n_batches_train=3)
    solver.fit(max_epochs=3, tqdm_file=None)
    assert solver.global_epoch == 3


def test_custom_loss_fn_str():
    for name in ('l1', 'l2', 'infinity', 'h1', 'h1 semi'):
        solver = exp_decay_solver(loss_fn=name)
        solver.fit(max_epochs=2, tqdm_file=None)
        assert solver.global_epoch == 2


def test_fit_profile_dir(tmp_path):
    """fit(profile_dir=...) wraps the run in jax.profiler.trace (SURVEY §5)."""
    import os
    solver = exp_decay_solver()
    pdir = str(tmp_path / 'trace')
    solver.fit(max_epochs=3, tqdm_file=None, profile_dir=pdir)
    assert solver.global_epoch == 3
    found = [os.path.join(r, f) for r, _, fs in os.walk(pdir) for f in fs]
    assert found, "no profiler trace files written"


def test_infinity_loss_is_nonnegative():
    # regression: the reference takes residual.abs().max(dim=1); a signed max
    # would be unbounded below and reward large negative residuals.
    import jax.numpy as jnp
    from neurodiffeq_tpu.losses import _losses
    r = F.coords_from_points(jnp.array([[-3.0], [-5.0]]))[0]
    val = float(_losses['infinity'](r - 0.0, None, None))
    assert np.isclose(val, 4.0)  # mean of |−3|, |−5| row maxima
    assert val > 0


def test_get_residuals_with_shared_and_distinct_nets():
    # regression: a duplicated shared net preceding a distinct net must not
    # re-expand the already-expanded parameter list (nets=[A,A,B]).
    shared = FCNN(n_input_units=1, n_output_units=1, hidden_units=(8,))
    other = FCNN(n_input_units=1, n_output_units=1, hidden_units=(8,))

    def system(u1, u2, v, t):
        return [diff(u1, t) + u1, diff(u2, t) + u2, diff(v, t) - v]

    solver = Solver1D(
        ode_system=system,
        conditions=[NoCondition(), NoCondition(), NoCondition()],
        nets=[shared, shared, other],
        t_min=0.0, t_max=1.0,
    )
    solver.fit(max_epochs=3, tqdm_file=None)
    ts = np.linspace(0.1, 0.9, 7)
    r1, r2, r3 = solver.get_residuals(ts, to_numpy=True, best=False)
    # the two shared-net residuals agree; the distinct net's residual is
    # computed with ITS params: evaluate it directly and compare.
    assert np.allclose(r1, r2)
    import jax.numpy as jnp
    tcol = jnp.asarray(ts).reshape(-1, 1)
    params_b = solver._expand_params(solver.params)[2]
    v = other.apply(params_b, tcol)
    got_from_a = shared.apply(solver._expand_params(solver.params)[0], tcol)
    assert not np.allclose(np.asarray(v), np.asarray(got_from_a))
    coord_fields = F.coords_from_points(tcol)
    v_field = solver.compute_func_val(other, params_b, solver.conditions[2], *coord_fields)
    expected_r3 = (diff(v_field, coord_fields[0]) - v_field).value
    assert np.allclose(r3.reshape(-1, 1), np.asarray(expected_r3))


def test_custom_loss_fn_callable():
    def myloss(residual, funcs, coords):
        return (residual.value ** 2).mean() + 0.0

    solver = exp_decay_solver(loss_fn=myloss)
    solver.fit(max_epochs=2, tqdm_file=None)
    assert solver.global_epoch == 2


def test_custom_optimizer():
    solver = exp_decay_solver(optimizer=optax.sgd(1e-3))
    solver.fit(max_epochs=3, tqdm_file=None)
    assert solver.global_epoch == 3


def test_lbfgs_closure_optimizer():
    solver = exp_decay_solver(
        optimizer=optax.lbfgs(),
        n_batches_valid=4,
    )
    assert solver._closure_style
    solver.fit(max_epochs=30, tqdm_file=None)
    sol = solver.get_solution()
    ts = np.linspace(0, 2, 50)
    err = np.abs(np.asarray(sol(ts)) - np.exp(-ts)).max()
    assert err < 5e-2, f"max error {err}"


def test_lbfgs_warns_without_validation():
    with pytest.warns(RuntimeWarning):
        exp_decay_solver(optimizer=optax.lbfgs(), n_batches_valid=0)


def test_set_generator_swaps_and_invalidates():
    from neurodiffeq_tpu.generators import StaticGenerator

    solver = exp_decay_solver()
    solver.fit(max_epochs=2, tqdm_file=None)
    assert solver._compiled  # epoch program cached from the first fit
    frozen = StaticGenerator(Generator1D(16, 0.0, 2.0, method='uniform'))
    solver.set_generator(frozen, phase='train')
    assert solver._compiled == {}  # swap must drop stale compiled epochs
    solver.fit(max_epochs=2, tqdm_file=None)
    assert solver.global_epoch == 4
    # the swapped-in frozen draw is what training now samples
    pts = solver.generator['train'].get_examples()
    pts = pts[0] if isinstance(pts, (tuple, list)) else pts
    assert np.allclose(np.sort(np.asarray(pts).ravel()),
                       np.sort(np.asarray(frozen.examples).ravel()))
    with pytest.raises(ValueError):
        solver.set_generator(frozen, phase='test')


def test_adam_then_lbfgs_polish_workflow():
    """The standard PINN recipe: stochastic Adam, then full-batch L-BFGS on a
    frozen dense draw (exercises set_generator + set_optimizer together)."""
    from neurodiffeq_tpu.generators import StaticGenerator

    solver = exp_decay_solver(n_batches_valid=1)
    solver.fit(max_epochs=60, tqdm_file=None)
    solver.set_generator(StaticGenerator(Generator1D(64, 0.0, 2.0)), phase='train')
    solver.set_optimizer(optax.lbfgs())
    assert solver._closure_style
    solver.fit(max_epochs=40, tqdm_file=None)
    ts = np.linspace(0, 2, 50)
    err = np.abs(np.asarray(solver.get_solution()(ts)) - np.exp(-ts)).max()
    assert err < 5e-2, f"max error {err}"


def test_get_internals():
    solver = exp_decay_solver()
    solver.fit(max_epochs=1, tqdm_file=None)
    d = solver.get_internals('all')
    assert 'nets' in d and 'params' in d and 'diff_eqs' in d
    assert solver.get_internals('n_funcs') == 1
    assert solver.get_internals(['n_funcs', 'lowest_loss'], return_type='dict')['n_funcs'] == 1


def test_deprecated_args_warn():
    with pytest.warns(FutureWarning):
        exp_decay_solver(shuffle=True)
    with pytest.warns(FutureWarning):
        exp_decay_solver(batch_size=64)


def test_additional_loss_hook():
    calls = []

    class MySolver(Solver1D):
        def additional_loss(self, residual, funcs, coords):
            calls.append(1)
            return 0.01 * (funcs[0].value ** 2).mean()

    solver = MySolver(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
    )
    solver.fit(max_epochs=2, tqdm_file=None)
    assert calls  # traced at least once
    assert solver.global_epoch == 2


def test_system_of_odes_converges():
    # harmonic oscillator: u'' + u = 0 as a system; u1(0)=0, u2(0)=1
    def system(u1, u2, t):
        return [diff(u1, t) - u2, diff(u2, t) + u1]

    solver = Solver1D(
        ode_system=system,
        conditions=[IVP(t_0=0.0, u_0=0.0), IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2 * np.pi,
        nets=[FCNN(1, 1, hidden_units=(32, 32), actv=SinActv) for _ in range(2)],
    )
    solver.fit(max_epochs=1500, tqdm_file=None)
    sol = solver.get_solution()
    ts = np.linspace(0, 2 * np.pi, 100)
    u1, u2 = sol(ts)
    assert np.abs(np.asarray(u1) - np.sin(ts)).max() < 5e-2
    assert np.abs(np.asarray(u2) - np.cos(ts)).max() < 5e-2


def test_generic_solver():
    solver = GenericSolver(
        diff_eqs=lambda u, t: [diff(u, t) + u],
        conditions=[NoCondition()],
        train_generator=Generator1D(32, 0, 2),
        valid_generator=Generator1D(32, 0, 2),
        n_input_units=1, n_output_units=1,
    )
    solver.fit(max_epochs=3, tqdm_file=None)
    sol = solver.get_solution()
    assert np.asarray(sol(np.linspace(0, 2, 7))).shape == (7,)


def test_solver2d_laplace_short():
    # Laplace on unit square with analytic solution sin(pi x) sinh(pi y)/sinh(pi)
    from neurodiffeq_tpu.operators import laplacian

    cond = DirichletBVP2D(
        x_min=0.0, x_min_val=lambda y: 0 * y,
        x_max=1.0, x_max_val=lambda y: 0 * y,
        y_min=0.0, y_min_val=lambda x: F.sin(np.pi * x),
        y_max=1.0, y_max_val=lambda x: 0 * x,
    )
    solver = Solver2D(
        pde_system=lambda u, x, y: [diff(u, x, 2) + diff(u, y, 2)],
        conditions=[cond],
        xy_min=(0.0, 0.0), xy_max=(1.0, 1.0),
        train_generator=Generator2D((16, 16), (0, 0), (1, 1), method='equally-spaced-noisy'),
        valid_generator=Generator2D((16, 16), (0, 0), (1, 1), method='equally-spaced'),
    )
    solver.fit(max_epochs=30, tqdm_file=None)
    sol = solver.get_solution()
    xs = np.random.rand(20)
    ys = np.random.rand(20)
    out = np.asarray(sol(xs, ys))
    assert out.shape == (20,)


def test_bundle_solver():
    # du/dt = -lambda * u, bundle over lambda in [0.5, 1.5]; u(0)=1
    def system(u, t, lam):
        return [diff(u, t) + lam * u]

    solver = BundleSolver1D(
        ode_system=system,
        conditions=[BundleIVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=1.0,
        theta_min=0.5, theta_max=1.5,
        eq_param_index=(0,),
    )
    solver.fit(max_epochs=600, tqdm_file=None)
    sol = solver.get_solution()
    ts = np.linspace(0, 1, 20)
    for lam in (0.6, 1.0, 1.4):
        us = np.asarray(sol(ts, lam * np.ones(20)))
        err = np.abs(us - np.exp(-lam * ts)).max()
        assert err < 5e-2, f"lambda={lam} err={err}"


def test_training_with_non_jittable_generator():
    """FilterGenerator has dynamic shapes -> the solver must fall back to the
    eager host path and still train correctly."""
    from neurodiffeq_tpu.generators import FilterGenerator
    import numpy as np
    train = FilterGenerator(Generator1D(64, 0, 2, method='equally-spaced-noisy'),
                            filter_fn=lambda xs: np.asarray(xs[0]) > 0.1)
    valid = Generator1D(32, 0, 2, method='equally-spaced')
    assert not train.jittable
    solver = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
        train_generator=train, valid_generator=valid,
    )
    solver.fit(max_epochs=5, tqdm_file=None)
    assert solver.global_epoch == 5
    assert solver.best_params is not None


def test_eve_callback_integration():
    """EveCallback growing n_batches mid-fit must trigger recompilation and
    keep training consistent."""
    from neurodiffeq_tpu.callbacks import EveCallback
    eve = EveCallback(base_value=1e6, double_at=0.5, n_0=1, n_max=4)
    solver = exp_decay_solver()
    solver.fit(max_epochs=6, callbacks=[eve], tqdm_file=None)
    assert solver.global_epoch == 6
    assert solver.n_batches['train'] >= 2  # loss far below base_value -> grew


def test_ensemble_condition_training():
    """One multi-output net + EnsembleCondition solving a coupled system."""
    from neurodiffeq_tpu.conditions import EnsembleCondition

    net = FCNN(1, 2, hidden_units=(32, 32), actv=SinActv)
    cond = EnsembleCondition(IVP(t_0=0.0, u_0=0.0), IVP(t_0=0.0, u_0=1.0))

    def system(uv, t):
        u = uv[:, 0:1]
        v = uv[:, 1:2]
        return [diff(u, t) - v, diff(v, t) + u]

    solver = Solver1D(
        ode_system=system,
        conditions=[cond],
        t_min=0.0, t_max=np.pi,
        nets=[net],
        n_output_units=2,
    )
    solver.fit(max_epochs=1500, tqdm_file=None)
    sol = solver.get_solution()
    ts = np.linspace(0, np.pi, 40)
    uv = np.asarray(sol(ts, no_reshape=True))
    assert uv.shape == (40, 2)
    assert np.abs(uv[:, 0] - np.sin(ts)).max() < 5e-2
    assert np.abs(uv[:, 1] - np.cos(ts)).max() < 5e-2


def test_fit_resume_continues_history():
    solver = exp_decay_solver()
    solver.fit(max_epochs=3, tqdm_file=None)
    solver.fit(max_epochs=4, tqdm_file=None)
    assert solver.global_epoch == 7


def test_tqdm_writes_to_stream():
    stream = io.StringIO()
    solver = exp_decay_solver()
    solver.fit(max_epochs=2, tqdm_file=stream)
    assert 'Training Progress' in stream.getvalue()
