"""Per-equation residual weighting (static).

No reference analog: the reference can only reweight equations by hand via
the additional_loss hook. Weights scale each equation's residual Field by
sqrt(w_k) before the loss, so quadratic losses see sum_k w_k mean(r_k^2).
(An automatic per-batch 'balance' mode was built and rejected on
measurement — see benchmarks/RESULTS.md.)
"""
import numpy as np
import pytest
import warnings

from neurodiffeq_tpu import diff
from neurodiffeq_tpu.conditions import IVP
from neurodiffeq_tpu.networks import FCNN
from neurodiffeq_tpu.solvers import Solver1D
from neurodiffeq_tpu.utils import set_seed


def _two_copy_system(scale):
    """Two residuals for one function: the same equation, one scaled."""
    return lambda u, t: [diff(u, t) + u, scale * (diff(u, t) + u)]


def test_static_weights_match_manual_loss():
    set_seed(0)
    solver = Solver1D(ode_system=_two_copy_system(2.0), conditions=[IVP(0, 1)],
                      t_min=0.0, t_max=1.0, residual_weights=[4.0, 1.0],
                      n_batches_valid=0)
    cols = solver._generate_train_batch()
    loss, _ = solver._loss_and_metrics(solver.params, cols)
    r = np.asarray(solver._residuals(*solver._forward(solver.params, cols)).value)
    manual = (4.0 * r[:, 0] ** 2 + 1.0 * r[:, 1] ** 2).mean() / 2
    assert np.isclose(float(loss), manual, rtol=1e-6)


def test_degree_one_losses_see_linear_weights():
    """'l1' and 'infinity' are degree-1 in the residual, so they declare
    residual_power = 1 and residual_weights multiply equation k's
    contribution by w_k (not the sqrt(w_k) of quadratic losses)."""
    set_seed(0)
    for name, manual_of in (
        ('l1', lambda r: (4.0 * np.abs(r[:, 0]) + np.abs(r[:, 1])).mean() / 2),
        ('infinity',
         lambda r: np.maximum(4.0 * np.abs(r[:, 0]), np.abs(r[:, 1])).mean()),
    ):
        solver = Solver1D(ode_system=_two_copy_system(2.0), conditions=[IVP(0, 1)],
                          t_min=0.0, t_max=1.0, residual_weights=[4.0, 1.0],
                          loss_fn=name, n_batches_valid=0)
        cols = solver._generate_train_batch()
        loss, _ = solver._loss_and_metrics(solver.params, cols)
        r = np.asarray(solver._residuals(*solver._forward(solver.params, cols),
                                         weighted=False).value)
        assert np.isclose(float(loss), manual_of(r), rtol=1e-6), name


def test_get_residuals_stays_unweighted():
    set_seed(0)
    solver = Solver1D(ode_system=_two_copy_system(3.0), conditions=[IVP(0, 1)],
                      t_min=0.0, t_max=1.0, residual_weights=[100.0, 1.0],
                      n_batches_valid=0)
    ts = np.linspace(0.1, 0.9, 7)
    r1, r2 = solver.get_residuals(ts, best=False)
    # raw residuals keep the 3x relationship, no sqrt(100) contamination
    assert np.allclose(np.asarray(r2), 3.0 * np.asarray(r1), rtol=1e-5)


def test_weights_rescue_badly_scaled_shared_net_system():
    """One SHARED net drives both functions, so gradients compete in the
    trunk: a 300x-scaled first equation starves the second. Down-weighting
    it restores the unscaled system exactly."""
    def run(residual_weights, scale=300.0, epochs=1500):
        set_seed(3)
        net = FCNN(1, 2, hidden_units=(32, 32))
        conds = [IVP(0, 1), IVP(0, 1)]
        with warnings.catch_warnings():
            warnings.simplefilter('ignore', DeprecationWarning)
            for i, c in enumerate(conds):
                c.set_impose_on(i)
        system = lambda u, v, t: [scale * (diff(u, t) + u), diff(v, t) - v]
        solver = Solver1D(ode_system=system, conditions=conds, t_min=0.0, t_max=1.0,
                          nets=[net, net], residual_weights=residual_weights,
                          n_batches_valid=0)
        solver.fit(max_epochs=epochs, tqdm_file=None)
        ts = np.linspace(0, 1, 30)
        u, v = solver.get_solution(best=False)(ts)
        return (np.abs(np.asarray(u).reshape(-1) - np.exp(-ts)).max(),
                np.abs(np.asarray(v).reshape(-1) - np.exp(ts)).max())

    u_err_plain, v_err_plain = run(None)
    u_err_w, v_err_w = run([1.0 / 300.0 ** 2, 1.0])
    assert v_err_w < 0.5 * v_err_plain
    assert u_err_w < 5e-2 and v_err_w < 5e-2


def test_validation_errors():
    mk = lambda **kw: Solver1D(ode_system=lambda u, t: [diff(u, t) + u],
                               conditions=[IVP(0, 1)], t_min=0.0, t_max=1.0, **kw)
    with pytest.raises(ValueError, match='positive'):
        mk(residual_weights='balance')  # rejected mode: strings are invalid
    with pytest.raises(ValueError, match='positive'):
        mk(residual_weights=[1.0, -2.0])
    solver = mk(residual_weights=[1.0, 2.0, 3.0])  # wrong arity -> trace-time error
    with pytest.raises(ValueError, match='entries'):
        solver._loss_and_metrics(solver.params, solver._generate_train_batch())
