"""Residual-based adaptive collocation sampling (ResidualAdaptiveGenerator).

No reference analog (the reference's only batch adaptation is the Eve
callback, callbacks.py:187-230); this pins the RAD/RAR-D selection semantics
and the solver integration on both the jitted and host training paths.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurodiffeq_tpu import diff
from neurodiffeq_tpu.conditions import IVP, DirichletBVP2D, NoCondition
from neurodiffeq_tpu.generators import (
    BatchGenerator, Generator1D, Generator2D, ResidualAdaptiveGenerator,
)
from neurodiffeq_tpu.solvers import GenericSolver, Solver1D, Solver2D
from neurodiffeq_tpu.utils import set_seed


def test_topk_selects_highest_scoring_points():
    g = ResidualAdaptiveGenerator(
        Generator1D(64, 0.0, 1.0, method='uniform'), oversample=8, strategy='topk')
    pts = np.asarray(g.sample_scored(
        jax.random.PRNGKey(0), lambda cand: -(cand[0] - 0.7) ** 2))
    assert pts.shape == (64,)
    # 64 of 512 candidates kept: all must cluster tightly around the peak
    assert np.abs(pts - 0.7).max() < 0.12


def test_topk_oversample_1_is_a_permutation_of_the_base_draw():
    base = Generator1D(32, 0.0, 1.0, method='uniform')
    g = ResidualAdaptiveGenerator(base, oversample=1, strategy='topk')
    key = jax.random.PRNGKey(3)
    scored = np.sort(np.asarray(g.sample_scored(key, lambda cand: cand[0])))
    # sample_scored splits oversample+1 keys and draws with keys[1:]
    plain = np.sort(np.asarray(base.sample(jax.random.split(key, 2)[1])))
    assert np.allclose(scored, plain)


def test_power_sampling_shifts_mass_toward_high_scores():
    g = ResidualAdaptiveGenerator(
        Generator1D(256, 0.0, 1.0, method='uniform'), oversample=8,
        strategy='power', alpha=2.0, c=0.0)
    pts = np.asarray(g.sample_scored(jax.random.PRNGKey(1), lambda cand: cand[0] ** 2))
    # E[x] under p ∝ x^4 on [0,1] is 5/6; uniform is 1/2
    assert pts.mean() > 0.6


def test_power_sampling_survives_all_zero_scores():
    g = ResidualAdaptiveGenerator(
        Generator1D(32, 0.0, 1.0, method='uniform'), oversample=2)
    pts = np.asarray(g.sample_scored(
        jax.random.PRNGKey(0), lambda cand: jnp.zeros_like(cand[0])))
    assert np.isfinite(pts).all()


def test_multi_coordinate_selection_keeps_columns_aligned():
    g = ResidualAdaptiveGenerator(
        Generator2D((8, 8), (0, 0), (1, 1), method='equally-spaced'),
        oversample=4, strategy='topk')
    xs, ys = g.sample_scored(
        jax.random.PRNGKey(0), lambda cand: (cand[0] - cand[1]) ** 2)
    xs, ys = np.asarray(xs), np.asarray(ys)
    assert xs.shape == ys.shape == (64,)
    # top-|x - y| points on the grid are the far-off-diagonal corners
    assert np.abs(xs - ys).min() > 0.5


def test_validation_and_standalone_sampling_degenerate_to_base():
    base = Generator1D(16, 0.0, 1.0, method='equally-spaced')
    g = ResidualAdaptiveGenerator(base, oversample=4)
    key = jax.random.PRNGKey(0)
    assert np.allclose(np.asarray(g.sample(key)), np.asarray(base.sample(key)))


def test_rejects_non_jittable_base_and_bad_args():
    base = Generator1D(8, 0.0, 1.0)
    dynamic = BatchGenerator(Generator1D(16, 0.0, 1.0), batch_size=8)
    with pytest.raises(ValueError, match='jittable'):
        ResidualAdaptiveGenerator(dynamic)
    with pytest.raises(ValueError, match='strategy'):
        ResidualAdaptiveGenerator(base, strategy='softmax')
    with pytest.raises(ValueError, match='oversample'):
        ResidualAdaptiveGenerator(base, oversample=0)


def test_solver_scores_by_actual_residual():
    """The injected scorer must be the equation residual: with a frozen random
    net, scored selection (topk) must pick candidate points whose |residual|
    dominates the candidate pool's."""
    set_seed(7)
    solver = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(0, 1)], t_min=0.0, t_max=3.0,
        train_generator=ResidualAdaptiveGenerator(
            Generator1D(32, 0.0, 3.0, method='uniform'), oversample=8, strategy='topk'),
    )
    gen = solver.generator['train']
    key = jax.random.PRNGKey(11)
    cols = gen.sample_scored(key, lambda c: solver._residual_scores(solver.params, c))
    picked = np.asarray(solver._residual_scores(solver.params, cols))
    uniform_cols = [np.linspace(0, 3, 512).reshape(-1, 1)]
    pool = np.asarray(solver._residual_scores(solver.params, uniform_cols))
    assert np.median(picked) > np.median(pool)


def test_adaptive_training_converges_on_fast_path():
    set_seed(0)
    solver = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(0, 1)], t_min=0.0, t_max=3.0,
        train_generator=ResidualAdaptiveGenerator(
            Generator1D(32, 0.0, 3.0, method='uniform'), oversample=4),
    )
    solver.fit(max_epochs=800, tqdm_file=None)
    sol = solver.get_solution()
    ts = np.linspace(0, 3, 50)
    err = np.abs(np.asarray(sol(ts)).reshape(-1) - np.exp(-ts)).max()
    assert err < 2e-2
    assert len(solver.metrics_history['train_loss']) == 800


def test_adaptive_training_with_callbacks_and_batch_inspection():
    """Callbacks drop fit() to per-epoch stepping; adaptive sampling must keep
    working there, and the host-side batch-inspection API must score too."""
    seen = []
    set_seed(0)
    solver = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(0, 1)], t_min=0.0, t_max=2.0,
        train_generator=ResidualAdaptiveGenerator(
            Generator1D(16, 0.0, 2.0, method='uniform'), oversample=4),
    )
    solver.fit(max_epochs=30, callbacks=[lambda s: seen.append(s.global_epoch)],
               tqdm_file=None)
    assert seen == list(range(1, 31))
    assert solver.metrics_history['train_loss'][-1] < solver.metrics_history['train_loss'][0]
    # the additional_loss-inspection API samples host-side with the scorer bound
    cols = solver._generate_train_batch()
    assert [c.shape for c in cols] == [(16, 1)]
    assert solver.batch['train'][0].shape == (16, 1)


def test_adaptive_2d_poisson_beats_uniform_on_underresolved_source():
    """The motivating regime (benchmarks/adaptive_ab.py): a sigma=0.03
    Gaussian source with only 256 trained points/step. Uniform sampling
    under-resolves the bump; RAD selection should cut max error well below
    it at equal trained points and epochs. (On well-resolved smooth problems
    adaptive is measurably SLOWER to converge — documented in RESULTS.md —
    so this test pins the win in the regime the feature is for.)"""
    s2 = 2 * 0.03 ** 2
    exact = lambda x, y: np.exp(-((x - 0.5) ** 2 + (y - 0.5) ** 2) / s2)

    def pde(u, x, y):
        from neurodiffeq_tpu.fields import exp as fexp
        g = fexp(-((x - 0.5) ** 2 + (y - 0.5) ** 2) / s2)
        lap_g = g * (((2 * (x - 0.5) / s2) ** 2 + (2 * (y - 0.5) / s2) ** 2) - 4 / s2)
        return [diff(u, x, 2) + diff(u, y, 2) - lap_g]

    def run(train_gen, seed):
        from neurodiffeq_tpu.networks import FCNN
        set_seed(seed)
        cond = DirichletBVP2D(
            x_min=0, x_min_val=lambda y: 0, x_max=1, x_max_val=lambda y: 0,
            y_min=0, y_min_val=lambda x: 0, y_max=1, y_max_val=lambda x: 0)
        solver = Solver2D(pde_system=pde, conditions=[cond], xy_min=(0, 0), xy_max=(1, 1),
                          nets=[FCNN(2, 1, hidden_units=(64, 64))],
                          train_generator=train_gen, n_batches_valid=0)
        solver.fit(max_epochs=3000, tqdm_file=None)
        sol = solver.get_solution(best=False)
        xs, ys = np.meshgrid(np.linspace(0, 1, 41), np.linspace(0, 1, 41))
        u = np.asarray(sol(xs.ravel(), ys.ravel())).reshape(-1)
        return np.abs(u - exact(xs.ravel(), ys.ravel())).max()

    base = lambda: Generator2D((16, 16), (0, 0), (1, 1), method='equally-spaced-noisy')
    err_uniform = run(base(), seed=1)
    err_adaptive = run(ResidualAdaptiveGenerator(base(), oversample=8), seed=1)
    assert err_adaptive < 0.7 * err_uniform


def test_generic_solver_system_with_adaptive_generator():
    """Multi-equation systems: scores sum squared residuals over equations."""
    set_seed(2)
    system = lambda u, v, t: [diff(u, t) - v, diff(v, t) + u]
    solver = GenericSolver(
        diff_eqs=system, conditions=[IVP(0, 0), IVP(0, 1)],
        n_input_units=1, n_output_units=1,
        train_generator=ResidualAdaptiveGenerator(
            Generator1D(32, 0.0, 2.0, method='uniform'), oversample=4),
        valid_generator=Generator1D(32, 0.0, 2.0, method='equally-spaced'),
    )
    solver.fit(max_epochs=1500, tqdm_file=None)
    sol = solver.get_solution()
    ts = np.linspace(0, 2, 40)
    u, v = sol(ts)
    assert np.abs(np.asarray(u).reshape(-1) - np.sin(ts)).max() < 5e-2
    assert np.abs(np.asarray(v).reshape(-1) - np.cos(ts)).max() < 5e-2


def test_buried_adaptive_generator_warns():
    """An adaptive generator nested inside a combinator is silently inert
    (only the outermost generator's selection runs); the solver must warn."""
    base = Generator1D(16, 0.0, 1.0, method='uniform')
    buried = ResidualAdaptiveGenerator(base, oversample=2) + Generator1D(16, 0.0, 1.0)
    with pytest.warns(UserWarning, match='OUTERMOST'):
        Solver1D(ode_system=lambda u, t: [diff(u, t) + u], conditions=[IVP(0, 1)],
                 t_min=0.0, t_max=1.0, train_generator=buried)
    # outermost adaptive: no warning
    import warnings as w
    with w.catch_warnings():
        w.simplefilter('error', UserWarning)
        Solver1D(ode_system=lambda u, t: [diff(u, t) + u], conditions=[IVP(0, 1)],
                 t_min=0.0, t_max=1.0,
                 train_generator=ResidualAdaptiveGenerator(base, oversample=2))


def test_buried_adaptive_warns_on_set_generator_too():
    """The hot-swap path must give the same buried-adaptive warning as the
    constructor (review finding: it was silent)."""
    base = Generator1D(16, 0.0, 1.0, method='uniform')
    solver = Solver1D(ode_system=lambda u, t: [diff(u, t) + u], conditions=[IVP(0, 1)],
                      t_min=0.0, t_max=1.0)
    buried = ResidualAdaptiveGenerator(base, oversample=2) + Generator1D(16, 0.0, 1.0)
    with pytest.warns(UserWarning, match='OUTERMOST'):
        solver.set_generator(buried, phase='train')
    # valid phase never runs adaptive selection: swapping there stays silent
    import warnings as w
    with w.catch_warnings():
        w.simplefilter('error', UserWarning)
        solver.set_generator(Generator1D(16, 0.0, 1.0), phase='valid')
        solver.set_generator(ResidualAdaptiveGenerator(base, oversample=2), phase='train')
