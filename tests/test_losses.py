"""Loss-registry tests (parity with reference ``losses.py:5-35`` and
``tests/test_losses.py``): every entry maps (residual, funcs, coords) to a
scalar, is differentiable, and computes the right value.

The infinity norm in particular regressed once (signed max instead of
``abs().max()``), so values are pinned against closed forms here.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.losses import _losses
from neurodiffeq_tpu.networks import FCNN

N = 64


@pytest.fixture
def xy():
    rng = np.random.RandomState(0)
    return F.coordinates(rng.rand(N) * 2 - 1, rng.rand(N) + 0.5)


def test_registry_names():
    # reference names (losses.py:29-35) plus the beyond-reference 'variational'
    assert set(_losses) == {'l1', 'l2', 'infinity', 'h1', 'h1 semi',
                            'variational'}


@pytest.mark.parametrize('loss_name', list(_losses))
@pytest.mark.parametrize('n_eq', [1, 3])
def test_scalar_output_and_grad(loss_name, n_eq, xy):
    """Reference contract (tests/test_losses.py:33-37): scalar out, has grad."""
    x, y = xy
    net = FCNN(n_input_units=2, n_output_units=1, hidden_units=(8,))
    params = net.init(jax.random.PRNGKey(0))

    def loss_of(p):
        u = F.network_field(lambda xs: net.apply(p, xs), (x, y),
                            module=net, params=p)
        r = F.cat([diff(u, x) + u for _ in range(n_eq)], dim=1)
        return _losses[loss_name](r, [u], [x, y])

    val = loss_of(params)
    assert jnp.shape(val) == ()
    g = jax.grad(loss_of)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_l1_l2_infinity_values(xy):
    x, y = xy
    xv = np.asarray(x.value).reshape(-1)
    r = x ** 2 - 0.5  # signed residual: catches a missing abs()
    assert np.isclose(float(_losses['l1'](r, [], [x, y])),
                      np.abs(xv ** 2 - 0.5).mean())
    assert np.isclose(float(_losses['l2'](r, [], [x, y])),
                      ((xv ** 2 - 0.5) ** 2).mean())
    assert np.isclose(float(_losses['infinity'](r, [], [x, y])),
                      np.abs(xv ** 2 - 0.5).mean())  # single column: |.| itself


def test_infinity_is_rowwise_max_of_abs(xy):
    """infinity = mean over samples of max over equations of |residual|
    (reference losses.py:13-14) — must NOT be the signed max."""
    x, y = xy
    xv = np.asarray(x.value).reshape(-1)
    yv = np.asarray(y.value).reshape(-1)
    r = F.cat([x * 0 - 2.0, F.sin(x), x * y], dim=1)
    expected = np.maximum.reduce([np.full_like(xv, 2.0),
                                  np.abs(np.sin(xv)),
                                  np.abs(xv * yv)]).mean()
    assert np.isclose(float(_losses['infinity'](r, [], [x, y])), expected)


def test_h1_values_single_column(xy):
    x, y = xy
    xv = np.asarray(x.value).reshape(-1)
    yv = np.asarray(y.value).reshape(-1)
    r = x ** 2 * y  # dr/dx = 2xy, dr/dy = x^2
    vals = np.stack([xv ** 2 * yv, 2 * xv * yv, xv ** 2], axis=1)
    assert np.isclose(float(_losses['h1'](r, [], [x, y])), (vals ** 2).mean(),
                      rtol=1e-6)
    assert np.isclose(float(_losses['h1 semi'](r, [], [x, y])),
                      (vals[:, 1:] ** 2).mean(), rtol=1e-6)


def test_h1_multicolumn_sums_equations(xy):
    """For an (N, n_eq) residual the reference's grad(residual, *coords) uses
    grad_outputs=ones, i.e. differentiates the SUM of equation columns."""
    x, y = xy
    xv = np.asarray(x.value).reshape(-1)
    r = F.cat([x ** 2, F.sin(x)], dim=1)
    # d(x^2 + sin x)/dx = 2x + cos x ; d/dy = 0
    cols = np.stack([xv ** 2, np.sin(xv),
                     2 * xv + np.cos(xv), np.zeros_like(xv)], axis=1)
    assert np.isclose(float(_losses['h1'](r, [], [x, y])), (cols ** 2).mean(),
                      rtol=1e-6)
    assert np.isclose(float(_losses['h1 semi'](r, [], [x, y])),
                      (cols[:, 2:] ** 2).mean(), rtol=1e-6)


@pytest.mark.parametrize('loss_name', ['l1', 'l2', 'infinity', 'h1', 'h1 semi'])
def test_solver_accepts_loss_name(loss_name):
    """Every registry entry trains end-to-end through the Solver."""
    from neurodiffeq_tpu.solvers import Solver1D
    from neurodiffeq_tpu.conditions import IVP
    solver = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(0.0, 1.0)],
        t_min=0.0, t_max=1.0,
        loss_fn=loss_name,
    )
    solver.fit(max_epochs=3, tqdm_file=None)
    losses = solver.metrics_history['train_loss']
    assert len(losses) == 3
    assert all(np.isfinite(l) and l >= 0 for l in losses)


def test_causal_loss_value_matches_hand_computation():
    """causal(): sort by t, bin, cumulative-exp weights, mean of w*L."""
    from neurodiffeq_tpu.losses import causal

    rng = np.random.RandomState(3)
    n, n_bins, eps = 24, 4, 0.7
    t_np = rng.rand(n) * 5
    t, = F.coordinates(t_np)
    r_np = rng.randn(n, 2)
    r = jnp.asarray(r_np)  # losses accept raw (N, n_eq) arrays via _value

    got = float(causal(epsilon=eps, n_bins=n_bins)(r, [], [t]))

    r2 = (r_np ** 2).mean(axis=1)[np.argsort(t_np)]
    L = r2.reshape(n_bins, -1).mean(axis=1)
    cum = np.concatenate([[0.0], np.cumsum(L)[:-1]])
    expected = float((np.exp(-eps * cum) * L).mean())
    assert np.isclose(got, expected, rtol=1e-6), (got, expected)


def test_causal_loss_weights_detached_and_scalar_grad():
    """The weights are stop_gradient'ed: grad equals the weighted-residual
    grad, and the loss is a finite scalar with nonzero gradient."""
    from neurodiffeq_tpu.losses import causal

    rng = np.random.RandomState(0)
    t, = F.coordinates(np.linspace(0, 1, 32))
    net = FCNN(n_input_units=1, n_output_units=1, hidden_units=(8,))
    params = net.init(jax.random.PRNGKey(0))

    def loss_of(p):
        u = F.network_field(lambda xs: net.apply(p, xs), (t,),
                            module=net, params=p)
        r = diff(u, t) + u
        return causal(epsilon=2.0, n_bins=8)(r, [u], [t])

    val = loss_of(params)
    assert jnp.shape(val) == () and np.isfinite(float(val))
    g = jax.tree.leaves(jax.grad(loss_of)(params))
    assert all(np.all(np.isfinite(np.asarray(l))) for l in g)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in g)


def test_causal_loss_uneven_bins_and_clipping():
    """n not divisible by n_bins uses as-even-as-possible trace-time bounds;
    n_bins > n clips to one point per bin."""
    from neurodiffeq_tpu.losses import causal

    t, = F.coordinates(np.array([3.0, 1.0, 2.0, 0.0, 4.0]))
    r = jnp.asarray([[3.0], [1.0], [2.0], [0.0], [4.0]])
    # sorted r2 = [0, 1, 4, 9, 16]
    got = float(causal(epsilon=0.0, n_bins=2)(r, [], [t]))
    # bounds for n=5, m=2: [0, 2, 5] -> L = [0.5, 29/3]; eps=0 -> plain mean
    assert np.isclose(got, (0.5 + 29 / 3) / 2)
    got_clip = float(causal(epsilon=0.0, n_bins=100)(r, [], [t]))
    assert np.isclose(got_clip, (0 + 1 + 4 + 9 + 16) / 5)


def test_causal_loss_earlier_bins_weigh_more():
    """With identical per-bin residuals, gradient flow is strictly larger for
    early-time residuals (w monotonically nonincreasing in time)."""
    from neurodiffeq_tpu.losses import causal

    t, = F.coordinates(np.linspace(0, 1, 16))

    def loss_of(v):
        return causal(epsilon=1.0, n_bins=4)(v, [], [t])

    v = jnp.ones((16, 1))
    g = np.asarray(jax.grad(loss_of)(v)).reshape(-1)
    assert np.all(g[:4] >= g[-4:])
    assert g[0] > g[-1]


def test_variational_value_is_mean_of_density_columns(xy):
    """'variational' is the Monte-Carlo energy integral: mean over points of
    the summed density columns — NOT a squared norm, may be negative."""
    from neurodiffeq_tpu.losses import variational
    x, y = xy
    xv = np.asarray(x.value).reshape(-1)
    yv = np.asarray(y.value).reshape(-1)
    dens = F.cat([x ** 2 - 1.0, 0.5 * y], dim=1)  # negative-capable density
    expected = ((xv ** 2 - 1.0) + 0.5 * yv).mean()
    got = float(variational(dens, [], [x, y]))
    assert np.isclose(got, expected)
    # the sign must survive: an accidental abs()/square would flip this
    assert expected < 0 and got < 0


def test_variational_residual_weights_apply_linearly():
    """residual_power=1: residual_weights multiply density columns by w,
    not the sqrt(w) scaling quadratic losses get."""
    from neurodiffeq_tpu.solvers import Solver1D
    from neurodiffeq_tpu.conditions import NoCondition

    dens = lambda u, v, t: [u * 0 + 1.0, v * 0 + 10.0]  # noqa: E731
    common = dict(ode_system=dens,
                  conditions=[NoCondition(), NoCondition()],
                  t_min=0.0, t_max=1.0, loss_fn='variational')
    s_w = Solver1D(**common, residual_weights=[1.0, 4.0])
    s_p = Solver1D(**common)
    cols = [np.linspace(0, 1, 16).reshape(-1, 1)]
    lw, _ = s_w._loss_and_metrics(s_w.params, cols)
    lp, _ = s_p._loss_and_metrics(s_p.params, cols)
    # unweighted: mean(1 + 10) = 11; weighted: mean(1*1 + 4*10) = 41
    assert np.isclose(float(lp), 11.0)
    assert np.isclose(float(lw), 41.0), (
        f"expected linear weighting 41.0, got {float(lw)} "
        f"(the old sqrt(w) scaling would give 21.0)")


def test_deep_ritz_solves_poisson_1d():
    """End-to-end Deep Ritz: minimize E[u] = int 1/2 u'^2 - f u with exact
    Dirichlet BCs for -u'' = pi^2 sin(pi x); converges to sin(pi x). The
    energy density uses only FIRST derivatives (the method's selling
    point), and the final loss is negative (it is an energy)."""
    import optax
    from neurodiffeq_tpu.solvers import Solver1D
    from neurodiffeq_tpu.conditions import DirichletBVP
    from neurodiffeq_tpu.generators import Generator1D

    pi = np.pi

    def energy_density(u, x):
        return [0.5 * diff(u, x) ** 2 - (pi ** 2) * F.sin(pi * x) * u]

    s = Solver1D(ode_system=energy_density,
                 conditions=[DirichletBVP(0.0, 0.0, 1.0, 0.0)],
                 t_min=0.0, t_max=1.0, loss_fn='variational',
                 optimizer=optax.adam(1e-3),
                 train_generator=Generator1D(64, 0.0, 1.0,
                                             method='equally-spaced-noisy'),
                 valid_generator=Generator1D(64, 0.0, 1.0,
                                             method='equally-spaced'))
    s.fit(max_epochs=2000, tqdm_file=None)
    ts = np.linspace(0, 1, 101)
    pred = np.asarray(s.get_solution(best=False)(ts))
    err = float(np.max(np.abs(pred - np.sin(pi * ts))))
    assert err < 5e-2, f"Deep Ritz failed on 1-D Poisson: max err {err}"
    # the converged energy must be near the true minimum E[sin] = -pi^2/4 * ... :
    # E[u*] = int 1/2 (pi cos)^2 - pi^2 sin^2 = pi^2/4 - pi^2/2 = -pi^2/4
    final_valid = float(s.metrics_history['valid_loss'][-1])
    assert final_valid < 0, "variational loss should go negative (energy)"
    assert abs(final_valid - (-pi ** 2 / 4)) < 0.1 * (pi ** 2 / 4)
