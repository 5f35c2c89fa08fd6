"""float32-default numerics tier (``pytest -m f32``).

The shipped TPU default dtype is float32 while the main suite runs float64
(conftest matches the reference's f64 CI). This tier re-validates the
precision-sensitive invariants AT the shipped default — exact-constraint
anchors, condition math, operator identities, the polarization-based mixed
partials (which subtract nearly-cancelling directional derivatives), and one
short end-to-end convergence run — with f32 tolerances documented inline next
to the f64 ones (SURVEY.md §7 "Exact-constraint + float32 default" risk).

Runs on CPU in CI (`.github/workflows/test.yml` runs it as its own step) and
exercises the same code paths the TPU takes; nothing here is
platform-conditional.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.networks import FCNN, SinActv
from neurodiffeq_tpu import conditions as C
from neurodiffeq_tpu import operators as ops
from neurodiffeq_tpu.utils import set_tensor_type, set_seed

pytestmark = pytest.mark.f32

N = 64
# f64 suite uses 1e-8 anchor tolerance; f32 eps is 1.2e-7 and the enforce
# formulas are short chains, so 1e-5 absolute is a comfortable-but-honest bound
ATOL = 1e-5
ones = np.ones(N)


@pytest.fixture(autouse=True)
def f32_defaults():
    """Run this module at the shipped TPU default dtype; restore f64 after.

    ``jax_enable_x64`` must go off too — with it on, ``get_default_dtype``
    deliberately promotes the f32 default to f64 (the main suite's contract).
    """
    had_x64 = jax.config.jax_enable_x64
    jax.config.update('jax_enable_x64', False)
    set_tensor_type(float_bits=32)
    set_seed(42)
    yield
    # restore what the surrounding run had (f64 on the CPU suite; f32 when the
    # whole session runs at the accelerator default) rather than hardcoding f64
    if had_x64:
        set_tensor_type(float_bits=64)  # re-enables x64


def _net(n_in, n_out=1, seed=0):
    net = FCNN(n_input_units=n_in, n_output_units=n_out, hidden_units=(8, 8))
    return net, net.init(jax.random.PRNGKey(seed))


def test_default_dtype_is_f32():
    t, = F.coordinates(np.linspace(0, 1, 8))
    assert t.value.dtype == jnp.float32


def test_ivp_anchors_f32():
    net, params = _net(1)
    cond = C.IVP(t_0=0.3, u_0=1.7, u_0_prime=-0.4)
    t, = F.coordinates(0.3 * ones)
    u = cond.enforce(net, params, t)
    assert u.value.dtype == jnp.float32
    assert np.allclose(u.value, 1.7, atol=ATOL)
    assert np.allclose(diff(u, t).value, -0.4, atol=ATOL)


def test_dirichlet_bvp_anchors_f32():
    net, params = _net(1)
    cond = C.DirichletBVP(t_0=0.5, u_0=1.1, t_1=2.5, u_1=-0.7)
    t, = F.coordinates(0.5 * ones)
    assert np.allclose(cond.enforce(net, params, t).value, 1.1, atol=ATOL)
    t, = F.coordinates(2.5 * ones)
    assert np.allclose(cond.enforce(net, params, t).value, -0.7, atol=ATOL)


def test_dirichlet_bvp_2d_edges_f32():
    net, params = _net(2)
    cond = C.DirichletBVP2D(
        x_min=0.0, x_min_val=lambda y: 0 * y,
        x_max=1.0, x_max_val=lambda y: 0 * y,
        y_min=0.0, y_min_val=lambda x: F.sin(np.pi * x),
        y_max=1.0, y_max_val=lambda x: 0 * x,
    )
    xs = np.random.RandomState(0).rand(N)
    x, y = F.coordinates(xs, 0.0 * ones)
    assert np.allclose(cond.enforce(net, params, x, y).value[:, 0],
                       np.sin(np.pi * xs), atol=ATOL)
    for xs_, ys_ in [(xs, ones), (0.0 * ones, xs), (ones, xs)]:
        x, y = F.coordinates(xs_, ys_)
        assert np.allclose(cond.enforce(net, params, x, y).value, 0.0, atol=ATOL)


@pytest.mark.parametrize("d", [2, 5, 10])
@pytest.mark.parametrize("mask", ['adf', 'product', 'sat'])
def test_dirichlet_box_nd_anchors_f32(d, mask):
    """DirichletBoxND exact on faces (and edges) at the shipped f32 default.
    The ADF's 1/(phi_i + sqrt(tiny)) smoothing leaves a ~d*1e-19*|ANN|
    boundary defect — far below f32 round-off of O(1) values."""
    net, params = _net(d)
    g = lambda *xs: sum(F.sin(np.pi * x) for x in xs) / len(xs) + 0.7  # noqa: E731
    cond = C.DirichletBoxND(d, boundary_fn=g, mask=mask)
    rng = np.random.RandomState(d)
    pts = rng.rand(N, d)
    rows = np.arange(N)
    pts[rows, rng.randint(0, d, N)] = rng.randint(0, 2, N).astype(float)
    half = rows[N // 2:]
    pts[half, rng.randint(0, d, N // 2)] = rng.randint(0, 2, N // 2).astype(float)
    coords = F.coordinates(*[pts[:, i] for i in range(d)])
    u = np.asarray(cond.enforce(net, params, *coords).value)
    gv = np.sin(np.pi * pts).sum(axis=1, keepdims=True) / d + 0.7
    # f32 positions: sin(pi*x) of a rounded x costs up to ~pi*eps_f32
    assert np.allclose(u, gv, atol=1e-5)


def test_ibvp_anchors_f32():
    net, params = _net(2)
    cond = C.IBVP1D(
        x_min=0.0, x_max=1.0, t_min=0.0,
        t_min_val=lambda x: F.sin(np.pi * x),
        x_min_val=lambda t: 0 * t, x_max_val=lambda t: 0 * t,
    )
    xs = np.random.RandomState(1).rand(N)
    ts = np.random.RandomState(2).rand(N)
    x, t = F.coordinates(xs, 0.0 * ones)
    # IBVP anchors go through `pin` (per-sample jvp chains): slightly looser
    assert np.allclose(cond.enforce(net, params, x, t).value[:, 0],
                       np.sin(np.pi * xs), atol=5e-5)
    x, t = F.coordinates(0.0 * ones, ts)
    assert np.allclose(cond.enforce(net, params, x, t).value, 0.0, atol=5e-5)
    x, t = F.coordinates(ones, ts)
    assert np.allclose(cond.enforce(net, params, x, t).value, 0.0, atol=5e-5)


def test_bundle_ivp_anchor_f32():
    net, params = _net(2)
    cond = C.BundleIVP(t_0=0.0, u_0=None, bundle_param_lookup={'u_0': 0})
    u0s = np.random.RandomState(3).rand(N) + 0.5
    t, u0 = F.coordinates(0.0 * ones, u0s)
    u = cond.enforce(net, params, t, u0)
    assert np.allclose(u.value[:, 0], u0s, atol=ATOL)


def test_operator_identity_f32():
    """laplacian(r^2) = 6 in spherical coordinates (= (1/r^2) d/dr(r^2 * 2r))."""
    rs = np.random.RandomState(4).rand(N) + 0.5
    ths = np.random.RandomState(5).rand(N) * 2 + 0.5
    phs = np.random.RandomState(6).rand(N) * 3
    r, th, ph = F.coordinates(rs, ths, phs)
    u = r * r
    lap = ops.spherical_laplacian(u, r, th, ph)
    assert np.allclose(lap.value, 6.0, atol=1e-4)


def test_mixed_partial_extraction_f32():
    """The polarization extraction subtracts nearly-cancelling directional
    derivatives — verify the f32 cancellation error stays ~1e-4 relative on a
    network-scale function (u_xy and u_xxy of an FCNN)."""
    net, params = _net(2)
    rs = np.random.RandomState(7)
    xs, ys = rs.rand(N), rs.rand(N)

    x, y = F.coordinates(xs, ys)
    u = C._ann_field(net, params, (x, y))
    u_xy = np.asarray(diff(diff(u, x), y).value)
    u_xxy = np.asarray(diff(diff(u, x, 2), y).value)

    # reference: per-sample compose mode at f64 (x64 back on for the reference
    # computation only)
    set_tensor_type(float_bits=64)
    x64, y64 = F.coordinates(xs, ys)
    params64 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)
    u64 = C._ann_field(net, params64, (x64, y64))
    with F.eval_mode('compose'):
        ref_xy = np.asarray(diff(diff(u64, x64), y64).value)
        ref_xxy = np.asarray(diff(diff(u64, x64, 2), y64).value)
    jax.config.update('jax_enable_x64', False)
    set_tensor_type(float_bits=32)

    scale_xy = np.abs(ref_xy).max() + 1e-12
    scale_xxy = np.abs(ref_xxy).max() + 1e-12
    assert np.abs(u_xy - ref_xy).max() / scale_xy < 1e-4
    assert np.abs(u_xxy - ref_xxy).max() / scale_xxy < 1e-3


def test_short_convergence_f32():
    """Exponential decay end-to-end at f32: same config as the f64 suite's
    quick run; tolerance 3e-2 (f64 tier reaches ~2e-3 at equal epochs)."""
    from neurodiffeq_tpu.solvers import Solver1D
    solver = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[C.IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
        nets=[FCNN(actv=SinActv)],
    )
    solver.fit(max_epochs=800, tqdm_file=None)
    assert solver.params[0]['layers'][0]['W'].dtype == jnp.float32
    ts = np.linspace(0, 2, 100)
    err = np.abs(np.asarray(solver.get_solution()(ts)) - np.exp(-ts)).max()
    assert err < 3e-2, f"f32 convergence regression: {err}"


def test_lotka_volterra_convergence_f32():
    """The README Lotka-Volterra exemplar (BASELINE config 1) end-to-end at
    the shipped f32 default: max err vs scipy odeint < 4e-2 at 3000 epochs
    (the f64 benchmark run reaches ~1.1e-2; f32 costs a small constant
    factor on this oscillatory system, pinned here against regressions)."""
    from scipy.integrate import odeint
    from neurodiffeq_tpu.solvers import Solver1D
    solver = Solver1D(
        ode_system=lambda u, v, t: [diff(u, t) - (u - u * v),
                                    diff(v, t) - (u * v - v)],
        conditions=[C.IVP(t_0=0.1, u_0=1.5), C.IVP(t_0=0.1, u_0=1.0)],
        t_min=0.1, t_max=12.0,
        nets=[FCNN(actv=SinActv), FCNN(actv=SinActv)],
    )
    solver.fit(max_epochs=3000, tqdm_file=None)
    assert solver.params[0]['layers'][0]['W'].dtype == jnp.float32
    ts = np.linspace(0.1, 12, 200)
    ref = odeint(lambda s, t: [s[0] - s[0] * s[1], s[0] * s[1] - s[1]],
                 [1.5, 1.0], ts)
    prey, pred = solver.get_solution()(ts, to_numpy=True)
    err = max(np.abs(prey - ref[:, 0]).max(), np.abs(pred - ref[:, 1]).max())
    assert err < 4e-2, f"f32 LV convergence regression: {err}"


def test_laplace2d_flagship_convergence_f32():
    """The flagship 2-D Laplace Dirichlet config (BASELINE config 2, the
    bench.py headline) end-to-end at f32: max err vs the analytic solution
    < 1e-2 at 1500 epochs (the f64 run reaches ~1.3e-3 at 2000; the f32
    floor on this harmonic problem is ~a few e-3)."""
    from neurodiffeq_tpu.solvers import Solver2D
    from neurodiffeq_tpu.generators import Generator2D
    cond = C.DirichletBVP2D(
        x_min=0.0, x_min_val=lambda y: 0 * y,
        x_max=1.0, x_max_val=lambda y: 0 * y,
        y_min=0.0, y_min_val=lambda x: F.sin(np.pi * x),
        y_max=1.0, y_max_val=lambda x: 0 * x,
    )
    solver = Solver2D(
        pde_system=lambda u, x, y: [diff(u, x, 2) + diff(u, y, 2)],
        conditions=[cond],
        xy_min=(0, 0), xy_max=(1, 1),
        nets=[FCNN(2, 1, hidden_units=(512,))],
        train_generator=Generator2D((32, 32), (0, 0), (1, 1),
                                    method='equally-spaced-noisy'),
        valid_generator=Generator2D((32, 32), (0, 0), (1, 1),
                                    method='equally-spaced'),
        n_batches_valid=0,
    )
    solver.fit(max_epochs=1500, tqdm_file=None)
    assert solver.params[0]['layers'][0]['W'].dtype == jnp.float32
    rs = np.random.RandomState(3)
    xs, ys = rs.rand(300), rs.rand(300)
    expected = np.sin(np.pi * xs) * np.sinh(np.pi * (1 - ys)) / np.sinh(np.pi)
    err = np.abs(np.asarray(solver.get_solution()(xs, ys)) - expected).max()
    assert err < 1e-2, f"f32 flagship convergence regression: {err}"


def test_deep_ritz_halton_convergence_f32():
    """Deep Ritz ('variational' loss) + 'halton' QMC sampling at the shipped
    f32 default: 1-D Poisson energy minimization converges (f64 reaches
    ~0.03 at 2000 epochs; the f32 energy estimate adds rounding noise on
    the near-cancelling f*u sum, so the bar is 0.1)."""
    import optax
    from neurodiffeq_tpu.solvers import Solver1D
    from neurodiffeq_tpu.generators import Generator1D

    pi = np.pi
    solver = Solver1D(
        ode_system=lambda u, x: [0.5 * diff(u, x) ** 2
                                 - (pi ** 2) * F.sin(pi * x) * u],
        conditions=[C.DirichletBVP(0.0, 0.0, 1.0, 0.0)],
        t_min=0.0, t_max=1.0, loss_fn='variational',
        optimizer=optax.adam(1e-3),
        train_generator=Generator1D(64, 0.0, 1.0, method='halton'),
        valid_generator=Generator1D(64, 0.0, 1.0, method='equally-spaced'),
    )
    solver.fit(max_epochs=2000, tqdm_file=None)
    assert solver.params[0]['layers'][0]['W'].dtype == jnp.float32
    ts = np.linspace(0, 1, 101)
    err = np.abs(np.asarray(solver.get_solution(best=False)(ts))
                 - np.sin(pi * ts)).max()
    assert err < 0.1, f"f32 Deep Ritz convergence regression: {err}"
    assert float(solver.metrics_history['valid_loss'][-1]) < 0
