"""Multi-device sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4:
the TPU-native equivalent of the reference's nonexistent distributed layer)."""
import numpy as np
import pytest
import jax

from neurodiffeq_tpu.parallel import make_mesh, shard_points
from neurodiffeq_tpu.solvers import Solver1D
from neurodiffeq_tpu.conditions import IVP
from neurodiffeq_tpu.generators import Generator1D
from neurodiffeq_tpu.fields import diff

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")


def test_make_mesh():
    mesh = make_mesh()
    assert mesh.axis_names == ('points',)
    assert mesh.devices.size == len(jax.devices())
    mesh4 = make_mesh(n_devices=4)
    assert mesh4.devices.size == 4


def test_shard_points_under_jit():
    mesh = make_mesh()
    n = 8 * 16

    @jax.jit
    def f(pts):
        pts = shard_points(pts, mesh)
        return (pts ** 2).sum()

    out = f(np.random.rand(n, 2))
    assert np.isfinite(float(out))


def test_sharded_solver_trains_and_matches_unsharded_structure():
    mesh = make_mesh()
    n_dev = mesh.devices.size
    solver = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
        train_generator=Generator1D(16 * n_dev, 0, 2, method='equally-spaced-noisy'),
        valid_generator=Generator1D(16 * n_dev, 0, 2, method='equally-spaced'),
        mesh=mesh,
    )
    solver.fit(max_epochs=300, tqdm_file=None)
    sol = solver.get_solution()
    ts = np.linspace(0, 2, 50)
    err = np.abs(np.asarray(sol(ts)) - np.exp(-ts)).max()
    assert err < 5e-2, f"sharded training failed to converge: {err}"


def test_sharded_2d_full_train_step():
    """The dryrun_multichip path: full train step jitted over the mesh."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge
    ge.dryrun_multichip(len(jax.devices()))


def test_sharded_loss_matches_unsharded():
    """Numerical equivalence: same params + same points => same loss value
    with and without the mesh constraint."""
    mesh = make_mesh()
    n_dev = mesh.devices.size

    common = dict(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
        train_generator=Generator1D(8 * n_dev, 0, 2, method='equally-spaced'),
        valid_generator=Generator1D(8 * n_dev, 0, 2, method='equally-spaced'),
        key=jax.random.PRNGKey(7),
    )
    s_plain = Solver1D(**common)
    s_mesh = Solver1D(**common, mesh=mesh)
    # identical init
    for a, b in zip(jax.tree.leaves(s_plain.params), jax.tree.leaves(s_mesh.params)):
        assert np.allclose(np.asarray(a), np.asarray(b))

    cols = [np.linspace(0, 2, 8 * n_dev).reshape(-1, 1)]
    loss_plain, _ = s_plain._loss_and_metrics(s_plain.params, cols)
    loss_mesh, _ = jax.jit(s_mesh._loss_and_metrics)(s_mesh.params, cols)
    assert np.isclose(float(loss_plain), float(loss_mesh), rtol=1e-10)


def test_sharded_grads_match_unsharded():
    """The quantity that actually diverges under a misplaced psum is the
    GRADIENT: assert per-leaf allclose sharded vs unsharded at identical
    points and params."""
    mesh = make_mesh()
    n_dev = mesh.devices.size

    common = dict(
        ode_system=lambda u, t: [diff(u, t, 2) + diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
        train_generator=Generator1D(8 * n_dev, 0, 2, method='equally-spaced'),
        valid_generator=Generator1D(8 * n_dev, 0, 2, method='equally-spaced'),
        key=jax.random.PRNGKey(7),
    )
    s_plain = Solver1D(**common)
    s_mesh = Solver1D(**common, mesh=mesh)

    cols = [np.linspace(0, 2, 8 * n_dev).reshape(-1, 1)]

    def loss_of(solver):
        return lambda p: solver._loss_and_metrics(p, cols)[0]

    g_plain = jax.grad(loss_of(s_plain))(s_plain.params)
    g_mesh = jax.jit(jax.grad(loss_of(s_mesh)))(s_mesh.params)
    leaves_p, treedef_p = jax.tree.flatten(g_plain)
    leaves_m, treedef_m = jax.tree.flatten(g_mesh)
    assert treedef_p == treedef_m
    for lp, lm in zip(leaves_p, leaves_m):
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lm), rtol=1e-10, atol=1e-12)


def test_2d_mesh_megatron_shardings():
    """make_mesh(model_axis_size=2) builds a (points, model) mesh and
    megatron_param_shardings splits even-layer output / odd-layer input."""
    from jax.sharding import PartitionSpec as P
    from neurodiffeq_tpu.parallel import megatron_param_shardings
    from neurodiffeq_tpu.networks import FCNN
    mesh = make_mesh(model_axis_size=2)
    assert mesh.axis_names == ('points', 'model')
    assert mesh.devices.shape == (len(jax.devices()) // 2, 2)

    net = FCNN(n_input_units=2, n_output_units=1, hidden_units=(8, 8))
    params = net.init(jax.random.PRNGKey(0))
    sh = megatron_param_shardings(params, mesh)
    assert sh['layers'][0]['W'].spec == P(None, 'model')   # split out cols
    assert sh['layers'][0]['b'].spec == P('model')
    assert sh['layers'][1]['W'].spec == P('model', None)   # split in rows
    assert sh['layers'][1]['b'].spec == P()
    assert sh['layers'][2]['W'].spec == P(None, 'model') or \
        sh['layers'][2]['W'].spec == P()  # (8,1): out dim 1 not divisible -> replicated


def test_tensor_parallel_loss_and_grads_match_unsharded():
    """DP x TP (points x model) training signal must equal the unsharded one:
    per-leaf gradient allclose at identical params and points."""
    mesh = make_mesh(model_axis_size=2)
    n_dp = mesh.shape['points']

    common = dict(
        ode_system=lambda u, t: [diff(u, t, 2) + diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
        train_generator=Generator1D(8 * n_dp, 0, 2, method='equally-spaced'),
        valid_generator=Generator1D(8 * n_dp, 0, 2, method='equally-spaced'),
        key=jax.random.PRNGKey(7),
    )
    s_plain = Solver1D(**common)
    s_mesh = Solver1D(**common, mesh=mesh)

    # identical initial params by construction (same key), different layouts
    for lp, lm in zip(jax.tree.leaves(s_plain.params), jax.tree.leaves(s_mesh.params)):
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lm), rtol=0, atol=0)

    cols = [np.linspace(0, 2, 8 * n_dp).reshape(-1, 1)]

    def loss_of(solver):
        return lambda p: solver._loss_and_metrics(p, cols)[0]

    g_plain = jax.grad(loss_of(s_plain))(s_plain.params)
    with mesh:
        g_mesh = jax.jit(jax.grad(loss_of(s_mesh)))(s_mesh.params)
    for lp, lm in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_mesh)):
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lm), rtol=1e-10, atol=1e-12)


def test_tensor_parallel_full_train_step():
    """One full fit() epoch runs and produces finite loss on the 2-D mesh."""
    mesh = make_mesh(model_axis_size=2)
    n_dp = mesh.shape['points']
    solver = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
        train_generator=Generator1D(8 * n_dp, 0, 2, method='equally-spaced-noisy'),
        valid_generator=Generator1D(8 * n_dp, 0, 2, method='equally-spaced'),
        mesh=mesh,
    )
    solver.fit(max_epochs=3, tqdm_file=None)
    assert np.isfinite(solver.metrics_history['train_loss'][-1])


def test_tensor_parallel_grad_accumulation_matches_unsharded():
    """TP composed with gradient accumulation (n_batches_train=2): one full
    epoch (2 summed gradient passes + 1 Adam step) from identical inits and
    PRNG keys must land on per-leaf identical params sharded vs unsharded."""
    mesh = make_mesh(model_axis_size=2)
    n_dp = mesh.shape['points']

    def build(m):
        return Solver1D(
            ode_system=lambda u, t: [diff(u, t, 2) + diff(u, t) + u],
            conditions=[IVP(t_0=0.0, u_0=1.0)],
            t_min=0.0, t_max=2.0,
            train_generator=Generator1D(8 * n_dp, 0, 2, method='equally-spaced-noisy'),
            valid_generator=Generator1D(8 * n_dp, 0, 2, method='equally-spaced'),
            n_batches_train=2,
            key=jax.random.PRNGKey(7),
            mesh=m,
        )

    s_plain = build(None)
    s_mesh = build(mesh)
    key = jax.random.PRNGKey(123)

    def one_epoch(solver):
        fn = solver._get_compiled('train_epoch', solver._build_train_epoch)
        params, _, loss, _ = fn(solver.params, solver.opt_state, key)
        return params, loss

    p_plain, l_plain = one_epoch(s_plain)
    p_mesh, l_mesh = one_epoch(s_mesh)
    assert np.isclose(float(l_plain), float(l_mesh), rtol=1e-10)
    for lp, lm in zip(jax.tree.leaves(p_plain), jax.tree.leaves(p_mesh)):
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lm), rtol=1e-9, atol=1e-12)


def test_sharded_solver_with_adaptive_generator():
    """Adaptive selection (oversample + gather) must compose with the points
    mesh: the scorer's forward runs sharded, the selected batch re-shards."""
    from neurodiffeq_tpu.generators import ResidualAdaptiveGenerator
    from neurodiffeq_tpu.utils import set_seed
    set_seed(0)
    mesh = make_mesh()
    n = 8 * 8
    solver = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u], conditions=[IVP(0, 1)],
        t_min=0.0, t_max=2.0, mesh=mesh,
        train_generator=ResidualAdaptiveGenerator(
            Generator1D(n, 0.0, 2.0, method='uniform'), oversample=4),
        valid_generator=Generator1D(n, 0.0, 2.0, method='equally-spaced'),
        n_batches_valid=0,
    )
    solver.fit(max_epochs=150, tqdm_file=None)
    hist = solver.metrics_history['train_loss']
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]


def test_sharded_chunked_pipelined_fit_with_callbacks_matches_unsharded():
    """The round-3 fit machinery (fire-boundary chunking, speculative
    pipelining, lazy history commits) composed with a points mesh: callback
    fire epochs, what the callback reads from the (lazily synced) history,
    and the full loss trajectory must all match the unsharded run."""
    from neurodiffeq_tpu import callbacks as cb

    mesh = make_mesh()
    n_dev = mesh.devices.size

    class HistoryReader(cb.ActionCallback):
        """Monitor-style action: reads the history at every fire (forcing a
        lazy-history flush mid-fit)."""

        def __init__(self):
            super().__init__()
            self.fired_at = []
            self.loss_seen = []

        def __call__(self, solver):
            self.fired_at.append(solver.local_epoch)
            self.loss_seen.append(solver.metrics_history['train_loss'][-1])

    def run(m):
        solver = Solver1D(
            ode_system=lambda u, t: [diff(u, t) + u],
            conditions=[IVP(t_0=0.0, u_0=1.0)],
            t_min=0.0, t_max=2.0,
            train_generator=Generator1D(16 * n_dev, 0, 2, method='equally-spaced'),
            valid_generator=Generator1D(16 * n_dev, 0, 2, method='equally-spaced'),
            key=jax.random.PRNGKey(7),
            mesh=m,
        )
        rec = HistoryReader()
        solver.fit(max_epochs=350,
                   callbacks=[rec.conditioned_on(cb.PeriodLocal(period=100))],
                   tqdm_file=None, pipeline=True)
        return rec, solver

    rec_mesh, s_mesh = run(mesh)
    rec_plain, s_plain = run(None)

    # reference cadence (solvers.py:496-497 + callbacks.py PeriodLocal)
    assert rec_mesh.fired_at == rec_plain.fired_at == [100, 200, 300]
    # chunking actually happened (fires bound the scans) on BOTH runs
    assert s_mesh._fit_chunk_sizes == s_plain._fit_chunk_sizes
    assert len(s_mesh._fit_chunk_sizes) >= 4
    # speculative pipelining engaged and nothing was discarded
    assert s_mesh._fit_spec_hits > 0 and s_mesh._fit_spec_misses == 0
    # trajectory equality: deterministic points => same training signal
    np.testing.assert_allclose(rec_mesh.loss_seen, rec_plain.loss_seen,
                               rtol=1e-8)
    np.testing.assert_allclose(s_mesh.metrics_history['train_loss'],
                               s_plain.metrics_history['train_loss'],
                               rtol=1e-8)


def test_sharded_residual_weights_match_unsharded():
    """Static residual weights are pure column scaling — sharded and
    unsharded losses must agree to fp tolerance at identical params/points."""
    from neurodiffeq_tpu.utils import set_seed

    def build(mesh):
        set_seed(7)
        return Solver1D(
            ode_system=lambda u, t: [diff(u, t) + u, 3.0 * (diff(u, t) + u)],
            conditions=[IVP(0, 1)], t_min=0.0, t_max=1.0, mesh=mesh,
            residual_weights=[0.25, 1.0],
            train_generator=Generator1D(8 * 8, 0.0, 1.0, method='equally-spaced'),
            valid_generator=Generator1D(8 * 8, 0.0, 1.0, method='equally-spaced'),
            n_batches_valid=0,
        )

    cols = [np.linspace(0.0, 1.0, 8 * 8).reshape(-1, 1)]
    s_plain = build(None)
    s_mesh = build(make_mesh())
    l_plain, _ = s_plain._loss_and_metrics(s_plain.params, cols)
    l_mesh, _ = s_mesh._loss_and_metrics(s_mesh.params, cols)
    assert np.isclose(float(l_plain), float(l_mesh), rtol=1e-10, atol=1e-12)


def test_causal_loss_matches_unsharded_on_mesh():
    """The causal loss argsorts the time coordinate across the points axis —
    under a sharded mesh that forces cross-device gathers. Pin loss AND
    gradient equivalence sharded vs unsharded at identical params/points."""
    from neurodiffeq_tpu.losses import causal

    mesh = make_mesh()
    n_dev = mesh.devices.size
    common = dict(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
        loss_fn=causal(epsilon=2.0, n_bins=4),
        train_generator=Generator1D(8 * n_dev, 0, 2, method='equally-spaced'),
        valid_generator=Generator1D(8 * n_dev, 0, 2, method='equally-spaced'),
        key=jax.random.PRNGKey(7),
    )
    s_plain = Solver1D(**common)
    s_mesh = Solver1D(**common, mesh=mesh)

    # shuffled points so the argsort actually permutes across shards
    rng = np.random.RandomState(0)
    cols = [rng.permutation(np.linspace(0, 2, 8 * n_dev)).reshape(-1, 1)]
    loss_plain, _ = s_plain._loss_and_metrics(s_plain.params, cols)
    loss_mesh, _ = jax.jit(s_mesh._loss_and_metrics)(s_mesh.params, cols)
    assert np.isclose(float(loss_plain), float(loss_mesh), rtol=1e-8)

    g_plain = jax.grad(lambda p: s_plain._loss_and_metrics(p, cols)[0])(s_plain.params)
    g_mesh = jax.jit(jax.grad(lambda p: s_mesh._loss_and_metrics(p, cols)[0]))(s_mesh.params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_mesh)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-10)


# ---------------------------------------------------------------- round-4/5
# Mesh-parity coverage for the features added in round 4: every new
# training-path component must compose with the sharding layer provably
# (loss AND gradient equality sharded vs unsharded at identical
# params/points, or trajectory equality for generator-driven fits).


def _grad_parity(s_plain, s_mesh, cols, atol=1e-8):
    loss_plain, _ = s_plain._loss_and_metrics(s_plain.params, cols)
    loss_mesh, _ = jax.jit(s_mesh._loss_and_metrics)(s_mesh.params, cols)
    assert np.isclose(float(loss_plain), float(loss_mesh), rtol=1e-6), \
        f"loss mismatch: {float(loss_plain)} vs {float(loss_mesh)}"
    g_plain = jax.grad(lambda p: s_plain._loss_and_metrics(p, cols)[0])(s_plain.params)
    g_mesh = jax.jit(jax.grad(lambda p: s_mesh._loss_and_metrics(p, cols)[0]))(s_mesh.params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_mesh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


def test_stde_laplacian_matches_unsharded_on_mesh():
    """Sharded-semantics contract for the stochastic Laplacian: the probe key
    folds a GLOBAL reduction over the points buffer (`_stde_probe_key`'s
    `bits.sum()` — an order-independent uint32 wraparound sum, so GSPMD's
    psum over shards reproduces it exactly), making the probe stream
    shard-invariant: every device sees the same replicated probe directions
    it would see unsharded. Pin loss AND gradient parity on the mesh."""
    from neurodiffeq_tpu.solvers import GenericSolver
    from neurodiffeq_tpu.conditions import DirichletBoxND
    from neurodiffeq_tpu.generators import GeneratorHypercube
    from neurodiffeq_tpu.operators import stde_laplacian
    from neurodiffeq_tpu import fields as F

    mesh = make_mesh()
    n_dev = mesh.devices.size
    d = 3
    pde = lambda u, *xs: [stde_laplacian(u, *xs, n_est=4)
                          + sum(F.sin(np.pi * x) for x in xs)]
    common = dict(
        diff_eqs=pde,
        conditions=[DirichletBoxND(d)],
        train_generator=GeneratorHypercube(8 * n_dev, dim=d),
        valid_generator=GeneratorHypercube(8 * n_dev, dim=d),
        n_input_units=d, n_output_units=1, n_batches_valid=0,
        key=jax.random.PRNGKey(7),
    )
    s_plain = GenericSolver(**common)
    s_mesh = GenericSolver(**common, mesh=mesh)

    rng = np.random.RandomState(0)
    pts = rng.rand(8 * n_dev, d)
    cols = [pts[:, i:i + 1] for i in range(d)]
    _grad_parity(s_plain, s_mesh, cols)


def test_stde_biharmonic_matches_unsharded_on_mesh():
    """Same sharded-semantics contract as the Laplacian estimator, for the
    4th-order one: `_stde_probe_key`'s points digest is an order-independent
    global reduction, so the Rademacher probe-pair stream is shard-invariant
    and the clamped-plate loss/grad match the unsharded run exactly."""
    from neurodiffeq_tpu.solvers import GenericSolver
    from neurodiffeq_tpu.conditions import DirichletBoxND
    from neurodiffeq_tpu.generators import GeneratorHypercube
    from neurodiffeq_tpu.operators import stde_biharmonic
    from neurodiffeq_tpu import fields as F

    mesh = make_mesh()
    n_dev = mesh.devices.size
    d = 3
    pde = lambda u, *xs: [stde_biharmonic(u, *xs, n_est=2)
                          - sum(F.sin(np.pi * x) for x in xs) * np.pi ** 4 / d]
    common = dict(
        diff_eqs=pde,
        conditions=[DirichletBoxND(d, power=2)],
        train_generator=GeneratorHypercube(8 * n_dev, dim=d),
        valid_generator=GeneratorHypercube(8 * n_dev, dim=d),
        n_input_units=d, n_output_units=1, n_batches_valid=0,
        key=jax.random.PRNGKey(7),
    )
    s_plain = GenericSolver(**common)
    s_mesh = GenericSolver(**common, mesh=mesh)

    rng = np.random.RandomState(0)
    pts = rng.rand(8 * n_dev, d)
    cols = [pts[:, i:i + 1] for i in range(d)]
    _grad_parity(s_plain, s_mesh, cols)


def test_variational_loss_matches_unsharded_on_mesh():
    """Deep Ritz energy loss under the points mesh: the loss is a plain mean
    over the (sharded) points axis of a first-derivative density — parity of
    loss and gradient with the unsharded run."""
    from neurodiffeq_tpu import fields as F
    from neurodiffeq_tpu.conditions import DirichletBVP

    mesh = make_mesh()
    n_dev = mesh.devices.size
    # 1-D Poisson -u'' = pi^2 sin(pi t): energy density 0.5 u'^2 - f u
    density = lambda u, t: [0.5 * diff(u, t) ** 2
                            - (np.pi ** 2) * F.sin(np.pi * t) * u]
    common = dict(
        ode_system=density,
        conditions=[DirichletBVP(t_0=0.0, u_0=0.0, t_1=1.0, u_1=0.0)],
        t_min=0.0, t_max=1.0,
        loss_fn='variational',
        train_generator=Generator1D(8 * n_dev, 0, 1, method='uniform'),
        valid_generator=Generator1D(8 * n_dev, 0, 1, method='uniform'),
        key=jax.random.PRNGKey(7),
        n_batches_valid=0,
    )
    s_plain = Solver1D(**common)
    s_mesh = Solver1D(**common, mesh=mesh)
    rng = np.random.RandomState(1)
    cols = [rng.rand(8 * n_dev, 1)]
    _grad_parity(s_plain, s_mesh, cols)


@pytest.mark.parametrize('net_name', ['siren', 'fourier'])
def test_round4_nets_match_unsharded_on_mesh(net_name):
    """SIREN and FourierFCNN forward/backward under the points mesh: the nets
    are replicated, points sharded — loss/grad parity with unsharded."""
    from neurodiffeq_tpu.networks import SIREN, FourierFCNN

    mesh = make_mesh()
    n_dev = mesh.devices.size
    net = (SIREN(n_input_units=1, n_output_units=1, hidden_units=(16, 16), w0=5.0)
           if net_name == 'siren' else
           FourierFCNN(n_input_units=1, n_output_units=1, n_features=8,
                       sigma=1.0, hidden_units=(16,)))
    common = dict(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
        nets=[net],
        train_generator=Generator1D(8 * n_dev, 0, 2, method='equally-spaced'),
        valid_generator=Generator1D(8 * n_dev, 0, 2, method='equally-spaced'),
        key=jax.random.PRNGKey(7),
    )
    s_plain = Solver1D(**common)
    s_mesh = Solver1D(**common, mesh=mesh)
    rng = np.random.RandomState(2)
    cols = [2.0 * rng.rand(8 * n_dev, 1)]
    _grad_parity(s_plain, s_mesh, cols)


def test_halton_hypercube_fit_on_mesh_matches_unsharded():
    """GeneratorHypercube('halton') sampling inside the sharded fit: with the
    same solver key the scrambled-Halton point stream is identical sharded vs
    unsharded, so the full loss trajectory must match."""
    from neurodiffeq_tpu.solvers import GenericSolver
    from neurodiffeq_tpu.conditions import DirichletBoxND
    from neurodiffeq_tpu.generators import GeneratorHypercube
    from neurodiffeq_tpu.operators import laplacian
    from neurodiffeq_tpu import fields as F

    mesh = make_mesh()
    n_dev = mesh.devices.size
    d = 2

    def build(m):
        return GenericSolver(
            diff_eqs=lambda u, *xs: [laplacian(u, *xs)
                                     + sum(F.sin(np.pi * x) for x in xs)],
            conditions=[DirichletBoxND(d)],
            train_generator=GeneratorHypercube(8 * n_dev, dim=d, method='halton'),
            valid_generator=GeneratorHypercube(8 * n_dev, dim=d),
            n_input_units=d, n_output_units=1, n_batches_valid=0,
            key=jax.random.PRNGKey(11),
            mesh=m,
        )

    from neurodiffeq_tpu.utils import set_seed

    s_mesh = build(mesh)
    s_plain = build(None)
    # fit() draws its per-epoch sampling keys from the GLOBAL stream
    # (solvers.py `next_rng_key()`), and halton points are key-dependent —
    # pin the stream so both runs see identical point batches.
    set_seed(3)
    s_mesh.fit(max_epochs=40, tqdm_file=None)
    set_seed(3)
    s_plain.fit(max_epochs=40, tqdm_file=None)
    h_mesh = np.asarray(s_mesh.metrics_history['train_loss'])
    h_plain = np.asarray(s_plain.metrics_history['train_loss'])
    assert np.isfinite(h_mesh).all()
    np.testing.assert_allclose(h_mesh, h_plain, rtol=1e-5)
    assert h_mesh[-1] < h_mesh[0]
