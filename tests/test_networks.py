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
