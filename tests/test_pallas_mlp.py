"""Fused Pallas Taylor-MLP kernel tests (interpreter mode on CPU): numerical
equivalence with the pure-JAX series propagation, gradient flow through the
custom VJP, and end-to-end solver training with the kernel enabled."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neurodiffeq_tpu.networks import FCNN
from neurodiffeq_tpu.ops.pallas_mlp import (
    fcnn_taylor_pallas, _pure_jax_taylor, enable_pallas, disable_pallas, pallas_enabled,
)
from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.conditions import IVP, _ann_field
from neurodiffeq_tpu.solvers import Solver1D
from neurodiffeq_tpu.utils import set_seed


@pytest.fixture(autouse=True)
def _pallas_off_after():
    yield
    disable_pallas()


def _flat(params):
    return tuple(x for lp in params['layers'] for x in (lp['W'], lp['b']))


@pytest.mark.parametrize("hidden,order", [((32,), 2), ((32, 16), 2), ((8, 8, 8), 2),
                                          ((32,), 1), ((32,), 0)])
def test_kernel_matches_pure_jax(hidden, order):
    net = FCNN(2, 3, hidden_units=hidden)
    params = net.init(jax.random.PRNGKey(0))
    pts = jnp.asarray(np.random.rand(100, 2), jnp.float32)
    out = fcnn_taylor_pallas(pts, params['layers'], order=order, n_dirs=2, interpret=True)
    ref = _pure_jax_taylor(pts, _flat(params), len(hidden) + 1, order, 2)
    assert len(out) == order + 1
    for o, r in zip(out, ref):
        assert np.allclose(np.asarray(o), np.asarray(r), atol=1e-5)


def test_single_linear_layer():
    net = FCNN(3, 2, hidden_units=())
    params = net.init(jax.random.PRNGKey(0))
    pts = jnp.asarray(np.random.rand(50, 3), jnp.float32)
    c0, c1, c2 = fcnn_taylor_pallas(pts, params['layers'], order=2, n_dirs=3, interpret=True)
    W = params['layers'][0]['W']
    assert np.allclose(np.asarray(c0), np.asarray(pts @ W + params['layers'][0]['b']), atol=1e-6)
    for d in range(3):
        assert np.allclose(np.asarray(c1[d]), np.asarray(W[d]), atol=1e-6)
    assert np.allclose(np.asarray(c2), 0.0)


def test_non_tile_multiple_batch():
    net = FCNN(2, 1, hidden_units=(16,))
    params = net.init(jax.random.PRNGKey(0))
    pts = jnp.asarray(np.random.rand(173, 2), jnp.float32)  # prime-ish size
    out = fcnn_taylor_pallas(pts, params['layers'], order=2, n_dirs=2, tile=64, interpret=True)
    ref = _pure_jax_taylor(pts, _flat(params), 2, 2, 2)
    for o, r in zip(out, ref):
        assert o.shape == r.shape
        assert np.allclose(np.asarray(o), np.asarray(r), atol=1e-5)


def test_gradients_match():
    net = FCNN(2, 1, hidden_units=(16, 16))
    params = net.init(jax.random.PRNGKey(0))
    pts = jnp.asarray(np.random.rand(64, 2), jnp.float32)

    def loss_pallas(p):
        c0, c1, c2 = fcnn_taylor_pallas(pts, p['layers'], order=2, n_dirs=2, interpret=True)
        return ((c2.sum(0) + c0) ** 2).mean()

    def loss_ref(p):
        c0, c1, c2 = _pure_jax_taylor(pts, _flat(p), 3, 2, 2)
        return ((c2.sum(0) + c0) ** 2).mean()

    g1 = jax.grad(loss_pallas)(params)
    g2 = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_field_evaluation_uses_kernel():
    enable_pallas(interpret=True)
    assert pallas_enabled()
    net = FCNN(2, 1, hidden_units=(16,))
    params = net.init(jax.random.PRNGKey(0))
    x, y = F.coordinates(np.random.rand(40), np.random.rand(40))
    u = _ann_field(net, params, (x, y))
    lap_pallas = np.asarray((diff(u, x, 2) + diff(u, y, 2)).value)

    disable_pallas()
    x, y = F.coordinates(x.value[:, 0], y.value[:, 0])
    u = _ann_field(net, params, (x, y))
    lap_plain = np.asarray((diff(u, x, 2) + diff(u, y, 2)).value)
    assert np.allclose(lap_pallas, lap_plain, atol=1e-4)


def test_end_to_end_training_with_pallas():
    enable_pallas(interpret=True)
    set_seed(11)
    solver = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
    )
    solver.fit(max_epochs=300, tqdm_file=None)
    sol = solver.get_solution()
    ts = np.linspace(0, 2, 30)
    err = np.abs(np.asarray(sol(ts)) - np.exp(-ts)).max()
    assert err < 5e-2, f"training with pallas kernel failed to converge: {err}"


def test_sin_activation_matches_taylor_engine():
    """The sin-activation kernel (round 3: the LV tiny-shape regime uses
    SinActv nets) must agree with the batched Taylor engine."""
    import numpy as np
    from neurodiffeq_tpu import fields as F
    from neurodiffeq_tpu.conditions import _ann_field
    from neurodiffeq_tpu.networks import FCNN, SinActv

    net = FCNN(1, 1, hidden_units=(16, 16), actv=SinActv)
    params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64),
                          net.init(jax.random.PRNGKey(0)))
    pts = jnp.asarray(np.random.RandomState(0).rand(32, 1))

    out = fcnn_taylor_pallas(pts, params['layers'], order=2, n_dirs=1,
                             interpret=True, actv='sin')
    ref = _pure_jax_taylor(pts, _flat(params), 3, 2, 1, actv='sin')
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-10)

    # and the pure-jax sin path agrees with the generic Taylor engine
    t, = F.coordinates(np.asarray(pts).flatten())
    u = _ann_field(net, params, (t,))
    from neurodiffeq_tpu.fields import diff
    d2 = np.asarray(diff(u, t, 2).value)
    np.testing.assert_allclose(np.asarray(ref[2][0]), d2, atol=1e-8)


def test_siren_uses_kernel_and_matches_plain_taylor():
    """SIREN folds w0 into the affine layers and delegates to the FCNN
    Taylor path, so with pallas enabled its derivatives come from the fused
    sin kernel; they must match the plain (pallas-off) Taylor engine."""
    from neurodiffeq_tpu.networks import SIREN

    net = SIREN(n_input_units=2, n_output_units=1, hidden_units=(16, 16), w0=4.0)
    params = net.init(jax.random.PRNGKey(5))
    pts = np.random.RandomState(3).rand(40, 2)

    enable_pallas(interpret=True)
    x, y = F.coordinates(pts[:, 0], pts[:, 1])
    u = _ann_field(net, params, (x, y))
    lap_pallas = np.asarray((diff(u, x, 2) + diff(u, y, 2)).value)

    disable_pallas()
    x, y = F.coordinates(pts[:, 0], pts[:, 1])
    u = _ann_field(net, params, (x, y))
    lap_plain = np.asarray((diff(u, x, 2) + diff(u, y, 2)).value)
    assert np.allclose(lap_pallas, lap_plain, atol=1e-4)
    assert np.abs(lap_plain).max() > 0
