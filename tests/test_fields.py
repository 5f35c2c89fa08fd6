"""Tests for the Field autodiff primitive (parity with the reference's
`diff` semantics, tests/test_neurodiffeq.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff, safe_diff, unsafe_diff
from neurodiffeq_tpu.networks import FCNN

N = 100


@pytest.fixture
def t():
    (t,) = F.coordinates(np.linspace(0.1, 2.0, N))
    return t


def test_diff_orders(t):
    u = F.sin(t) * F.exp(-t)
    tv = np.asarray(t.value)
    assert np.allclose(diff(u, t).value, np.exp(-tv) * (np.cos(tv) - np.sin(tv)), atol=1e-10)
    assert np.allclose(diff(u, t, 2).value, -2 * np.exp(-tv) * np.cos(tv), atol=1e-9)
    assert np.allclose(diff(u, t, 3).value, 2 * np.exp(-tv) * (np.cos(tv) + np.sin(tv)), atol=1e-8)
    # diff of diff equals higher order
    assert np.allclose(diff(diff(u, t), t).value, diff(u, t, 2).value, atol=1e-10)


def test_diff_methods_agree(t):
    u = F.tanh(t) * t ** 2
    for order in (2, 3, 4):
        F.set_diff_method('jvp')
        via_jvp = np.asarray(diff(u, t, order).value)
        F.set_diff_method('jet')
        via_jet = np.asarray(diff(u, t, order).value)
        F.set_diff_method('auto')
        via_auto = np.asarray(diff(u, t, order).value)
        assert np.allclose(via_jvp, via_jet, atol=1e-8)
        assert np.allclose(via_jvp, via_auto, atol=1e-8)


def test_disconnected_derivative_is_zero():
    x, y = F.coordinates(np.random.rand(N), np.random.rand(N))
    u = F.sin(x)
    assert np.allclose(diff(u, y).value, 0.0)


def test_shape_check():
    x, y = F.coordinates(np.random.rand(N), np.random.rand(N))
    u = F.cat([x, y])  # (N, 2)
    with pytest.raises(ValueError):
        safe_diff(u, x)
    # unsafe diff works elementwise on multi-column fields
    d = unsafe_diff(u, x)
    assert d.shape == (N, 2)
    assert np.allclose(d.value[:, 0], 1.0)
    assert np.allclose(d.value[:, 1], 0.0)


def test_deprecated_x_alias():
    t, = F.coordinates(np.random.rand(N))
    u = t ** 2
    with pytest.warns(FutureWarning):
        d = diff(x=u, t=t)
    assert np.allclose(d.value, 2 * t.value)
    with pytest.warns(FutureWarning):
        safe_diff(x=u, t=t)
    with pytest.warns(FutureWarning):
        unsafe_diff(x=u, t=t)


def test_diff_requires_field_types():
    x, = F.coordinates(np.random.rand(N))
    with pytest.raises(TypeError):
        diff(np.random.rand(N, 1), x)
    with pytest.raises(TypeError):
        diff(x * 2, np.random.rand(N, 1))


def test_cross_coordset_rejected():
    x, = F.coordinates(np.random.rand(N))
    y, = F.coordinates(np.random.rand(N))
    with pytest.raises(ValueError):
        _ = x + y


def test_arithmetic_and_dispatch():
    x, y = F.coordinates(np.random.rand(N), np.random.rand(N))
    xv, yv = np.asarray(x.value), np.asarray(y.value)
    assert np.allclose((x + y).value, xv + yv)
    assert np.allclose((x - 2 * y).value, xv - 2 * yv)
    assert np.allclose((x / (1 + y)).value, xv / (1 + yv))
    assert np.allclose((x ** 3).value, xv ** 3)
    assert np.allclose((-x).value, -xv)
    assert np.allclose(abs(x - 0.5).value, np.abs(xv - 0.5))
    # numpy / jnp on the left defer to Field's reflected ops
    assert np.allclose((np.float64(2.0) * x).value, 2 * xv)
    assert np.allclose((jnp.asarray(3.0) + x).value, 3 + xv)
    # per-sample plain arrays act as constants w.r.t. coordinates
    arr = np.random.rand(N, 1)
    h = x * arr
    assert np.allclose(h.value, xv * arr)
    assert np.allclose(diff(h, x).value, arr)


def test_pin_anchors_are_constant_in_pinned_direction():
    x, y = F.coordinates(np.random.rand(N), np.random.rand(N))
    f = x * x * y
    g = F.pin(f, 0, 0.5)
    assert np.allclose(g.value, 0.25 * y.value)
    # the anchor is an independent leaf: constant w.r.t. x (torch semantics)
    assert np.allclose(diff(g, x).value, 0.0)
    assert np.allclose(diff(g, y).value, 0.25)
    # derivative AT the anchor comes from pin(..., derivative_order=k)
    d1 = F.pin(f, 0, 0.5, derivative_order=1)
    assert np.allclose(d1.value, 2 * 0.5 * y.value)
    assert np.allclose(diff(d1, x).value, 0.0)
    assert np.allclose(diff(d1, y).value, 2 * 0.5)
    d2 = F.pin(f, 0, 0.5, derivative_order=2)
    assert np.allclose(d2.value, 2 * y.value)


def test_field_through_network():
    net = FCNN(n_input_units=2, n_output_units=1, hidden_units=(16, 16))
    params = net.init(jax.random.PRNGKey(0))
    x, y = F.coordinates(np.random.rand(N), np.random.rand(N))
    u = F.network_field(lambda xs: net.apply(params, xs), (x, y))
    assert u.shape == (N, 1)
    du = diff(u, x)
    # finite-difference check of du/dx
    eps = 1e-6
    pts = np.stack([x.value[:, 0], y.value[:, 0]], axis=1)
    up = net.apply(params, pts + np.array([eps, 0.0]))
    um = net.apply(params, pts - np.array([eps, 0.0]))
    fd = (up - um) / (2 * eps)
    assert np.allclose(du.value, fd, atol=1e-6)


def test_cat_and_slicing():
    x, y = F.coordinates(np.random.rand(N), np.random.rand(N))
    c = F.cat([x, y, x * y])
    assert c.shape == (N, 3)
    assert np.allclose(c[:, 2:3].value, (x * y).value)
    assert np.allclose(c[:, 0].value, x.value[:, 0:1])
    assert np.allclose(c.sum(axis=1, keepdims=True).value, x.value + y.value + (x * y).value)
    # regression: u[:, -1] must select the last column on the per-sample fn
    # path too ([-1:0] is empty), consistently with the Taylor slice_series path
    last = c[:, -1]
    assert last.shape == (N, 1)
    assert np.allclose(last.value, (x * y).value)
    assert np.allclose(diff(last, x).value, y.value)


def test_no_silent_array_conversion():
    x, = F.coordinates(np.random.rand(N))
    with pytest.raises(TypeError):
        jnp.exp(x)  # must fail loudly instead of severing differentiability


def test_reductions():
    x, = F.coordinates(np.random.rand(N))
    assert np.isclose(x.mean(), np.asarray(x.value).mean())
    assert np.isclose((x ** 2).sum(), (np.asarray(x.value) ** 2).sum())


def test_composite_fused_expression():
    net = FCNN(n_input_units=2, n_output_units=1, hidden_units=(8, 8))
    params = net.init(jax.random.PRNGKey(3))
    x, y = F.coordinates(np.random.rand(N), np.random.rand(N))
    from neurodiffeq_tpu.conditions import _ann_field
    u = _ann_field(net, params, (x, y))

    fused = F.composite(lambda u_, x_, y_: jnp.exp(-u_) * jnp.sin(x_) + y_ ** 2, u, x, y)
    ref = F.exp(-u) * F.sin(x) + y ** 2
    assert np.allclose(fused.value, ref.value, atol=1e-12)
    # derivatives through the composite match the op-by-op expression
    assert np.allclose(diff(fused, x).value, diff(ref, x).value, atol=1e-8)
    assert np.allclose(diff(fused, y, 2).value, diff(ref, y, 2).value, atol=1e-8)


def test_works_under_jit():
    def loss(pts):
        x, y = F.coords_from_points(pts)
        u = F.sin(x) * F.cos(y)
        lap = diff(u, x, 2) + diff(u, y, 2)
        return ((lap.value + 2 * u.value) ** 2).mean()

    pts = jnp.asarray(np.random.rand(64, 2))
    assert jax.jit(loss)(pts) < 1e-20
