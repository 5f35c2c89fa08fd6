"""Training-signal parity with the reference's torch-autograd semantics.

Builds the lid-driven-cavity hard-constraint formulation (the reference's
experiments/lid-driven-cavity-RE100.ipynb cell 3: shared FCNN(2->h->3),
trial functions with built-in boundary constraints, steady Navier-Stokes
residual) in BOTH frameworks with IDENTICAL parameters and points, and
asserts the loss and every parameter gradient agree to float64 round-off.

This is the strongest possible oracle for the whole differentiation stack:
field products of first/second derivatives, shared-network column selection,
condition reparameterization, and the loss — all must match torch's
create_graph autograd chain bit-for-bit (rtol ~1e-14).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff
from neurodiffeq_tpu.networks import FCNN
from neurodiffeq_tpu.conditions import BaseCondition
from neurodiffeq_tpu.utils import set_seed

torch = pytest.importorskip("torch")

N = 128
HIDDEN = 32
NU = 1.0 / 100.0


def _u_lid(x, exp):
    return (1 - exp(-50.0 * x)) * (1 - exp(50.0 * (x - 1)))


class _HardU(BaseCondition):
    def __init__(self):
        super().__init__()
        self.ith_unit = 0

    def parameterize(self, out, x, y):
        return x * (1 - x) * y * (1 - y) * out + y * _u_lid(x, F.exp)


class _HardV(BaseCondition):
    def __init__(self):
        super().__init__()
        self.ith_unit = 1

    def parameterize(self, out, x, y):
        return x * (1 - x) * y * (1 - y) * out


class _HardP(BaseCondition):
    def __init__(self):
        super().__init__()
        self.ith_unit = 2

    def parameterize(self, out, x, y):
        return (1 - F.exp(-x)) * (1 - F.exp(-y)) * out


def _jax_loss(params, net, conds, pts):
    cf = F.coords_from_points(jnp.concatenate(pts, axis=1))
    funcs = [c.enforce(net, params, *cf) for c in conds]
    u, v, p = funcs
    x, y = cf
    mom_x = (u * diff(u, x) + v * diff(u, y) + diff(p, x)
             - NU * (diff(u, x, 2) + diff(u, y, 2)))
    mom_y = (u * diff(v, x) + v * diff(v, y) + diff(p, y)
             - NU * (diff(v, x, 2) + diff(v, y, 2)))
    cont = diff(u, x) + diff(v, y)
    vals = jnp.concatenate([mom_x.value, mom_y.value, cont.value], axis=1)
    return (vals ** 2).mean()


def _torch_loss_and_grads(params, pts_np):
    torch.set_default_dtype(torch.float64)
    W0 = torch.tensor(np.asarray(params['layers'][0]['W'], np.float64), requires_grad=True)
    b0 = torch.tensor(np.asarray(params['layers'][0]['b'], np.float64), requires_grad=True)
    W1 = torch.tensor(np.asarray(params['layers'][1]['W'], np.float64), requires_grad=True)
    b1 = torch.tensor(np.asarray(params['layers'][1]['b'], np.float64), requires_grad=True)
    xx = torch.tensor(pts_np[:, 0], requires_grad=True)
    yy = torch.tensor(pts_np[:, 1], requires_grad=True)

    uvp = torch.tanh(torch.stack([xx, yy], dim=1) @ W0 + b0) @ W1 + b1
    u = xx * (1 - xx) * yy * (1 - yy) * uvp[:, 0] + yy * _u_lid(xx, torch.exp)
    v = xx * (1 - xx) * yy * (1 - yy) * uvp[:, 1]
    p = (1 - torch.exp(-xx)) * (1 - torch.exp(-yy)) * uvp[:, 2]

    def d(f, t):
        return torch.autograd.grad(f, t, grad_outputs=torch.ones_like(f),
                                   create_graph=True)[0]

    u_x, u_y = d(u, xx), d(u, yy)
    v_x, v_y = d(v, xx), d(v, yy)
    mom_x = u * u_x + v * u_y + d(p, xx) - NU * (d(u_x, xx) + d(u_y, yy))
    mom_y = u * v_x + v * v_y + d(p, yy) - NU * (d(v_x, xx) + d(v_y, yy))
    cont = u_x + v_y
    loss = torch.stack([mom_x, mom_y, cont], dim=1).pow(2).mean()
    loss.backward()
    return float(loss), {'W0': W0.grad.numpy(), 'b0': b0.grad.numpy(),
                         'W1': W1.grad.numpy(), 'b1': b1.grad.numpy()}


def test_navier_stokes_loss_and_grads_match_torch_bitwise():
    set_seed(0)
    net = FCNN(n_input_units=2, n_output_units=3, hidden_units=(HIDDEN,))
    params64 = jax.tree.map(
        lambda v: jnp.asarray(np.asarray(v, np.float64)),
        net.init(jax.random.PRNGKey(7), dtype=jnp.float32))
    conds = [_HardU(), _HardV(), _HardP()]
    pts_np = np.random.RandomState(11).rand(N, 2)
    pts = [jnp.asarray(pts_np[:, i:i + 1]) for i in range(2)]

    loss_jax, g_jax = jax.value_and_grad(
        lambda p: _jax_loss(p, net, conds, pts))(params64)
    loss_t, g_t = _torch_loss_and_grads(params64, pts_np)

    assert np.isclose(float(loss_jax), loss_t, rtol=1e-13)
    pairs = [
        (np.asarray(g_jax['layers'][0]['W']), g_t['W0']),
        (np.asarray(g_jax['layers'][0]['b']), g_t['b0']),
        (np.asarray(g_jax['layers'][1]['W']), g_t['W1']),
        (np.asarray(g_jax['layers'][1]['b']), g_t['b1']),
    ]
    for a, b in pairs:
        scale = np.abs(b).max()
        assert np.abs(a - b).max() < 1e-13 * max(scale, 1.0), (
            f"gradient mismatch: {np.abs(a - b).max()} vs scale {scale}")


def test_second_order_ode_grads_match_torch():
    """Same oracle on a damped-oscillator ODE residual with an IVP-style
    reparameterization (reference README workflow)."""
    net = FCNN(n_input_units=1, n_output_units=1, hidden_units=(16,))
    params64 = jax.tree.map(
        lambda v: jnp.asarray(np.asarray(v, np.float64)),
        net.init(jax.random.PRNGKey(3), dtype=jnp.float32))
    ts_np = np.linspace(0.0, 2.0, 64)

    def jax_loss(p):
        t, = F.coordinates(jnp.asarray(ts_np))
        ann = F.network_field(lambda xs: net.apply(p, xs), (t,))
        u = 1.0 + (1 - F.exp(-t)) * ann
        r = diff(u, t, 2) + 0.3 * diff(u, t) + u
        return (r.value ** 2).mean()

    loss_jax, g_jax = jax.value_and_grad(jax_loss)(params64)

    torch.set_default_dtype(torch.float64)
    W0 = torch.tensor(np.asarray(params64['layers'][0]['W']), requires_grad=True)
    b0 = torch.tensor(np.asarray(params64['layers'][0]['b']), requires_grad=True)
    W1 = torch.tensor(np.asarray(params64['layers'][1]['W']), requires_grad=True)
    b1 = torch.tensor(np.asarray(params64['layers'][1]['b']), requires_grad=True)
    t = torch.tensor(ts_np, requires_grad=True)
    ann = (torch.tanh(t[:, None] @ W0[0:1, :] + b0) @ W1 + b1)[:, 0]
    u = 1.0 + (1 - torch.exp(-t)) * ann

    def d(f, x):
        return torch.autograd.grad(f, x, grad_outputs=torch.ones_like(f),
                                   create_graph=True)[0]

    r = d(d(u, t), t) + 0.3 * d(u, t) + u
    loss_t = r.pow(2).mean()
    loss_t.backward()
    assert np.isclose(float(loss_jax), float(loss_t), rtol=1e-13)
    for a, b in [(np.asarray(g_jax['layers'][0]['W']), W0.grad.numpy()),
                 (np.asarray(g_jax['layers'][0]['b']), b0.grad.numpy()),
                 (np.asarray(g_jax['layers'][1]['W']), W1.grad.numpy()),
                 (np.asarray(g_jax['layers'][1]['b']), b1.grad.numpy())]:
        assert np.abs(a - b).max() < 1e-13 * max(np.abs(b).max(), 1.0)
