r"""Neural network modules as functional ``init``/``apply`` pairs.

Capability parity with the reference's ``neurodiffeq/networks.py`` (FCNN,
Resnet, MonomialNN; activations SinActv/Swish/APTx, ``networks.py:6-209``),
designed for JAX: a module is a stateless description; parameters are explicit
pytrees created by ``init(key)`` and consumed by ``apply(params, x)``. The
``apply`` functions operate on a single ``(n_in,)`` vector *or* any batched
leading shape, so the same module composes both into per-sample Fields (for
residual differentiation) and into batched MXU-friendly matmuls.

Weight initialization matches torch's ``nn.Linear`` default (uniform in
``[-1/sqrt(fan_in), 1/sqrt(fan_in)]`` for both W and b) so training dynamics
track the reference's.
"""
import warnings

import jax
import jax.numpy as jnp

__all__ = ['FCNN', 'Resnet', 'MonomialNN', 'FourierFCNN', 'SIREN',
           'Tanh', 'SinActv', 'Swish', 'APTx']


def _linear_init(key, n_in, n_out, dtype):
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(float(n_in)))
    W = jax.random.uniform(wkey, (n_in, n_out), dtype=dtype, minval=-bound, maxval=bound)
    b = jax.random.uniform(bkey, (n_out,), dtype=dtype, minval=-bound, maxval=bound)
    return {'W': W, 'b': b}


class Module:
    """Minimal stateless module protocol: ``init(key) -> params``, ``apply(params, x)``.

    Modules may additionally support **batched Taylor propagation** (the hot
    evaluation path, see :mod:`neurodiffeq_tpu.ops.taylor`): set
    ``supports_taylor`` and implement ``taylor_apply(params, series, ctx)``.
    Activations flag ``jet_safe = True`` when every primitive they use has a
    ``jax.experimental.jet`` rule.
    """

    supports_taylor = False
    jet_safe = False

    def init(self, key, dtype=None):
        raise NotImplementedError  # pragma: no cover

    def apply(self, params, x):
        raise NotImplementedError  # pragma: no cover

    def taylor_apply(self, params, series, ctx):
        raise NotImplementedError  # pragma: no cover

    def taylor_series(self, params, series, ctx):
        """Series propagation through this module as an elementwise op
        (activations); generic fallback uses jvp-derived partials."""
        from .ops.taylor import elementwise_series
        return elementwise_series(
            lambda x: self.apply(params, x), [series], ctx.order, ctx.n_dirs)

    def __call__(self, params, x):
        return self.apply(params, x)


# ------------------------------------------------------------------ activations

class Tanh(Module):
    """Hyperbolic tangent activation (the reference's default, ``nn.Tanh``)."""
    jet_safe = True

    def init(self, key, dtype=None):
        return None

    def apply(self, params, x):
        return jnp.tanh(x)

    def taylor_series(self, params, series, ctx):
        from .ops.taylor import elementwise_series
        return elementwise_series(jnp.tanh, [series], ctx.order, ctx.n_dirs)


class SinActv(Module):
    """The sin activation function (reference ``networks.py:142-152``)."""
    jet_safe = True

    def init(self, key, dtype=None):
        return None

    def apply(self, params, x):
        return jnp.sin(x)

    def taylor_series(self, params, series, ctx):
        from .ops.taylor import elementwise_series
        return elementwise_series(jnp.sin, [series], ctx.order, ctx.n_dirs)


class Swish(Module):
    jet_safe = True
    r"""Swish activation: ``x * sigmoid(beta * x)`` with optionally trainable beta
    (reference ``networks.py:155-175``)."""

    def __init__(self, beta=1.0, trainable=False):
        self.beta = float(beta)
        self.trainable = trainable

    def init(self, key, dtype=None):
        if self.trainable:
            return {'beta': jnp.asarray(self.beta, dtype=dtype or jnp.float32)}
        return None

    def apply(self, params, x):
        beta = params['beta'] if (self.trainable and params is not None) else self.beta
        return x * jax.nn.sigmoid(beta * x)

    def taylor_series(self, params, series, ctx):
        # closed forms: f = x s(bx); f' = s + bx s(1-s); f'' = 2bs(1-s) + b^2 x s(1-s)(1-2s)
        from .ops.taylor import TSeries, _chain_unary
        beta = params['beta'] if (self.trainable and params is not None) else self.beta
        x = series.c0
        s = jax.nn.sigmoid(beta * x)
        sp = s * (1 - s)
        c0 = x * s
        f1 = s + beta * x * sp
        f2 = 2 * beta * sp + beta * beta * x * sp * (1 - 2 * s)
        return _chain_unary(series, ctx.order, c0, f1, f2) if ctx.order else TSeries(c0, [])


class APTx(Module):
    jet_safe = True
    r"""APTx activation: ``(alpha + tanh(beta x)) * gamma * x``
    (reference ``networks.py:177-209``)."""

    def __init__(self, alpha=1.0, beta=1.0, gamma=0.5, trainable=False):
        self.alpha, self.beta, self.gamma = float(alpha), float(beta), float(gamma)
        self.trainable = trainable

    def init(self, key, dtype=None):
        if self.trainable:
            dtype = dtype or jnp.float32
            return {
                'alpha': jnp.asarray(self.alpha, dtype=dtype),
                'beta': jnp.asarray(self.beta, dtype=dtype),
                'gamma': jnp.asarray(self.gamma, dtype=dtype),
            }
        return None

    def apply(self, params, x):
        if self.trainable and params is not None:
            a, b, g = params['alpha'], params['beta'], params['gamma']
        else:
            a, b, g = self.alpha, self.beta, self.gamma
        return (a + jnp.tanh(b * x)) * g * x

    def taylor_series(self, params, series, ctx):
        # f = g x (a + t), t = tanh(bx); f' = g(a + t) + g x b (1 - t^2);
        # f'' = 2 g b (1 - t^2) - 2 g x b^2 t (1 - t^2)
        from .ops.taylor import TSeries, _chain_unary
        if self.trainable and params is not None:
            a, b, g = params['alpha'], params['beta'], params['gamma']
        else:
            a, b, g = self.alpha, self.beta, self.gamma
        x = series.c0
        t = jnp.tanh(b * x)
        tp = 1 - t * t
        c0 = g * x * (a + t)
        f1 = g * (a + t) + g * x * b * tp
        f2 = 2 * g * b * tp - 2 * g * x * b * b * t * tp
        return _chain_unary(series, ctx.order, c0, f1, f2) if ctx.order else TSeries(c0, [])


def _as_activation(actv):
    """Accept an activation class/factory (reference style) or instance; return instance."""
    if actv is None:
        return Tanh()
    if isinstance(actv, Module):
        return actv
    if callable(actv):  # class or zero-arg factory, mirroring `actv()` per layer
        made = actv()
        if isinstance(made, Module):
            return made
    raise TypeError(f"Unsupported activation {actv}")


# ------------------------------------------------------------------ networks

class FCNN(Module):
    """A fully connected neural network (reference ``networks.py:6-70``).

    :param n_input_units: Number of units in the input layer, defaults to 1.
    :type n_input_units: int
    :param n_output_units: Number of units in the output layer, defaults to 1.
    :type n_output_units: int
    :param n_hidden_units: [DEPRECATED] Number of hidden units in each layer.
    :type n_hidden_units: int
    :param n_hidden_layers: [DEPRECATED] Number of hidden mappings (1 larger
        than the actual number of hidden layers).
    :type n_hidden_layers: int
    :param actv: The activation constructor (or instance) after each hidden
        layer, defaults to :class:`Tanh`.
    :param hidden_units: Number of hidden units in each hidden layer, defaults
        to ``(32, 32)``.
    :type hidden_units: Tuple[int]
    """

    def __init__(self, n_input_units=1, n_output_units=1, n_hidden_units=None, n_hidden_layers=None,
                 actv=Tanh, hidden_units=None):
        # legacy argument shims follow the reference (networks.py:32-49)
        if n_hidden_units is None and n_hidden_layers is not None:
            n_hidden_units = 32
        elif n_hidden_units is not None and n_hidden_layers is None:
            n_hidden_layers = 1

        if n_hidden_units is not None or n_hidden_layers is not None:
            if hidden_units is None:
                hidden_units = tuple(n_hidden_units for _ in range(n_hidden_layers + 1))
                warnings.warn(
                    f"`n_hidden_units` and `n_hidden_layers` are deprecated, "
                    f"pass `hidden_units={hidden_units}` instead", FutureWarning)
            else:
                warnings.warn(
                    f"Ignoring `n_hidden_units` and `n_hidden_layers` in favor of "
                    f"`hidden_units={hidden_units}`", FutureWarning)

        if hidden_units is None:
            hidden_units = (32, 32)
        hidden_units = tuple(hidden_units)

        self.n_input_units = n_input_units
        self.n_output_units = n_output_units
        self.hidden_units = hidden_units
        self.actv_factory = actv
        self.actvs = [_as_activation(actv) for _ in hidden_units]

        units = (n_input_units,) + hidden_units + (n_output_units,)
        self.layer_dims = list(zip(units[:-1], units[1:]))

    def init(self, key, dtype=None):
        from .utils import get_default_dtype
        dtype = dtype or get_default_dtype()
        keys = jax.random.split(key, len(self.layer_dims) + len(self.actvs))
        layers = [
            _linear_init(k, n_in, n_out, dtype)
            for k, (n_in, n_out) in zip(keys[:len(self.layer_dims)], self.layer_dims)
        ]
        actv_params = [
            a.init(k, dtype=dtype) for a, k in zip(self.actvs, keys[len(self.layer_dims):])
        ]
        return {'layers': layers, 'actv': actv_params}

    def apply(self, params, x):
        h = x
        layers = params['layers']
        actv_params = params['actv']
        for i, lp in enumerate(layers[:-1]):
            h = h @ lp['W'] + lp['b']
            h = self.actvs[i].apply(actv_params[i], h)
        lp = layers[-1]
        return h @ lp['W'] + lp['b']

    @property
    def supports_taylor(self):
        return all(getattr(a, 'jet_safe', False) for a in self.actvs)

    def taylor_apply(self, params, series, ctx):
        """Batched Taylor propagation: linear layers map coefficients exactly,
        activations via closed-form chain rules — the whole network forward
        (and all directional derivative chains) in one pass. When the fused
        Pallas kernel is enabled (``ops.enable_pallas()``) and applicable
        (tanh layers, raw coordinate inputs, order <= 2), the entire
        propagation runs as one TPU kernel."""
        from .ops.taylor import affine_series, TSeries
        from .ops.pallas_mlp import pallas_enabled, fcnn_taylor_pallas
        _PALLAS_ACTVS = {Tanh: 'tanh', SinActv: 'sin'}
        actv_kinds = {_PALLAS_ACTVS.get(type(a)) for a in self.actvs}
        if (pallas_enabled() and getattr(series, 'meta', None) == 'raw_coords'
                and 1 <= ctx.order <= 2 and len(actv_kinds) == 1
                and None not in actv_kinds):
            outs = fcnn_taylor_pallas(series.c0, params['layers'], ctx.order,
                                      ctx.n_dirs, actv=actv_kinds.pop())
            # the kernel returns stacked (D, N, m) coefficients; re-layout to
            # match the context
            if ctx.stacked:
                return TSeries(outs[0], list(outs[1:]))
            return TSeries(outs[0],
                           [tuple(o[d] for d in range(ctx.n_dirs)) for o in outs[1:]])
        layers = params['layers']
        actv_params = params['actv']
        for i, lp in enumerate(layers[:-1]):
            series = affine_series(series, lp['W'], lp['b'])
            series = self.actvs[i].taylor_series(actv_params[i], series, ctx)
        lp = layers[-1]
        return affine_series(series, lp['W'], lp['b'])

    def __repr__(self):
        return (f"FCNN(n_input_units={self.n_input_units}, "
                f"n_output_units={self.n_output_units}, hidden_units={self.hidden_units})")


class Resnet(Module):
    """FCNN plus a trainable bias-free linear skip connection
    (reference ``networks.py:73-106``)."""

    def __init__(self, n_input_units=1, n_output_units=1, n_hidden_units=None, n_hidden_layers=None,
                 actv=Tanh, hidden_units=(32, 32)):
        self.residual = FCNN(
            n_input_units=n_input_units,
            n_output_units=n_output_units,
            n_hidden_units=n_hidden_units,
            n_hidden_layers=n_hidden_layers,
            actv=actv,
            hidden_units=hidden_units,
        )
        self.n_input_units = n_input_units
        self.n_output_units = n_output_units

    def init(self, key, dtype=None):
        from .utils import get_default_dtype
        dtype = dtype or get_default_dtype()
        rkey, skey = jax.random.split(key)
        skip = _linear_init(skey, self.n_input_units, self.n_output_units, dtype)
        return {'residual': self.residual.init(rkey, dtype=dtype), 'skip_W': skip['W']}

    def apply(self, params, x):
        return x @ params['skip_W'] + self.residual.apply(params['residual'], x)

    @property
    def supports_taylor(self):
        return self.residual.supports_taylor

    def taylor_apply(self, params, series, ctx):
        from .ops.taylor import affine_series, add_series
        skip = affine_series(series, params['skip_W'])
        res = self.residual.taylor_apply(params['residual'], series, ctx)
        return add_series(skip, res)


class FourierFCNN(Module):
    r"""FCNN over random Fourier features: ``x -> [cos(xB), sin(xB)] -> FCNN``
    with ``B[i,j] ~ N(0, (2*pi*sigma)^2)`` fixed at initialization.

    No reference counterpart (beyond `/root/reference/neurodiffeq/networks.py`,
    which stops at FCNN/Resnet/MonomialNN): random Fourier embeddings are the
    standard remedy for the spectral bias of coordinate MLPs (Tancik et al.
    2020; Wang et al. 2021 for PINNs) — a plain tanh FCNN needs orders of
    magnitude more epochs to fit solutions with O(k) oscillations, while the
    embedding makes frequency-k content a *linear* function of the features.

    :param n_input_units: Number of coordinate inputs, defaults to 1.
    :type n_input_units: int
    :param n_output_units: Number of outputs, defaults to 1.
    :type n_output_units: int
    :param n_features: Number of random frequencies; the FCNN sees
        ``2 * n_features`` inputs (cos and sin of each), defaults to 64.
    :type n_features: int
    :param sigma: Frequency bandwidth — frequencies are drawn from
        ``N(0, (2*pi*sigma)^2)``, so ``sigma`` is roughly the highest
        frequency (in cycles per unit length) the network fits easily;
        set it to the expected frequency content of the solution.
        Defaults to 1.0.
    :type sigma: float
    :param actv: Activation constructor for the FCNN, defaults to :class:`Tanh`.
    :param hidden_units: FCNN hidden widths, defaults to ``(32, 32)``.
    :type hidden_units: Tuple[int]

    ``B`` lives in the params pytree (so checkpoints round-trip it) but is
    wrapped in ``stop_gradient`` — its *gradient* is exactly zero, so any
    pure-gradient first-order optimizer (sgd, adam, rmsprop, ...) leaves it
    at its initialized value. **Decoupled weight decay is not a gradient**:
    ``optax.adamw``-style optimizers shrink ``B`` directly every step,
    silently shifting the embedding mid-training. When using weight decay,
    mask it off ``B``::

        optax.adamw(1e-3, weight_decay=1e-4,
                    mask=FourierFCNN.weight_decay_mask(params))
    """

    @staticmethod
    def weight_decay_mask(params):
        """Pytree of booleans matching ``params`` (or a list of per-net
        params): ``False`` on the frozen Fourier matrix ``B``, ``True``
        elsewhere. Pass as the ``mask`` of ``optax.adamw`` /
        ``optax.add_decayed_weights`` so decay cannot mutate ``B``."""
        def _one(p):
            if isinstance(p, dict) and 'B' in p and 'fcnn' in p:
                return {'B': jax.tree.map(lambda _: False, p['B']),
                        'fcnn': jax.tree.map(lambda _: True, p['fcnn'])}
            return jax.tree.map(lambda _: True, p)

        if isinstance(params, list):
            return [_one(p) for p in params]
        return _one(params)

    def __init__(self, n_input_units=1, n_output_units=1, n_features=64,
                 sigma=1.0, actv=Tanh, hidden_units=(32, 32)):
        self.n_input_units = n_input_units
        self.n_output_units = n_output_units
        self.n_features = int(n_features)
        self.sigma = float(sigma)
        self.fcnn = FCNN(n_input_units=2 * self.n_features,
                         n_output_units=n_output_units,
                         actv=actv, hidden_units=hidden_units)

    def init(self, key, dtype=None):
        from .utils import get_default_dtype
        dtype = dtype or get_default_dtype()
        bkey, fkey = jax.random.split(key)
        B = (2.0 * jnp.pi * self.sigma) * jax.random.normal(
            bkey, (self.n_input_units, self.n_features), dtype=dtype)
        return {'B': B, 'fcnn': self.fcnn.init(fkey, dtype=dtype)}

    def apply(self, params, x):
        z = x @ jax.lax.stop_gradient(params['B'])
        feats = jnp.concatenate([jnp.cos(z), jnp.sin(z)], axis=-1)
        return self.fcnn.apply(params['fcnn'], feats)

    @property
    def supports_taylor(self):
        return self.fcnn.supports_taylor

    def taylor_apply(self, params, series, ctx):
        from .ops.taylor import affine_series, elementwise_series, concat_series
        z = affine_series(series, jax.lax.stop_gradient(params['B']))
        feats = concat_series(
            [elementwise_series(jnp.cos, [z], ctx.order, ctx.n_dirs),
             elementwise_series(jnp.sin, [z], ctx.order, ctx.n_dirs)],
            ctx.order, ctx.n_dirs)
        return self.fcnn.taylor_apply(params['fcnn'], feats, ctx)

    def __repr__(self):
        return (f"FourierFCNN(n_input_units={self.n_input_units}, "
                f"n_output_units={self.n_output_units}, "
                f"n_features={self.n_features}, sigma={self.sigma}, "
                f"hidden_units={self.fcnn.hidden_units})")


class SIREN(Module):
    r"""Sinusoidal representation network: every hidden layer is
    ``sin(w0 * (W h + b))`` with the initialization scheme of Sitzmann et al.
    2020 ("Implicit Neural Representations with Periodic Activation
    Functions").

    No reference counterpart (``/root/reference/neurodiffeq/networks.py:6-209``
    stops at FCNN/Resnet/MonomialNN; its ``SinActv`` applies ``sin`` without
    the frequency scaling or the matched init). SIREN is the other standard
    remedy — alongside :class:`FourierFCNN` — for the spectral bias of
    coordinate MLPs: the ``w0`` scaling puts O(``w0``) frequencies in the
    first layer's range, and the ``U(-sqrt(6/fan_in)/w0, +)`` hidden init
    keeps pre-activations standard-normal so deep stacks of sines neither
    saturate nor explode. Unlike :class:`FourierFCNN` (fixed random
    frequencies, trainable readout), every frequency in a SIREN is trainable.

    :param n_input_units: Number of coordinate inputs, defaults to 1.
    :type n_input_units: int
    :param n_output_units: Number of outputs, defaults to 1.
    :type n_output_units: int
    :param hidden_units: Hidden widths, defaults to ``(32, 32)``.
    :type hidden_units: Tuple[int]
    :param w0: Frequency scale of the sine layers, defaults to 30.0 — the
        paper's value, calibrated for *image fitting* on ``[-1, 1]``. For
        residual (PINN) training, moderate values work markedly better:
        on ``u'' = -(2 pi 3)^2 sin(2 pi 3 t)`` over [0, 1] (Adam 3e-3,
        2000 epochs) the measured max error is 0.025 at ``w0=5``, 0.043
        at ``w0=10``, but ~0.78 at ``w0=30`` — differentiating the
        residual amplifies each hidden frequency by ``w0`` per derivative
        order, so large ``w0`` makes the loss landscape noisy. Start at
        5-10 and raise only if the solution's frequency content demands it.
    :type w0: float
    :param w0_first: Frequency scale of the first layer only; defaults to
        ``w0`` (the paper uses 30 for both).
    :type w0_first: float

    Weight init (paper §3.2 + appendix): first layer
    ``U(-1/fan_in, 1/fan_in)``; every later layer
    ``U(-sqrt(6/fan_in)/w0, sqrt(6/fan_in)/w0)`` (including the final
    linear readout). Biases use the torch ``nn.Linear`` default
    ``U(-1/sqrt(fan_in), +)``, as in the authors' released code.
    """

    supports_taylor = True

    def __init__(self, n_input_units=1, n_output_units=1, hidden_units=(32, 32),
                 w0=30.0, w0_first=None):
        self.n_input_units = n_input_units
        self.n_output_units = n_output_units
        self.hidden_units = tuple(hidden_units)
        self.w0 = float(w0)
        self.w0_first = float(w0 if w0_first is None else w0_first)
        units = (n_input_units,) + self.hidden_units + (n_output_units,)
        self.layer_dims = list(zip(units[:-1], units[1:]))
        # structural twin used for Taylor propagation: folding w0 into the
        # affine layers makes SIREN exactly an FCNN with sin activations,
        # which keeps it eligible for the fused Pallas kernel
        self._fcnn = FCNN(n_input_units=n_input_units,
                          n_output_units=n_output_units,
                          actv=SinActv, hidden_units=self.hidden_units)

    def _layer_w0(self, i):
        return self.w0_first if i == 0 else self.w0

    def init(self, key, dtype=None):
        from .utils import get_default_dtype
        dtype = dtype or get_default_dtype()
        keys = jax.random.split(key, len(self.layer_dims))
        layers = []
        for i, (k, (n_in, n_out)) in enumerate(zip(keys, self.layer_dims)):
            wkey, bkey = jax.random.split(k)
            if i == 0:
                bound = 1.0 / n_in
            else:
                bound = float(jnp.sqrt(6.0 / n_in)) / self.w0
            W = jax.random.uniform(wkey, (n_in, n_out), dtype=dtype,
                                   minval=-bound, maxval=bound)
            b_bound = 1.0 / float(jnp.sqrt(jnp.asarray(float(n_in))))
            b = jax.random.uniform(bkey, (n_out,), dtype=dtype,
                                   minval=-b_bound, maxval=b_bound)
            layers.append({'W': W, 'b': b})
        return {'layers': layers}

    def apply(self, params, x):
        h = x
        layers = params['layers']
        for i, lp in enumerate(layers[:-1]):
            h = jnp.sin(self._layer_w0(i) * (h @ lp['W'] + lp['b']))
        lp = layers[-1]
        return h @ lp['W'] + lp['b']

    def taylor_apply(self, params, series, ctx):
        # sin(w0*(Wx+b)) == SinActv(FCNN-layer with weights w0*W, w0*b):
        # delegate to the FCNN Taylor path (and its Pallas kernel) on
        # w0-folded parameters. Gradients flow through the folding, so
        # parameter gradients match `apply` exactly.
        layers = params['layers']
        scaled = [{'W': self._layer_w0(i) * lp['W'], 'b': self._layer_w0(i) * lp['b']}
                  for i, lp in enumerate(layers[:-1])] + [layers[-1]]
        return self._fcnn.taylor_apply(
            {'layers': scaled, 'actv': [None] * len(self.hidden_units)},
            series, ctx)

    def __repr__(self):
        return (f"SIREN(n_input_units={self.n_input_units}, "
                f"n_output_units={self.n_output_units}, "
                f"hidden_units={self.hidden_units}, w0={self.w0}, "
                f"w0_first={self.w0_first})")


class MonomialNN(Module):
    """Expands input to ``[x^d for d in degrees]`` concatenated along columns
    (reference ``networks.py:109-139``). Output width = n_inputs * n_degrees."""

    def __init__(self, degrees):
        if isinstance(degrees, int):
            degrees = [d for d in range(1, degrees + 1)]
        self.degrees = tuple(degrees)
        if len(self.degrees) == 0:
            raise ValueError("No degrees used, check `degrees` argument again")
        if 0 in self.degrees:
            warnings.warn("One of the degrees is 0 which might introduce redundant features")
        if len(set(self.degrees)) < len(self.degrees):
            warnings.warn(f"Duplicate degrees found: {self.degrees}")

    def init(self, key, dtype=None):
        return None

    def apply(self, params, x):
        return jnp.concatenate([x ** d for d in self.degrees], axis=-1)

    supports_taylor = True

    def taylor_apply(self, params, series, ctx):
        from .ops.taylor import elementwise_series, concat_series
        parts = [
            elementwise_series(lambda x, _d=d: x ** _d, [series], ctx.order, ctx.n_dirs)
            for d in self.degrees
        ]
        return concat_series(parts, ctx.order, ctx.n_dirs)

    def __repr__(self):
        return f"MonomialNN(degrees={self.degrees})"
