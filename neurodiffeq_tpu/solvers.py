r"""Training engines (solvers) for ODE/PDE systems.

Capability parity with the reference's ``neurodiffeq/solvers.py`` (BaseSolver
epoch loop with gradient accumulation, closure-style optimizers, metrics
history, best-net tracking, early stopping; GenericSolver, Solver1D, Solver2D,
SolverSpherical, BundleSolver1D; Solution objects — ``solvers.py:35-1593``),
re-designed TPU-first:

- The reference's hot loop (``solvers.py:366-407``: sample, forward, autograd
  residual, loss, backward) becomes ONE jitted function per epoch: collocation
  sampling (``jax.random``), condition enforcement, residual evaluation via
  forward-mode field derivatives, loss, and the optax update all trace into a
  single XLA program. Gradient accumulation across ``n_batches_train`` is a
  ``lax.scan`` (summing grads, like torch's ``.backward()`` accumulation at
  ``solvers.py:360-419``).
- When no callbacks are attached, ``fit`` runs a *chunked* path that scans
  whole epochs on device (no host round-trip per epoch); best-net tracking is
  a pytree ``where``-select carried through the scan instead of a host-side
  ``deepcopy`` (``solvers.py:434-441``).
- Multi-device: pass ``mesh=`` (a 1-D ``jax.sharding.Mesh`` over axis
  ``'points'``) to shard the collocation batch; the loss mean then compiles to
  a ``psum`` over ICI. The reference has no distributed layer; this is the
  TPU-native equivalent of scaling its batch axis.
"""
import sys
import math
import numbers
import inspect
import warnings
from abc import ABC, abstractmethod
from copy import deepcopy

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .solvers_utils import PretrainedSolver
from .networks import FCNN, Tanh
from ._version_utils import deprecated_alias
from .generators import (
    GeneratorSpherical, SamplerGenerator, Generator1D, Generator2D,
)
from .conditions import BaseCondition
from .fields import coords_from_points, cat as field_cat, Field
from .losses import _losses
from .utils import next_rng_key, get_default_dtype, GLOBAL_KEYS

try:  # tqdm is optional at runtime
    from tqdm.auto import tqdm
except Exception:  # pragma: no cover
    tqdm = None

__all__ = [
    'BaseSolver', 'GenericSolver', 'Solver1D', 'Solver2D', 'SolverSpherical',
    'BundleSolver1D', 'BaseSolution', 'GenericSolution', 'Solution1D',
    'Solution2D', 'SolutionSpherical', 'SolutionSphericalHarmonics', 'BundleSolution1D',
    'load_exported_solution',
]

# epochs per on-device scan in the no-callback fast path (large chunks
# amortize the per-call host dispatch, which costs ~1 ms over some
# TPU transports; outputs per epoch are a handful of scalars)
_FIT_CHUNK = 512
# vmapping the per-epoch batch passes holds all of them live at once; above
# this many total points per epoch, fall back to sequential lax.scan so
# gradient accumulation keeps its memory-bounding semantics.
_VMAP_EPOCH_POINTS = 16384


def _requires_closure(optimizer):
    """Detect closure-style (value_fn-consuming) optimizers like optax.lbfgs.

    The analog of the reference's ``inspect``-based check for torch optimizers
    whose ``.step()`` requires a closure (``solvers.py:29-32``). optax hides
    extra args behind ``**extra_args``, so we probe with an abstract update:
    linesearch-based optimizers fail without value/grad/value_fn.
    """
    try:
        sig = inspect.signature(optimizer.update)
        p = sig.parameters.get('value_fn')
        if p is not None and p.default is inspect.Parameter.empty:
            return True
    except (TypeError, ValueError):  # pragma: no cover
        pass
    try:
        probe = {'w': jnp.zeros((2,))}
        state = jax.eval_shape(optimizer.init, probe)
        jax.eval_shape(lambda g, s, p: optimizer.update(g, s, p), probe, state, probe)
        return False
    except TypeError:
        return True
    except Exception:  # pragma: no cover - exotic optimizers: assume plain
        return False


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def _tree_select(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


class BaseSolver(ABC, PretrainedSolver):
    r"""A class for solving ODE/PDE systems.

    :param diff_eqs: The differential equation system to solve; maps funcs and
        coordinate Fields to a (list of) residual Field(s).
    :type diff_eqs: callable
    :param conditions: List of conditions for each target function.
    :type conditions: list[`neurodiffeq_tpu.conditions.BaseCondition`]
    :param nets: List of network modules; defaults to one
        ``FCNN(hidden_units=(32, 32), actv=Tanh)`` per condition.
    :param train_generator: Generator for sampling training points (required).
    :param valid_generator: Generator for sampling validation points (required).
    :param analytic_solutions: **[DEPRECATED]** use ``metrics`` instead.
    :param optimizer: An optax gradient transformation; defaults to
        ``optax.adam(1e-3)`` (torch Adam defaults). Closure-style optimizers
        (e.g. ``optax.lbfgs()``) are detected and stepped per batch.
    :param loss_fn: str key of the loss registry / callable
        ``(residual_field, funcs, coords) -> scalar``; defaults to mean
        squared residual.
    :param n_batches_train: batches per training epoch (grads accumulate, one
        optimizer step per epoch). Defaults to 1.
    :param n_batches_valid: batches per validation epoch. Defaults to 4.
    :param metrics: dict of named metric callables, called with the *values*
        (arrays) of funcs and coordinates.
    :param n_input_units: inputs per network (ignored if ``nets`` given).
    :param n_output_units: outputs per network (ignored if ``nets`` given).
    :param key: PRNG key for parameter init & sampling; defaults to the global
        key store.
    :param mesh: optional ``jax.sharding.Mesh`` with a ``'points'`` axis; the
        collocation batch is sharded across it.
    """

    @deprecated_alias(criterion='loss_fn')
    def __init__(self, diff_eqs, conditions,
                 nets=None, train_generator=None, valid_generator=None, analytic_solutions=None,
                 optimizer=None, loss_fn=None, n_batches_train=1, n_batches_valid=4,
                 metrics=None, n_input_units=None, n_output_units=None,
                 key=None, mesh=None, eval_mode=None, residual_weights=None,
                 # deprecated arguments
                 shuffle=None, batch_size=None):
        if shuffle:
            warnings.warn(
                "param `shuffle` is deprecated and ignored; shuffling should be performed by generators",
                FutureWarning,
            )
        if batch_size is not None:
            warnings.warn(
                "param `batch_size` is deprecated and ignored; specify n_batches_train and n_batches_valid instead",
                FutureWarning,
            )

        self.diff_eqs = diff_eqs
        self.conditions = conditions
        self.n_funcs = len(conditions)
        self.n_input_units = n_input_units
        self.mesh = mesh
        # None | sequence of per-equation loss weights. (An automatic
        # per-batch inverse-mean-square 'balance' mode was built and
        # REJECTED on measurement: the weight of a well-trained equation
        # grows like 1/ms_k, amplifying its gradient noise without bound —
        # it degraded every shared- and separate-net testbed and NaN'd the
        # cavity; see benchmarks/RESULTS.md. Static weights + Adam's
        # per-parameter normalization are the robust tool.)
        if residual_weights is not None:
            try:
                residual_weights = [float(w) for w in residual_weights]
            except (TypeError, ValueError):
                raise ValueError(
                    f"residual_weights must be None or a sequence of positive "
                    f"numbers; got {residual_weights!r}")
            if any(w <= 0 for w in residual_weights):
                raise ValueError("residual_weights must be positive")
        self.residual_weights = residual_weights
        # 'taylor' | 'compose' | None (None = the global default, see
        # fields.set_eval_mode); applied while the loss is traced
        self.eval_mode = eval_mode

        if nets is None:
            self.nets = [
                FCNN(n_input_units=n_input_units, n_output_units=n_output_units,
                     hidden_units=(32, 32), actv=Tanh)
                for _ in range(self.n_funcs)
            ]
        else:
            self.nets = list(nets)

        if train_generator is None:
            raise ValueError("train_generator must be specified")
        if valid_generator is None:
            raise ValueError("valid_generator must be specified")

        # Deduplicate repeated net instances (e.g. the legacy single-net setup
        # where one multi-output net is shared across conditions with
        # `set_impose_on`): each unique module gets ONE parameter pytree, the
        # JAX analog of torch Adam over an OrderedSet of parameters
        # (reference solvers.py:182).
        unique_nets = []
        self._net_param_index = []
        for net in self.nets:
            for j, u in enumerate(unique_nets):
                if u is net:
                    self._net_param_index.append(j)
                    break
            else:
                self._net_param_index.append(len(unique_nets))
                unique_nets.append(net)

        key = key if key is not None else next_rng_key()
        init_keys = jax.random.split(key, len(unique_nets))
        self.params = [net.init(k) for net, k in zip(unique_nets, init_keys)]
        if self.mesh is not None and 'model' in self.mesh.axis_names:
            # Megatron tensor parallelism over hidden units: committed input
            # shardings propagate through jit, and the optimizer state
            # initialized below inherits the same layout.
            from .parallel import shard_params
            self.params = shard_params(self.params, self.mesh)

        # Flat-parameter hot path: inside compiled epochs the parameter list is
        # carried as ONE ravelled vector, so the optimizer update, gradient
        # accumulation, and best-params tracking each compile to a handful of
        # ops instead of O(n_leaves) tiny per-leaf launches (measured 5-14x on
        # launch-bound small-model configs, benchmarks/RESULTS.md round 3).
        # Disabled under tensor parallelism, where per-leaf shardings must
        # survive the optimizer.
        self._use_flat = not (self.mesh is not None and 'model' in self.mesh.axis_names)
        if self._use_flat:
            from jax.flatten_util import ravel_pytree
            _flat0, self._unravel = ravel_pytree(self.params)
            self._ravel = lambda p: ravel_pytree(p)[0]
        else:
            self._unravel = self._ravel = lambda p: p

        self.metrics_fn = metrics if metrics else {}
        if analytic_solutions:
            warnings.warn(
                'The `analytic_solutions` argument is deprecated and could lead to unstable behavior. '
                'Pass a `metrics` dict instead.',
                FutureWarning,
            )

            def analytic_mse(*args):
                x = args[-n_input_units:]
                u_hat = analytic_solutions(*x)
                u = args[:-n_input_units]
                u, u_hat = jnp.stack(u), jnp.stack(list(u_hat) if isinstance(u_hat, (list, tuple)) else [u_hat])
                return ((u - u_hat) ** 2).mean()

            if 'analytic_mse' in self.metrics_fn:
                warnings.warn(
                    "Ignoring `analytic_solutions` in presence of key 'analytic_mse' in `metrics`",
                    FutureWarning,
                )
            else:
                self.metrics_fn['analytic_mse'] = analytic_mse

        # Lazily committed chunk history: each entry is a packed device buffer
        # (still a future) queued by `_commit_chunk` and folded into the host
        # lists only on first *read* of `metrics_history` — counter-only
        # callbacks (Period*/OnFirst/OnLast/ClosedInterval/...) never read it,
        # so their chunk boundaries stay device->host-transfer-free.
        self._pending_history = []
        self._pending_n = 0
        self._history_syncs = 0  # diagnostics: lazy flush count (tests)
        self.metrics_history = {}
        self.metrics_history.update({'train_loss': [], 'valid_loss': []})
        self.metrics_history.update({'train__' + name: [] for name in self.metrics_fn})
        self.metrics_history.update({'valid__' + name: [] for name in self.metrics_fn})

        self.optimizer = optimizer if optimizer is not None else optax.adam(1e-3)
        self._closure_style = _requires_closure(self.optimizer)
        # canonical optimizer state matches the compiled representation: the
        # ravelled parameter vector on the flat path, the param list under TP
        self.opt_state = self.optimizer.init(self._ravel(self.params))
        self._set_loss_fn(loss_fn)

        def make_pair_dict(train=None, valid=None):
            return {'train': train, 'valid': valid}

        from .generators import contains_buried_adaptive
        if contains_buried_adaptive(train_generator):
            warnings.warn(
                "A ResidualAdaptiveGenerator is nested inside a combinator "
                "(e.g. Concat/Ensemble/Mesh/Transform); only the OUTERMOST "
                "train generator's adaptive selection is honored, so this "
                "solver will train WITHOUT adaptive sampling. Wrap the whole "
                "combined generator instead: ResidualAdaptiveGenerator(g1 + g2).")
        self.generator = make_pair_dict(
            train=SamplerGenerator(train_generator),
            valid=SamplerGenerator(valid_generator),
        )
        self.n_batches = make_pair_dict(train=n_batches_train, valid=n_batches_valid)
        self._batch = make_pair_dict()

        if self.n_batches['valid'] == 0 and self._closure_style:
            warnings.warn(
                "Setting n_batches_valid=0 will update lowest_loss and best_net with training "
                "loss instead of validation loss. This is a problem for closure-style optimizers "
                "because they update the parameters before the training loss is computed. "
                "This leads to potentially worse solution in `best_net`!", RuntimeWarning)

        self.best_params = None
        self.lowest_loss = None
        self.local_epoch = 0
        self._max_local_epoch = 0
        self._stop_training = False
        self._phase = None
        self._fit_chunk_sizes = []
        self._uncommitted_epochs = 0

        # compiled-function cache; invalidated when loss_fn/optimizer change
        # or the global seed is re-set (trace-time seed-bound constants —
        # e.g. the stde probe base keys — must rebind to the new seed)
        self._compiled = {}
        self._compiled_seed = GLOBAL_KEYS.seed_value()

    # ------------------------------------------------------------ configuration

    def _set_loss_fn(self, criterion):
        if criterion is None:
            self.loss_fn = lambda r, f, x: (r.value ** 2).mean() if isinstance(r, Field) else (r ** 2).mean()
        elif isinstance(criterion, str):
            self.loss_fn = _losses[criterion.lower()]
        elif callable(criterion):
            self.loss_fn = criterion
        else:
            raise TypeError(f"Unknown type of criterion {type(criterion)}")
        self._invalidate_compiled()

    def set_loss_fn(self, loss_fn):
        """Hot-swap the loss function (used by ``SetLossFn`` callbacks)."""
        self._set_loss_fn(loss_fn)

    def set_optimizer(self, optimizer, reset_state=True):
        """Hot-swap the optimizer (used by ``SetOptimizer`` callbacks)."""
        self.optimizer = optimizer
        self._closure_style = _requires_closure(optimizer)
        if reset_state or self.opt_state is None:
            self.opt_state = self.optimizer.init(self._ravel(self.params))
        self._invalidate_compiled()

    def set_generator(self, generator, phase='train'):
        """Hot-swap a collocation generator between ``fit()`` calls.

        The reference exposes ``solver.generator`` as a plain mutable dict
        (``solvers.py:188-191``); here the swap must also rewrap with
        :class:`~neurodiffeq_tpu.generators.SamplerGenerator` and invalidate
        the compiled epoch programs, so it goes through this method. Typical
        use: freeze a :class:`StaticGenerator` sample for an L-BFGS polish
        phase after stochastic Adam training.

        :param generator: the new generator for the phase.
        :param phase: ``'train'`` or ``'valid'``.
        """
        if phase not in self.generator:
            raise ValueError(f"phase must be one of {list(self.generator)}, got {phase!r}")
        from .generators import contains_buried_adaptive
        if phase == 'train' and contains_buried_adaptive(generator):
            warnings.warn(
                "A ResidualAdaptiveGenerator is nested inside a combinator "
                "(e.g. Concat/Ensemble/Mesh/Transform); only the OUTERMOST "
                "train generator's adaptive selection is honored, so this "
                "solver will train WITHOUT adaptive sampling. Wrap the whole "
                "combined generator instead: ResidualAdaptiveGenerator(g1 + g2).")
        self.generator[phase] = SamplerGenerator(generator)
        self._invalidate_compiled()

    def _invalidate_compiled(self):
        self._compiled = {}

    @property
    def global_epoch(self):
        r"""Global epoch count: committed history length + epochs of lazily
        committed chunks whose packed buffers have not been fetched from the
        device yet (``_pending_history``) + transiently, epochs of a chunk
        that is committed mid-plan (``_uncommitted_epochs``). Computed from
        counters, NOT by reading the history — so epoch-cadence callbacks
        never force a device->host sync."""
        return (len(self._metrics_history['train_loss'])
                + self._pending_n + self._uncommitted_epochs)

    @property
    def metrics_history(self):
        """Per-epoch history dict. Reading it folds any lazily committed
        chunk buffers in first (one device->host transfer per chunk)."""
        if self._pending_history:
            self._flush_history()
        return self._metrics_history

    @metrics_history.setter
    def metrics_history(self, value):
        if getattr(self, '_pending_history', None):
            self._flush_history()
        self._metrics_history = value

    def _flush_history(self):
        """Fold lazily committed chunk buffers (device futures queued by
        `_commit_chunk`) into the host-side history lists, in order."""
        pending, self._pending_history = self._pending_history, []
        self._pending_n = 0
        self._history_syncs += 1
        h = self._metrics_history
        for buf, n, metric_names, has_valid in pending:
            buf = np.asarray(buf)  # blocks on the device buffer
            h['train_loss'].extend(buf[0, :n].tolist())
            if has_valid:
                h['valid_loss'].extend(buf[1, :n].tolist())
            for k, name in enumerate(metric_names):
                h['train__' + name].extend(buf[2 + k, :n].tolist())
                if has_valid:
                    h['valid__' + name].extend(
                        buf[2 + len(metric_names) + k, :n].tolist())

    @property
    def lowest_loss(self):
        """Lowest watched loss so far. After a lazily committed chunk the raw
        value is a device scalar; reading converts it (cached separately, so
        the raw object's identity — which the speculative-pipeline validity
        check relies on — survives reads)."""
        raw = self._lowest_raw
        if raw is None or isinstance(raw, numbers.Number):
            return raw
        if self._lowest_float is None:
            self._lowest_float = float(raw)
        return self._lowest_float

    @lowest_loss.setter
    def lowest_loss(self, value):
        self._lowest_raw = value
        self._lowest_float = None

    @property
    def batch(self):
        return self._batch

    @property
    def _batch_examples(self):
        warnings.warn(
            '`._batch_examples` has been deprecated in favor of `._batch` and will be removed in a future version',
            FutureWarning,
        )
        return self._batch

    @property
    def criterion(self):
        warnings.warn(
            f'`{self.__class__.__name__}.criterion` is a deprecated alias for '
            f'`{self.__class__.__name__}.loss_fn`.')
        return self.loss_fn

    @criterion.setter
    def criterion(self, loss_fn):
        warnings.warn(
            f'`{self.__class__.__name__}.criterion` is a deprecated alias for '
            f'`{self.__class__.__name__}.loss_fn`.')
        self._set_loss_fn(loss_fn)

    # --------------------------------------------------------------- traced core

    def compute_func_val(self, net, params, cond, *coordinates):
        r"""Enforce the condition on the network over the sampled coordinates.

        :param net: The network module.
        :param params: The network's parameters.
        :param cond: The condition (a.k.a. parameterization) for the network.
        :param coordinates: Coordinate Fields.
        :return: Function values at the sampled points, as a Field.
        """
        return cond.enforce(net, params, *coordinates)

    def _shard_points(self, points):
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            points = jax.lax.with_sharding_constraint(
                points, NamedSharding(self.mesh, P('points', None)))
        return points

    def _expand_params(self, params):
        """Map the deduped parameter list back to one entry per net/condition."""
        return [params[j] for j in self._net_param_index]

    def _forward(self, params, cols):
        """Sampled columns -> (funcs, coord_fields); shared by loss & residuals."""
        points = jnp.concatenate([c.reshape(-1, 1) for c in cols], axis=1)
        points = self._shard_points(points)
        coord_fields = coords_from_points(points)
        funcs = [
            self.compute_func_val(net, p, cond, *coord_fields)
            for net, p, cond in zip(self.nets, self._expand_params(params), self.conditions)
        ]
        return funcs, coord_fields

    def _residuals(self, funcs, coord_fields, weighted=False):
        residuals = self.diff_eqs(*funcs, *coord_fields)
        if isinstance(residuals, Field):
            residuals = [residuals]
        if weighted and self.residual_weights is not None:
            residuals = self._apply_residual_weights(list(residuals))
        return field_cat(residuals)

    def _apply_residual_weights(self, residuals):
        """Scale each equation's residual Field by ``w_k ** (1/p)`` where
        ``p`` is the loss function's homogeneity degree in the residual
        (``loss_fn.residual_power``, default 2) — so quadratic losses see
        ``sum_k w_k mean(r_k^2)`` via sqrt(w) scaling, while losses linear
        in the residual columns (``'variational'`` declares
        ``residual_power = 1``) see ``sum_k w_k mean(d_k)`` directly.

        Weights apply to the training loss and to adaptive-sampling scores
        (so point selection matches what training optimizes); `get_residuals`
        always returns raw equation residuals.
        """
        rw = self.residual_weights
        if len(rw) != len(residuals):
            raise ValueError(
                f"residual_weights has {len(rw)} entries but the system "
                f"produced {len(residuals)} residuals")
        power = getattr(self.loss_fn, 'residual_power', 2)
        return [r * (w ** (1.0 / power)) for r, w in zip(residuals, rw)]

    def _loss_and_metrics(self, params, cols):
        """The traced loss: enforce, residuals, loss + additional loss, metrics."""
        if self.eval_mode is not None:
            from .fields import eval_mode
            with eval_mode(self.eval_mode):
                return self._loss_and_metrics_inner(params, cols)
        return self._loss_and_metrics_inner(params, cols)

    def _loss_and_metrics_inner(self, params, cols):
        funcs, coord_fields = self._forward(params, cols)
        residual = self._residuals(funcs, coord_fields, weighted=True)
        loss = self.loss_fn(residual, funcs, coord_fields)
        loss = loss + self.additional_loss(residual, funcs, coord_fields)
        metrics = {
            name: jnp.asarray(fn(*[f.value for f in funcs], *[c.value for c in coord_fields]))
            for name, fn in self.metrics_fn.items()
        }
        return loss, metrics

    def _residual_scores(self, params, cols):
        """Per-point residual magnitude (L2 norm over equations) — the
        epsilon(x) score of Wu et al. (2023), so the generator's default
        ``alpha=1`` matches the RAD k=1 recommendation exactly.

        Injected into ``ResidualAdaptiveGenerator.sample_scored`` so adaptive
        collocation selection runs inside the jitted step with the *current*
        parameters. Detached: point selection never carries gradients.
        """
        if self.eval_mode is not None:
            from .fields import eval_mode
            with eval_mode(self.eval_mode):
                funcs, coord_fields = self._forward(params, cols)
                residual = self._residuals(funcs, coord_fields, weighted=True)
        else:
            funcs, coord_fields = self._forward(params, cols)
            residual = self._residuals(funcs, coord_fields, weighted=True)
        r = residual.value
        return jax.lax.stop_gradient(jnp.sqrt(jnp.sum(r * r, axis=1)))

    def _train_sample_fn(self):
        """``(key, params) -> cols`` for the train phase; residual-adaptive
        generators get the scorer bound, plain generators ignore ``params``."""
        gen = self.generator['train']
        if getattr(gen, 'adaptive', False):
            return lambda key, params: gen.sample_scored(
                key, lambda cols: self._residual_scores(params, cols))
        sample = gen.sample
        return lambda key, params: sample(key)

    # ---------------------------------------------------------- compiled epochs

    def _get_compiled(self, name, builder):
        seed = GLOBAL_KEYS.seed_value()
        if seed != self._compiled_seed:
            # set_seed() since the last compile: traced programs bake the
            # seed VALUE into seed-derived constants (`_stde_probe_key`'s
            # base key, any user closure reading `seed_value()`), so a
            # reseeded solver must retrace — otherwise a resumed fit keeps
            # the OLD probe stream while a freshly built solver with the
            # same seed draws the new one (save/load parity would break)
            self._invalidate_compiled()
            self._compiled_seed = seed
        fn = self._compiled.get(name)
        if fn is None:
            fn = builder()
            self._compiled[name] = fn
        return fn

    def _build_train_epoch_raw(self):
        """One training epoch on the *compiled* parameter representation (a
        single ravelled vector on the flat path; the param list under TP).

        Non-closure optimizers: the ``n_batches_train`` gradient passes are
        ``vmap``-ped (one wide XLA program, not a sequential scan of tiny ops)
        and SUMMED — torch ``.backward()`` accumulation semantics (reference
        ``solvers.py:360-419``), then one optimizer step. vmap materializes
        all passes concurrently, so it is only used when the epoch's total
        points fit comfortably on device (``_VMAP_EPOCH_POINTS``); above that,
        a ``lax.scan`` accumulates grads sequentially, preserving the
        memory-bounding purpose of gradient accumulation. Closure-style
        optimizers update per batch, which is inherently sequential -> scan.
        """
        n_batches = self.n_batches['train']
        sample = self._train_sample_fn()
        optimizer = self.optimizer
        unravel = self._unravel

        def loss_p(p, cols):
            return self._loss_and_metrics(unravel(p), cols)

        if self._closure_style:
            def epoch(p, opt_state, key):
                keys = jax.random.split(key, n_batches)

                def body(carry, k):
                    p, opt_state = carry
                    cols = sample(k, unravel(p))
                    (loss, metrics), grads = jax.value_and_grad(
                        loss_p, has_aux=True)(p, cols)
                    value_fn = lambda q: loss_p(q, cols)[0]
                    updates, opt_state = optimizer.update(
                        grads, opt_state, p, value=loss, grad=grads, value_fn=value_fn)
                    p = optax.apply_updates(p, updates)
                    return (p, opt_state), (loss, metrics)

                (p, opt_state), (losses, metrics) = jax.lax.scan(body, (p, opt_state), keys)
                mean_metrics = {k: v.mean() for k, v in metrics.items()}
                return p, opt_state, losses.mean(), mean_metrics
        elif self._vmap_batches_ok('train'):
            def epoch(p, opt_state, key):
                keys = jax.random.split(key, n_batches)

                def one(k):
                    cols = sample(k, unravel(p))
                    return jax.value_and_grad(loss_p, has_aux=True)(p, cols)

                (losses, metrics), grads = jax.vmap(one)(keys)
                grads = jax.tree.map(lambda g: g.sum(axis=0), grads)
                updates, opt_state = optimizer.update(grads, opt_state, p)
                p = optax.apply_updates(p, updates)
                mean_metrics = {k: v.mean() for k, v in metrics.items()}
                return p, opt_state, losses.mean(), mean_metrics
        else:
            def epoch(p, opt_state, key):
                keys = jax.random.split(key, n_batches)

                def body(acc, k):
                    cols = sample(k, unravel(p))
                    (loss, metrics), grads = jax.value_and_grad(
                        loss_p, has_aux=True)(p, cols)
                    return _tree_add(acc, grads), (loss, metrics)

                zero = jax.tree.map(jnp.zeros_like, p)
                grads, (losses, metrics) = jax.lax.scan(body, zero, keys)
                updates, opt_state = optimizer.update(grads, opt_state, p)
                p = optax.apply_updates(p, updates)
                mean_metrics = {k: v.mean() for k, v in metrics.items()}
                return p, opt_state, losses.mean(), mean_metrics

        return epoch

    def _vmap_batches_ok(self, phase):
        """True when the phase's ``n_batches`` passes may run as one vmapped
        program. vmap holds every pass's activations live at once, so gate on
        total points per epoch; large epochs keep sequential scan semantics
        (bounded memory — the reason gradient accumulation exists)."""
        n = self.n_batches[phase]
        if n <= 1:
            return True
        gen = self.generator[phase]
        size = getattr(gen, 'size', None)
        # oversampling generators (ResidualAdaptiveGenerator) materialize
        # `oversample` candidate batches (and their scoring passes) per draw;
        # vmap would hold all of them live at once, so they count toward the
        # memory bound (unwrap the SamplerGenerator to see the attribute)
        oversample = getattr(getattr(gen, 'generator', gen), 'oversample', 1)
        return size is not None and n * size * oversample <= _VMAP_EPOCH_POINTS

    def _build_valid_epoch_raw(self):
        gen = self.generator['valid']
        n_batches = self.n_batches['valid']
        sample = gen.sample
        unravel = self._unravel

        if self._vmap_batches_ok('valid'):
            def epoch(p, key):
                keys = jax.random.split(key, n_batches)

                def one(k):
                    return self._loss_and_metrics(unravel(p), sample(k))

                losses, metrics = jax.vmap(one)(keys)
                return losses.mean(), {k: v.mean() for k, v in metrics.items()}
        else:
            def epoch(p, key):
                keys = jax.random.split(key, n_batches)

                def body(carry, k):
                    return carry, self._loss_and_metrics(unravel(p), sample(k))

                _, (losses, metrics) = jax.lax.scan(body, 0, keys)
                return losses.mean(), {k: v.mean() for k, v in metrics.items()}

        return epoch

    def _build_train_epoch(self):
        """Jitted single-epoch entry point on the public param-list layout."""
        raw = self._get_compiled('train_epoch_raw', self._build_train_epoch_raw)
        ravel, unravel = self._ravel, self._unravel

        def epoch(params, opt_state, key):
            p, opt_state, loss, metrics = raw(ravel(params), opt_state, key)
            return unravel(p), opt_state, loss, metrics

        return jax.jit(epoch)

    def _build_valid_epoch(self):
        raw = self._get_compiled('valid_epoch_raw', self._build_valid_epoch_raw)
        ravel = self._ravel

        def epoch(params, key):
            return raw(ravel(params), key)

        return jax.jit(epoch)

    def _build_fit_chunk(self, n_epochs):
        """Fuse n_epochs of train+valid(+best-tracking) into one scanned,
        jitted call. The epoch carry stays in the compiled (flat) parameter
        representation for the whole chunk; best tracking is then a single
        ``where`` instead of one per param leaf."""
        train_epoch = self._get_compiled('train_epoch_raw', self._build_train_epoch_raw)
        valid_epoch = self._get_compiled('valid_epoch_raw', self._build_valid_epoch_raw)
        has_valid = self.n_batches['valid'] > 0
        ravel, unravel = self._ravel, self._unravel

        def chunk(params, opt_state, best_params, lowest_loss, key):
            def body(carry, k):
                p, opt_state, best_p, lowest_loss = carry
                kt, kv = jax.random.split(k)
                p, opt_state, train_loss, train_metrics = train_epoch(p, opt_state, kt)
                if has_valid:
                    valid_loss, valid_metrics = valid_epoch(p, kv)
                    watched = valid_loss
                else:
                    valid_loss, valid_metrics = jnp.nan, {n: jnp.nan for n in self.metrics_fn}
                    watched = train_loss
                better = watched < lowest_loss
                best_p = _tree_select(better, p, best_p)
                lowest_loss = jnp.where(better, watched, lowest_loss)
                out = (train_loss, valid_loss, train_metrics, valid_metrics)
                return (p, opt_state, best_p, lowest_loss), out

            keys = jax.random.split(key, n_epochs)
            carry = (ravel(params), opt_state, ravel(best_params), lowest_loss)
            (p, opt_state, best_p, lowest_loss), outs = jax.lax.scan(body, carry, keys)
            return (unravel(p), opt_state, unravel(best_p), lowest_loss), outs

        return jax.jit(chunk)

    def _build_fit_chunk_dynamic(self):
        """Like :meth:`_build_fit_chunk` but with a TRACED epoch count: one
        ``lax.fori_loop`` program with fixed ``_FIT_CHUNK``-sized output
        buffers serves every chunk length fit() ever requests. One compile per
        solver instead of one per distinct span — compiling a fresh scan for
        each remainder/callback boundary measured as the dominant wall-clock
        cost of small and medium fits on the remote-compile TPU environment
        (device time 79 us/epoch on the LV config vs seconds per compile)."""
        train_epoch = self._get_compiled('train_epoch_raw', self._build_train_epoch_raw)
        valid_epoch = self._get_compiled('valid_epoch_raw', self._build_valid_epoch_raw)
        has_valid = self.n_batches['valid'] > 0
        ravel, unravel = self._ravel, self._unravel
        B = _FIT_CHUNK
        metric_names = tuple(self.metrics_fn)

        def chunk(params, opt_state, best_params, lowest_loss, key, n):
            dtype = jnp.asarray(lowest_loss).dtype
            # ONE history buffer: rows = [train_loss, valid_loss,
            # *train_metrics, *valid_metrics, lowest] — the host reads the
            # whole chunk's history (and the running lowest) in a single
            # device->host transfer; per-leaf fetches each pay a full tunnel
            # round trip on networked TPUs
            K = len(metric_names)
            buf = jnp.zeros((2 + 2 * K + 1, B), dtype)

            def body(i, carry):
                p, opt_state, best_p, lowest_loss, buf = carry
                kt, kv = jax.random.split(jax.random.fold_in(key, i))
                p, opt_state, train_loss, train_metrics = train_epoch(p, opt_state, kt)
                if has_valid:
                    valid_loss, valid_metrics = valid_epoch(p, kv)
                    watched = valid_loss
                else:
                    valid_loss = jnp.asarray(jnp.nan, dtype)
                    valid_metrics = {m: jnp.asarray(jnp.nan, dtype) for m in metric_names}
                    watched = train_loss
                better = watched < lowest_loss
                best_p = _tree_select(better, p, best_p)
                lowest_loss = jnp.where(better, watched, lowest_loss)
                col = jnp.stack(
                    [train_loss, valid_loss]
                    + [train_metrics[m] for m in metric_names]
                    + [valid_metrics[m] for m in metric_names]
                    + [lowest_loss]
                ).astype(dtype)
                buf = jax.lax.dynamic_update_slice(buf, col[:, None], (0, i))
                return (p, opt_state, best_p, lowest_loss, buf)

            carry = (ravel(params), opt_state, ravel(best_params), lowest_loss, buf)
            p, opt_state, best_p, lowest_loss, buf = jax.lax.fori_loop(0, n, body, carry)
            return (unravel(p), opt_state, unravel(best_p), lowest_loss), buf

        return jax.jit(chunk)

    # ------------------------------------------------------------- host epochs

    def _generate_batch(self, key):
        r"""Host-side batch generation (for non-jittable generators and the
        ``additional_loss``-inspection API)."""
        self._phase = key
        gen = self.generator[key]
        if key == 'train' and getattr(gen, 'adaptive', False):
            self._batch[key] = gen.sample_scored(
                next_rng_key(), lambda cols: self._residual_scores(self.params, cols))
        else:
            samples = gen.get_examples()
            self._batch[key] = [v.reshape(-1, 1) for v in samples]
        return self._batch[key]

    def _generate_train_batch(self):
        return self._generate_batch('train')

    def _generate_valid_batch(self):
        return self._generate_batch('valid')

    def _run_epoch_host(self, phase):
        """Eager (non-jitted) epoch for dynamically-shaped generators."""
        n_batches = self.n_batches[phase]
        if n_batches <= 0:
            return
        epoch_loss = 0.0
        metric_values = {name: 0.0 for name in self.metrics_fn}
        grads_acc = None
        for _ in range(n_batches):
            cols = self._generate_batch(phase)
            if phase == 'train':
                (loss, metrics), grads = jax.value_and_grad(
                    self._loss_and_metrics, has_aux=True)(self.params, cols)
                if self._closure_style:
                    pf, gf = self._ravel(self.params), self._ravel(grads)
                    value_fn = lambda q: self._loss_and_metrics(self._unravel(q), cols)[0]
                    updates, self.opt_state = self.optimizer.update(
                        gf, self.opt_state, pf, value=loss, grad=gf,
                        value_fn=value_fn)
                    self.params = self._unravel(optax.apply_updates(pf, updates))
                else:
                    grads_acc = grads if grads_acc is None else _tree_add(grads_acc, grads)
            else:
                loss, metrics = self._loss_and_metrics(self.params, cols)
            epoch_loss += float(loss)
            for name in self.metrics_fn:
                metric_values[name] += float(metrics[name])

        if phase == 'train' and not self._closure_style:
            pf, gf = self._ravel(self.params), self._ravel(grads_acc)
            updates, self.opt_state = self.optimizer.update(gf, self.opt_state, pf)
            self.params = self._unravel(optax.apply_updates(pf, updates))

        self._update_history(epoch_loss / n_batches, 'loss', phase)
        for name in self.metrics_fn:
            self._update_history(metric_values[name] / n_batches, name, phase)
        if phase == 'valid' or self.n_batches['valid'] == 0:
            self._update_best(phase)

    def run_train_epoch(self):
        r"""Run a training epoch, update history, and perform gradient descent."""
        self._run_epoch('train')

    def run_valid_epoch(self):
        r"""Run a validation epoch and update history."""
        self._run_epoch('valid')

    def _run_epoch(self, phase):
        if self.n_batches[phase] <= 0:
            return
        self._phase = phase
        if not self.generator[phase].jittable:
            return self._run_epoch_host(phase)

        if phase == 'train':
            epoch_fn = self._get_compiled('train_epoch', self._build_train_epoch)
            self.params, self.opt_state, loss, metrics = epoch_fn(
                self.params, self.opt_state, next_rng_key())
        else:
            epoch_fn = self._get_compiled('valid_epoch', self._build_valid_epoch)
            loss, metrics = epoch_fn(self.params, next_rng_key())

        self._update_history(float(loss), 'loss', phase)
        for name in self.metrics_fn:
            self._update_history(float(metrics[name]), name, phase)
        if phase == 'valid' or self.n_batches['valid'] == 0:
            self._update_best(phase)

    # ------------------------------------------------------------ history/best

    def _update_history(self, value, metric_type, key):
        self._phase = key
        if metric_type == 'loss':
            self.metrics_history[f'{key}_{metric_type}'].append(value)
        elif metric_type in self.metrics_fn:
            self.metrics_history[f'{key}__{metric_type}'].append(value)
        else:
            raise KeyError(f"metric '{metric_type}' not specified")

    def _update_train_history(self, value, metric_type):
        self._update_history(value, metric_type, key='train')

    def _update_valid_history(self, value, metric_type):
        self._update_history(value, metric_type, key='valid')

    def _update_best(self, key):
        current_loss = self.metrics_history[key + '_loss'][-1]
        if (self.lowest_loss is None) or current_loss < self.lowest_loss:
            self.lowest_loss = current_loss
            # params pytrees are immutable; holding the reference is the
            # zero-copy equivalent of the reference's deepcopy (solvers.py:441)
            self.best_params = self.params

    # a parity alias: reference exposes `best_nets`; ours are (nets, best_params)
    @property
    def best_nets(self):
        if self.best_params is None:
            return None
        return list(zip(self.nets, self.best_params))

    # ------------------------------------------------------------------- fit

    def fit(self, max_epochs, callbacks=(), tqdm_file=sys.stderr,
            profile_dir=None, pipeline=True, **kwargs):
        r"""Run multiple epochs of training and validation, update best model.

        When all generators are jittable, epochs are scanned on device in
        chunks (no per-epoch host sync). Callbacks bound the chunks: each
        callback is asked for its ``next_fire_epoch`` hint, epochs up to the
        earliest hint are fused into one on-device scan, and callbacks are
        invoked at the boundary. Callbacks without a hint (arbitrary callables,
        stateful conditions like ``RepeatedMetric*``) force the per-epoch path.

        :param max_epochs: Number of epochs to run.
        :param callbacks: callables accepting the solver instance as only argument.
        :param tqdm_file: file for the tqdm progress bar; None disables tqdm.
        :param profile_dir: if set, wrap the whole run in ``jax.profiler.trace``
            writing a TensorBoard-viewable trace to this directory (the
            profiling hook SURVEY.md §5 specifies; the reference has only a
            tqdm bar, ``solvers.py:475-484``).
        :param pipeline: speculatively dispatch each next device chunk before
            fetching the previous chunk's history and running the callbacks,
            so callback work (monitor draws, checkpoints, ...) overlaps with
            device compute. Callback cadence, committed epochs, and best
            tracking are identical to ``pipeline=False``; while no callback
            mutates training state or consumes the global PRNG stream the
            numerical stream is bitwise-identical too. A mutating or
            key-drawing callback (SetLossFn/SetOptimizer/Eve/manual edits)
            causes the speculative chunk to be discarded and re-dispatched
            from the mutated state — still correct, but the discard consumes
            one PRNG key, so sampled points after that epoch differ from an
            unpipelined run. Defaults to True.
        """
        if profile_dir is not None:
            import jax

            with jax.profiler.trace(str(profile_dir)):
                return self.fit(max_epochs, callbacks=callbacks,
                                tqdm_file=tqdm_file, profile_dir=None,
                                pipeline=pipeline, **kwargs)

        self._stop_training = False
        self._max_local_epoch = max_epochs
        self.local_epoch = 0
        self._uncommitted_epochs = 0  # in case a prior fit() errored mid-plan
        # chunk sizes dispatched this fit() call (diagnostics/tests)
        self._fit_chunk_sizes = []
        # speculative-pipeline diagnostics: chunks consumed vs discarded
        self._fit_spec_hits = 0
        self._fit_spec_misses = 0

        monitor = kwargs.pop('monitor', None)
        if monitor:
            warnings.warn("Passing `monitor` is deprecated, "
                          "use a MonitorCallback and pass a list of callbacks instead")
            callbacks = [monitor.to_callback()] + list(callbacks)
        if kwargs:
            raise ValueError(f'Unknown keyword argument(s): {list(kwargs.keys())}')

        pbar = None
        if tqdm is not None and tqdm_file is not None:
            pbar = tqdm(total=max_epochs, desc='Training Progress', colour='blue',
                        file=tqdm_file, dynamic_ncols=True)
        # Speculatively dispatched next chunk (see _plan_chunk): the device
        # computes epochs past the current callback boundary WHILE the host
        # fetches the history and runs the callbacks. Consumed next iteration
        # if still valid; silently discarded if a callback mutated training
        # state (the chunk's device work is wasted, semantics are unchanged).
        pending = None
        try:
            while self.local_epoch < max_epochs:
                if self._stop_training:
                    break
                # recomputed every iteration: a callback may hot-swap a
                # generator (set_generator) or n_batches mid-fit, and a stale
                # snapshot would keep the compiled chunk path and constant-fold
                # a non-jittable generator's one host draw into every epoch
                jittable = (
                    self.generator['train'].jittable
                    and (self.n_batches['valid'] == 0
                         or self.generator['valid'].jittable)
                )
                n = self._plan_chunk(callbacks, max_epochs) if jittable else 1
                if n > 1 or (jittable and not callbacks):
                    if pending is not None and self._pending_valid(pending, n):
                        outs, buf = pending['outs'], pending['buf']
                        self._fit_spec_hits += 1
                    else:
                        if pending is not None:
                            self._fit_spec_misses += 1
                        outs, buf = self._dispatch_chunk(n)
                    pending = None
                    self.local_epoch += n
                    # queue the next chunk on the device BEFORE the blocking
                    # history fetch below — planned against the post-chunk
                    # epoch counters (history itself is not extended yet)
                    if pipeline and not self._stop_training:
                        try:
                            self._uncommitted_epochs = n
                            n_next = (self._plan_chunk(callbacks, max_epochs)
                                      if self.local_epoch < max_epochs else 0)
                        finally:
                            self._uncommitted_epochs = 0
                        if n_next > 1 or (n_next == 1 and not callbacks):
                            pending = {
                                'n': n_next,
                                'outs_buf': self._dispatch_chunk(
                                    n_next, outs[0], outs[1], outs[2], outs[3]),
                                'in_params': outs[0], 'in_opt': outs[1],
                                'in_best': outs[2],
                                'compiled': self._compiled,
                                'gens': (self.generator['train'],
                                         self.generator['valid']),
                                'metrics': self.metrics_fn,
                                # global-PRNG state right after the speculative
                                # draw: a callback that consumes keys (e.g. its
                                # own sampling) advances the store, and the
                                # pre-drawn chunk would then train on a
                                # different stream than an unpipelined run
                                'key_state': GLOBAL_KEYS._key,
                            }
                            pending['outs'], pending['buf'] = pending.pop('outs_buf')
                    self._commit_chunk(outs, buf, n)  # non-blocking (lazy history)
                    if pending is not None:
                        pending['lowest'] = self._lowest_raw
                else:
                    if pending is not None:
                        self._fit_spec_misses += 1
                        pending = None
                    self.local_epoch += 1
                    self.run_train_epoch()
                    self.run_valid_epoch()
                for cb in callbacks:
                    cb(self)
                if pbar is not None:
                    pbar.update(n)
            if pending is not None:  # stopped with a speculative chunk in flight
                self._fit_spec_misses += 1
        finally:
            if pbar is not None:
                pbar.close()
            # no callback worker may outlive fit(): a background monitor draw
            # still rendering after return would race user-side matplotlib
            # operations on the same figure
            for cb in callbacks:
                flush = getattr(cb, 'flush', None)
                if callable(flush):
                    flush()

    def _plan_chunk(self, callbacks, max_epochs):
        """Number of epochs to fuse into the next on-device chunk."""
        boundary = min(self._next_callback_fire(callbacks), max_epochs)
        return min(max(1, boundary - self.local_epoch), _FIT_CHUNK)

    def _pending_valid(self, pending, n):
        """A speculatively dispatched chunk is usable iff no callback mutated
        anything the dispatch depended on: the carried state objects, the
        compiled-function cache (loss_fn/optimizer/n_batches hot-swaps
        replace it via ``_invalidate_compiled``), the generators, the metric
        set, the best-tracking scalar — and the chunk length still matches
        the freshly planned boundary. The global PRNG stream is part of the
        dependency set: a callback drawing keys means the pre-drawn chunk
        sampled a different stream than an unpipelined run would."""
        return (pending['n'] == n
                and self.params is pending['in_params']
                and self.opt_state is pending['in_opt']
                and self.best_params is pending['in_best']
                and self._compiled is pending['compiled']
                and self.generator['train'] is pending['gens'][0]
                and self.generator['valid'] is pending['gens'][1]
                and self.metrics_fn is pending['metrics']
                and GLOBAL_KEYS._key is pending.get('key_state')
                # identity, not equality: the raw lowest is the exact device
                # scalar (or cached float) `_commit_chunk` stored; a callback
                # assigning lowest_loss replaces the object -> discard. Never
                # forces a device sync the way `==` on a device scalar would.
                and self._lowest_raw is pending.get('lowest'))

    def _next_callback_fire(self, callbacks):
        """Earliest local epoch any callback may fire at (``inf`` if none do).

        Plain callables and callbacks returning ``None`` pin the next fire to
        the very next epoch (= per-epoch invocation, the reference semantics,
        ``solvers.py:496-497``)."""
        nxt = math.inf
        for cb in callbacks:
            fn = getattr(cb, 'next_fire_epoch', None)
            hint = fn(self) if fn is not None else None
            if hint is None:
                return self.local_epoch + 1
            nxt = min(nxt, hint)
        return nxt

    def _dispatch_chunk(self, n, params=None, opt_state=None,
                        best_params=None, lowest=None):
        """Dispatch ``n`` fused epochs to the device WITHOUT blocking; returns
        ``(outs, buf)`` futures. With explicit state arguments (themselves
        allowed to be device futures of a previous chunk) the dispatch chains
        on-device — this is what lets ``fit`` queue the next chunk before the
        previous one's history has even arrived on the host."""
        if params is None:
            dtype = get_default_dtype()
            params, opt_state = self.params, self.opt_state
            if self.best_params is None:
                best_params = self.params
                lowest = jnp.asarray(jnp.inf, dtype=dtype)
            else:
                best_params = self.best_params
                # `_lowest_raw` may still be a device scalar from a lazily
                # committed chunk; jnp.asarray casts on device without a sync
                lowest = jnp.asarray(self._lowest_raw, dtype=dtype)
        chunk_fn = self._get_compiled('fit_chunk_dyn', self._build_fit_chunk_dynamic)
        return chunk_fn(params, opt_state, best_params, lowest,
                        next_rng_key(), n)

    def _commit_chunk(self, outs, buf, n):
        """Fold the chunk's results into solver state WITHOUT any device->host
        transfer: params/opt/best stay device futures, the running lowest is
        kept as a device scalar, and the packed history buffer is queued for
        a lazy fetch on first `metrics_history` read. Counter-only callbacks
        (the common cadence conditions) never read it, so their chunk
        boundaries cost only dispatch, not a blocking tunnel round trip."""
        params, opt_state, best_params, lowest = outs
        self.params, self.opt_state = params, opt_state
        self.best_params = best_params
        self._lowest_raw = lowest  # == buf[-1, n-1]; floated lazily on read
        self._lowest_float = None
        self._pending_history.append(
            (buf, n, tuple(self.metrics_fn), self.n_batches['valid'] > 0))
        self._pending_n += n
        self._fit_chunk_sizes.append(n)

    def _run_chunk_on_device(self, n):
        """Run ``n`` epochs fused into one on-device scan; update params,
        optimizer state, best tracking, and the metrics history."""
        outs, buf = self._dispatch_chunk(n)
        self._commit_chunk(outs, buf, n)

    # ------------------------------------------------------------- inspection

    @abstractmethod
    def get_solution(self, copy=True, best=True):
        r"""Get a (callable) solution object.

        :param copy: Whether to copy the networks so subsequent training
            doesn't affect the solution. Defaults to True. (Parameters are
            immutable pytrees, so this is metadata-only.)
        :param best: Whether to return the lowest-loss solution instead of the
            most recent one. Defaults to True.
        :rtype: BaseSolution
        """
        pass  # pragma: no cover

    def _get_internal_variables(self):
        return {
            "metrics": self.metrics_fn,
            "n_batches": self.n_batches,
            "best_nets": self.best_nets,
            "best_params": self.best_params,
            "criterion": self.loss_fn,
            "loss_fn": self.loss_fn,
            "conditions": self.conditions,
            "global_epoch": self.global_epoch,
            "lowest_loss": self.lowest_loss,
            "n_funcs": self.n_funcs,
            "nets": self.nets,
            "params": self.params,
            "optimizer": self.optimizer,
            "opt_state": self.opt_state,
            "diff_eqs": self.diff_eqs,
            "generator": self.generator,
            "train_generator": self.generator['train'],
            "valid_generator": self.generator['valid'],
        }

    @deprecated_alias(param_names='var_names')
    def get_internals(self, var_names=None, return_type='list'):
        r"""Return internal variable(s) of the solver (reference ``solvers.py:556-585``)."""
        available_variables = self._get_internal_variables()
        if var_names == "all" or var_names is None:
            return available_variables
        if isinstance(var_names, str):
            return available_variables[var_names]
        if return_type == 'list':
            return [available_variables[name] for name in var_names]
        elif return_type == "dict":
            return {name: available_variables[name] for name in var_names}
        else:
            raise ValueError(f"unrecognized return_type = {return_type}")

    def additional_loss(self, residual, funcs, coords):
        r"""Additional loss terms; override in subclasses. Receives the
        residual Field, the list of function Fields, and coordinate Fields.
        Must return a scalar.

        .. note::
            When ``residual_weights`` is set, the ``residual`` argument is the
            *weight-scaled* residual (each equation's column multiplied by
            ``sqrt(w_k)``) — the same Field the main loss sees. Use
            :meth:`get_residuals` for raw equation residuals.
        """
        return 0.0

    def get_residuals(self, *coords, to_numpy=False, best=True, no_reshape=False):
        r"""Evaluate the residuals of the differential equation at given points.

        :param coords: coordinate arrays (numpy or JAX), any (equal) shape.
        :param to_numpy: return numpy arrays instead of JAX arrays.
        :param best: use the lowest-loss parameters. Defaults to True.
        :param no_reshape: skip reshaping output back to the input shape.
        :return: residual(s) evaluated at given points.
        """
        coords = [jnp.asarray(c, dtype=get_default_dtype()) for c in coords]
        original_shape = coords[0].shape
        cols = [c.reshape(-1, 1) for c in coords]
        params = self.best_params if best else self.params
        if params is not None:
            params = self._expand_params(params)
        if params is None:
            raise RuntimeError(
                "The best parameters are not available; check if you disabled validation "
                "and used best=True")
        points = jnp.concatenate(cols, axis=1)
        coord_fields = coords_from_points(points)
        funcs = [
            self.compute_func_val(net, p, cond, *coord_fields)
            for net, p, cond in zip(self.nets, params, self.conditions)
        ]
        residuals = self.diff_eqs(*funcs, *coord_fields)
        if isinstance(residuals, Field):
            residuals = [residuals]
        values = [r.value for r in residuals]
        if not no_reshape:
            values = [v.reshape(*original_shape) for v in values]
        if to_numpy:
            values = [np.asarray(v) for v in values]
        return values if len(values) > 1 else values[0]


class BaseSolution(ABC):
    r"""A callable solution to a PDE/ODE (system).

    :param nets: list of network modules (or a single module shared across
        conditions, for backward compatibility with single-net setups).
    :param params: list of parameter pytrees matching ``nets``.
    :param conditions: list of conditions enforced on the solution.
    """

    def __init__(self, nets, params, conditions):
        if params is None:
            raise RuntimeError("The parameters cannot be None; check if you disabled validation "
                               "and used `best=True` with `get_solution` / `get_residuals`")
        if not isinstance(nets, (list, tuple)):
            nets = [nets] * len(conditions)
            params = [params] * len(conditions)
        self.nets = list(nets)
        self.params = list(params)
        self.conditions = list(conditions)
        self._eval_cache = None

    @abstractmethod
    def _compute_u(self, net, params, condition, *coord_fields):
        pass  # pragma: no cover

    def _eval(self, params_list, points):
        coord_fields = coords_from_points(points)
        return [
            self._compute_u(net, p, cond, *coord_fields).value
            for net, p, cond in zip(self.nets, params_list, self.conditions)
        ]

    @deprecated_alias(as_type='to_numpy')
    def __call__(self, *coords, to_numpy=False, no_reshape=False):
        r"""Evaluate the solution at given points.

        :param coords: tuple of coordinate arrays (numpy or JAX), equal shapes.
        :param to_numpy: return ``numpy.ndarray`` instead of JAX arrays.
        :param no_reshape: skip reshaping output back to the input shape.
        """
        coords = [jnp.asarray(c, dtype=get_default_dtype()) for c in coords]
        original_shape = coords[0].shape
        cols = [c.reshape(-1, 1) for c in coords]
        if isinstance(to_numpy, str):
            if to_numpy in ('tf', 'torch', 'jax'):
                to_numpy = False
            elif to_numpy == 'np':
                to_numpy = True
            else:
                raise ValueError(f"Unrecognized `as_type` option: '{to_numpy}'")

        if self._eval_cache is None:
            self._eval_cache = jax.jit(self._eval)
        us = self._eval_cache(self.params, jnp.concatenate(cols, axis=1))
        if not no_reshape:
            us = [u.reshape(*original_shape) for u in us]
        if to_numpy:
            us = [np.asarray(u) for u in us]
        return us if len(self.nets) > 1 else us[0]

    def export(self, n_coords, path=None, dtype=None):
        """Serialize the solution evaluator as a portable StableHLO artifact
        (``jax.export``) with a symbolic batch dimension — the TPU-native
        deployment/serving counterpart of the reference's pickled solutions.

        :param n_coords: number of coordinate inputs (1 for ODE solutions,
            2 for 2-D PDEs, 3 for spherical, ...).
        :param path: optional file to write the artifact to.
        :param dtype: input dtype baked into the artifact (defaults to the
            current default dtype).
        :return: the serialized bytes.
        """
        from jax import export as jax_export
        dtype = dtype or get_default_dtype()
        params = self.params

        def evaluate(points):
            return tuple(self._eval(params, points))

        (batch,) = jax_export.symbolic_shape("batch")
        exported = jax_export.export(jax.jit(evaluate))(
            jax.ShapeDtypeStruct((batch, n_coords), dtype))
        blob = exported.serialize()
        if path is not None:
            with open(path, 'wb') as f:
                f.write(blob)
        return blob


def load_exported_solution(path_or_bytes):
    """Load a solution artifact written by :meth:`BaseSolution.export`.

    :return: a callable ``(points (N, d)) -> tuple of (N, 1) arrays``.
    """
    from jax import export as jax_export
    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, 'rb') as f:
            blob = f.read()
    exported = jax_export.deserialize(blob)
    return exported.call


class GenericSolution(BaseSolution):
    def _compute_u(self, net, params, condition, *coord_fields):
        return condition.enforce(net, params, *coord_fields)


class GenericSolver(BaseSolver):
    r"""Dimension-agnostic solver: the user supplies ``n_input_units``
    (reference ``solvers.py:728-758``)."""

    def get_solution(self, copy=True, best=True):
        r"""Get a (callable) solution object."""
        params = self.best_params if best else self.params
        if params is not None:
            params = self._expand_params(params)
        conditions = self.conditions
        if copy:
            conditions = deepcopy(conditions)
        return GenericSolution(self.nets, params, conditions)


class Solution1D(BaseSolution):
    def _compute_u(self, net, params, condition, ts):
        return condition.enforce(net, params, ts)


class Solver1D(BaseSolver):
    r"""A solver class for solving ODEs (single-input differential equations)
    (reference ``solvers.py:1020-1181``).

    :param ode_system: maps funcs and the time coordinate to residuals.
    :param conditions: list of conditions, one per target function.
    :param t_min: lower bound of time domain (ignored if both generators given).
    :param t_max: upper bound of time domain (ignored if both generators given).
    """

    def __init__(self, ode_system, conditions, t_min=None, t_max=None,
                 nets=None, train_generator=None, valid_generator=None, analytic_solutions=None,
                 optimizer=None, loss_fn=None, n_batches_train=1, n_batches_valid=4,
                 metrics=None, n_output_units=1, key=None, mesh=None, eval_mode=None,
                 residual_weights=None,
                 batch_size=None, shuffle=None):
        if train_generator is None or valid_generator is None:
            if t_min is None or t_max is None:
                raise ValueError(
                    f"Either generator is not provided, t_min and t_max should be both provided: \n"
                    f"got t_min={t_min}, t_max={t_max}, "
                    f"train_generator={train_generator}, valid_generator={valid_generator}")
        if train_generator is None:
            train_generator = Generator1D(32, t_min=t_min, t_max=t_max, method='equally-spaced-noisy')
        if valid_generator is None:
            valid_generator = Generator1D(32, t_min=t_min, t_max=t_max, method='equally-spaced')

        self.t_min, self.t_max = t_min, t_max
        super().__init__(
            diff_eqs=ode_system, conditions=conditions, nets=nets,
            train_generator=train_generator, valid_generator=valid_generator,
            analytic_solutions=analytic_solutions, optimizer=optimizer, loss_fn=loss_fn,
            n_batches_train=n_batches_train, n_batches_valid=n_batches_valid,
            metrics=metrics, n_input_units=1, n_output_units=n_output_units,
            key=key, mesh=mesh, eval_mode=eval_mode, residual_weights=residual_weights,
            shuffle=shuffle, batch_size=batch_size,
        )

    def get_solution(self, copy=True, best=True):
        r"""Get a (callable) solution object evaluated as ``solution(ts)``."""
        params = self.best_params if best else self.params
        if params is not None:
            params = self._expand_params(params)
        conditions = deepcopy(self.conditions) if copy else self.conditions
        return Solution1D(self.nets, params, conditions)

    def _get_internal_variables(self):
        d = super()._get_internal_variables()
        d.update({'t_min': self.t_min, 't_max': self.t_max})
        return d


class Solution2D(BaseSolution):
    def _compute_u(self, net, params, condition, xs, ys):
        return condition.enforce(net, params, xs, ys)


class Solver2D(BaseSolver):
    r"""A solver class for solving PDEs in 2 dimensions
    (reference ``solvers.py:1427-1593``).

    :param pde_system: maps funcs and (x, y) coordinates to residuals.
    :param conditions: list of conditions, one per target function.
    :param xy_min: lower bounds ``(x_0, y_0)`` (ignored if both generators given).
    :param xy_max: upper bounds ``(x_1, y_1)``.
    """

    def __init__(self, pde_system, conditions, xy_min=None, xy_max=None,
                 nets=None, train_generator=None, valid_generator=None, analytic_solutions=None,
                 optimizer=None, loss_fn=None, n_batches_train=1, n_batches_valid=4,
                 metrics=None, n_output_units=1, key=None, mesh=None, eval_mode=None,
                 residual_weights=None,
                 batch_size=None, shuffle=None):
        if train_generator is None or valid_generator is None:
            if xy_min is None or xy_max is None:
                raise ValueError(
                    f"Either generator is not provided, xy_min and xy_max should be both provided: \n"
                    f"got xy_min={xy_min}, xy_max={xy_max}, "
                    f"train_generator={train_generator}, valid_generator={valid_generator}")
        if train_generator is None:
            train_generator = Generator2D((32, 32), xy_min=xy_min, xy_max=xy_max, method='equally-spaced-noisy')
        if valid_generator is None:
            valid_generator = Generator2D((32, 32), xy_min=xy_min, xy_max=xy_max, method='equally-spaced')

        self.xy_min, self.xy_max = xy_min, xy_max
        super().__init__(
            diff_eqs=pde_system, conditions=conditions, nets=nets,
            train_generator=train_generator, valid_generator=valid_generator,
            analytic_solutions=analytic_solutions, optimizer=optimizer, loss_fn=loss_fn,
            n_batches_train=n_batches_train, n_batches_valid=n_batches_valid,
            metrics=metrics, n_input_units=2, n_output_units=n_output_units,
            key=key, mesh=mesh, eval_mode=eval_mode, residual_weights=residual_weights,
            shuffle=shuffle, batch_size=batch_size,
        )

    def get_solution(self, copy=True, best=True):
        r"""Get a (callable) solution object evaluated as ``solution(xs, ys)``."""
        params = self.best_params if best else self.params
        if params is not None:
            params = self._expand_params(params)
        conditions = deepcopy(self.conditions) if copy else self.conditions
        return Solution2D(self.nets, params, conditions)

    def _get_internal_variables(self):
        d = super()._get_internal_variables()
        d.update({'xy_min': self.xy_min, 'xy_max': self.xy_max})
        return d


class SolutionSpherical(BaseSolution):
    def _compute_u(self, net, params, condition, rs, thetas, phis):
        return condition.enforce(net, params, rs, thetas, phis)


class SolutionSphericalHarmonics(SolutionSpherical):
    r"""A solution whose radial networks produce harmonics coefficients
    expanded against a (theta, phi) basis (reference ``solvers.py:982-1012``).

    :param harmonics_fn: maps (theta, phi) Fields to an (N, K) basis Field.
    """

    def __init__(self, nets, params, conditions, max_degree=None, harmonics_fn=None):
        super().__init__(nets, params, conditions)
        if (harmonics_fn is None) and (max_degree is None):
            raise ValueError("harmonics_fn should be specified")
        if max_degree is not None:
            warnings.warn(
                "`max_degree` is DEPRECATED; pass `harmonics_fn` instead, which takes precedence",
                FutureWarning,
            )
            from .function_basis import RealSphericalHarmonics
            self.harmonics_fn = RealSphericalHarmonics(max_degree=max_degree)
        if harmonics_fn is not None:
            self.harmonics_fn = harmonics_fn

    def _compute_u(self, net, params, condition, rs, thetas, phis):
        products = condition.enforce(net, params, rs) * self.harmonics_fn(thetas, phis)
        return products.sum(axis=1, keepdims=True)


class SolverSpherical(BaseSolver):
    r"""A solver class for PDEs in spherical coordinates
    (reference ``solvers.py:761-974``).

    :param pde_system: maps funcs and (r, theta, phi) coordinates to residuals.
    :param conditions: list of conditions for each target function.
    :param r_min: radius of interior boundary (used for default generators).
    :param r_max: radius of exterior boundary.
    :param enforcer: optional override of signature
        ``enforcer(net, params, cond, coords) -> Field``.
    """

    def __init__(self, pde_system, conditions, r_min=None, r_max=None,
                 nets=None, train_generator=None, valid_generator=None, analytic_solutions=None,
                 optimizer=None, loss_fn=None, n_batches_train=1, n_batches_valid=4,
                 metrics=None, enforcer=None, n_output_units=1, key=None, mesh=None, eval_mode=None,
                 residual_weights=None,
                 shuffle=None, batch_size=None):
        if train_generator is None or valid_generator is None:
            if r_min is None or r_max is None:
                raise ValueError(
                    f"Either generator is not provided, r_min and r_max should be both provided: "
                    f"got r_min={r_min}, r_max={r_max}, train_generator={train_generator}, "
                    f"valid_generator={valid_generator}")
        if train_generator is None:
            train_generator = GeneratorSpherical(512, r_min, r_max, method='equally-spaced-noisy')
        if valid_generator is None:
            valid_generator = GeneratorSpherical(512, r_min, r_max, method='equally-spaced-noisy')

        self.r_min, self.r_max = r_min, r_max
        self.enforcer = enforcer

        super().__init__(
            diff_eqs=pde_system, conditions=conditions, nets=nets,
            train_generator=train_generator, valid_generator=valid_generator,
            analytic_solutions=analytic_solutions, optimizer=optimizer, loss_fn=loss_fn,
            n_batches_train=n_batches_train, n_batches_valid=n_batches_valid,
            metrics=metrics, n_input_units=3, n_output_units=n_output_units,
            key=key, mesh=mesh, eval_mode=eval_mode, residual_weights=residual_weights,
            shuffle=shuffle, batch_size=batch_size,
        )

    def _auto_enforce(self, net, params, cond, *coordinates):
        r"""Enforce the condition with as many coordinates as its
        ``parameterize`` accepts (enables radial-only basis nets; reference
        ``solvers.py:894-916``)."""
        if self.enforcer:
            return self.enforcer(net, params, cond, coordinates)

        if cond.__class__.enforce == BaseCondition.enforce:
            sig = inspect.signature(cond.parameterize)
            offset = 1  # the `output_tensor` argument
        else:
            sig = inspect.signature(cond.enforce)
            offset = 2  # the `net` and `params` arguments
        if any(p.kind == inspect.Parameter.VAR_POSITIONAL for p in sig.parameters.values()):
            # var-positional (e.g. NoCondition's *input_tensors): takes all coords
            return cond.enforce(net, params, *coordinates)
        n_coords = len(sig.parameters) - offset
        coordinates = coordinates[:n_coords]
        return cond.enforce(net, params, *coordinates)

    def compute_func_val(self, net, params, cond, *coordinates):
        return self._auto_enforce(net, params, cond, *coordinates)

    def get_solution(self, copy=True, best=True, harmonics_fn=None):
        r"""Get a (callable) solution object; with ``harmonics_fn`` the radial
        coefficients are expanded against the basis."""
        params = self.best_params if best else self.params
        if params is not None:
            params = self._expand_params(params)
        conditions = deepcopy(self.conditions) if copy else self.conditions
        if harmonics_fn:
            return SolutionSphericalHarmonics(self.nets, params, conditions, harmonics_fn=harmonics_fn)
        return SolutionSpherical(self.nets, params, conditions)

    def _get_internal_variables(self):
        d = super()._get_internal_variables()
        d.update({'r_min': self.r_min, 'r_max': self.r_max, 'enforcer': self.enforcer})
        return d


class BundleSolution1D(BaseSolution):
    def _compute_u(self, net, params, condition, *ts):
        return condition.enforce(net, params, *ts)


class BundleSolver1D(BaseSolver):
    r"""Solves an ODE *bundle* over a (t, theta_1, ..., theta_n) hypercube,
    where thetas are equation parameters and/or condition values
    (reference ``solvers.py:1189-1419``).

    :param eq_param_index: indices of bundle parameters that appear in the
        equation; they are appended to the equation's arguments in order.
    :param theta_min: per-theta lower bounds.
    :param theta_max: per-theta upper bounds.
    """

    def __init__(self, ode_system, conditions, t_min, t_max,
                 theta_min=None, theta_max=None, eq_param_index=(),
                 nets=None, train_generator=None, valid_generator=None, analytic_solutions=None,
                 optimizer=None, loss_fn=None, n_batches_train=1, n_batches_valid=4,
                 metrics=None, n_output_units=1, key=None, mesh=None, eval_mode=None,
                 residual_weights=None,
                 batch_size=None, shuffle=None):
        if train_generator is None or valid_generator is None:
            if t_min is None or t_max is None:
                raise ValueError(
                    f"Either generator is not provided, t_min and t_max should be both provided: \n"
                    f"got t_min={t_min}, t_max={t_max}, "
                    f"train_generator={train_generator}, valid_generator={valid_generator}")

        if isinstance(theta_min, (float, int)):
            theta_min = (theta_min,)
        elif theta_min is None:
            theta_min = ()
        if isinstance(theta_max, (float, int)):
            theta_max = (theta_max,)
        elif theta_max is None:
            theta_max = ()
        if len(theta_min) != len(theta_max):
            raise ValueError(
                f"length of theta_min and theta_max must be equal, got {len(theta_min)} != {len(theta_max)}"
            )

        r_min = (t_min,) + tuple(theta_min)
        r_max = (t_max,) + tuple(theta_max)
        n_input_units = len(r_min)

        if train_generator is None:
            train_generator = Generator1D(32, t_min=t_min, t_max=t_max, method='equally-spaced-noisy')
            for i in range(n_input_units - 1):
                train_generator ^= Generator1D(32, t_min=r_min[i + 1], t_max=r_max[i + 1],
                                               method='equally-spaced-noisy')
        if valid_generator is None:
            valid_generator = Generator1D(32, t_min=t_min, t_max=t_max, method='equally-spaced')
            for i in range(n_input_units - 1):
                valid_generator ^= Generator1D(32, t_min=r_min[i + 1], t_max=r_max[i + 1],
                                               method='equally-spaced')

        self.r_min, self.r_max = r_min, r_max

        N_FUNCTIONS = len(conditions)
        N_COORDS = 1
        eq_param_index = tuple(N_FUNCTIONS + N_COORDS + idx for idx in eq_param_index)
        self.eq_param_index = eq_param_index

        def _diff_eqs_wrapper(*variables):
            funcs_and_coords = variables[:N_FUNCTIONS + N_COORDS]
            eq_params = tuple(variables[idx] for idx in eq_param_index)
            return ode_system(*funcs_and_coords, *eq_params)

        super().__init__(
            diff_eqs=_diff_eqs_wrapper, conditions=conditions, nets=nets,
            train_generator=train_generator, valid_generator=valid_generator,
            analytic_solutions=analytic_solutions, optimizer=optimizer, loss_fn=loss_fn,
            n_batches_train=n_batches_train, n_batches_valid=n_batches_valid,
            metrics=metrics, n_input_units=n_input_units, n_output_units=n_output_units,
            key=key, mesh=mesh, eval_mode=eval_mode, residual_weights=residual_weights,
            shuffle=shuffle, batch_size=batch_size,
        )

    def get_solution(self, copy=True, best=True):
        r"""Get a (callable) solution object evaluated as
        ``solution(ts, theta_1, ..., theta_n)``."""
        params = self.best_params if best else self.params
        if params is not None:
            params = self._expand_params(params)
        conditions = deepcopy(self.conditions) if copy else self.conditions
        return BundleSolution1D(self.nets, params, conditions)

    def _get_internal_variables(self):
        d = super()._get_internal_variables()
        d.update({'r_min': self.r_min, 'r_max': self.r_max, 'eq_param_index': self.eq_param_index})
        return d
