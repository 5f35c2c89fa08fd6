r"""Callbacks: the training control plane.

Capability parity with the reference's ``neurodiffeq/callbacks.py`` (action
callbacks Monitor/Stop/Checkpoint/Report/Eve/Tensorboard/SetLossFn/
SetOptimizer/ProgressBar and the full condition-callback boolean algebra
``& | ~ ^`` with epoch/metric/random predicates, ``callbacks.py:48-833``).

Callbacks receive the solver once per epoch (the per-epoch ``fit`` path runs
automatically whenever callbacks are present). Actions adapted to the
functional design: ``SetOptimizer`` takes an optax transformation (or factory),
checkpointing dumps the numpy-ified parameter/optimizer pytrees with dill.
"""
import os
import math
import random
import logging
import warnings
from abc import ABC, abstractmethod
from datetime import datetime

import numpy as np

from .utils import safe_mkdir as _safe_mkdir
from ._version_utils import deprecated_alias, warn_deprecate_class

__all__ = [
    'BaseCallback', 'ActionCallback', 'ConditionCallback',
    'MonitorCallback', 'StopCallback', 'CheckpointCallback', 'ReportCallback',
    'EveCallback', 'AutoResidualWeightCallback', 'SimpleTensorboardCallback',
    'SetLossFn', 'SetOptimizer', 'ProgressBarCallBack',
    'AndCallback', 'OrCallback', 'NotCallback', 'XorCallback',
    'TrueCallback', 'FalseCallback',
    'OnFirstLocal', 'OnFirstGlobal', 'OnLastLocal',
    'PeriodLocal', 'PeriodGlobal', 'ClosedIntervalLocal', 'ClosedIntervalGlobal',
    'Random', 'RepeatedMetricUp', 'RepeatedMetricDown', 'RepeatedMetricConverge',
    'RepeatedMetricDiverge', 'RepeatedMetricBelow', 'RepeatedMetricAbove',
    'ReportOnFitCallback', 'SetCriterion',
]


class _LoggerMixin:
    r"""Mix-in providing a standard Python ``logger``.

    :param logger: The logger or its name (str). Defaults to the 'root' logger.
    """

    def __init__(self, logger=None):
        if not logger:
            self.logger = logging.getLogger('root')
        elif isinstance(logger, str):
            self.logger = logging.getLogger(logger)
        else:
            self.logger = logger


class BaseCallback(ABC, _LoggerMixin):
    r"""Base class of all callbacks; subclass ``ActionCallback`` or
    ``ConditionCallback`` instead of this."""

    def __init__(self, logger=None):
        _LoggerMixin.__init__(self, logger=logger)

    @abstractmethod
    def __call__(self, solver):
        pass  # pragma: no cover

    def next_fire_epoch(self, solver):
        r"""Earliest *local* epoch (> ``solver.local_epoch``) at which this
        callback may need to be invoked.

        Used by ``BaseSolver.fit`` to fuse all epochs up to the next callback
        boundary into one on-device scan (no per-epoch host round-trip).
        Return values:

        - an int/float epoch number: the callback is guaranteed NOT to need
          invocation at any epoch strictly before it (a sound lower bound);
        - ``math.inf``: never fires again within this ``fit`` call;
        - ``None``: unknown — the callback must be invoked every epoch
          (the default, and required for stateful conditions such as
          ``RepeatedMetric*`` whose ``condition`` mutates internal counters).
        """
        return None


class ActionCallback(BaseCallback):
    r"""Base class of action callbacks (callbacks that *do* something)."""

    def flush(self):
        """Wait for any asynchronous work this callback started (no-op here;
        ``MonitorCallback(background=True)`` overrides). ``fit()`` calls this
        on every callback before returning so no worker outlives training."""

    def conditioned_on(self, condition_callback):
        if not isinstance(condition_callback, ConditionCallback):
            raise TypeError(f'{condition_callback} is not an instance of ConditionCallback')
        return condition_callback.set_action_callback(self)


class MonitorCallback(ActionCallback):
    r"""Updates monitor plots (and optionally saves figures to disk).

    :param monitor: The underlying monitor responsible for plotting solutions.
    :param fig_dir: Directory for saving monitor figs; not saved if omitted.
    :param format: Figure format ('png' default).
    :param background: If True, draw on a worker thread instead of stalling
        training (parameters are immutable pytrees, so the snapshot handed to
        the thread is race-free by construction). At most one draw is in
        flight; fires arriving while the worker is busy are SKIPPED (the live
        plot simply lags), except the final local epoch, which always joins
        and draws synchronously so the last state is rendered. Matplotlib is
        only ever touched by one thread at a time. Default False (reference
        semantics: the draw completes before training resumes).
    """

    def __init__(self, monitor, fig_dir=None, format=None, logger=None,
                 background=False, **kwargs):
        super().__init__(logger=logger)
        self.monitor = monitor
        self.fig_dir = fig_dir
        self.format = format or 'png'
        self.background = background
        self._worker = None

        for kw in ['check_against_local', 'check_against']:
            if kwargs.pop(kw, None) is not None:
                warnings.warn(
                    f'`Passing {kw}` is deprecated and ignored, '
                    f'use a `PeriodLocal` or `PeriodGlobal` to control how frequently the callback is run',
                    FutureWarning,
                )
        if kwargs.pop('repaint_last', None) is not None:
            warnings.warn(
                'Passing repaint_last is deprecated and ignored, '
                'Use a `OnLastLocal` callback to plot on last epoch',
                FutureWarning,
            )
        if kwargs:
            raise ValueError(f'Unknown keyword argument(s): {list(kwargs.keys())}')

        if fig_dir:
            _safe_mkdir(fig_dir)

    def __call__(self, solver):
        # snapshot everything the draw reads: params pytrees are immutable,
        # the history list is copied, so later training can't race the worker
        nets = solver.nets
        conditions = solver.conditions
        params = solver._expand_params(solver.params)
        history = {k: list(v) for k, v in solver.metrics_history.items()}
        global_epoch = solver.global_epoch

        is_last = solver.local_epoch >= getattr(solver, '_max_local_epoch', 0)
        # GUI matplotlib backends (TkAgg/QtAgg/...) must be driven from the
        # main thread; background draws are only safe under Agg-style ones.
        background = self.background and not is_last
        if background and not getattr(self.monitor, 'using_non_gui_backend', False):
            if not getattr(self, '_warned_gui_backend', False):
                warnings.warn(
                    'MonitorCallback(background=True) requires a non-GUI '
                    'matplotlib backend (e.g. Agg); drawing synchronously.')
                self._warned_gui_backend = True
            background = False

        if background:
            # the worker must never see live training state: hand the monitor
            # a frozen shallow copy whose mutable history is the snapshot
            import copy
            monitor_solver = copy.copy(solver)
            monitor_solver.metrics_history = history
        else:
            monitor_solver = solver

        def draw():
            self.monitor.check(nets, conditions, history=history,
                               params=params, solver=monitor_solver)
            if self.fig_dir:
                pic_path = os.path.join(self.fig_dir, f"epoch-{global_epoch}.{self.format}")
                self.monitor.fig.savefig(pic_path, bbox_inches='tight')
                self.logger.info(f'plot saved to {pic_path}')

        if not background:
            self.flush()
            draw()
            return
        if self._worker is not None and self._worker.is_alive():
            return  # previous draw still rendering: let the live plot lag
        import threading
        self._worker = threading.Thread(target=draw, daemon=True)
        self._worker.start()

    def flush(self):
        """Wait for any in-flight background draw to finish."""
        if self._worker is not None:
            self._worker.join()
            self._worker = None


class StopCallback(ActionCallback):
    r"""Stops training, terminating the ``solver.fit()`` call. Use together
    with a ``ConditionCallback`` (otherwise fit exits after the first epoch)."""

    def __call__(self, solver):
        solver._stop_training = True


class CheckpointCallback(ActionCallback):
    r"""Saves solver state to ``ckpt_dir`` at each call.

    :param format: 'internals' (default; timestamped dill dump of
        ``solver.get_internals('all')`` with numpy-ified pytrees — the
        reference's ``callbacks.py:129-155`` semantics) or 'orbax'
        (``orbax.checkpoint`` of the params/opt-state pytrees + a JSON
        metadata sidecar; async-friendly array checkpointing).
    """

    def __init__(self, ckpt_dir, logger=None, format='internals'):
        super().__init__(logger=logger)
        if format not in ('internals', 'orbax'):
            raise ValueError(f"Unknown checkpoint format {format}")
        self.ckpt_dir = ckpt_dir
        self.format = format
        _safe_mkdir(ckpt_dir)

    def __call__(self, solver):
        if self.format == 'orbax':
            return self._save_orbax(solver)
        import dill
        import jax

        now = datetime.now()
        timestr = now.strftime("%Y-%m-%d_%H-%M-%S")
        fname = os.path.join(self.ckpt_dir, timestr + ".internals")
        internals = dict(solver.get_internals("all"))
        for key in ('params', 'best_params', 'opt_state'):
            if internals.get(key) is not None:
                internals[key] = jax.tree.map(lambda x: np.asarray(x), internals[key])
        with open(fname, 'wb') as f:
            dill.dump(internals, f)
            self.logger.info(f"Saved checkpoint to {fname} at local epoch = {solver.local_epoch} "
                             f"(global epoch = {solver.global_epoch})")

    def _save_orbax(self, solver):
        import json
        import orbax.checkpoint as ocp

        step = solver.global_epoch
        path = os.path.abspath(os.path.join(self.ckpt_dir, f"step_{step}"))
        ckpt = {
            'params': solver.params,
            'opt_state': solver.opt_state,
        }
        if solver.best_params is not None:
            ckpt['best_params'] = solver.best_params
        with ocp.StandardCheckpointer() as checkpointer:
            checkpointer.save(path, ckpt, force=True)
        meta = {
            'global_epoch': step,
            'lowest_loss': solver.lowest_loss,
            'metrics_history': solver.metrics_history,
        }
        with open(os.path.join(self.ckpt_dir, f"step_{step}.meta.json"), 'w') as f:
            json.dump(meta, f)
        self.logger.info(f"Saved orbax checkpoint to {path}")

    @staticmethod
    def restore_orbax(solver, ckpt_dir, step):
        """Restore params/opt-state (+histories) saved with format='orbax'."""
        import json
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
        target = {'params': solver.params, 'opt_state': solver.opt_state}
        if solver.best_params is not None:
            target['best_params'] = solver.best_params
        with ocp.StandardCheckpointer() as checkpointer:
            try:
                restored = checkpointer.restore(path, target)
            except BaseException:
                # saved with best_params but target lacks it (or vice versa)
                target['best_params'] = solver.params
                restored = checkpointer.restore(path, target)
        solver.params = restored['params']
        solver.opt_state = restored['opt_state']
        if 'best_params' in restored:
            solver.best_params = restored['best_params']
        meta_path = os.path.join(ckpt_dir, f"step_{step}.meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            solver.metrics_history = meta['metrics_history']
            solver.lowest_loss = meta['lowest_loss']
        return solver


class ReportCallback(ActionCallback):
    r"""Logs training/validation set sizes and generators."""

    def __call__(self, solver):
        self.logger.info(
            f"Starting from global epoch {solver.global_epoch - 1}\n"
            f"    training with {solver.generator['train']}\n"
            f"    validating with {solver.generator['valid']}"
        )
        tb = solver.generator['train'].size
        ntb = solver.n_batches['train']
        vb = solver.generator['valid'].size
        nvb = solver.n_batches['valid']
        self.logger.info(f"train size = {tb} x {ntb} = {tb * ntb}, valid_size = {vb} x {nvb} = {vb * nvb}")


ReportOnFitCallback = warn_deprecate_class(ReportCallback)


class EveCallback(ActionCallback):
    r"""Geometrically grows ``n_batches['train']`` based on the latest value of
    a metric: :math:`n = \min(n_0 2^k, n_{max})` with
    :math:`k = \max(0, \lfloor \log_p(v/v_0) \rfloor)`
    (reference ``callbacks.py:187-230``).

    .. note::
        Changing the batch count invalidates the solver's compiled epoch
        functions; they recompile on the next epoch automatically.
    """
    EPS = 1e-4

    def __init__(self, base_value=1.0, double_at=0.1, n_0=1, n_max=None, use_train=True, metric='loss', logger=None):
        super().__init__(logger=logger)
        self.base_value = base_value
        self.double_at = double_at
        self.n_0 = n_0
        self.n_max = n_max or np.inf
        key = 'train' if use_train else 'valid'
        self.key = f'{key}_{metric}'

    def __call__(self, solver):
        value = solver.metrics_history[self.key][-1]
        double_times = int(self.__class__.EPS + (np.log(value) - np.log(self.base_value)) / np.log(self.double_at))
        double_times = max(double_times, 0)
        new_n = int(min(self.n_0 * 2 ** double_times, self.n_max))
        if new_n != solver.n_batches['train']:
            solver.n_batches['train'] = new_n
            solver._invalidate_compiled()


class AutoResidualWeightCallback(ActionCallback):
    r"""Adapts per-equation ``residual_weights`` toward *balanced gradient
    contributions* — no reference analog; an alternative to hand-tuning the
    weights of stiff multi-equation systems.

    Every fire it measures the parameter-gradient norm :math:`g_k =
    \|\nabla_\theta\,\mathrm{mean}(r_k^2)\|_2` of each equation's unweighted
    loss term on a fresh batch, and moves the weights toward the balanced
    target :math:`w_k \propto \max_j g_j / g_k` (the multi-equation analog of
    the learning-rate-annealing scheme of Wang, Teng & Perdikaris, *SIAM J.
    Sci. Comput.* 2021). The raw prescription is **unstable**: applied
    undamped it enters a starvation spiral (the stiff equation's weight decays
    geometrically to zero and training converges to a degenerate optimum) —
    measured in ``benchmarks/balancing_ab.py``. The update is therefore
    damped: a log-space step of size ``rate`` toward the target, each factor
    clipped to ``[1/clip, clip]`` per fire, weights renormalized to
    ``max(w)=1`` and floored at ``min_weight``.

    Measured on the stiff oscillator study (see benchmarks/RESULTS.md): the
    damped default improves solution error ~7x over unweighted training with
    zero tuning, while a hand-tuned weight (from nondimensionalizing the
    system) is still ~3x better than that. Prefer hand weights when you know
    the scales; use this when you don't.

    Each weight update invalidates the solver's compiled epoch programs (a
    recompile on the next epoch), so fires should be sparse: compose with e.g.
    ``OnFirstLocal() | PeriodLocal(period=500)``. Updates freeze automatically
    once the weights stop moving (``freeze_tol`` relative change for
    ``freeze_patience`` consecutive fires), after which training runs
    recompile-free.

    :param rate: log-space step size toward the balanced target (0 < rate <= 1).
    :param clip: max multiplicative weight change per fire (> 1).
    :param min_weight: lower floor on normalized weights (prevents total
        starvation of any equation).
    :param freeze_tol: relative weight change below which a fire counts as
        converged.
    :param freeze_patience: consecutive converged fires before updates stop.
    """

    def __init__(self, rate=0.3, clip=2.0, min_weight=1e-4,
                 freeze_tol=0.05, freeze_patience=2, logger=None):
        super().__init__(logger=logger)
        if not 0 < rate <= 1:
            raise ValueError(f'rate must be in (0, 1], got {rate}')
        if clip <= 1:
            raise ValueError(f'clip must be > 1, got {clip}')
        if min_weight <= 0:
            raise ValueError(f'min_weight must be positive, got {min_weight}')
        self.rate = rate
        self.clip = clip
        self.min_weight = min_weight
        self.freeze_tol = freeze_tol
        self.freeze_patience = freeze_patience
        self.weight_history = []  # (local_epoch, grad_norms, weights) per fire
        self.frozen = False
        self._still_fires = 0
        self._norms_fn = None
        self._norms_solver = None

    def _build_norms_fn(self, solver, n_eq):
        import jax
        import jax.numpy as jnp

        def norms(params, cols):
            out = []
            for k in range(n_eq):
                def loss_k(p, k=k):
                    if solver.eval_mode is not None:
                        from .fields import eval_mode
                        with eval_mode(solver.eval_mode):
                            funcs, coords = solver._forward(p, cols)
                            res = solver._residuals(funcs, coords, weighted=False)
                    else:
                        funcs, coords = solver._forward(p, cols)
                        res = solver._residuals(funcs, coords, weighted=False)
                    r = res.value[:, k]
                    return jnp.mean(r * r)

                g = jax.grad(loss_k)(params)
                out.append(jnp.sqrt(sum(jnp.sum(x * x)
                                        for x in jax.tree.leaves(g))))
            return jnp.stack(out)

        return jax.jit(norms)

    def __call__(self, solver):
        if self.frozen:
            return
        import jax.numpy as jnp
        from .utils import next_rng_key

        cols = solver.generator['train'].sample(next_rng_key())
        if self._norms_fn is None or self._norms_solver is not solver:
            # probe the system width once (cheap forward, no gradient)
            funcs, coords = solver._forward(solver.params, cols)
            n_eq = int(solver._residuals(funcs, coords, weighted=False).value.shape[1])
            if n_eq < 2:
                warnings.warn(
                    'AutoResidualWeightCallback: the system has a single '
                    'equation; there is nothing to balance. Freezing.')
                self.frozen = True
                return
            self._norms_fn = self._build_norms_fn(solver, n_eq)
            self._norms_solver = solver
        g = np.asarray(self._norms_fn(solver.params, cols), dtype=float)
        target = g.max() / np.maximum(g, 1e-30)
        cur = np.asarray(solver.residual_weights or [1.0] * len(g), dtype=float)
        if len(cur) != len(g):
            raise ValueError(
                f'residual_weights has {len(cur)} entries but the system '
                f'produced {len(g)} residuals')
        step = np.exp(self.rate * np.log(np.maximum(target, 1e-30) / cur))
        w = cur * np.clip(step, 1.0 / self.clip, self.clip)
        w = np.maximum(w / w.max(), self.min_weight)
        self.weight_history.append(
            (solver.local_epoch, [float(x) for x in g], [float(x) for x in w]))
        rel = float(np.abs(np.log(w / cur)).max())
        if rel < math.log1p(self.freeze_tol):
            self._still_fires += 1
            if self._still_fires >= self.freeze_patience:
                self.frozen = True
                self.logger.info(
                    f'residual weights converged at {list(w)}; freezing '
                    f'(no further recompiles)')
        else:
            self._still_fires = 0
        if rel > 1e-3:  # skip the recompile when nothing moved
            solver.residual_weights = [float(x) for x in w]
            solver._invalidate_compiled()


class SimpleTensorboardCallback(ActionCallback):
    r"""Writes every metric scalar per epoch for TensorBoard (torch's
    ``SummaryWriter`` is used for the event-file format)."""

    def __init__(self, writer=None, logger=None):
        super().__init__(logger=logger)
        if writer:
            # Any object with ``add_scalar(tag, scalar_value, global_step)``
            # works; tensorboard itself is only needed to create the default.
            self.writer = writer
            return
        self.logger.info('No writer specified, creating a SummaryWriter automatically.')
        try:
            from torch.utils.tensorboard import SummaryWriter
        except ImportError as e:  # pragma: no cover
            raise ImportError(f"TensorBoard doesn't seem to be installed. See the following\n{e}")
        self.writer = SummaryWriter()

    def __call__(self, solver):
        for name, values in solver.metrics_history.items():
            self.writer.add_scalar(
                tag=name,
                scalar_value=values[-1] if values else np.nan,
                global_step=solver.global_epoch,
            )


class SetLossFn(ActionCallback):
    r"""Sets the loss function of the solver (str key or callable); best used
    together with a condition callback.

    :param reset: if True, re-set every time the callback fires; otherwise once.
    """

    @deprecated_alias(criterion='loss_fn')
    def __init__(self, loss_fn, reset=False, logger=None):
        super().__init__(logger=logger)
        self.loss_fn = loss_fn
        self.reset = reset
        self.called = False

    def __call__(self, solver):
        if self.reset or (not self.called):
            self.called = True
            solver._set_loss_fn(self.loss_fn)


SetCriterion = warn_deprecate_class(SetLossFn)


class SetOptimizer(ActionCallback):
    r"""Sets the optimizer of the solver.

    - If an optax ``GradientTransformation`` instance is passed, it is used
      directly (its state is freshly initialized for the solver's params).
    - If a factory/class is passed, it is called as
      ``optimizer(*optimizer_args, **optimizer_kwargs)``.
    """

    def __init__(self, optimizer, optimizer_args=None, optimizer_kwargs=None, reset=False, logger=None):
        super().__init__(logger=logger)
        self.optimizer = optimizer
        self.optimizer_args = optimizer_args or ()
        self.optimizer_kwargs = optimizer_kwargs or {}
        self.reset = reset
        self.called = False

    def __call__(self, solver):
        if self.reset or (not self.called):
            self.called = True
            import optax
            if isinstance(self.optimizer, optax.GradientTransformation):
                solver.set_optimizer(self.optimizer)
            elif callable(self.optimizer):
                solver.set_optimizer(self.optimizer(*self.optimizer_args, **self.optimizer_kwargs))
            else:
                raise TypeError(f"Unknown optimizer instance/type {self.optimizer}")


class ConditionCallback(BaseCallback):
    r"""Base class of condition callbacks; supports the boolean algebra
    ``&`` (and), ``|`` (or), ``~`` (not), ``^`` (xor)."""

    def __init__(self, logger=None):
        super().__init__(logger=logger)
        self.action_callback = None

    def set_action_callback(self, action_callback):
        if not isinstance(action_callback, ActionCallback):
            raise TypeError(f'{action_callback} is not an instance of ActionCallback')
        self.action_callback = action_callback
        return self

    @abstractmethod
    def condition(self, solver) -> bool:
        pass  # pragma: no cover

    def flush(self):
        """Delegate to the attached action callback (see
        ``ActionCallback.flush``)."""
        if self.action_callback is not None:
            self.action_callback.flush()

    def __call__(self, solver):
        if self.condition(solver):
            if self.action_callback:
                self.logger.debug(f"condition of {self} met, running the underlying callback "
                                  f"{self.action_callback}")
                self.action_callback(solver)
            else:
                self.logger.warning(f"condition of {self} met, but no underlying action callback is set; skipping")
        else:
            self.logger.debug(f"condition of {self} not met")

    def __and__(self, other):
        return AndCallback(condition_callbacks=[self, other], logger=self.logger)

    def __or__(self, other):
        return OrCallback(condition_callbacks=[self, other], logger=self.logger)

    def __invert__(self):
        return NotCallback(condition_callback=self, logger=self.logger)

    def __xor__(self, other):
        return XorCallback(condition_callbacks=[self, other], logger=self.logger)


class AndCallback(ConditionCallback):
    r"""True iff none of its sub-conditions is False.
    ``AndCallback([c1, c2])`` == ``c1 & c2``."""

    def __init__(self, condition_callbacks, logger=None):
        super().__init__(logger=logger)
        self.condition_callbacks = condition_callbacks

    def condition(self, solver) -> bool:
        for cond_cb in self.condition_callbacks:
            if not cond_cb.condition(solver):
                return False
        return True

    def next_fire_epoch(self, solver):
        # can only fire once every sub-condition can; sound = the latest hint
        hints = [c.next_fire_epoch(solver) for c in self.condition_callbacks]
        if any(h is None for h in hints):
            return None
        return max(hints)


class OrCallback(ConditionCallback):
    r"""False iff none of its sub-conditions is True. ``c1 | c2``."""

    def __init__(self, condition_callbacks, logger=None):
        super().__init__(logger=logger)
        self.condition_callbacks = condition_callbacks

    def condition(self, solver) -> bool:
        for cond_cb in self.condition_callbacks:
            if cond_cb.condition(solver):
                return True
        return False

    def next_fire_epoch(self, solver):
        # may fire as soon as any sub-condition can
        hints = [c.next_fire_epoch(solver) for c in self.condition_callbacks]
        if any(h is None for h in hints):
            return None
        return min(hints)


class NotCallback(ConditionCallback):
    r"""True iff its sub-condition is False. ``~c1``."""

    def __init__(self, condition_callback, logger=None):
        super().__init__(logger=logger)
        self.condition_callback = condition_callback

    def condition(self, solver) -> bool:
        return not self.condition_callback.condition(solver)


class XorCallback(ConditionCallback):
    r"""False iff evenly many sub-conditions are True. ``c1 ^ c2``."""

    def __init__(self, condition_callbacks, logger=None):
        super().__init__(logger=logger)
        self.condition_callbacks = condition_callbacks

    def condition(self, solver) -> bool:
        return sum(1 for cond_cb in self.condition_callbacks if cond_cb.condition(solver)) % 2 == 1


class TrueCallback(ConditionCallback):
    r"""Always True."""

    def condition(self, solver) -> bool:
        return True

    def next_fire_epoch(self, solver):
        return solver.local_epoch + 1


class FalseCallback(ConditionCallback):
    r"""Always False."""

    def condition(self, solver) -> bool:
        return False

    def next_fire_epoch(self, solver):
        return math.inf


class OnFirstLocal(ConditionCallback):
    r"""True only on the first local epoch."""

    def condition(self, solver) -> bool:
        return solver.local_epoch == 1

    def next_fire_epoch(self, solver):
        return 1 if solver.local_epoch < 1 else math.inf


class OnFirstGlobal(ConditionCallback):
    r"""True only on the first global epoch."""

    def condition(self, solver) -> bool:
        return solver.global_epoch == 1

    def next_fire_epoch(self, solver):
        # global = (global - local) + local grows in lockstep with local
        e = 1 - (solver.global_epoch - solver.local_epoch)
        return e if e > solver.local_epoch else math.inf


class OnLastLocal(ConditionCallback):
    r"""True only on the last local epoch."""

    def condition(self, solver) -> bool:
        return solver.local_epoch == solver._max_local_epoch

    def next_fire_epoch(self, solver):
        last = solver._max_local_epoch
        return last if last > solver.local_epoch else math.inf


class PeriodLocal(ConditionCallback):
    r"""True when local epoch == period * n + offset."""

    def __init__(self, period, offset=0, logger=None):
        super().__init__(logger=logger)
        self.period = period
        self.offset = offset % period

    def condition(self, solver) -> bool:
        return solver.local_epoch % self.period == self.offset

    def next_fire_epoch(self, solver):
        nxt = solver.local_epoch + 1
        return nxt + (self.offset - nxt) % self.period


class PeriodGlobal(ConditionCallback):
    r"""True when global epoch == period * n + offset."""

    def __init__(self, period, offset=0, logger=None):
        super().__init__(logger=logger)
        self.period = period
        self.offset = offset % period

    def condition(self, solver) -> bool:
        return solver.global_epoch % self.period == self.offset

    def next_fire_epoch(self, solver):
        nxt_g = solver.global_epoch + 1
        nxt_g += (self.offset - nxt_g) % self.period
        return solver.local_epoch + (nxt_g - solver.global_epoch)


class ClosedIntervalLocal(ConditionCallback):
    r"""True when min <= local epoch <= max."""

    def __init__(self, min=None, max=None, logger=None):
        super().__init__(logger=logger)
        self.min = -np.inf if min is None else min
        self.max = np.inf if max is None else max

    def condition(self, solver) -> bool:
        return self.min <= solver.local_epoch <= self.max

    def next_fire_epoch(self, solver):
        nxt = solver.local_epoch + 1
        if nxt > self.max:
            return math.inf
        return max(nxt, math.ceil(self.min)) if np.isfinite(self.min) else nxt


class ClosedIntervalGlobal(ConditionCallback):
    r"""True when min <= global epoch <= max."""

    def __init__(self, min=None, max=None, logger=None):
        super().__init__(logger=logger)
        self.min = -np.inf if min is None else min
        self.max = np.inf if max is None else max

    def condition(self, solver) -> bool:
        return self.min <= solver.global_epoch <= self.max

    def next_fire_epoch(self, solver):
        nxt_g = solver.global_epoch + 1
        if nxt_g > self.max:
            return math.inf
        if np.isfinite(self.min):
            nxt_g = max(nxt_g, math.ceil(self.min))
        return solver.local_epoch + (nxt_g - solver.global_epoch)


class Random(ConditionCallback):
    r"""True with the given probability."""

    def __init__(self, probability, logger=None):
        super().__init__(logger=logger)
        if probability < 0 or probability > 1:
            raise ValueError('probability must lie in [0, 1]')
        self.probability = probability

    def condition(self, solver) -> bool:
        return random.random() < self.probability


class _RepeatedMetricChange(ConditionCallback):
    def __init__(self, use_train=True, metric='loss', repetition=1, logger=None):
        super().__init__(logger=logger)
        key = 'train' if use_train else 'valid'
        self.key = f'{key}_{metric}'
        self.times_required = repetition
        self.so_far = 0

    @abstractmethod
    def _last_satisfied(self, last, second2last):
        return last > second2last

    def condition(self, solver) -> bool:
        history = solver.metrics_history[self.key]
        if len(history) >= 2 and self._last_satisfied(last=history[-1], second2last=history[-2]):
            self.so_far += 1
        else:
            self.so_far = 0
        return self.so_far >= self.times_required


class RepeatedMetricUp(_RepeatedMetricChange):
    r"""True if the metric kept increasing by at least some margin for n epochs."""

    def __init__(self, at_least_by=0.0, use_train=True, metric='loss', repetition=1, logger=None):
        super().__init__(use_train=use_train, metric=metric, repetition=repetition, logger=logger)
        self.at_least_by = at_least_by

    def _last_satisfied(self, last, second2last):
        return last >= second2last + self.at_least_by


class RepeatedMetricDown(_RepeatedMetricChange):
    r"""True if the metric kept decreasing by at least some margin for n epochs."""

    def __init__(self, at_least_by=0.0, use_train=True, metric='loss', repetition=1, logger=None):
        super().__init__(use_train=use_train, metric=metric, repetition=repetition, logger=logger)
        self.at_least_by = at_least_by

    def _last_satisfied(self, last, second2last):
        return last <= second2last - self.at_least_by


class RepeatedMetricConverge(_RepeatedMetricChange):
    r"""True if the metric kept converging within epsilon for n epochs."""

    def __init__(self, epsilon, use_train=True, metric='loss', repetition=1, logger=None):
        super().__init__(use_train=use_train, metric=metric, repetition=repetition, logger=logger)
        self.epsilon = abs(epsilon)

    def _last_satisfied(self, last, second2last):
        return abs(last - second2last) < self.epsilon


class RepeatedMetricDiverge(_RepeatedMetricChange):
    r"""True if the metric kept diverging beyond some gap for n epochs."""

    def __init__(self, gap, use_train=True, metric='loss', repetition=1, logger=None):
        super().__init__(use_train=use_train, metric=metric, repetition=repetition, logger=logger)
        self.gap = abs(gap)

    def _last_satisfied(self, last, second2last):
        return abs(last - second2last) > self.gap


class RepeatedMetricBelow(_RepeatedMetricChange):
    r"""True if the metric stayed below a threshold for n epochs."""

    def __init__(self, threshold, use_train=True, metric='loss', repetition=1, logger=None):
        super().__init__(use_train=use_train, metric=metric, repetition=repetition, logger=logger)
        self.threshold = threshold

    def _last_satisfied(self, last, second2last):
        return last < self.threshold


class RepeatedMetricAbove(_RepeatedMetricChange):
    r"""True if the metric stayed above a threshold for n epochs."""

    def __init__(self, threshold, use_train=True, metric='loss', repetition=1, logger=None):
        super().__init__(use_train=use_train, metric=metric, repetition=repetition, logger=logger)
        self.threshold = threshold

    def _last_satisfied(self, last, second2last):
        return last > self.threshold


class ProgressBarCallBack(ActionCallback):
    r"""Prints a simple textual progress bar."""

    def __call__(self, solver):
        a = solver.local_epoch
        b = solver._max_local_epoch
        progress = int(a / b * 100)
        print('#' * progress + '.' * (100 - progress), end='\r', flush=True)
