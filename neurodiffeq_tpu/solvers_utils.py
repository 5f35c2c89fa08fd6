r"""Solver persistence: save/load trained solvers, plus remote-hub plumbing.

Capability parity with the reference's ``neurodiffeq/solvers_utils.py``
(``PretrainedSolver.save/load`` with dill, metadata introspection, optional
``neurodiff.io`` hub upload/download, ``SolverConfig`` overrides,
``solvers_utils.py:281-545``), adapted to the functional design: parameters
are explicit pytrees, so a checkpoint is (solver config, numpy-ified params /
optimizer state, histories) rather than pickled live ``nn.Module`` graphs.
``dill`` is used for user callables (equations, condition boundary functions).

The remote hub is optional and controlled by the same environment variables as
the reference (``NEURODIFF_API_URL``, ``NEURODIFF_API_KEY``;
``solvers_utils.py:17-29``).
"""
import os
import ast
import json
import types
import decimal
import inspect

import numpy as np
import jax
import jax.numpy as jnp

try:
    import dill
except Exception:  # pragma: no cover
    dill = None


def _dill_load_protected(fileobj):
    """``dill.load`` with live-module state protection.

    dill serializes a MODULE OBJECT by value when it sits in a closure cell —
    e.g. a user's ``diff_eqs`` defined inside a function body after a local
    ``from neurodiffeq_tpu import fields as F`` (the lambda then closes over
    the module itself). Unpickling such a blob imports the real module and
    ``__dict__.update``s it with the pickled copies, silently rebinding every
    live global — engine dispatch tables, eval-mode flags, the field-aware
    math functions — to stale duplicates from save time. (The reference
    inherits the same dill behavior but has no module-level dispatch state to
    corrupt; our batched-Taylor engine does, so a clobbered
    ``fields._JET_SAFE_OPS`` would silently drop every subsequent expression
    onto the per-sample fallback path.)

    Guard: snapshot every already-imported module's ``__dict__`` and, after
    the load, restore any entry whose IDENTITY the load changed. The loaded
    solver keeps working — its closure cells reference the module object, not
    the stale values — and the process keeps its real module state. Keys the
    load *adds* to a module are left alone (imports triggered by the load
    legitimately bind new submodule attributes).
    """
    import sys
    snapshot = {name: dict(m.__dict__)
                for name, m in list(sys.modules.items()) if m is not None}
    try:
        return dill.load(fileobj)
    finally:
        for name, saved in snapshot.items():
            mod = sys.modules.get(name)
            if mod is None:
                continue
            live = mod.__dict__
            for k, v in saved.items():
                if k in live and live[k] is not v:
                    live[k] = v

DEFAULT_API_URL = "https://dev.neurodiff.io/v1/" if os.getenv("DEV") else "https://api.neurodiff.io/v1/"

# module-level constants mirroring the reference's import-time env lookups
# (``solvers_utils.py:17-29``); ``_get_api_url`` below stays the live lookup
DEV = bool(os.environ.get("DEV"))
NEURODIFF_API_URL = os.getenv("NEURODIFF_API_URL", DEFAULT_API_URL)


def _get_api_url():
    return os.getenv("NEURODIFF_API_URL", DEFAULT_API_URL)


def _get_api_key():
    return os.getenv("NEURODIFF_API_KEY")


def is_solution_name(name):
    """True if ``name`` refers to a remote hub solution rather than a local
    path (reference ``solvers_utils.py:32-37``: anything not starting with
    ``./`` is treated as a hub name)."""
    return not name.startswith('./')


def process_response(response):
    """Decode an HTTP response from the hub (reference
    ``solvers_utils.py:39-45``)."""
    return response.json()


def create_cache_dir():
    """Create (if needed) and return the ``~/.neurodiff`` download cache
    directory (reference ``solvers_utils.py:60-66``)."""
    cache_dir = os.path.join(os.path.expanduser('~'), '.neurodiff')
    os.makedirs(cache_dir, exist_ok=True)
    return cache_dir


def get_parameters(lambda_function):
    """Names/values a user equation captured: closure cells if any, otherwise
    globals it references (reference ``solvers_utils.py:99-117``). The
    reference excludes framework machinery by name (``diff``/``torch``); here
    anything callable or a module is excluded by value, which also covers
    aliased imports, so the result is hub-serializable data only."""
    def is_param(value):
        # captured *parameters*, not captured framework machinery
        return not (callable(value) or isinstance(value, types.ModuleType))

    parameters = {}
    try:
        closures = lambda_function.__closure__
        if closures is not None:
            for name, cell in zip(lambda_function.__code__.co_freevars, closures):
                if is_param(cell.cell_contents):
                    parameters[name] = cell.cell_contents
        else:
            gbs = lambda_function.__globals__
            for name in lambda_function.__code__.co_names:
                if name in gbs and is_param(gbs[name]):
                    parameters[name] = gbs[name]
    except Exception:
        pass
    return parameters


def get_conditions(conditions):
    """Serializable per-condition metadata dicts: instance attributes plus
    ``condition_type``, with captured callables stringified to source
    (reference ``solvers_utils.py:119-136``)."""
    condition_list = []
    for condition in conditions:
        cond_dict = dict(condition.__dict__)
        cond_dict["condition_type"] = type(condition).__name__
        for key, value in cond_dict.items():
            if isinstance(value, types.FunctionType):
                source = get_source(value)
                if source:
                    cond_dict[key] = source
        condition_list.append(cond_dict)
    return condition_list


def get_generator(generator):
    """Introspectable config of the train generator: unwrap the solver's
    ``SamplerGenerator`` and keep the plain-data attributes (reference
    ``solvers_utils.py:139-154``, which drops cached samples and getters)."""
    try:
        gen = generator['train'].generator
    except (AttributeError, KeyError, TypeError):
        return {}
    out = {}
    for k, v in gen.__dict__.items():
        if callable(v) or k in ('examples', 'grid_x', 'grid_y'):
            continue
        try:
            json.dumps(v, cls=JsonEncoder)
            out[k] = v
        except TypeError:
            out[k] = repr(v)  # e.g. a nested sub-generator
    return out


class JsonEncoder(json.JSONEncoder):
    """JSON encoder for numpy/JAX scalars and arrays (reference
    ``solvers_utils.py:156-167``, extended to ``jax.Array``)."""

    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, decimal.Decimal):
            return float(obj)
        if isinstance(obj, (np.ndarray, jax.Array)):
            return np.asarray(obj).tolist()
        return super().default(obj)


def get_loss(loss):
    """Serializable representation of a loss spec: registry names pass
    through, callables stringify to source. (The reference's ``get_loss``,
    ``solvers_utils.py:248-256``, is a commented-out stub that would raise
    ``NameError`` if its try body ran; this is the working equivalent.)"""
    return loss if isinstance(loss, str) else get_source(loss)


def get_source(obj):
    """Best-effort source extraction of a (lambda) function for metadata
    (the analog of the reference's inspect+ast walk, ``solvers_utils.py:83-96``)."""
    try:
        source = inspect.getsource(obj).strip()
        try:
            tree = ast.parse(source)
            for node in ast.walk(tree):
                if isinstance(node, ast.Lambda):
                    return ast.get_source_segment(source, node)
        except SyntaxError:
            pass
        return source
    except (OSError, TypeError):
        return None


def get_networks(solver):
    """Introspected network-architecture metadata for the hub UI — the same
    per-layer contract as the reference (``solvers_utils.py:226-245``:
    ``[{"layers": [{"layer", "in_features", "out_features", "bias"}, ...]}]``),
    re-derived from our init/apply modules."""
    networks = []
    for net in solver.nets:
        layers = []
        if hasattr(net, 'hidden_units') and hasattr(net, 'n_input_units'):
            dims = ((net.n_input_units,) + tuple(net.hidden_units)
                    + (net.n_output_units,))
            actvs = list(getattr(net, 'actvs', []))
            for i in range(len(dims) - 1):
                layers.append({'layer': 'Linear', 'in_features': int(dims[i]),
                               'out_features': int(dims[i + 1]), 'bias': True})
                if i < len(dims) - 2:
                    name = type(actvs[i]).__name__ if i < len(actvs) else 'Tanh'
                    layers.append({'layer': name})
        else:
            layers.append({'layer': type(net).__name__})
        networks.append({'layers': layers})
    return networks


def get_sample_solution(solver):
    """Sampled solution curves per solver type for the hub UI (the analog of
    the reference's ``get_sample_solution{1D,2D,Bundle1D}``,
    ``solvers_utils.py:170-224``). Returns ``[xs, us]`` lists, ``[]`` when
    sampling fails, ``None`` for solver types without a sampler."""
    names = [c.__name__ for c in type(solver).__mro__]
    best = solver.best_params is not None
    try:
        if 'BundleSolver1D' in names:
            t0, t1 = float(solver.r_min[0]), float(solver.r_max[0])
            t = np.linspace(t0, t1, max(10 * int(t1 - t0), 10))
            import random as _random
            values = [
                np.full_like(t, _random.random()
                             * (float(solver.r_max[i]) - float(solver.r_min[i]))
                             + float(solver.r_min[i]))
                for i in range(1, len(solver.r_min))
            ]
            us = solver.get_solution(best=best)(t, *values)
            if not isinstance(us, (list, tuple)):
                us = [us]
            return [t.tolist(), [np.asarray(u).tolist() for u in us]]
        if 'Solver1D' in names:
            t = np.linspace(solver.t_min, solver.t_max,
                            max(10 * int(solver.t_max - solver.t_min), 10))
            us = solver.get_solution(best=best)(t)
            if not isinstance(us, (list, tuple)):
                us = [us]
            return [t.tolist(), [np.asarray(u).tolist() for u in us]]
        if 'Solver2D' in names:
            cols = solver.generator['train'].get_examples()
            xs = [np.asarray(c).reshape(-1) for c in cols[:2]]
            us = solver.get_solution(best=best)(xs[0], xs[1])
            if isinstance(us, (list, tuple)):
                us = us[0]
            return [[x.tolist() for x in xs], np.asarray(us).tolist()]
    except Exception:
        return []
    return None


def get_sample_solution1D(solver):
    """Sample solution curves of a ``Solver1D`` (reference
    ``solvers_utils.py:170-189``); delegates to :func:`get_sample_solution`."""
    return get_sample_solution(solver)


def get_sample_solution2D(solver):
    """Sample solution surface of a ``Solver2D`` (reference
    ``solvers_utils.py:190-204``); delegates to :func:`get_sample_solution`."""
    return get_sample_solution(solver)


def get_sample_solutionBundle1D(solver):
    """Sample solution curves of a ``BundleSolver1D`` at a random bundle
    point (reference ``solvers_utils.py:206-224``); delegates to
    :func:`get_sample_solution`."""
    return get_sample_solution(solver)


def _diff_equation_details(solver):
    """The reference's introspected metadata block
    (``solvers_utils.py:307-321``), consumed by the hub UI."""
    return {
        "equation": get_source(solver.diff_eqs),
        "conditions": [type(c).__name__ for c in solver.conditions],
        "generator": {k: repr(g) for k, g in solver.generator.items()},
        "sample_solution": get_sample_solution(solver),
        "sample_loss": list(solver.metrics_history.get('valid_loss', [])),
        "loss_fn": get_loss(solver.loss_fn),
        "networks": get_networks(solver),
        "optimizer": {"name": type(solver.optimizer).__name__},
    }


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _to_jax_tree(tree):
    return jax.tree.map(lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)


class SolverConfig:
    """Optional overrides applied when re-instantiating a saved solver
    (reference ``solvers_utils.py:258-278``). Any attribute left as None keeps
    the saved value."""

    def __init__(self, conditions=None, ode_system=None, pde_system=None, nets=None,
                 train_generator=None, valid_generator=None, optimizer=None,
                 metrics=None, loss_fn=None, n_batches_train=None, n_batches_valid=None):
        self.conditions = conditions
        self.ode_system = ode_system
        self.pde_system = pde_system
        self.nets = nets
        self.train_generator = train_generator
        self.valid_generator = valid_generator
        self.optimizer = optimizer
        self.metrics = metrics
        self.loss_fn = loss_fn
        self.n_batches_train = n_batches_train
        self.n_batches_valid = n_batches_valid


class PretrainedSolver:
    """Mixin giving solvers ``save``/``load`` (mixed into ``BaseSolver``)."""

    def _save_dict(self):
        d = {
            "type_name": type(self).__name__,
            "nets": self.nets,
            "params": _to_numpy_tree(self.params),
            "best_params": _to_numpy_tree(self.best_params) if self.best_params is not None else None,
            "conditions": self.conditions,
            "diff_eqs": self.diff_eqs,
            "diff_eqs_source": get_source(self.diff_eqs),
            "generator": self.generator,
            "optimizer": self.optimizer,
            "opt_state": _to_numpy_tree(self.opt_state),
            "n_batches": dict(self.n_batches),
            "metrics_fn": self.metrics_fn,
            "metrics_history": {k: list(v) for k, v in self.metrics_history.items()},
            "lowest_loss": self.lowest_loss,
            "loss_fn": self.loss_fn,
            "solver_kwargs": self._constructor_kwargs(),
            "global_epoch": self.global_epoch,
            "parent_type_name": type(self).__mro__[1].__name__,
            "diff_equation_details": _diff_equation_details(self),
        }
        return d

    def _constructor_kwargs(self):
        """Extra constructor arguments captured per solver type."""
        kwargs = {}
        for name in ('t_min', 't_max', 'xy_min', 'xy_max', 'r_min', 'r_max',
                     'n_input_units', 'eq_param_index', 'residual_weights',
                     'eval_mode'):
            if hasattr(self, name) and getattr(self, name) is not None:
                kwargs[name] = getattr(self, name)
        return kwargs

    def save(self, path=None, name=None, save_to_hub=False, **kwargs):
        """Serialize this solver (params, optimizer state, histories, and
        dill-able components) to ``path``; optionally upload to the hub.

        :param path: local file path to write.
        :param name: solution name for hub upload.
        :param save_to_hub: POST the saved blob to the configured hub.
        """
        if dill is None:
            raise RuntimeError("dill is required for solver serialization")
        save_dict = self._save_dict()
        if path is None and not save_to_hub:
            raise ValueError("Either `path` must be given or `save_to_hub` must be True")
        if path is not None:
            with open(path, 'wb') as f:
                dill.dump(save_dict, f)
        if save_to_hub:
            self._upload_to_hub(save_dict, name=name, **kwargs)
        return path

    def _upload_to_hub(self, save_dict, name=None, description=""):
        import io
        try:
            import requests
        except Exception as e:  # pragma: no cover
            raise RuntimeError("`requests` is required for hub upload") from e
        api_key = _get_api_key()
        if not api_key:
            raise RuntimeError("Set NEURODIFF_API_KEY to upload solutions to the hub")
        buf = io.BytesIO()
        dill.dump(save_dict, buf)
        buf.seek(0)
        url = _get_api_url() + "solutions/upload"
        resp = requests.post(
            url,
            headers={"api-key": api_key},
            files={"file": (name or "solver", buf)},
            data={"name": name or "solver", "description": description},
        )
        resp.raise_for_status()
        return resp

    @classmethod
    def load(cls, path=None, name=None, config=None, **kwargs):
        """Load a saved solver from a local path (or download by name from the hub)
        and re-instantiate the correct solver class with optional config overrides.

        :param path: local checkpoint path.
        :param name: hub solution name (downloads if ``path`` is None).
        :param config: a :class:`SolverConfig` of overrides.
        """
        if dill is None:
            raise RuntimeError("dill is required for solver serialization")
        if path is None and name is None:
            raise ValueError("Either `path` or `name` must be provided")
        if path is not None:
            with open(path, 'rb') as f:
                save_dict = _dill_load_protected(f)
        else:
            save_dict = cls._download_from_hub(name)

        config = config or SolverConfig()
        from . import solvers as _solvers

        type_name = save_dict["type_name"]
        solver_cls = getattr(_solvers, type_name)

        diff_eqs = config.ode_system or config.pde_system or save_dict["diff_eqs"]
        conditions = config.conditions or save_dict["conditions"]
        nets = config.nets or save_dict["nets"]
        train_generator = config.train_generator or save_dict["generator"]["train"].generator
        valid_generator = config.valid_generator or save_dict["generator"]["valid"].generator
        n_batches_train = config.n_batches_train or save_dict["n_batches"]["train"]
        n_batches_valid = (config.n_batches_valid
                           if config.n_batches_valid is not None
                           else save_dict["n_batches"]["valid"])

        ctor_kwargs = dict(save_dict.get("solver_kwargs", {}))
        ctor_kwargs.pop('n_input_units', None)
        init_sig = inspect.signature(solver_cls.__init__)
        ctor_kwargs = {k: v for k, v in ctor_kwargs.items() if k in init_sig.parameters}

        eq_kw = 'ode_system' if 'ode_system' in init_sig.parameters else (
            'pde_system' if 'pde_system' in init_sig.parameters else 'diff_eqs')

        solver = solver_cls(
            **{eq_kw: diff_eqs},
            conditions=conditions,
            nets=nets,
            train_generator=train_generator,
            valid_generator=valid_generator,
            optimizer=config.optimizer or save_dict.get("optimizer"),
            loss_fn=config.loss_fn or save_dict.get("loss_fn"),
            metrics=config.metrics or save_dict.get("metrics_fn"),
            n_batches_train=n_batches_train,
            n_batches_valid=n_batches_valid,
            **ctor_kwargs,
            **kwargs,
        )

        # restore trained state
        solver.params = _to_jax_tree(save_dict["params"])
        if save_dict.get("best_params") is not None:
            solver.best_params = _to_jax_tree(save_dict["best_params"])
        if config.optimizer is None and save_dict.get("opt_state") is not None:
            try:
                restored = _to_jax_tree(save_dict["opt_state"])
                # structure must match the solver's canonical (flat) layout —
                # e.g. a checkpoint written before the optimizer ran on the
                # ravelled parameter vector re-initializes instead
                if (jax.tree.structure(restored)
                        == jax.tree.structure(solver.opt_state)):
                    solver.opt_state = restored
                else:
                    solver.opt_state = solver.optimizer.init(
                        solver._ravel(solver.params))
            except Exception:  # pragma: no cover - optimizer replaced, reinit
                solver.opt_state = solver.optimizer.init(solver._ravel(solver.params))
        solver.metrics_history = {k: list(v) for k, v in save_dict["metrics_history"].items()}
        solver.lowest_loss = save_dict.get("lowest_loss")
        return solver

    @classmethod
    def _download_from_hub(cls, name):
        import io
        try:
            import requests
        except Exception as e:  # pragma: no cover
            raise RuntimeError("`requests` is required for hub download") from e
        url = _get_api_url() + f"solutions/download/{name}"
        headers = {}
        if _get_api_key():
            headers["api-key"] = _get_api_key()
        resp = requests.get(url, headers=headers)
        resp.raise_for_status()
        return _dill_load_protected(io.BytesIO(resp.content))


def get_file(path_or_name):
    """Open a local checkpoint file (parity helper)."""
    return open(path_or_name, 'rb')
