"""Solver persistence tests: save/load round trips (the reference's
tests/test_solvers_utils.py is a stub; these are real)."""
import numpy as np
import pytest

from neurodiffeq_tpu.solvers import Solver1D, Solver2D
from neurodiffeq_tpu.solvers_utils import SolverConfig, get_source
from neurodiffeq_tpu.conditions import IVP, NoCondition
from neurodiffeq_tpu.fields import diff


def _ode(u, t):
    return [diff(u, t) + u]


def test_save_load_roundtrip(tmp_path):
    solver = Solver1D(
        ode_system=_ode,
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
    )
    solver.fit(max_epochs=50, tqdm_file=None)
    sol_before = solver.get_solution()
    ts = np.linspace(0, 2, 17)
    us_before = np.asarray(sol_before(ts))

    path = str(tmp_path / 'solver.ndq')
    solver.save(path=path)

    loaded = Solver1D.load(path=path)
    assert loaded.global_epoch == 50
    assert loaded.lowest_loss == solver.lowest_loss
    us_after = np.asarray(loaded.get_solution()(ts))
    assert np.allclose(us_before, us_after, atol=1e-12)

    # training continues from the restored state
    loaded.fit(max_epochs=5, tqdm_file=None)
    assert loaded.global_epoch == 55


def test_save_load_2d(tmp_path):
    solver = Solver2D(
        pde_system=lambda u, x, y: [diff(u, x) + diff(u, y)],
        conditions=[NoCondition()],
        xy_min=(0, 0), xy_max=(1, 1),
    )
    solver.fit(max_epochs=3, tqdm_file=None)
    path = str(tmp_path / 's2d.ndq')
    solver.save(path=path)
    loaded = Solver2D.load(path=path)
    xs, ys = np.random.rand(5), np.random.rand(5)
    assert np.allclose(
        np.asarray(solver.get_solution()(xs, ys)),
        np.asarray(loaded.get_solution()(xs, ys)),
        atol=1e-12,
    )


def test_load_with_config_overrides(tmp_path):
    solver = Solver1D(
        ode_system=_ode,
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
    )
    solver.fit(max_epochs=2, tqdm_file=None)
    path = str(tmp_path / 'solver.ndq')
    solver.save(path=path)

    cfg = SolverConfig(n_batches_train=3)
    loaded = Solver1D.load(path=path, config=cfg)
    assert loaded.n_batches['train'] == 3


def test_save_requires_target():
    solver = Solver1D(
        ode_system=_ode,
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
    )
    with pytest.raises(ValueError):
        solver.save()
    with pytest.raises(ValueError):
        Solver1D.load()


def test_get_source():
    src = get_source(_ode)
    assert src is not None and 'diff' in src


def test_hub_upload_download_mocked(tmp_path, monkeypatch):
    """Exercise the remote-hub plumbing with a fake requests module."""
    import io
    import sys
    import types
    import dill

    solver = Solver1D(
        ode_system=_ode,
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
    )
    solver.fit(max_epochs=2, tqdm_file=None)

    store = {}

    class FakeResponse:
        status_code = 200
        content = b''

        def raise_for_status(self):
            pass

    def fake_post(url, headers=None, files=None, data=None):
        assert 'solutions/upload' in url
        assert headers.get('api-key') == 'test-key'
        store['blob'] = files['file'][1].read()
        return FakeResponse()

    def fake_get(url, headers=None):
        resp = FakeResponse()
        resp.content = store['blob']
        return resp

    fake_requests = types.ModuleType('requests')
    fake_requests.post = fake_post
    fake_requests.get = fake_get
    monkeypatch.setitem(sys.modules, 'requests', fake_requests)
    monkeypatch.setenv('NEURODIFF_API_KEY', 'test-key')

    solver.save(name='my-solution', save_to_hub=True)
    assert 'blob' in store
    loaded_dict = dill.load(io.BytesIO(store['blob']))
    assert loaded_dict['type_name'] == 'Solver1D'

    loaded = Solver1D.load(name='my-solution')
    assert loaded.global_epoch == 2


def test_hub_contract_real_http(tmp_path, monkeypatch):
    """Socket-level hub contract test: a real HTTP exchange (actual
    ``requests`` over localhost) against a server implementing the hub API
    shape (reference solvers_utils.py:345-389, 506-516 — multipart POST to
    ``solutions/upload`` with ``api-key`` header + name/description form
    fields; GET ``solutions/download/<name>`` returning the blob). Unlike
    the mocked test above, this exercises requests' real multipart encoding
    and the full wire round trip."""
    import io
    import threading
    import dill
    from email.parser import BytesParser
    from email.policy import default as email_default_policy
    from http.server import BaseHTTPRequestHandler, HTTPServer

    store = {}
    seen = {}

    class HubHandler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # keep pytest output clean
            pass

        def do_POST(self):
            assert self.path == '/v1/solutions/upload'
            seen['api_key'] = self.headers.get('api-key')
            body = self.rfile.read(int(self.headers['Content-Length']))
            # parse requests' multipart/form-data encoding with the stdlib
            msg = BytesParser(policy=email_default_policy).parsebytes(
                b'Content-Type: ' + self.headers['Content-Type'].encode()
                + b'\r\n\r\n' + body)
            assert msg.is_multipart()
            fields = {}
            for part in msg.iter_parts():
                fields[part.get_param('name', header='content-disposition')] = \
                    part.get_payload(decode=True)
            seen['form_name'] = fields['name'].decode()
            seen['form_description'] = fields['description'].decode()
            store[seen['form_name']] = fields['file']
            self.send_response(200)
            self.send_header('Content-Type', 'application/json')
            self.end_headers()
            self.wfile.write(b'{"status": "ok"}')

        def do_GET(self):
            prefix = '/v1/solutions/download/'
            assert self.path.startswith(prefix)
            name = self.path[len(prefix):]
            blob = store.get(name)
            if blob is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header('Content-Type', 'application/octet-stream')
            self.end_headers()
            self.wfile.write(blob)

    server = HTTPServer(('127.0.0.1', 0), HubHandler)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        monkeypatch.setenv('NEURODIFF_API_URL', f'http://127.0.0.1:{port}/v1/')
        monkeypatch.setenv('NEURODIFF_API_KEY', 'contract-key')

        solver = Solver1D(
            ode_system=_ode,
            conditions=[IVP(t_0=0.0, u_0=1.0)],
            t_min=0.0, t_max=2.0,
        )
        solver.fit(max_epochs=4, tqdm_file=None)
        solver.save(name='exp-decay', save_to_hub=True,
                    description='contract test')

        assert seen['api_key'] == 'contract-key'
        assert seen['form_name'] == 'exp-decay'
        assert seen['form_description'] == 'contract test'
        # the uploaded blob is a complete save_dict
        d = dill.load(io.BytesIO(store['exp-decay']))
        assert d['type_name'] == 'Solver1D'

        loaded = Solver1D.load(name='exp-decay')
        assert loaded.global_epoch == 4
        ts = np.linspace(0, 2, 9)
        assert np.allclose(
            np.asarray(solver.get_solution()(ts)),
            np.asarray(loaded.get_solution()(ts)), atol=1e-12)

        # download of an unknown name surfaces the HTTP error
        import requests
        with pytest.raises(requests.HTTPError):
            Solver1D.load(name='no-such-solution')
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)


def test_save_dict_metadata_contract(tmp_path):
    """The saved dict carries the reference's introspection metadata
    (reference solvers_utils.py:170-245, 307-321): per-layer network
    architecture, sampled solution curves, equation source, loss history."""
    import dill
    from neurodiffeq_tpu.networks import FCNN

    solver = Solver1D(
        ode_system=_ode,
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        nets=[FCNN(1, 1, hidden_units=(8, 4))],
        t_min=0.0, t_max=2.0,
    )
    solver.fit(max_epochs=3, tqdm_file=None)
    path = str(tmp_path / 'meta.ndq')
    solver.save(path=path)
    with open(path, 'rb') as f:
        d = dill.load(f)

    assert d['parent_type_name'] == 'BaseSolver'
    assert d['global_epoch'] == 3
    details = d['diff_equation_details']
    assert 'diff' in details['equation']
    assert details['conditions'] == ['IVP']
    assert details['optimizer']['name']
    assert len(details['sample_loss']) == 3

    nets = details['networks']
    assert nets == [{'layers': [
        {'layer': 'Linear', 'in_features': 1, 'out_features': 8, 'bias': True},
        {'layer': 'Tanh'},
        {'layer': 'Linear', 'in_features': 8, 'out_features': 4, 'bias': True},
        {'layer': 'Tanh'},
        {'layer': 'Linear', 'in_features': 4, 'out_features': 1, 'bias': True},
    ]}]

    ts, us = details['sample_solution']
    assert len(ts) == 20  # 10 * (t_max - t_min)
    assert len(us) == 1 and len(us[0]) == 20
    # the curve matches the solver's own solution
    got = np.asarray(solver.get_solution()(np.asarray(ts))).reshape(-1)
    assert np.allclose(np.asarray(us[0]).reshape(-1), got, atol=1e-10)


def test_save_dict_metadata_2d_and_unknown(tmp_path):
    import dill
    solver = Solver2D(
        pde_system=lambda u, x, y: [diff(u, x) + diff(u, y)],
        conditions=[NoCondition()],
        xy_min=(0, 0), xy_max=(1, 1),
    )
    solver.fit(max_epochs=2, tqdm_file=None)
    path = str(tmp_path / 'meta2d.ndq')
    solver.save(path=path)
    with open(path, 'rb') as f:
        d = dill.load(f)
    xs_ys, grid = d['diff_equation_details']['sample_solution']
    assert len(xs_ys) == 2 and len(xs_ys[0]) == len(np.asarray(grid).reshape(-1))


def test_hub_upload_requires_api_key(monkeypatch):
    solver = Solver1D(
        ode_system=_ode,
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
    )
    monkeypatch.delenv('NEURODIFF_API_KEY', raising=False)
    with pytest.raises(RuntimeError):
        solver.save(name='x', save_to_hub=True)


def test_save_load_preserves_residual_weights_and_adaptive_generator(tmp_path):
    """Round-2 ctor args must survive the save/load round trip — silently
    dropping residual_weights would change the training objective on resume."""
    from neurodiffeq_tpu.generators import Generator1D, ResidualAdaptiveGenerator

    solver = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u, 2.0 * (diff(u, t) + u)],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
        residual_weights=[0.25, 1.0],
        train_generator=ResidualAdaptiveGenerator(
            Generator1D(16, 0.0, 2.0, method='uniform'), oversample=2),
        valid_generator=Generator1D(16, 0.0, 2.0, method='equally-spaced'),
    )
    solver.fit(max_epochs=20, tqdm_file=None)
    path = str(tmp_path / 'solver.ndq')
    solver.save(path=path)

    loaded = Solver1D.load(path=path)
    assert loaded.residual_weights == [0.25, 1.0]
    assert loaded.generator['train'].adaptive
    assert loaded.generator['train'].generator.oversample == 2
    # identical params + weights -> identical loss on identical points
    cols = [np.linspace(0.0, 2.0, 16).reshape(-1, 1)]
    l0, _ = solver._loss_and_metrics(solver.params, cols)
    l1, _ = loaded._loss_and_metrics(loaded.params, cols)
    assert np.isclose(float(l0), float(l1), rtol=1e-12)
    loaded.fit(max_epochs=5, tqdm_file=None)
    assert loaded.global_epoch == 25


def _resume_parity(solver, loaded, seed=777):
    """Fit one more epoch on each side from the same reseeded global PRNG
    store: identical params + opt state + sampled points must produce the
    identical next-epoch training loss."""
    from neurodiffeq_tpu.utils import set_seed

    set_seed(seed)
    solver.fit(max_epochs=1, tqdm_file=None)
    set_seed(seed)
    loaded.fit(max_epochs=1, tqdm_file=None)
    l0 = float(solver.metrics_history['train_loss'][-1])
    l1 = float(loaded.metrics_history['train_loss'][-1])
    assert np.isclose(l0, l1, rtol=1e-8), (l0, l1)


def test_save_load_siren_roundtrip_and_resume(tmp_path):
    """A SIREN net survives the round trip with its frequency scales intact
    and the loaded solver's next fit() epoch reproduces the original's loss
    (round-4 capability x persistence, reference save/load scope
    solvers_utils.py:281-545)."""
    from neurodiffeq_tpu.networks import SIREN

    solver = Solver1D(
        ode_system=_ode,
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        nets=[SIREN(1, 1, hidden_units=(16, 16), w0=5.0, w0_first=7.0)],
        t_min=0.0, t_max=2.0,
    )
    solver.fit(max_epochs=30, tqdm_file=None)
    path = str(tmp_path / 'siren.ndq')
    solver.save(path=path)

    loaded = Solver1D.load(path=path)
    net = loaded.nets[0]
    assert isinstance(net, SIREN)
    assert net.w0 == 5.0 and net.w0_first == 7.0
    assert net.hidden_units == (16, 16)

    ts = np.linspace(0, 2, 33)
    assert np.allclose(np.asarray(solver.get_solution()(ts)),
                       np.asarray(loaded.get_solution()(ts)), atol=1e-12)
    _resume_parity(solver, loaded)


def test_save_load_fourier_fcnn_B_bitexact(tmp_path):
    """The frozen random-Fourier matrix B must survive save/load bit-exactly
    — a re-drawn B would silently change the embedding the trained FCNN
    weights were fitted against."""
    from neurodiffeq_tpu.networks import FourierFCNN

    solver = Solver1D(
        ode_system=_ode,
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        nets=[FourierFCNN(1, 1, n_features=8, sigma=2.0, hidden_units=(16,))],
        t_min=0.0, t_max=2.0,
    )
    solver.fit(max_epochs=20, tqdm_file=None)
    B_before = np.asarray(solver.params[0]['B'])
    path = str(tmp_path / 'ffcnn.ndq')
    solver.save(path=path)

    loaded = Solver1D.load(path=path)
    net = loaded.nets[0]
    assert isinstance(net, FourierFCNN)
    assert net.sigma == 2.0 and net.n_features == 8
    assert np.array_equal(np.asarray(loaded.params[0]['B']), B_before)

    ts = np.linspace(0, 2, 17)
    assert np.allclose(np.asarray(solver.get_solution()(ts)),
                       np.asarray(loaded.get_solution()(ts)), atol=1e-12)
    _resume_parity(solver, loaded)


def test_save_load_causal_loss_fn(tmp_path):
    """A `causal(...)` closure loss_fn round-trips through dill and the
    loaded solver trains with the same causal objective."""
    from neurodiffeq_tpu.losses import causal

    solver = Solver1D(
        ode_system=_ode,
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
        loss_fn=causal(epsilon=5.0, n_bins=8),
    )
    solver.fit(max_epochs=10, tqdm_file=None)
    path = str(tmp_path / 'causal.ndq')
    solver.save(path=path)

    loaded = Solver1D.load(path=path)
    assert callable(loaded.loss_fn)
    # identical causal loss (incl. epsilon=5 weighting) on identical points
    cols = [np.linspace(0.0, 2.0, 32).reshape(-1, 1)]
    l0, _ = solver._loss_and_metrics(solver.params, cols)
    l1, _ = loaded._loss_and_metrics(loaded.params, cols)
    assert np.isclose(float(l0), float(l1), rtol=1e-12)
    _resume_parity(solver, loaded)


def test_save_load_variational_solver(tmp_path):
    """A Deep Ritz ('variational') solver round-trips: the registry-name
    loss_fn, its residual_power=1 semantics, and the trained energy all
    survive."""
    from neurodiffeq_tpu.conditions import DirichletBVP2D

    pde = lambda u, x, y: [0.5 * (diff(u, x) ** 2 + diff(u, y) ** 2) - u]
    zero = lambda v: 0.0 * v
    solver = Solver2D(
        pde_system=pde,
        conditions=[DirichletBVP2D(
            x_min=0.0, x_min_val=zero, x_max=1.0, x_max_val=zero,
            y_min=0.0, y_min_val=zero, y_max=1.0, y_max_val=zero)],
        xy_min=(0, 0), xy_max=(1, 1),
        loss_fn='variational',
    )
    solver.fit(max_epochs=10, tqdm_file=None)
    path = str(tmp_path / 'ritz.ndq')
    solver.save(path=path)

    loaded = Solver2D.load(path=path)
    # the registry name resolves to the variational function (with its
    # residual_power=1 marker) at construction
    from neurodiffeq_tpu.losses import variational
    lf = loaded.loss_fn
    assert lf == 'variational' or getattr(lf, '__name__', '') == 'variational'
    assert getattr(variational, 'residual_power', 2) == 1
    rng = np.random.default_rng(0)
    cols = [rng.random((64, 1)), rng.random((64, 1))]
    l0, _ = solver._loss_and_metrics(solver.params, cols)
    l1, _ = loaded._loss_and_metrics(loaded.params, cols)
    # energies (possibly negative) must agree exactly
    assert np.isclose(float(l0), float(l1), rtol=1e-12)
    _resume_parity(solver, loaded)


def test_save_load_hypercube_halton_generators(tmp_path):
    """GeneratorHypercube (uniform + halton) train/valid generators survive
    the round trip with their box/method config, and the loaded high-dim
    solver keeps training."""
    from neurodiffeq_tpu.generators import GeneratorHypercube
    from neurodiffeq_tpu.networks import FCNN
    from neurodiffeq_tpu.solvers import GenericSolver

    d = 4
    solver = GenericSolver(
        diff_eqs=lambda u, *xs: [sum(diff(u, x) for x in xs) + u],
        conditions=[NoCondition()],
        nets=[FCNN(n_input_units=d, n_output_units=1, hidden_units=(16,))],
        train_generator=GeneratorHypercube(64, dim=d, method='halton'),
        valid_generator=GeneratorHypercube(
            32, dim=d, r_min=(0.0,) * d, r_max=(1.0, 2.0, 3.0, 4.0)),
    )
    solver.fit(max_epochs=5, tqdm_file=None)
    path = str(tmp_path / 'hyper.ndq')
    solver.save(path=path)

    loaded = GenericSolver.load(path=path)
    tr = loaded.generator['train'].generator
    va = loaded.generator['valid'].generator
    assert isinstance(tr, GeneratorHypercube) and isinstance(va, GeneratorHypercube)
    assert tr.dim == d and tr.method == 'halton'
    assert va.r_max == (1.0, 2.0, 3.0, 4.0)
    _resume_parity(solver, loaded, seed=123)
    loaded.fit(max_epochs=3, tqdm_file=None)
    assert loaded.global_epoch == 9


def test_save_load_clamped_biharmonic_solver(tmp_path):
    """A clamped-plate solver (DirichletBoxND(power=2) + stde_biharmonic)
    survives save/load: the condition keeps its mask/power config (the
    boundary stays exact to 2nd order in the loaded solver) and training
    resumes with epoch parity."""
    from neurodiffeq_tpu import fields as F
    from neurodiffeq_tpu.conditions import DirichletBoxND
    from neurodiffeq_tpu.generators import GeneratorHypercube
    from neurodiffeq_tpu.networks import FCNN
    from neurodiffeq_tpu.operators import stde_biharmonic
    from neurodiffeq_tpu.solvers import GenericSolver

    d = 3
    solver = GenericSolver(
        diff_eqs=lambda u, *xs: [stde_biharmonic(u, *xs, n_est=2)
                                 - sum(F.sin(np.pi * x) for x in xs)],
        conditions=[DirichletBoxND(d, power=2, mask='sat', k=5)],
        nets=[FCNN(n_input_units=d, n_output_units=1, hidden_units=(16,))],
        train_generator=GeneratorHypercube(32, dim=d),
        valid_generator=GeneratorHypercube(32, dim=d),
        n_batches_valid=0,
    )
    solver.fit(max_epochs=5, tqdm_file=None)
    path = str(tmp_path / 'clamped.ndq')
    solver.save(path=path)

    loaded = GenericSolver.load(path=path)
    cond = loaded.conditions[0]
    assert isinstance(cond, DirichletBoxND)
    assert cond.power == 2 and cond.mask == 'sat' and cond.k == 5
    # clamped invariant survives the round trip: u == 0 and du/dn == 0 on a face
    pts = np.random.default_rng(0).random((16, d))
    pts[:, 0] = 0.0
    sol = loaded.get_solution(best=False)
    vals = np.asarray(sol(*[pts[:, i] for i in range(d)], to_numpy=True))
    assert np.allclose(vals, 0.0, atol=1e-6)
    _resume_parity(solver, loaded, seed=321)
    loaded.fit(max_epochs=3, tqdm_file=None)
    assert loaded.global_epoch == 9


def test_hub_roundtrip_siren(tmp_path, monkeypatch):
    """Hub-mock upload/download of a SIREN solver: the round-4 net class
    survives the wire path (dill blob through the mocked hub), not just the
    local-file path."""
    import io
    import sys
    import types
    import dill
    from neurodiffeq_tpu.networks import SIREN

    solver = Solver1D(
        ode_system=_ode,
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        nets=[SIREN(1, 1, hidden_units=(8, 8), w0=5.0)],
        t_min=0.0, t_max=2.0,
    )
    solver.fit(max_epochs=5, tqdm_file=None)

    store = {}

    class FakeResponse:
        status_code = 200
        content = b''

        def raise_for_status(self):
            pass

    def fake_post(url, headers=None, files=None, data=None):
        store['blob'] = files['file'][1].read()
        return FakeResponse()

    def fake_get(url, headers=None):
        resp = FakeResponse()
        resp.content = store['blob']
        return resp

    fake_requests = types.ModuleType('requests')
    fake_requests.post = fake_post
    fake_requests.get = fake_get
    monkeypatch.setitem(sys.modules, 'requests', fake_requests)
    monkeypatch.setenv('NEURODIFF_API_KEY', 'test-key')

    solver.save(name='siren-exp-decay', save_to_hub=True)
    d = dill.load(io.BytesIO(store['blob']))
    assert type(d['nets'][0]).__name__ == 'SIREN'

    loaded = Solver1D.load(name='siren-exp-decay')
    assert isinstance(loaded.nets[0], SIREN)
    assert loaded.nets[0].w0 == 5.0
    ts = np.linspace(0, 2, 9)
    assert np.allclose(np.asarray(solver.get_solution()(ts)),
                       np.asarray(loaded.get_solution()(ts)), atol=1e-12)


def test_reference_parity_helpers():
    """Module-level helpers matching the reference's solvers_utils surface
    (is_solution_name/process_response/create_cache_dir/get_parameters/
    get_conditions/get_generator/JsonEncoder/get_loss/get_sample_solution*,
    reference solvers_utils.py:32-256)."""
    import json
    import jax.numpy as jnp
    from neurodiffeq_tpu import solvers_utils as su

    assert su.is_solution_name('user/lotka-volterra')
    assert not su.is_solution_name('./local.ndq')

    class FakeResponse:
        def json(self):
            return {'ok': 1}
    assert su.process_response(FakeResponse()) == {'ok': 1}

    d = su.create_cache_dir()
    assert d.endswith('.neurodiff') and __import__('os').path.isdir(d)

    lam = 0.5
    eq = lambda u, t: [diff(u, t) + lam * u]
    # captured framework callables (diff) are excluded by value, so the result
    # is hub-serializable parameter data only
    assert su.get_parameters(eq) == {'lam': 0.5}

    conds = su.get_conditions([IVP(t_0=0.0, u_0=1.0)])
    assert conds[0]['condition_type'] == 'IVP'
    assert conds[0]['t_0'] == 0.0

    solver = Solver1D(ode_system=_ode, conditions=[IVP(t_0=0.0, u_0=1.0)],
                      t_min=0.0, t_max=2.0)
    gen_meta = su.get_generator(solver.generator)
    assert gen_meta.get('size') == 32
    assert not any(callable(v) for v in gen_meta.values())

    # wrapped/combined train generators must still yield JSON-serializable
    # metadata (nested sub-generators are stringified)
    from neurodiffeq_tpu.generators import Generator1D, ResidualAdaptiveGenerator
    adaptive = Solver1D(ode_system=_ode, conditions=[IVP(t_0=0.0, u_0=1.0)],
                        t_min=0.0, t_max=2.0,
                        train_generator=ResidualAdaptiveGenerator(
                            Generator1D(16, 0.0, 2.0), oversample=4))
    meta = su.get_generator(adaptive.generator)
    json.dumps(meta, cls=su.JsonEncoder)
    assert 'Generator1D' in meta['generator']

    enc = json.dumps({'a': np.int32(3), 'b': np.float64(1.5),
                      'c': np.arange(3), 'd': jnp.ones(2)}, cls=su.JsonEncoder)
    assert json.loads(enc) == {'a': 3, 'b': 1.5, 'c': [0, 1, 2], 'd': [1.0, 1.0]}

    assert su.get_loss('l2') == 'l2'
    assert 'lambda' in (su.get_loss(lambda r, f, x: r) or '')

    solver.fit(max_epochs=2, tqdm_file=None)
    xs, us = su.get_sample_solution1D(solver)
    assert len(xs) == len(us[0]) > 0

    assert isinstance(su.DEV, bool)
    assert su.NEURODIFF_API_URL.startswith('http')


def test_load_does_not_clobber_module_globals(tmp_path):
    """dill pickles a MODULE by value when it sits in a closure cell (a
    diff_eqs lambda defined after a function-local `import ... as F` — the
    common notebook pattern), and a raw dill.load would then
    `fields.__dict__.update(...)` every live global with stale save-time
    copies: identity-keyed dispatch (`_JET_SAFE_OPS`) stops recognizing
    jnp ops and every later expression silently falls back to the
    per-sample path. `_dill_load_protected` must restore any rebound
    module entry after the load while keeping the loaded solver usable."""
    import jax
    import jax.numpy as jnp
    from neurodiffeq_tpu import fields as F
    from neurodiffeq_tpu.conditions import DirichletBoxND, _ann_field
    from neurodiffeq_tpu.generators import GeneratorHypercube
    from neurodiffeq_tpu.networks import FCNN
    from neurodiffeq_tpu.solvers import GenericSolver

    # the hazard: the lambda closes over the fields MODULE via a cell
    def make_eqs():
        from neurodiffeq_tpu import fields as F_local
        return lambda u, x, y: [F.diff(u, x, 2) + F_local.sin(u)]

    eqs = make_eqs()
    assert any(isinstance(c.cell_contents, type(F))
               for c in eqs.__closure__), "hazard setup lost its module cell"

    solver = GenericSolver(
        diff_eqs=eqs,
        conditions=[DirichletBoxND(2)],
        nets=[FCNN(n_input_units=2, n_output_units=1, hidden_units=(8,))],
        train_generator=GeneratorHypercube(16, dim=2),
        valid_generator=GeneratorHypercube(16, dim=2),
        n_batches_valid=0,
    )
    solver.fit(max_epochs=2, tqdm_file=None)

    before = {name: obj for name, obj in vars(F).items()
              if not name.startswith('__')}
    path = str(tmp_path / 'cell.ndq')
    solver.save(path=path)
    loaded = GenericSolver.load(path=path)

    rebound = [name for name, obj in before.items()
               if getattr(F, name, None) is not obj]
    assert rebound == [], f"load rebound fields globals: {rebound}"
    # identity-keyed fast-path dispatch still recognizes live jnp ops
    assert jnp.multiply in F._jet_safe_ops()

    # a FRESH expression still gets the batched fast path (no fallback)
    net = FCNN(n_input_units=2, n_output_units=1, hidden_units=(8,))
    params = net.init(jax.random.PRNGKey(0))
    pts = np.linspace(0.1, 0.9, 7)
    x, y = F.coordinates(pts, pts)
    u = _ann_field(net, params, (x, y))
    composed = F.diff(x ** 2 * F.diff(u, x), x)
    assert composed._dinfo is not None and composed.trule is not None

    # and the loaded solver still trains (its closure cell references the
    # live module object, not the discarded stale copies)
    loaded.fit(max_epochs=2, tqdm_file=None)
    assert loaded.global_epoch == 4
