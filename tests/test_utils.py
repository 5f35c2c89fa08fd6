"""Utility tests (parity with reference tests/test_utils.py: seeding,
column helpers; plus get_residual_info which the reference leaves untested)."""
import numpy as np
import pytest
import jax.numpy as jnp

from neurodiffeq_tpu import utils
from neurodiffeq_tpu import fields as F
from neurodiffeq_tpu.fields import diff


def test_set_seed_reproducible():
    utils.set_seed(123)
    a = np.random.rand(5)
    k1 = utils.next_rng_key()
    utils.set_seed(123)
    b = np.random.rand(5)
    k2 = utils.next_rng_key()
    assert np.array_equal(a, b)
    assert np.array_equal(np.asarray(k1), np.asarray(k2))


def test_column_helpers():
    m = jnp.arange(12.0).reshape(4, 3)
    cols = utils.split_columns(m)
    assert len(cols) == 3 and cols[0].shape == (4,)
    assert np.allclose(utils.hstack(cols), m)
    assert utils.vstack(cols).shape == (3, 4)
    try:
        utils.split_columns(jnp.arange(3.0))
        assert False
    except ValueError:
        pass


def test_safe_mkdir(tmp_path):
    p = str(tmp_path / 'a' / 'b')
    utils.safe_mkdir(p)
    utils.safe_mkdir(p)  # idempotent
    import os
    assert os.path.isdir(p)


def test_as_2d_column():
    assert utils.as_2d_column(np.arange(5)).shape == (5, 1)
    assert utils.as_2d_column(np.zeros((5, 2))).shape == (5, 2)


def test_get_residual_info():
    x, = F.coordinates(np.linspace(0.1, 1.0, 20))
    u = F.sin(x)
    diff_eqs = lambda u_, x_: [diff(u_, x_) + u_]  # noqa: E731

    info = utils.get_residual_info([u], [x], diff_eqs, highest_order=1)
    assert len(info) == 2
    residual = np.asarray(info[0][0])
    expected = np.cos(x.value[:, 0]) + np.sin(x.value[:, 0])
    assert np.allclose(residual[:, 0], expected, atol=1e-8)
    # first derivative of the residual w.r.t. x
    d_residual = np.asarray(info[1][0][0])
    expected_d = -np.sin(x.value[:, 0]) + np.cos(x.value[:, 0])
    assert np.allclose(d_residual[:, 0], expected_d, atol=1e-8)

    # detach=False keeps Fields
    info = utils.get_residual_info([u], [x], diff_eqs, highest_order=0, detach=False)
    assert isinstance(info[0][0], F.Field)


def test_warn_deprecate_class():
    from neurodiffeq_tpu._version_utils import warn_deprecate_class

    class New:
        def __init__(self, a):
            self.a = a

    Old = warn_deprecate_class(New)
    with pytest.warns(FutureWarning):
        obj = Old(5)
    assert isinstance(obj, New) and obj.a == 5


def test_import_does_not_initialize_backend():
    """Importing the package must never force JAX backend initialization.

    Backend init can block on accelerator runtimes (e.g. a remote TPU tunnel),
    so a module-level ``PRNGKey``/``jnp.array`` would make ``import
    neurodiffeq_tpu`` hang in device-less contexts (docs builds, CI collect).
    The global key store materializes its key lazily instead.
    """
    import subprocess
    import sys

    code = (
        "import jax._src.xla_bridge as xb\n"
        "def boom(*a, **k): raise RuntimeError('backend init during import')\n"
        "xb.backends = boom\n"
        "import neurodiffeq_tpu\n"
        "print('clean-import')\n"
    )
    out = subprocess.run(
        [sys.executable, '-c', code], capture_output=True, text=True, timeout=300,
        env={**__import__('os').environ, 'JAX_PLATFORMS': 'cpu'},
    )
    assert out.returncode == 0, out.stderr
    assert 'clean-import' in out.stdout
