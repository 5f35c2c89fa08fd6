"""Test configuration: force CPU platform with 8 virtual devices (for mesh
sharding tests, SURVEY.md §4) and float64 numerics (so exact-constraint and
operator-identity tolerances match the reference's float64 CI suite).

Setting ``NEURODIFF_TEST_PLATFORM`` (e.g. ``=axon`` or ``=tpu``) opts the run
onto real accelerator hardware instead; only the float32 tier is supported
there (``NEURODIFF_TEST_PLATFORM=axon pytest -m f32``) — the main suite's
f64 tolerances assume a CPU x64 backend."""
import os

# must be set before jax initializes its backends
os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')
_PLATFORM = os.environ.get('NEURODIFF_TEST_PLATFORM', 'cpu')
os.environ['JAX_PLATFORMS'] = _PLATFORM

import jax  # noqa: E402

jax.config.update('jax_platforms', _PLATFORM)
jax.config.update('jax_enable_x64', _PLATFORM == 'cpu')

import matplotlib  # noqa: E402

matplotlib.use('Agg')

import pytest  # noqa: E402

from neurodiffeq_tpu.utils import set_seed, set_tensor_type  # noqa: E402

set_tensor_type(float_bits=64 if _PLATFORM == 'cpu' else 32)


@pytest.fixture(autouse=True)
def magic():
    """Deterministic seeding for every test (reference tests/test_ode.py:21-25)."""
    set_seed(42)
    yield
