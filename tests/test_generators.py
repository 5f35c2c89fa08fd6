"""Generator shape/distribution/algebra tests (parity with reference
tests/test_generators.py)."""
import numpy as np
import pytest
import jax

from neurodiffeq_tpu import generators as G
from neurodiffeq_tpu.utils import next_rng_key


def _arr(x):
    return np.asarray(x)


@pytest.mark.parametrize("method", [
    'uniform', 'equally-spaced', 'equally-spaced-noisy', 'log-spaced',
    'log-spaced-noisy', 'chebyshev', 'chebyshev1', 'chebyshev2',
    'chebyshev2-noisy', 'latin-hypercube'])
def test_generator1d_methods(method):
    t_min, t_max = 0.1, 2.0
    g = G.Generator1D(64, t_min, t_max, method=method)
    x = _arr(g.get_examples())
    assert x.shape == (64,)
    if 'noisy' not in method:
        assert x.min() >= t_min - 1e-9 and x.max() <= t_max + 1e-9
    assert g.size == 64


def test_generator1d_unknown_method():
    with pytest.raises(ValueError):
        G.Generator1D(10, method='magic')


def test_generator1d_log_requires_positive():
    with pytest.raises(ValueError):
        G.Generator1D(10, t_min=-1, t_max=1, method='log-spaced')


def test_generator1d_uniform_distribution():
    g = G.Generator1D(10000, 2.0, 3.0, method='uniform')
    x = _arr(g.get_examples())
    assert abs(x.mean() - 2.5) < 0.02
    assert x.min() >= 2.0 and x.max() <= 3.0


@pytest.mark.parametrize("method", ['equally-spaced', 'equally-spaced-noisy', 'chebyshev',
                                    'chebyshev2', 'chebyshev2-noisy', 'latin-hypercube'])
def test_generator2d(method):
    g = G.Generator2D((8, 6), (0, 1), (1, 2), method=method)
    x, y = g.get_examples()
    assert _arr(x).shape == (48,)
    assert _arr(y).shape == (48,)
    assert g.size == 48


def test_generator3d():
    g = G.Generator3D((4, 5, 6), method='equally-spaced-noisy')
    out = g.get_examples()
    assert len(out) == 3
    assert all(_arr(v).shape == (120,) for v in out)


def test_generator_nd():
    g = G.GeneratorND(grid=(5, 6), r_min=(0, 1), r_max=(1, 2),
                      methods=['equally-spaced', 'chebyshev'], noisy=True)
    out = g.get_examples()
    assert len(out) == 2 and _arr(out[0]).shape == (30,)
    # cut slicing reduces size
    g = G.GeneratorND(grid=(10,), r_min=(0.0,), r_max=(1.0,), methods=['equally-spaced'],
                      noisy=False, cut=(2, 8))
    assert g.size == 6
    assert _arr(g.get_examples()).shape == (6,)


def test_generator_spherical():
    g = G.GeneratorSpherical(512, r_min=0.5, r_max=2.0)
    r, theta, phi = g.get_examples()
    r, theta, phi = _arr(r), _arr(theta), _arr(phi)
    assert r.shape == (512,)
    assert (r >= 0.5 - 1e-6).all() and (r <= 2.0 + 1e-6).all()
    assert (theta >= 0).all() and (theta <= np.pi).all()
    assert (phi >= 0).all() and (phi <= 2 * np.pi).all()
    with pytest.raises(ValueError):
        G.GeneratorSpherical(10, r_min=-1)


def test_concat_generator_plus_operator():
    g = G.Generator1D(16, 0, 1) + G.Generator1D(8, 1, 2)
    assert isinstance(g, G.ConcatGenerator)
    assert g.size == 24
    assert _arr(g.get_examples()).shape == (24,)


def test_ensemble_generator_star_operator():
    g = G.Generator1D(16, 0, 1) * G.Generator1D(16, 5, 6)
    assert isinstance(g, G.EnsembleGenerator)
    x, y = g.get_examples()
    assert _arr(x).shape == (16,) and _arr(y).shape == (16,)
    assert _arr(x).max() <= 1.0 + 0.2 and _arr(y).min() >= 5.0 - 0.2
    with pytest.raises(ValueError):
        G.Generator1D(16, 0, 1) * G.Generator1D(8, 0, 1)


def test_mesh_generator_xor_operator():
    g = G.Generator1D(4, 0, 1, method='equally-spaced') ^ G.Generator1D(6, 0, 1, method='equally-spaced')
    assert isinstance(g, G.MeshGenerator)
    assert g.size == 24
    x, y = g.get_examples()
    assert _arr(x).shape == (24,)
    # nested mesh flattening
    g3 = g ^ G.Generator1D(2, 0, 1, method='equally-spaced')
    assert g3.size == 48
    assert len(g3.generators) == 3
    out = g3.get_examples()
    assert len(out) == 3


def test_static_generator():
    g = G.StaticGenerator(G.Generator1D(16, 0, 1, method='uniform'))
    a = _arr(g.get_examples())
    b = _arr(g.get_examples())
    assert np.array_equal(a, b)


def test_predefined_generator():
    xs = np.linspace(0, 1, 10)
    ys = np.linspace(2, 3, 10)
    g = G.PredefinedGenerator(xs, ys)
    x, y = g.get_examples()
    assert np.allclose(_arr(x), xs) and np.allclose(_arr(y), ys)
    with pytest.raises(ValueError):
        G.PredefinedGenerator(np.zeros(3), np.zeros(4))


def test_transform_generator():
    g = G.TransformGenerator(G.Generator1D(16, 0, 1, method='equally-spaced'),
                             transforms=[lambda x: x * 2])
    assert np.allclose(_arr(g.get_examples()), np.linspace(0, 2, 16))
    g2 = G.TransformGenerator(
        G.Generator1D(16, 0, 1, method='equally-spaced') * G.Generator1D(16, 0, 1, method='equally-spaced'),
        transform=lambda x, y: (x + y, x - y))
    x, y = g2.get_examples()
    assert np.allclose(_arr(y), 0)


def test_filter_generator_dynamic_size():
    g = G.FilterGenerator(G.Generator1D(100, 0, 1, method='equally-spaced'),
                          filter_fn=lambda xs: _arr(xs[0]) < 0.5)
    x = g.get_examples()
    assert (_arr(x) < 0.5).all()
    assert g.size == _arr(x).shape[0]
    assert not g.jittable


def test_filter_generator_fixed_size():
    """TPU-native static-shape mode: exactly `size` points, all passing the
    filter, jittable (SURVEY.md §7(3))."""
    import jax
    import jax.numpy as jnp
    g = G.FilterGenerator(G.Generator1D(128, 0, 1, method='equally-spaced-noisy'),
                          filter_fn=lambda xs: xs[0] < 0.5,
                          size=64, fixed_size=True)
    assert g.jittable
    x = g.get_examples()
    assert _arr(x).shape == (64,)
    assert (_arr(x) < 0.5).all()

    # works under jit with static shapes
    out = jax.jit(g.sample)(jax.random.PRNGKey(0))
    assert out.shape == (64,)
    assert bool(jnp.all(out < 0.5))

    # 2-D: tuple output, columns stay aligned through the gather
    g2 = G.FilterGenerator(G.Generator2D((16, 16)),
                           filter_fn=lambda xs: xs[0] + xs[1] < 1.0,
                           size=100, fixed_size=True)
    xs, ys = jax.jit(g2.sample)(jax.random.PRNGKey(1))
    assert xs.shape == (100,) and ys.shape == (100,)
    assert bool(jnp.all(xs + ys < 1.0))


def test_filter_generator_fixed_size_solver_fast_path():
    """fit() must stay on the chunked on-device scan with a fixed-size filter."""
    from neurodiffeq_tpu.solvers import Solver1D
    from neurodiffeq_tpu.conditions import IVP
    from neurodiffeq_tpu.fields import diff
    train = G.FilterGenerator(G.Generator1D(64, 0, 2, method='equally-spaced-noisy'),
                              filter_fn=lambda xs: xs[0] > 0.05,
                              size=32, fixed_size=True)
    solver = Solver1D(
        ode_system=lambda u, t: [diff(u, t) + u],
        conditions=[IVP(t_0=0.0, u_0=1.0)],
        t_min=0.0, t_max=2.0,
        train_generator=train,
        valid_generator=G.Generator1D(32, 0, 2, method='equally-spaced'),
    )
    assert solver.generator['train'].jittable
    solver.fit(max_epochs=300, tqdm_file=None)
    sol = solver.get_solution()
    ts = np.linspace(0.1, 2, 40)
    err = np.abs(np.asarray(sol(ts)) - np.exp(-ts)).max()
    assert err < 5e-2, f"filtered training failed to converge: {err}"


def test_resample_generator():
    g = G.ResampleGenerator(G.Generator1D(32, 0, 1, method='equally-spaced'), size=16)
    assert _arr(g.get_examples()).shape == (16,)
    g = G.ResampleGenerator(G.Generator1D(32, 0, 1, method='equally-spaced'),
                            size=64, replacement=True)
    assert _arr(g.get_examples()).shape == (64,)


def test_batch_generator():
    g = G.BatchGenerator(G.Generator1D(7, 0, 1, method='uniform'), batch_size=5)
    for _ in range(5):
        assert _arr(g.get_examples()).shape == (5,)
    assert not g.jittable


def test_sampler_generator_reshapes():
    g = G.SamplerGenerator(G.Generator2D((4, 4)))
    cols = g.get_examples()
    assert len(cols) == 2
    assert all(c.shape == (16, 1) for c in cols)


def test_generators_are_jittable():
    """Pure sampling must work under jit (the whole point of the redesign)."""
    gens = [
        G.Generator1D(16, 0, 1, method='equally-spaced-noisy'),
        G.Generator2D((4, 4)),
        G.GeneratorSpherical(16),
        G.Generator1D(8, 0, 1) ^ G.Generator1D(4, 0, 1),
        G.SamplerGenerator(G.Generator1D(8, 0, 1)),
    ]
    for g in gens:
        out = jax.jit(g.sample)(next_rng_key())
        flat = out if isinstance(out, (tuple, list)) else [out]
        assert all(isinstance(o, jax.Array) for o in flat)


def test_repr():
    g = G.Generator1D(16, 0, 1)
    assert 'Generator1D' in repr(g) and 'size=16' in repr(g)
    assert 'ConcatGenerator' in repr(g + g)
