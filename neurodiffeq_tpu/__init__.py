r"""neurodiffeq_tpu: a TPU-native framework for solving ODEs/PDEs with neural networks.

A from-scratch JAX/XLA re-design with the full capability surface of the
reference ``neurodiffeq`` library (exact-constraint trial-solution / PINN
method): the ``diff`` primitive and vector-calculus operators, composable
collocation generators, condition reparameterizations, Solver1D/2D/Spherical/
Bundle training engines, function bases, callbacks/monitors, persistence, the
temporal subsystem, and the hypersolver — built on per-sample differentiable
fields, jitted train steps with on-device sampling, and mesh-sharded
collocation batches.
"""
import sys as _sys
import warnings as _warnings

__version__ = '0.1.0'

# like the reference (__init__.py:23-25), always surface deprecation warnings
_warnings.simplefilter('always', FutureWarning)

from . import utils
from . import fields
from . import operators
from . import networks
from . import generators
from . import conditions
from . import losses
from . import function_basis
from . import solvers
from . import solvers_utils
from . import monitors
from . import callbacks
from . import ode
from . import pde
from . import pde_spherical
from . import temporal
from . import hypersolver
from . import parallel

from .fields import diff, safe_diff, unsafe_diff

# parity alias: the reference exposes the diff primitive in a module named
# `neurodiffeq.neurodiffeq`; our equivalent core module is `fields`
_sys.modules[__name__ + '.neurodiffeq'] = fields
neurodiffeq = fields
