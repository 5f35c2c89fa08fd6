r"""Hypersolver subpackage: neural-corrected numerical ODE integrators
(capability parity with reference ``neurodiffeq/hypersolver/``)."""
from .hypersolver import Hypersolver, DiscreteSolution1D
from .numerical_solvers import NumericalSolver, Euler, Heun, RK4

__all__ = ['Hypersolver', 'DiscreteSolution1D', 'NumericalSolver', 'Euler', 'Heun', 'RK4']
