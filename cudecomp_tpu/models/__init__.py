"""Example applications built on the library — the analog of the reference's
``examples/`` tree (Taylor-Green spectral Navier-Stokes solver, Poisson
solver, basic usage)."""

from cudecomp_tpu.models.poisson import PoissonSolver
from cudecomp_tpu.models.taylor_green import TaylorGreenSolver

__all__ = ["PoissonSolver", "TaylorGreenSolver"]
