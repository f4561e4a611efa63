"""Example applications built on the library — the analog of the reference's
``examples/`` tree (Taylor-Green spectral Navier-Stokes solver, Poisson
solver, finite-difference fractional-step Navier-Stokes solver, basic
usage)."""

from cudecomp_tpu.models.incompressible import ProjectionSolver
from cudecomp_tpu.models.poisson import PoissonSolver
from cudecomp_tpu.models.taylor_green import TaylorGreenSolver

__all__ = ["PoissonSolver", "ProjectionSolver", "TaylorGreenSolver"]
