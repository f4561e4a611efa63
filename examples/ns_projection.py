"""Fractional-step incompressible Navier-Stokes on a pencil decomposition.

The composite consumer pattern the reference library exists to serve
(finite-difference CFD codes; ``README.md:9-14``): every timestep composes

  * one fused ghost-cell pass for advection + diffusion (halo engine),
  * one distributed FFT round trip for the pressure-Poisson solve
    (transpose engine, X->Y->Z and back),
  * two more ghost-cell passes for the divergence and pressure gradient,

via :class:`cudecomp_tpu.models.ProjectionSolver`.  The projection is
EXACT at the discrete level (the composed central-difference div(grad) is
diagonalized by the DFT), so this example self-checks two machine-tight
invariants rather than eyeballing curves:

  1. the velocity stays discretely divergence-free every step;
  2. on the extruded 2D Taylor-Green vortex the nonlinear terms cancel
     exactly under the discrete projection, so the energy trajectory
     equals the RK4 stability polynomial of the discrete viscous
     eigenvalue — checked to 1e-9 (f64) / 1e-4 (f32).

    python examples/ns_projection.py [N] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cudecomp_tpu as cd
from cudecomp_tpu.config import GridConfig
from cudecomp_tpu.models import ProjectionSolver
from cudecomp_tpu.models.incompressible import rk_stability


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    ndev = len(jax.devices())
    pr = 1
    for c in range(int(np.sqrt(ndev)), 0, -1):
        if ndev % c == 0:
            pr = c
            break
    pdims = (pr, ndev // pr)
    f64 = jax.config.read("jax_enable_x64")
    dtype = jnp.float64 if f64 else jnp.float32

    grid = cd.make_grid(GridConfig(gdims=(N, N, N), pdims=pdims))
    solver = ProjectionSolver(grid=grid, nu=0.02, scheme="rk4",
                              split_complex=not f64)
    u, fields = solver.setup_tg(dtype=dtype)
    e0 = float(solver.energy(u))
    dt = 1e-2

    step = jax.jit(lambda v: solver.step(v, fields, dt))
    u = step(u)  # compile
    u, _ = jax.block_until_ready(u), time.perf_counter()
    t0 = time.perf_counter()
    maxdiv = 0.0
    for _ in range(steps - 1):
        u = step(u)
        maxdiv = max(maxdiv, float(solver.max_divergence(u)))
    jax.block_until_ready(u)
    ms = (time.perf_counter() - t0) / max(steps - 1, 1) * 1e3

    z = solver.viscous_eigenvalue((1, 1, 0)) * dt
    want = rk_stability("rk4", z) ** (2 * steps)
    got = float(solver.energy(u)) / e0
    tol = 1e-9 if f64 else 1e-4
    print(f"{N}^3 pdims {pdims} dtype {jnp.dtype(dtype).name}: "
          f"{ms:.2f} ms/RK4-step")
    print(f"energy ratio {got:.12f} vs RK4 polynomial {want:.12f} "
          f"(|err| {abs(got - want):.2e}, tol {tol:g})")
    print(f"max |div_h u| over run: {maxdiv:.2e}")
    assert abs(got - want) < tol, (got, want)
    div_tol = 1e-10 if f64 else 5e-3
    assert maxdiv < div_tol, maxdiv
    print("OK")


if __name__ == "__main__":
    main()
