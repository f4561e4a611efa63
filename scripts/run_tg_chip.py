"""Taylor-Green solver smoke on the real chip (split-complex MXU path).

Runs a few RK steps of the spectral Navier-Stokes solver end-to-end on the
TPU and reports energy/enstrophy (sanity: energy decays monotonically for
TG at Re=100).

N >= 256 requires the fusion guards (the library default on this
runtime): unguarded 256^3 nonlinear-step programs are deterministically
mis-executed by the axon server (one velocity component halved in a
single step — BENCH_NOTES.md r3 "third runtime-corruption instance";
root-caused r5 to a fused slice/flip + elementwise contraction-prologue
defect, dodged by optimization_barrier — see mxu_fft._guard_fusion).
The solver is verified correct for the same programs on CPU meshes; with
guards the 256^3 RK4 step and energy are exact on the chip (r5 log).

    python scripts/run_tg_chip.py [N] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import cudecomp_tpu as cd
from cudecomp_tpu.models.taylor_green import TaylorGreenSolver


def main(N=128, steps=10):
    grid = cd.make_grid(cd.GridConfig(gdims=(N, N, N), pdims=(1, 1)),
                        devices=jax.devices()[:1])
    solver = TaylorGreenSolver(grid=grid, split_complex=True)
    uh, fields = solver.setup()
    dt = 0.01

    @jax.jit
    def advance(u):
        def body(c, _):
            return solver.step(c, fields, dt), ()
        out, _ = lax.scan(body, u, None, length=steps)
        return out, solver.energy(out, fields)

    (uh1, e1) = advance(uh)
    e0 = float(solver.energy(uh, fields))
    t0 = time.perf_counter()
    (uh2, e2) = advance(uh1)
    e2 = float(e2)
    dt_wall = time.perf_counter() - t0
    print(f"TG {N}^3 split-complex on {jax.devices()[0].platform}: "
          f"E0={e0:.6f} -> E({2*steps} steps)={e2:.6f} "
          f"({dt_wall/steps*1e3:.1f} ms/step incl dispatch)")
    assert e2 < e0, "energy must decay"
    print("OK")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
