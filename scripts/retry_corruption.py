"""One-command retry of the two tracked axon-server corruption instances.

The tunnel SERVER can mis-execute specific program shapes deterministically
(BENCH_NOTES.md r3 "runtime corruption"); the library is bit-verified on CPU
for the same programs, so these are runtime defects to RETRY on every
runtime update, not algorithm bugs.  This script re-runs the falsification
matrix and prints one JSON status line per probe:

  1. 512^3 r2c round trip (signature: max err exactly ~1.88520407...,
     appears after ANY 768^3 workload has run on the server);
  2. 256^3 TG single IF-RK4 step and the bare Euler u + dt*NL(u) shape
     (signature: kinetic energy drops to ~5/64 = 0.078125 in one step —
     one velocity component halved).

Run it FIRST in a fresh process (nothing >= 768^3 before it).  Exit code 0
regardless of status; the JSON lines are the record for BENCH_NOTES.md.

    python scripts/retry_corruption.py [--skip-tg] [--skip-r2c]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def probe_r2c512():
    import cudecomp_tpu as cd
    from cudecomp_tpu.ops.fft import DistributedFFT

    N = 512
    grid = cd.make_grid(cd.GridConfig(gdims=(N, N, N), pdims=(1, 1)),
                        devices=jax.devices()[:1])
    plan = DistributedFFT(grid=grid, real=True, split_complex=True)
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), grid.global_shape(0),
                          dtype=jnp.float32), grid.sharding(0))

    @jax.jit
    def gate(v):
        return jnp.max(jnp.abs(plan.inverse_planes(plan.forward_planes(v))
                               - v))

    err = float(gate(x))
    return {"probe": "r2c_512", "err": err,
            "status": "clean" if err < 5e-4 else "CORRUPT",
            "signature_match": abs(err - 1.8852040767669678) < 1e-6}


def probe_tg256():
    import cudecomp_tpu as cd
    from cudecomp_tpu.models.taylor_green import TaylorGreenSolver

    N = 256
    grid = cd.make_grid(cd.GridConfig(gdims=(N, N, N), pdims=(1, 1)),
                        devices=jax.devices()[:1])
    solver = TaylorGreenSolver(grid=grid, split_complex=True)
    uh, fields = solver.setup()
    dt = 0.01
    t = solver._t

    @jax.jit
    def one_rk4(u):
        u2 = solver.step(u, fields, dt)
        return solver.energy(u2, fields)

    @jax.jit
    def one_euler_nl(u):
        # the exact corrupted program shape: u + dt * NL(u), no viscous term
        nl = solver._nonlinear(u, fields)
        u2 = t(lambda a, k: a + dt * k, u, nl)
        return solver.energy(u2, fields)

    e_rk4 = float(one_rk4(uh))
    e_eul = float(one_euler_nl(uh))
    # expected ~0.1249 (RK4, slight viscous decay) / ~0.125 (Euler);
    # corruption signature: ~5/64 = 0.078125 (one component halved)
    ok_rk4 = abs(e_rk4 - 0.125) < 2e-3
    ok_eul = abs(e_eul - 0.125) < 2e-3
    return {"probe": "tg_256", "e_rk4": e_rk4, "e_euler_nl": e_eul,
            "status": "clean" if (ok_rk4 and ok_eul) else "CORRUPT",
            "signature_match": (abs(e_rk4 - 0.078125) < 2e-3
                                or abs(e_eul - 0.078125) < 2e-3)}


def main(argv):
    # The probes characterize the SERVER defect, so they run with the
    # library's fusion-guard workaround OFF (see mxu_fft._guard_fusion);
    # pass --guarded to probe the guarded (production-default) programs
    # instead — those are expected CLEAN even while the raw signatures
    # persist (r5 session log: the defect is a fused slice/flip +
    # elementwise prologue mis-execution at >= ~2^23-element shapes,
    # dodged by optimization_barrier at the contraction boundaries).
    guarded = "--guarded" in argv
    os.environ["CUDECOMP_TPU_FFT_GUARD_FUSION"] = "1" if guarded else "0"
    results = []
    if "--skip-r2c" not in argv:
        results.append({**probe_r2c512(), "guarded": guarded})
        print(json.dumps(results[-1]), flush=True)
    if "--skip-tg" not in argv:
        results.append({**probe_tg256(), "guarded": guarded})
        print(json.dumps(results[-1]), flush=True)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
