"""1024^3 c2c FFT gate check — does the per-N `auto` precision policy hold
where it was extrapolated?

The `auto` policy switches to HIGHEST above N=768 because the bf16x3 error
was *extrapolated*, not measured, past the dense K=768 contraction
(mxu_fft._precision).  This runs one plane-carried c2c round trip at
transform length 1024 under both policies and records the gate error.

Memory: a 1024^3 c2c round trip carries 8 GiB of (re, im) planes plus
contraction temps; with the planes as persistent device arguments it may
not fit the 16 GiB HBM, so everything (generation -> round trip -> error
reduction) runs inside ONE jit from a PRNG key and nothing persists.  If
the cubic grid still OOMs, fall back to (1024, 512, 512) — the policy is
per transform LENGTH, and axis 0 keeps the dense K=1024 contraction.

    python scripts/gate_fft_1024.py [--time]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cudecomp_tpu as cd
from cudecomp_tpu.config import GridConfig
from cudecomp_tpu.ops.fft import DistributedFFT


def gate_once(gdims, precision):
    grid = cd.make_grid(GridConfig(gdims=gdims, pdims=(1, 1)),
                        devices=jax.devices()[:1])
    plan = DistributedFFT(grid=grid, split_complex=True,
                          precision=precision, gauss=True)

    @jax.jit
    def gate(key):
        k0, k1 = jax.random.split(key)
        r = jax.random.normal(k0, gdims, jnp.float32)
        i = jax.random.normal(k1, gdims, jnp.float32)
        outr, outi = plan.inverse_planes(plan.forward_planes((r, i)))
        return jnp.maximum(jnp.max(jnp.abs(outr - r)),
                           jnp.max(jnp.abs(outi - i)))

    t0 = time.perf_counter()
    err = float(gate(jax.random.PRNGKey(3)))
    dt = time.perf_counter() - t0
    return err, dt


def main(argv):
    for gdims in ((1024, 1024, 1024), (1024, 512, 512)):
        results = []
        failed = False
        for precision in ("highest", "high"):
            try:
                err, dt = gate_once(gdims, precision)
            except Exception as e:  # OOM / runtime failure -> try smaller
                print(json.dumps({"gdims": gdims, "precision": precision,
                                  "error": f"{type(e).__name__}: "
                                           f"{str(e)[:200]}"}), flush=True)
                failed = True
                break
            results.append({"gdims": gdims, "precision": precision,
                            "err": err, "gate_5e-4": err < 5e-4,
                            "compile+run_s": round(dt, 1)})
            print(json.dumps(results[-1]), flush=True)
        if not failed:
            return results
    return None


if __name__ == "__main__":
    main(sys.argv[1:])
