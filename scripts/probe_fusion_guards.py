"""Characterize the tracked runtime mis-execution and the fusion-guard fix.

The r5 root-cause probe (BENCH_NOTES.md r5): on the axon server, a fused
slice/flip + elementwise prologue of a large DFT contraction mis-executes
DETERMINISTICALLY at >= ~2^23-element shapes, while (a) every constituent
op is exact in isolation and (b) the identical program is bit-correct on
real CPU.  This script re-runs the falsification ladder on the current
runtime and prints one JSON line per probe:

  1. packed-irfft axis 0 at (129, 256, 256) — the minimal corrupt shape —
     with guards OFF (expect CORRUPT on the defective runtime) and ON
     (expect clean);
  2. the intermediate-exactness probe: the same program returning every
     untangle intermediate — inputs to the twiddle multiply come out
     exact while its output is wrong (the defining signature of a fused
     mis-execution rather than error accumulation);
  3. the 512^3 packed r2c round trip, guards ON (the production default —
     expect clean).

Run on the chip (no platform override).  Exit 0 regardless; the JSON
lines are the record for BENCH_NOTES.md.

    python scripts/probe_fusion_guards.py [--skip-512]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _irfft_err(n, batch, guard):
    os.environ["CUDECOMP_TPU_FFT_GUARD_FUSION"] = guard
    from cudecomp_tpu.ops import mxu_fft
    xn = np.random.RandomState(1).randn(n, *batch).astype(np.float32)
    ref = np.fft.rfft(xn, axis=0).astype(np.complex64)
    out = jax.jit(lambda r, i: mxu_fft.irfft_planes(r, i, axis=0, n=n))(
        jnp.asarray(ref.real.copy()), jnp.asarray(ref.imag.copy()))
    return float(np.max(np.abs(np.asarray(out) - xn)))


def probe_minimal_shape():
    for guard in ("0", "1"):
        err = _irfft_err(256, (256, 256), guard)
        print(json.dumps({"probe": "irfft_129x256x256", "guard": guard,
                          "err": err,
                          "status": "clean" if err < 5e-4 else "CORRUPT"}),
              flush=True)


def probe_intermediates():
    """Feed bit-exact inputs; return the twiddle-multiply inputs AND its
    output from ONE program.  On the defective runtime (guards off) the
    inputs match numpy exactly while `our = c*gr - s*gi` is wrong."""
    os.environ["CUDECOMP_TPU_FFT_GUARD_FUSION"] = "0"
    from jax import lax
    from cudecomp_tpu.ops import mxu_fft
    n, axis, m = 256, 0, 128
    xn = np.random.RandomState(1).randn(256, 256, 256).astype(np.float32)
    ref = np.fft.rfft(xn, axis=0).astype(np.complex64)
    r0 = jnp.asarray(ref.real.copy())
    i0 = jnp.asarray(ref.imag.copy())

    @jax.jit
    def steps(r, i):
        zero = jnp.zeros_like(lax.slice_in_dim(i, 0, 1, axis=axis))
        i = jnp.concatenate(
            [zero, lax.slice_in_dim(i, 1, m, axis=axis), zero], axis=axis)
        fr = lax.slice_in_dim(r, 0, m, axis=axis)
        fi = lax.slice_in_dim(i, 0, m, axis=axis)
        fr_rev = jnp.flip(lax.slice_in_dim(r, 1, m + 1, axis=axis),
                          axis=axis)
        fi_rev = jnp.flip(lax.slice_in_dim(i, 1, m + 1, axis=axis),
                          axis=axis)
        gr = (fr - fr_rev) * 0.5
        gi = (fi + fi_rev) * 0.5
        c, s = mxu_fft._r2c_pack_twiddles(n, "float32")
        bs = mxu_fft._bshape(r.ndim, axis, m)
        c = jnp.asarray(c).reshape(bs)
        s = jnp.asarray(s).reshape(bs)
        return gr, gi, c * gr - s * gi

    gr, gi, our = (np.asarray(v) for v in steps(r0, i0))
    # numpy twin
    i_np = ref.imag.copy()
    i_np[0] = 0
    i_np[m] = 0
    fr = ref.real[:m]
    fi = i_np[:m]
    fr_rev = ref.real[1:m + 1][::-1]
    fi_rev = i_np[1:m + 1][::-1]
    gr_np = (fr - fr_rev) * 0.5
    gi_np = (fi + fi_rev) * 0.5
    k = np.arange(m)
    ang = 2 * np.pi * k / n
    c = np.cos(ang).astype(np.float32).reshape(m, 1, 1)
    s = np.sin(ang).astype(np.float32).reshape(m, 1, 1)
    our_np = c * gr_np - s * gi_np
    rec = {"probe": "intermediates_256^3",
           "gr_err": float(np.max(np.abs(gr - gr_np))),
           "gi_err": float(np.max(np.abs(gi - gi_np))),
           "our_err": float(np.max(np.abs(our - our_np)))}
    rec["fused_misexec"] = (rec["gr_err"] == 0.0 and rec["gi_err"] == 0.0
                            and rec["our_err"] > 1e-2)
    print(json.dumps(rec), flush=True)


def probe_r2c512_guarded():
    os.environ["CUDECOMP_TPU_FFT_GUARD_FUSION"] = "1"
    os.environ.setdefault("CUDECOMP_TPU_FFT_R2C_PACKED", "1")
    import cudecomp_tpu as cd
    from cudecomp_tpu.ops.fft import DistributedFFT
    N = 512
    grid = cd.make_grid(cd.GridConfig(gdims=(N, N, N), pdims=(1, 1)),
                        devices=jax.devices()[:1])
    plan = DistributedFFT(grid=grid, real=True, split_complex=True)
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), grid.global_shape(0),
                          dtype=jnp.float32), grid.sharding(0))
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        plan.inverse_planes(plan.forward_planes(v)) - v)))(x))
    print(json.dumps({"probe": "r2c_512_guarded", "err": err,
                      "status": "clean" if err < 5e-4 else "CORRUPT"}),
          flush=True)


def main(argv):
    probe_minimal_shape()
    probe_intermediates()
    if "--skip-512" not in argv:
        probe_r2c512_guarded()


if __name__ == "__main__":
    main(sys.argv[1:])
