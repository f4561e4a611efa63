"""Pallas fused Gauss DFT-stage kernel with manual bf16x3 — the last
program-level lever on the axis contractions (VERDICT r3 item 3).

The XLA einsum path runs each Gauss stage as 3 separate HIGH-precision
matmul fusions plus elementwise combine passes; the r3 device trace puts
dot-form stages at 73% and conv-lowered axis-0 stages at 64% of the bf16x3
MXU floor.  Mosaic rejects Precision.HIGH inside kernels, so an in-kernel
fused stage needs MANUAL bf16x3: weights pre-split host-side into
(hi, lo) bf16 pairs, the x block split in-kernel, and each product as
hi@hi + hi@lo + lo@hi (dropping lo@lo, exactly XLA's bf16x3).

One kernel invocation loads an x block once, computes all 3 Gauss products
against VMEM-resident weights, and writes both (re, im) outputs — one HBM
pass for the whole stage instead of XLA's per-matmul fusions.

Variants at N=512 (shapes of the 512^3 FFT stages):
  * axis2: contract the minor dim  (abc,cC->abC as (a*b, c) @ (c, C));
  * axis0: contract the major dim  (abc,aA->Abc as W^T(A,a) @ (a, b*c));
measured against the XLA einsum Gauss at HIGH (the production path).

    python scripts/tune_pallas_gauss.py [N]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def split_bf16(m):
    hi = m.astype(jnp.bfloat16)
    lo = (m - hi.astype(np.float32)).astype(jnp.bfloat16)
    return hi, lo


def timeit(fn, args, iters=8, trials=3):
    @jax.jit
    def run(a):
        def body(c, _):
            return fn(*c), ()
        out, _ = lax.scan(body, a, None, length=iters)
        return sum(jnp.sum(o) for o in out)

    float(run(args))
    float(run(args))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(run(args))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def _mm3(x_hi, x_lo, w_hi, w_lo, axis0=False):
    """Manual bf16x3 matmul: hi@hi + hi@lo + lo@hi, f32 accumulation.

    axis0=False: x (M, K) @ w (K, N) -> (M, N).
    axis0=True:  x (K, M), w (K, A): dot_general(w, x) contracting dim 0 of
    both -> (A, M), matching the (A, tile) output block.
    """
    if axis0:
        dn = (([0], [0]), ((), ()))
        dot = functools.partial(lax.dot_general, dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
        return (dot(w_hi, x_hi) + dot(w_hi, x_lo) + dot(w_lo, x_hi))
    dn = (([1], [0]), ((), ()))
    dot = functools.partial(lax.dot_general, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
    return dot(x_hi, w_hi) + dot(x_hi, w_lo) + dot(x_lo, w_hi)


def make_gauss_kernel(N, tile, axis0: bool, interpret=False):
    """Fused Gauss stage: (r, i) block + 3 weight pairs -> (or, oi) block.

    axis0=False: x flat (M, K) blocks (tile, N), weights (N, N); out = x @ W.
    axis0=True:  x flat (K, M) blocks (N, tile), weights (N, N);
                 out = W^T @ x  (contract dim 0 of both).
    """

    def kernel(r_ref, i_ref, c_hi, c_lo, d_hi, d_lo, e_hi, e_lo,
               or_ref, oi_ref):
        r = r_ref[...]
        i = i_ref[...]
        s_hi, s_lo = split_bf16(r + i)
        r_hi, r_lo = split_bf16(r)
        i_hi, i_lo = split_bf16(i)
        mm = functools.partial(_mm3, axis0=axis0)
        k1 = mm(s_hi, s_lo, c_hi[...], c_lo[...])   # (r+i) @ C
        k2 = mm(r_hi, r_lo, d_hi[...], d_lo[...])   # r @ (S - C)
        k3 = mm(i_hi, i_lo, e_hi[...], e_lo[...])   # i @ (C + S)
        or_ref[...] = k1 - k3
        oi_ref[...] = k1 + k2

    def call(r2, i2, weights):
        M = r2.shape[1] if axis0 else r2.shape[0]
        grid = (M // tile,)
        if axis0:
            bspec = pl.BlockSpec((N, tile), lambda k: (0, k))
        else:
            bspec = pl.BlockSpec((tile, N), lambda k: (k, 0))
        wspec = [pl.BlockSpec((N, N), lambda k: (0, 0))] * 6
        from jax.experimental.pallas import tpu as pltpu
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bspec, bspec] + wspec,
            out_specs=[bspec, bspec],
            out_shape=[jax.ShapeDtypeStruct(r2.shape, jnp.float32)] * 2,
            interpret=interpret,
            **params,
        )(r2, i2, *weights)

    return call


def main(N=512):
    rng = np.random.default_rng(0)
    cnp = (rng.standard_normal((N, N)) / np.sqrt(N)).astype(np.float32)
    snp = (rng.standard_normal((N, N)) / np.sqrt(N)).astype(np.float32)
    c = jnp.asarray(cnp)
    s = jnp.asarray(snp)
    xr = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))

    # weight combos (host-side constants, like the einsum path's folding)
    weights = []
    for m in (cnp, snp - cnp, cnp + snp):
        hi, lo = split_bf16(jnp.asarray(m))
        weights.extend([hi, lo])
    weights = tuple(weights)

    def xla_gauss(eq, r, i, prec=lax.Precision.HIGH):
        dot = lambda x, m: jnp.einsum(eq, x, m, precision=prec)
        k1 = dot(r + i, c)
        k2 = dot(r, s - c)
        k3 = dot(i, c + s)
        return (k1 - k3, k1 + k2)

    flops = 3 * 2 * N ** 4
    interpret = os.environ.get("CUDECOMP_TPU_PALLAS_INTERPRET", "0") == "1"

    for axis0 in (False, True):
        name = "axis0" if axis0 else "axis2"
        eq = "abc,aA->Abc" if axis0 else "abc,cC->abC"
        # XLA reference (production path)
        t = timeit(lambda r, i: xla_gauss(eq, r, i), (xr, xi))
        print(f"{name} XLA einsum HIGH       : {t*1e3:7.3f} ms  "
              f"{flops/t/1e12:5.2f} TF-equiv", flush=True)

        for tile in (512, 1024):
            call = make_gauss_kernel(N, tile, axis0, interpret)

            def pallas_fn(r, i, call=call):
                if axis0:
                    r2 = r.reshape(N, N * N)
                    i2 = i.reshape(N, N * N)
                else:
                    r2 = r.reshape(N * N, N)
                    i2 = i.reshape(N * N, N)
                orr, oii = call(r2, i2, weights)
                return orr.reshape(r.shape), oii.reshape(r.shape)

            try:
                # correctness vs XLA HIGHEST (truth) and HIGH (peer);
                # errors reduced on device, full arrays
                @jax.jit
                def errs(r, i, pallas_fn=pallas_fn, eq=eq):
                    ra, ia = xla_gauss(eq, r, i, lax.Precision.HIGHEST)
                    rh, ih = xla_gauss(eq, r, i)
                    rp, ip = pallas_fn(r, i)
                    e_p = jnp.max(jnp.abs(rp - ra)) + jnp.max(jnp.abs(ip - ia))
                    e_h = jnp.max(jnp.abs(rh - ra)) + jnp.max(jnp.abs(ih - ia))
                    return e_p, e_h
                err_p, err_h = (float(v) for v in errs(xr, xi))
                t = timeit(pallas_fn, (xr, xi))
                print(f"{name} Pallas bf16x3 tile={tile:4d}: {t*1e3:7.3f} ms  "
                      f"{flops/t/1e12:5.2f} TF-equiv  "
                      f"err {err_p:.2e} (XLA-HIGH err {err_h:.2e})",
                      flush=True)
            except Exception as e:
                print(f"{name} Pallas tile={tile}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
