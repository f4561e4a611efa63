"""MXU FFT — split-complex FFT as matrix multiplications.

TPU-native FFT backend: some TPU runtimes do not implement complex dtypes or
the XLA FFT op, and even where they do, the MXU (128x128 systolic array) is
the chip's dominant compute resource.  This module expresses 1D FFTs as
dense matmuls on *split-complex* data (a trailing component dim of size 2
holding [re, im]) using the classic four-step Cooley-Tukey factorization:

    N = A * B, input viewed as v[b, a] = x[a + A*b]:
      1. y[a, k2] = sum_b v[b, a] * W_B^{b k2}        (B-point DFTs, matmul)
      2. z[a, k2] = y[a, k2] * W_N^{a k2}             (twiddle, elementwise)
      3. X[k1*B + k2] = sum_a z[a, k2] * W_A^{a k1}   (A-point DFTs, matmul)

Each complex matmul is 4 real matmuls in float32 with HIGHEST precision.
For N <= DIRECT_THRESHOLD or prime N the full dense DFT matrix is used.
Arithmetic cost is O(N * (A + B)) per point vs O(N log N) for a true FFT,
but every flop lands on the MXU at full utilization, and factors are chosen
near sqrt(N) (<= 128 when possible) to keep matmul shapes MXU-friendly.

This replaces nothing in the reference (cuFFT is a library call there,
benchmark/benchmark.cu:294-412); it is the TPU-native equivalent of "the
vendor FFT", built from scratch.
"""

from __future__ import annotations

import math
import os
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# Use a single dense DFT matmul at or below this size.  Although the dense
# DFT costs O(N) more flops than four-step, on TPU it makes fewer memory
# passes and feeds the MXU a K=N contraction; measured on v5e at 256^3 the
# dense DFT beats 16x16 four-step by 26% end-to-end.  Env-overridable.
DIRECT_THRESHOLD = None  # resolved lazily, platform-aware


def _direct_threshold() -> int:
    if DIRECT_THRESHOLD is not None:  # test/monkeypatch override
        return DIRECT_THRESHOLD
    env = os.environ.get("CUDECOMP_TPU_FFT_DIRECT_THRESHOLD")
    if env:
        return int(env)
    return 64 if jax.default_backend() in ("cpu",) else 512

def _precision():
    """Matmul precision for the DFT contractions.

    float32 data: HIGHEST = full f32 (6-pass bf16 emulation), HIGH = 3-pass
    bf16x3 (~1e-6 relative error, comfortably within the reference's 5e-4
    single-precision FFT tolerance, benchmark.cu:23-27) at ~2x the MXU
    throughput.  float64 (CPU testing) always uses HIGHEST.
    Env: CUDECOMP_TPU_FFT_PRECISION=default|high|highest.
    """
    env = os.environ.get("CUDECOMP_TPU_FFT_PRECISION", "").lower()
    if env == "default":
        return lax.Precision.DEFAULT
    if env == "high":
        return lax.Precision.HIGH
    if env == "highest":
        return lax.Precision.HIGHEST
    return lax.Precision.HIGHEST


_PREC = None  # resolved per call via _precision(); kept for monkeypatching


def _parse_factor_overrides():
    """CUDECOMP_TPU_FFT_FACTORS="1024=128x8,512=4x128" per-size overrides."""
    out = {}
    spec = os.environ.get("CUDECOMP_TPU_FFT_FACTORS", "")
    for item in spec.split(","):
        if "=" in item and "x" in item:
            n, ab = item.split("=")
            a, b = ab.split("x")
            out[int(n)] = (int(a), int(b))
    return out

_FACTOR_OVERRIDES = _parse_factor_overrides()


def _best_factorization(n: int):
    """Factor n = A * B with A, B as close as possible (A >= B), unless an
    explicit override is configured for this size."""
    if n in _FACTOR_OVERRIDES:
        a, b = _FACTOR_OVERRIDES[n]
        if a * b == n:
            return a, b
    b = int(math.isqrt(n))
    while n % b:
        b -= 1
    return n // b, b


@lru_cache(maxsize=None)
def _dft_mats(n: int, inverse: bool, dtype_name: str):
    """Dense DFT matrix (cos, sin-signed) as numpy constants."""
    k = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, k) / n
    sign = 1.0 if inverse else -1.0
    c = np.cos(ang)
    s = sign * np.sin(ang)
    return c.astype(dtype_name), s.astype(dtype_name)


@lru_cache(maxsize=None)
def _twiddle(a: int, b: int, inverse: bool, dtype_name: str):
    n = a * b
    ang = 2.0 * np.pi * np.outer(np.arange(a), np.arange(b)) / n
    sign = 1.0 if inverse else -1.0
    return (np.cos(ang).astype(dtype_name),
            (sign * np.sin(ang)).astype(dtype_name))


def _use_gauss() -> bool:
    """Gauss/Karatsuba complex multiply: 3 real matmuls instead of 4 (25%
    fewer MXU flops, a few extra VPU adds).  Env: CUDECOMP_TPU_FFT_GAUSS=1."""
    return os.environ.get("CUDECOMP_TPU_FFT_GAUSS", "0") == "1"


def _cmatmul(xr, xi, mr, mi, eq="...n,nk->...k"):
    """Complex contraction (x @ M) on split parts: 4 real matmuls, or 3 with
    the Gauss form:  k1=(xr+xi)C, k2=xr(S-C), k3=xi(C+S);
    y_r = k1 - k3, y_i = k1 + k2  (C=mr, S=mi; matrices are constants so the
    combinations fold at compile time)."""
    dot = partial(jnp.einsum, eq, precision=(_PREC or _precision()))
    if _use_gauss():
        k1 = dot(xr + xi, mr)
        k2 = dot(xr, mi - mr)
        k3 = dot(xi, mr + mi)
        return (k1 - k3, k1 + k2)
    return (dot(xr, mr) - dot(xi, mi), dot(xr, mi) + dot(xi, mr))


def _fft_core(xr, xi, inverse: bool):
    """FFT along the LAST dim of (xr, xi).  Returns unscaled transform."""
    n = xr.shape[-1]
    dt = str(xr.dtype)
    if n == 1:
        return xr, xi
    a, b = _best_factorization(n)
    if n <= _direct_threshold() or b == 1:  # small or prime: dense DFT
        c, s = _dft_mats(n, inverse, dt)
        return _cmatmul(xr, xi, jnp.asarray(c), jnp.asarray(s))

    batch = xr.shape[:-1]
    # v[b_, a_] = x[a_ + A*b_]
    vr = xr.reshape(batch + (b, a))
    vi = xi.reshape(batch + (b, a))
    # step 1: B-point DFTs over b_ for each a_: y[a_, k2]
    cb, sb = _dft_mats(b, inverse, dt)
    yr, yi = _cmatmul(vr, vi, jnp.asarray(cb), jnp.asarray(sb),
                      eq="...ba,bk->...ak")
    # step 2: twiddle W_N^{a_ k2}
    tc, ts = _twiddle(a, b, inverse, dt)
    tc = jnp.asarray(tc)
    ts = jnp.asarray(ts)
    zr = yr * tc - yi * ts
    zi = yr * ts + yi * tc
    # step 3: A-point DFTs over a_: X[k1, k2], recursing if A is still large
    if a > _direct_threshold():
        # recurse on the A-dim: move it last, transform, move back
        zr2 = jnp.swapaxes(zr, -2, -1)
        zi2 = jnp.swapaxes(zi, -2, -1)
        or_, oi_ = _fft_core(zr2, zi2, inverse)
        outr = jnp.swapaxes(or_, -2, -1)
        outi = jnp.swapaxes(oi_, -2, -1)
    else:
        ca, sa = _dft_mats(a, inverse, dt)
        outr, outi = _cmatmul(zr, zi, jnp.asarray(ca), jnp.asarray(sa),
                              eq="...ak,aK->...Kk")
    return outr.reshape(batch + (n,)), outi.reshape(batch + (n,))


def fft_split(x, axis: int, inverse: bool = False):
    """FFT of split-complex ``x`` (..., 2) along data dim ``axis``.

    Forward is unscaled; inverse scales by 1/N (jnp.fft convention).
    """
    if x.shape[-1] != 2:
        raise ValueError(f"split-complex input must have trailing dim 2, "
                         f"got shape {tuple(x.shape)}")
    ndim = x.ndim - 1  # data dims
    axis = axis % ndim
    xm = jnp.moveaxis(x, axis, ndim - 1)  # transform dim just before comps
    r, i = _fft_core(xm[..., 0], xm[..., 1], inverse)
    if inverse:
        scale = 1.0 / x.shape[axis]
        r = r * scale
        i = i * scale
    return jnp.moveaxis(jnp.stack([r, i], axis=-1), ndim - 1, axis)


def rfft_split(x, axis: int):
    """Real-to-split-complex FFT along ``axis``: output extent N//2 + 1."""
    n = x.shape[axis]
    xm = jnp.moveaxis(x, axis, -1)
    r, i = _fft_core(xm, jnp.zeros_like(xm), inverse=False)
    r = r[..., : n // 2 + 1]
    i = i[..., : n // 2 + 1]
    out = jnp.stack([r, i], axis=-1)
    return jnp.moveaxis(out, -2, axis)


def irfft_split(x, axis: int, n: int):
    """Split-complex-to-real inverse FFT along ``axis`` (output extent n)."""
    ndim = x.ndim - 1
    axis = axis % ndim
    xm = jnp.moveaxis(x, axis, ndim - 1)
    r, i = xm[..., 0], xm[..., 1]
    # rebuild the full Hermitian spectrum: F[k] = conj(F[n-k]) for k > n//2
    k_half = n // 2
    mr = r[..., 1: n - k_half][..., ::-1]
    mi = -i[..., 1: n - k_half][..., ::-1]
    fr = jnp.concatenate([r, mr], axis=-1)
    fi = jnp.concatenate([i, mi], axis=-1)
    outr, _ = _fft_core(fr, fi, inverse=True)
    outr = outr / n
    return jnp.moveaxis(outr, ndim - 1, axis)


def to_split(xc):
    """Complex array -> split-complex (..., 2) float array."""
    return jnp.stack([jnp.real(xc), jnp.imag(xc)], axis=-1)


def from_split(x):
    """Split-complex (..., 2) -> complex array (requires complex support)."""
    return x[..., 0] + 1j * x[..., 1]
