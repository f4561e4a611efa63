"""Spectral calculus on the distributed FFT — vorticity of an analytic flow.

The reference's example solvers hand-roll their spectral operators
(``examples/cc/taylor_green/tg.cu:139-210`` builds wavenumbers, curl and
the Leray projection inline); this example computes the vorticity of the
Taylor–Green vortex with the public :class:`cudecomp_tpu.SpectralOperators`
surface and checks it against the closed form.

Runs on whatever devices are available (set
XLA_FLAGS=--xla_force_host_platform_device_count=8 and JAX_PLATFORMS=cpu
for a virtual mesh).

    python examples/spectral_ops.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cudecomp_tpu as cd


def main():
    n_dev = len(jax.devices())
    gdims = (64, 64, 64)
    cfg = cd.GridConfig(gdims=gdims, pdims=(1, n_dev))
    grid = cd.make_grid(cfg)
    print(f"devices: {n_dev}, pdims: {grid.pdims}")

    # Taylor-Green velocity on [0, 2pi)^3
    xs = [np.arange(n) * 2 * np.pi / n for n in gdims]
    x, y, z = np.meshgrid(*xs, indexing="ij")
    u = np.stack([np.cos(x) * np.sin(y) * np.sin(z),
                  -np.sin(x) * np.cos(y) * np.sin(z),
                  np.zeros_like(x)], axis=-1)

    plan = cd.DistributedFFT(grid=grid, real=True)
    sops = cd.SpectralOperators(plan=plan)

    # scatter each component, forward-transform, stack on the last axis
    comps = [plan.forward(cd.scatter_global(grid, u[..., c], 0))
             for c in range(3)]
    uh = jnp.stack(comps, axis=-1)

    # vorticity = curl(u); the TG vortex's closed form:
    #   w_x = sin x cos y cos z, w_y = cos x sin y cos z,
    #   w_z = -2 cos x cos y sin z
    wh = sops.curl(uh)
    w = np.stack([cd.gather_global(grid, plan.inverse(wh[..., c]), 0)
                  for c in range(3)], axis=-1)
    ref = np.stack([np.sin(x) * np.cos(y) * np.cos(z),
                    np.cos(x) * np.sin(y) * np.cos(z),
                    -2 * np.cos(x) * np.cos(y) * np.sin(z)], axis=-1)
    err = np.abs(w - ref).max()
    # dtype-aware gates: f64 when jax_enable_x64 is on, else f32 spectral
    # round-trip accuracy (~1e-5 at 64^3)
    f64 = jnp.asarray(uh).dtype == jnp.complex128
    print(f"curl max err vs closed form: {err:.2e}")
    assert err < (1e-6 if f64 else 1e-4)

    # the TG field is divergence-free: the Leray projection is an identity
    ph = sops.project_solenoidal(uh)
    derr = max(float(jnp.max(jnp.abs(ph[..., c] - uh[..., c])))
               for c in range(3))
    scale = float(jnp.max(jnp.abs(uh)))  # unnormalized spectral coeffs
    print(f"projection identity on solenoidal field: {derr:.2e} "
          f"(relative {derr / scale:.2e})")
    assert derr / scale < (1e-12 if f64 else 1e-6)

    print("OK")


if __name__ == "__main__":
    main()
