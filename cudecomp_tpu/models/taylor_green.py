"""Taylor-Green vortex — pseudo-spectral incompressible Navier-Stokes solver.

Analog of the reference's flagship example (``examples/cc/taylor_green/
tg.cu``, 985 LoC, validated against van Rees et al. reference curves): a
Fourier pseudo-spectral solver for the incompressible NS equations in
rotational form on the pencil decomposition,

    du/dt = P(k) F[u x w] - nu k^2 u_hat        (spectral space)

with 2/3-rule dealiasing, RK4 time stepping, and the distributed r2c FFT
doing all the global data movement (every FFT hides the full
X->Y->Z transpose pipeline).  Velocity components ride the transpose
engine's trailing component dim, so one pipeline moves all three fields.

Diagnostics: kinetic energy and enstrophy-based dissipation, the quantities
the reference validates (``examples/cc/taylor_green/README.md:17-21``).
"""

from __future__ import annotations

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from cudecomp_tpu.grid import GridDescriptor
from cudecomp_tpu.ops.fft import DistributedFFT
from cudecomp_tpu.utils.arrays import scatter_global
from cudecomp_tpu.utils.tracing import trace_range


def _spectral_axis_fields(cgrid, gdims_phys):
    """(kx, ky, kz) wavenumber fields in the spectral Z-pencil padded layout."""
    ks = []
    for d in range(3):
        n = gdims_phys[d]
        k = np.fft.fftfreq(n, d=1.0 / n)
        if d == 0:
            k = k[: n // 2 + 1]
        ks.append(k)
    kx, ky, kz = np.meshgrid(*ks, indexing="ij")
    return tuple(scatter_global(cgrid, a.astype(np.float64), 2)
                 for a in (kx, ky, kz))


def taylor_green_velocity(gdims):
    """Initial TG vortex on [0, 2*pi)^3 (tg.cu initialization)."""
    xs = [np.arange(n) * 2 * np.pi / n for n in gdims]
    x, y, z = np.meshgrid(*xs, indexing="ij")
    u = np.cos(x) * np.sin(y) * np.sin(z)
    v = -np.sin(x) * np.cos(y) * np.sin(z)
    w = np.zeros_like(u)
    return u, v, w


@dataclasses.dataclass(frozen=True)
class TaylorGreenSolver:
    """Set ``split_complex=True`` to run the whole solver on the MXU matmul
    FFT with split-complex spectral state (shape (..., 3, 2)) — no complex
    dtype support needed (runs on any TPU runtime)."""

    grid: GridDescriptor
    nu: float = 1.0 / 100.0  # 1/Re
    dealias: bool = True
    split_complex: bool = False

    # -- split-complex helpers (last dim = [re, im]) -----------------------------

    def _mul_i(self, w):
        """i * w for split-complex w."""
        return jnp.stack([-w[..., 1], w[..., 0]], axis=-1)

    def _kmul(self, k, u):
        """real wavenumber field k (...,) times component field u."""
        if self.split_complex:
            return k[..., None] * u
        return k * u

    def setup(self):
        """Returns (spectral state uh, static fields dict).  uh has shape
        (..., 3) complex, or (..., 3, 2) split-complex."""
        plan = DistributedFFT(grid=self.grid, real=True,
                              split_complex=self.split_complex)
        cgrid = plan.complex_grid
        gd = self.grid.config.gdims
        u0 = taylor_green_velocity(gd)
        u = jnp.stack([scatter_global(self.grid, c, 0) for c in u0], axis=-1)
        if self.split_complex:
            u = u.astype(jnp.float32) if jax.default_backend() not in (
                "cpu",) else u
        uh = plan.forward(u)
        kx, ky, kz = _spectral_axis_fields(cgrid, gd)
        k2 = kx * kx + ky * ky + kz * kz
        inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
        if self.dealias:
            mask = jnp.ones_like(k2, dtype=bool)
            for k, n in ((kx, gd[0]), (ky, gd[1]), (kz, gd[2])):
                mask = mask & (jnp.abs(k) < (n // 2) * (2.0 / 3.0))
        else:
            mask = jnp.ones_like(k2, dtype=bool)
        # zero the k=0 mode of the nonlinear term: mean velocity is conserved
        mask = (mask & (k2 > 0)).astype(k2.dtype)
        fields = dict(kx=kx, ky=ky, kz=kz, k2=k2, inv_k2=inv_k2, mask=mask,
                      plan=plan)
        return uh, fields

    # -- spectral operators ----------------------------------------------------
    # components live at index -1 (complex) or -2 (split-complex)

    def _comp(self, uh, c):
        return uh[..., c, :] if self.split_complex else uh[..., c]

    def _stack_comps(self, comps):
        axis = -2 if self.split_complex else -1
        return jnp.stack(comps, axis=axis)

    def _curl_hat(self, uh, f):
        kx, ky, kz = f["kx"], f["ky"], f["kz"]
        u0, u1, u2 = (self._comp(uh, c) for c in range(3))
        wx = self._kmul(ky, u2) - self._kmul(kz, u1)
        wy = self._kmul(kz, u0) - self._kmul(kx, u2)
        wz = self._kmul(kx, u1) - self._kmul(ky, u0)
        mul_i = self._mul_i if self.split_complex else (lambda v: 1j * v)
        return self._stack_comps([mul_i(wx), mul_i(wy), mul_i(wz)])

    def _project(self, nh, f):
        """Leray projection: nh - k (k . nh) / k^2."""
        kx, ky, kz = f["kx"], f["ky"], f["kz"]
        n0, n1, n2 = (self._comp(nh, c) for c in range(3))
        div = self._kmul(kx, n0) + self._kmul(ky, n1) + self._kmul(kz, n2)
        s = self._kmul(f["inv_k2"], div)
        return self._stack_comps([n0 - self._kmul(kx, s),
                                  n1 - self._kmul(ky, s),
                                  n2 - self._kmul(kz, s)])

    def _rhs(self, uh, f):
        plan: DistributedFFT = f["plan"]
        with trace_range("cudecomp_tpu.tg_rhs"):
            u = plan.inverse(uh)                      # physical velocity
            wh = self._curl_hat(uh, f)
            w = plan.inverse(wh)                      # physical vorticity
            nl = jnp.stack([
                u[..., 1] * w[..., 2] - u[..., 2] * w[..., 1],
                u[..., 2] * w[..., 0] - u[..., 0] * w[..., 2],
                u[..., 0] * w[..., 1] - u[..., 1] * w[..., 0],
            ], axis=-1)                               # u x w
            nh = plan.forward(nl)
            mask = f["mask"]
            visc = f["k2"]
            if self.split_complex:
                nh = nh * mask[..., None, None]
                nh = self._project(nh, f)
                return nh - self.nu * visc[..., None, None] * uh
            nh = nh * mask[..., None]
            nh = self._project(nh, f)
            return nh - self.nu * visc[..., None] * uh

    def step(self, uh, f, dt):
        """One RK4 step in spectral space."""
        k1 = self._rhs(uh, f)
        k2_ = self._rhs(uh + 0.5 * dt * k1, f)
        k3 = self._rhs(uh + 0.5 * dt * k2_, f)
        k4 = self._rhs(uh + dt * k3, f)
        return uh + (dt / 6.0) * (k1 + 2 * k2_ + 2 * k3 + k4)

    # -- diagnostics -------------------------------------------------------------

    def energy(self, uh, f):
        """Kinetic energy 0.5 <|u|^2> (padding is zero, so plain sums work)."""
        plan: DistributedFFT = f["plan"]
        u = plan.inverse(uh)
        n = float(np.prod(self.grid.config.gdims))
        return 0.5 * jnp.sum(u * u) / n

    def enstrophy(self, uh, f):
        plan: DistributedFFT = f["plan"]
        w = plan.inverse(self._curl_hat(uh, f))
        n = float(np.prod(self.grid.config.gdims))
        return 0.5 * jnp.sum(w * w) / n

    def dissipation(self, uh, f):
        """Energy dissipation rate 2 nu * enstrophy (validated curve in the
        reference's data files)."""
        return 2.0 * self.nu * self.enstrophy(uh, f)

    def run(self, n_steps: int, dt: float):
        """Convenience driver returning (final uh, energy history)."""
        uh, f = self.setup()

        step = jax.jit(lambda s: self.step(s, f, dt))
        energy = jax.jit(lambda s: self.energy(s, f))

        history = [float(energy(uh))]
        for _ in range(n_steps):
            uh = step(uh)
            history.append(float(energy(uh)))
        return uh, history
