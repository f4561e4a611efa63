"""Spectral operator library vs numpy spectral calculus.

The reference's spectral machinery is hand-rolled inside its example
solvers (``tg.cu``, ``poisson.f90``); here it is a public surface, so each
operator is validated against the closed-form numpy construction on the
gathered global field, in both state conventions (complex and plane-
carried split-complex) on the 8-device mesh.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import cudecomp_tpu as cd
from cudecomp_tpu.config import GridConfig
from cudecomp_tpu.ops.fft import DistributedFFT
from cudecomp_tpu.ops.spectral import SpectralOperators

RNG = np.random.default_rng(77)


def setup(gdims=(16, 12, 8), pdims=(2, 4), real=True, split=False):
    cfg = GridConfig(gdims=gdims, pdims=pdims)
    grid = cd.make_grid(cfg, devices=jax.devices()[: pdims[0] * pdims[1]])
    plan = DistributedFFT(grid=grid, real=real, split_complex=split)
    return grid, plan, SpectralOperators(plan=plan, dtype=np.float64)


def np_k(gdims, real):
    ks = []
    for d, n in enumerate(gdims):
        k = np.fft.fftfreq(n, d=1.0 / n)  # unit spacing on [0, 2pi)
        if real and d == 0:
            k = k[: n // 2 + 1]
        ks.append(k)
    return np.meshgrid(*ks, indexing="ij")


def to_spectral(plan, f):
    buf = cd.scatter_global(plan.grid, f, 0)
    if plan.split_complex:
        buf = buf  # real input; planes path takes the real buffer
        return plan.forward_planes(buf)
    return plan.forward(buf)


def gather_spectral(plan, sh):
    if plan.split_complex:
        re = cd.gather_global(plan.complex_grid, sh[0], 2)
        im = cd.gather_global(plan.complex_grid, sh[1], 2)
        return re + 1j * im
    return cd.gather_global(plan.complex_grid, sh, 2)


@pytest.mark.parametrize("split", [False, True])
@pytest.mark.parametrize("axis", [0, 1, 2])
def test_derivative_matches_numpy(split, axis):
    gdims = (16, 12, 8)
    grid, plan, ops = setup(gdims=gdims, split=split)
    f = RNG.standard_normal(gdims)
    sh = to_spectral(plan, f)
    got = gather_spectral(plan, ops.derivative(sh, axis))
    kx, ky, kz = np_k(gdims, real=True)
    ref = (1j * (kx, ky, kz)[axis]) * _np_rfft3(f)
    assert np.allclose(got, ref, atol=1e-8), np.abs(got - ref).max()


def _np_rfft3(f):
    """rfft on axis 0 then c2c on axes 1, 2 — the plan's spectral layout."""
    return np.fft.fftn(np.fft.rfft(f, axis=0), axes=(1, 2))


@pytest.mark.parametrize("split", [False, True])
def test_second_derivative_and_laplacian(split):
    gdims = (16, 12, 8)
    grid, plan, ops = setup(gdims=gdims, split=split)
    f = RNG.standard_normal(gdims)
    sh = to_spectral(plan, f)
    kx, ky, kz = np_k(gdims, real=True)
    ref2 = -(kx ** 2) * _np_rfft3(f)
    got2 = gather_spectral(plan, ops.derivative(sh, 0, order=2))
    assert np.allclose(got2, ref2, atol=1e-8)
    lap_ref = -(kx ** 2 + ky ** 2 + kz ** 2) * _np_rfft3(f)
    lap_got = gather_spectral(plan, ops.laplacian(sh))
    assert np.allclose(lap_got, lap_ref, atol=1e-8)


@pytest.mark.parametrize("split", [False, True])
def test_div_grad_is_laplacian_and_curl_grad_zero(split):
    gdims = (8, 16, 12)
    grid, plan, ops = setup(gdims=gdims, split=split)
    f = RNG.standard_normal(gdims)
    sh = to_spectral(plan, f)
    gh = ops.gradient(sh)
    # div(grad f) == lap f
    div = gather_spectral(plan, ops.divergence(gh))
    lap = gather_spectral(plan, ops.laplacian(sh))
    assert np.allclose(div, lap, atol=1e-8)
    # curl(grad f) == 0
    ch = ops.curl(gh)
    for c in range(3):
        comp = (ch[0][..., c] + 1j * ch[1][..., c]) if split else ch[..., c]
        cg = cd.gather_global(plan.complex_grid, comp, 2)
        assert np.allclose(cg, 0, atol=1e-8)


@pytest.mark.parametrize("split", [False, True])
def test_projection_removes_divergence(split):
    gdims = (12, 8, 16)
    grid, plan, ops = setup(gdims=gdims, split=split)
    v = RNG.standard_normal(gdims + (3,))
    # forward each component through the plan, stack on the last axis
    comps = [to_spectral(plan, v[..., c]) for c in range(3)]
    if split:
        vh = tuple(jnp.stack([c[j] for c in comps], axis=-1)
                   for j in (0, 1))
    else:
        vh = jnp.stack(comps, axis=-1)
    ph = ops.project_solenoidal(vh)
    div = gather_spectral(plan, ops.divergence(ph))
    assert np.allclose(div, 0, atol=1e-8)
    # projection is idempotent
    ph2 = ops.project_solenoidal(ph)
    a = gather_spectral(plan, ops.divergence(ph2))
    for c in range(3):
        p1 = (ph[0][..., c] + 1j * ph[1][..., c]) if split else ph[..., c]
        p2 = (ph2[0][..., c] + 1j * ph2[1][..., c]) if split else ph2[..., c]
        assert np.allclose(cd.gather_global(plan.complex_grid, p1, 2),
                           cd.gather_global(plan.complex_grid, p2, 2),
                           atol=1e-8)


def test_derivative_of_sine_is_cosine():
    # end-to-end sanity on an analytic field: d/dx sin(x) = cos(x)
    gdims = (16, 8, 8)
    grid, plan, ops = setup(gdims=gdims)
    xs = np.arange(gdims[0]) * 2 * np.pi / gdims[0]
    f = np.broadcast_to(np.sin(xs)[:, None, None], gdims).copy()
    sh = to_spectral(plan, f)
    back = plan.inverse(ops.derivative(sh, 0))
    got = cd.gather_global(grid, back, 0)
    ref = np.broadcast_to(np.cos(xs)[:, None, None], gdims)
    assert np.allclose(got, ref, atol=1e-8)


def test_dealias_mask_kills_high_modes():
    gdims = (16, 16, 16)
    grid, plan, ops = setup(gdims=gdims)
    f = RNG.standard_normal(gdims)
    sh = to_spectral(plan, f)
    filt = gather_spectral(plan, ops.dealias(sh))
    kx, ky, kz = np_k(gdims, real=True)
    cut = (2.0 / 3.0) * 8
    outside = (np.abs(kx) >= cut) | (np.abs(ky) >= cut) | (np.abs(kz) >= cut)
    assert np.all(filt[outside] == 0)
    inside = ~outside
    ref = _np_rfft3(f)
    assert np.allclose(filt[inside], ref[inside], atol=1e-8)


def test_operators_jit_and_differentiate():
    gdims = (8, 8, 8)
    grid, plan, ops = setup(gdims=gdims)
    f = RNG.standard_normal(gdims)
    buf = cd.scatter_global(grid, f, 0)

    @jax.jit
    def energy(v):
        sh = plan.forward(v)
        gh = ops.gradient(sh)
        # spectral enstrophy-like scalar (Parseval: |grad f|^2)
        return sum(jnp.sum(jnp.abs(gh[..., c]) ** 2) for c in range(3))

    e = float(energy(buf))
    g = jax.grad(lambda v: energy(v).real)(buf)
    assert np.isfinite(e) and np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("split", [False, True])
def test_shell_spectrum_parseval(split):
    # sum of the shell spectrum == 0.5 * mean(|u|^2), r2c multiplicity
    # accounted (the Parseval identity TG's diagnostic relies on)
    gdims = (16, 12, 8)
    grid, plan, ops = setup(gdims=gdims, split=split)
    f = RNG.standard_normal(gdims)
    sh = to_spectral(plan, f)
    ek = np.asarray(ops.shell_spectrum(sh))
    assert np.all(ek >= 0)
    assert np.isclose(ek.sum(), 0.5 * np.mean(f ** 2), rtol=1e-10)


def test_shell_spectrum_c2c_no_multiplicity():
    # complex plans cover the full spectrum: multiplicity is 1 everywhere
    gdims = (8, 8, 8)
    cfg = GridConfig(gdims=gdims, pdims=(2, 4))
    grid = cd.make_grid(cfg, devices=jax.devices()[:8])
    plan = DistributedFFT(grid=grid, real=False)
    ops = SpectralOperators(plan=plan, dtype=np.float64)
    f = RNG.standard_normal(gdims) + 1j * RNG.standard_normal(gdims)
    sh = plan.forward(cd.scatter_global(grid, f.astype(np.complex128), 0))
    ek = np.asarray(ops.shell_spectrum(sh))
    assert np.isclose(ek.sum(), 0.5 * np.mean(np.abs(f) ** 2), rtol=1e-10)


def test_shell_spectrum_single_mode_lands_in_its_shell():
    # a pure sin(3x) field puts all energy in shell |k| = 3
    gdims = (16, 8, 8)
    grid, plan, ops = setup(gdims=gdims)
    xs = np.arange(16) * 2 * np.pi / 16
    f = np.broadcast_to(np.sin(3 * xs)[:, None, None], gdims).copy()
    sh = to_spectral(plan, f)
    ek = np.asarray(ops.shell_spectrum(sh))
    assert np.argmax(ek) == 3
    assert np.isclose(ek[3], ek.sum(), rtol=1e-10)


def test_wavenumber_scaling_with_domain_lengths():
    # L != 2*pi scales wavenumbers by 2*pi/L per axis: d/dx sin(2*pi*x/L)
    # on [0, L) has amplitude 2*pi/L
    gdims = (16, 8, 8)
    L = (4.0, 2 * np.pi, 2 * np.pi)
    cfg = GridConfig(gdims=gdims, pdims=(2, 4))
    grid = cd.make_grid(cfg, devices=jax.devices()[:8])
    plan = DistributedFFT(grid=grid, real=True)
    ops = SpectralOperators(plan=plan, lengths=L, dtype=np.float64)
    xs = np.arange(gdims[0]) * L[0] / gdims[0]
    f = np.broadcast_to(np.sin(2 * np.pi * xs / L[0])[:, None, None],
                        gdims).copy()
    sh = plan.forward(cd.scatter_global(grid, f, 0))
    got = cd.gather_global(grid, plan.inverse(ops.derivative(sh, 0)), 0)
    ref = (2 * np.pi / L[0]) * np.broadcast_to(
        np.cos(2 * np.pi * xs / L[0])[:, None, None], gdims)
    assert np.allclose(got, ref, atol=1e-8)


def test_shell_spectrum_parseval_anisotropic_lengths():
    # review fix: on anisotropic domains the max shell index exceeds the
    # isotropic estimate; default nbins must not silently drop modes
    gdims = (16, 16, 16)
    L = (2 * np.pi, 2 * np.pi, np.pi)  # z fundamental = 2: shells reach ~2x
    cfg = GridConfig(gdims=gdims, pdims=(2, 4))
    grid = cd.make_grid(cfg, devices=jax.devices()[:8])
    plan = DistributedFFT(grid=grid, real=True)
    ops = SpectralOperators(plan=plan, lengths=L, dtype=np.float64)
    f = RNG.standard_normal(gdims)
    sh = plan.forward(cd.scatter_global(grid, f, 0))
    ek = np.asarray(ops.shell_spectrum(sh))
    assert np.isclose(ek.sum(), 0.5 * np.mean(f ** 2), rtol=1e-10)


def test_shell_spectrum_parseval_odd_first_dim():
    # review fix: odd gdims[0] has NO Nyquist plane — the last retained
    # kx plane still has a conjugate partner and needs multiplicity 2
    gdims = (15, 8, 8)
    cfg = GridConfig(gdims=gdims, pdims=(2, 4))
    grid = cd.make_grid(cfg, devices=jax.devices()[:8])
    plan = DistributedFFT(grid=grid, real=True)
    ops = SpectralOperators(plan=plan, dtype=np.float64)
    f = RNG.standard_normal(gdims)
    sh = plan.forward(cd.scatter_global(grid, f, 0))
    ek = np.asarray(ops.shell_spectrum(sh))
    assert np.isclose(ek.sum(), 0.5 * np.mean(f ** 2), rtol=1e-10)


def test_spectral_ops_axis_contiguous_layout():
    # the spectral fields live in the Z-pencil's MEMORY layout; operators
    # must stay correct under axis-contiguous pencils (scatter handles
    # the layout mapping)
    gdims = (16, 12, 8)
    cfg = GridConfig(gdims=gdims, pdims=(2, 4),
                     transpose_axis_contiguous=(True, True, True))
    grid = cd.make_grid(cfg, devices=jax.devices()[:8])
    plan = DistributedFFT(grid=grid, real=True)
    ops = SpectralOperators(plan=plan, dtype=np.float64)
    f = RNG.standard_normal(gdims)
    sh = plan.forward(cd.scatter_global(grid, f, 0))
    got = cd.gather_global(plan.complex_grid,
                           ops.derivative(sh, 0), 2)
    kx, ky, kz = np_k(gdims, real=True)
    ref = (1j * kx) * _np_rfft3(f)
    assert np.allclose(got, ref, atol=1e-8), np.abs(got - ref).max()
    # Parseval through the layout too
    ek = np.asarray(ops.shell_spectrum(sh))
    assert np.isclose(ek.sum(), 0.5 * np.mean(f ** 2), rtol=1e-10)
