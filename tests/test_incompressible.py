"""Fractional-step incompressible NS solver validation.

The contract is machine-tight, not asymptotic (see the module docstring of
``cudecomp_tpu/models/incompressible.py``): for the extruded 2D
Taylor-Green vortex the discrete advection term is an exact discrete
gradient, so the projected trajectory equals the linear viscous ODE's RK
iterates to roundoff.  This exercises every primitive the reference's CFD
consumers compose per step — halo exchange (stencils), transposes
(pressure FFT), pencil layout — in one closed loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cudecomp_tpu as cd
from cudecomp_tpu.models.incompressible import (
    ProjectionSolver, extruded_tg_velocity, rk_stability)


def _grid(pdims=(2, 4), gdims=(16, 16, 16), **kw):
    cfg = cd.GridConfig(gdims=gdims, pdims=pdims, **kw)
    return cd.make_grid(cfg, devices=jax.devices()[: pdims[0] * pdims[1]])


def _tg_state(grid, solver):
    u, f = solver.setup_tg()
    return u, f


def test_extruded_tg_is_discretely_divfree():
    grid = _grid()
    s = ProjectionSolver(grid=grid, nu=0.02)
    u, f = s.setup_tg()
    assert float(s.max_divergence(u)) < 1e-13


def test_projection_exactness_random_field():
    # a random (non-solenoidal) field projects to machine-zero
    # central-difference divergence, and the projection is idempotent
    grid = _grid()
    s = ProjectionSolver(grid=grid)
    rng = np.random.default_rng(0)
    from cudecomp_tpu.utils.arrays import scatter_global
    comps = [rng.standard_normal(grid.config.gdims) for _ in range(3)]
    v = jnp.stack([scatter_global(grid, c, 0) for c in comps], axis=-1)
    f = s.setup()
    w = s.leray(v, f)
    assert float(s.max_divergence(w)) < 1e-11
    w2 = s.leray(w, f)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w),
                               rtol=0, atol=1e-12)


@pytest.mark.parametrize("scheme", ["rk2", "rk4"])
def test_tg_decay_matches_rk_polynomial_exactly(scheme):
    # the headline validation: velocity == R(z)^n * u0 to roundoff
    grid = _grid()
    s = ProjectionSolver(grid=grid, nu=0.05, scheme=scheme)
    u0, f = s.setup_tg()
    dt, n = 2e-2, 8
    step = jax.jit(lambda v: s.step(v, f, dt))
    u = u0
    for _ in range(n):
        u = step(u)
    z = s.viscous_eigenvalue((1, 1, 0)) * dt
    amp = rk_stability(scheme, z) ** n
    np.testing.assert_allclose(np.asarray(u), amp * np.asarray(u0),
                               rtol=0, atol=1e-11)
    # and it stayed divergence-free without any end-of-step correction
    assert float(s.max_divergence(u)) < 1e-11


def test_divfree_and_energy_decay_general_flow():
    # full 3D TG (genuinely nonlinear): divergence stays machine-zero
    # and energy decays monotonically under viscosity
    from cudecomp_tpu.models.taylor_green import taylor_green_velocity
    from cudecomp_tpu.utils.arrays import scatter_global
    grid = _grid()
    s = ProjectionSolver(grid=grid, nu=0.05)
    comps = taylor_green_velocity(grid.config.gdims)
    u = jnp.stack([scatter_global(grid, c, 0) for c in comps], axis=-1)
    f = s.setup()
    u = s.leray(u, f)  # 3D TG is only continuum-divfree; project first
    e = [float(s.energy(u))]
    step = jax.jit(lambda v: s.step(v, f, 1e-2))
    for _ in range(5):
        u = step(u)
        e.append(float(s.energy(u)))
        assert float(s.max_divergence(u)) < 1e-10
    assert all(b < a for a, b in zip(e, e[1:]))


def test_pdims_invariance():
    # the same trajectory on (1,1)-embedded mesh vs a 2x4 decomposition
    g1 = _grid(pdims=(2, 4))
    g2 = _grid(pdims=(8, 1))
    outs = []
    for grid in (g1, g2):
        s = ProjectionSolver(grid=grid, nu=0.03)
        u, f = s.setup_tg()
        u = jax.jit(lambda v, s=s, f=f: s.run_scan(v, f, 3, 1e-2))(u)
        from cudecomp_tpu.utils.arrays import gather_global
        outs.append(np.stack([gather_global(grid, u[..., c], 0)
                              for c in range(3)], axis=-1))
    np.testing.assert_allclose(outs[0], outs[1], rtol=0, atol=1e-12)


def test_split_complex_matches_complex_path():
    grid = _grid()
    dense = ProjectionSolver(grid=grid, nu=0.03, split_complex=False)
    planes = ProjectionSolver(grid=grid, nu=0.03, split_complex=True)
    u0, fd = dense.setup_tg()
    _, fp = planes.setup_tg()
    ud = dense.step(u0, fd, 1e-2)
    up = planes.step(u0, fp, 1e-2)
    np.testing.assert_allclose(np.asarray(up), np.asarray(ud),
                               rtol=0, atol=1e-10)


def test_halo_map_component_changing_fns():
    # the library-level contract the solver relies on: halo_map fns may
    # change the trailing component dims (vector->scalar, scalar->vector)
    grid = _grid()
    s = ProjectionSolver(grid=grid)
    rng = np.random.default_rng(1)
    from cudecomp_tpu.utils.arrays import scatter_global, gather_global
    comps = [rng.standard_normal(grid.config.gdims) for _ in range(3)]
    v = jnp.stack([scatter_global(grid, c, 0) for c in comps], axis=-1)
    div = s.divergence(v)            # (..., 3) -> (...)
    assert div.shape == grid.global_shape(0)
    g = s.gradient(div)              # (...) -> (..., 3)
    assert g.shape == grid.global_shape(0) + (3,)
    # oracle: numpy central differences on the gathered global field
    got = gather_global(grid, div, 0)
    h = 2 * np.pi / grid.config.gdims[0]
    want = sum((np.roll(comps[d], -1, axis=d)
                - np.roll(comps[d], 1, axis=d)) / (2 * h) for d in range(3))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
