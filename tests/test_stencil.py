"""Ghost-plane stencil pipeline (ops/stencil.py) — numpy-oracle tests on
the virtual CPU mesh, periodic + non-periodic, pencil axes, layouts, and
the Pallas kernel in interpret mode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import cudecomp_tpu as cd
from cudecomp_tpu.config import GridConfig


def np_lap7(u, periods):
    """Numpy 7-point Laplacian; non-periodic edges see zero ghosts."""
    u = u.astype(np.float64)
    lap = -6.0 * u
    for d in range(3):
        for s in (-1, 1):
            sh = np.roll(u, s, axis=d)
            if not periods[d]:
                idx = [slice(None)] * 3
                idx[d] = 0 if s == 1 else -1
                sh[tuple(idx)] = 0.0
            lap += sh
    return lap


def run_case(gdims, pdims, axis, periods, dtype=np.float64, steps=1,
             dt=None, **cfg_kw):
    cfg = GridConfig(gdims=gdims, pdims=pdims, **cfg_kw)
    grid = cd.make_grid(cfg, devices=jax.devices()[: pdims[0] * pdims[1]])
    rng = np.random.default_rng(0)
    x = rng.standard_normal(gdims).astype(dtype)
    u = cd.scatter_global(grid, x, axis)
    if dt is None:
        out = jax.jit(lambda v: cd.laplacian7(grid, v, axis, periods))(u)
        want = np_lap7(x, periods)
    else:
        fn = jax.jit(lambda v: cd.diffusion_step(grid, v, dt, axis, periods))
        out = u
        for _ in range(steps):
            out = fn(out)
        want = x.astype(np.float64)
        for _ in range(steps):
            want = want + dt * np_lap7(want, periods)
    got = np.asarray(cd.gather_global(grid, out, axis))
    tol = 1e-12 if np.dtype(dtype) == np.float64 else 1e-5
    np.testing.assert_allclose(got, want, rtol=0, atol=tol * max(
        1.0, float(np.max(np.abs(want)))))


@pytest.mark.parametrize("pdims", [(1, 1), (2, 4), (1, 4), (4, 1)])
def test_periodic_laplacian(pdims):
    run_case((16, 16, 16), pdims, 0, (True, True, True))


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_pencil_axes(axis):
    run_case((8, 16, 32), (2, 2), axis, (True, True, True))


@pytest.mark.parametrize("periods", [(False, False, False),
                                     (True, False, True)])
def test_nonperiodic(periods):
    run_case((16, 16, 16), (2, 4), 0, periods)


def test_diffusion_step_multistep():
    run_case((16, 16, 16), (2, 4), 0, (True, True, True), steps=3, dt=0.05)


def test_axis_contiguous_layout():
    run_case((16, 16, 16), (2, 2), 1, (True, True, True),
             transpose_axis_contiguous=(True, True, True))


def test_uneven_extents_rejected():
    cfg = GridConfig(gdims=(9, 16, 16), pdims=(2, 2))
    grid = cd.make_grid(cfg, devices=jax.devices()[:4])
    u = jnp.zeros(grid.global_shape(1))
    # axis 1 shards dim 0 (9 over 2): must raise
    with pytest.raises(ValueError, match="divisible"):
        cd.laplacian7(grid, u, 1, (True, True, True))


def test_shape_mismatch_rejected():
    cfg = GridConfig(gdims=(16, 16, 16), pdims=(2, 4))
    grid = cd.make_grid(cfg)
    with pytest.raises(ValueError, match="does not match"):
        cd.laplacian7(grid, jnp.zeros((8, 16, 16)), 0, (True,) * 3)


def test_pallas_kernel_interpret(monkeypatch):
    # run the real Mosaic kernel path in interpret mode on the CPU mesh
    monkeypatch.setenv("CUDECOMP_TPU_PALLAS_INTERPRET", "1")
    from cudecomp_tpu.ops import stencil as st
    assert st._kernel_eligible((16, 16, 128), np.float32, True)
    run_case((16, 16, 128), (1, 1), 0, (True, True, True), dtype=np.float32)
    run_case((16, 16, 128), (1, 1), 0, (True, False, False),
             dtype=np.float32, steps=2, dt=0.1)


def test_kernel_eligibility():
    from cudecomp_tpu.ops import stencil as st
    # off-TPU without interpret: never
    if jax.default_backend() in ("cpu", "gpu"):
        assert not st._kernel_eligible((512, 512, 512), np.float32, False)
    # interpret isolates the shape logic
    assert st._kernel_eligible((512, 512, 512), np.float32, True)
    assert st._pick_bx(512) == 16
    assert st._pick_bx(24) == 8
    assert st._pick_bx(10) == 2
    # byte cap: 512^3 f32 planes are 1 MB -> 8-plane blocks
    assert st._pick_bx(512, 512 * 512 * 4) == 8
    assert st._pick_bx(256, 256 * 256 * 4) == 16
