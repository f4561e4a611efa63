"""Seeded randomized property tests — the long-tail configuration fuzz the
reference's cartesian sweep runner provides (tests/test_runner.py), kept
deterministic so CI is stable.

Properties checked on random (gdims, pdims, layout, method, dtype, halos):
  * 4-op transpose round trip is exact (global-index oracle);
  * every intermediate pencil gathers back to the original field;
  * halo update leaves the interior untouched and fills halos with the
    correct periodic neighbors.
"""

import numpy as np
import pytest
import jax

import cudecomp_tpu as cd
from cudecomp_tpu.config import GridConfig, TransposeMethod
from cudecomp_tpu.utils import testing as T

METHODS = [TransposeMethod.ALL_TO_ALL, TransposeMethod.RING,
           TransposeMethod.RING_XOR, TransposeMethod.RING_PIPELINED,
           TransposeMethod.RING_HIER]
PDIMS = [(1, 4), (4, 1), (2, 2), (2, 4), (4, 2), (1, 8), (8, 1), (2, 3),
         (3, 2), (1, 6)]


def random_case(rng):
    gdims = tuple(int(rng.integers(4, 14)) for _ in range(3))
    pdims = PDIMS[rng.integers(0, len(PDIMS))]
    # ensure no empty pencils: every sharded dim >= its process count
    gdims = tuple(max(g, max(pdims)) for g in gdims)
    kw = {}
    style = rng.integers(0, 3)
    if style == 1:
        kw["transpose_axis_contiguous"] = (True, True, True)
    elif style == 2:
        perms = [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1),
                 (2, 1, 0)]
        kw["transpose_mem_order"] = tuple(
            perms[rng.integers(0, 6)] for _ in range(3))
    method = METHODS[rng.integers(0, len(METHODS))]
    dtype = [np.float32, np.float64][rng.integers(0, 2)]
    return gdims, pdims, kw, method, dtype


@pytest.mark.parametrize("seed", range(12))
def test_random_transpose_roundtrip(seed):
    rng = np.random.default_rng(1000 + seed)
    gdims, pdims, kw, method, dtype = random_case(rng)
    grid = cd.make_grid(GridConfig(gdims=gdims, pdims=pdims, **kw),
                        devices=jax.devices()[: pdims[0] * pdims[1]])
    f = T.global_index_field(gdims, dtype=dtype)
    buf = cd.scatter_global(grid, f, 0)
    stages = [(cd.transpose_x_to_y, 1), (cd.transpose_y_to_z, 2),
              (cd.transpose_z_to_y, 1), (cd.transpose_y_to_x, 0)]
    for op, out_axis in stages:
        buf = op(grid, buf, method=method)
        np.testing.assert_array_equal(
            cd.gather_global(grid, buf, out_axis), f,
            err_msg=f"{op.__name__} {gdims} {pdims} {kw} {method}")


@pytest.mark.parametrize("seed", range(8))
def test_random_halo_update(seed):
    rng = np.random.default_rng(2000 + seed)
    gdims, pdims, kw, _, dtype = random_case(rng)
    axis = int(rng.integers(0, 3))
    he = tuple(int(rng.integers(0, 2)) for _ in range(3))
    if not any(he):
        he = (1, 0, 0)
    periods = tuple(bool(rng.integers(0, 2)) for _ in range(3))
    grid = cd.make_grid(GridConfig(gdims=gdims, pdims=pdims, **kw),
                        devices=jax.devices()[: pdims[0] * pdims[1]])
    # reference constraint: halo width must not exceed the smallest split
    from cudecomp_tpu import geometry
    for d in range(3):
        pd = geometry.shard_pdim_of_dim(axis, d)
        if pd is not None and he[d] > 0:
            if he[d] > min(geometry._dist_splits(grid.config, d, pdims[pd])):
                return  # skip invalid random draw
    f = T.global_index_field(gdims, dtype=dtype)
    b = cd.scatter_global(grid, f, axis, halo_extents=he)
    out = cd.update_halos(grid, b, axis, he, periods)
    np.testing.assert_array_equal(
        cd.gather_global(grid, out, axis, halo_extents=he), f,
        err_msg=f"interior changed {gdims} {pdims} axis={axis} he={he}")
    exp = T.expected_halo_buffer(grid, axis, f, he, periods,
                                 dims=[d for d in range(3) if he[d] > 0])
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out)), exp,
        err_msg=f"halos wrong {gdims} {pdims} axis={axis} he={he} "
                f"periods={periods}")


@pytest.mark.parametrize("seed", range(8))
def test_random_stencil_apply_vs_halo_map(seed):
    # random 27-tap weights x random divisible layouts x random boundary
    # periods: the fused stencil_apply path and the ghost-extended
    # halo_map fallback must agree exactly (the fused/fallback boundary
    # moves with the tap set and sharding, so random configs walk both)
    rng = np.random.default_rng(3000 + seed)
    pdims = [(1, 4), (4, 1), (2, 2), (2, 4), (1, 8)][rng.integers(0, 5)]
    # divisible extents (the ghost-plane pipeline's requirement)
    gdims = tuple(int(rng.integers(2, 5)) * max(4, p * 2)
                  for p in (pdims[0], pdims[1], max(pdims)))
    kw = {}
    if rng.integers(0, 2):
        kw["transpose_axis_contiguous"] = (True, True, True)
    periods = tuple(bool(rng.integers(0, 2)) for _ in range(3))
    grid = cd.make_grid(GridConfig(gdims=gdims, pdims=pdims, **kw),
                        devices=jax.devices()[: pdims[0] * pdims[1]])
    # random sparse tap set (face-heavy so the fused path is often taken)
    w = np.zeros((3, 3, 3))
    for _ in range(int(rng.integers(1, 8))):
        off = tuple(rng.integers(0, 3) for _ in range(3))
        w[off] = rng.standard_normal()
    f = rng.standard_normal(gdims)
    x = cd.scatter_global(grid, f, 0)
    got = cd.gather_global(grid, cd.stencil_apply(grid, x, w, 0, periods), 0)

    # oracle: explicit shifted-sum on the global field with the same
    # boundary conventions (periodic roll / zero beyond edges).  Stencil
    # offsets index MEMORY dims (the documented contract), so map each
    # tap's offsets onto global dims through the pencil's memory order.
    order = grid.config.mem_order(0)
    ref = np.zeros_like(f)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                wv = w[1 + dx, 1 + dy, 1 + dz]
                if wv == 0.0:
                    continue
                off_g = [0, 0, 0]
                for i, o in enumerate((dx, dy, dz)):
                    off_g[order[i]] = o
                shifted = f
                for d, o in enumerate(off_g):
                    if o == 0:
                        continue
                    shifted = np.roll(shifted, -o, axis=d)
                    if not periods[d]:
                        sl = [slice(None)] * 3
                        sl[d] = slice(-o, None) if o > 0 else slice(0, -o)
                        shifted = shifted.copy()
                        shifted[tuple(sl)] = 0.0
                ref = ref + wv * shifted
    np.testing.assert_allclose(got, ref, atol=1e-10,
                               err_msg=f"{gdims} {pdims} {periods}")


@pytest.mark.parametrize("seed", range(8))
def test_random_fft_vs_numpy(seed):
    # random (gdims incl. odd/uneven, pdims, layout, method) x {c2c, r2c}:
    # forward transform matches numpy on the gathered spectrum and the
    # round trip restores the field (f64 so the oracle is tight)
    from cudecomp_tpu.ops.fft import DistributedFFT

    rng = np.random.default_rng(5000 + seed)
    gdims, pdims, kw, method, _ = random_case(rng)
    real = bool(rng.integers(0, 2))
    if real and gdims[0] // 2 + 1 < max(pdims):
        # r2c halves the X extent; skip draws whose complex grid would
        # have empty pencils (the library rejects them by design)
        real = False
    grid = cd.make_grid(GridConfig(gdims=gdims, pdims=pdims,
                                   transpose_method=method, **kw),
                        devices=jax.devices()[: pdims[0] * pdims[1]])
    plan = DistributedFFT(grid=grid, real=real)
    if real:
        f = rng.standard_normal(gdims)
        ref = np.fft.fftn(np.fft.rfft(f, axis=0), axes=(1, 2))
    else:
        f = (rng.standard_normal(gdims)
             + 1j * rng.standard_normal(gdims)).astype(np.complex128)
        ref = np.fft.fftn(f)
    x = cd.scatter_global(grid, f, 0)
    xh = plan.forward(x)
    got = cd.gather_global(plan.complex_grid, xh, 2)
    np.testing.assert_allclose(got, ref, atol=1e-8,
                               err_msg=f"{gdims} {pdims} {method} {real}")
    back = cd.gather_global(grid, plan.inverse(xh), 0)
    np.testing.assert_allclose(back, f, atol=1e-10)
