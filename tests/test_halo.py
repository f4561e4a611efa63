"""Halo exchange correctness — the reference halo_tests.cc pattern:
asymmetric extents {1,3,2}, periodic/non-periodic, padding, axis-contiguous
layouts, slab + pencil grids, plus the periodic self-copy case."""

import numpy as np
import pytest
import jax

import cudecomp_tpu as cd
from cudecomp_tpu.config import GridConfig
from cudecomp_tpu.utils import testing as T


def run_halo_case(gdims, pdims, axis, halo_extents, halo_periods,
                  dtype=np.float64, **cfg_kw):
    cfg = GridConfig(gdims=gdims, pdims=pdims, **cfg_kw)
    grid = cd.make_grid(cfg, devices=jax.devices()[: pdims[0] * pdims[1]])
    x_global = T.global_index_field(gdims, dtype=dtype)
    buf = cd.scatter_global(grid, x_global, axis, halo_extents=halo_extents)
    out = cd.update_halos(grid, buf, axis, halo_extents, halo_periods)
    dims = [d for d in range(3) if halo_extents[d] > 0]
    expected = T.expected_halo_buffer(grid, axis, x_global, halo_extents,
                                      halo_periods, dims)
    got = np.asarray(jax.device_get(out))
    np.testing.assert_allclose(got, expected, rtol=0, atol=0)
    # interior unchanged
    np.testing.assert_allclose(cd.gather_global(grid, out, axis,
                                                halo_extents=halo_extents),
                               x_global)


@pytest.mark.parametrize("axis", [0, 1, 2])
@pytest.mark.parametrize("pdims", [(2, 2), (1, 4), (4, 1)])
def test_periodic_all_dims(axis, pdims):
    # asymmetric extents like halo_tests.cc:28-51; widths capped by the
    # smallest split (4-way factors of 8 give splits of 2)
    he = (1, 3, 2) if pdims == (2, 2) else (1, 2, 2)
    run_halo_case((8, 8, 8), pdims, axis, he, (True, True, True))


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_nonperiodic(axis):
    run_halo_case((8, 8, 8), (2, 2), axis, (2, 1, 1), (False, False, False))


def test_mixed_periodicity():
    run_halo_case((8, 8, 8), (2, 2), 0, (1, 2, 1), (True, False, True))


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_uneven_grid(axis):
    run_halo_case((9, 10, 11), (2, 2), axis, (1, 1, 1), (True, True, True))


def test_uneven_nonperiodic():
    run_halo_case((9, 10, 11), (2, 2), 1, (2, 1, 2), (False, True, False))


def test_axis_contiguous_layout():
    run_halo_case((8, 8, 8), (2, 2), 1, (1, 2, 1), (True, True, True),
                  transpose_axis_contiguous=(True, True, True))
    run_halo_case((9, 10, 11), (2, 2), 2, (1, 1, 2), (True, False, True),
                  transpose_axis_contiguous=(True, True, True))


def test_pencil_axis_periodic_self_copy():
    # halo along the pencil axis itself (unsharded): periodic self-copy,
    # reference case 0 (halo.h:164-193)
    run_halo_case((8, 8, 8), (2, 2), 0, (2, 0, 0), (True, True, True))
    run_halo_case((9, 10, 11), (2, 2), 1, (0, 3, 0), (True, True, True))


def test_pencil_axis_nonperiodic_noop():
    run_halo_case((8, 8, 8), (2, 2), 0, (2, 0, 0), (False, False, False))


def test_single_rank_dim_self_copy():
    # sharded dim with process-grid factor 1: periodic wrap is a local copy
    run_halo_case((8, 8, 8), (1, 4), 0, (0, 2, 0), (True, True, True))
    run_halo_case((8, 8, 8), (4, 1), 0, (0, 0, 2), (True, True, True))


def test_single_dim_update():
    cfg = GridConfig(gdims=(8, 8, 8), pdims=(2, 2))
    grid = cd.make_grid(cfg, devices=jax.devices()[:4])
    x_global = T.global_index_field((8, 8, 8))
    he = (1, 1, 1)
    buf = cd.scatter_global(grid, x_global, 0, halo_extents=he)
    out = cd.update_halos(grid, buf, 0, he, (True, True, True), dim=1)
    expected = T.expected_halo_buffer(grid, 0, x_global, he,
                                      (True, True, True), dims=[1])
    np.testing.assert_allclose(np.asarray(jax.device_get(out)), expected)


def test_halo_too_wide_rejected():
    cfg = GridConfig(gdims=(8, 8, 8), pdims=(4, 1))
    grid = cd.make_grid(cfg, devices=jax.devices()[:4])
    buf = cd.scatter_global(grid, T.global_index_field((8, 8, 8)), 0,
                            halo_extents=(0, 3, 0))
    with pytest.raises(ValueError, match="exceeds"):
        cd.update_halos(grid, buf, 0, (0, 3, 0), (True, True, True))


def test_zero_halo_noop():
    cfg = GridConfig(gdims=(8, 8, 8), pdims=(2, 2))
    grid = cd.make_grid(cfg, devices=jax.devices()[:4])
    x_global = T.global_index_field((8, 8, 8))
    buf = cd.scatter_global(grid, x_global, 0)
    out = cd.update_halos(grid, buf, 0, (0, 0, 0), (True, True, True))
    np.testing.assert_allclose(np.asarray(jax.device_get(out)),
                               np.asarray(jax.device_get(buf)))


def test_jittable():
    cfg = GridConfig(gdims=(8, 8, 8), pdims=(2, 2))
    grid = cd.make_grid(cfg, devices=jax.devices()[:4])
    x_global = T.global_index_field((8, 8, 8))
    he = (1, 1, 1)
    buf = cd.scatter_global(grid, x_global, 0, halo_extents=he)
    fn = jax.jit(lambda b: cd.update_halos(grid, b, 0, he, (True, True, True)))
    out = fn(buf)
    expected = T.expected_halo_buffer(grid, 0, x_global, he,
                                      (True, True, True), dims=[0, 1, 2])
    np.testing.assert_allclose(np.asarray(jax.device_get(out)), expected)


@pytest.mark.parametrize("pdims", [(1, 1), (2, 2)])
@pytest.mark.parametrize("periods", [(True, True, True),
                                     (False, True, False)])
def test_donated_matches_functional(pdims, periods):
    # donate=True (the reference's in-place buffer semantics,
    # halo.h:164-193) must produce bit-identical results to the
    # functional path on single-chip self-copy AND exchange grids
    gdims = (8, 8, 8)
    he = (1, 2, 1)
    cfg = GridConfig(gdims=gdims, pdims=pdims)
    grid = cd.make_grid(cfg, devices=jax.devices()[: pdims[0] * pdims[1]])
    x_global = T.global_index_field(gdims, dtype=np.float64)
    buf = cd.scatter_global(grid, x_global, 0, halo_extents=he)
    want = np.asarray(jax.device_get(
        cd.update_halos(grid, buf, 0, he, periods)))
    buf2 = cd.scatter_global(grid, x_global, 0, halo_extents=he)
    got = np.asarray(jax.device_get(
        cd.update_halos(grid, buf2, 0, he, periods, donate=True)))
    np.testing.assert_array_equal(got, want)


def test_donated_uneven_component_dims():
    gdims = (9, 10, 11)
    he = (1, 1, 1)
    cfg = GridConfig(gdims=gdims, pdims=(2, 2))
    grid = cd.make_grid(cfg, devices=jax.devices()[:4])
    x_global = T.global_index_field(gdims, dtype=np.float64)
    buf = cd.scatter_global(grid, x_global, 0, halo_extents=he)
    buf = jax.numpy.stack([buf, buf * 2.0], axis=-1)
    want = np.asarray(jax.device_get(
        cd.update_halos(grid, buf, 0, he, (True, True, True))))
    got = np.asarray(jax.device_get(
        cd.update_halos(grid, buf, 0, he, (True, True, True), donate=True)))
    np.testing.assert_array_equal(got, want)
