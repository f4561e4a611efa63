"""Geometry golden tests — decompositions bit-identical to the reference
formulas (getSplits common.h:579-589, cudecompGetPencilInfoVersioned
src/cudecomp.cc:1317-1379, cudecompGetShiftedRank :1710-1755), including the
deliberately uneven 9x10x11 grid from transpose_tests.cc:35."""

import numpy as np
import pytest

from cudecomp_tpu import geometry as G
from cudecomp_tpu.config import GridConfig, RankOrder


def test_get_splits_even_and_uneven():
    assert G.get_splits(8, 4) == (2, 2, 2, 2)
    assert G.get_splits(10, 4) == (3, 3, 2, 2)
    assert G.get_splits(11, 4) == (3, 3, 3, 2)
    assert G.get_splits(3, 4) == (1, 1, 1, 0)  # empty pencil case
    assert G.get_split_offsets(10, 4) == (0, 3, 6, 8)
    assert G.get_split_offsets(8, 4) == (0, 2, 4, 6)


def test_get_splits_excess_goes_to_last_populated():
    # excess tacked onto last populated chunk (getSplits pad arg)
    assert G.get_splits(8, 4, excess=3) == (2, 2, 2, 5)
    assert G.get_splits(3, 4, excess=2) == (1, 1, 3, 0)


def test_pencil_info_even_grid():
    cfg = GridConfig(gdims=(8, 8, 8), pdims=(2, 2))
    # X-pencil: full X, Y over Pr, Z over Pc
    p = G.get_pencil_info(cfg, 0, (0, 0))
    assert p.shape == (8, 4, 4)
    assert p.lo == (0, 0, 0) and p.hi == (7, 3, 3)
    assert p.size == 128
    p = G.get_pencil_info(cfg, 0, (1, 1))
    assert p.lo == (0, 4, 4) and p.hi == (7, 7, 7)
    # Y-pencil: X over Pr, full Y, Z over Pc
    p = G.get_pencil_info(cfg, 1, (1, 0))
    assert p.shape == (4, 8, 4)
    assert p.lo == (4, 0, 0) and p.hi == (7, 7, 3)
    # Z-pencil: X over Pr, Y over Pc, full Z
    p = G.get_pencil_info(cfg, 2, (0, 1))
    assert p.shape == (4, 4, 8)
    assert p.lo == (0, 4, 0) and p.hi == (3, 7, 7)


def test_pencil_info_uneven_9_10_11():
    cfg = GridConfig(gdims=(9, 10, 11), pdims=(2, 2))
    # X-pencil shards Y (10 -> 5,5) and Z (11 -> 6,5)
    p00 = G.get_pencil_info(cfg, 0, (0, 0))
    assert p00.shape == (9, 5, 6)
    p01 = G.get_pencil_info(cfg, 0, (0, 1))
    assert p01.shape == (9, 5, 5)
    assert p01.lo == (0, 0, 6) and p01.hi == (8, 4, 10)
    # Y-pencil shards X (9 -> 5,4) and Z (11 -> 6,5)
    p10 = G.get_pencil_info(cfg, 1, (1, 0))
    assert p10.shape == (4, 10, 6)
    assert p10.lo == (5, 0, 0)
    # totals tile the grid exactly
    for axis in range(3):
        total = 0
        for pr in range(2):
            for pc in range(2):
                total += G.get_pencil_info(cfg, axis, (pr, pc)).size
        assert total == 9 * 10 * 11


def test_pencil_info_halos_and_padding():
    cfg = GridConfig(gdims=(8, 8, 8), pdims=(2, 2))
    p = G.get_pencil_info(cfg, 0, (0, 0), halo_extents=(1, 2, 0),
                          padding=(0, 1, 3))
    # shape gains 2*halo + padding per global dim; lo/hi stay interior
    assert p.shape == (8 + 2, 4 + 4 + 1, 4 + 3)
    assert p.lo == (0, 0, 0) and p.hi == (7, 3, 3)
    assert p.halo_extents == (1, 2, 0) and p.padding == (0, 1, 3)
    assert p.size == 10 * 9 * 7


def test_pencil_info_mem_order_axis_contiguous():
    cfg = GridConfig(gdims=(8, 16, 32), pdims=(2, 2),
                     transpose_axis_contiguous=(True, True, True))
    # Y-pencil order: ((1+1)%3, (1+2)%3, 1) = (2, 0, 1) -> dims [z, x, y]
    p = G.get_pencil_info(cfg, 1, (0, 0))
    assert p.order == (2, 0, 1)
    assert p.shape == (16, 4, 16)  # (Z/2, X/2, Y)
    assert p.shape_g == (4, 16, 16)
    # X-pencil order: (1, 2, 0) -> dims [y, z, x]
    p = G.get_pencil_info(cfg, 0, (1, 1))
    assert p.order == (1, 2, 0)
    assert p.shape == (8, 16, 8)
    assert p.lo_g == (0, 8, 16)


def test_explicit_mem_order_wins():
    cfg = GridConfig(gdims=(8, 8, 8), pdims=(2, 2),
                     transpose_axis_contiguous=(True, True, True),
                     transpose_mem_order=((0, 1, 2), (0, 1, 2), (0, 1, 2)))
    assert cfg.mem_order(1) == (0, 1, 2)


def test_gdims_dist_excess():
    # distribute as if (8, 8, 8); gdims (8, 8, 11): excess 3 on Z goes to the
    # last populated pencil of any decomposition that shards Z
    cfg = GridConfig(gdims=(8, 8, 11), gdims_dist=(8, 8, 8), pdims=(2, 2))
    p = G.get_pencil_info(cfg, 0, (0, 0))
    assert p.shape == (8, 4, 4)
    p = G.get_pencil_info(cfg, 0, (0, 1))
    assert p.shape == (8, 4, 4 + 3)
    assert p.lo == (0, 0, 4) and p.hi == (7, 3, 10)
    # Z-pencil: Z unsharded -> full 11 everywhere
    p = G.get_pencil_info(cfg, 2, (1, 1))
    assert p.shape == (4, 4, 11)


def test_gdims_dist_validation():
    with pytest.raises(ValueError):
        GridConfig(gdims=(8, 8, 8), gdims_dist=(9, 8, 8), pdims=(2, 2))


def test_buffer_shapes_padded_format():
    cfg = GridConfig(gdims=(9, 10, 11), pdims=(2, 2))
    # buffer uses max splits: Y max 5, Z max 6, X max 5 (9 -> 5,4)
    assert G.pencil_buffer_shape(cfg, 0) == (9, 5, 6)
    assert G.pencil_buffer_shape(cfg, 1) == (5, 10, 6)
    assert G.pencil_buffer_shape(cfg, 2) == (5, 5, 11)
    assert G.global_buffer_shape(cfg, 0) == (9, 10, 12)
    assert G.global_buffer_shape(cfg, 1) == (10, 10, 12)
    assert G.global_buffer_shape(cfg, 2) == (10, 10, 11)


def test_rank_coords_row_and_col_major():
    cfg = GridConfig(gdims=(8, 8, 8), pdims=(2, 3))
    assert [G.coords_of_rank(cfg, r) for r in range(6)] == [
        (0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2)]
    cfgc = GridConfig(gdims=(8, 8, 8), pdims=(2, 3),
                      rank_order=RankOrder.COL_MAJOR)
    assert [G.coords_of_rank(cfgc, r) for r in range(6)] == [
        (0, 0), (1, 0), (0, 1), (1, 1), (0, 2), (1, 2)]
    for cfg_ in (cfg, cfgc):
        for r in range(6):
            pr, pc = G.coords_of_rank(cfg_, r)
            assert G.rank_of_coords(cfg_, pr, pc) == r


def test_shifted_rank():
    cfg = GridConfig(gdims=(8, 8, 8), pdims=(2, 3))
    # rank 0 at (0,0). X-pencil (axis 0): dim 1 sharded over pr, dim 2 over pc
    assert G.get_shifted_rank(cfg, 0, 1, +1, False, 0) == 3   # (1,0)
    assert G.get_shifted_rank(cfg, 0, 1, -1, False, 0) == -1  # off-domain
    assert G.get_shifted_rank(cfg, 0, 1, -1, True, 0) == 3    # periodic wrap
    assert G.get_shifted_rank(cfg, 0, 2, +1, False, 0) == 1   # (0,1)
    assert G.get_shifted_rank(cfg, 0, 2, -1, True, 0) == 2    # wrap to (0,2)
    # dim == axis: unsharded
    assert G.get_shifted_rank(cfg, 0, 0, +1, True, 4) == 4
    assert G.get_shifted_rank(cfg, 0, 0, +1, False, 4) == -1
    # displacement 0
    assert G.get_shifted_rank(cfg, 1, 0, 0, False, 5) == 5
    # Z-pencil (axis 2): dim 0 over pr, dim 1 over pc
    assert G.get_shifted_rank(cfg, 2, 1, +2, False, 0) == 2
    assert G.get_shifted_rank(cfg, 2, 1, +3, True, 0) == 0


def test_workspace_sizes():
    cfg = GridConfig(gdims=(64, 64, 64), pdims=(2, 2))
    w = G.transpose_workspace_size(cfg)
    # each pencil is 64*32*32 = 65536 elements; aligned + other pencil
    assert w == G._align_count(65536) + 65536
    hw = G.halo_workspace_size(cfg, 0, (1, 1, 1))
    assert hw % 4 == 0 and hw > 0


def test_pdim_candidates():
    assert G.pdim_candidates(8) == ((1, 8), (2, 4), (4, 2), (8, 1))
    assert G.pdim_candidates(7) == ((1, 7), (7, 1))


def test_empty_pencil_shapes():
    cfg = GridConfig(gdims=(2, 2, 8), pdims=(4, 1))
    p = G.get_pencil_info(cfg, 0, (3, 0))
    assert p.shape[1] == 0 and p.size == 0
