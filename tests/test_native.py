"""Native C++ geometry core — bit-identical parity with the Python
implementation over randomized configurations (the Python layer is the
oracle; csrc/cudecomp_core.cpp is the native path)."""

import numpy as np
import pytest

from cudecomp_tpu import geometry as G
from cudecomp_tpu.config import GridConfig, RankOrder
from cudecomp_tpu.utils import native

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="native core unavailable (no g++?)")

RNG = np.random.default_rng(99)


def test_splits_parity():
    for _ in range(200):
        n = int(RNG.integers(1, 500))
        p = int(RNG.integers(1, 17))
        excess = int(RNG.integers(0, 5))
        assert native.get_splits(n, p, excess) == G.get_splits(n, p, excess)
        assert native.get_split_offsets(n, p) == G.get_split_offsets(n, p)


def _random_cfg():
    pd = (int(RNG.integers(1, 5)), int(RNG.integers(1, 5)))
    gd = tuple(int(RNG.integers(max(pd) * 1, 40)) for _ in range(3))
    kw = {}
    if RNG.random() < 0.3:
        kw["gdims_dist"] = tuple(max(1, g - int(RNG.integers(0, 3)))
                                 for g in gd)
    if RNG.random() < 0.5:
        kw["transpose_axis_contiguous"] = tuple(bool(RNG.integers(0, 2))
                                                for _ in range(3))
    return GridConfig(gdims=gd, pdims=pd, **kw)


def test_pencil_info_parity():
    for _ in range(100):
        cfg = _random_cfg()
        axis = int(RNG.integers(0, 3))
        pr = int(RNG.integers(0, cfg.pdims[0]))
        pc = int(RNG.integers(0, cfg.pdims[1]))
        halo = tuple(int(RNG.integers(0, 3)) for _ in range(3))
        pad = tuple(int(RNG.integers(0, 3)) for _ in range(3))
        py = G.get_pencil_info(cfg, axis, (pr, pc), halo, pad)
        nat = native.pencil_info(cfg.gdims, cfg.effective_gdims_dist,
                                 cfg.pdims, cfg.mem_order(axis), axis, pr, pc,
                                 halo, pad)
        assert nat == (py.shape, py.lo, py.hi, py.size), (cfg, axis, pr, pc)


def test_shifted_rank_parity():
    for _ in range(300):
        cfg = _random_cfg()
        order_code = 0
        if RNG.random() < 0.5:
            cfg = GridConfig(gdims=cfg.gdims, pdims=cfg.pdims,
                             rank_order=RankOrder.COL_MAJOR)
            order_code = 1
        nranks = cfg.pdims[0] * cfg.pdims[1]
        axis = int(RNG.integers(0, 3))
        dim = int(RNG.integers(0, 3))
        disp = int(RNG.integers(-3, 4))
        periodic = bool(RNG.integers(0, 2))
        rank = int(RNG.integers(0, nranks))
        py = G.get_shifted_rank(cfg, axis, dim, disp, periodic, rank)
        nat = native.shifted_rank(cfg.pdims, order_code, axis, dim, disp,
                                  periodic, rank)
        assert nat == py, (cfg.pdims, order_code, axis, dim, disp, periodic,
                           rank)


def test_native_invalid_args():
    with pytest.raises(ValueError):
        native.shifted_rank((2, 2), 0, 5, 0, 1, True, 0)
