"""Test oracles — the global-linear-index pattern of the reference suite.

The reference initializes each pencil element to its *global linear index*
and checks outputs against analytically computed expected pencils
(``tests/ctest/transpose_tests.cc:333-378`` initializePencil/pencilMatches).
Here the equivalent oracle is expressed at the global level: scatter a
global array whose value encodes its own (x, y, z) coordinates, run ops,
gather every intermediate pencil, and require it to equal the original —
plus direct per-shard checks against :class:`PencilInfo` to keep the
scatter/gather pair honest.
"""

from __future__ import annotations

import numpy as np

from cudecomp_tpu import geometry


def global_index_field(gdims, dtype=np.float64):
    """Global array with value == global linear index (x-major)."""
    n = int(np.prod(gdims))
    return np.arange(n, dtype=dtype).reshape(gdims)


def check_shards_match_pencil(grid, arr, axis, x_global, halo_extents=None,
                              padding=None):
    """Verify each addressable shard's interior against PencilInfo directly
    (independent of gather_global)."""
    cfg = grid.config
    order = cfg.mem_order(axis)
    halo = geometry._check_extents(halo_extents, "halo_extents")
    pad = geometry._check_extents(padding, "padding")
    ms = geometry.max_splits(cfg, axis)
    local_shape = geometry.pencil_buffer_shape(cfg, axis, halo, pad)
    from cudecomp_tpu.utils.arrays import coords_of_shard_index
    for shard in arr.addressable_shards:
        coords = coords_of_shard_index(grid, axis, shard.index, local_shape)
        pinfo = geometry.get_pencil_info(cfg, axis, tuple(coords), halo, pad)
        data = np.asarray(shard.data)
        lo_g, hi_g = pinfo.lo_g, pinfo.hi_g
        sl_buf, sl_src = [], []
        for i in range(3):
            g = order[i]
            h = halo[g]
            valid = hi_g[g] - lo_g[g] + 1
            sl_buf.append(slice(h, h + valid))
            sl_src.append(slice(lo_g[g], lo_g[g] + valid))
        expected = np.transpose(x_global[tuple(sl_src[i] for i in
                                               np.argsort(order))], axes=order)
        got = data[tuple(sl_buf)]
        np.testing.assert_allclose(got, expected, rtol=0, atol=0,
                                   err_msg=f"shard at coords {coords} axis {axis}")


def expected_halo_buffer(grid, axis, x_global, halo_extents, halo_periods,
                         dims, padding=None):
    """Host-computed expected buffer after halo updates along ``dims``:
    interior plus halo faces filled from (periodic) global data; non-periodic
    boundary halos stay zero (their original scatter-time content)."""
    cfg = grid.config
    halo = geometry._check_extents(halo_extents, "halo_extents")
    pad = geometry._check_extents(padding, "padding")
    order = cfg.mem_order(axis)
    ms = geometry.max_splits(cfg, axis)
    local_shape = geometry.pencil_buffer_shape(cfg, axis, halo, pad)
    gshape = geometry.global_buffer_shape(cfg, axis, halo, pad)
    out = np.zeros(gshape, dtype=x_global.dtype)
    pr_n, pc_n = cfg.pdims
    for pr in range(pr_n):
        for pc in range(pc_n):
            pinfo = geometry.get_pencil_info(cfg, axis, (pr, pc), halo, pad)
            buf = np.zeros(local_shape, dtype=x_global.dtype)
            _fill_expected(buf, x_global, cfg, axis, pinfo, halo, ms, order,
                           halo_periods, dims, (pr, pc))
            base = []
            for i in range(3):
                g = order[i]
                pd = geometry.shard_pdim_of_dim(axis, g)
                shard_idx = (pr, pc)[pd] if pd is not None else 0
                base.append(slice(shard_idx * local_shape[i],
                                  (shard_idx + 1) * local_shape[i]))
            out[tuple(base)] = buf
    return out


def _fill_expected(buf, x_global, cfg, axis, pinfo, halo, ms, order,
                   halo_periods, dims, coords):
    lo_g, hi_g = pinfo.lo_g, pinfo.hi_g
    pos_lists, idx_lists = [], []
    for i in range(3):
        g = order[i]
        h = halo[g]
        n = cfg.gdims[g]
        lo = lo_g[g]
        valid = hi_g[g] - lo + 1
        pos = list(range(h, h + valid))
        idx = [lo + k for k in range(valid)]
        if g in dims and h > 0:
            periodic = halo_periods[g]
            pd = geometry.shard_pdim_of_dim(axis, g)
            pcoord = coords[pd] if pd is not None else 0
            pn = cfg.pdims[pd] if pd is not None else 1
            has_left = periodic or pcoord > 0
            has_right = periodic or pcoord < pn - 1
            if has_left:
                pos = list(range(0, h)) + pos
                idx = [(lo - h + k) % n for k in range(h)] + idx
            if has_right:
                pos = pos + list(range(h + ms[g], h + ms[g] + h))
                idx = idx + [(lo + valid + k) % n for k in range(h)]
        pos_lists.append(pos)
        idx_lists.append(idx)
    # gather from global (global-axis order), then put dims into memory order
    g_idx = [None, None, None]
    for i in range(3):
        g_idx[order[i]] = idx_lists[i]
    src = x_global[np.ix_(*g_idx)]
    src = np.transpose(src, axes=order)
    buf[np.ix_(*pos_lists)] = src
