"""Host-side conversion between plain global arrays and the padded-pencil
SPMD format, plus masking helpers.

The padded-pencil format (see ``geometry`` module docstring): every shard is
allocated at the maximum split size; shards owning fewer elements zero-pad
the tail.  Halo regions sit at fixed offsets computed from the *maximum*
extent: along a sharded global axis with halo ``h`` and max split ``m``, a
shard's layout is ``[low halo: 0..h) [interior: h..h+valid) [pad zeros:
h+valid..h+m) [high halo: h+m..h+m+h) [extra padding ...]``.

These helpers are for IO and testing; the hot path never leaves devices.
"""

from __future__ import annotations

import numpy as np
import jax

from cudecomp_tpu import geometry
from cudecomp_tpu.geometry import _check_extents  # reuse validation


def _shard_layout(grid, axis, halo_extents, padding):
    """Static layout info shared by scatter/gather."""
    cfg = grid.config
    halo = _check_extents(halo_extents, "halo_extents")
    pad = _check_extents(padding, "padding")
    order = cfg.mem_order(axis)
    ms = geometry.max_splits(cfg, axis)
    local_shape = geometry.pencil_buffer_shape(cfg, axis, halo, pad)
    return cfg, halo, pad, order, ms, local_shape


def coords_of_shard_index(grid, axis, index, local_shape):
    """Recover (pr, pc) process-grid coordinates from a shard's global
    index (tuple of slices into the padded global buffer).  The ONE
    implementation of the layout inversion used by scatter/gather,
    checkpointing, and the test oracles."""
    order = grid.config.mem_order(axis)
    coords = [0, 0]
    for i in range(3):
        g = order[i]
        pd = geometry.shard_pdim_of_dim(axis, g)
        if pd is not None:
            start = index[i].start or 0
            coords[pd] = start // local_shape[i]
    return tuple(coords)


def scatter_global(grid, x_global, axis: int, halo_extents=None, padding=None,
                   fill_halos: bool = False):
    """Distribute a host/global array (natural [X, Y, Z] order, shape
    ``gdims``) into the padded-pencil SPMD format for pencil ``axis``.

    Returns a committed ``jax.Array`` with the pencil's NamedSharding.
    With ``fill_halos=True``, halo regions are pre-filled with the correct
    (periodic) global data instead of zeros.
    """
    cfg, halo, pad, order, ms, local_shape = _shard_layout(
        grid, axis, halo_extents, padding)
    x_global = np.asarray(x_global)
    if tuple(x_global.shape) != cfg.gdims:
        raise ValueError(f"global array shape {x_global.shape} != gdims {cfg.gdims}")

    def make_shard(pr, pc):
        pinfo = geometry.get_pencil_info(cfg, axis, (pr, pc), halo, pad)
        buf = np.zeros(local_shape, dtype=x_global.dtype)
        lo_g, hi_g = pinfo.lo_g, pinfo.hi_g
        # region in the buffer where the interior lives (memory order)
        sl_buf = []
        sl_src_g = [None, None, None]  # indexed by global axis
        for i in range(3):
            g = order[i]
            h = halo[g]
            valid = hi_g[g] - lo_g[g] + 1
            sl_buf.append(slice(h, h + valid))
            sl_src_g[g] = slice(lo_g[g], lo_g[g] + valid)
        src = x_global[tuple(sl_src_g)]
        buf[tuple(sl_buf)] = np.transpose(src, axes=order)
        if fill_halos:
            _fill_halos_host(buf, x_global, cfg, axis, pinfo, halo, ms, order)
        return buf

    sharding = grid.sharding(axis)
    gshape = geometry.global_buffer_shape(cfg, axis, halo, pad)

    def cb(index):
        coords = coords_of_shard_index(grid, axis, index, local_shape)
        return make_shard(coords[0], coords[1])

    return jax.make_array_from_callback(gshape, sharding, cb)


def _fill_halos_host(buf, x_global, cfg, axis, pinfo, halo, ms, order):
    """Fill halo regions (incl. corners) with periodic global data.

    Builds per-array-dim (buffer position, global index) lists covering the
    low halo, interior, and high halo (the dead zone between ``valid`` and
    the max split stays zero), then assigns via one ``np.ix_`` gather.
    """
    lo_g, hi_g = pinfo.lo_g, pinfo.hi_g
    pos_lists, idx_lists_g = [], {}
    for i in range(3):
        g = order[i]
        h = halo[g]
        n = cfg.gdims[g]
        lo = lo_g[g]
        valid = hi_g[g] - lo + 1
        pos = (list(range(0, h))                       # low halo
               + list(range(h, h + valid))             # interior
               + list(range(h + ms[g], h + ms[g] + h)))  # high halo
        idx = ([(lo - h + k) % n for k in range(h)]
               + [lo + k for k in range(valid)]
               + [(lo + valid + k) % n for k in range(h)])
        pos_lists.append(pos)
        idx_lists_g[g] = idx
    src = x_global[np.ix_(idx_lists_g[0], idx_lists_g[1], idx_lists_g[2])]
    # reorder global dims into memory order
    src = np.transpose(src, axes=order)
    buf[np.ix_(*pos_lists)] = src


def gather_global(grid, arr, axis: int, halo_extents=None, padding=None):
    """Reassemble a padded-pencil SPMD array into a plain global numpy array
    (natural [X, Y, Z] order, shape ``gdims``).  Halo/padding regions are
    dropped."""
    cfg, halo, pad, order, ms, local_shape = _shard_layout(
        grid, axis, halo_extents, padding)
    if jax.process_count() > 1:
        raise ValueError(
            "gather_global materializes the full global array and needs a "
            "single-controller runtime; on multi-controller deployments "
            "use checkpoint.save_pencil/load_pencil or iterate "
            "arr.addressable_shards")
    comp_shape = tuple(arr.shape[3:])
    out = np.zeros(cfg.gdims + comp_shape, dtype=arr.dtype)
    # per-shard device_get: peak host memory is one shard, not the whole
    # padded global buffer
    for shard in arr.addressable_shards:
        if getattr(shard, "replica_id", 0) != 0:
            continue
        pr, pc = coords_of_shard_index(grid, axis, shard.index, local_shape)
        pinfo = geometry.get_pencil_info(cfg, axis, (pr, pc), halo, pad)
        lo_g, hi_g = pinfo.lo_g, pinfo.hi_g
        data = np.asarray(jax.device_get(shard.data))
        sl_buf, sl_dst_g = [], [None] * 3
        for i in range(3):
            g = order[i]
            h = halo[g]
            valid = hi_g[g] - lo_g[g] + 1
            sl_buf.append(slice(h, h + valid))
            sl_dst_g[g] = slice(lo_g[g], lo_g[g] + valid)
        # data dims are in memory order; out dims in global order
        block = data[tuple(sl_buf) + (Ellipsis,)]
        perm = ([order.index(g) for g in range(3)]
                + list(range(3, 3 + len(comp_shape))))
        out[tuple(sl_dst_g) + (Ellipsis,)] = np.transpose(block, axes=perm)
    return out


def valid_interior_mask(grid, axis: int, halo_extents=None, padding=None):
    """Boolean host array in the padded global layout: True on interior valid
    elements, False on padding/halo.  For masked reductions and tests."""
    cfg, halo, pad, order, ms, local_shape = _shard_layout(
        grid, axis, halo_extents, padding)
    gshape = geometry.global_buffer_shape(cfg, axis, halo, pad)
    mask = np.zeros(gshape, dtype=bool)
    pr_n, pc_n = cfg.pdims
    for pr in range(pr_n):
        for pc in range(pc_n):
            pinfo = geometry.get_pencil_info(cfg, axis, (pr, pc), halo, pad)
            sl = []
            for i in range(3):
                g = order[i]
                pd = geometry.shard_pdim_of_dim(axis, g)
                shard_idx = (pr, pc)[pd] if pd is not None else 0
                base = shard_idx * local_shape[i]
                h = halo[g]
                valid = pinfo.hi_g[g] - pinfo.lo_g[g] + 1
                sl.append(slice(base + h, base + h + valid))
            mask[tuple(sl)] = True
    return mask
