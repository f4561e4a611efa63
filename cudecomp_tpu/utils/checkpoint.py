"""Checkpoint/restore for distributed pencil fields.

The reference has no checkpointing (SURVEY §5: "checkpoint/resume: none");
applications were expected to persist tuned configs themselves.  Here the
functional model makes state persistence trivial, so the rebuild provides
it: a pencil buffer round-trips through a directory of ``.npy`` shards —
one per process-grid coordinate, written from *addressable* shards only, so
saving works on multi-controller (multi-host) meshes where no process can
see every shard.  Loading re-assembles each target shard from whichever
saved files overlap its region (memory-mapped, so no host ever
materializes the global array), which also makes restore onto a different
``pdims``/mesh layout work.  Autotuned configs persist separately via
``AutotuneResult.save_json`` / ``autotune.load_tuned_config``.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax

from cudecomp_tpu import geometry
from cudecomp_tpu.geometry import _check_extents


def _coords_of_shard_index(grid, axis, index, local_shape):
    from cudecomp_tpu.utils.arrays import coords_of_shard_index
    return coords_of_shard_index(grid, axis, index, local_shape)


def save_pencil(path: str, grid, arr, axis: int, halo_extents=None,
                padding=None):
    """Persist a pencil buffer: one ``.npy`` interior shard per process-grid
    coordinate (written by whichever process can address it) + metadata.

    Shards are stored in natural global-axis order with halos/padding/
    pad-to-max stripped, so a checkpoint can be restored onto any layout.
    """
    cfg = grid.config
    halo = _check_extents(halo_extents, "halo_extents")
    pad = _check_extents(padding, "padding")
    order = cfg.mem_order(axis)
    local_shape = geometry.pencil_buffer_shape(cfg, axis, halo, pad)
    os.makedirs(path, exist_ok=True)

    for shard in arr.addressable_shards:
        # on meshes with extra axes (training-mesh embedding) the pencil
        # array is REPLICATED over those axes: multiple processes hold
        # the same (pr, pc) shard and would race-write one file — only
        # the first replica writes
        if getattr(shard, "replica_id", 0) != 0:
            continue
        pr, pc = _coords_of_shard_index(grid, axis, shard.index, local_shape)
        pinfo = geometry.get_pencil_info(cfg, axis, (pr, pc), halo, pad)
        data = np.asarray(jax.device_get(shard.data))
        sl = []
        for i in range(3):
            g = order[i]
            h = halo[g]
            valid = pinfo.hi_g[g] - pinfo.lo_g[g] + 1
            sl.append(slice(h, h + valid))
        interior = data[tuple(sl) + (Ellipsis,)]
        # store in natural global order (component dims trail)
        perm = [order.index(g) for g in range(3)]
        perm += list(range(3, interior.ndim))
        np.save(os.path.join(path, f"shard_{pr}_{pc}.npy"),
                np.transpose(interior, axes=perm))

    multi = jax.process_count() > 1
    if multi:
        # all shard files must exist on shared storage before meta.json is
        # written: meta.json is the checkpoint's commit record (readers open
        # it first), so ordering shards -> barrier -> meta -> barrier makes
        # the checkpoint complete when save_pencil returns on ANY process
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("cudecomp_tpu_ckpt_shards")

    if jax.process_index() == 0:
        meta = {
            "gdims": list(cfg.gdims),
            "axis": axis,
            "pdims": list(cfg.pdims),
            "gdims_dist": (list(cfg.gdims_dist)
                           if cfg.gdims_dist is not None else None),
            "halo_extents": list(halo),
            "padding": list(pad),
            "dtype": str(np.dtype(arr.dtype)),
        }
        tmp = os.path.join(path, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2)
        os.replace(tmp, os.path.join(path, "meta.json"))

    if multi:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("cudecomp_tpu_ckpt_meta")


class _ShardReader:
    """Assembles arbitrary global index selections from saved shard files
    (memory-mapped: only the requested regions are read)."""

    def __init__(self, path: str, meta: dict):
        self.path = path
        from cudecomp_tpu.config import GridConfig
        self.cfg = GridConfig(gdims=tuple(meta["gdims"]),
                              pdims=tuple(meta["pdims"]),
                              gdims_dist=(tuple(meta["gdims_dist"])
                                          if meta.get("gdims_dist") else None))
        self.axis = meta["axis"]
        self._files = {}

    def _block(self, pr, pc):
        key = (pr, pc)
        if key not in self._files:
            f = os.path.join(self.path, f"shard_{pr}_{pc}.npy")
            self._files[key] = np.load(f, mmap_mode="r")
        return self._files[key]

    @property
    def comp_shape(self):
        """Trailing component dims of the saved field (e.g. split-complex)."""
        return self._block(0, 0).shape[3:]

    def gather(self, idx_lists, comp_shape=(), dtype=np.float64):
        """Global-order block for per-dim integer index lists."""
        out = np.zeros(tuple(len(ix) for ix in idx_lists) + tuple(comp_shape),
                       dtype=dtype)
        idx_arrays = [np.asarray(ix) for ix in idx_lists]
        for pr in range(self.cfg.pdims[0]):
            for pc in range(self.cfg.pdims[1]):
                pinfo = geometry.get_pencil_info(self.cfg, self.axis,
                                                 (pr, pc))
                sels, srcs = [], []
                empty = False
                for d in range(3):
                    lo, hi = pinfo.lo_g[d], pinfo.hi_g[d]
                    sel = np.nonzero((idx_arrays[d] >= lo)
                                     & (idx_arrays[d] <= hi))[0]
                    if sel.size == 0:
                        empty = True
                        break
                    sels.append(sel)
                    srcs.append(idx_arrays[d][sel] - lo)
                if empty:
                    continue
                block = self._block(pr, pc)
                out[np.ix_(*sels)] = block[np.ix_(*srcs)]
        return out


def load_pencil(path: str, grid, axis: int = None, halo_extents=None,
                padding=None, fill_halos: bool = False):
    """Restore a pencil buffer saved by :func:`save_pencil` onto ``grid``
    (which may have different pdims/mesh/layout than at save time).  Each
    target shard is assembled from only the overlapping saved shard files."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if tuple(meta["gdims"]) != grid.config.gdims:
        raise ValueError(f"checkpoint gdims {meta['gdims']} != grid gdims "
                         f"{grid.config.gdims}")
    axis = meta["axis"] if axis is None else axis
    he = tuple(halo_extents if halo_extents is not None
               else meta["halo_extents"])
    pad = tuple(padding if padding is not None else meta["padding"])
    dtype = np.dtype(meta["dtype"])

    cfg = grid.config
    halo = _check_extents(he, "halo_extents")
    pad = _check_extents(pad, "padding")
    order = cfg.mem_order(axis)
    ms = geometry.max_splits(cfg, axis)
    local_shape = geometry.pencil_buffer_shape(cfg, axis, halo, pad)
    reader = _ShardReader(path, meta)

    comp_shape = reader.comp_shape

    def make_shard(pr, pc):
        pinfo = geometry.get_pencil_info(cfg, axis, (pr, pc), halo, pad)
        buf = np.zeros(tuple(local_shape) + comp_shape, dtype=dtype)
        pos_lists, idx_lists = [], []
        for g in range(3):  # global-axis order
            h = halo[g]
            n = cfg.gdims[g]
            lo = pinfo.lo_g[g]
            valid = pinfo.hi_g[g] - lo + 1
            if fill_halos and h > 0:
                pos = (list(range(0, h)) + list(range(h, h + valid))
                       + list(range(h + ms[g], h + ms[g] + h)))
                idx = ([(lo - h + k) % n for k in range(h)]
                       + [lo + k for k in range(valid)]
                       + [(lo + valid + k) % n for k in range(h)])
            else:
                pos = list(range(h, h + valid))
                idx = list(range(lo, lo + valid))
            pos_lists.append(pos)
            idx_lists.append(idx)
        src = reader.gather(idx_lists, comp_shape=comp_shape,
                            dtype=dtype)             # global order
        perm = list(order) + list(range(3, 3 + len(comp_shape)))
        src = np.transpose(src, axes=perm)           # to memory order
        buf[np.ix_(*[pos_lists[g] for g in order])] = src
        return buf

    sharding = grid.sharding(axis)
    gshape = tuple(geometry.global_buffer_shape(cfg, axis, halo, pad)
                   ) + comp_shape

    def cb(index):
        coords = _coords_of_shard_index(grid, axis, index, local_shape)
        return make_shard(coords[0], coords[1])

    return jax.make_array_from_callback(gshape, sharding, cb)
