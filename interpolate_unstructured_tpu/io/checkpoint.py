"""Grid checkpointing: save/load a fully preprocessed ``UGrid``.

The reference's only persistence is the ``.binda`` cache of the
*converted* mesh (convert_to_binary.py:180-183) — preprocessing
(normals, volumes, kd-tree) reruns on every load.  Here the whole
preprocessed grid state — including the derived tables (face planes,
packed walk rows, bin seed table) — round-trips through the same binda
container format, so reloading a large grid costs one mmap-style read
instead of minutes of host preprocessing.

The container is self-describing: scalar metadata rides in the entry
metadata strings, data-family names in per-column entries, so the files
remain readable by any binda tool (including the Fortran reader).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .binda import BindaWriter, read_binda

_FORMAT_VERSION = "1"

# UGrid array leaves stored verbatim (name -> attribute)
_ARRAY_FIELDS = [
    "points",
    "cells",
    "neighbors",
    "cell_points",
    "face_normals",
    "face_offsets",
    "cell_volume",
    "point_is_at_boundary",
    "point_data",
    "cell_data",
    "icell_data",
    "rmin",
    "rmax",
    "bin_table",
    "bin_rmin",
    "bin_inv_h",
    "bin_pack",
    "walk_table",
]


def save_grid(grid, filename) -> None:
    """Serialize a preprocessed grid (arrays + registry names +
    static metadata) into a binda container."""
    w = BindaWriter()
    meta = ",".join(
        [
            _FORMAT_VERSION,
            grid.cell_type,
            grid.locate_mode,
            "x".join(str(s) for s in grid.bin_shape),
        ]
    )
    w.add_entry("ugrid_header", np.zeros(1, dtype=np.int32), meta)
    for name in _ARRAY_FIELDS:
        arr = np.asarray(getattr(grid, name))
        if arr.dtype == np.bool_:
            arr = arr.astype(np.int32)
        w.add_entry(f"grid/{name}", arr, str(np.asarray(getattr(grid, name)).dtype))
    for i, nm in enumerate(grid.point_data_names):
        w.add_entry("point_data_name", np.array([i], dtype=np.int32), nm)
    for i, nm in enumerate(grid.cell_data_names):
        w.add_entry("cell_data_name", np.array([i], dtype=np.int32), nm)
    for i, nm in enumerate(grid.icell_data_names):
        w.add_entry("icell_data_name", np.array([i], dtype=np.int32), nm)
    w.write_to_file(filename)


def load_grid(filename, config=None):
    """Reload a grid saved by :func:`save_grid` — no preprocessing."""
    from ..models.grid import UGrid
    from ..utils.config import DEFAULT_CONFIG

    bf = read_binda(filename)
    ix = bf.index("ugrid_header")
    if ix < 0:
        raise ValueError(f"{filename} is not a saved UGrid container")
    version, cell_type, locate_mode, bin_shape_s = bf.entries[ix].metadata.split(",")
    if version != _FORMAT_VERSION:
        raise ValueError(f"Unsupported grid checkpoint version {version}")
    bin_shape = tuple(int(s) for s in bin_shape_s.split("x"))

    arrays = {}
    for i, e in enumerate(bf.entries):
        if e.name.startswith("grid/"):
            arr = bf.read(i)
            orig_dtype = e.metadata
            if orig_dtype == "bool":
                arr = arr.astype(bool)
            arrays[e.name[len("grid/") :]] = jnp.asarray(arr)

    def names_of(kind):
        return tuple(
            bf.entries[i].metadata for i in bf.indices(f"{kind}_name")
        )

    return UGrid(
        **arrays,
        cell_type=cell_type,
        bin_shape=bin_shape,
        point_data_names=names_of("point_data"),
        cell_data_names=names_of("cell_data"),
        icell_data_names=names_of("icell_data"),
        locate_mode=locate_mode,
        config=config or DEFAULT_CONFIG,
    )
