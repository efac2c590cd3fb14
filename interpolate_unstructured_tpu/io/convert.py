"""Mesh ingestion: any supported mesh file -> binda container.

Replaces the reference's converter subprocess
(``convert_to_binary.py`` invoked via ``execute_command_line``,
m_interp_unstructured.f90:788-818) with an in-process library call.

Capability parity with convert_to_binary.py:
* rejects mixed cell blocks (:187-188)
* triangle/quad faces have 2 points, tetra faces 3 (:190-195)
* neighbor table built after merging duplicate points (:118-162)
* emits entries ``points``/``cells``/``cell_neighbors`` plus repeated
  ``point_data``/``cell_data``/``icell_data`` entries with the variable
  name in the metadata field, commas stripped (:202-224)
* skip-if-up-to-date caching on mtime unless ``force`` (:180-183)

The neighbor computation is vectorized (lexsorted face keys instead of a
Python dict): O(F log F) in numpy instead of a per-face dict loop.
"""

from __future__ import annotations

import os

import numpy as np

from .binda import BindaWriter
from .vtu import Mesh, read_vtu

_N_POINTS_PER_FACE = {"triangle": 2, "quad": 2, "tetra": 3}


def get_cell_neighbors(
    cells: np.ndarray, points: np.ndarray, n_points_face: int
) -> np.ndarray:
    """Face-adjacency table: ``neighbors[i_cell, k]`` is the cell across
    face ``k`` (vertices ``(k, .., k+n_points_face-1)`` cyclic), or -1.

    Mirrors the face convention of convert_to_binary.py:139-162 /
    m_interp_unstructured.f90:327-349: face k of a cell consists of
    vertices ``(cell[(k+j) % n_vertices] for j < n_points_face)``.
    Duplicate points are merged first for robustness (:130-136).
    """
    cells = np.asarray(cells)
    n_cells, n_vertices = cells.shape

    # Merge duplicate points so faces match across duplicated vertices
    _, idx = np.unique(points, axis=0, return_inverse=True)
    cells_uniq = idx.reshape(-1)[cells.reshape(-1)].reshape(cells.shape)

    # Group identical faces with ONE argsort over packed scalar keys; a
    # run of exactly two equal keys links the pair of owner cells
    # (convert_to_binary.py:157; degenerate >2-owner faces stay
    # boundary, like the reference).  Keys are built column-wise with a
    # min/max sorting network — no (C, nv, npf) materialization, no
    # row-wise np.sort (both are scattered-access patterns this path
    # used to spend ~80% of its time in).
    n_unique_points = int(cells_uniq.max(initial=0)) + 1
    if n_points_face in (2, 3) and n_unique_points < (1 << 21):
        keys2d = np.empty((n_cells, n_vertices), dtype=np.int64)
        for f in range(n_vertices):
            a = cells_uniq[:, f].astype(np.int64)
            b = cells_uniq[:, (f + 1) % n_vertices].astype(np.int64)
            if n_points_face == 2:
                lo = np.minimum(a, b)
                hi = np.maximum(a, b)
                keys2d[:, f] = (lo << 21) | hi
            else:
                c = cells_uniq[:, (f + 2) % n_vertices].astype(np.int64)
                lo = np.minimum(np.minimum(a, b), c)
                hi = np.maximum(np.maximum(a, b), c)
                mid = a + b + c - lo - hi
                keys2d[:, f] = (lo << 42) | (mid << 21) | hi
        keys = keys2d.reshape(-1)
    else:
        # Generic fallback: sorted face tuples via a void byte view
        fidx = (
            np.arange(n_vertices)[:, None]
            + np.arange(n_points_face)[None, :]
        ) % n_vertices
        faces = np.sort(
            cells_uniq[:, fidx].reshape(-1, n_points_face), axis=1
        )
        faces_c = np.ascontiguousarray(faces)
        keys = faces_c.view(
            np.dtype((np.void, faces_c.dtype.itemsize * n_points_face))
        ).reshape(-1)

    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    same_next = np.zeros(len(sk), dtype=bool)
    same_next[:-1] = sk[:-1] == sk[1:]
    same_prev = np.zeros(len(sk), dtype=bool)
    same_prev[1:] = same_next[:-1]
    run_continues = np.zeros(len(sk), dtype=bool)  # sk[i+1] == sk[i+2]
    run_continues[:-1] = same_next[1:]
    pos = np.flatnonzero(same_next & ~same_prev & ~run_continues)

    neighbors = np.full((n_cells, n_vertices), -1, dtype=np.int32)
    flat = neighbors.reshape(-1)
    # order[] is the flat (cell * n_vertices + face_k) slot of each face
    slot_a = order[pos]
    slot_b = order[pos + 1]
    flat[slot_a] = slot_b // n_vertices
    flat[slot_b] = slot_a // n_vertices
    return neighbors


def read_mesh(filename) -> Mesh:
    """Read a mesh file. Uses the built-in readers (VTU, legacy VTK,
    Gmsh, MEDIT, TetGen, OFF, PLY, STL, OBJ, XDMF, Exodus II, CGNS,
    ABAQUS, Nastran, AVS-UCD, SU2, FLAC3D, UGRID, Tecplot, Gambit,
    Netgen); falls back to meshio for other formats if it happens to
    be installed."""
    filename = os.fspath(filename)
    ext = os.path.splitext(filename)[1].lower()
    if ext == ".vtu":
        return read_vtu(filename)
    if ext == ".vtk":
        from .vtk_legacy import read_vtk

        return read_vtk(filename)
    if ext == ".msh":
        from .msh import read_msh

        return read_msh(filename)
    if ext in (".xdmf", ".xmf"):
        from .xdmf import read_xdmf

        return read_xdmf(filename)
    if ext in (".e", ".exo", ".ex2"):
        from .exodus import read_exodus

        return read_exodus(filename)
    if ext == ".cgns":
        from .cgns import read_cgns

        return read_cgns(filename)
    if ext == ".inp":
        # .inp is both the ABAQUS deck and the classic AVS-UCD
        # extension: ABAQUS decks start with a '*KEYWORD' line, UCD
        # files with the 5-int header — sniff the first data line
        from . import fem as fem_mod

        with open(filename, encoding="latin-1") as f:
            for ln in f:
                ln = ln.strip()
                if ln and not ln.startswith("#"):
                    break
            else:
                ln = ""
        if ln.startswith("*"):
            return fem_mod.read_abaqus(filename)
        return fem_mod.read_avs(filename)
    fem = {
        ".bdf": "read_nastran",
        ".nas": "read_nastran",
        ".fem": "read_nastran",
        ".avs": "read_avs",
        ".su2": "read_su2",
        ".f3grid": "read_flac3d",
        ".ugrid": "read_ugrid",
        ".dat": "read_tecplot",
        ".tec": "read_tecplot",
        ".neu": "read_gambit",
        ".vol": "read_netgen",
    }
    if ext in fem:
        from . import fem as fem_mod

        return getattr(fem_mod, fem[ext])(filename)
    simple = {
        ".mesh": "read_medit",
        ".node": "read_tetgen",
        ".ele": "read_tetgen",
        ".off": "read_off",
        ".ply": "read_ply",
        ".stl": "read_stl",
        ".obj": "read_obj",
    }
    if ext in simple:
        from . import simple_formats

        return getattr(simple_formats, simple[ext])(filename)
    try:
        import meshio  # noqa: PLC0415
    except ImportError as err:
        raise ValueError(
            f"Cannot read {filename!r}: only .vtu, .vtk, .msh, .mesh, "
            ".node/.ele, .off, .ply, .stl, .obj, .xdmf/.xmf, "
            ".e/.exo/.ex2, .cgns, .inp, .bdf/.nas/.fem, .avs, .su2, "
            ".f3grid, .ugrid, .dat/.tec, .neu and .vol are supported "
            "natively and meshio is not installed"
        ) from err
    from .vtu import CellBlock

    m = meshio.read(filename)
    cells = [
        CellBlock(type=cb.type, data=np.asarray(cb.data)) for cb in m.cells
    ]
    cell_data = {}
    for var, data in m.cell_data.items():
        cell_data[var] = data[0] if isinstance(data, list) else data
    return Mesh(
        points=np.asarray(m.points, dtype=np.float64),
        cells=cells,
        point_data=dict(m.point_data),
        cell_data=cell_data,
    )


def mesh_to_binda_writer(mesh: Mesh) -> BindaWriter:
    """Pack a mesh into a BindaWriter (entry layout of
    convert_to_binary.py:200-224)."""
    if len(mesh.cells) > 1:
        raise ValueError("Mixed cell types not yet implemented")
    block = mesh.cells[0]
    if block.type not in _N_POINTS_PER_FACE:
        raise ValueError(f"Cell type {block.type} not implemented")

    points = np.asarray(mesh.points, dtype=np.float64)
    if points.shape[1] < 3:
        points = np.pad(points, ((0, 0), (0, 3 - points.shape[1])))
    cell_neighbors = get_cell_neighbors(
        block.data, points, _N_POINTS_PER_FACE[block.type]
    )

    w = BindaWriter()
    w.add_entry("points", points)
    w.add_entry("cells", np.asarray(block.data), block.type)
    w.add_entry("cell_neighbors", cell_neighbors)

    for var, data in mesh.point_data.items():
        clean = var.replace(",", "")
        w.add_entry("point_data", np.asarray(data), clean)

    for var, data in mesh.cell_data.items():
        clean = var.replace(",", "")
        data = np.asarray(data[0] if isinstance(data, list) else data)
        if np.issubdtype(data.dtype, np.integer):
            w.add_entry("icell_data", data, clean)
        else:
            w.add_entry("cell_data", data, clean)
    return w


def convert_to_binda(
    infile, output_basename=None, force: bool = False, verbose: bool = False
) -> str:
    """Convert ``infile`` to ``<basename>.binda``; returns the output path.

    Keeps the reference's caching contract: skip when the .binda file is
    newer than the input, unless ``force`` (convert_to_binary.py:180-183).
    If ``infile`` already is a .binda file it is returned unchanged
    (m_interp_unstructured.f90:807).
    """
    infile = os.fspath(infile)
    if output_basename is None:
        output_basename = os.path.splitext(infile)[0]
    fname = output_basename + ".binda"
    if infile == fname:
        return fname
    if (
        not force
        and os.path.exists(fname)
        and os.path.getmtime(fname) >= os.path.getmtime(infile)
    ):
        if verbose:
            print(f"{fname} is up to date (use force=True to overwrite)")
        return fname

    mesh = read_mesh(infile)
    mesh_to_binda_writer(mesh).write_to_file(fname)
    if verbose:
        print(f"Stored {fname}")
    return fname


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description="Convert unstructured grid to binda binary files",
    )
    parser.add_argument("infile", type=str, help="Input file")
    parser.add_argument("-output_basename", type=str, help="Basename for output")
    parser.add_argument(
        "-force",
        action="store_true",
        help="Write .binda file also if it is newer than infile",
    )
    args = parser.parse_args(argv)
    convert_to_binda(
        args.infile, args.output_basename, force=args.force, verbose=True
    )


if __name__ == "__main__":
    main()
