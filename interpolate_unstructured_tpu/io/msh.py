"""Native Gmsh ``.msh`` reader (ASCII, format versions 2.2 and 4.1).

Closes the mesh-ingestion gap left by the absent meshio dependency: the
reference converts *any* meshio-supported format
(convert_to_binary.py:185); natively this package reads ``.vtu``
(io/vtu.py) and — with this module — Gmsh's own format, the other
de-facto standard for unstructured grids.

Supported content:
* ``$Nodes`` / ``$Elements`` in MSH 2.2 and 4.1 ASCII layouts;
* element types 2 (triangle), 3 (quad), 4 (tetrahedron) — the cell
  types of the framework; points/lines (boundary markup) are skipped;
* ``$NodeData`` / ``$ElementData`` scalar fields -> point/cell data
  (the Gmsh analogue of the VTU ``PointData``/``CellData`` the
  converter forwards, convert_to_binary.py:202-224).

By default only the highest-dimensional element blocks are kept:
Gmsh files routinely carry boundary faces alongside volume cells, and
those faces are markup, not cells (a mixed same-dimension file still
fails downstream with the reference's mixed-cell-types error,
convert_to_binary.py:187-188).
"""

from __future__ import annotations

import numpy as np

from .vtu import CellBlock, Mesh

# Gmsh element type id -> (our cell type, n_nodes, dimension)
_GMSH_CELL_TYPES = {
    2: ("triangle", 3, 2),
    3: ("quad", 4, 2),
    4: ("tetra", 4, 3),
}


def _section_lines(lines, start, name):
    """Lines of a $name section, and the index after $EndName."""
    end = f"$End{name}"
    out = []
    i = start
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if line == end:
            return out, i
        out.append(line)
    raise ValueError(f"Unterminated ${name} section in .msh file")


def _parse_nodes_v2(body):
    n = int(body[0])
    ids = np.empty(n, dtype=np.int64)
    pts = np.empty((n, 3), dtype=np.float64)
    for k in range(n):
        parts = body[1 + k].split()
        ids[k] = int(parts[0])
        pts[k] = [float(parts[1]), float(parts[2]), float(parts[3])]
    return ids, pts


def _parse_nodes_v4(body):
    num_blocks = int(body[0].split()[0])
    ids_all, pts_all = [], []
    i = 1
    for _ in range(num_blocks):
        _, _, parametric, n_in_block = (int(x) for x in body[i].split())
        if parametric:
            raise ValueError("Parametric nodes are not supported")
        i += 1
        ids = np.array(
            [int(body[i + k]) for k in range(n_in_block)], dtype=np.int64
        )
        i += n_in_block
        pts = np.array(
            [
                [float(x) for x in body[i + k].split()[:3]]
                for k in range(n_in_block)
            ],
            dtype=np.float64,
        ).reshape(n_in_block, 3)
        i += n_in_block
        ids_all.append(ids)
        pts_all.append(pts)
    if not ids_all:
        return np.empty(0, np.int64), np.empty((0, 3), np.float64)
    return np.concatenate(ids_all), np.concatenate(pts_all)


def _parse_elements_v2(body):
    """-> {cell_type: (elem_tags, connectivity-with-gmsh-node-ids)}."""
    n = int(body[0])
    blocks = {}
    for k in range(n):
        parts = body[1 + k].split()
        etype = int(parts[1])
        if etype not in _GMSH_CELL_TYPES:
            continue
        cell_type, n_nodes, _ = _GMSH_CELL_TYPES[etype]
        n_tags = int(parts[2])
        nodes = [int(x) for x in parts[3 + n_tags : 3 + n_tags + n_nodes]]
        tags, conn = blocks.setdefault(cell_type, ([], []))
        tags.append(int(parts[0]))
        conn.append(nodes)
    return blocks


def _parse_elements_v4(body):
    num_blocks = int(body[0].split()[0])
    blocks = {}
    i = 1
    for _ in range(num_blocks):
        _, _, etype, n_in_block = (int(x) for x in body[i].split())
        i += 1
        if etype not in _GMSH_CELL_TYPES:
            i += n_in_block
            continue
        cell_type, n_nodes, _ = _GMSH_CELL_TYPES[etype]
        tags, conn = blocks.setdefault(cell_type, ([], []))
        for k in range(n_in_block):
            parts = body[i + k].split()
            tags.append(int(parts[0]))
            conn.append([int(x) for x in parts[1 : 1 + n_nodes]])
        i += n_in_block
    return blocks


def _parse_data_section(body):
    """$NodeData / $ElementData -> (name, {gmsh_tag: value}).

    Only scalar single-timestep fields are ingested (numComponents
    must be 1); others raise so data is never silently dropped.
    """
    i = 0
    n_str = int(body[i])
    i += 1
    name = body[i].strip().strip('"') if n_str > 0 else "unnamed"
    i += n_str
    n_real = int(body[i])
    i += 1 + n_real
    n_int = int(body[i])
    i += 1
    int_tags = [int(body[i + k]) for k in range(n_int)]
    i += n_int
    n_comp = int_tags[1] if len(int_tags) > 1 else 1
    n_vals = int_tags[2] if len(int_tags) > 2 else 0
    if n_comp != 1:
        raise ValueError(
            f"Only scalar data supported; field {name!r} has "
            f"{n_comp} components"
        )
    tags = np.empty(n_vals, dtype=np.int64)
    vals = np.empty(n_vals, dtype=np.float64)
    for k in range(n_vals):
        parts = body[i + k].split()
        tags[k] = int(parts[0])
        vals[k] = float(parts[1])
    return name, tags, vals


def read_msh(filename, only_max_dim: bool = True) -> Mesh:
    """Parse a Gmsh ASCII .msh file into a Mesh.

    Args:
      filename: path to a MSH 2.2 or 4.1 ASCII file.
      only_max_dim: drop element blocks of lower dimension than the
        highest present (boundary faces/edges); set False to keep all
        supported blocks (a mixed result then fails at conversion like
        the reference, convert_to_binary.py:187-188).
    """
    with open(filename) as f:
        lines = f.read().splitlines()

    version = None
    node_ids = points = None
    elem_blocks = {}
    node_data_raw, elem_data_raw = [], []

    i = 0
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if not line.startswith("$") or line.startswith("$End"):
            continue
        name = line[1:]
        body, i = _section_lines(lines, i, name)
        if name == "MeshFormat":
            parts = body[0].split()
            version = float(parts[0])
            if int(parts[1]) != 0:
                raise ValueError("Binary .msh files are not supported")
            if not (2.0 <= version < 3.0 or 4.0 <= version < 5.0):
                raise ValueError(f"Unsupported .msh version {parts[0]}")
        elif name == "Nodes":
            if version is None:
                raise ValueError("$Nodes before $MeshFormat")
            node_ids, points = (
                _parse_nodes_v2(body) if version < 3 else _parse_nodes_v4(body)
            )
        elif name == "Elements":
            elem_blocks = (
                _parse_elements_v2(body)
                if version < 3
                else _parse_elements_v4(body)
            )
        elif name == "NodeData":
            node_data_raw.append(_parse_data_section(body))
        elif name == "ElementData":
            elem_data_raw.append(_parse_data_section(body))
        # other sections ($PhysicalNames, $Entities, ...) are skipped

    if points is None:
        raise ValueError(f"{filename!r} has no $Nodes section")
    if not elem_blocks:
        raise ValueError(f"{filename!r} has no supported cells")

    # Gmsh node tags are arbitrary (often but not always 1..n): map to rows
    id_to_row = {int(t): k for k, t in enumerate(node_ids)}

    if only_max_dim:
        max_dim = max(
            dim
            for ct, _, dim in _GMSH_CELL_TYPES.values()
            if ct in elem_blocks
        )
        elem_blocks = {
            ct: v
            for ct, v in elem_blocks.items()
            if _dim_of(ct) == max_dim
        }

    cells = []
    elem_tag_to_cell = {}  # gmsh element tag -> (block order, row)
    for ct, (tags, conn) in elem_blocks.items():
        data = np.array(
            [[id_to_row[t] for t in row] for row in conn], dtype=np.int64
        )
        for row, tag in enumerate(tags):
            elem_tag_to_cell[tag] = row
        cells.append(CellBlock(type=ct, data=data))

    point_data = {}
    for name, tags, vals in node_data_raw:
        col = np.zeros(len(points), dtype=np.float64)
        rows = np.array([id_to_row[int(t)] for t in tags], dtype=np.int64)
        col[rows] = vals
        point_data[name] = col

    cell_data = {}
    if elem_data_raw and len(cells) == 1:
        n_cells = len(cells[0].data)
        for name, tags, vals in elem_data_raw:
            col = np.zeros(n_cells, dtype=np.float64)
            for t, v in zip(tags, vals):
                row = elem_tag_to_cell.get(int(t))
                if row is not None:
                    col[row] = v
            cell_data[name] = col

    return Mesh(
        points=points, cells=cells, point_data=point_data, cell_data=cell_data
    )


def _dim_of(cell_type: str) -> int:
    for ct, _, dim in _GMSH_CELL_TYPES.values():
        if ct == cell_type:
            return dim
    raise KeyError(cell_type)
