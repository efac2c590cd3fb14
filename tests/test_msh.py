"""Native Gmsh .msh reader: v2.2 and v4.1 ASCII, through the full
read_grid pipeline (parity target: the reference's any-meshio-format
conversion contract, convert_to_binary.py:185)."""

import numpy as np
import pytest

from interpolate_unstructured_tpu.io.msh import read_msh

# Unit square split into two triangles; Polynomial = x + y + 1.
# Includes boundary line elements (type 1) that the reader must skip.
MSH_V2 = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
4
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
$EndNodes
$Elements
6
1 1 2 0 1 1 2
2 1 2 0 1 2 3
3 1 2 0 1 3 4
4 1 2 0 1 4 1
5 2 2 0 1 1 2 3
6 2 2 0 1 1 3 4
$EndElements
$NodeData
1
"Polynomial"
1
0.0
3
0
1
4
1 1.0
2 2.0
3 3.0
4 2.0
$EndNodeData
"""

MSH_V4 = """$MeshFormat
4.1 0 8
$EndMeshFormat
$Entities
0 0 1 0
1 0 0 0 1 1 0 0 0
$EndEntities
$Nodes
1 4 1 4
2 1 0 4
1
2
3
4
0 0 0
1 0 0
1 1 0
0 1 0
$EndNodes
$Elements
2 6 1 6
1 1 1 4
1 1 2
2 2 3
3 3 4
4 4 1
2 1 2 2
5 1 2 3
6 1 3 4
$EndElements
$NodeData
1
"Polynomial"
1
0.0
3
0
1
4
1 1.0
2 2.0
3 3.0
4 2.0
$EndNodeData
"""

# One tet plus its four boundary triangles: only_max_dim keeps the tet.
MSH_TET = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
4
1 0 0 0
2 1 0 0
3 0 1 0
4 0 0 1
$EndNodes
$Elements
5
1 2 2 0 1 1 2 3
2 2 2 0 1 1 2 4
3 2 2 0 1 2 3 4
4 2 2 0 1 1 3 4
5 4 2 0 1 1 2 3 4
$EndElements
$ElementData
1
"rho"
1
0.0
3
0
1
1
5 7.5
$EndElementData
"""


@pytest.mark.parametrize("text,label", [(MSH_V2, "v2"), (MSH_V4, "v4")])
def test_read_msh_triangles(tmp_path, text, label):
    fn = tmp_path / f"square_{label}.msh"
    fn.write_text(text)
    m = read_msh(fn)
    assert len(m.cells) == 1
    assert m.cells[0].type == "triangle"
    np.testing.assert_array_equal(
        m.cells[0].data, [[0, 1, 2], [0, 2, 3]]
    )
    np.testing.assert_allclose(
        m.points, [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]
    )
    np.testing.assert_allclose(m.point_data["Polynomial"], [1, 2, 3, 2])


def test_read_msh_tet_drops_boundary_faces(tmp_path):
    fn = tmp_path / "tet.msh"
    fn.write_text(MSH_TET)
    m = read_msh(fn)
    assert [cb.type for cb in m.cells] == ["tetra"]
    np.testing.assert_array_equal(m.cells[0].data, [[0, 1, 2, 3]])
    np.testing.assert_allclose(m.cell_data["rho"], [7.5])

    # Keeping every block reproduces the reference's mixed-type rejection
    m_all = read_msh(fn, only_max_dim=False)
    assert sorted(cb.type for cb in m_all.cells) == ["tetra", "triangle"]


def test_read_grid_from_msh(tmp_path):
    """End to end: .msh -> binda conversion -> grid -> interpolation."""
    import jax.numpy as jnp
    import interpolate_unstructured_tpu as iu

    fn = tmp_path / "square.msh"
    fn.write_text(MSH_V2)
    grid = iu.read_grid(fn)
    assert grid.cell_type == "triangle"
    assert grid.n_cells == 2
    r = jnp.asarray([[0.25, 0.5, 0.0], [0.75, 0.5, 0.0]])
    v, _, found = iu.interpolate_scalar_at(
        grid, r, iu.get_point_data_index(grid, "Polynomial")
    )
    assert bool(found.all())
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(r[:, 0] + r[:, 1] + 1.0), atol=1e-13
    )


def _write_msh2_binary(path, endian="<"):
    """Binary v2.2 of the MSH_V2 square (boundary lines + 2 triangles
    + Polynomial node data)."""
    import struct

    e = endian
    with open(path, "wb") as f:
        f.write(b"$MeshFormat\n2.2 1 8\n")
        f.write(struct.pack(e + "i", 1))
        f.write(b"\n$EndMeshFormat\n")
        f.write(b"$Nodes\n4\n")
        pts = [(1, 0, 0, 0), (2, 1, 0, 0), (3, 1, 1, 0), (4, 0, 1, 0)]
        for i, x, y, z in pts:
            f.write(struct.pack(e + "i3d", i, x, y, z))
        f.write(b"\n$EndNodes\n$Elements\n6\n")
        # group 1: four boundary lines (type 1, 2 tags)
        f.write(struct.pack(e + "3i", 1, 4, 2))
        for eid, (a, b) in enumerate([(1, 2), (2, 3), (3, 4), (4, 1)], 1):
            f.write(struct.pack(e + "5i", eid, 0, 1, a, b))
        # group 2: two triangles (type 2, 2 tags)
        f.write(struct.pack(e + "3i", 2, 2, 2))
        f.write(struct.pack(e + "6i", 5, 0, 1, 1, 2, 3))
        f.write(struct.pack(e + "6i", 6, 0, 1, 1, 3, 4))
        f.write(b"\n$EndElements\n")
        f.write(b'$NodeData\n1\n"Polynomial"\n1\n0.0\n3\n0\n1\n4\n')
        for tag, v in [(1, 1.0), (2, 2.0), (3, 3.0), (4, 2.0)]:
            f.write(struct.pack(e + "id", tag, v))
        f.write(b"\n$EndNodeData\n")


def _write_msh4_binary(path, endian="<"):
    """Binary v4.1 equivalent (one surface entity, 2 triangles)."""
    import struct

    e = endian
    with open(path, "wb") as f:
        f.write(b"$MeshFormat\n4.1 1 8\n")
        f.write(struct.pack(e + "i", 1))
        f.write(b"\n$EndMeshFormat\n")
        f.write(b"$Nodes\n")
        f.write(struct.pack(e + "4Q", 1, 4, 1, 4))  # blocks, nodes, min, max
        f.write(struct.pack(e + "3i", 2, 1, 0))  # dim, tag, parametric
        f.write(struct.pack(e + "Q", 4))
        f.write(struct.pack(e + "4Q", 1, 2, 3, 4))
        for x, y, z in [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]:
            f.write(struct.pack(e + "3d", x, y, z))
        f.write(b"\n$EndNodes\n$Elements\n")
        f.write(struct.pack(e + "4Q", 1, 2, 1, 2))
        f.write(struct.pack(e + "3i", 2, 1, 2))  # dim, tag, type=triangle
        f.write(struct.pack(e + "Q", 2))
        f.write(struct.pack(e + "4Q", 1, 1, 2, 3))
        f.write(struct.pack(e + "4Q", 2, 1, 3, 4))
        f.write(b"\n$EndElements\n")
        f.write(b'$NodeData\n1\n"Polynomial"\n1\n0.0\n3\n0\n1\n4\n')
        for tag, v in [(1, 1.0), (2, 2.0), (3, 3.0), (4, 2.0)]:
            f.write(struct.pack(e + "id", tag, v))
        f.write(b"\n$EndNodeData\n")


@pytest.mark.parametrize(
    "writer,endian",
    [
        (_write_msh2_binary, "<"),
        (_write_msh2_binary, ">"),
        (_write_msh4_binary, "<"),
        (_write_msh4_binary, ">"),
    ],
)
def test_read_msh_binary(tmp_path, writer, endian):
    fn = tmp_path / f"bin_{writer.__name__}_{'le' if endian == '<' else 'be'}.msh"
    writer(fn, endian)
    m = read_msh(fn)
    assert [cb.type for cb in m.cells] == ["triangle"]
    np.testing.assert_array_equal(m.cells[0].data, [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_allclose(
        m.points, [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]
    )
    np.testing.assert_allclose(m.point_data["Polynomial"], [1, 2, 3, 2])


def test_msh_v40_rejected_cleanly(tmp_path):
    fn = tmp_path / "v40.msh"
    fn.write_text("$MeshFormat\n4.0 0 8\n$EndMeshFormat\n")
    with pytest.raises(ValueError, match="4.0 is not supported"):
        read_msh(fn)


def test_msh_element_data_multi_block(tmp_path):
    """ElementData lands at the right GLOBAL rows when several blocks
    are kept (only_max_dim=False keeps the boundary triangles too)."""
    fn = tmp_path / "tet.msh"
    fn.write_text(MSH_TET)
    m = read_msh(fn, only_max_dim=False)
    n_total = sum(len(cb.data) for cb in m.cells)
    assert len(m.cell_data["rho"]) == n_total
    # the value 7.5 sits on the tet's global row
    offset = 0
    for cb in m.cells:
        if cb.type == "tetra":
            assert m.cell_data["rho"][offset] == 7.5
        offset += len(cb.data)
