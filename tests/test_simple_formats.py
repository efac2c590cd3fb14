"""Native simple-format readers (MEDIT, TetGen, OFF, PLY, STL, OBJ) —
the any-meshio-format ingestion breadth of the reference
(convert_to_binary.py:185), covered natively."""

import struct

import numpy as np
import pytest

from interpolate_unstructured_tpu.io.simple_formats import (
    read_medit,
    read_obj,
    read_off,
    read_ply,
    read_stl,
    read_tetgen,
)

UNIT_TET_PTS = [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]

MEDIT_TET = """MeshVersionFormatted 2
# a comment
Dimension 3
Vertices
4
0 0 0 1
1 0 0 1
0 1 0 1
0 0 1 1
Triangles
4
1 2 3 7
1 2 4 7
2 3 4 7
1 3 4 7
Tetrahedra
1
1 2 3 4 42
End
"""

MEDIT_TRI_2D = """MeshVersionFormatted 1
Dimension
2
Vertices
4
0 0 0
1 0 0
1 1 0
0 1 0
Triangles
2
1 2 3 5
1 3 4 6
End
"""

TETGEN_NODE = """# unit tet, 1-based, one attribute, boundary markers
4 3 1 1
1 0 0 0 10.0 1
2 1 0 0 20.0 1
3 0 1 0 30.0 1
4 0 0 1 40.0 1
"""

TETGEN_ELE = """1 4 1
1 1 2 3 4 7
"""

OFF_SQUARE = """OFF
# unit square as two triangles
4 2 5
0 0 0
1 0 0
1 1 0
0 1 0
3 0 1 2
3 0 2 3
"""

PLY_ASCII = """ply
format ascii 1.0
comment unit square
element vertex 4
property float x
property float y
property float z
property float quality
element face 2
property list uchar int vertex_indices
end_header
0 0 0 1.0
1 0 0 2.0
1 1 0 3.0
0 1 0 2.0
3 0 1 2
3 0 2 3
"""

STL_ASCII = """solid square
facet normal 0 0 1
  outer loop
    vertex 0 0 0
    vertex 1 0 0
    vertex 1 1 0
  endloop
endfacet
facet normal 0 0 1
  outer loop
    vertex 0 0 0
    vertex 1 1 0
    vertex 0 1 0
  endloop
endfacet
endsolid square
"""

OBJ_MIXED = """# square: one quad face, slash tokens, negative index
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
f 1/1/1 2/2/1 3/3/1 -1
"""


def test_medit_tet_keeps_top_dimension(tmp_path):
    fn = tmp_path / "tet.mesh"
    fn.write_text(MEDIT_TET)
    m = read_medit(fn)
    assert [cb.type for cb in m.cells] == ["tetra"]
    np.testing.assert_array_equal(m.cells[0].data, [[0, 1, 2, 3]])
    np.testing.assert_allclose(m.points, UNIT_TET_PTS)
    np.testing.assert_array_equal(m.cell_data["medit:ref"], [42])
    assert m.cell_data["medit:ref"].dtype == np.int32


def test_medit_2d_pads_points(tmp_path):
    fn = tmp_path / "tri2d.mesh"
    fn.write_text(MEDIT_TRI_2D)
    m = read_medit(fn)
    assert m.points.shape == (4, 3)
    np.testing.assert_allclose(m.points[:, 2], 0.0)
    assert [cb.type for cb in m.cells] == ["triangle"]
    np.testing.assert_array_equal(m.cell_data["medit:ref"], [5, 6])


@pytest.mark.parametrize("entry", ["tet.node", "tet.ele"])
def test_tetgen_pair(tmp_path, entry):
    (tmp_path / "tet.node").write_text(TETGEN_NODE)
    (tmp_path / "tet.ele").write_text(TETGEN_ELE)
    m = read_tetgen(tmp_path / entry)
    np.testing.assert_allclose(m.points, UNIT_TET_PTS)
    np.testing.assert_array_equal(m.cells[0].data, [[0, 1, 2, 3]])
    np.testing.assert_allclose(m.point_data["tetgen:attr0"], [10, 20, 30, 40])
    np.testing.assert_array_equal(m.cell_data["tetgen:ref"], [7])


def test_off_square(tmp_path):
    fn = tmp_path / "square.off"
    fn.write_text(OFF_SQUARE)
    m = read_off(fn)
    assert [cb.type for cb in m.cells] == ["triangle"]
    np.testing.assert_array_equal(m.cells[0].data, [[0, 1, 2], [0, 2, 3]])


def test_ply_ascii(tmp_path):
    fn = tmp_path / "square.ply"
    fn.write_text(PLY_ASCII)
    m = read_ply(fn)
    np.testing.assert_array_equal(m.cells[0].data, [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_allclose(m.point_data["quality"], [1, 2, 3, 2])


@pytest.mark.parametrize("endian,fmt", [("<", "little"), (">", "big")])
def test_ply_binary(tmp_path, endian, fmt):
    header = (
        f"ply\nformat binary_{fmt}_endian 1.0\n"
        "element vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 2\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    ).encode()
    pts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], dtype=endian + "f4"
    )
    body = pts.tobytes()
    for face in ([0, 1, 2], [0, 2, 3]):
        body += struct.pack(endian + "B3i", 3, *face)
    fn = tmp_path / "square.ply"
    fn.write_bytes(header + body)
    m = read_ply(fn)
    np.testing.assert_allclose(m.points, pts.astype(np.float64))
    np.testing.assert_array_equal(m.cells[0].data, [[0, 1, 2], [0, 2, 3]])


def test_stl_ascii_merges_vertices(tmp_path):
    fn = tmp_path / "square.stl"
    fn.write_text(STL_ASCII)
    m = read_stl(fn)
    assert m.points.shape == (4, 3)  # 6 facet vertices -> 4 unique
    assert m.cells[0].data.shape == (2, 3)
    # Both triangles reference the shared diagonal vertices
    assert len(np.intersect1d(m.cells[0].data[0], m.cells[0].data[1])) == 2


def test_stl_binary(tmp_path):
    tris = np.array(
        [
            [[0, 0, 0], [1, 0, 0], [1, 1, 0]],
            [[0, 0, 0], [1, 1, 0], [0, 1, 0]],
        ],
        dtype=np.float32,
    )
    rec = np.zeros(
        2,
        dtype=np.dtype(
            [("normal", "<f4", 3), ("verts", "<f4", (3, 3)), ("attr", "<u2")]
        ),
    )
    rec["verts"] = tris
    fn = tmp_path / "square.stl"
    fn.write_bytes(b"\0" * 80 + struct.pack("<I", 2) + rec.tobytes())
    m = read_stl(fn)
    assert m.points.shape == (4, 3)
    assert m.cells[0].data.shape == (2, 3)


def test_obj_quad_slash_negative(tmp_path):
    fn = tmp_path / "square.obj"
    fn.write_text(OBJ_MIXED)
    m = read_obj(fn)
    assert [cb.type for cb in m.cells] == ["quad"]
    np.testing.assert_array_equal(m.cells[0].data, [[0, 1, 2, 3]])


def test_read_grid_from_tetgen(tmp_path):
    """End to end volume pipeline: .node/.ele -> binda -> grid -> interp."""
    import jax.numpy as jnp
    import interpolate_unstructured_tpu as iu

    (tmp_path / "tet.node").write_text(TETGEN_NODE)
    (tmp_path / "tet.ele").write_text(TETGEN_ELE)
    grid = iu.read_grid(tmp_path / "tet.node")
    assert grid.cell_type == "tetra"
    pts = np.asarray(grid.points)
    poly = pts.sum(axis=1) + 1.0
    grid, i_var = iu.add_point_data(grid, "poly", poly)
    r = jnp.asarray([[0.25, 0.25, 0.25], [0.1, 0.2, 0.3]])
    v, _, found = iu.interpolate_scalar_at(grid, r, i_var)
    assert bool(found.all())
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(r).sum(axis=1) + 1.0, atol=1e-13
    )
    # the TetGen region attribute arrived as icell data
    assert "tetgen:ref" in grid.icell_data_names


def test_read_grid_from_off_surface(tmp_path):
    """End to end surface pipeline: .off -> binda -> grid -> interp."""
    import jax.numpy as jnp
    import interpolate_unstructured_tpu as iu

    fn = tmp_path / "square.off"
    fn.write_text(OFF_SQUARE)
    grid = iu.read_grid(fn)
    assert grid.cell_type == "triangle"
    pts = np.asarray(grid.points)
    poly = pts[:, 0] + pts[:, 1] + 1.0
    grid, i_var = iu.add_point_data(grid, "poly", poly)
    r = jnp.asarray([[0.25, 0.5, 0.0], [0.75, 0.5, 0.0]])
    v, _, found = iu.interpolate_scalar_at(grid, r, i_var)
    assert bool(found.all())
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(r[:, 0] + r[:, 1] + 1.0), atol=1e-13
    )


def test_ply_ascii_extra_face_props_rejected(tmp_path):
    """Face rows with extra scalar properties would misparse silently;
    both encodings must reject them identically."""
    fn = tmp_path / "bad.ply"
    fn.write_text(
        "ply\nformat ascii 1.0\n"
        "element vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\n"
        "property uchar flag\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0\n1 0 0\n0 1 0\n"
        "1 3 0 1 2\n"
    )
    with pytest.raises(ValueError, match="extra properties"):
        read_ply(fn)


def test_medit_mixed_2d_blocks_concat_refs(tmp_path):
    """Triangles + quadrilaterals (same dimension): refs concatenate in
    cells order with the total cell count."""
    fn = tmp_path / "mixed.mesh"
    fn.write_text(
        "MeshVersionFormatted 2\nDimension 2\nVertices\n5\n"
        "0 0 0\n1 0 0\n1 1 0\n0 1 0\n2 0 0\n"
        "Triangles\n1\n2 5 3 9\n"
        "Quadrilaterals\n1\n1 2 3 4 8\n"
        "End\n"
    )
    m = read_medit(fn)
    assert sorted(cb.type for cb in m.cells) == ["quad", "triangle"]
    assert len(m.cell_data["medit:ref"]) == 2
    assert sorted(m.cell_data["medit:ref"].tolist()) == [8, 9]


def test_uppercase_extension_dispatch(tmp_path):
    from interpolate_unstructured_tpu.io.convert import read_mesh

    fn = tmp_path / "SQUARE.OFF"
    fn.write_text(OFF_SQUARE)
    m = read_mesh(fn)
    assert m.cells[0].type == "triangle"


def test_medit_sol_companion(tmp_path):
    """A sibling .sol file loads as point data: scalar + vector fields
    split into per-component columns."""
    (tmp_path / "tet.mesh").write_text(MEDIT_TET)
    (tmp_path / "tet.sol").write_text(
        "MeshVersionFormatted 2\nDimension 3\n"
        "SolAtVertices\n4\n2 1 2\n"
        "1.0  0 0 1\n2.0  0 0 2\n3.0  0 0 3\n4.0  0 0 4\n"
        "End\n"
    )
    m = read_medit(tmp_path / "tet.mesh")
    np.testing.assert_allclose(m.point_data["medit:sol0"], [1, 2, 3, 4])
    np.testing.assert_allclose(m.point_data["medit:sol1_2"], [1, 2, 3, 4])
    np.testing.assert_allclose(m.point_data["medit:sol1_0"], 0.0)
