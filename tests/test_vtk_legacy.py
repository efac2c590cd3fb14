"""Legacy .vtk reader: ASCII + BINARY unstructured grids through the
full convert -> read_grid -> interpolate pipeline (the reference gets
this format for free via meshio, convert_to_binary.py:185)."""

import struct

import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu.io.vtk_legacy import read_vtk
from interpolate_unstructured_tpu.utils import meshgen


def _mesh():
    points, cells, neighbors = meshgen.triangle_rect_mesh(3, 3)
    poly = points.sum(axis=1) + 1.0
    return points, cells, poly


def _write_ascii_vtk(path, points, cells, poly, *, vtk9_layout=False):
    n, c = len(points), len(cells)
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\n")
        f.write("legacy test mesh\nASCII\nDATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {n} double\n")
        for p in points:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
        if vtk9_layout:
            f.write(f"CELLS {c + 1} {3 * c}\n")
            f.write("OFFSETS vtktypeint64\n")
            f.write(" ".join(str(3 * i) for i in range(c + 1)) + "\n")
            f.write("CONNECTIVITY vtktypeint64\n")
            for cc in cells:
                f.write(f"{cc[0]} {cc[1]} {cc[2]}\n")
        else:
            f.write(f"CELLS {c} {4 * c}\n")
            for cc in cells:
                f.write(f"3 {cc[0]} {cc[1]} {cc[2]}\n")
        f.write(f"CELL_TYPES {c}\n")
        f.write("\n".join(["5"] * c) + "\n")
        f.write(f"POINT_DATA {n}\n")
        f.write("SCALARS Polynomial double 1\nLOOKUP_TABLE default\n")
        f.write("\n".join(str(v) for v in poly) + "\n")
        f.write("VECTORS velocity double\n")
        for p in points:
            f.write(f"{-p[1]} {p[0]} 0.0\n")
        f.write(f"CELL_DATA {c}\n")
        f.write("FIELD fd 1\nregion 1 " + str(c) + " int\n")
        f.write(" ".join(str(i % 3) for i in range(c)) + "\n")


def _write_binary_vtk(path, points, cells, poly):
    n, c = len(points), len(cells)
    with open(path, "wb") as f:
        f.write(b"# vtk DataFile Version 3.0\n")
        f.write(b"legacy binary test\nBINARY\nDATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {n} double\n".encode())
        f.write(np.asarray(points, ">f8").tobytes())
        f.write(b"\n")
        f.write(f"CELLS {c} {4 * c}\n".encode())
        raw = np.column_stack(
            [np.full(c, 3), cells[:, 0], cells[:, 1], cells[:, 2]]
        ).astype(">i4")
        f.write(raw.tobytes())
        f.write(b"\n")
        f.write(f"CELL_TYPES {c}\n".encode())
        f.write(np.full(c, 5, ">i4").tobytes())
        f.write(b"\n")
        f.write(f"POINT_DATA {n}\n".encode())
        f.write(b"SCALARS Polynomial double 1\nLOOKUP_TABLE default\n")
        f.write(np.asarray(poly, ">f8").tobytes())
        f.write(b"\n")


@pytest.mark.parametrize("vtk9_layout", [False, True])
def test_ascii_roundtrip(tmp_path, vtk9_layout):
    points, cells, poly = _mesh()
    path = tmp_path / "tri.vtk"
    _write_ascii_vtk(path, points, cells, poly, vtk9_layout=vtk9_layout)

    mesh = read_vtk(path)
    assert mesh.cells[0].type == "triangle"
    np.testing.assert_array_equal(mesh.cells[0].data, cells)
    np.testing.assert_allclose(mesh.points, points)
    np.testing.assert_allclose(mesh.point_data["Polynomial"], poly)
    # VECTORS split into per-component variables
    np.testing.assert_allclose(mesh.point_data["velocity_0"], -points[:, 1])
    np.testing.assert_allclose(mesh.point_data["velocity_1"], points[:, 0])
    assert mesh.cell_data["region"].dtype.kind == "i"

    grid = iu.read_grid(path)
    assert grid.cell_type == "triangle"
    assert "region" in grid.icell_data_names
    rng = np.random.default_rng(3)
    r = jnp.asarray(
        rng.random((200, 3)) * np.asarray(grid.rmax - grid.rmin)
        + np.asarray(grid.rmin)
    )
    r = r.at[:, 2].set(0.0)
    iv = grid.point_data_names.index("Polynomial")
    v, _, f = iu.interpolate_scalar_at(grid, r, iv)
    assert bool(f.all())
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(r.sum(1) + 1.0), atol=1e-13
    )


def test_binary_roundtrip(tmp_path):
    points, cells, poly = _mesh()
    path = tmp_path / "tri_bin.vtk"
    _write_binary_vtk(path, points, cells, poly)

    mesh = read_vtk(path)
    np.testing.assert_array_equal(mesh.cells[0].data, cells)
    np.testing.assert_allclose(mesh.points, points)
    np.testing.assert_allclose(mesh.point_data["Polynomial"], poly)

    grid = iu.read_grid(path)
    rng = np.random.default_rng(4)
    r = jnp.asarray(
        rng.random((100, 3)) * np.asarray(grid.rmax - grid.rmin)
        + np.asarray(grid.rmin)
    )
    r = r.at[:, 2].set(0.0)
    v, _, f = iu.interpolate_scalar_at(grid, r, 0)
    assert bool(f.all())
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(r.sum(1) + 1.0), atol=1e-13
    )


def test_rejects_structured(tmp_path):
    path = tmp_path / "sg.vtk"
    path.write_text(
        "# vtk DataFile Version 3.0\nt\nASCII\nDATASET STRUCTURED_POINTS\n"
    )
    with pytest.raises(ValueError, match="UNSTRUCTURED_GRID"):
        read_vtk(path)


def test_scalars_without_lookup_table(tmp_path):
    """LOOKUP_TABLE is optional in practice; numComp lives on the
    SCALARS line itself, so neither may be confused with data."""
    path = tmp_path / "nolut.vtk"
    path.write_text(
        "# vtk DataFile Version 3.0\nt\nASCII\nDATASET UNSTRUCTURED_GRID\n"
        "POINTS 3 double\n0 0 0\n1 0 0\n0 1 0\n"
        "CELLS 1 4\n3 0 1 2\n"
        "CELL_TYPES 1\n5\n"
        "POINT_DATA 3\n"
        "SCALARS material int\n7 7 1\n"  # no numComp, no LOOKUP_TABLE
        "SCALARS weight double 1\n2.0 2.0 2.0\n"  # numComp, no LOOKUP_TABLE
    )
    mesh = read_vtk(path)
    np.testing.assert_array_equal(mesh.point_data["material"], [7, 7, 1])
    np.testing.assert_allclose(mesh.point_data["weight"], [2.0, 2.0, 2.0])


def test_metadata_crlf(tmp_path):
    """METADATA blocks are terminated by a blank line even with CRLF
    endings."""
    path = tmp_path / "crlf.vtk"
    body = (
        "# vtk DataFile Version 3.0\r\nt\r\nASCII\r\n"
        "DATASET UNSTRUCTURED_GRID\r\n"
        "POINTS 3 double\r\n0 0 0\r\n1 0 0\r\n0 1 0\r\n"
        "METADATA\r\nINFORMATION 1\r\nNAME X LOCATION Y\r\nDATA 1\r\n\r\n"
        "CELLS 1 4\r\n3 0 1 2\r\n"
        "CELL_TYPES 1\r\n5\r\n"
    )
    path.write_bytes(body.encode())
    mesh = read_vtk(path)
    np.testing.assert_array_equal(mesh.cells[0].data, [[0, 1, 2]])
