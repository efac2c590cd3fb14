"""Native FEM/CFD format readers (ABAQUS, Nastran, AVS-UCD, SU2,
FLAC3D) — the any-meshio-format ingestion breadth of the reference
(convert_to_binary.py:185), covered natively."""

import numpy as np
import pytest

from interpolate_unstructured_tpu.io.convert import read_mesh
from interpolate_unstructured_tpu.io.fem import (
    read_abaqus,
    read_avs,
    read_flac3d,
    read_nastran,
    read_su2,
)

# unit tet split of nothing fancy: one tetra on 4 points
TET_PTS = np.array(
    [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
)

ABAQUS_TET = """** a comment
*HEADING
one tet, non-contiguous node ids
*NODE
 10, 0., 0., 0.
 20, 1., 0., 0.
 30, 0., 1., 0.
 40, 0., 0., 1.
*ELEMENT, TYPE=C3D4, ELSET=solid
 1, 10, 20, 30,
 40
*ELEMENT, TYPE=S3, ELSET=skin
 2, 10, 20, 30
*MATERIAL, NAME=steel
*ELASTIC
 210e9, 0.3
*END STEP
"""

# one tet; exercises free-field, small-field (8-char columns),
# large-field (16-char columns + '*' continuation) and the
# exponent-less float "1.-0"
def _f8(*fields):
    return "".join(f"{f:<8}" for f in fields).rstrip()


NASTRAN_TET = "\n".join([
    "$ one tet; free-field grid, small-field grid, large-field grid",
    "BEGIN BULK",
    "GRID,1,,0.,0.,0.",
    _f8("GRID", "2", "", "1.", "0.", "0."),
    "GRID*   " + f"{'3':<16}{'':<16}{'0.':<16}{'1.':<16}".rstrip(),
    "*       " + f"{'0.':<16}".rstrip(),
    _f8("GRID", "4", "", "0.", "0.", "1.-0"),
    _f8("CTETRA", "1", "1", "1", "2", "3", "4"),
    _f8("CTRIA3", "2", "1", "1", "2", "3"),
    "ENDDATA",
]) + "\n"

AVS_TET = """# AVS-UCD, one tet + node data (scalar temp, 2-vector vel) + cell data
4 1 3 1 0
1 0.0 0.0 0.0
2 1.0 0.0 0.0
3 0.0 1.0 0.0
4 0.0 0.0 1.0
1 7 tet 1 2 3 4
2 1 2
temp, K
vel, m/s
1 10.0 1.5 2.5
2 11.0 1.5 2.5
3 12.0 1.5 2.5
4 13.0 1.5 2.5
1 1
rho, kg/m3
1 42.0
"""

SU2_TET = """% one tet in 3D
NDIME= 3
NELEM= 1
10 0 1 2 3 0
NPOIN= 4
0.0 0.0 0.0 0
1.0 0.0 0.0 1
0.0 1.0 0.0 2
0.0 0.0 1.0 3
NMARK= 1
MARKER_TAG= wall
MARKER_ELEMS= 2
5 0 1 2
5 0 1 3
"""

SU2_TRI_2D = """NDIME= 2
NELEM= 2
5 0 1 2 0
5 0 2 3 1
NPOIN= 4
0.0 0.0 0
1.0 0.0 1
1.0 1.0 2
0.0 1.0 3
NMARK= 0
"""

FLAC3D_TET = """* one tet zone, zgroup markup
FLAC3DGRID
G 1 0.0 0.0 0.0
G 2 1.0 0.0 0.0
G 3 0.0 1.0 0.0
G 4 0.0 0.0 1.0
Z T4 1 1 2 3 4
ZGROUP "rock"
1
"""


def _check_unit_tet(mesh):
    assert len(mesh.cells) == 1
    block = mesh.cells[0]
    assert block.type == "tetra"
    np.testing.assert_array_equal(block.data, [[0, 1, 2, 3]])
    np.testing.assert_allclose(mesh.points, TET_PTS)


def test_abaqus_tet(tmp_path):
    p = tmp_path / "tet.inp"
    p.write_text(ABAQUS_TET)
    mesh = read_abaqus(p)
    # shell S3 block is surface markup below the top dimension
    _check_unit_tet(mesh)


def test_abaqus_continuation_and_remap(tmp_path):
    # the C3D4 element above is split over two lines (trailing comma)
    # and references non-contiguous node ids 10..40
    p = tmp_path / "tet.inp"
    p.write_text(ABAQUS_TET)
    mesh = read_mesh(p)  # extension dispatch
    _check_unit_tet(mesh)


def test_abaqus_unknown_element_type(tmp_path):
    p = tmp_path / "bad.inp"
    p.write_text("*NODE\n1,0,0,0\n*ELEMENT, TYPE=XYZ9\n1,1,1,1\n")
    with pytest.raises(ValueError, match="XYZ9"):
        read_abaqus(p)


def test_nastran_field_formats(tmp_path):
    # free field, small field (8-char columns), large field with
    # continuation, and the exponent-less float "1.-0"
    p = tmp_path / "tet.bdf"
    p.write_text(NASTRAN_TET)
    mesh = read_nastran(p)
    _check_unit_tet(mesh)


def test_nastran_dispatch(tmp_path):
    p = tmp_path / "tet.nas"
    p.write_text(NASTRAN_TET)
    _check_unit_tet(read_mesh(p))


def test_avs_tet_with_data(tmp_path):
    p = tmp_path / "tet.avs"
    p.write_text(AVS_TET)
    mesh = read_avs(p)
    _check_unit_tet(mesh)
    np.testing.assert_allclose(
        mesh.point_data["temp"], [10.0, 11.0, 12.0, 13.0]
    )
    # 2-vector split into per-component columns
    np.testing.assert_allclose(mesh.point_data["vel_0"], [1.5] * 4)
    np.testing.assert_allclose(mesh.point_data["vel_1"], [2.5] * 4)
    np.testing.assert_array_equal(mesh.cell_data["avs:material"], [7])
    np.testing.assert_allclose(mesh.cell_data["rho"], [42.0])


def test_su2_tet(tmp_path):
    p = tmp_path / "tet.su2"
    p.write_text(SU2_TET)
    mesh = read_su2(p)
    # boundary marker triangles are skipped
    _check_unit_tet(mesh)


def test_su2_2d_pads_points(tmp_path):
    p = tmp_path / "tri.su2"
    p.write_text(SU2_TRI_2D)
    mesh = read_mesh(p)
    assert mesh.cells[0].type == "triangle"
    assert mesh.points.shape == (4, 3)
    np.testing.assert_array_equal(mesh.points[:, 2], 0.0)


def test_flac3d_tet(tmp_path):
    p = tmp_path / "tet.f3grid"
    p.write_text(FLAC3D_TET)
    mesh = read_flac3d(p)
    _check_unit_tet(mesh)
    np.testing.assert_array_equal(mesh.cell_data["flac3d:zgroup"], [0])


UGRID_TET = """4 4 0 1 0 0 0
0.0 0.0 0.0
1.0 0.0 0.0
0.0 1.0 0.0
0.0 0.0 1.0
1 2 3
1 2 4
2 3 4
1 3 4
7 7 7 7
1 2 3 4
"""


def test_ugrid_tet(tmp_path):
    from interpolate_unstructured_tpu.io.fem import read_ugrid

    p = tmp_path / "tet.ugrid"
    p.write_text(UGRID_TET)
    mesh = read_ugrid(p)
    # boundary triangles + their surface tags are skipped
    _check_unit_tet(mesh)
    _check_unit_tet(read_mesh(p))


@pytest.mark.parametrize("suffix,endian,fdt", [
    ("tet.b8.ugrid", ">", ">f8"),
    ("tet.lb8.ugrid", "<", "<f8"),
    ("tet.lb4.ugrid", "<", "<f4"),
])
def test_ugrid_binary(tmp_path, suffix, endian, fdt):
    from interpolate_unstructured_tpu.io.fem import read_ugrid

    idt = np.dtype(endian + "i4")
    parts = [
        np.array([4, 4, 0, 1, 0, 0, 0], idt).tobytes(),
        TET_PTS.astype(fdt).tobytes(),
        np.array(
            [[1, 2, 3], [1, 2, 4], [2, 3, 4], [1, 3, 4]], idt
        ).tobytes(),
        np.array([7, 7, 7, 7], idt).tobytes(),  # surface tags
        np.array([[1, 2, 3, 4]], idt).tobytes(),
    ]
    p = tmp_path / suffix
    p.write_bytes(b"".join(parts))
    _check_unit_tet(read_ugrid(p))
    _check_unit_tet(read_mesh(p))


def test_avs_with_inp_extension_sniffed(tmp_path):
    # .inp is also the classic AVS-UCD extension; the dispatcher
    # sniffs the first data line ('*' keyword -> ABAQUS, else UCD)
    p = tmp_path / "tet.inp"
    p.write_text(AVS_TET)
    mesh = read_mesh(p)
    _check_unit_tet(mesh)
    np.testing.assert_allclose(
        mesh.point_data["temp"], [10.0, 11.0, 12.0, 13.0]
    )


def test_su2_unknown_element_type(tmp_path):
    p = tmp_path / "bad.su2"
    p.write_text("NDIME= 3\nNELEM= 1\n99 0 1 2 3\nNPOIN= 4\n")
    with pytest.raises(ValueError, match="99"):
        read_su2(p)


def test_flac3d_unknown_zone_type(tmp_path):
    p = tmp_path / "bad.f3grid"
    p.write_text("G 1 0 0 0\nZ X9 1 1 1 1\n")
    with pytest.raises(ValueError, match="X9"):
        read_flac3d(p)


def test_avs_unknown_cell_type(tmp_path):
    p = tmp_path / "bad.avs"
    p.write_text("1 1 0 0 0\n1 0 0 0\n1 0 blob 1\n")
    with pytest.raises(ValueError, match="blob"):
        read_avs(p)


def test_abaqus_undefined_node_reference(tmp_path):
    p = tmp_path / "bad.inp"
    p.write_text("*NODE\n1,0,0,0\n2,1,0,0\n3,0,1,0\n"
                 "*ELEMENT, TYPE=S3\n1, 1, 2, 99\n")
    with pytest.raises(ValueError, match="99"):
        read_abaqus(p)


TECPLOT_POINT = """TITLE = "one tet"
VARIABLES = "X" "Y" "Z" "temp"
ZONE T="solid", N=4, E=1, F=FEPOINT, ET=TETRAHEDRON
0.0 0.0 0.0 10.0
1.0 0.0 0.0 11.0
0.0 1.0 0.0 12.0
0.0 0.0 1.0 13.0
1 2 3 4
"""

TECPLOT_BLOCK = """VARIABLES = "X", "Y", "Z", "temp", "rho"
ZONE T="solid", ZONETYPE=FETETRAHEDRON, NODES=4, ELEMENTS=1,
DATAPACKING=BLOCK, VARLOCATION=([5]=CELLCENTERED)
0.0 1.0 0.0 0.0
0.0 0.0 1.0 0.0
0.0 0.0 0.0 1.0
10.0 11.0 12.0 13.0
42.0
1 2 3 4
"""


def test_tecplot_fepoint(tmp_path):
    from interpolate_unstructured_tpu.io.fem import read_tecplot

    p = tmp_path / "tet.dat"
    p.write_text(TECPLOT_POINT)
    mesh = read_tecplot(p)
    _check_unit_tet(mesh)
    np.testing.assert_allclose(
        mesh.point_data["temp"], [10.0, 11.0, 12.0, 13.0]
    )
    _check_unit_tet(read_mesh(p))


def test_tecplot_feblock_cellcentered(tmp_path):
    from interpolate_unstructured_tpu.io.fem import read_tecplot

    p = tmp_path / "tet.tec"
    p.write_text(TECPLOT_BLOCK)
    mesh = read_tecplot(p)
    _check_unit_tet(mesh)
    np.testing.assert_allclose(
        mesh.point_data["temp"], [10.0, 11.0, 12.0, 13.0]
    )
    np.testing.assert_allclose(mesh.cell_data["rho"], [42.0])


def test_tecplot_unknown_zone_type(tmp_path):
    from interpolate_unstructured_tpu.io.fem import read_tecplot

    p = tmp_path / "bad.dat"
    p.write_text('VARIABLES = "X" "Y"\nZONE N=1, E=1, ET=POLYGON\n0 0\n1\n')
    with pytest.raises(ValueError, match="POLYGON"):
        read_tecplot(p)


GAMBIT_TET = """        CONTROL INFO 2.4.6
** GAMBIT NEUTRAL FILE
one tet
PROGRAM:                Gambit     VERSION:  2.4.6
01 Jan 2026
     NUMNP     NELEM     NGRPS    NBSETS     NDFCD     NDFVL
         4         1         1         0         3         3
ENDOFSECTION
   NODAL COORDINATES 2.4.6
         1   0.00000000000e+00   0.00000000000e+00   0.00000000000e+00
         2   1.00000000000e+00   0.00000000000e+00   0.00000000000e+00
         3   0.00000000000e+00   1.00000000000e+00   0.00000000000e+00
         4   0.00000000000e+00   0.00000000000e+00   1.00000000000e+00
ENDOFSECTION
      ELEMENTS/CELLS 2.4.6
         1  6  4        1        2        3        4
ENDOFSECTION
       ELEMENT GROUP 2.4.6
GROUP:          1 ELEMENTS:          1 MATERIAL:          2 NFLAGS:          1
                           fluid
       0
       1
ENDOFSECTION
"""


def test_gambit_tet(tmp_path):
    from interpolate_unstructured_tpu.io.fem import read_gambit

    p = tmp_path / "tet.neu"
    p.write_text(GAMBIT_TET)
    _check_unit_tet(read_gambit(p))
    _check_unit_tet(read_mesh(p))


def test_gambit_higher_order_rejected(tmp_path):
    from interpolate_unstructured_tpu.io.fem import read_gambit

    p = tmp_path / "bad.neu"
    p.write_text(
        "   NODAL COORDINATES 2.4.6\n 1 0. 0. 0.\nENDOFSECTION\n"
        "      ELEMENTS/CELLS 2.4.6\n"
        " 1 6 10 1 1 1 1 1 1 1 1 1 1\nENDOFSECTION\n"
    )
    with pytest.raises(ValueError, match="10 nodes"):
        read_gambit(p)


NETGEN_TET = """mesh3d
dimension
3
geomtype
0

# surface elements: surfnr bcnr domin domout np p1 p2 p3
surfaceelements
4
 2 1 1 0 3 1 2 3
 2 1 1 0 3 1 2 4
 2 1 1 0 3 2 3 4
 2 1 1 0 3 1 3 4

volumeelements
1
 1 4 1 2 3 4

points
4
 0.0 0.0 0.0
 1.0 0.0 0.0
 0.0 1.0 0.0
 0.0 0.0 1.0
"""


def test_netgen_tet(tmp_path):
    from interpolate_unstructured_tpu.io.fem import read_netgen

    p = tmp_path / "tet.vol"
    p.write_text(NETGEN_TET)
    mesh = read_netgen(p)
    _check_unit_tet(mesh)
    np.testing.assert_array_equal(mesh.cell_data["netgen:index"], [1])
    _check_unit_tet(read_mesh(p))


def test_netgen_surface_only(tmp_path):
    from interpolate_unstructured_tpu.io.fem import read_netgen

    # no volume elements: the surface triangles become the cells
    text = NETGEN_TET.replace(
        "volumeelements\n1\n 1 4 1 2 3 4\n", "volumeelements\n0\n"
    )
    p = tmp_path / "surf.vol"
    p.write_text(text)
    mesh = read_netgen(p)
    assert mesh.cells[0].type == "triangle"
    assert mesh.cells[0].data.shape == (4, 3)


def test_abaqus_blank_fields_and_node_continuation(tmp_path):
    # omitted data items mean zero; *NODE data lines may continue
    # after a trailing comma; keyword lines may continue too
    p = tmp_path / "c.inp"
    p.write_text(
        "*NODE\n"
        "1, 2.0, , 4.0\n"
        "2, 1.0,\n"
        " 2.0, 3.0\n"
        "*ELEMENT,\n"
        " TYPE=S3\n"
        "1, 1, 2, 1\n"
    )
    mesh = read_abaqus(p)
    np.testing.assert_allclose(
        mesh.points, [[2.0, 0.0, 4.0], [1.0, 2.0, 3.0]]
    )
    assert mesh.cells[0].type == "triangle"


def test_tecplot_varlocation_nodal_ranges_ignored(tmp_path):
    from interpolate_unstructured_tpu.io.fem import read_tecplot

    text = TECPLOT_BLOCK.replace(
        "VARLOCATION=([5]=CELLCENTERED)",
        "VARLOCATION=([1-4]=NODAL,[5]=CELLCENTERED)",
    )
    p = tmp_path / "tet.tec"
    p.write_text(text)
    mesh = read_tecplot(p)
    _check_unit_tet(mesh)
    np.testing.assert_allclose(mesh.cell_data["rho"], [42.0])


def test_tecplot_datapacking_defaults_block_for_modern_header(tmp_path):
    from interpolate_unstructured_tpu.io.fem import read_tecplot

    text = TECPLOT_BLOCK.replace("DATAPACKING=BLOCK, ", "").replace(
        "VARLOCATION=([5]=CELLCENTERED)", "VARLOCATION=([5]=CELLCENTERED)"
    )
    p = tmp_path / "tet.tec"
    p.write_text(text)
    mesh = read_tecplot(p)  # ZONETYPE= header without DATAPACKING
    _check_unit_tet(mesh)


def test_avs_hex_node_order_permuted(tmp_path):
    # AVS hex lists the top face first; the reader must return VTK
    # order (bottom face first)
    text = (
        "8 1 0 0 0\n"
        + "".join(
            f"{i + 1} {x} {y} {z}\n"
            for i, (x, y, z) in enumerate(
                [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                 (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
            )
        )
        # file order: top face (5,6,7,8) then bottom face (1,2,3,4)
        + "1 0 hex 5 6 7 8 1 2 3 4\n"
    )
    from interpolate_unstructured_tpu.io.fem import read_avs

    p = tmp_path / "hex.avs"
    p.write_text(text)
    mesh = read_avs(p)
    assert mesh.cells[0].type == "hexahedron"
    np.testing.assert_array_equal(
        mesh.cells[0].data, [[0, 1, 2, 3, 4, 5, 6, 7]]
    )


def test_gambit_hex_tensor_order_permuted(tmp_path):
    from interpolate_unstructured_tpu.io.fem import read_gambit

    # Gambit tensor numbering: bottom (0,0,0),(1,0,0),(0,1,0),(1,1,0),
    # top likewise; VTK wants cyclic bottom then cyclic top
    text = (
        "   NODAL COORDINATES 2.4.6\n"
        + "".join(
            f" {i + 1} {x} {y} {z}\n"
            for i, (x, y, z) in enumerate(
                [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
                 (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)]
            )
        )
        + "ENDOFSECTION\n"
        "      ELEMENTS/CELLS 2.4.6\n"
        " 1 4 8 1 2 3 4 5 6 7 8\nENDOFSECTION\n"
    )
    p = tmp_path / "hex.neu"
    p.write_text(text)
    mesh = read_gambit(p)
    assert mesh.cells[0].type == "hexahedron"
    # VTK hex: cyclic bottom face then cyclic top face
    pts = mesh.points[mesh.cells[0].data[0]]
    np.testing.assert_allclose(
        pts,
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]],
    )


def test_flac3d_non_tet_zone_rejected(tmp_path):
    p = tmp_path / "hex.f3grid"
    p.write_text("G 1 0 0 0\nZ B8 1 1 1 1 1 1 1 1 1\n")
    with pytest.raises(ValueError, match="B8"):
        read_flac3d(p)


def test_ugrid_pyramid_rejected(tmp_path):
    from interpolate_unstructured_tpu.io.fem import read_ugrid

    text = (
        "5 0 0 0 1 0 0\n"
        "0 0 0\n1 0 0\n1 1 0\n0 1 0\n0.5 0.5 1\n"
        "1 2 3 4 5\n"
    )
    p = tmp_path / "pyr.ugrid"
    p.write_text(text)
    with pytest.raises(ValueError, match="pyramid"):
        read_ugrid(p)


def test_cross_format_consistency_at_scale(tmp_path):
    """Write the same 384-tet mesh as SU2, ASCII UGRID, binary UGRID,
    AVS-UCD and Tecplot FEPOINT; every reader must return identical
    points and connectivity."""
    from interpolate_unstructured_tpu.utils import meshgen

    points, cells, _ = meshgen.tet_box_mesh(4, 4, 4)
    n, c = len(points), len(cells)

    su2 = [f"NDIME= 3", f"NELEM= {c}"]
    su2 += ["10 " + " ".join(map(str, row)) for row in cells]
    su2.append(f"NPOIN= {n}")
    su2 += [
        f"{x} {y} {z} {i}" for i, (x, y, z) in enumerate(points)
    ]
    su2.append("NMARK= 0")
    (tmp_path / "m.su2").write_text("\n".join(su2) + "\n")

    ug = [f"{n} 0 0 {c} 0 0 0"]
    ug += [f"{x} {y} {z}" for x, y, z in points]
    ug += [" ".join(str(v + 1) for v in row) for row in cells]
    (tmp_path / "m.ugrid").write_text("\n".join(ug) + "\n")

    idt, fdt = np.dtype("<i4"), np.dtype("<f8")
    (tmp_path / "m.lb8.ugrid").write_bytes(
        np.array([n, 0, 0, c, 0, 0, 0], idt).tobytes()
        + points.astype(fdt).tobytes()
        + (np.asarray(cells, idt) + 1).tobytes()
    )

    avs = [f"{n} {c} 0 0 0"]
    avs += [
        f"{i + 1} {x} {y} {z}" for i, (x, y, z) in enumerate(points)
    ]
    avs += [
        f"{i + 1} 1 tet " + " ".join(str(v + 1) for v in row)
        for i, row in enumerate(cells)
    ]
    (tmp_path / "m.avs").write_text("\n".join(avs) + "\n")

    tec = ['VARIABLES = "X" "Y" "Z"',
           f'ZONE N={n}, E={c}, F=FEPOINT, ET=TETRAHEDRON']
    tec += [f"{x} {y} {z}" for x, y, z in points]
    tec += [" ".join(str(v + 1) for v in row) for row in cells]
    (tmp_path / "m.dat").write_text("\n".join(tec) + "\n")

    for name in ("m.su2", "m.ugrid", "m.lb8.ugrid", "m.avs", "m.dat"):
        mesh = read_mesh(tmp_path / name)
        assert mesh.cells[0].type == "tetra", name
        np.testing.assert_allclose(mesh.points, points, err_msg=name)
        np.testing.assert_array_equal(
            mesh.cells[0].data, cells, err_msg=name
        )


def test_read_grid_from_avs(tmp_path):
    """Full pipeline on the format that carries node data: .avs ->
    binda -> UGrid -> interpolation is linear-exact on the node field
    (temp = 10 + 1*x + 2*y + 3*z on the unit tet)."""
    import jax.numpy as jnp

    import interpolate_unstructured_tpu as iu

    p = tmp_path / "tet.avs"
    p.write_text(AVS_TET)
    grid = iu.read_grid(p)
    ivar = iu.get_point_data_index(grid, "temp")
    q = jnp.asarray([[0.25, 0.25, 0.25], [0.1, 0.2, 0.3]])
    vals, ic, found = iu.interpolate_scalar_at(grid, q, ivar)
    assert bool(np.asarray(found).all())
    qn = np.asarray(q)
    expect = 10.0 + qn[:, 0] + 2.0 * qn[:, 1] + 3.0 * qn[:, 2]
    np.testing.assert_allclose(np.asarray(vals), expect, atol=1e-12)
