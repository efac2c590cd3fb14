"""Native XDMF and Exodus II readers (round-5 format breadth: the
reference converts any meshio-readable format, convert_to_binary.py:185
— these two families were the remaining gap).  Fixtures are generated
in-test: XDMF inline XML, XDMF with an HDF5 sidecar (h5py), and a
NetCDF-3 Exodus container written with scipy.io.netcdf_file."""

import numpy as np
import pytest

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu.io.exodus import read_exodus
from interpolate_unstructured_tpu.io.xdmf import read_xdmf

# 2x2 unit-square triangle mesh (5 points incl. center, 4 triangles)
TRI_PTS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0.5, 0.5, 0]],
    dtype=np.float64,
)
TRI_CELLS = np.array(
    [[0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]], dtype=np.int64
)
TRI_PHI = TRI_PTS[:, 0] + 2 * TRI_PTS[:, 1] + 3.0


def _xdmf_inline(path, fmt_2d=False):
    gtype = "XY" if fmt_2d else "XYZ"
    pts = TRI_PTS[:, :2] if fmt_2d else TRI_PTS
    pts_s = "\n".join(" ".join(f"{v:.17g}" for v in p) for p in pts)
    conn_s = "\n".join(" ".join(str(i) for i in c) for c in TRI_CELLS)
    phi_s = " ".join(f"{v:.17g}" for v in TRI_PHI)
    rho_s = " ".join(str(float(i)) for i in range(len(TRI_CELLS)))
    path.write_text(f"""<?xml version="1.0"?>
<Xdmf Version="3.0">
 <Domain>
  <Grid Name="mesh">
   <Geometry GeometryType="{gtype}">
    <DataItem DataType="Float" Dimensions="{len(pts)} {pts.shape[1]}"
              Format="XML" Precision="8">
{pts_s}
    </DataItem>
   </Geometry>
   <Topology TopologyType="Triangle" NumberOfElements="{len(TRI_CELLS)}">
    <DataItem DataType="Int" Dimensions="{len(TRI_CELLS)} 3"
              Format="XML" Precision="8">
{conn_s}
    </DataItem>
   </Topology>
   <Attribute Name="phi" AttributeType="Scalar" Center="Node">
    <DataItem DataType="Float" Dimensions="{len(pts)}" Format="XML"
              Precision="8">{phi_s}</DataItem>
   </Attribute>
   <Attribute Name="rho" AttributeType="Scalar" Center="Cell">
    <DataItem DataType="Float" Dimensions="{len(TRI_CELLS)}" Format="XML"
              Precision="8">{rho_s}</DataItem>
   </Attribute>
  </Grid>
 </Domain>
</Xdmf>
""")


def _check_tri_mesh(m):
    np.testing.assert_allclose(m.points, TRI_PTS)
    assert len(m.cells) == 1
    assert m.cells[0].type == "triangle"
    np.testing.assert_array_equal(m.cells[0].data, TRI_CELLS)
    np.testing.assert_allclose(m.point_data["phi"], TRI_PHI)
    np.testing.assert_allclose(
        m.cell_data["rho"], np.arange(len(TRI_CELLS), dtype=float)
    )


def test_xdmf_inline_xyz(tmp_path):
    fn = tmp_path / "mesh.xdmf"
    _xdmf_inline(fn)
    _check_tri_mesh(read_xdmf(fn))


def test_xdmf_inline_xy_pads(tmp_path):
    fn = tmp_path / "mesh2d.xdmf"
    _xdmf_inline(fn, fmt_2d=True)
    _check_tri_mesh(read_xdmf(fn))


def test_xdmf_hdf5_sidecar(tmp_path):
    h5py = pytest.importorskip("h5py")
    with h5py.File(tmp_path / "mesh.h5", "w") as f:
        f["/data/pts"] = TRI_PTS
        f["/data/conn"] = TRI_CELLS.astype(np.int32)
        f["/data/phi"] = TRI_PHI
    fn = tmp_path / "mesh.xmf"
    fn.write_text(f"""<?xml version="1.0"?>
<Xdmf Version="3.0">
 <Domain>
  <Grid Name="mesh">
   <Geometry GeometryType="XYZ">
    <DataItem DataType="Float" Dimensions="5 3" Format="HDF"
              Precision="8">mesh.h5:/data/pts</DataItem>
   </Geometry>
   <Topology TopologyType="Triangle" NumberOfElements="4">
    <DataItem DataType="Int" Dimensions="4 3" Format="HDF"
              Precision="4">mesh.h5:/data/conn</DataItem>
   </Topology>
   <Attribute Name="phi" AttributeType="Scalar" Center="Node">
    <DataItem DataType="Float" Dimensions="5" Format="HDF"
              Precision="8">mesh.h5:/data/phi</DataItem>
   </Attribute>
  </Grid>
 </Domain>
</Xdmf>
""")
    m = read_xdmf(fn)
    np.testing.assert_allclose(m.points, TRI_PTS)
    np.testing.assert_array_equal(m.cells[0].data, TRI_CELLS)
    np.testing.assert_allclose(m.point_data["phi"], TRI_PHI)


def test_xdmf_mixed_topology_rejected(tmp_path):
    fn = tmp_path / "bad.xdmf"
    fn.write_text("""<?xml version="1.0"?>
<Xdmf><Domain><Grid>
 <Topology TopologyType="Mixed" NumberOfElements="1">
  <DataItem DataType="Int" Dimensions="4" Format="XML">4 0 1 2</DataItem>
 </Topology>
 <Geometry GeometryType="XYZ">
  <DataItem DataType="Float" Dimensions="3 3" Format="XML">
   0 0 0 1 0 0 0 1 0
  </DataItem>
 </Geometry>
</Grid></Domain></Xdmf>
""")
    with pytest.raises(ValueError, match="TopologyType"):
        read_xdmf(fn)


def _write_exodus(path, elem_type=b"TRI3", with_nod_var=True):
    from scipy.io import netcdf_file

    nc = netcdf_file(str(path), "w")
    nc.createDimension("num_dim", 3)
    nc.createDimension("num_nodes", len(TRI_PTS))
    nc.createDimension("num_elem", len(TRI_CELLS))
    nc.createDimension("num_el_blk", 1)
    nc.createDimension("num_el_in_blk1", len(TRI_CELLS))
    nc.createDimension("num_nod_per_el1", 3)
    nc.createDimension("time_step", 2)
    nc.createDimension("len_name", 32)

    v = nc.createVariable("coord", "d", ("num_dim", "num_nodes"))
    v[:] = TRI_PTS.T
    c = nc.createVariable(
        "connect1", "i", ("num_el_in_blk1", "num_nod_per_el1")
    )
    c[:] = (TRI_CELLS + 1).astype(np.int32)  # Exodus is 1-based
    c.elem_type = elem_type

    if with_nod_var:
        nc.createDimension("num_nod_var", 1)
        nm = nc.createVariable(
            "name_nod_var", "c", ("num_nod_var", "len_name")
        )
        name = np.zeros((1, 32), dtype="S1")
        for i, ch in enumerate(b"phi"):
            name[0, i] = bytes([ch])
        nm[:] = name
        pv = nc.createVariable(
            "vals_nod_var1", "d", ("time_step", "num_nodes")
        )
        pv[:] = np.stack([np.zeros(len(TRI_PTS)), TRI_PHI])  # last step
    nc.close()


def test_exodus_roundtrip(tmp_path):
    fn = tmp_path / "mesh.exo"
    _write_exodus(fn)
    m = read_exodus(fn)
    np.testing.assert_allclose(m.points, TRI_PTS)
    assert m.cells[0].type == "triangle"
    np.testing.assert_array_equal(m.cells[0].data, TRI_CELLS)
    np.testing.assert_allclose(m.point_data["phi"], TRI_PHI)


def test_exodus_bad_elem_type(tmp_path):
    fn = tmp_path / "bad.exo"
    _write_exodus(fn, elem_type=b"WEDGE6")
    with pytest.raises(ValueError, match="elem_type"):
        read_exodus(fn)


@pytest.mark.parametrize("maker,name", [
    (_xdmf_inline, "m.xdmf"),
    (_write_exodus, "m.e"),
])
def test_read_grid_end_to_end(tmp_path, maker, name):
    """Full pipeline: format -> Mesh -> UGrid -> interpolation is
    linear-exact on the node field."""
    import jax.numpy as jnp

    fn = tmp_path / name
    maker(fn)
    grid = iu.read_grid(fn)
    ivar = iu.get_point_data_index(grid, "phi")
    r = jnp.asarray([[0.25, 0.25, 0.0], [0.7, 0.6, 0.0]])
    v, ic, found = iu.interpolate_scalar_at(grid, r, ivar)
    assert bool(np.asarray(found).all())
    truth = np.asarray(r)[:, 0] + 2 * np.asarray(r)[:, 1] + 3.0
    np.testing.assert_allclose(np.asarray(v), truth, atol=1e-13)


def _cgns_node(parent, name, label, data=None, dtype=None):
    """Create one CGNS/HDF5 tree node (group + attrs + ' data')."""
    g = parent.create_group(name)
    g.attrs["name"] = np.bytes_(name)
    g.attrs["label"] = np.bytes_(label)
    g.attrs["type"] = np.bytes_(dtype or "MT")
    if data is not None:
        g[" data"] = data
    return g


def _write_cgns(path):
    h5py = pytest.importorskip("h5py")
    with h5py.File(path, "w") as f:
        base = _cgns_node(
            f, "Base", "CGNSBase_t", np.array([2, 2], np.int32), "I4"
        )
        zone = _cgns_node(
            base, "Zone", "Zone_t",
            np.array([[len(TRI_PTS), len(TRI_CELLS), 0]], np.int32), "I4",
        )
        _cgns_node(
            zone, "ZoneType", "ZoneType_t",
            np.frombuffer(b"Unstructured", np.int8), "C1",
        )
        gc = _cgns_node(zone, "GridCoordinates", "GridCoordinates_t")
        for i, nm in enumerate(("CoordinateX", "CoordinateY")):
            _cgns_node(gc, nm, "DataArray_t", TRI_PTS[:, i], "R8")
        sec = _cgns_node(
            zone, "Tris", "Elements_t", np.array([5, 0], np.int32), "I4"
        )
        _cgns_node(
            sec, "ElementRange", "IndexRange_t",
            np.array([1, len(TRI_CELLS)], np.int64), "I8",
        )
        _cgns_node(
            sec, "ElementConnectivity", "DataArray_t",
            (TRI_CELLS + 1).astype(np.int64).reshape(-1), "I8",
        )
        sol = _cgns_node(zone, "Solution", "FlowSolution_t")
        _cgns_node(
            sol, "GridLocation", "GridLocation_t",
            np.frombuffer(b"Vertex", np.int8), "C1",
        )
        _cgns_node(sol, "phi", "DataArray_t", TRI_PHI, "R8")


def test_cgns_roundtrip(tmp_path):
    from interpolate_unstructured_tpu.io.cgns import read_cgns

    fn = tmp_path / "mesh.cgns"
    _write_cgns(fn)
    m = read_cgns(fn)
    # CGNS fixture carries X/Y only: Z pads to zero (same as TRI_PTS)
    np.testing.assert_allclose(m.points, TRI_PTS)
    assert m.cells[0].type == "triangle"
    np.testing.assert_array_equal(m.cells[0].data, TRI_CELLS)
    np.testing.assert_allclose(m.point_data["phi"], TRI_PHI)


def test_cgns_end_to_end(tmp_path):
    import jax.numpy as jnp

    fn = tmp_path / "m.cgns"
    _write_cgns(fn)
    grid = iu.read_grid(fn)
    ivar = iu.get_point_data_index(grid, "phi")
    r = jnp.asarray([[0.25, 0.25, 0.0], [0.7, 0.6, 0.0]])
    v, ic, found = iu.interpolate_scalar_at(grid, r, ivar)
    assert bool(np.asarray(found).all())
    truth = np.asarray(r)[:, 0] + 2 * np.asarray(r)[:, 1] + 3.0
    np.testing.assert_allclose(np.asarray(v), truth, atol=1e-13)


def test_cgns_rejects_non_hdf5(tmp_path):
    pytest.importorskip("h5py")
    from interpolate_unstructured_tpu.io.cgns import read_cgns

    fn = tmp_path / "adf.cgns"
    fn.write_bytes(b"not an hdf5 file")
    with pytest.raises(ValueError, match="ADF"):
        read_cgns(fn)
