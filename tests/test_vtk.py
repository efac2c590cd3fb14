"""VTK export round-trip tests (test_vtk.f90 + stronger assertions:
the reference only smoke-tests; here we re-read what we wrote)."""

import numpy as np

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu.io.vtu import read_vtu


def _roundtrip(grid, tmp_path, name):
    fn = tmp_path / f"{name}.vtu"
    iu.write_vtk(grid, fn)
    m = read_vtu(fn)
    assert m.cells[0].type == grid.cell_type
    # Points are downcast to Float32 on write (m_vtk.f90:79)
    np.testing.assert_allclose(
        m.points, np.asarray(grid.points), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(m.cells[0].data, np.asarray(grid.cells))
    for i, nm in enumerate(grid.point_data_names):
        np.testing.assert_allclose(
            m.point_data[nm], np.asarray(grid.point_data[:, i]), atol=1e-12
        )
    for i, nm in enumerate(grid.cell_data_names):
        np.testing.assert_allclose(
            m.cell_data[nm], np.asarray(grid.cell_data[:, i]), atol=1e-12
        )
    for i, nm in enumerate(grid.icell_data_names):
        np.testing.assert_array_equal(
            m.cell_data[nm], np.asarray(grid.icell_data[:, i])
        )
    return m


def test_vtk_roundtrip_all_fixtures(
    triangle_grid, quad_grid, tetra_grid, tmp_path
):
    _roundtrip(triangle_grid, tmp_path, "triangle")
    _roundtrip(quad_grid, tmp_path, "quad")
    _roundtrip(tetra_grid, tmp_path, "tetra")


def test_vtk_roundtrip_with_added_data(triangle_grid, tmp_path):
    grid = triangle_grid
    grid, _ = iu.add_point_data(
        grid, "vx", -np.asarray(grid.points)[:, 1]
    )
    grid, _ = iu.add_cell_data(
        grid, "rho", np.arange(grid.n_cells, dtype=float)
    )
    grid, _ = iu.add_icell_data(grid, "mat", np.arange(grid.n_cells))
    m = _roundtrip(grid, tmp_path, "with_data")
    assert "vx" in m.point_data
    assert "rho" in m.cell_data and "mat" in m.cell_data


def test_vtk_reload_as_grid(triangle_grid, tmp_path):
    """A written VTU can be loaded back through the full pipeline."""
    fn = tmp_path / "reload.vtu"
    iu.write_vtk(triangle_grid, fn)
    grid2 = iu.read_grid(fn)
    assert grid2.n_cells == triangle_grid.n_cells
    assert grid2.cell_type == triangle_grid.cell_type
    np.testing.assert_array_equal(
        np.asarray(grid2.neighbors), np.asarray(triangle_grid.neighbors)
    )
