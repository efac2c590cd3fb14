"""Grid model, registry, preprocessing, and walk-status tests —
including the gaps SURVEY.md §4 flags as untested in the reference
(coord_scale_factor, masks on the walk, reserve/add capacity)."""

import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu.ops import locate
from interpolate_unstructured_tpu.utils import meshgen


def test_preprocessing_geometry(triangle_grid):
    g = triangle_grid
    assert g.n_points == 9 and g.n_cells == 8
    assert g.n_points_per_cell == 3 and g.n_faces_per_cell == 3
    # Unit outward normals
    norms = np.linalg.norm(np.asarray(g.face_normals), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-14)
    # Face normals point away from the cell center
    cp = np.asarray(g.cell_points)
    centers = cp.mean(axis=1, keepdims=True)
    outward = np.einsum("cki,cki->ck", cp - centers, np.asarray(g.face_normals))
    assert (outward > 0).all()
    # Areas tile the domain: total = 2x2 square
    np.testing.assert_allclose(np.asarray(g.cell_volume).sum(), 4.0, atol=1e-12)
    # All 8 outer edge points are boundary; center point is interior
    b = np.asarray(g.point_is_at_boundary)
    assert b.sum() == 8
    pts = np.asarray(g.points)
    interior = (
        (pts[:, 0] > 0) & (pts[:, 0] < 2) & (pts[:, 1] > 0) & (pts[:, 1] < 2)
    )
    assert not b[interior].any()


def test_tetra_volumes_positive(tetra_grid):
    vols = np.asarray(tetra_grid.cell_volume)
    assert (vols > 0).all(), "fixture tets are positively oriented"
    np.testing.assert_allclose(vols.sum(), 8.0, atol=1e-12)  # [-1,1]^3 box


def test_coord_scale_factor(test_data_dir):
    g1 = iu.read_grid(test_data_dir / "triangle.vtu")
    g2 = iu.read_grid(test_data_dir / "triangle.vtu", coord_scale_factor=10.0)
    np.testing.assert_allclose(
        np.asarray(g2.points), 10.0 * np.asarray(g1.points), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(g2.cell_volume), 100.0 * np.asarray(g1.cell_volume),
        rtol=1e-12,
    )
    # Interpolation still exact on the scaled grid
    ivar = iu.get_point_data_index(g2, "Polynomial")
    g2 = iu.set_point_data(g2, ivar, np.asarray(g2.points).sum(1) + 1)
    r = jnp.asarray([[3.3, 7.7, 0.0], [15.0, 1.0, 0.0]])
    vals, _, found = iu.interpolate_scalar_at(g2, r, ivar)
    assert bool(found.all())
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(r).sum(1) + 1, atol=1e-13
    )


def test_reserve_then_add_keeps_shape(triangle_grid):
    """Reserve pre-allocates columns; add fills them without growing —
    the fixed version of the reference's capacity logic (SURVEY §2.2)."""
    g = iu.reserve_cell_data_storage(triangle_grid, 2)
    assert g.cell_data.shape == (8, 2)
    assert g.n_cell_data == 0
    g, i0 = iu.add_cell_data(g, "a", np.ones(8))
    g, i1 = iu.add_cell_data(g, "b", 2 * np.ones(8))
    assert (i0, i1) == (0, 1)
    assert g.cell_data.shape == (8, 2)  # filled reserved storage
    g, i2 = iu.add_cell_data(g, "c")
    assert i2 == 2 and g.cell_data.shape == (8, 3)  # grew
    np.testing.assert_allclose(np.asarray(g.cell_data[:, 2]), 0.0)
    assert iu.get_cell_data_index(g, "b") == 1
    assert iu.get_cell_data_index(g, "missing") == -1

    # icell family has independent capacity (reference bug not replicated)
    g2 = iu.reserve_icell_data_storage(triangle_grid, 1)
    g2, j0 = iu.add_icell_data(g2, "m", np.arange(8))
    assert j0 == 0 and g2.icell_data.shape == (8, 1)
    assert g2.icell_data.dtype == jnp.int32


def test_walk_statuses(test_data_dir):
    grid = iu.read_grid(test_data_dir / "triangle.vtu", locate_mode="walk")
    centers = np.asarray(grid.cell_centers())
    c0 = jnp.asarray(centers[:1])
    ic0 = jnp.asarray([0], dtype=jnp.int32)

    # Arrive inside the domain
    ic, r_p, n, st = iu.walk(grid, c0, jnp.asarray([[1.0, 1.2, 0.0]]), ic0)
    assert int(st[0]) == iu.STATUS_ARRIVED and int(ic[0]) >= 0

    # Walk straight out of the domain
    ic, r_p, n, st = iu.walk(grid, c0, jnp.asarray([[-5.0, 0.5, 0.0]]), ic0)
    assert int(st[0]) == iu.STATUS_BOUNDARY
    assert int(ic[0]) < 0
    # r_p is the boundary intersection: on the domain edge
    rp = np.asarray(r_p[0])
    assert abs(rp[0] - 0.0) < 1e-12  # exits through x = 0

    # Degenerate zero-length walk short-circuits
    ic, r_p, n, st = iu.walk(grid, c0, c0, ic0)
    assert int(st[0]) == iu.STATUS_ARRIVED and int(ic[0]) == 0


def test_walk_mask_change(test_data_dir):
    grid = iu.read_grid(test_data_dir / "triangle.vtu", locate_mode="walk")
    centers = np.asarray(grid.cell_centers())
    mat = (centers[:, 0] > 1.0).astype(np.int32)
    grid, imat = iu.add_icell_data(grid, "mat", mat)
    # Start in a left cell, walk right across the material interface
    left = int(np.argmin(centers[:, 0]))
    ic, r_p, n, st = iu.walk(
        grid,
        jnp.asarray(centers[left : left + 1]),
        jnp.asarray([[1.9, centers[left, 1], 0.0]]),
        jnp.asarray([left], dtype=jnp.int32),
        i_icell_mask=imat,
    )
    assert int(st[0]) == iu.STATUS_MASK_CHANGED
    assert mat[int(ic[0])] == 1  # stopped in the first other-material cell


def test_bin_seed_reasonable(test_data_dir):
    grid = iu.read_grid(test_data_dir / "tetra.vtu", locate_mode="walk")
    rng = np.random.default_rng(8)
    r = jnp.asarray(
        np.asarray(grid.rmin)
        + rng.random((500, 3))
        * (np.asarray(grid.rmax) - np.asarray(grid.rmin))
    )
    seeds = np.asarray(iu.bin_seed(grid, r))
    assert ((seeds >= 0) & (seeds < grid.n_cells)).all()
    # Seeds are near the query: within a few cell diameters
    centers = np.asarray(grid.cell_centers())
    d = np.linalg.norm(centers[seeds] - np.asarray(r), axis=1)
    mean_h = (8.0 / grid.n_cells) ** (1 / 3)  # [-1,1]^3 box volume 8
    assert d.max() < 6 * mean_h


def test_meshgen_tet_mesh_valid():
    points, cells, neighbors = meshgen.tet_box_mesh(3, 3, 3)
    assert len(cells) == 6 * 27
    grid = iu.build_grid(
        points, cells, neighbors, "tetra",
        point_data={"Polynomial": points.sum(1) + 1},
        locate_mode="walk",
    )
    vols = np.asarray(grid.cell_volume)
    assert (vols > 0).all()
    np.testing.assert_allclose(vols.sum(), 1.0, atol=1e-12)
    rng = np.random.default_rng(9)
    r = jnp.asarray(rng.random((400, 3)))
    vals, ic, found = iu.interpolate_scalar_at(grid, r, 0)
    assert bool(found.all())
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(r).sum(1) + 1, atol=1e-13
    )


def test_meshgen_quad_mesh_valid():
    points, cells, neighbors = meshgen.quad_rect_mesh(4, 5)
    grid = iu.build_grid(
        points, cells, neighbors, "quad",
        point_data={"Polynomial": points.sum(1) + 1},
    )
    rng = np.random.default_rng(10)
    r = np.asarray(grid.rmin) + rng.random((200, 3)) * (
        np.asarray(grid.rmax) - np.asarray(grid.rmin)
    )
    vals, ic, found = iu.interpolate_scalar_at(grid, jnp.asarray(r), 0)
    assert bool(found.all())
    np.testing.assert_allclose(np.asarray(vals), r.sum(1) + 1, atol=1e-13)


def test_locate_modes_agree_large_mesh():
    points, cells, neighbors = meshgen.triangle_rect_mesh(12, 12)
    kw = dict(point_data={"Polynomial": points.sum(1) + 1})
    g_b = iu.build_grid(points, cells, neighbors, "triangle",
                        locate_mode="bruteforce", **kw)
    g_w = iu.build_grid(points, cells, neighbors, "triangle",
                        locate_mode="walk", **kw)
    rng = np.random.default_rng(11)
    r = jnp.asarray(rng.random((1000, 3)) * np.array([2.0, 2.0, 0.0]))
    ic_b, f_b = iu.get_cell(g_b, r)
    ic_w, f_w = iu.get_cell(g_w, r)
    np.testing.assert_array_equal(np.asarray(f_b), np.asarray(f_w))
    # Located cells must contain the query in both modes
    assert bool(iu.point_is_inside_cell(g_b, r, ic_b).all())
    assert bool(iu.point_is_inside_cell(g_w, r, ic_w).all())


def test_validate_grid(triangle_grid, tetra_grid):
    from interpolate_unstructured_tpu import validate_grid

    assert validate_grid(triangle_grid) == []
    assert validate_grid(tetra_grid) == []

    # Corrupt adjacency -> caught
    import dataclasses
    import jax.numpy as jnp

    bad = dataclasses.replace(
        triangle_grid,
        neighbors=triangle_grid.neighbors.at[0, 0].set(5),
    )
    with pytest.raises(ValueError, match="asymmetric"):
        validate_grid(bad)


def test_out_of_range_guess_reseeds(test_data_dir):
    """The reference error-stops on guess > n_cells (:490); under jit we
    reseed cold instead — results must match a cold query."""
    grid = iu.read_grid(test_data_dir / "triangle.vtu", locate_mode="walk")
    r = jnp.asarray([[0.5, 0.5, 0.0], [1.5, 1.5, 0.0]])
    bad_guess = jnp.asarray([9999, 12345], dtype=jnp.int32)
    ic_bad, f_bad = iu.get_cell(grid, r, guess=bad_guess)
    ic_cold, f_cold = iu.get_cell(grid, r)
    np.testing.assert_array_equal(np.asarray(f_bad), np.asarray(f_cold))
    assert bool(iu.point_is_inside_cell(grid, r, ic_bad).all())


def test_validate_grid_reports_out_of_range_indices(triangle_grid):
    """Out-of-range neighbor/cell indices must produce a readable
    report, not an IndexError from the validator itself."""
    import dataclasses

    import jax.numpy as jnp

    from interpolate_unstructured_tpu.utils.validate import validate_grid

    g = triangle_grid
    bad_nb = jnp.asarray(np.asarray(g.neighbors)).at[0, 0].set(g.n_cells + 5)
    bad = dataclasses.replace(g, neighbors=bad_nb)
    problems = validate_grid(bad, strict=False)
    assert any("neighbor indices out of range" in p for p in problems)

    bad_cells = jnp.asarray(np.asarray(g.cells)).at[0, 0].set(g.n_points + 3)
    bad2 = dataclasses.replace(g, cells=bad_cells)
    problems2 = validate_grid(bad2, strict=False)
    assert any("connectivity indices out of range" in p for p in problems2)
