"""Edge cases on the reference's debug micro-fixtures: a single
tetrahedron (tetra_cell.vtu) and two tets sharing a face
(tetra_two_cell.vtu) — the smallest possible walk/adjacency cases."""

import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_unstructured_tpu as iu


@pytest.fixture(scope="module")
def one_tet(test_data_dir):
    return iu.read_grid(test_data_dir / "tetra_cell.vtu")


@pytest.fixture(scope="module")
def two_tets(test_data_dir):
    return iu.read_grid(test_data_dir / "tetra_two_cell.vtu")


def test_single_cell_mesh(one_tet):
    grid = one_tet
    assert grid.n_cells == 1
    assert bool((np.asarray(grid.neighbors) == -1).all())
    assert bool(np.asarray(grid.point_is_at_boundary).all())
    center = grid.cell_centers()
    ic, found = iu.get_cell(grid, center)
    assert bool(found[0]) and int(ic[0]) == 0
    # Interpolation at the centroid = mean of vertex values
    ivar = iu.get_point_data_index(grid, "Polynomial")
    if ivar >= 0:
        v, _, _ = iu.interpolate_scalar_at(grid, center, ivar)
        expected = float(np.asarray(grid.point_data)[:, ivar].mean())
        np.testing.assert_allclose(float(v[0]), expected, atol=1e-12)
    # Outside: behind each face
    out = center - 10.0 * jnp.asarray(grid.face_normals)[0, 0][None, :] * -1
    ic, found = iu.get_cell(grid, out)
    assert not bool(found[0])


def test_two_cell_walk(two_tets):
    grid = two_tets
    assert grid.n_cells == 2
    nb = np.asarray(grid.neighbors)
    assert (nb >= 0).sum() == 2  # one shared face, linked both ways
    centers = np.asarray(grid.cell_centers())
    # Walk from cell 0's center to cell 1's center crosses one face
    ic, r_p, n, st = iu.walk(
        grid,
        jnp.asarray(centers[:1]),
        jnp.asarray(centers[1:2]),
        jnp.asarray([0], dtype=jnp.int32),
    )
    assert int(st[0]) == iu.STATUS_ARRIVED
    assert int(ic[0]) == 1
    # And in reverse
    ic, _, _, st = iu.walk(
        grid,
        jnp.asarray(centers[1:2]),
        jnp.asarray(centers[:1]),
        jnp.asarray([1], dtype=jnp.int32),
    )
    assert int(ic[0]) == 0 and int(st[0]) == iu.STATUS_ARRIVED

    # Linear exactness on both cells
    ivar = iu.get_point_data_index(grid, "Polynomial")
    grid2 = iu.set_point_data(
        grid, max(ivar, 0), np.asarray(grid.points).sum(1) + 1
    ) if ivar >= 0 else None
    if grid2 is not None:
        r = jnp.asarray(centers)
        v, _, f = iu.interpolate_scalar_at(grid2, r, ivar)
        assert bool(f.all())
        np.testing.assert_allclose(
            np.asarray(v), centers.sum(1) + 1, atol=1e-13
        )
