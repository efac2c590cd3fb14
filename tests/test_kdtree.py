"""Batched kd-tree: exact 1-NN parity with scipy's cKDTree."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from interpolate_unstructured_tpu.ops import kdtree


@pytest.mark.parametrize("n", [1, 2, 7, 64, 1000])
def test_nearest_matches_scipy(n):
    rng = np.random.default_rng(n)
    pts = rng.random((n, 3))
    tree = kdtree.build_kdtree(pts)
    q = rng.random((256, 3)) * 1.4 - 0.2
    idx, d2 = kdtree.nearest(tree, jnp.asarray(q))
    ref_d, ref_i = cKDTree(pts).query(q, k=1)
    # Distances must match exactly (indices can differ on ties)
    np.testing.assert_allclose(
        np.sqrt(np.asarray(d2)), ref_d, rtol=1e-12, atol=1e-12
    )
    d_ours = np.linalg.norm(pts[np.asarray(idx)] - q, axis=1)
    np.testing.assert_allclose(d_ours, ref_d, rtol=1e-12, atol=1e-12)


def test_kdtree_as_seed_backend(tetra_grid):
    """kd-tree seeding reproduces the reference's cold-start contract:
    seed with the nearest cell center, then walk."""
    import interpolate_unstructured_tpu as iu

    grid = tetra_grid
    centers = np.asarray(grid.cell_centers())
    tree = kdtree.build_kdtree(centers)
    rng = np.random.default_rng(5)
    r = np.asarray(grid.rmin) + rng.random((200, 3)) * (
        np.asarray(grid.rmax) - np.asarray(grid.rmin)
    )
    seeds, _ = kdtree.nearest(tree, jnp.asarray(r))
    ref_i = cKDTree(centers).query(r, k=1)[1]
    # Seeds match scipy's nearest-center (ties allowed to differ)
    d_ours = np.linalg.norm(centers[np.asarray(seeds)] - r, axis=1)
    d_ref = np.linalg.norm(centers[ref_i] - r, axis=1)
    np.testing.assert_allclose(d_ours, d_ref, rtol=1e-12, atol=1e-12)

    # Warm-start the public locate with kd-tree seeds: same cells found
    ic_kd, f_kd = iu.get_cell(grid, jnp.asarray(r), guess=seeds)
    ic_bin, f_bin = iu.get_cell(grid, jnp.asarray(r))
    np.testing.assert_array_equal(np.asarray(f_kd), np.asarray(f_bin))
    ok = np.asarray(f_kd)
    assert bool(
        iu.point_is_inside_cell(grid, jnp.asarray(r), ic_kd)[ok].all()
    )


def test_seed_mode_kdtree_matches_bins():
    """seed_mode="kdtree" as a first-class backend: same located cells
    and interpolated values as the default bin-table seeding on a mesh
    large enough to use the walk path."""
    import interpolate_unstructured_tpu as iu
    from interpolate_unstructured_tpu.utils import meshgen
    from interpolate_unstructured_tpu.utils.config import IUConfig

    points, cells, neighbors = meshgen.triangle_rect_mesh(8, 8)
    poly = points.sum(axis=1) + 1.0

    def make(seed_mode):
        return iu.build_grid(
            points,
            cells,
            neighbors,
            "triangle",
            point_data={"Polynomial": poly},
            locate_mode="walk",
            config=IUConfig(seed_mode=seed_mode),
        )

    g_bins = make("bins")
    g_kd = make("kdtree")
    assert g_kd.kd_node_points is not None
    assert g_kd.kd_max_depth > 0

    rng = np.random.default_rng(11)
    r = rng.random((500, 3)) * np.array([2.0, 2.0, 0.0])
    r = jnp.asarray(r)

    ic_b, f_b = iu.get_cell(g_bins, r)
    ic_k, f_k = iu.get_cell(g_kd, r)
    np.testing.assert_array_equal(np.asarray(f_b), np.asarray(f_k))
    np.testing.assert_array_equal(np.asarray(ic_b), np.asarray(ic_k))

    vals, _, found = iu.interpolate_scalar_at(g_kd, r, 0)
    assert bool(found.all())
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(r.sum(axis=1) + 1.0), atol=1e-13
    )

    # Warm restarts keep working with the kd backend (guess path)
    ic2, f2 = iu.get_cell(g_kd, r, guess=ic_k)
    np.testing.assert_array_equal(np.asarray(ic2), np.asarray(ic_k))
