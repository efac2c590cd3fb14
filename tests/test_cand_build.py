"""Device candidate-bin builder (ops/cand_build.py) vs the host
reference builder (ops/geometry.py): same bins, same counts, same
candidate sets; plus an end-to-end grid built with the device backend
matching brute-force query results."""

import jax.numpy as jnp
import numpy as np

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu.ops import cand_build, geometry
from interpolate_unstructured_tpu.utils import meshgen
from interpolate_unstructured_tpu.utils.config import IUConfig


def _geometry(points, cells, neighbors, cell_type):
    cp = geometry.gather_cell_points(points, cells)
    normals, _ = geometry.face_normals_and_boundary(
        cp, cells, neighbors, cell_type, len(points)
    )
    offs = np.einsum("cki,cki->ck", cp, normals)
    return cp, normals, offs


def _compare(points, cells, neighbors, cell_type, ndim, k_max):
    cp, normals, offs = _geometry(points, cells, neighbors, cell_type)
    rmin, rmax = points.min(0), points.max(0)
    kwargs = dict(
        bins_per_cell=2.0, max_bins=1 << 22, eps=2e-10, ext_max_k=32
    )
    h = geometry.build_candidate_bins(
        cp, normals, offs, rmin, rmax, ndim, k_max, **kwargs
    )
    d = cand_build.build_candidate_bins_device(
        cp, normals, offs, rmin, rmax, ndim, k_max,
        dtype=np.float64, **kwargs,
    )
    assert d is not None
    h_ids, h_count, h_shape, h_rmin, h_invh, h_ext, h_slot = h
    d_ids, d_count, d_shape, d_rmin, d_invh, d_ext, d_slot = (
        np.asarray(d[0]), np.asarray(d[1]), d[2], d[3], d[4],
        np.asarray(d[5]), np.asarray(d[6]),
    )
    assert d_shape == h_shape
    np.testing.assert_allclose(d_rmin, h_rmin)
    np.testing.assert_allclose(d_invh, h_invh)
    np.testing.assert_array_equal(d_count, h_count)
    assert d_ext.shape == h_ext.shape
    # overflow-bin marking identical; slots ascend in bin order in both
    np.testing.assert_array_equal(d_slot, h_slot)
    # stored candidate SETS identical per bin (rank order may differ on
    # exact score ties)
    n_bins = len(h_count)
    for b in range(n_bins):
        hs = set(h_ids[b][h_ids[b] >= 0])
        ds = set(d_ids[b][d_ids[b] >= 0])
        if h_slot[b] >= 0 and h_ext.shape[1]:
            hs |= set(h_ext[h_slot[b]][h_ext[h_slot[b]] >= 0])
            ds |= set(d_ext[d_slot[b]][d_ext[d_slot[b]] >= 0])
        assert hs == ds, f"bin {b}: host {hs} != device {ds}"


def test_device_matches_host_tet():
    points, cells, neighbors = meshgen.tet_box_mesh(6, 6, 6)
    _compare(points, cells, neighbors, "tetra", 3, k_max=10)


def test_device_matches_host_triangle():
    points, cells, neighbors = meshgen.triangle_rect_mesh(9, 7)
    _compare(points, cells, neighbors, "triangle", 2, k_max=10)


def test_device_built_grid_end_to_end():
    points, cells, neighbors = meshgen.tet_box_mesh(5, 5, 5)
    pd = {"Polynomial": points.sum(1) + 1}
    cfg = IUConfig(cand_build="device")
    g_dev = iu.build_grid(points, cells, neighbors, "tetra",
                          point_data=pd, locate_mode="walk", config=cfg)
    g_ref = iu.build_grid(points, cells, neighbors, "tetra",
                          point_data=pd, locate_mode="bruteforce")
    assert g_dev.cand_table is not None
    rng = np.random.default_rng(9)
    r = jnp.asarray(rng.random((2000, 3)))
    vd, icd, fd = iu.interpolate_at(g_dev, r, jnp.asarray([0]))
    vb, icb, fb = iu.interpolate_at(g_ref, r, jnp.asarray([0]))
    np.testing.assert_array_equal(np.asarray(fd), np.asarray(fb))
    np.testing.assert_allclose(np.asarray(vd), np.asarray(vb), atol=1e-12)


def test_graded_mesh_declines_to_host():
    """A mesh whose AABB spans blow the offset budget must return None
    (the dispatcher then falls back to the host builder)."""
    points, cells, neighbors = meshgen.tet_box_mesh(4, 4, 4)
    points = points.copy()
    # Stretch one vertex so one cell spans the whole domain
    points[0] = [50.0, 50.0, 50.0]
    cp, normals, offs = _geometry(points, cells, neighbors, "tetra")
    res = cand_build.build_candidate_bins_device(
        cp, normals, offs, points.min(0), points.max(0), 3, 10,
        dtype=np.float64, bins_per_cell=2.0, max_bins=1 << 22,
        eps=2e-10, ext_max_k=8,
    )
    # One domain-spanning AABB over a ~9^3 bin grid needs ~729 traced
    # offset iterations — past MAX_OFFSETS, so the device builder must
    # decline even though the small mesh fits the pair-slot budget
    # (unrolling thousands of offsets into one jit would hang/OOM the
    # remote compile instead).
    assert res is None
    cfg = IUConfig(cand_build="auto", cand_build_device_min_cells=1)
    g = iu.build_grid(points, cells, neighbors, "tetra",
                      point_data={"P": points.sum(1)},
                      locate_mode="walk", config=cfg)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.random((500, 3)))
    v, ic, f = iu.interpolate_at(g, r, jnp.asarray([0]))
    vb = np.asarray(r.sum(1))
    got = np.asarray(v[np.asarray(f)])[:, 0]
    np.testing.assert_allclose(
        got, vb[np.asarray(f)], atol=1e-10
    )
