"""Vectorized mesh geometry preprocessing.

Batch (whole-mesh) vectorizations of the per-cell loops in the reference:

* cell vertex gather        — set_cell_points, m_interp_unstructured.f90:291-302
* outward unit face normals — set_face_normal_vectors, :306-370
* boundary point marking    — :338-339, :361-362
* cell volumes/areas        — set_cell_volumes, :372-410

These run once per grid load, on the host in float64 (numpy), so that
derived geometry is exact regardless of the device compute dtype.  The
face convention is load-bearing and shared with the converter: face ``k``
of a cell consists of vertices ``(k, k+1)`` for tri/quad and
``(k, k+1, k+2)`` cyclic for tets; vertex ``k`` always lies ON face ``k``
(exploited by ray-face distances, :751, and inside tests, :779).
"""

from __future__ import annotations

import numpy as np

CELL_TYPES = ("triangle", "quad", "tetra")
N_POINTS_PER_CELL = {"triangle": 3, "quad": 4, "tetra": 4}
# n_faces_per_cell == n_points_per_cell for tri/quad/tet (:865)
NDIM_OF_CELL_TYPE = {"triangle": 2, "quad": 2, "tetra": 3}


def gather_cell_points(points: np.ndarray, cells: np.ndarray) -> np.ndarray:
    """(n_points,3),(n_cells,npc) -> (n_cells,npc,3) per-cell vertex coords."""
    return points[cells]


def face_normals_and_boundary(
    cell_points: np.ndarray, cells: np.ndarray, neighbors: np.ndarray,
    cell_type: str, n_points: int
):
    """Outward unit face normals + boundary point flags.

    Returns:
      normals: (n_cells, nf, 3) outward unit normal of face k
      point_is_at_boundary: (n_points,) bool, True for points on faces
        with no neighbor
    """
    p = cell_points  # (C, npc, 3)
    npc = p.shape[1]
    center = p.mean(axis=1, keepdims=True)  # (C, 1, 3)

    if cell_type in ("triangle", "quad"):
        # Cell-plane normal assuming flat cell (:322-324)
        normal_cell = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 1])  # (C, 3)
        k1 = (np.arange(npc) + 1) % npc
        edge = p[:, k1] - p  # (C, npc, 3)
        normals = np.cross(edge, normal_cell[:, None, :])  # (C, npc, 3)
        face_pts_idx = np.stack([np.arange(npc), k1], axis=1)  # (npc, 2)
    elif cell_type == "tetra":
        k1 = (np.arange(npc) + 1) % npc
        k2 = (np.arange(npc) + 2) % npc
        normals = np.cross(p[:, k1] - p, p[:, k2] - p[:, k1])  # (C, 4, 3)
        face_pts_idx = np.stack([np.arange(npc), k1, k2], axis=1)  # (npc, 3)
    else:
        raise ValueError(f"Unsupported cell type {cell_type!r}")

    # Sign-fix outward: vertex k lies on face k, so (p_k - center) . n > 0
    outward = np.einsum("cki,cki->ck", p - center, normals)
    normals = np.where((outward < 0)[..., None], -normals, normals)
    normals = normals / np.linalg.norm(normals, axis=-1, keepdims=True)

    # Boundary points: vertices of faces with no neighbor
    point_is_at_boundary = np.zeros(n_points, dtype=bool)
    no_neighbor = neighbors < 0  # (C, nf)
    for k in range(npc):
        cells_k = cells[no_neighbor[:, k]]  # cells whose face k is boundary
        if len(cells_k):
            point_is_at_boundary[cells_k[:, face_pts_idx[k]].reshape(-1)] = True

    return normals, point_is_at_boundary


def cell_volumes(cell_points: np.ndarray, cell_type: str) -> np.ndarray:
    """Area (2D) / volume (3D) per cell (:372-410).

    Triangle: 0.5*|e1 x e2|; quad: split into triangles (p1,p2,p3) +
    (p1,p3,p4); tetra: signed triple product / 6 (assumes positive
    orientation, :400-408).
    """
    p = cell_points
    if cell_type == "triangle":
        return 0.5 * np.linalg.norm(
            np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=-1
        )
    if cell_type == "quad":
        a1 = 0.5 * np.linalg.norm(
            np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=-1
        )
        a2 = 0.5 * np.linalg.norm(
            np.cross(p[:, 2] - p[:, 0], p[:, 3] - p[:, 0]), axis=-1
        )
        return a1 + a2
    if cell_type == "tetra":
        v12 = p[:, 1] - p[:, 0]
        v13 = p[:, 2] - p[:, 0]
        v14 = p[:, 3] - p[:, 0]
        return np.einsum("ci,ci->c", v12, np.cross(v13, v14)) / 6.0
    raise ValueError(f"Unsupported cell type {cell_type!r}")


def build_bin_seed_table(
    cell_centers: np.ndarray,
    rmin: np.ndarray,
    rmax: np.ndarray,
    ndim: int,
    bins_per_cell: float = 2.0,
    max_bins: int = 1 << 22,
):
    """Uniform-grid cold-start seed table: for every bin of a regular grid
    over the bounding box, the cell whose center is nearest the bin center.

    This replaces the reference's kd-tree cold start
    (find_nearby_cell_kdtree, m_interp_unstructured.f90:272-288) with a
    TPU-friendly O(1) gather: ``seed = table[bin_of(r)]``.  The contract
    only requires a *nearby* cell (README.md:5-6) since the neighbor walk
    corrects the rest.

    Returns (table, bin_shape, bin_rmin, bin_inv_h):
      table: (prod(bin_shape),) int32 seed cell per bin (C-order flat)
      bin_shape: tuple of 3 ints (1 for unused dims)
      bin_rmin: (3,) float64 grid origin
      bin_inv_h: (3,) float64 inverse bin size (0 for unused dims)
    """
    from scipy.spatial import cKDTree

    n_cells = len(cell_centers)
    extent = np.asarray(rmax, dtype=np.float64) - np.asarray(rmin, np.float64)
    active = np.zeros(3, dtype=bool)
    active[:ndim] = extent[:ndim] > 0

    n_bins_target = min(max(int(bins_per_cell * n_cells), 1), max_bins)
    n_active = int(active.sum())
    bin_shape = np.ones(3, dtype=np.int64)
    if n_active > 0:
        # Distribute bins across active dims proportionally to extent
        geo_mean = np.exp(np.log(extent[active]).mean())
        per_unit = (n_bins_target ** (1.0 / n_active)) / geo_mean
        bin_shape[active] = np.maximum(
            1, np.round(extent[active] * per_unit).astype(np.int64)
        )

    h = np.where(active, extent / bin_shape, 1.0)
    inv_h = np.where(active, 1.0 / h, 0.0)

    # Bin centers (flat, C-order)
    axes = [
        (np.arange(bin_shape[d]) + 0.5) * h[d] + rmin[d]
        if active[d]
        else np.array([0.5 * (rmin[d] + rmax[d])])
        for d in range(3)
    ]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    bin_centers = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)

    tree = cKDTree(cell_centers)
    _, seed = tree.query(bin_centers, k=1, workers=-1)
    return (
        seed.astype(np.int32),
        tuple(int(s) for s in bin_shape),
        np.asarray(rmin, dtype=np.float64),
        inv_h,
    )
