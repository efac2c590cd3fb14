"""Randomized-geometry stress tests: scipy Delaunay triangulations.

The bundled fixtures are structured and well-shaped; random Delaunay
meshes bring slivers, near-degenerate cells and irregular adjacency —
the failure modes geometric tolerances exist for.  Oracle strategy as
the reference's (linear exactness, test_triangle.f90:42-48) plus
walk-vs-bruteforce agreement on the same queries.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu.io.convert import get_cell_neighbors

scipy_spatial = pytest.importorskip("scipy.spatial")


def _delaunay_grid(seed, ndim, locate_mode):
    rng = np.random.default_rng(seed)
    n_pts = 120 if ndim == 2 else 80
    pts = rng.random((n_pts, ndim))
    tri = scipy_spatial.Delaunay(pts)
    cells = np.asarray(tri.simplices, dtype=np.int64)
    points = np.pad(pts, ((0, 0), (0, 3 - ndim)))

    if ndim == 3:
        # Delaunay tets come in both orientations; the volume/weight
        # formulas assume positive orientation (reference :400-408)
        v = points[cells]
        vol = np.einsum(
            "ij,ij->i",
            np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]),
            v[:, 3] - v[:, 0],
        )
        flip = vol < 0
        cells[flip, 1], cells[flip, 2] = (
            cells[flip, 2].copy(),
            cells[flip, 1].copy(),
        )

    cell_type = "triangle" if ndim == 2 else "tetra"
    neighbors = get_cell_neighbors(
        cells, points, n_points_face=ndim
    )
    poly = points.sum(axis=1) + 1.0
    return iu.build_grid(
        points,
        cells,
        neighbors,
        cell_type,
        point_data={"Polynomial": poly},
        locate_mode=locate_mode,
    ), cells, points


def _interior_queries(rng, cells, points, n):
    """Random points strictly inside random cells (uniform barycentric
    with a margin, so hull-boundary ambiguity never enters)."""
    pick = rng.integers(0, len(cells), n)
    npc = cells.shape[1]
    w = rng.dirichlet(np.ones(npc), size=n) * 0.94 + 0.06 / npc
    return np.einsum("qk,qkd->qd", w, points[cells[pick]]), pick


@pytest.mark.parametrize("ndim", [2, 3])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_delaunay_linear_exactness(ndim, seed):
    grid, cells, points = _delaunay_grid(seed, ndim, "walk")
    rng = np.random.default_rng(100 + seed)
    r, _ = _interior_queries(rng, cells, points, 512)
    r = jnp.asarray(r)
    v, ic, found = iu.interpolate_scalar_at(grid, r, 0)
    assert bool(found.all())
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(r).sum(axis=1) + 1.0, atol=5e-13
    )
    # the found cell really contains the query
    inside = iu.point_is_inside_cell(grid, r, ic)
    assert bool(inside.all())


@pytest.mark.parametrize("seed", [3, 4])
def test_delaunay_walk_matches_bruteforce(seed):
    g_walk, cells, points = _delaunay_grid(seed, 3, "walk")
    g_bf, _, _ = _delaunay_grid(seed, 3, "bruteforce")
    rng = np.random.default_rng(200 + seed)
    r, _ = _interior_queries(rng, cells, points, 256)
    r = jnp.asarray(r)
    vw, icw, fw = iu.interpolate_scalar_at(g_walk, r, 0)
    vb, icb, fb = iu.interpolate_scalar_at(g_bf, r, 0)
    assert bool(fw.all()) and bool(fb.all())
    np.testing.assert_allclose(np.asarray(vw), np.asarray(vb), atol=1e-12)


@pytest.mark.parametrize("seed", [5])
def test_delaunay_warm_restart(seed):
    """Perturbed re-queries with previous cells as guesses stay exact
    (the benchmark.f90 warm protocol on irregular geometry)."""
    grid, cells, points = _delaunay_grid(seed, 2, "walk")
    rng = np.random.default_rng(300 + seed)
    r, _ = _interior_queries(rng, cells, points, 512)
    v1, ic1, f1 = iu.interpolate_scalar_at(grid, jnp.asarray(r), 0)
    assert bool(f1.all())
    r2 = r + rng.normal(scale=0.01, size=r.shape) * [1, 1, 0]
    v2, ic2, f2 = iu.interpolate_scalar_at(
        grid, jnp.asarray(r2), 0, guess=ic1
    )
    exact = r2.sum(axis=1) + 1.0
    got = np.asarray(v2)
    # perturbed points may leave the hull; wherever found, exact
    assert int(np.asarray(f2).sum()) > 400
    np.testing.assert_allclose(
        got[np.asarray(f2)], exact[np.asarray(f2)], atol=5e-13
    )


def test_delaunay_trace_circular_field():
    """Field-line tracing on an irregular triangulation: circular
    orbits stay at radius ~1 and the arc length tracks the swept angle
    until the output buffer fills."""
    rng = np.random.default_rng(9)
    pts = rng.random((300, 2)) * 4.0 - 2.0
    tri = scipy_spatial.Delaunay(pts)
    cells = np.asarray(tri.simplices, dtype=np.int64)
    points = np.pad(pts, ((0, 0), (0, 1)))
    neighbors = get_cell_neighbors(cells, points, n_points_face=2)
    grid = iu.build_grid(
        points, cells, neighbors, "triangle",
        point_data={"vx": -points[:, 1], "vy": points[:, 0]},
        locate_mode="walk",
    )
    y0 = jnp.asarray([[1.0, 0.0, 0.0]])
    res = iu.integrate_along_field(
        grid, y0, (0, 1), nvar=1,
        sub_int=lambda f, y: jnp.ones(1),
        min_dx=1e-6, max_dx=0.05, max_steps=400,
        rtol=1e-5, atol=1e-5,
    )
    # the circle never leaves the hull: the buffer fills while still
    # circling (n_steps == max_steps + 1 flags this, :1167-1168)
    from interpolate_unstructured_tpu.trace import BM_NOT_REACHED

    assert int(res.n_steps[0]) == 401
    assert int(res.boundary_material[0]) == BM_NOT_REACHED
    xs = np.asarray(res.y[0, :400])
    radii = np.hypot(xs[:, 0], xs[:, 1])
    # the interpolated field is only piecewise-linear on an irregular
    # mesh, so the circle drifts at mesh-resolution order
    np.testing.assert_allclose(radii, 1.0, atol=0.05)
    # arc length consistent with the angle swept
    ang = np.unwrap(np.arctan2(xs[:, 1], xs[:, 0]))
    assert abs(float(xs[-1, 2]) - (ang[-1] - ang[0])) < 0.1
