"""Non-convex (L-shaped) domain semantics.

The reference's walk follows the straight segment r0 -> r1 and reports
a boundary exit if it leaves the domain (status -1), even when r1 lies
in another part of the mesh (m_interp_unstructured.f90:708-711). Cold
starts, however, seed near the query and succeed. These parity
semantics matter for masked/segmented geometries.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu.io.convert import get_cell_neighbors
from interpolate_unstructured_tpu.utils import meshgen


@pytest.fixture(scope="module")
def l_grid():
    # 20x20 triangulated square [0,2]^2 with the upper-right quadrant
    # removed -> L shape
    points, cells, _ = meshgen.triangle_rect_mesh(20, 20)
    centers = points[cells].mean(axis=1)
    keep = ~((centers[:, 0] > 1.0) & (centers[:, 1] > 1.0))
    cells = cells[keep]
    neighbors = get_cell_neighbors(cells, points, 2)
    return iu.build_grid(
        points, cells, neighbors, "triangle",
        point_data={"Polynomial": points.sum(1) + 1},
        locate_mode="walk",
    )


def test_hole_queries_not_found(l_grid):
    r = jnp.asarray(
        [[1.5, 1.5, 0.0], [1.9, 1.1, 0.0], [1.1, 1.9, 0.0]]
    )
    ic, found = iu.get_cell(l_grid, r)
    assert not bool(found.any())


def test_arms_found_and_exact(l_grid):
    rng = np.random.default_rng(30)
    # Samples in the two arms only
    a = rng.random((300, 3)) * np.array([2.0, 1.0, 0.0])  # bottom arm
    b = rng.random((300, 3)) * np.array([1.0, 2.0, 0.0])  # left arm
    r = jnp.asarray(np.concatenate([a, b]))
    vals, ic, found = iu.interpolate_scalar_at(l_grid, r, 0)
    assert bool(found.all())
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(r).sum(1) + 1, atol=1e-12
    )


def test_warm_guess_across_hole_exits(l_grid):
    """A walk whose straight path crosses the hole reports a boundary
    exit (reference semantics), while a cold start on the target side
    succeeds."""
    grid = l_grid
    centers = np.asarray(grid.cell_centers())
    # Start cell deep in the bottom-right arm corner
    start = int(
        np.argmin(np.abs(centers[:, 0] - 1.9) + np.abs(centers[:, 1] - 0.1))
    )
    target = jnp.asarray([[0.1, 1.9, 0.0]])  # top-left arm corner
    # The segment (1.9,0.1) -> (0.1,1.9) passes through (1,1)... just
    # inside; use a start/target pair whose segment clearly crosses the
    # hole:
    start2 = int(
        np.argmin(np.abs(centers[:, 0] - 1.9) + np.abs(centers[:, 1] - 0.9))
    )
    tgt2 = jnp.asarray([[1.9, 0.9, 0.0]])  # same point: sanity warm hit
    ic, found = iu.get_cell(grid, tgt2, guess=jnp.asarray([start2]))
    assert bool(found[0])

    # Segment from (1.9, 0.9) up to (0.9, 1.9) cuts the corner of the
    # hole -> boundary exit on the warm path
    tgt3 = jnp.asarray([[0.9, 1.9, 0.0]])
    ic3, rp3, n3, st3 = iu.walk(
        grid,
        jnp.asarray(centers[start2 : start2 + 1]),
        tgt3,
        jnp.asarray([start2], dtype=jnp.int32),
    )
    assert int(st3[0]) == iu.STATUS_BOUNDARY
    # Cold start finds it
    ic_cold, found_cold = iu.get_cell(grid, tgt3)
    assert bool(found_cold[0])
    assert bool(iu.point_is_inside_cell(grid, tgt3, ic_cold)[0])


def test_boundary_points_include_hole_edge(l_grid):
    b = np.asarray(l_grid.point_is_at_boundary)
    pts = np.asarray(l_grid.points)
    # Points on the hole edge x=1, 1<y<2 must be flagged
    on_hole_edge = (
        (np.abs(pts[:, 0] - 1.0) < 1e-12) & (pts[:, 1] > 1.0 + 1e-12)
    )
    assert on_hole_edge.any()
    assert b[on_hole_edge].all()
