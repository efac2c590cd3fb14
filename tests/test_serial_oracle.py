"""Cross-validation against the independent serial C++ oracle.

``native/serial_oracle.cc`` reimplements the reference algorithm
(m_interp_unstructured.f90: nearest-point seed :272-288, neighbor walk
:664-763, simplex weights :529-586) with no code shared with any JAX
path here.  BASELINE.json demands <=1e-12 agreement with the Fortran
binaries; those are unbuildable in this container (BASELINE.md), so
this oracle is the independent implementation the committed goldens
cannot provide — a common-mode misreading of the reference would have
to be made twice, in two languages, to pass.

Checked per mesh family (f64):

* identical found masks on mixed inside/outside batches,
* value agreement at 1e-12 on smooth NONLINEAR data (linear data
  would hide weight-normalization errors),
* cell agreement up to shared-face ties (values decide those).
"""

import numpy as np
import pytest
import jax.numpy as jnp

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu.utils import meshgen, serial_oracle

pytestmark = pytest.mark.skipif(
    not serial_oracle.available(), reason="no C++ toolchain"
)


def _nonlinear(pts):
    pts = np.asarray(pts, np.float64)
    return np.sin(3.0 * pts[:, 0]) * pts[:, 1] + np.cos(2.0 * pts[:, 2])


def _mixed_queries(rng, n, lo, hi):
    """~80% interior, ~20% outside the domain box."""
    span = hi - lo
    q = lo - 0.25 * span + rng.random((n, 3)) * 1.5 * span
    q[: int(0.8 * n)] = lo + 0.05 * span + rng.random(
        (int(0.8 * n), 3)
    ) * 0.9 * span
    return q


@pytest.mark.parametrize(
    "mesh,cell_type,planar",
    [
        (lambda: meshgen.triangle_rect_mesh(6, 5), "triangle", True),
        (lambda: meshgen.tet_box_mesh(6, 6, 6), "tetra", False),
    ],
)
def test_oracle_agreement(mesh, cell_type, planar):
    points, cells, neighbors = mesh()
    data = _nonlinear(points)
    grid = iu.build_grid(
        np.asarray(points, np.float64), cells, neighbors, cell_type,
        point_data={"D": data}, dtype=jnp.float64, locate_mode="walk",
    )

    rng = np.random.default_rng(42)
    pts = np.asarray(points, np.float64)
    q = _mixed_queries(rng, 4000, pts.min(axis=0), pts.max(axis=0))
    if planar:
        q[:, 2] = 0.0

    v_j, ic_j, f_j = iu.interpolate_scalar_at(grid, q, 0, fill_value=0.0)
    v_o, ic_o, f_o = serial_oracle.serial_query(
        pts, cells, neighbors, data, q
    )

    f_j = np.asarray(f_j)
    np.testing.assert_array_equal(f_j, f_o)
    assert 0.5 < f_j.mean() < 0.95  # the batch exercises both outcomes
    np.testing.assert_allclose(
        np.asarray(v_j)[f_j], v_o[f_j], atol=1e-12
    )
    # Cell ids agree except face/edge ties, where the matching values
    # above prove both cells are valid containers
    disagree = f_j & (np.asarray(ic_j) != ic_o)
    assert disagree.mean() < 0.02


def test_oracle_agreement_warm():
    """Guess-seeded walks (the reference warm protocol) agree too."""
    points, cells, neighbors = meshgen.tet_box_mesh(5, 5, 5)
    pts = np.asarray(points, np.float64)
    data = _nonlinear(points)
    grid = iu.build_grid(
        pts, cells, neighbors, "tetra", point_data={"D": data},
        dtype=jnp.float64, locate_mode="walk",
    )
    rng = np.random.default_rng(7)
    q0 = 0.05 + rng.random((2000, 3)) * 0.9
    _, ic, f = iu.interpolate_scalar_at(grid, q0, 0)
    assert bool(np.asarray(f).all())
    # advect and relocate from the previous cells
    q1 = np.clip(q0 + 0.02 * (rng.random((2000, 3)) - 0.5), 0.02, 0.98)
    v_j, _, f_j = iu.interpolate_scalar_at(
        grid, q1, 0, guess=ic, fill_value=0.0
    )
    v_o, _, f_o = serial_oracle.serial_query(
        pts, cells, neighbors, data, q1, guesses=np.asarray(ic)
    )
    f_j = np.asarray(f_j)
    np.testing.assert_array_equal(f_j, f_o)
    assert f_j.all()
    np.testing.assert_allclose(np.asarray(v_j), v_o, atol=1e-12)


def test_oracle_agreement_candidate_path():
    """The default (candidate-table) locate mode agrees as well — the
    fused one-gather path and the serial walk are entirely disjoint
    code, so this is the strongest single cross-check in the suite."""
    points, cells, neighbors = meshgen.tet_box_mesh(7, 7, 7)
    pts = np.asarray(points, np.float64)
    data = _nonlinear(points)
    grid = iu.build_grid(
        pts, cells, neighbors, "tetra", point_data={"D": data},
        dtype=jnp.float64,
    )
    rng = np.random.default_rng(3)
    q = _mixed_queries(rng, 4000, pts.min(axis=0), pts.max(axis=0))
    v_j, ic_j, f_j = iu.interpolate_scalar_at(grid, q, 0, fill_value=0.0)
    v_o, ic_o, f_o = serial_oracle.serial_query(
        pts, cells, neighbors, data, q
    )
    f_j = np.asarray(f_j)
    np.testing.assert_array_equal(f_j, f_o)
    np.testing.assert_allclose(
        np.asarray(v_j)[f_j], v_o[f_j], atol=1e-12
    )


def test_oracle_agreement_quad():
    """The inverse-bilinear quad kernel (reference :588-641) — the
    most misreading-prone formula in the API — cross-checked on a
    JITTERED quad mesh, so the quads are genuinely non-parallelogram
    and the quadratic's root choice + maxloc branch both matter."""
    points, cells, neighbors = meshgen.quad_rect_mesh(6, 5)
    pts = np.asarray(points, np.float64).copy()
    rng = np.random.default_rng(8)
    # jitter interior vertices only (keep the boundary rectangular and
    # the cells convex: jitter << cell size)
    lo3, hi3 = pts.min(axis=0), pts.max(axis=0)
    interior = np.all((pts > lo3 + 1e-9) & (pts < hi3 - 1e-9), axis=1) | (
        (pts[:, 0] > lo3[0] + 1e-9) & (pts[:, 0] < hi3[0] - 1e-9)
        & (pts[:, 1] > lo3[1] + 1e-9) & (pts[:, 1] < hi3[1] - 1e-9)
    )
    pts[interior, :2] += (rng.random((interior.sum(), 2)) - 0.5) * 0.08
    data = _nonlinear(pts)
    grid = iu.build_grid(
        pts, cells, neighbors, "quad", point_data={"D": data},
        dtype=jnp.float64, locate_mode="walk",
    )
    q = _mixed_queries(rng, 4000, pts.min(axis=0), pts.max(axis=0))
    q[:, 2] = 0.0
    v_j, ic_j, f_j = iu.interpolate_scalar_at(grid, q, 0, fill_value=0.0)
    v_o, ic_o, f_o = serial_oracle.serial_query(
        pts, cells, neighbors, data, q, cell_type="quad"
    )
    f_j = np.asarray(f_j)
    np.testing.assert_array_equal(f_j, f_o)
    assert 0.5 < f_j.mean() < 0.95
    np.testing.assert_allclose(
        np.asarray(v_j)[f_j], v_o[f_j], atol=1e-11
    )


@pytest.mark.parametrize(
    "fixture", ["triangle_grid", "quad_grid", "tetra_grid"]
)
def test_oracle_agreement_bundled_meshes(request, fixture):
    """BASELINE.json's contract is <=1e-12 agreement with the Fortran
    reference ON THE BUNDLED VTU MESHES (test_triangle.f90:42-48 et
    al.).  The Fortran binaries are unbuildable here, so the compiled
    independent oracle stands in: same fixtures, same cold uniform-
    sample protocol, value agreement at 1e-12."""
    grid = request.getfixturevalue(fixture)
    pts = np.asarray(grid.points, np.float64)
    cells = np.asarray(grid.cells)
    neighbors = np.asarray(grid.neighbors)
    data = np.asarray(grid.point_data[:, 0], np.float64)

    rng = np.random.default_rng(2024)
    rmin, rmax = pts.min(axis=0), pts.max(axis=0)
    q = rmin + rng.random((1000, 3)) * (rmax - rmin)
    if grid.cell_type != "tetra":
        q[:, 2] = 0.0

    v_j, ic_j, f_j = iu.interpolate_scalar_at(grid, q, 0, fill_value=0.0)
    v_o, ic_o, f_o = serial_oracle.serial_query(
        pts, cells, neighbors, data, q,
        cell_type="quad" if grid.cell_type == "quad" else None,
    )
    f_j = np.asarray(f_j)
    np.testing.assert_array_equal(f_j, f_o)
    assert f_j.mean() > 0.97  # meshes tile their bbox (SURVEY §4)
    np.testing.assert_allclose(
        np.asarray(v_j)[f_j], v_o[f_j], atol=1e-12
    )
