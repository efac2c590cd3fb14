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


# ---------------------------------------------------------------------
# Field-line tracer cross-validation (iu_integrate_along_field,
# m_interp_unstructured.f90:987-1217).  The oracle's RK23 loop is a
# from-scratch serial C++ transliteration of the reference control
# flow; the JAX tracer is a batched branch-free re-design.  Agreement
# of full trajectories requires both to make IDENTICAL accept/reject
# and boundary-shrink decisions, so this exercises every branch of the
# step controller, not just the arithmetic.


def _trace_kw(**over):
    kw = dict(min_dx=1e-6, max_dx=0.05, max_steps=400,
              rtol=1e-8, atol=1e-8)
    kw.update(over)
    return kw


def _compare_traces(res, oy, oyf, ons, obm, ndim, atol=1e-9,
                    final_atol=1e-6):
    """Trajectory agreement, tolerant only at the termination tail.

    Both step controllers make identical accept/reject decisions on
    smooth fields (err differs at ~1e-15 relative), so the curves must
    agree pointwise.  The ONE legitimate divergence is the boundary
    endgame: the JAX walk applies a scaled arrival tolerance
    (utils/config.walk_tolerances) where the serial oracle crosses
    faces exactly, so a marginal sub-step can flip arrived <-> exited
    and cost one extra shrink-retry step.  Both still land on the same
    exit point, so the tail check compares FINAL states directly and
    allows |n_steps| to differ by <= 2.  The shrink loop only
    guarantees the final point within ~min_dx of the boundary
    (dx < min_dx terminates, :1086), so final states are compared at
    min_dx scale (the tests use min_dx = 1e-6; observed agreement is
    ~1e-8).
    """
    n_j = np.asarray(res.n_steps)
    bm_j = np.asarray(res.boundary_material)
    np.testing.assert_array_equal(bm_j, obm)
    # Each flipped arrived<->exited walk costs one shrink-retry of the
    # geometric endgame cascade (dx quarters per retry), so a handful
    # of extra accepted micro-steps at the wall is legitimate; a
    # mid-course divergence would blow the prefix check below instead.
    assert np.abs(n_j.astype(int) - ons.astype(int)).max() <= 8, (
        f"step counts diverged: {n_j} vs {ons}"
    )
    y_j = np.asarray(res.y)
    yf_j = np.asarray(res.y_field)
    max_steps = y_j.shape[1]
    for t in range(y_j.shape[0]):
        nj = min(int(n_j[t]), max_steps)
        no = min(int(ons[t]), max_steps)
        common = max(min(nj, no) - 2, 0)
        np.testing.assert_allclose(
            y_j[t, :common], oy[t, :common], atol=atol,
            err_msg=f"trajectory {t} positions"
        )
        np.testing.assert_allclose(
            yf_j[t, :common], oyf[t, :common], atol=atol,
            err_msg=f"trajectory {t} field samples"
        )
        np.testing.assert_allclose(
            y_j[t, nj - 1], oy[t, no - 1], atol=final_atol,
            err_msg=f"trajectory {t} final state"
        )


def test_trace_oracle_circular_2d():
    """Quarter-circle protocol (test_trace_field.f90:41-64): circular
    field, arc-length extra variable, several seeds, both directions."""
    from interpolate_unstructured_tpu.trace import integrate_along_field

    points, cells, neighbors = meshgen.triangle_rect_mesh(8, 7)
    pts = np.asarray(points, np.float64)
    grid = iu.build_grid(
        pts, cells, neighbors, "triangle",
        point_data={"vx": -pts[:, 1], "vy": pts[:, 0]},
        dtype=jnp.float64, locate_mode="walk",
    )

    def sub_int(field, y):
        return jnp.ones(1, dtype=y.dtype)

    y0 = np.array([
        [1.5, 0.0, -0.75 * np.pi],
        [0.5, 0.5, 0.0],
        [1.0, 0.25, 1.0],
        [1.9, 1.9, 0.0],
    ])
    kw = _trace_kw()
    for reverse in (False, True):
        res = integrate_along_field(
            grid, jnp.asarray(y0), (0, 1), nvar=1, sub_int=sub_int,
            reverse=reverse, **kw,
        )
        oy, oyf, ons, obm = serial_oracle.serial_trace(
            pts, cells, neighbors,
            np.stack([-pts[:, 1], pts[:, 0]], axis=1),
            y0, nvar=1, reverse=reverse, **kw,
        )
        _compare_traces(res, oy, oyf, ons, obm, ndim=2)


def test_trace_oracle_tet_3d():
    """3D helix field on the tet box mesh — exercises tetra weights,
    3D face crossings, and the boundary shrink loop in z."""
    from interpolate_unstructured_tpu.trace import integrate_along_field

    points, cells, neighbors = meshgen.tet_box_mesh(6, 6, 6)
    pts = np.asarray(points, np.float64)
    vx = -(pts[:, 1] - 0.5)
    vy = pts[:, 0] - 0.5
    vz = np.full(pts.shape[0], 0.25)
    grid = iu.build_grid(
        pts, cells, neighbors, "tetra",
        point_data={"vx": vx, "vy": vy, "vz": vz},
        dtype=jnp.float64, locate_mode="walk",
    )
    y0 = np.array([
        [0.8, 0.5, 0.1],
        [0.5, 0.3, 0.5],
        [0.25, 0.25, 0.05],
    ])
    kw = _trace_kw(max_dx=0.04)
    res = integrate_along_field(grid, jnp.asarray(y0), (0, 1, 2), **kw)
    oy, oyf, ons, obm = serial_oracle.serial_trace(
        pts, cells, neighbors, np.stack([vx, vy, vz], axis=1), y0, **kw,
    )
    _compare_traces(res, oy, oyf, ons, obm, ndim=3)


def test_trace_oracle_mask_region():
    """icell-mask region restriction (:1055-1068, :706-719): the trace
    must stop at the material interface with the entered mask value."""
    from interpolate_unstructured_tpu.trace import integrate_along_field

    points, cells, neighbors = meshgen.triangle_rect_mesh(8, 7)
    pts = np.asarray(points, np.float64)
    vx = np.ones(pts.shape[0])
    vy = np.zeros(pts.shape[0])
    grid = iu.build_grid(
        pts, cells, neighbors, "triangle",
        point_data={"vx": vx, "vy": vy},
        dtype=jnp.float64, locate_mode="walk",
    )
    centers = np.asarray(grid.cell_centers())
    mat = np.where(centers[:, 0] < 1.0, 0, 7).astype(np.int32)
    grid, i_mat = iu.add_icell_data(grid, "material", mat)

    y0 = np.array([[0.25, 0.5], [1.5, 0.5], [0.6, 1.1]])
    kw = _trace_kw()
    res = integrate_along_field(
        grid, jnp.asarray(y0), (0, 1), i_icell_mask=i_mat,
        mask_value=0, **kw,
    )
    oy, oyf, ons, obm = serial_oracle.serial_trace(
        pts, cells, neighbors, np.stack([vx, vy], axis=1), y0,
        icell_mask=mat, mask_value=0, **kw,
    )
    _compare_traces(res, oy, oyf, ons, obm, ndim=2)
    assert int(np.asarray(res.boundary_material)[0]) == 7
    assert int(np.asarray(res.n_steps)[1]) == 1


def test_trace_oracle_quad_mesh():
    """Tracer over the inverse-bilinear quad kernel on a JITTERED quad
    mesh — the field samples feed through interpolate_quad (:588-641)
    every RK sub-step, so root choice/fallback parity compounds over
    the whole trajectory."""
    from interpolate_unstructured_tpu.trace import integrate_along_field

    points, cells, neighbors = meshgen.quad_rect_mesh(8, 7)
    pts = np.asarray(points, np.float64).copy()
    rng = np.random.default_rng(11)
    lo3, hi3 = pts.min(axis=0), pts.max(axis=0)
    interior = (
        (pts[:, 0] > lo3[0] + 1e-9) & (pts[:, 0] < hi3[0] - 1e-9)
        & (pts[:, 1] > lo3[1] + 1e-9) & (pts[:, 1] < hi3[1] - 1e-9)
    )
    pts[interior, :2] += (rng.random((interior.sum(), 2)) - 0.5) * 0.06
    vx, vy = -pts[:, 1], pts[:, 0]
    grid = iu.build_grid(
        pts, cells, neighbors, "quad",
        point_data={"vx": vx, "vy": vy},
        dtype=jnp.float64, locate_mode="walk",
    )
    # seeds strictly interior: an exactly-on-edge start is an epsilon
    # tie (the JAX inside-test tolerates -1e-10, the oracle is exact)
    y0 = np.array([[1.5, 0.05], [0.5, 0.5], [1.2, 0.3]])
    kw = _trace_kw()
    res = integrate_along_field(grid, jnp.asarray(y0), (0, 1), **kw)
    oy, oyf, ons, obm = serial_oracle.serial_trace(
        pts, cells, neighbors, np.stack([vx, vy], axis=1), y0,
        cell_type="quad", **kw,
    )
    _compare_traces(res, oy, oyf, ons, obm, ndim=2)


def test_trace_oracle_buffer_fill():
    """A closed orbit that never exits: both implementations must fill
    the output buffer and report n_steps = max_steps + 1 with
    boundary_material = BM_NOT_REACHED (:1167-1168)."""
    from interpolate_unstructured_tpu.trace import (
        BM_NOT_REACHED, integrate_along_field,
    )

    points, cells, neighbors = meshgen.triangle_rect_mesh(8, 7)
    pts = np.asarray(points, np.float64)
    vx, vy = -(pts[:, 1] - 1.0), pts[:, 0] - 1.0  # orbits about (1,1)
    grid = iu.build_grid(
        pts, cells, neighbors, "triangle",
        point_data={"vx": vx, "vy": vy},
        dtype=jnp.float64, locate_mode="walk",
    )
    y0 = np.array([[1.5, 1.0], [1.0, 0.6]])  # radii 0.5 / 0.4: interior
    kw = _trace_kw(max_steps=40)
    res = integrate_along_field(grid, jnp.asarray(y0), (0, 1), **kw)
    oy, oyf, ons, obm = serial_oracle.serial_trace(
        pts, cells, neighbors, np.stack([vx, vy], axis=1), y0, **kw,
    )
    assert (np.asarray(res.n_steps) == 41).all()
    np.testing.assert_array_equal(np.asarray(res.n_steps), ons)
    assert (np.asarray(res.boundary_material) == BM_NOT_REACHED).all()
    np.testing.assert_array_equal(
        np.asarray(res.boundary_material), obm
    )
    # Full buffers agree pointwise — no termination tail to excuse
    np.testing.assert_allclose(
        np.asarray(res.y), oy, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res.y_field), oyf, atol=1e-9
    )


def test_trace_oracle_axisymmetric():
    """axisymmetric=True threads the r >= 1e-12 clamp through every
    sub-step position (:1120/:1133/:1147/:1171) on both sides."""
    from interpolate_unstructured_tpu.trace import integrate_along_field

    points, cells, neighbors = meshgen.triangle_rect_mesh(8, 7)
    pts = np.asarray(points, np.float64)
    vx = np.full(pts.shape[0], -0.05)
    vy = np.ones(pts.shape[0])
    grid = iu.build_grid(
        pts, cells, neighbors, "triangle",
        point_data={"vx": vx, "vy": vy},
        dtype=jnp.float64, locate_mode="walk",
    )
    y0 = np.array([[0.05, 0.1], [0.8, 0.2]])
    kw = _trace_kw()
    res = integrate_along_field(
        grid, jnp.asarray(y0), (0, 1), axisymmetric=True, **kw
    )
    oy, oyf, ons, obm = serial_oracle.serial_trace(
        pts, cells, neighbors, np.stack([vx, vy], axis=1), y0,
        axisymmetric=True, **kw,
    )
    _compare_traces(res, oy, oyf, ons, obm, ndim=2)
