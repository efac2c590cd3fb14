"""Per-bin candidate-table cold locate: correctness vs brute force.

The candidate path (ops/locate.py:locate_candidates) must agree exactly
with the exact brute-force containment on found-ness, and every reported
cell must contain its query — including points outside the mesh, points
on lattice face planes, overflow bins (complete list > K), and the
compacted straggler-walk fallback branches.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu import IUConfig
from interpolate_unstructured_tpu.ops import locate
from interpolate_unstructured_tpu.utils import meshgen


def _mixed_queries(rng, n, lo, hi):
    """Inside, outside, and face-plane-aligned query points."""
    span = hi - lo
    return np.concatenate(
        [
            lo + rng.random((n, 3)) * span,
            lo - 0.2 * span + rng.random((n // 4, 3)) * 1.4 * span,
            lo + np.round(rng.random((n // 4, 3)) * 6) / 6.0 * span,
        ]
    )


def _check_parity(g_cand, g_brute, r):
    ic_c, f_c = jax.jit(locate.locate_candidates)(g_cand, r)
    ic_b, f_b = jax.jit(locate.locate_bruteforce)(g_brute, r)
    np.testing.assert_array_equal(np.asarray(f_c), np.asarray(f_b))
    inside = np.asarray(
        locate.point_is_inside_cell(g_cand, r, jnp.asarray(ic_c))
    )
    assert bool(inside[np.asarray(f_c)].all())
    return np.asarray(f_c)


def test_candidates_match_bruteforce_tet():
    pts, cells, nbrs = meshgen.tet_box_mesh(6, 6, 6)
    kw = dict(point_data={"Polynomial": pts.sum(1) + 1.0})
    g_cand = iu.build_grid(pts, cells, nbrs, "tetra", locate_mode="walk", **kw)
    g_brute = iu.build_grid(
        pts, cells, nbrs, "tetra", locate_mode="bruteforce", **kw
    )
    assert g_cand.cand_table is not None
    # This mesh genuinely exercises the overflow fallback (bins near
    # lattice vertices intersect up to 24 tets)
    assert int(np.asarray(g_cand.cand_count).max()) > g_cand.cand_ids.shape[1]

    rng = np.random.default_rng(31)
    r = jnp.asarray(
        _mixed_queries(rng, 4096, np.zeros(3), np.ones(3)), g_cand.dtype
    )
    found = _check_parity(g_cand, g_brute, r)

    vals, _, f = jax.jit(lambda g, r: iu.interpolate_scalar_at(g, r, 0))(
        g_cand, r
    )
    exact = np.asarray(r).sum(1) + 1.0
    np.testing.assert_allclose(
        np.asarray(vals)[found], exact[found], atol=1e-13
    )


def test_candidates_match_bruteforce_quad_planar():
    pts, cells, nbrs = meshgen.quad_rect_mesh(9, 7)
    kw = dict(point_data={"Polynomial": pts.sum(1) + 1.0})
    g_cand = iu.build_grid(pts, cells, nbrs, "quad", locate_mode="walk", **kw)
    g_brute = iu.build_grid(
        pts, cells, nbrs, "quad", locate_mode="bruteforce", **kw
    )
    assert g_cand.cand_table is not None
    rng = np.random.default_rng(32)
    lo, hi = np.asarray(g_cand.rmin), np.asarray(g_cand.rmax)
    r = np.ascontiguousarray(_mixed_queries(rng, 2048, lo, hi))
    r[:, 2] = 0.0  # planar mesh: query in the mesh plane
    _check_parity(g_cand, g_brute, jnp.asarray(r, g_cand.dtype))


def test_candidate_compaction_branches():
    """Both lax.cond branches of the straggler fallback (compacted and
    full-batch) must agree with brute force."""
    pts, cells, nbrs = meshgen.tet_box_mesh(5, 5, 5)
    kw = dict(point_data={"Polynomial": pts.sum(1) + 1.0})
    g_brute = iu.build_grid(
        pts, cells, nbrs, "tetra", locate_mode="bruteforce", **kw
    )
    rng = np.random.default_rng(33)
    r = jnp.asarray(_mixed_queries(rng, 8192, np.zeros(3), np.ones(3)))

    for divisor in (4, 1 << 20):  # big buffer (small path) / tiny (full)
        cfg = IUConfig(
            walk_compact_min_batch=1,
            walk_compact_divisor=divisor,
            # coarse candidate bins force heavy overflow -> many walks
            cand_bins_per_cell=0.02,
        )
        g = iu.build_grid(
            pts, cells, nbrs, "tetra", locate_mode="walk", config=cfg, **kw
        )
        assert int(np.asarray(g.cand_count).max()) > g.cand_ids.shape[1]
        _check_parity(g, g_brute, jnp.asarray(r, g.dtype))


def test_candidate_lists_are_exact_where_complete():
    """Where count <= K the list is complete: brute-force containment
    can never find a cell the candidate row doesn't hold."""
    pts, cells, nbrs = meshgen.tet_box_mesh(4, 4, 4)
    g = iu.build_grid(
        pts, cells, nbrs, "tetra",
        point_data={"Polynomial": pts.sum(1) + 1.0}, locate_mode="walk",
    )
    cand_ids = np.asarray(g.cand_ids)
    count = np.asarray(g.cand_count)
    k = cand_ids.shape[1]
    rng = np.random.default_rng(34)
    r = rng.random((4096, 3))
    ic_b, f_b = jax.jit(locate.locate_bruteforce)(
        iu.build_grid(pts, cells, nbrs, "tetra", locate_mode="bruteforce"),
        jnp.asarray(r, g.dtype),
    )
    bins = np.asarray(locate._cand_bin_index(g, jnp.asarray(r, g.dtype)))
    ic_b, f_b = np.asarray(ic_b), np.asarray(f_b)
    complete = count[bins] <= k
    sel = f_b & complete
    listed = (cand_ids[bins[sel]] == ic_b[sel][:, None]).any(axis=1)
    assert bool(listed.all())


def test_candidates_checkpoint_roundtrip(tmp_path):
    from interpolate_unstructured_tpu.io.checkpoint import load_grid, save_grid

    pts, cells, nbrs = meshgen.tet_box_mesh(4, 4, 4)
    g = iu.build_grid(
        pts, cells, nbrs, "tetra",
        point_data={"Polynomial": pts.sum(1) + 1.0}, locate_mode="walk",
    )
    fn = tmp_path / "grid.binda"
    save_grid(g, fn)
    g2 = load_grid(fn)
    assert g2.cand_shape == g.cand_shape
    np.testing.assert_array_equal(np.asarray(g2.cand_ids), np.asarray(g.cand_ids))
    np.testing.assert_array_equal(
        np.asarray(g2.cand_table), np.asarray(g.cand_table)
    )
    rng = np.random.default_rng(35)
    r = jnp.asarray(rng.random((512, 3)), g.dtype)
    v1, _, f1 = iu.interpolate_scalar_at(g, r, 0)
    v2, _, f2 = iu.interpolate_scalar_at(g2, r, 0)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))


def test_candidates_checkpoint_downcast_rebuilds(tmp_path):
    """An f64 checkpoint loaded as f32 rebuilds its candidate lists with
    the wider f32 tolerance (the saved inflation no longer dominates)."""
    from interpolate_unstructured_tpu.io.checkpoint import load_grid, save_grid

    pts, cells, nbrs = meshgen.tet_box_mesh(4, 4, 4)
    g = iu.build_grid(
        pts, cells, nbrs, "tetra",
        point_data={"Polynomial": pts.sum(1) + 1.0}, locate_mode="walk",
    )
    fn = tmp_path / "grid64.binda"
    save_grid(g, fn)
    g32 = load_grid(fn, dtype=jnp.float32)
    assert g32.dtype == jnp.float32
    assert g32.cand_table is not None
    assert g32.cand_table.dtype == jnp.float32
    # f32 rows hold more f32-sized candidates than the f64 original
    assert g32.cand_ids.shape[1] >= g.cand_ids.shape[1]
    rng = np.random.default_rng(36)
    r = jnp.asarray(rng.random((1024, 3)), jnp.float32)
    vals, _, found = iu.interpolate_scalar_at(g32, r, 0)
    exact = np.asarray(r, np.float64).sum(1) + 1.0
    f = np.asarray(found)
    assert f.mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(vals)[f], exact[f], atol=1e-4
    )


def test_kdtree_seed_mode_skips_candidates():
    pts, cells, nbrs = meshgen.tet_box_mesh(3, 3, 3)
    g = iu.build_grid(
        pts, cells, nbrs, "tetra",
        locate_mode="walk", config=IUConfig(seed_mode="kdtree"),
    )
    assert g.cand_table is None and g.kd_node_points is not None


def test_extension_probe_covers_and_values():
    """With heavy overflow but a covering extension, the fallback never
    walks: found-ness matches brute force and fused values stay
    linear-exact through the extension path."""
    pts, cells, nbrs = meshgen.tet_box_mesh(5, 5, 5)
    kw = dict(point_data={"Polynomial": pts.sum(1) + 1.0})
    g_brute = iu.build_grid(
        pts, cells, nbrs, "tetra", locate_mode="bruteforce", **kw
    )
    cfg = IUConfig(
        walk_compact_min_batch=1,
        cand_bins_per_cell=0.3,  # coarse bins: most bins overflow K
        cand_ext_max_k=256,
    )
    g = iu.build_grid(
        pts, cells, nbrs, "tetra", locate_mode="walk", config=cfg, **kw
    )
    assert g.cand_ext_table is not None
    assert g.cand_ext_covers
    assert int(np.asarray(g.cand_count).max()) > g.cand_ids.shape[1]

    rng = np.random.default_rng(44)
    r = jnp.asarray(
        _mixed_queries(rng, 4096, np.zeros(3), np.ones(3)), g.dtype
    )
    found = _check_parity(g, g_brute, r)
    vals, _, f = jax.jit(lambda g, r: iu.interpolate_scalar_at(g, r, 0))(g, r)
    exact = np.asarray(r).sum(1) + 1.0
    np.testing.assert_allclose(
        np.asarray(vals)[found], exact[found], atol=1e-12
    )


def test_extension_residual_walk():
    """A too-small ext cap (covers=False) routes the over-capacity
    stragglers into the residual walk — parity must still hold."""
    pts, cells, nbrs = meshgen.tet_box_mesh(5, 5, 5)
    kw = dict(point_data={"Polynomial": pts.sum(1) + 1.0})
    g_brute = iu.build_grid(
        pts, cells, nbrs, "tetra", locate_mode="bruteforce", **kw
    )
    cfg = IUConfig(
        walk_compact_min_batch=1,
        cand_bins_per_cell=0.3,
        cand_ext_max_k=2,  # far below the worst bin
    )
    g = iu.build_grid(
        pts, cells, nbrs, "tetra", locate_mode="walk", config=cfg, **kw
    )
    assert g.cand_ext_table is not None
    assert not g.cand_ext_covers
    rng = np.random.default_rng(45)
    r = jnp.asarray(
        _mixed_queries(rng, 4096, np.zeros(3), np.ones(3)), g.dtype
    )
    _check_parity(g, g_brute, r)


def test_empty_ivars_and_unfused_set_point_data():
    """interpolate_at with i_vars=[] returns a (B, 0) result on every
    locate mode, and mutating a NON-fused point-data column must not
    repack the candidate tables (review findings, round 2)."""
    pts, cells, nbrs = meshgen.tet_box_mesh(4, 4, 4)
    g = iu.build_grid(
        pts, cells, nbrs, "tetra",
        point_data={"Polynomial": pts.sum(1) + 1.0}, locate_mode="walk",
    )
    rng = np.random.default_rng(46)
    r = jnp.asarray(rng.random((64, 3)), g.dtype)
    vals, ic, found = iu.interpolate_at(g, r, [])
    assert vals.shape == (64, 0)
    assert bool(np.asarray(found).all())

    from interpolate_unstructured_tpu.models.grid import cand_fused_nv

    # f32 rows fuse the leading variable (f64 rows are too narrow).
    # Legacy (unquantized) layout here: its 21-float candidates cannot
    # fuse a second variable, which is what the no-repack-for-unfused
    # assertion below relies on (quantized 13-float candidates CAN fuse
    # it — covered separately at the end).
    from interpolate_unstructured_tpu.utils.config import IUConfig

    gf = iu.build_grid(
        pts, cells, nbrs, "tetra",
        point_data={"Polynomial": pts.sum(1) + 1.0}, locate_mode="walk",
        dtype=jnp.float32, config=IUConfig(cand_quantized=False),
    )
    assert cand_fused_nv(gf) >= 1
    g2, i_v = iu.add_point_data(gf, "extra", np.zeros(gf.n_points))
    assert i_v >= cand_fused_nv(g2)
    table_before = g2.cand_table
    g3 = iu.set_point_data(g2, i_v, np.ones(g2.n_points))
    assert g3.cand_table is table_before  # no repack for unfused column
    # fused column DOES repack (values ride in the rows)
    g4 = iu.set_point_data(g3, 0, np.asarray(pts.sum(1) * 2.0))
    assert g4.cand_table is not table_before
    rf = jnp.asarray(np.asarray(r), jnp.float32)
    v, _, f = iu.interpolate_scalar_at(g4, rf, 0)
    np.testing.assert_allclose(
        np.asarray(v)[np.asarray(f)],
        2.0 * np.asarray(rf.sum(1))[np.asarray(f)],
        atol=1e-4,
    )

    # Quantized layout: the slimmer candidates fit BOTH variables, so
    # adding a second column fuses it (repack) and both interpolate
    # through the fused path consistently.
    gq = iu.build_grid(
        pts, cells, nbrs, "tetra",
        point_data={"Polynomial": pts.sum(1) + 1.0}, locate_mode="walk",
        dtype=jnp.float32,
    )
    gq2, i_q = iu.add_point_data(
        gq, "extra", np.asarray(pts.sum(1) * 3.0)
    )
    assert cand_fused_nv(gq2) == 2
    v2, _, f2 = iu.interpolate_scalar_at(gq2, rf, i_q)
    np.testing.assert_allclose(
        np.asarray(v2)[np.asarray(f2)],
        3.0 * np.asarray(rf.sum(1))[np.asarray(f2)],
        atol=1e-4,
    )


def test_cover_all_rows():
    """When the worst bin's complete list fits cand_cover_row_bytes, K
    widens to that count: no extension table, no fallback machinery,
    found-ness and values exact (the layout the 1M-cell bench hits)."""
    pts, cells, nbrs = meshgen.tet_box_mesh(8, 8, 8)
    kw = dict(point_data={"Polynomial": pts.sum(1) + 1.0})
    g_brute = iu.build_grid(
        pts, cells, nbrs, "tetra", locate_mode="bruteforce", **kw
    )
    # f64 under the test conftest: a covering row for the worst 24-cell
    # bin needs 505 doubles, so budget 4 KB (the f32 default covers the
    # same mesh at 2 KB)
    cfg = IUConfig(cand_cover_row_bytes=4096)
    g = iu.build_grid(
        pts, cells, nbrs, "tetra", locate_mode="walk", config=cfg, **kw
    )
    max_count = int(np.asarray(g.cand_count).max())
    assert g.cand_ids.shape[1] == max_count  # widened to the worst bin
    assert g.cand_ext_table is None and g.cand_ext_covers
    # one fused variable survived the widening
    from interpolate_unstructured_tpu.models.grid import cand_fused_nv

    assert cand_fused_nv(g) == 1

    rng = np.random.default_rng(46)
    r = jnp.asarray(
        _mixed_queries(rng, 4096, np.zeros(3), np.ones(3)), g.dtype
    )
    found = _check_parity(g, g_brute, r)
    vals, _, f = jax.jit(lambda g, r: iu.interpolate_scalar_at(g, r, 0))(g, r)
    exact = np.asarray(r).sum(1) + 1.0
    np.testing.assert_allclose(
        np.asarray(vals)[found], exact[found], atol=1e-12
    )


def test_add_point_data_unfused():
    """add_point_data(fuse=False) must not repack the candidate rows
    (a multi-GB cost at 1M cells — round 4), must keep the pinned
    fused count stable, and the new variable still interpolates
    correctly through the generic path."""
    pts, cells, nbrs = meshgen.tet_box_mesh(4, 4, 4)
    g = iu.build_grid(
        pts, cells, nbrs, "tetra",
        point_data={"Polynomial": pts.sum(1) + 1.0},
        locate_mode="walk", dtype=jnp.float32,
    )
    from interpolate_unstructured_tpu.models.grid import cand_fused_nv

    nv0 = cand_fused_nv(g)
    assert g.cand_nv == nv0  # pinned at pack time
    table_before = g.cand_table

    g2, i_v = iu.add_point_data(
        g, "extra", np.asarray(pts.sum(1) * 5.0), fuse=False
    )
    assert g2.cand_table is table_before  # no repack
    assert cand_fused_nv(g2) == nv0  # pin unchanged by the append

    rng = np.random.default_rng(7)
    r = jnp.asarray(rng.random((512, 3)), jnp.float32)
    v, _, f = iu.interpolate_scalar_at(g2, r, i_v)
    assert bool(np.asarray(f).all())
    np.testing.assert_allclose(
        np.asarray(v), 5.0 * np.asarray(r.sum(1)), rtol=1e-5
    )


def test_unfused_pin_survives_checkpoint(tmp_path):
    """The cand_nv pin rides the checkpoint: loading a grid whose
    variables were added with fuse=False must NOT silently repack at
    full capacity (io/checkpoint.load_grid passes the stored pin to
    _build_cand_tables) — that repack is the multi-GB blowup
    fuse=False exists to avoid."""
    from interpolate_unstructured_tpu.io.checkpoint import load_grid, save_grid
    from interpolate_unstructured_tpu.models.grid import (
        _cand_capacity_nv,
        cand_fused_nv,
    )

    pts, cells, nbrs = meshgen.tet_box_mesh(4, 4, 4)
    g = iu.build_grid(
        pts, cells, nbrs, "tetra",
        point_data={"Polynomial": pts.sum(1) + 1.0},
        locate_mode="walk", dtype=jnp.float32,
    )
    nv0 = cand_fused_nv(g)
    g2, i_v = iu.add_point_data(
        g, "extra", np.asarray(pts.sum(1) * 5.0), fuse=False
    )
    # capacity would fuse the appended variable; the pin must not
    assert _cand_capacity_nv(g2) > nv0

    fn = str(tmp_path / "pin.binda")
    save_grid(g2, fn)
    g3 = load_grid(fn)
    assert g3.cand_nv == nv0, "checkpoint round-trip dropped the pin"
    assert cand_fused_nv(g3) == nv0
    assert g3.cand_table.shape == g2.cand_table.shape

    rng = np.random.default_rng(11)
    r = jnp.asarray(rng.random((512, 3)), jnp.float32)
    for slot, scale in ((0, None), (i_v, 5.0)):
        v, _, f = iu.interpolate_scalar_at(g3, r, slot)
        assert bool(np.asarray(f).all())
        exact = (
            np.asarray(r).sum(1) + 1.0 if scale is None
            else scale * np.asarray(r.sum(1))
        )
        np.testing.assert_allclose(np.asarray(v), exact, atol=1e-5)


def test_cell_planes_degenerate_cell():
    """solve_cell_planes_f64 must not abort the whole batched solve on
    one zero-volume sliver (np.linalg.solve raises LinAlgError for the
    full batch): degenerate cells route through the minimum-norm
    pseudo-inverse, healthy cells stay exact."""
    from interpolate_unstructured_tpu.models.grid import solve_cell_planes_f64

    pts = np.array(
        [
            [0.0, 0.0, 0.0],
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
            [1.0, 1.0, 1.0],
        ]
    )
    # cell 0 healthy; cell 1 duplicates a vertex (zero volume)
    cells = np.array([[0, 1, 2, 3], [0, 1, 2, 2]])
    data = (2.0 * pts[:, 0] - pts[:, 1] + 3.0)[:, None]
    g, c = solve_cell_planes_f64(pts, cells, data)
    assert np.isfinite(g).all() and np.isfinite(c).all()
    # healthy cell reproduces the affine field exactly
    np.testing.assert_allclose(g[0, 0], [2.0, -1.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(c[0, 0], 3.0, atol=1e-12)
    # the degenerate cell's min-norm plane still interpolates its own
    # vertices' values on the collapsed geometry
    vtx = pts[cells[1]]
    np.testing.assert_allclose(
        vtx @ g[1, 0] + c[1, 0], data[cells[1], 0], atol=1e-10
    )


def test_set_point_data_unfused_within_capacity():
    """set_point_data on a variable added with fuse=False must not
    repack even when the column WOULD fit the rows (i_var < capacity):
    the fusion set is chosen at add time, and the repack is the
    multi-GB cost fuse=False exists to avoid (review finding, round 4).
    Mutating a FUSED column still repacks — at the pinned nv, so the
    opted-out column stays unfused."""
    from interpolate_unstructured_tpu.models.grid import (
        _cand_capacity_nv,
        cand_fused_nv,
    )

    pts, cells, nbrs = meshgen.tet_box_mesh(4, 4, 4)
    # quantized f32 rows: capacity fits 2 variables
    g = iu.build_grid(
        pts, cells, nbrs, "tetra",
        point_data={"Polynomial": pts.sum(1) + 1.0},
        locate_mode="walk", dtype=jnp.float32,
    )
    nv0 = cand_fused_nv(g)
    g2, i_v = iu.add_point_data(
        g, "extra", np.asarray(pts.sum(1) * 5.0), fuse=False
    )
    assert nv0 <= i_v < _cand_capacity_nv(g2)  # the dangerous window
    table_before = g2.cand_table

    g3 = iu.set_point_data(g2, i_v, np.asarray(pts.sum(1) * 7.0))
    assert g3.cand_table is table_before  # no repack for opted-out col
    assert cand_fused_nv(g3) == nv0

    rng = np.random.default_rng(13)
    r = jnp.asarray(rng.random((256, 3)), jnp.float32)
    v, _, f = iu.interpolate_scalar_at(g3, r, i_v)
    assert bool(np.asarray(f).all())
    np.testing.assert_allclose(
        np.asarray(v), 7.0 * np.asarray(r.sum(1)), rtol=1e-5
    )

    # fused column: repack happens but the fusion set is unchanged
    g4 = iu.set_point_data(g3, 0, np.asarray(pts.sum(1) * 2.0))
    assert g4.cand_table is not table_before
    assert cand_fused_nv(g4) == nv0
    v0, _, f0 = iu.interpolate_scalar_at(g4, r, 0)
    np.testing.assert_allclose(
        np.asarray(v0)[np.asarray(f0)],
        2.0 * np.asarray(r.sum(1))[np.asarray(f0)],
        rtol=1e-5,
    )
    vi, _, fi = iu.interpolate_scalar_at(g4, r, i_v)
    np.testing.assert_allclose(
        np.asarray(vi)[np.asarray(fi)],
        7.0 * np.asarray(r.sum(1))[np.asarray(fi)],
        rtol=1e-5,
    )


def test_rebuild_resave_clears_stale_pin(tmp_path):
    """resave_on_rebuild must not write the PRE-rebuild cand_nv pin:
    the rebuild re-derives capacity (fusing everything that fits), so
    a resaved file carrying the old pin would make every later load
    fuse fewer variables than the resaving session used (review
    finding, round 4)."""
    from interpolate_unstructured_tpu.io.checkpoint import (
        load_grid,
        save_grid,
    )
    from interpolate_unstructured_tpu.models.grid import cand_fused_nv
    from interpolate_unstructured_tpu.utils.config import IUConfig

    pts, cells, nbrs = meshgen.tet_box_mesh(4, 4, 4)
    g = iu.build_grid(
        pts, cells, nbrs, "tetra",
        point_data={"Polynomial": pts.sum(1) + 1.0},
        locate_mode="walk", dtype=jnp.float32,
    )
    nv0 = cand_fused_nv(g)
    g2, i_v = iu.add_point_data(
        g, "extra", np.asarray(pts.sum(1) * 5.0), fuse=False
    )
    fn = str(tmp_path / "rebuild.binda")
    save_grid(g2, fn)

    # A doubled bins-per-cell changes the bin shape by >= 2 per dim,
    # forcing the candidate-list rebuild path on load.
    cfg2 = IUConfig(cand_bins_per_cell=8.0)
    g3 = load_grid(fn, config=cfg2, resave_on_rebuild=True)
    assert cand_fused_nv(g3) > nv0  # rebuild re-derived capacity

    # The resaved file must reproduce the rebuild session's fusion.
    g4 = load_grid(fn, config=cfg2)
    assert g4.cand_nv == g3.cand_nv, "resave wrote the stale pin"
    assert cand_fused_nv(g4) == cand_fused_nv(g3)

    rng = np.random.default_rng(17)
    r = jnp.asarray(rng.random((256, 3)), jnp.float32)
    for slot, scale in ((0, 1.0), (i_v, 5.0)):
        v, _, f = iu.interpolate_scalar_at(g4, r, slot)
        assert bool(np.asarray(f).all())
        exact = (
            np.asarray(r).sum(1) + 1.0
            if slot == 0
            else scale * np.asarray(r.sum(1))
        )
        np.testing.assert_allclose(np.asarray(v), exact, rtol=1e-4)


def test_load_no_spurious_rebuild_after_unfused_add(tmp_path):
    """K is derived from the BUILD-time pin on load: a checkpoint
    saved after add_point_data(fuse=False) must not see a K mismatch
    (capacity at the inflated n_point_data is smaller), which would
    silently rebuild the candidate lists on every load and discard the
    pin (review finding, round 4)."""
    from interpolate_unstructured_tpu.io.checkpoint import (
        load_grid,
        save_grid,
    )
    from interpolate_unstructured_tpu.models.grid import cand_fused_nv

    pts, cells, nbrs = meshgen.tet_box_mesh(4, 4, 4)
    # cover-widening disabled: K comes from capacity, where the
    # spurious mismatch lives
    cfg = IUConfig(cand_cover_row_bytes=0)
    g = iu.build_grid(
        pts, cells, nbrs, "tetra",
        point_data={"Polynomial": pts.sum(1) + 1.0},
        locate_mode="walk", dtype=jnp.float32, config=cfg,
    )
    nv0 = cand_fused_nv(g)
    k0 = g.cand_ids.shape[1]
    g2, i_v = iu.add_point_data(
        g, "extra", np.asarray(pts.sum(1) * 5.0), fuse=False
    )
    assert g2.cand_ids.shape[1] == k0  # append didn't touch the lists

    fn = str(tmp_path / "nore.binda")
    save_grid(g2, fn)
    timings = {}
    g3 = load_grid(fn, config=cfg, timings=timings)
    assert g3.cand_ids.shape[1] == k0, "load rebuilt the lists"
    assert timings["rebuild_s"] < 0.05, "load paid a candidate rebuild"
    assert g3.cand_nv == nv0 and cand_fused_nv(g3) == nv0

    rng = np.random.default_rng(23)
    r = jnp.asarray(rng.random((256, 3)), jnp.float32)
    v, _, f = iu.interpolate_scalar_at(g3, r, i_v)
    assert bool(np.asarray(f).all())
    np.testing.assert_allclose(
        np.asarray(v), 5.0 * np.asarray(r.sum(1)), rtol=1e-5
    )
