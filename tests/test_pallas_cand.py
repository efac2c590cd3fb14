"""Interpret-mode parity of the Pallas candidate-row kernel.

The kernel (ops/pallas_cand.py) must reproduce the XLA candidate tile
path exactly: same winning candidate, same containment margin, same
bin count, and the same fused interpolation values.  On CPU it runs
through the Pallas interpreter; on TPU the same code path is the
production cold-locate kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu.models.grid import cand_fused_nv
from interpolate_unstructured_tpu.ops import interp, locate, pallas_cand
from interpolate_unstructured_tpu.utils import meshgen


def _layout(grid):
    """(quantized, count_col, nv) for the grid's actual row layout."""
    from interpolate_unstructured_tpu.models.grid import (
        _qcand_floats_per,
        cand_is_quantized,
    )

    nf, npc = grid.n_faces_per_cell, grid.n_points_per_cell
    k = grid.cand_ids.shape[1]
    nv = cand_fused_nv(grid)
    if cand_is_quantized(grid.cell_type, grid.dtype, grid.config):
        return True, k * _qcand_floats_per(grid.cell_type, nv), nv
    is_quad = grid.cell_type == "quad"
    data_role0 = 4 * nf + (3 * npc if is_quad else 0) + 1
    return False, k * (data_role0 + npc * nv), nv


MESHES = {
    "tetra": lambda: meshgen.tet_box_mesh(5, 5, 5),
    "triangle": lambda: meshgen.triangle_rect_mesh(6, 5),
    "quad": lambda: meshgen.quad_rect_mesh(6, 5),
}


@pytest.mark.parametrize("cell_type", ["tetra", "triangle", "quad"])
def test_pallas_cand_parity(cell_type):
    pts, cells, nbrs = MESHES[cell_type]()
    grid = iu.build_grid(
        pts, cells, nbrs, cell_type,
        point_data={"Polynomial": pts.sum(1) + 1.0},
        locate_mode="walk", dtype=jnp.float32,
    )
    assert grid.cand_table is not None
    assert cand_fused_nv(grid) >= 1

    rng = np.random.default_rng(7)
    lo, hi = np.asarray(grid.rmin), np.asarray(grid.rmax)
    r = np.concatenate([
        lo + rng.random((1024, 3)) * (hi - lo),
        lo - 0.1 * (hi - lo) + rng.random((256, 3)) * 1.2 * (hi - lo),
    ])
    if cell_type != "tetra":
        r[:, 2] = 0.0
    r = jnp.asarray(r, jnp.float32)

    quantized, ccol, nv = _layout(grid)
    r_t = r.T
    ijk = locate._cand_bin_ijk_t(grid, r_t)
    nby, nbz = grid.cand_shape[1], grid.cand_shape[2]
    idx = (ijk[0] * nby + ijk[1]) * nbz + ijk[2]
    rq_t = locate._cand_local_t(grid, r_t, ijk) if quantized else r_t
    K = grid.cand_ids.shape[1]
    id_best, aux, vals_t = pallas_cand.cand_rows_query(
        grid, grid.cand_table, idx, rq_t, (0,), ccol,
        grid.config.eps_inside + grid.cand_qeps, K, interpret=True,
        quantized=quantized, nv_fused=nv,
    )
    vals = vals_t.T
    aux = np.asarray(aux)

    # aux encoding: -2 = found; >= 0 = overflow-bin miss carrying the
    # extension-table slot; -1 = exact miss (non-overflow bin)
    bins = np.asarray(locate._cand_bin_index(grid, r))
    true_cnt = np.asarray(grid.cand_count)[bins]
    over = true_cnt > K
    found = aux == -2
    np.testing.assert_array_equal(aux[~found & ~over], -1)
    if (~found & over).any():
        slots = np.asarray(grid.cand_ext_slot)[bins[~found & over]]
        np.testing.assert_array_equal(aux[~found & over], slots)
    # Every phase-0 hit must actually contain its query
    inside = np.asarray(
        locate.point_is_inside_cell(grid, r, jnp.maximum(id_best, 0))
    )
    assert inside[found].all()

    # Fused values match the standalone interpolation at the same cells
    ref = np.asarray(
        interp.interpolate_at_icell(
            grid, r, jnp.asarray([0]), jnp.maximum(id_best, 0)
        )
    )[:, 0]
    np.testing.assert_allclose(
        np.asarray(vals)[found, 0], ref[found], rtol=2e-5, atol=2e-5
    )

    # Agreement with the full XLA candidate path where both are found
    ic_ref, found_ref, vals_ref = locate._candidates_query(grid, r, (0,))
    both = found & np.asarray(found_ref)
    np.testing.assert_array_equal(
        np.asarray(id_best)[both], np.asarray(ic_ref)[both]
    )
