"""Pallas TPU kernel: fused locate + interpolate for small meshes.

The XLA version of the brute-force path materializes a (B, C*nf) margin
buffer and a (B, C) one-hot in HBM — ~130 MB of traffic per 1M queries.
This kernel keeps the whole mesh (face planes + per-cell payload) in
VMEM and streams query tiles through it: per tile everything — margins,
argmax, one-hot gather, weight kernels, contraction — happens on-chip,
so HBM traffic collapses to reading the queries and writing the
results (~24 MB per 1M queries).

Layout is transposed (lanes = queries): queries arrive as (3, B) and
all intermediates are (rows, TILE) with TILE lanes, so reductions over
cells run along sublanes and the MXU sees well-shaped
(C_pad, 3) x (3, TILE) and (K, C_pad) x (C_pad, TILE) contractions.

Semantics match ops.interp._interpolate_bruteforce /
m_interp_unstructured.f90:412-527 exactly: most-interior containing
cell via the all-faces inside test (:766-786), then the cell-type
weight kernel (:529-641).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
MAX_CELLS = 4096  # C_pad cap: keeps the (C_pad, TILE) buffers in VMEM


def _round_up(x, m):
    return -(-x // m) * m


def _row(g, i):
    return g[i : i + 1, :]  # (1, TILE)


def _vq_rows(g, rb, npc):
    """Gathered payload + query rows -> per-component (1, TILE) lists
    for the shared weight kernels (ops/wkern.py).  Row layout: vertex
    k coords at rows [3k, 3k+3)."""
    v = [[_row(g, 3 * k + d) for d in range(3)] for k in range(npc)]
    q = [_row(rb, d) for d in range(3)]
    return v, q


def _triangle_weights_rows(g, rb):
    """(interpolate_triangle, :529-551); area at row 9.  Shared
    kernel: ops/wkern.py; normalization by reciprocal-MULTIPLY (one
    VPU divide total — per-weight divides measured 3x on the fused
    tracer round, round 4)."""
    from . import wkern

    v, q = _vq_rows(g, rb, 3)
    a2 = wkern.triangle_areas2(v, q, wkern.Plain(jnp.float32))
    inv = 0.5 / _row(g, 9)
    return [a * inv for a in a2]


def _tetra_weights_rows(g, rb):
    """(interpolate_tetrahedron, :553-586); volume at row 12.  Shared
    kernel: ops/wkern.py; reciprocal-multiply normalization."""
    from . import wkern

    v, q = _vq_rows(g, rb, 4)
    w = wkern.tetra_triples(v, q, wkern.Plain(jnp.float32))
    inv = 1.0 / (6.0 * _row(g, 12))
    return [t * inv for t in w]


def _quad_weights_rows(g, rb):
    """Inverse bilinear (interpolate_quad, :588-641); rows as tetra.
    Shared kernel: ops/wkern.py."""
    from . import wkern

    v, q = _vq_rows(g, rb, 4)
    return wkern.quad_weights_generic(v, q, wkern.Plain(jnp.float32))


_WEIGHTS_ROWS = {
    "triangle": _triangle_weights_rows,
    "quad": _quad_weights_rows,
    "tetra": _tetra_weights_rows,
}


def _kernel(
    n_ref, d_ref, t_ref, r_ref, vals_ref, ic_ref, found_ref,
    *, cell_type, nf, npc, n_vars, eps
):
    rb = r_ref[:]  # (3, TILE)

    # Containment margins: min over faces of d - r.n, all cells at once
    m = None
    for k in range(nf):
        s = jnp.dot(
            n_ref[k], rb,
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        mk = d_ref[k] - s  # (C_pad, TILE); d_ref[k] is (C_pad, 1)
        m = mk if m is None else jnp.minimum(m, mk)

    best = jnp.argmax(m, axis=0, keepdims=True).astype(jnp.int32)
    mx = jnp.max(m, axis=0, keepdims=True)
    found = mx >= -eps

    # One-hot gather of the chosen cell's payload on the MXU
    c_pad, tile = m.shape
    onehot = (
        lax.broadcasted_iota(jnp.int32, (c_pad, tile), 0) == best
    ).astype(jnp.float32)
    g = jnp.dot(
        t_ref[:], onehot,
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    w = _WEIGHTS_ROWS[cell_type](g, rb)  # npc x (1, TILE)

    base = npc * 3 + 1
    vals = []
    for v in range(n_vars):
        acc = w[0] * _row(g, base + v)
        for k in range(1, npc):
            acc = acc + w[k] * _row(g, base + k * n_vars + v)
        vals.append(acc)
    vals_ref[:] = jnp.concatenate(vals, axis=0)
    ic_ref[:] = jnp.where(found, best, -1)
    found_ref[:] = found.astype(jnp.int32)


def supported(grid, r_dtype) -> bool:
    """Kernel eligibility: f32 small mesh (VMEM-resident tables)."""
    return (
        jnp.dtype(r_dtype) == jnp.float32
        and grid.n_cells <= MAX_CELLS
        and grid.cell_type in _WEIGHTS_ROWS
    )


def interpolate_bruteforce_pallas(
    grid, r, i_vars, tile: int | None = None, interpret: bool | None = None
):
    """Fused locate+interpolate. Args as ops.interp, returns
    (values (B, V), i_cell (B,), found (B,))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n_cells, nf = grid.face_offsets.shape
    npc = grid.n_points_per_cell
    i_vars = jnp.asarray(i_vars)
    n_vars = int(i_vars.shape[0])
    # Pad cells only to the f32 sublane granularity (8): for an
    # 8-cell mesh this is 16x less margin work than padding to 128
    c_pad = _round_up(max(n_cells, 8), 8)
    if tile is None:
        # Largest measured-fastest tile whose (C_pad, TILE) buffers
        # stay comfortably in VMEM
        # ~4MB margin + ~4MB one-hot buffers at the cap
        tile = max(256, min(8192, ((1 << 20) // c_pad) // 128 * 128))
    b = r.shape[0]
    b_pad = _round_up(max(b, tile), tile)

    f32 = jnp.float32
    # Constants: face-plane tables and the per-cell payload, padded
    normals = jnp.swapaxes(grid.face_normals, 0, 1).astype(f32)  # (nf, C, 3)
    nmat = jnp.zeros((nf, c_pad, 3), f32).at[:, :n_cells, :].set(normals)
    offs = jnp.swapaxes(grid.face_offsets, 0, 1).astype(f32)  # (nf, C)
    dvec = jnp.full((nf, c_pad, 1), -BIG, f32).at[:, :n_cells, 0].set(offs)

    pd_cell = grid.point_data[:, i_vars][grid.cells]  # (C, npc, V)
    table = jnp.concatenate(
        [
            grid.cell_points.reshape(n_cells, npc * 3),
            grid.cell_volume[:, None],
            pd_cell.reshape(n_cells, npc * n_vars),
        ],
        axis=1,
    ).astype(f32)
    k_rows = npc * 3 + 1 + npc * n_vars
    table_t = jnp.zeros((k_rows, c_pad), f32).at[:, :n_cells].set(table.T)

    r_t = jnp.zeros((3, b_pad), f32).at[:, :b].set(r.astype(f32).T)

    kernel = functools.partial(
        _kernel,
        cell_type=grid.cell_type,
        nf=nf,
        npc=npc,
        n_vars=n_vars,
        eps=float(grid.config.eps_inside),
    )

    n_tiles = b_pad // tile
    vals_t, ic_t, found_t = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (nf, c_pad, 3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (nf, c_pad, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k_rows, c_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (n_vars, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_vars, b_pad), f32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.int32),
        ],
        interpret=interpret,
    )(nmat, dvec, table_t, r_t)

    values = vals_t[:, :b].T.astype(r.dtype)
    i_cell = ic_t[0, :b]
    found = found_t[0, :b].astype(bool)
    return values, i_cell, found
