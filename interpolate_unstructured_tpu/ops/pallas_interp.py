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


def _cross_rows(a, b):
    """Cross product of two (3, TILE) row stacks -> (3, TILE)."""
    return jnp.concatenate(
        [
            _row(a, 1) * _row(b, 2) - _row(a, 2) * _row(b, 1),
            _row(a, 2) * _row(b, 0) - _row(a, 0) * _row(b, 2),
            _row(a, 0) * _row(b, 1) - _row(a, 1) * _row(b, 0),
        ],
        axis=0,
    )


def _norm_row(a):
    return jnp.sqrt(
        _row(a, 0) ** 2 + _row(a, 1) ** 2 + _row(a, 2) ** 2
    )


def _dot_rows(a, b):
    return (
        _row(a, 0) * _row(b, 0)
        + _row(a, 1) * _row(b, 1)
        + _row(a, 2) * _row(b, 2)
    )


def _triangle_weights_rows(g, rb):
    """g: (K, TILE) gathered payload, rb: (3, TILE). Returns list of
    (1, TILE) weights. Row layout: vertex k coords at rows [3k, 3k+3),
    area at row 9.  (interpolate_triangle, :529-551)"""
    p = [g[3 * k : 3 * k + 3, :] for k in range(3)]
    area = _row(g, 9)
    a0 = 0.5 * _norm_row(_cross_rows(rb - p[1], rb - p[2]))
    a1 = 0.5 * _norm_row(_cross_rows(rb - p[2], rb - p[0]))
    a2 = 0.5 * _norm_row(_cross_rows(rb - p[0], rb - p[1]))
    inv = 1.0 / area
    return [a0 * inv, a1 * inv, a2 * inv]


def _tetra_weights_rows(g, rb):
    """(interpolate_tetrahedron, :553-586); volume at row 12."""
    p = [g[3 * k : 3 * k + 3, :] for k in range(4)]
    vol = _row(g, 12)
    v1r = rb - p[0]
    v2r = rb - p[1]
    v12 = p[1] - p[0]
    v13 = p[2] - p[0]
    v14 = p[3] - p[0]
    v23 = p[2] - p[1]
    v24 = p[3] - p[1]

    def triple(a, b, c):
        return _dot_rows(a, _cross_rows(b, c))

    inv = 1.0 / (6.0 * vol)
    return [
        triple(v2r, v24, v23) * inv,
        triple(v1r, v13, v14) * inv,
        triple(v1r, v14, v12) * inv,
        triple(v1r, v12, v13) * inv,
    ]


def _quad_weights_rows(g, rb):
    """Inverse bilinear (interpolate_quad, :588-641); rows as tetra."""
    p = [g[3 * k : 3 * k + 3, :] for k in range(4)]
    q = rb - p[0]
    b1 = p[1] - p[0]
    b2 = p[3] - p[0]
    b3 = p[0] - p[1] - p[3] + p[2]

    def cpz(a, b):
        return _row(a, 0) * _row(b, 1) - _row(a, 1) * _row(b, 0)

    qa = cpz(b2, b3)
    qb = cpz(b3, q) - cpz(b1, b2)
    qc = cpz(b1, q)
    disc = qb * qb - 4.0 * qa * qc
    # Stable evaluation of the reference root — must match
    # interp.quad_weights (see the comment there)
    sqrt_d = jnp.sqrt(jnp.maximum(disc, 0.0))
    qq = -0.5 * (qb + jnp.where(qb >= 0, sqrt_d, -sqrt_d))
    tiny_qa = jnp.abs(qa) <= 8.0 * jnp.finfo(qa.dtype).eps * jnp.abs(qb)
    linear = (qb >= 0) & tiny_qa
    qa_safe = jnp.where(tiny_qa, 1.0, qa)
    qq_safe = jnp.where(qq == 0, 1.0, qq)
    mu = jnp.where(
        linear,
        -qc / jnp.where(jnp.abs(qb) > 0, qb, 1.0),
        jnp.where(qb >= 0, qq / qa_safe, qc / qq_safe),
    )

    denom = b1 + mu * b3  # (3, TILE) via broadcast of (1, TILE)
    a0, a1, a2 = (jnp.abs(_row(denom, d)) for d in range(3))
    # First-occurrence maxloc over the 3 components (:628-632)
    use0 = a0 >= a1
    d01 = jnp.where(use0, _row(denom, 0), _row(denom, 1))
    q01 = jnp.where(use0, _row(q, 0), _row(q, 1))
    b01 = jnp.where(use0, _row(b2, 0), _row(b2, 1))
    use01 = jnp.maximum(a0, a1) >= a2
    dd = jnp.where(use01, d01, _row(denom, 2))
    qq = jnp.where(use01, q01, _row(q, 2))
    bb = jnp.where(use01, b01, _row(b2, 2))
    # degenerate-quad guard: keep all four kernel copies in agreement
    dd = jnp.where(dd == 0, 1.0, dd)
    lam = (qq - bb * mu) / dd
    return [
        (1 - lam) * (1 - mu),
        lam * (1 - mu),
        lam * mu,
        (1 - lam) * mu,
    ]


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
