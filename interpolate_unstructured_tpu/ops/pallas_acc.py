"""Pallas TPU kernel: fused df32 (compensated-f32) interpolation.

The accurate mode's weight/value math is ~2k f32 VPU flops per query
across a ~2000-node elementwise DAG (df32 error-free transforms,
:mod:`.df32`).  XLA splits a DAG that large into hundreds of fusions,
spilling every (B,) df32 temporary to HBM — measured ~29 ms/1M queries
of pure math on the 1M-cell tet mesh, ~15x the arithmetic floor.  One
Pallas kernel holds the whole computation per query tile, so the
temporaries live in VMEM/registers and HBM traffic collapses to the
gathered rows in + two value rows out (measured ~1.3 ms/1M math).

Layout mirrors pallas_cand: queries arrive TRANSPOSED ((3, B) hi and
lo), rows are gathered by XLA outside the kernel ((B, width), one
on-chip transpose per block), outputs are (n_vars, B) hi/lo pairs.

Weight semantics are IDENTICAL to ops.interp_acc's XLA tile — both
call the same df32 weight functions (shape-polymorphic on (1, T)
rows), which mirror m_interp_unstructured.f90:529-641.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df32

TILE = 1024
_SUB = 8  # VPU sublanes: each df32 scalar runs as an (8, TILE//8) tile


def _round_up(x, m):
    return -(-x // m) * m


def _kernel(
    g_ref, qh_ref, ql_ref, vh_ref, vl_ref,
    *, cell_type, npc, nv, i_vars,
):
    from .interp_acc import (
        _weights_quad_df,
        _weights_tet_df,
        _weights_tri_df,
    )

    # Per-query scalars shaped (1, T) use one of the VPU's 8 sublanes
    # — measured ~7x off the elementwise ceiling.  Reshape every
    # column to (8, T/8) once (full vregs), run the whole df32 DAG at
    # full width, reshape the outputs back.  The row-major split
    # (j, i) -> (8j + i//(T/8), i mod T/8) keeps query order.
    t8 = TILE // _SUB
    # Rows are padded to the 512 B gather-width floor; only the first
    # npc*6 + 2*nv*npc columns hold data — transpose just those.
    used = npc * 6 + 2 * nv * npc
    gt = jnp.transpose(g_ref[:, :used])  # (used, T) — one on-chip transpose
    gt8 = gt.reshape(used * _SUB, t8)

    def col(j):
        return gt8[j * _SUB : (j + 1) * _SUB, :]  # (8, T/8)

    qh8 = qh_ref[:].reshape(3 * _SUB, t8)
    ql8 = ql_ref[:].reshape(3 * _SUB, t8)
    q = [
        (qh8[d * _SUB : (d + 1) * _SUB, :], ql8[d * _SUB : (d + 1) * _SUB, :])
        for d in range(3)
    ]
    v = [
        [(col(vtx * 3 + d), col(npc * 3 + vtx * 3 + d)) for d in range(3)]
        for vtx in range(npc)
    ]
    if cell_type == "triangle":
        w = _weights_tri_df(q, v)
    elif cell_type == "tetra":
        w = _weights_tet_df(q, v)
    else:
        w = _weights_quad_df(q, v)

    if cell_type in ("triangle", "tetra"):
        tot = w[0]
        for k in range(1, npc):
            tot = df32.add(tot, w[k])
        w = [df32.div(wk, tot) for wk in w]

    d0 = npc * 6
    outs_h, outs_l = [], []
    for slot in i_vars:
        acc = None
        for vtx in range(npc):
            dhi = col(d0 + slot * npc + vtx)
            dlo = col(d0 + nv * npc + slot * npc + vtx)
            term = df32.mul(w[vtx], (dhi, dlo))
            acc = term if acc is None else df32.add(acc, term)
        outs_h.append(acc[0])
        outs_l.append(acc[1])
    n_out = len(i_vars)
    vh_ref[:] = jnp.concatenate(outs_h, axis=0).reshape(n_out, TILE)
    vl_ref[:] = jnp.concatenate(outs_l, axis=0).reshape(n_out, TILE)


@functools.partial(
    jax.jit,
    static_argnames=("cell_type", "npc", "nv", "i_vars", "interpret"),
)
def interp_acc_rows(
    rows, qh_t, ql_t, *, cell_type, npc, nv, i_vars,
    interpret: bool | None = None,
):
    """df32 interpolation over pre-gathered acc rows.

    Args:
      rows: (B, width) gathered acc-table rows.
      qh_t, ql_t: (3, B) transposed query split.
      i_vars: static tuple of (already wrapped) variable slots.

    Returns (vals_hi, vals_lo): (len(i_vars), B) TRANSPOSED pairs.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = rows.shape[0]
    bp = _round_up(max(b, TILE), TILE)
    if bp != b:
        rows = jnp.pad(rows, ((0, bp - b), (0, 0)))
        qh_t = jnp.pad(qh_t, ((0, 0), (0, bp - b)))
        ql_t = jnp.pad(ql_t, ((0, 0), (0, bp - b)))
    n_out = len(i_vars)
    grid = (bp // TILE,)
    kernel = functools.partial(
        _kernel, cell_type=cell_type, npc=npc, nv=nv, i_vars=i_vars
    )
    vh, vl = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, rows.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((3, TILE), lambda i: (0, i)),
            pl.BlockSpec((3, TILE), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((n_out, TILE), lambda i: (0, i)),
            pl.BlockSpec((n_out, TILE), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_out, bp), jnp.float32),
            jax.ShapeDtypeStruct((n_out, bp), jnp.float32),
        ],
        interpret=interpret,
    )(rows, qh_t, ql_t)
    return vh[:, :b], vl[:, :b]
