"""Pallas TPU kernel: consume gathered candidate rows in one pass.

The cold-locate candidate path gathers one packed row per query (XLA's
row gather runs at HBM bandwidth) and then answers containment — and,
for fused variables, interpolation — from that row.  Doing the row math
in XLA costs 3-8x the gather itself: every (B, K) intermediate with
K ~ 10 lane-pads to (B, 128), and the role slices of the (B, W) gather
re-stream the buffer per consumer (measured on v5e:
benchmarks/prof_cand.py — gather 5.7 ms/1M, XLA phase-0 11-22 ms/1M,
fused values 30-48 ms/1M).

This kernel streams (TILE, W) blocks of the gathered rows through VMEM,
TRANSPOSES each block once on-chip (one MXU-backed relayout instead of
per-op lane padding), and runs all the small-K reductions — face
margins, argmax, one-hot picks, barycentric / inverse-bilinear values —
as (K, TILE) sublane-sliced ops at full lane utilization.  Only
~16 B/query of results go back to HBM.

Row layouts (cols role-major, K wide; column of role j, candidate k is
``j*K + k``):
  f32 simplex (models/grid._pack_cand_rows_jit):
           [nx_f | ny_f | nz_f | off_f | id | pdata | count]
  quad:    [nx_f | ny_f | nz_f | off_f | vtx(v,dim) | id | data | count]
  QUANTIZED simplex (grid._pack_qcand_rows_jit, the f32 default —
  int16 probe geometry in the query bin's local frame + exact f32
  value planes; ~1.3-1.6x fewer row bytes and the random row gather
  is ~94% of the cold query):
           [qn pairs | qd pairs | (gx gy gz c)*nv | id | count | dscale]
Simplex f32 ``pdata`` is vertex data premultiplied by the vertex's
inverse height, so values are formed straight from margins (no
inverse-height role).  For the quantized layout ``r_ref`` carries
r_local = r - bin_center instead of r.

Semantics match ops.locate._candidates_query's XLA tile path exactly
(m_interp_unstructured.f90:766-786 containment, :529-641 weights).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def _quad_weights_rows(p, q):
    """Inverse-bilinear quad weights on (1, T) row vectors.

    ``p[v]`` = (x, y, z) rows of vertex v, ``q`` = query rows.  The
    arithmetic is the single shared definition in ops/wkern.py
    (:588-641)."""
    from . import wkern

    return wkern.quad_weights_generic(p, q, wkern.Plain(q[0].dtype))


def _kernel(
    g_ref, r_ref, ic_ref, aux_ref, vals_ref,
    *, cell_type, nf, npc, k_max, var_slots, count_col, eps, ovf_base,
    quantized=False, nv_fused=0, df_planes=False
):
    K = k_max
    is_quad = cell_type == "quad"
    s_n = -(-3 * nf // 2)
    s_d = -(-nf // 2)
    if df_planes:
        # accurate-mode rows (grid._pack_qdf_rows_jit): quantized probe
        # + (hi, lo) df32 value planes; r_ref carries the (hi, lo)
        # split of r_local as 6 rows
        id_role = s_n + s_d + 8 * nv_fused
    elif quantized:
        id_role = s_n + s_d + 4 * nv_fused
    else:
        id_role = 4 * nf + (3 * npc if is_quad else 0)

    # One on-chip transpose instead of lane-padding every small-K op
    GT = jnp.transpose(g_ref[:])  # (W, T)

    def role(j):  # (K, T) sublane slice of role j
        return GT[j * K:(j + 1) * K]

    rx = r_ref[0:1, :]
    ry = r_ref[1:2, :]
    rz = r_ref[2:3, :]

    m_faces = []
    margins = None
    if quantized:
        # int16-quantized probe (models/grid._pack_qcand_rows_jit):
        # unit normals at 1/32767 scale, face offsets in the query
        # bin's LOCAL frame at the row's dscale.  r_ref carries
        # r_local = r - bin_center.  Margins are exact planes within
        # grid.cand_qeps of the true faces; eps already includes that.
        inv = jnp.float32(1.0 / 32767.0)
        ds = GT[count_col + 1:count_col + 2]  # (1, T) row dscale

        def unpack(j):  # slot j -> (even, odd) int16 comps as f32
            w = jax.lax.bitcast_convert_type(role(j), jnp.int32)
            # jnp shifts keep int32 under x64 (weak-typed literals);
            # >> on signed ints is arithmetic, giving the sign-extended
            # int16 halves
            lo = jnp.right_shift(jnp.left_shift(w, 16), 16)
            hi = jnp.right_shift(w, 16)
            return lo.astype(jnp.float32), hi.astype(jnp.float32)

        comps = []
        for s in range(s_n):
            comps.extend(unpack(s))
        dcomps = []
        for s in range(s_d):
            dcomps.extend(unpack(s_n + s))
        idv = role(id_role)
        for f in range(nf):
            proj = (
                comps[3 * f] * rx
                + comps[3 * f + 1] * ry
                + comps[3 * f + 2] * rz
            ) * inv
            mf = dcomps[f] * ds - proj
            m_faces.append(mf)
            margins = mf if margins is None else jnp.minimum(margins, mf)
        # padding slots carry no huge-offset sentinel (int16 can't);
        # mask them out by the id sign instead
        margins = jnp.where(idv < 0, jnp.float32(-1e30), margins)
    else:
        # Margins from PRECOMPUTED unit face planes: 2 fused
        # multiply-adds per face vs ~40 VPU ops for vertex-derived
        # planes.  A vertex-only row (17 floats/candidate, K 15 at
        # 1 KB) was measured 8.6 ms/1M in-kernel vs 3.6 for this
        # layout — the gather bytes saved never paid for the in-kernel
        # cross products (benchmarks/RESULTS.md round 3).
        for f in range(nf):
            mf = role(3 * nf + f) - (
                role(f) * rx + role(nf + f) * ry + role(2 * nf + f) * rz
            )
            m_faces.append(mf)
            margins = mf if margins is None else jnp.minimum(margins, mf)

    k_best = jnp.argmax(margins, axis=0, keepdims=True).astype(jnp.int32)
    m_best = jnp.max(margins, axis=0, keepdims=True)

    t = GT.shape[1]
    onehot = lax.broadcasted_iota(jnp.int32, (K, t), 0) == k_best

    def pick(x):  # winner's value, (K, T) -> (1, T)
        return jnp.sum(jnp.where(onehot, x, 0.0), axis=0, keepdims=True)

    id_best = pick(role(id_role)).astype(jnp.int32)
    ic_ref[:] = id_best
    # Containment verdict folded in-kernel (the host-side found/
    # overflow decode cost several full-batch elementwise passes):
    #   aux == -2  -> id_best contains the query
    #   aux >= 0   -> overflow-bin miss; aux = extension-table slot
    #                 (main table) / residual-walk flag (ext table,
    #                 where count > ovf_base means even the extension
    #                 row didn't hold the full list)
    #   aux == -1  -> exact miss: the point is outside the mesh
    cnt = GT[count_col:count_col + 1].astype(jnp.int32)
    found = (m_best >= -eps) & (id_best >= 0)
    ovf_miss = (~found) & (cnt > ovf_base) & (id_best >= 0)
    aux_ref[:] = jnp.where(
        found, -2, jnp.where(ovf_miss, cnt - (ovf_base + 1), -1)
    )

    if not var_slots:
        vals_ref[:] = jnp.zeros_like(vals_ref)
        return

    data_role0 = id_role + 1
    rows = []
    if df_planes:
        # df32 value planes: v = g . r_local + c_loc evaluated in
        # compensated-f32 (ops/df32) with the exact (hi, lo) r_local
        # split from rows 3..5 of r_ref — ~2^-48 relative end to end
        from . import df32

        rl = [
            (r_ref[d : d + 1, :], r_ref[3 + d : 4 + d, :])
            for d in range(3)
        ]
        his, los = [], []
        for slot in var_slots:
            pr = s_n + s_d + 8 * slot
            # pick the WINNER's plane first (8 one-hot reductions),
            # then run the ~90-op df32 evaluation on (1, T) rows only
            acc = (pick(role(pr + 6)), pick(role(pr + 7)))  # c_loc
            for d in range(3):
                g_d = (pick(role(pr + d)), pick(role(pr + 3 + d)))
                acc = df32.add(acc, df32.mul(g_d, rl[d]))
            his.append(acc[0])
            los.append(acc[1])
        vals_ref[:] = jnp.concatenate(his + los, axis=0)
        return
    if quantized:
        # Exact f32 per-cell value planes: value = g . r_local + c
        for slot in var_slots:
            pr = s_n + s_d + 4 * slot
            val = (
                role(pr) * rx + role(pr + 1) * ry + role(pr + 2) * rz
                + role(pr + 3)
            )
            rows.append(pick(val))
        vals_ref[:] = jnp.concatenate(rows, axis=0)
        return
    if is_quad:
        v0 = 4 * nf  # first vertex role
        p = [
            [pick(role(v0 + v * 3 + d)) for d in range(3)]
            for v in range(npc)
        ]
        w = _quad_weights_rows(p, (rx, ry, rz))
        for slot in var_slots:
            acc = w[0] * pick(role(data_role0 + slot * npc))
            for v in range(1, npc):
                acc = acc + w[v] * pick(role(data_role0 + slot * npc + v))
            rows.append(acc)
    else:
        # barycentric straight from margins: the packed data of vertex
        # v is PREMULTIPLIED by its inverse height at build time
        # (models/grid._pack_cand_rows_jit), so the weight of vertex v
        # is just the margin of face (v+1)%npc
        for slot in var_slots:
            dr = data_role0 + slot * npc
            acc = None
            for v in range(npc):
                term = m_faces[(v + 1) % npc] * role(dr + v)
                acc = term if acc is None else acc + term
            rows.append(pick(acc))
    vals_ref[:] = jnp.concatenate(rows, axis=0)


def supported(grid) -> bool:
    return (
        grid.dtype == jnp.float32
        and grid.cell_type in ("triangle", "tetra", "quad")
    )


def cand_rows_query(grid, table, idx, rt_t, var_slots, count_col,
                    eps, ovf_base, k_max=None, tile: int = 1024,
                    interpret: bool | None = None,
                    quantized: bool = False, nv_fused: int = 0,
                    df_planes: bool = False):
    """Gather candidate rows and run the kernel over them.

    The gather happens HERE so tile-alignment padding applies to the
    4-byte indices, not the kilobyte rows (padding a gathered (B, W)
    buffer is a full extra HBM copy — visible as a 1 GB `pad` op in
    the compiled HLO for non-tile-multiple batches).

    Args:
      table: (n_rows, W) float32 packed candidate rows (main or
        extension table)
      idx: (B,) int32 row index per query
      rt_t: (3, B) float32 TRANSPOSED queries (the hot path keeps
        queries lane-major throughout — per-call (B, 3) transposes
        cost ~1-2 ms each at 1M on TPU); (6, B) hi/lo r_local split
        when ``df_planes``
      var_slots: tuple of fused variable slots to interpolate (or ())
      count_col: column of the count slot in the row layout
      eps: static inside-test tolerance (resolved config value)
      ovf_base: static count threshold above which a missed query is
        an overflow-bin miss (main table: K; extension table:
        K + k_ext)
      k_max: candidates per row (defaults to the main table's K; pass
        the extension width when probing extension rows)

    Returns (id_best (B,) int32, aux (B,) int32, valsT (V, B); a
    (0, B) array when no slots are requested); see _kernel for the
    aux encoding.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = idx.shape[0]
    w = table.shape[1]
    nf = grid.n_faces_per_cell
    npc = grid.n_points_per_cell
    if k_max is None:
        k_max = grid.cand_ids.shape[1]
    n_rrows = 6 if df_planes else 3
    n_out = max((2 if df_planes else 1) * len(var_slots), 1)

    b_pad = _round_up(max(b, tile), tile)
    if b_pad != b:
        idx = jnp.pad(idx, (0, b_pad - b))
        rt_t = jnp.pad(rt_t, ((0, 0), (0, b_pad - b)))
    g = table[idx]
    r_t = rt_t.astype(jnp.float32)

    kernel = functools.partial(
        _kernel,
        cell_type=grid.cell_type,
        nf=nf,
        npc=npc,
        k_max=k_max,
        var_slots=tuple(var_slots),
        count_col=count_col,
        eps=float(eps),
        ovf_base=int(ovf_base),
        quantized=bool(quantized),
        nv_fused=int(nv_fused),
        df_planes=bool(df_planes),
    )

    n_tiles = b_pad // tile
    f32 = jnp.float32
    ic, aux, vals = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rrows, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_out, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_out, b_pad), f32),
        ],
        interpret=interpret,
    )(g, r_t)

    # Empty var_slots returns a (0, b) array, NOT None: callers chunk
    # the outputs through lax.map/concatenate, where a None leaf means
    # a crash one refactor away (the kernel's scratch output row is
    # simply dropped).
    return (
        ic[0, :b],
        aux[0, :b],
        vals[:, :b] if var_slots else vals[:0, :b],
    )
