"""Pallas TPU kernel: one fused field-line-tracer round.

The tracer's RK23 iteration (trace.py, re-design of
iu_integrate_along_field, m_interp_unstructured.f90:987-1217) runs
three dependent walk+interpolate sub-steps.  As three separate
``lax.while_loop``s each runs to its *slowest lane* and pays a
separate row gather + lane-padded XLA interpolation per stage —
measured walk-ROUND bound (benchmarks/RESULTS.md round 2, open item 2).

This kernel fuses the whole iteration body into ONE per-round program:

* the neighbor-walk round (shared face math: pallas_walk._face_round);
* for lanes whose walk ARRIVES this round: the field interpolation at
  the target, read from the SAME gathered row (the fused trace table
  carries cell vertices, volume and the traced field's vertex values —
  trace.build_trace_table), so the per-stage interpolation gather
  disappears entirely;
* the RK stage machine: k2/k3/k4 capture, next-stage target, walk
  re-initialization — each lane advances through stages 2 -> 3 -> 4
  independently, so one lane can be walking stage 4 while another is
  still in stage 2 and per-stage straggler tails overlap instead of
  adding up.

Only the per-round row gather (XLA's fast per-row DMA path) and the
loop condition stay outside.  State rides two stacked row blocks so
the pallas_call signature stays small:

float32 F (32, B) rows:
   0-2  r_p       current walk position
   3-5  tgt       current stage's walk target (:= ys position)
   6-8  u         walk direction (unit)
   9    dist_left
  10-12 k1, 13-15 k2, 16-18 k3, 19-21 k4   (arc-length derivatives)
  22-24 field4    field at the stage-4 arrival point
  25-27 rp_fail   walk endpoint of the failing stage (boundary shrink)
  28-30 anchor    iteration start position (read-only)
  31    dx        current step size (read-only)

int32 I (8, B) rows:
  0 ic, 1 prev, 2 steps-in-stage, 3 walk-active, 4 stage (2..4; 5 =
  iteration finished), 5 fail flag, 6 ic at failure, 7 pad

Supported when the grid is float32 tri/tet/quad, no icell mask and no
extra ODE variables (``nvar == 0``); the generic XLA path in trace.py
remains the reference implementation for every other case (and for the
CPU test oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_walk import _face_round

# F-block row indices
_RP, _TGT, _U = 0, 3, 6
_DL = 9
_K1, _K2, _K3, _K4 = 10, 13, 16, 19
_FLD4, _RPF, _ANC = 22, 25, 28
_DX = 31
F_ROWS = 32
# I-block row indices
_IC, _PREV, _STEPS, _WACT, _STAGE, _FAIL, _ICF = 0, 1, 2, 3, 4, 5, 6
I_ROWS = 8


def _norm_rows(a):
    return jnp.sqrt(a[0] * a[0] + a[1] * a[1] + a[2] * a[2])


def _weights_rows(cell_type, P, vol, q):
    """Interpolation weights on (1, T) rows — the shared kernels in
    ops/wkern.py, so fused and unfused tracer paths agree by
    construction.

    P[v] = (x, y, z) rows of vertex v; vol = area/volume row; q = query
    rows.  Returns a list of npc weight rows."""
    from . import wkern

    v = [[P[vtx][c] for c in range(3)] for vtx in range(len(P))]
    ar = wkern.Plain(jnp.float32)
    # Normalize by reciprocal-MULTIPLY: one VPU divide total.  The
    # per-weight-divide form measured 3x slower END-TO-END on the
    # fused tracer round kernel (round 4: 1.3e7 -> 4.6e6 steps/s).
    if cell_type == "triangle":
        a2 = wkern.triangle_areas2(v, q, ar)
        inv = 0.5 / vol
        return [a * inv for a in a2]
    if cell_type == "tetra":
        w = wkern.tetra_triples(v, q, ar)
        inv = 1.0 / (6.0 * vol)
        return [t * inv for t in w]
    if cell_type == "quad":
        return wkern.quad_weights_generic(v, q, ar)
    raise ValueError(f"Unsupported cell type {cell_type!r}")


def _kernel(
    eps_ref, g_ref, f_ref, i_ref, f_o, i_o, act_o,
    *, cell_type, nf, npc, ndim, big, reverse, axisymmetric,
    max_steps, min_radius
):
    GT = jnp.transpose(g_ref[:])  # (W, T)
    nudge = eps_ref[0:1, 0:1]
    eps_arrive = eps_ref[1:2, 0:1]
    tiny = eps_ref[2:3, 0:1]

    F = f_ref[:]
    I = i_ref[:]  # noqa: E741

    def fr(i, n=1):
        return F[i : i + n]

    def fr3(i):
        return (F[i : i + 1], F[i + 1 : i + 2], F[i + 2 : i + 3])

    def ir(i):
        return I[i : i + 1]

    u = fr3(_U)
    p = fr3(_RP)
    tgt = fr3(_TGT)
    ic = ir(_IC)
    prev = ir(_PREV)
    stage = ir(_STAGE)
    dl = fr(_DL)
    dx = fr(_DX)
    anchor = fr3(_ANC)
    active = ir(_WACT) != 0

    # ---- walk round (semantics of pallas_walk._kernel) ----
    face_dist, ic_next, hit = _face_round(GT, nf, u, p, prev, big)
    new_dist_left = dl - face_dist
    crossing = hit & (new_dist_left > eps_arrive)
    out_of_domain = ic_next < 0
    continuing = crossing & ~out_of_domain
    advance = face_dist + jnp.where(continuing, nudge, 0.0)
    adv = jnp.where(active & hit, advance, 0.0)
    rp_n = tuple(p[c] + adv * u[c] for c in range(3))
    dl_n = jnp.where(active & hit, dl - advance, dl)
    steps_n = ir(_STEPS) + active.astype(jnp.int32)
    prev_n = jnp.where(active & continuing, ic, prev)
    ic_n = jnp.where(active & crossing, ic_next, ic)

    capped = active & continuing & (steps_n >= max_steps)
    arrived = active & ~crossing
    failednow = (active & crossing & out_of_domain) | capped

    # ---- field interpolation at tgt from the SAME row ----
    cp_off = nf * 5
    vol_off = cp_off + npc * 3
    fv_off = vol_off + 1
    P = [
        tuple(GT[cp_off + v * 3 + c : cp_off + v * 3 + c + 1]
              for c in range(3))
        for v in range(npc)
    ]
    w = _weights_rows(cell_type, P, GT[vol_off : vol_off + 1], tgt)
    fld = []
    for d in range(3):
        if d < ndim:
            acc = w[0] * GT[fv_off + 0 * ndim + d : fv_off + 0 * ndim + d + 1]
            for v in range(1, npc):
                col = fv_off + v * ndim + d
                acc = acc + w[v] * GT[col : col + 1]
            fld.append(acc)
        else:
            fld.append(jnp.zeros_like(tgt[0]))

    # k = +-unit(field): arc-length parameterization (:1193-1201).
    # Guard the norm: a zero interpolated field (stagnation point /
    # zero-initialized variable) would otherwise produce NaN k's and a
    # lane that never accepts NOR finishes, holding the whole batch
    # to max_iterations.  With k = 0 the lane steps in place, accepts
    # (err 0), and terminates via the buffer-overflow path instead.
    fn = jnp.maximum(_norm_rows(fld), tiny)
    sgn = -1.0 if reverse else 1.0
    k_new = tuple(sgn * fld[c] / fn for c in range(3))

    # ---- stage machine ----
    ent3 = arrived & (stage == 2)
    ent4 = arrived & (stage == 3)
    fin = arrived & (stage == 4)
    k1 = fr3(_K1)
    k2 = tuple(
        jnp.where(ent3, k_new[c], F[_K2 + c : _K2 + c + 1]) for c in range(3)
    )
    k3 = tuple(
        jnp.where(ent4, k_new[c], F[_K3 + c : _K3 + c + 1]) for c in range(3)
    )
    k4 = tuple(
        jnp.where(fin, k_new[c], F[_K4 + c : _K4 + c + 1]) for c in range(3)
    )
    fld4 = tuple(
        jnp.where(fin, fld[c], F[_FLD4 + c : _FLD4 + c + 1])
        for c in range(3)
    )
    stage_n = jnp.where(
        arrived, stage + 1, jnp.where(failednow, 5, stage)
    )
    fail_n = ir(_FAIL) | failednow.astype(jnp.int32)
    rpf = tuple(
        jnp.where(failednow, rp_n[c], F[_RPF + c : _RPF + c + 1])
        for c in range(3)
    )
    icf = jnp.where(failednow, ic_n, ir(_ICF))

    # next-stage target: tgt3 = anchor + 0.75 dx k2,
    # tgt4 = anchor + dx (2 k1 + 3 k2 + 4 k3) / 9  (:1122-1156)
    enter = ent3 | ent4
    tgt_n = []
    for c in range(3):
        k123 = (2.0 * k1[c] + 3.0 * k2[c] + 4.0 * k3[c]) / 9.0
        t = anchor[c] + jnp.where(ent3, 0.75 * dx * k2[c], dx * k123)
        if axisymmetric and c == 0:
            t = jnp.maximum(t, min_radius)
        tgt_n.append(jnp.where(enter, t, tgt[c]))
    delta = tuple(tgt_n[c] - tgt[c] for c in range(3))
    total = _norm_rows(delta)
    invt = jnp.where(total > tiny, 1.0 / jnp.where(total > tiny, total, 1.0),
                     0.0)

    wact_n = (enter | (active & continuing & ~capped)).astype(jnp.int32)
    rp_out = tuple(jnp.where(enter, tgt[c], rp_n[c]) for c in range(3))
    u_out = tuple(jnp.where(enter, delta[c] * invt, u[c]) for c in range(3))
    dl_out = jnp.where(enter, total, dl_n)
    prev_out = jnp.where(enter, -1, prev_n)
    steps_out = jnp.where(enter, 0, steps_n)

    f_o[:] = jnp.concatenate(
        list(rp_out) + list(tgt_n) + list(u_out) + [dl_out]
        + [k1[0], k1[1], k1[2]] + list(k2) + list(k3) + list(k4)
        + list(fld4) + list(rpf)
        + [anchor[0], anchor[1], anchor[2], dx],
        axis=0,
    )
    i_o[:] = jnp.concatenate(
        [ic_n, prev_out, steps_out, wact_n, stage_n, fail_n, icf,
         jnp.zeros_like(ic_n)],
        axis=0,
    )
    # Per-tile count of still-walking lanes: the round loop's condition
    # reduces this (n_tiles,) vector instead of the (1, B) row — the
    # full-width any() each round cost more than the kernel itself.
    act_o[pl.program_id(0), 0] = jnp.sum(wact_n)


def supported(grid, i_icell_mask, nvar) -> bool:
    return (
        grid.dtype == jnp.float32
        and i_icell_mask is None
        and nvar == 0
        and grid.cell_type in ("triangle", "tetra", "quad")
        and jax.default_backend() == "tpu"
    )


def trace_round(grid, table, F, I, *, nudge, eps_arrive, tiny,  # noqa: E741
                reverse, axisymmetric, max_steps, min_radius,
                tile: int = 1024, interpret: bool | None = None):
    """One fused tracer round over stacked row state.

    Args:
      table: fused trace table (trace.build_trace_table)
      F: (32, B) float32 row block, I: (8, B) int32 row block (see
        module docstring); B a multiple of ``tile``.

    Returns (F', I', n_active) where n_active is a scalar int32 count
    of lanes still walking (the loop condition's cheap carry)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from ..utils.config import huge_distance

    b = F.shape[1]
    w = table.shape[1]
    f32 = jnp.float32

    g = table[jnp.maximum(I[_IC], 0)]  # (B, W) — XLA row gather

    kernel = functools.partial(
        _kernel,
        cell_type=grid.cell_type,
        nf=grid.n_faces_per_cell,
        npc=grid.n_points_per_cell,
        ndim=grid.ndim,
        big=float(huge_distance(f32)),
        reverse=reverse,
        axisymmetric=axisymmetric,
        max_steps=max_steps,
        min_radius=min_radius,
    )
    eps_arr = jnp.stack(
        [jnp.asarray(nudge, f32), jnp.asarray(eps_arrive, f32),
         jnp.asarray(tiny, f32)]
    ).reshape(3, 1)

    def row_spec(r, dt):
        return pl.BlockSpec((r, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    n_tiles = b // tile
    f_n, i_n, acts = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            row_spec(F_ROWS, f32),
            row_spec(I_ROWS, jnp.int32),
        ],
        out_specs=[
            row_spec(F_ROWS, f32),
            row_spec(I_ROWS, jnp.int32),
            # Scalar per-tile counts: whole (n_tiles, 1) array in SMEM
            # for every program (sub-array blocks fail the TPU tiling
            # check); the kernel writes its own program_id row.
            pl.BlockSpec((n_tiles, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F_ROWS, b), f32),
            jax.ShapeDtypeStruct((I_ROWS, b), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 1), jnp.int32),
        ],
        interpret=interpret,
    )(eps_arr, g, F, I)
    return f_n, i_n, jnp.sum(acts, dtype=jnp.int32)
