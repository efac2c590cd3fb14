"""Microbench: lane-planned candidate rows probed in ONE XLA fusion.

Hypothesis (round 3, cold-path floor study follow-up): the production
candidate path pays ~12.35 ms/1M because the gathered rows are
materialized between the XLA gather and the Pallas kernel (chunk
plumbing ~3 ms + buffer write/read ~1 ms), while a *fused*
gather+consume measures 7.3-7.6 ms/1M at this row width
(benchmarks/RESULTS.md floor table).  The one-XLA-fusion attempt lost
that margin to lane-padding of (B, K) role slices (11.7 ms).

This bench tests a row layout that removes the padding: rows are
(n_rows, 3, 128) int32 "lane planes" where the minor 128-lane axis is
indexed by (face, candidate) PAIR p = f * K + k (K = 24 tet candidates
x 4 faces = 96 pairs, 32 lanes spare), so every probe intermediate is
a full (B, 128) vector op:

  plane 0: int16 pair-packed  lo = qn_x[p], hi = qn_y[p]
  plane 1: int16 pair-packed  lo = qn_z[p], hi = qd[p]
  plane 2: f32 bits           lanes 0:96   value plane coef c*K + k
                              lanes 96:120 candidate cell ids
                              lane  120    bin count, 121 dscale

Math per query: unpack (shifts), proj = qn . r_local (3 FMA on
(B,128)), margin = qd*ds - proj/32767, min over the 4 face slices,
mask by id sign, argmax over K lanes, one-hot pick of id and fused
value g . r_local + c.  No (B, K) intermediate ever pads: the ONLY
sub-128 shapes are (B, 24) slices late in the reduction.

Semantics mirror models/grid._pack_qcand_rows_jit /
ops/locate._probe_rows_xla; here the table is synthetic (the bench
measures the memory system + fusion behavior, with a small numpy
cross-check of the wiring).

Variants (--variants): V2 gathers a flat (n, 384) table and reshapes
after the gather (is slice-of-gather folding layout dependent?); V3
forces the gather to materialize through an optimization_barrier (the
honest cost of gather + buffer round-trip + unpadded math).  All three
share ONE probe body (_probe_from) so they can never drift apart.

Outcome (round 4): NOT productionized — the lane-plane layout measured
33.5 ms/1M (3-D table gather pessimization) and V2/V3 both 17.8, so
the shipped path stays the flat quantized rows (benchmarks/RESULTS.md
"Lane-planned one-fusion probes don't fuse").
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

K = 24
NF = 4
NPAIR = K * NF  # 96
FOUND_EPS = -1e-6  # margin threshold shared by probe and oracle


def make_table(n_rows, rng):
    """Synthetic rows with the production layout and value ranges."""
    qn = rng.integers(-32767, 32768, size=(n_rows, 3, NPAIR), dtype=np.int32)
    qd = rng.integers(-32767, 32768, size=(n_rows, NPAIR), dtype=np.int32)

    def pack(lo, hi):
        out = np.zeros((n_rows, 128), dtype=np.int32)
        out[:, :NPAIR] = (lo & 0xFFFF) | (hi << 16)
        return out

    p0 = pack(qn[:, 0], qn[:, 1])
    p1 = pack(qn[:, 2], qd)
    f32 = np.zeros((n_rows, 128), dtype=np.float32)
    f32[:, : 4 * K] = rng.random((n_rows, 4 * K), dtype=np.float32)
    ids = rng.integers(0, 1 << 20, size=(n_rows, K), dtype=np.int32)
    # a few invalid (padding) slots
    ids[:, K - 2 :] = -1
    f32[:, 96 : 96 + K] = ids.astype(np.float32)
    f32[:, 120] = K
    f32[:, 121] = rng.random(n_rows, dtype=np.float32) * 1e-3
    p2 = f32.view(np.int32)
    return np.stack([p0, p1, p2], axis=1)  # (n_rows, 3, 128)


def _probe_from(g, rt):
    """THE probe body, shared by every variant: g (B, 3, 128) int32
    lane planes, rt (3, B) local query coords.  Returns
    (id_best, found, value)."""
    w0 = g[:, 0, :]
    w1 = g[:, 1, :]
    inv = jnp.float32(1.0 / 32767.0)
    lo = lambda w: jnp.right_shift(jnp.left_shift(w, 16), 16).astype(
        jnp.float32
    )
    hi = lambda w: jnp.right_shift(w, 16).astype(jnp.float32)
    qnx, qny = lo(w0), hi(w0)
    qnz, qd = lo(w1), hi(w1)
    f32p = lax.bitcast_convert_type(g[:, 2, :], jnp.float32)
    ds = f32p[:, 121:122]
    rx, ry, rz = rt[0][:, None], rt[1][:, None], rt[2][:, None]
    proj = (qnx * rx + qny * ry + qnz * rz) * inv
    mf = qd * ds - proj
    margins = jnp.minimum(
        jnp.minimum(mf[:, 0:K], mf[:, K : 2 * K]),
        jnp.minimum(mf[:, 2 * K : 3 * K], mf[:, 3 * K : 4 * K]),
    )
    idv = f32p[:, 96 : 96 + K]
    margins = jnp.where(idv < 0, jnp.float32(-1e30), margins)
    k_best = jnp.argmax(margins, axis=1)
    m_best = jnp.max(margins, axis=1)
    onehot = lax.broadcasted_iota(jnp.int32, (1, K), 1) == k_best[:, None]
    pick = lambda x: jnp.sum(jnp.where(onehot, x, 0), axis=1)
    id_best = pick(idv).astype(jnp.int32)
    val = pick(
        f32p[:, 0:K] * rx + f32p[:, K : 2 * K] * ry
        + f32p[:, 2 * K : 3 * K] * rz + f32p[:, 3 * K : 4 * K]
    )
    found = (m_best >= FOUND_EPS) & (id_best >= 0)
    return id_best, found, val


def probe(table, idx, rt):
    """V1: gather from the (n, 3, 128) lane-plane table, fused probe."""
    return _probe_from(table[idx], rt)


def probe_flat(table2d, idx, rt):
    """V2: flat (n, 384) table, reshape after gather — tests whether
    slice-of-gather folding is layout dependent."""
    g = table2d[idx].reshape(-1, 3, 128)
    return _probe_from(g, rt)


def probe_barrier(table2d, idx, rt):
    """V3: one gather forced to materialize (optimization_barrier) —
    the honest cost of gather + buffer round-trip + unpadded math."""
    g = lax.optimization_barrier(table2d[idx]).reshape(-1, 3, 128)
    return _probe_from(g, rt)


def probe_np(table, idx, rt):
    """numpy oracle for the wiring — including the found flag (same
    FOUND_EPS threshold and id >= 0 mask as the probe)."""
    g = table[idx]
    w0, w1 = g[:, 0, :], g[:, 1, :]
    lo = lambda w: ((w << 16) >> 16).astype(np.float32)
    hi = lambda w: (w >> 16).astype(np.float32)
    qnx, qny, qnz, qd = lo(w0), hi(w0), lo(w1), hi(w1)
    f32p = g[:, 2, :].view(np.float32)
    ds = f32p[:, 121:122]
    rx, ry, rz = rt[0][:, None], rt[1][:, None], rt[2][:, None]
    proj = (qnx * rx + qny * ry + qnz * rz) * np.float32(1 / 32767.0)
    mf = qd * ds - proj
    margins = np.minimum(
        np.minimum(mf[:, 0:K], mf[:, K : 2 * K]),
        np.minimum(mf[:, 2 * K : 3 * K], mf[:, 3 * K : 4 * K]),
    )
    idv = f32p[:, 96 : 96 + K]
    margins = np.where(idv < 0, np.float32(-1e30), margins)
    k = np.argmax(margins, axis=1)
    b = np.arange(len(k))
    val = (
        f32p[b, k] * rt[0] + f32p[b, K + k] * rt[1]
        + f32p[b, 2 * K + k] * rt[2] + f32p[b, 3 * K + k]
    )
    id_best = idv[b, k].astype(np.int32)
    found = (margins[b, k] >= FOUND_EPS) & (id_best >= 0)
    return id_best, found, val


def _bench(fn, tab, idx, rt, iters, nq, name):
    @jax.jit
    def chained(tab, idx, rt, n_iter):
        # dependent iterations: fold a data-dependent perturbation into
        # the indices so no pass can be elided or overlapped away
        def body(i, carry):
            acc, idx = carry
            id_best, found, val = fn(tab, idx, rt)
            acc = acc + val.sum() + found.sum()
            idx = (idx + id_best) % tab.shape[0]
            return acc, idx

        return lax.fori_loop(0, n_iter, body, (jnp.float32(0), idx))[0]

    chained(tab, idx, rt, 2).block_until_ready()
    t0 = time.perf_counter()
    chained(tab, idx, rt, iters).block_until_ready()
    dt = time.perf_counter() - t0
    ms = dt / iters / (nq / 1e6) * 1e3
    print(f"{name}: {ms:.2f} ms/1M ({1e3 / ms * 1e6:.3e} q/s)  "
          f"[{iters} chained iters]", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--queries", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants", action="store_true",
                    help="also run V2 (flat+reshape) and V3 (barrier)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)

    # wiring check on a small case (CPU-side numpy vs jitted probe),
    # including the found flag so the margin threshold is cross-checked
    small = make_table(64, rng)
    sidx = rng.integers(0, 64, size=256).astype(np.int32)
    srt = rng.random((3, 256), dtype=np.float32) * 1e-3
    jid, jfound, jval = jax.jit(probe)(
        jnp.asarray(small), jnp.asarray(sidx), jnp.asarray(srt)
    )
    nid, nfound, nval = probe_np(small, sidx, srt)
    assert np.array_equal(np.asarray(jid), nid), "id wiring mismatch"
    assert np.array_equal(np.asarray(jfound), nfound), "found wiring mismatch"
    np.testing.assert_allclose(np.asarray(jval), nval, rtol=1e-5)
    print("wiring ok (id, found, value)")

    table = jnp.asarray(make_table(args.rows, rng))
    print(
        f"table {table.shape} = "
        f"{table.size * 4 / 1e9:.2f} GB, row {3 * 128 * 4} B"
    )
    idx = jnp.asarray(
        rng.integers(0, args.rows, size=args.queries).astype(np.int32)
    )
    rt = jnp.asarray(rng.random((3, args.queries), dtype=np.float32) * 1e-3)

    _bench(probe, table, idx, rt, args.iters, args.queries,
           "V1 fused lane-planned probe")
    if args.variants:
        t2d = jnp.reshape(table, (args.rows, -1))
        _bench(probe_flat, t2d, idx, rt, args.iters, args.queries,
               "V2 flat+reshape")
        _bench(probe_barrier, t2d, idx, rt, args.iters, args.queries,
               "V3 barrier")


if __name__ == "__main__":
    main()
