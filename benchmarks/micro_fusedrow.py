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


def probe(table, idx, rt):
    """The fused probe: table (n, 3, 128) int32, idx (B,) int32,
    rt (3, B) local query coords.  Returns (id_best, found, value)."""
    g = table[idx]  # (B, 3, 128) — must stay fused into the consumers
    w0 = g[:, 0, :]
    w1 = g[:, 1, :]
    inv = jnp.float32(1.0 / 32767.0)

    def lo(w):
        return jnp.right_shift(jnp.left_shift(w, 16), 16).astype(jnp.float32)

    def hi(w):
        return jnp.right_shift(w, 16).astype(jnp.float32)

    qnx, qny = lo(w0), hi(w0)
    qnz, qd = lo(w1), hi(w1)
    f32p = lax.bitcast_convert_type(g[:, 2, :], jnp.float32)
    ds = f32p[:, 121:122]
    rx = rt[0][:, None]
    ry = rt[1][:, None]
    rz = rt[2][:, None]
    proj = (qnx * rx + qny * ry + qnz * rz) * inv
    mf = qd * ds - proj  # (B, 128) margins for every (face, cand) pair
    margins = jnp.minimum(
        jnp.minimum(mf[:, 0:K], mf[:, K : 2 * K]),
        jnp.minimum(mf[:, 2 * K : 3 * K], mf[:, 3 * K : 4 * K]),
    )  # (B, K)
    idv = f32p[:, 96 : 96 + K]
    margins = jnp.where(idv < 0, jnp.float32(-1e30), margins)
    k_best = jnp.argmax(margins, axis=1)
    m_best = jnp.max(margins, axis=1)
    onehot = lax.broadcasted_iota(jnp.int32, (1, K), 1) == k_best[:, None]

    def pick(x):
        return jnp.sum(jnp.where(onehot, x, 0), axis=1)

    id_best = pick(idv).astype(jnp.int32)
    val = pick(
        f32p[:, 0:K] * rx + f32p[:, K : 2 * K] * ry
        + f32p[:, 2 * K : 3 * K] * rz + f32p[:, 3 * K : 4 * K]
    )
    found = (m_best >= -1e-6) & (id_best >= 0)
    return id_best, found, val


def probe_np(table, idx, rt):
    """numpy oracle for the wiring."""
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
    return idv[b, k].astype(np.int32), val


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--queries", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    rng = np.random.default_rng(0)

    # wiring check on a small case (CPU-side numpy vs jitted probe)
    small = make_table(64, rng)
    sidx = rng.integers(0, 64, size=256).astype(np.int32)
    srt = rng.random((3, 256), dtype=np.float32) * 1e-3
    jid, _, jval = jax.jit(probe)(
        jnp.asarray(small), jnp.asarray(sidx), jnp.asarray(srt)
    )
    nid, nval = probe_np(small, sidx, srt)
    assert np.array_equal(np.asarray(jid), nid), "id wiring mismatch"
    np.testing.assert_allclose(np.asarray(jval), nval, rtol=1e-5)
    print("wiring ok")

    table = jnp.asarray(make_table(args.rows, rng))
    print(
        f"table {table.shape} = "
        f"{table.size * 4 / 1e9:.2f} GB, row {3 * 128 * 4} B"
    )
    idx = jnp.asarray(
        rng.integers(0, args.rows, size=args.queries).astype(np.int32)
    )
    rt = jnp.asarray(rng.random((3, args.queries), dtype=np.float32) * 1e-3)

    @jax.jit
    def chained(table, idx, rt, n_iter):
        # dependent iterations: fold a data-dependent perturbation into
        # the indices so no pass can be elided or overlapped away
        def body(i, carry):
            acc, idx = carry
            id_best, found, val = probe(table, idx, rt)
            acc = acc + val.sum() + found.sum()
            idx = (idx + id_best) % table.shape[0]
            return acc, idx

        return lax.fori_loop(0, n_iter, body, (jnp.float32(0), idx))[0]

    # warm-up / compile
    chained(table, idx, rt, 2).block_until_ready()
    t0 = time.perf_counter()
    out = chained(table, idx, rt, args.iters)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    ms_per_m = dt / args.iters / (args.queries / 1e6) * 1e3
    print(
        f"fused lane-planned probe: {ms_per_m:.2f} ms/1M "
        f"({1e3 / ms_per_m * 1e6:.3e} q/s)  [{args.iters} chained iters]"
    )


if __name__ == "__main__":
    main()


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


def _probe_from(g, rt):
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
    found = (m_best >= -1e-6) & (id_best >= 0)
    return id_best, found, val


def variants():
    import time as _t

    rng = np.random.default_rng(0)
    n_rows, nq, iters = 2_000_000, 1_000_000, 20
    table = make_table(n_rows, rng)
    t2d = jnp.asarray(table.reshape(n_rows, -1))
    idx = jnp.asarray(rng.integers(0, n_rows, size=nq).astype(np.int32))
    rt = jnp.asarray(rng.random((3, nq), dtype=np.float32) * 1e-3)

    def bench(fn, name):
        @jax.jit
        def chained(tab, idx, rt, n_iter):
            def body(i, carry):
                acc, idx = carry
                id_best, found, val = fn(tab, idx, rt)
                acc = acc + val.sum() + found.sum()
                idx = (idx + id_best) % tab.shape[0]
                return acc, idx

            return lax.fori_loop(0, n_iter, body, (jnp.float32(0), idx))[0]

        chained(t2d, idx, rt, 2).block_until_ready()
        t0 = _t.perf_counter()
        chained(t2d, idx, rt, iters).block_until_ready()
        dt = _t.perf_counter() - t0
        ms = dt / iters / (nq / 1e6) * 1e3
        print(f"{name}: {ms:.2f} ms/1M ({1e3 / ms * 1e6:.3e} q/s)")

    bench(probe_flat, "V2 flat+reshape")
    bench(probe_barrier, "V3 barrier")
