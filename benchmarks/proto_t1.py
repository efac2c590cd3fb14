"""Two-tier candidate-table prototype (round-4 cold-path push).

Stride sweep result: a narrow random row-touch costs 4.5 ms/1M at a
<=512 B table stride vs 7.6 at the 1536 B cover stride — the touch
cost, not the row bytes, dominates the cold gather.  The candidate
lists are ranked covers-most-first (ops/cand_build.py), so a TIER-1
table holding only the top-K1 candidates (512 B rows) should resolve
almost every query, with the rare rank>K1 miss recovered from the
existing full cover table (tier 2).

This prototype, on the real 1M-cell cover grid:
  1. measures the rank distribution of the containing cell (how many
     queries actually need rank > K1),
  2. builds the tier-1 table by COLUMN-SLICING the production rows
     (same role-major quantized layout, truncated to K1),
  3. times tier-1 probe alone and the full two-tier pipeline
     (t1 probe -> compact misses -> t2 probe -> merge).

    python benchmarks/proto_t1.py [--k1 9]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(fn, *args, n0=1, n1=6):
    import jax

    jfn = jax.jit(fn, static_argnums=())
    float(jfn(*args, n0))

    def timed(n):
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(jfn(*args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((timed(n1) - timed(n0)) / (n1 - n0), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k1", type=int, default=9)
    ap.add_argument("--skip-rank", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from interpolate_unstructured_tpu.io.checkpoint import load_grid
    from interpolate_unstructured_tpu.models.grid import (
        _qcand_floats_per, cand_fused_nv)
    from interpolate_unstructured_tpu.ops import locate, pallas_cand
    from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    b = 1_000_000
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "cache", "tet55_f32.binda")
    grid = load_grid(cache)
    k_max = grid.cand_ids.shape[1]
    nv = cand_fused_nv(grid)
    per = _qcand_floats_per(grid.cell_type, nv)
    k1 = args.k1
    print(f"# K={k_max} per_cand={per} nv={nv} k1={k1}", flush=True)

    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.random((b, 3)), grid.dtype)

    # ---- 1: rank distribution of the containing cell ----
    if not args.skip_rank:
        ic, found = jax.jit(locate.locate_candidates)(grid, r)
        idx = jax.jit(locate._cand_bin_index)(grid, r)
        cands = grid.cand_ids[idx]  # (B, K)
        hit = np.asarray(cands == np.asarray(ic)[:, None])
        rank = np.where(hit.any(1), hit.argmax(1), k_max)
        hist = np.bincount(rank, minlength=k_max + 1)
        cum = np.cumsum(hist) / b
        print("rank cum:", {k: round(float(cum[k]), 5)
                            for k in (0, 1, 2, 4, 8, 11, 13, 15, k_max - 1)},
              flush=True)
        print(f"P(rank >= {k1}) = {1 - cum[k1 - 1]:.5f} "
              f"(misses/1M = {int((1 - cum[k1 - 1]) * b)})", flush=True)

    # ---- 2: tier-1 table by column slicing (device repack) ----
    tab = grid.cand_table
    w1 = -(-(per * k1 + 2) // 128) * 128

    # ONE column gather: per-role (n, k1) slices pad their minor dim to
    # a full (8,128) tile each (14x, OOM on the 2M-row table); a single
    # take along axis 1 materializes only the (n, w1) output.
    col_idx = np.concatenate(
        [np.arange(j * k_max, j * k_max + k1) for j in range(per)]
        + [np.arange(per * k_max, per * k_max + 2),
           np.zeros(w1 - (per * k1 + 2), np.int64)]
    )

    @jax.jit
    def slice_t1(tab):
        return jnp.take(tab, jnp.asarray(col_idx, jnp.int32), axis=1)

    t1 = slice_t1(tab)
    print(f"# t1 rows {t1.shape[1]*4} B, {t1.nbytes/2**30:.2f} GiB",
          flush=True)
    eps = grid.config.eps_inside + grid.cand_qeps
    ccol1 = per * k1
    ccol2 = per * k_max

    def queries_t(rt_t):
        ijk = locate._cand_bin_ijk_t(grid, rt_t)
        nby, nbz = grid.cand_shape[1], grid.cand_shape[2]
        idx = (ijk[0] * nby + ijk[1]) * nbz + ijk[2]
        return idx, locate._cand_local_t(grid, rt_t, ijk)

    chunk1 = max(1 << 13, (grid.config.cand_chunk_bytes // (w1 * 4)) >> 13 << 13)

    def t1_probe_chunked(grid, t1, r, n):
        def tile(rt_t):
            idx, rq_t = queries_t(rt_t)
            id_b, aux, vals = pallas_cand.cand_rows_query(
                grid, t1, idx, rq_t, (0,), ccol1, eps, k1,
                k_max=k1, quantized=True, nv_fused=nv,
            )
            return id_b, aux, vals

        def body(i, carry):
            r, acc = carry
            rt = r.T
            pad = (-b) % chunk1
            rp_t = jnp.pad(rt, ((0, 0), (0, pad)))
            id_b, aux, vals = lax.map(
                tile, jnp.moveaxis(rp_t.reshape(3, -1, chunk1), 1, 0)
            )
            v = vals.reshape(-1)[:b]
            dep = r + (5e-30 * v.sum()) * jnp.ones_like(r)
            return (dep, acc + v[0])

        _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), grid.dtype)))
        return acc

    t = chain(t1_probe_chunked, grid, t1, r)
    print(f"t1 probe (chunk {chunk1}): {t*1e3:6.2f} ms/1M "
          f"({1e6/t:.3e} q/s)", flush=True)

    # Full batch, NO chunking: at 512 B rows the materialized buffer is
    # only 512 MB (write+read ~1.5 ms) while the chunked map structure
    # costs ~4.4 ms/1M flat (sweep_chunk round 4) — skipping the chunk
    # machinery should win at this row width.
    def t1_probe_full(grid, t1, r, n):
        def body(i, carry):
            r, acc = carry
            idx, rq_t = queries_t(r.T)
            id_b, aux, vals = pallas_cand.cand_rows_query(
                grid, t1, idx, rq_t, (0,), ccol1, eps, k1,
                k_max=k1, quantized=True, nv_fused=nv,
            )
            v = vals[0]
            dep = r + (5e-30 * v.sum()) * jnp.ones_like(r)
            return (dep, acc + v[0])

        _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), grid.dtype)))
        return acc

    t = chain(t1_probe_full, grid, t1, r)
    print(f"t1 probe (FULL batch): {t*1e3:6.2f} ms/1M "
          f"({1e6/t:.3e} q/s)", flush=True)

    # ---- 3: full two-tier pipeline ----
    m = -(-max(1024, b // 32) // 8) * 8

    def two_tier(grid, t1, r, n):
        def tile(rt_t):
            idx, rq_t = queries_t(rt_t)
            return pallas_cand.cand_rows_query(
                grid, t1, idx, rq_t, (0,), ccol1, eps, k1,
                k_max=k1, quantized=True, nv_fused=nv,
            )

        def body(i, carry):
            r, acc = carry
            rt = r.T
            pad = (-b) % chunk1
            rp_t = jnp.pad(rt, ((0, 0), (0, pad)))
            id_b, aux, vals = lax.map(
                tile, jnp.moveaxis(rp_t.reshape(3, -1, chunk1), 1, 0)
            )
            id_b = id_b.reshape(-1)[:b]
            aux = aux.reshape(-1)[:b]
            vals = jnp.moveaxis(vals, 1, 0).reshape(1, -1)[:, :b]
            need = aux >= 0  # miss in an overflow (count > k1) bin

            def t2(args):
                id_b, vals = args
                sel = locate._compact_indices(need, m)
                rt_t = jnp.stack([rt[0][sel], rt[1][sel], rt[2][sel]])
                idx2, rq2 = queries_t(rt_t)
                id2, aux2, v2 = pallas_cand.cand_rows_query(
                    grid, grid.cand_table, idx2, rq2, (0,), ccol2,
                    eps, k_max, k_max=k_max, quantized=True, nv_fused=nv,
                )
                ok = (aux2 == -2) & need[sel]
                id_b = id_b.at[sel].set(jnp.where(ok, id2, id_b[sel]))
                vals = vals.at[:, sel].set(
                    jnp.where(ok[None, :], v2, vals[:, sel])
                )
                return id_b, vals

            n_act = jnp.sum(need.astype(jnp.int32))
            id_b, vals = lax.cond(
                n_act == 0, lambda a: a, t2, (id_b, vals)
            )
            v = vals[0]
            dep = r + (5e-30 * (v.sum() + id_b.sum().astype(r.dtype))
                       ) * jnp.ones_like(r)
            return (dep, acc + v[0])

        _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), grid.dtype)))
        return acc

    t = chain(two_tier, grid, t1, r)
    print(f"two-tier end-to-end: {t*1e3:6.2f} ms/1M ({1e6/t:.3e} q/s)",
          flush=True)

    # correctness: two-tier ic/vals match the production path
    def once(grid, t1, r):
        rt = r.T
        pad = (-b) % chunk1
        rp_t = jnp.pad(rt, ((0, 0), (0, pad)))

        def tile(rt_t):
            idx, rq_t = queries_t(rt_t)
            return pallas_cand.cand_rows_query(
                grid, t1, idx, rq_t, (0,), ccol1, eps, k1,
                k_max=k1, quantized=True, nv_fused=nv,
            )

        id_b, aux, vals = lax.map(
            tile, jnp.moveaxis(rp_t.reshape(3, -1, chunk1), 1, 0)
        )
        id_b = id_b.reshape(-1)[:b]
        aux = aux.reshape(-1)[:b]
        vals = jnp.moveaxis(vals, 1, 0).reshape(1, -1)[:, :b]
        need = aux >= 0
        sel = locate._compact_indices(need, m)
        rt_t = jnp.stack([rt[0][sel], rt[1][sel], rt[2][sel]])
        idx2, rq2 = queries_t(rt_t)
        id2, aux2, v2 = pallas_cand.cand_rows_query(
            grid, grid.cand_table, idx2, rq2, (0,), ccol2,
            eps, k_max, k_max=k_max, quantized=True, nv_fused=nv,
        )
        ok = (aux2 == -2) & need[sel]
        id_b = id_b.at[sel].set(jnp.where(ok, id2, id_b[sel]))
        vals = vals.at[:, sel].set(jnp.where(ok[None, :], v2, vals[:, sel]))
        return id_b, vals[0], jnp.sum(need.astype(jnp.int32))

    id_tt, v_tt, n_miss = jax.jit(once)(grid, t1, r)
    from interpolate_unstructured_tpu.ops.interp import interpolate_scalar_at

    v_ref, ic_ref, f_ref = jax.jit(
        lambda g, r: interpolate_scalar_at(g, r, 0, fill_value=0.0)
    )(grid, r)
    truth = np.asarray(r).sum(axis=1) + 1.0
    err_tt = np.abs(np.asarray(v_tt) - truth).max()
    err_ref = np.abs(np.asarray(v_ref) - truth).max()
    same_ic = float(np.mean(np.asarray(id_tt) == np.asarray(ic_ref)))
    print(f"t1 misses/1M: {int(n_miss)}  two-tier err {err_tt:.2e} "
          f"(ref {err_ref:.2e})  ic agreement {same_ic:.6f}", flush=True)


if __name__ == "__main__":
    main()
