"""Prototype: lane-blocked candidate phase-0 (no transpose, no strided
slices) vs the current transposed implementation.  TPU only.

    python benchmarks/prof_cand2.py [n_queries]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(fn, *args, n0=1, n1=11):
    import jax

    jfn = jax.jit(fn)
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
    import jax
    import jax.numpy as jnp
    from jax import lax

    from interpolate_unstructured_tpu.io.checkpoint import load_grid
    from interpolate_unstructured_tpu.ops import locate
    from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "cache", "tet55_f32.binda")
    grid = load_grid(cache)
    nf = grid.n_faces_per_cell
    npc = grid.n_points_per_cell
    K = grid.cand_ids.shape[1]
    W = grid.cand_table.shape[1]
    nfK = nf * K
    id0 = 5 * nfK
    data0 = id0 + K
    count_col = data0 + npc * 1 * K  # nv = 1 on this grid
    print(f"# K={K} W={W} count_col={count_col}", file=sys.stderr)

    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.random((b, 3)), grid.dtype)

    def dep(r, x):
        return r + 1e-12 * x.astype(r.dtype)[:1, None]

    def lane_blocked(grid, rt, want_vals):
        """Phase-0 + optional fused values, all contiguous lane ops."""
        g = grid.cand_table[locate._cand_bin_index(grid, rt)]  # (bt, W)
        bt = rt.shape[0]
        rx, ry, rz = rt[:, :1], rt[:, 1:2], rt[:, 2:3]
        ones = jnp.ones((bt, W - 3 * nfK), grid.dtype)
        coeff = jnp.concatenate(
            [jnp.tile(-rx, nfK), jnp.tile(-ry, nfK), jnp.tile(-rz, nfK),
             ones], axis=1)
        e = g * coeff
        m40 = (e[:, :nfK] + e[:, nfK:2 * nfK] + e[:, 2 * nfK:3 * nfK]
               + e[:, 3 * nfK:4 * nfK])  # (bt, nf*K) face margins
        margins = m40[:, :K]
        for f in range(1, nf):
            margins = jnp.minimum(margins, m40[:, f * K:(f + 1) * K])
        k_best = jnp.argmax(margins, axis=1)
        m_best = jnp.max(margins, axis=1)
        onehot = (lax.broadcasted_iota(jnp.int32, (bt, K), 1)
                  == k_best[:, None])

        def pick(x):
            return jnp.sum(jnp.where(onehot, x, 0), axis=1)

        id_best = pick(g[:, id0:id0 + K]).astype(jnp.int32)
        count = g[:, count_col]
        if not want_vals:
            return m_best, id_best, count, None
        val = jnp.zeros((bt,), grid.dtype)
        for v in range(npc):
            fv = (v + 1) % npc
            lam = pick(m40[:, fv * K:(fv + 1) * K]
                       * g[:, 4 * nfK + fv * K:4 * nfK + (fv + 1) * K])
            val = val + lam * pick(g[:, data0 + v * K:data0 + (v + 1) * K])
        return m_best, id_best, count, val

    def f_locate(grid, r, n):
        def body(i, carry):
            r, acc = carry
            m, ic, c, _ = lane_blocked(grid, r, False)
            return (dep(r, ic), acc + ic[0])
        _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), jnp.int32)))
        return acc

    def f_vals(grid, r, n):
        def body(i, carry):
            r, acc = carry
            m, ic, c, v = lane_blocked(grid, r, True)
            return (dep(r, v), acc + v[0])
        _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), grid.dtype)))
        return acc

    # correctness check vs current implementation
    ic_ref, found_ref, vals_ref = locate._candidates_query(grid, r[:65536], (0,))
    m, ic, c, v = jax.jit(lambda g, r: lane_blocked(g, r, True))(
        grid, r[:65536])
    eps = grid.config.eps_inside
    f_new = np.asarray(m >= -eps) & (np.asarray(ic) >= 0)
    ok = np.asarray(found_ref)
    agree = (np.asarray(ic)[ok & f_new] == np.asarray(ic_ref)[ok & f_new])
    verr = np.abs(np.asarray(v)[ok & f_new]
                  - np.asarray(vals_ref)[ok & f_new, 0]).max()
    print(f"# parity: phase0-found agree {agree.mean():.4f}, "
          f"val err {verr:.2e}", file=sys.stderr)

    for name, fn in [("lane locate", f_locate), ("lane  +vals", f_vals)]:
        t = chain(fn, grid, r)
        print(f"{name:14s} {t * 1e3:8.2f} ms/pass  {b / t:.3e} q/s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
