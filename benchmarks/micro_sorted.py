"""Coherent (sorted) query streams vs random: the round-4 cold-path levers.

VERDICT r3 asks whether spatially sorting the query stream can push the
1M-cell cold path past 1e8 q/s: sorted queries make the candidate-row
gather near-sequential (and heavily duplicated within a chunk), at the
cost of one sort + one inverse-permutation of the outputs.  This
microbench prices every piece on the real TPU:

  1. row gather with random / sorted / sorted+duplicated indices
  2. 1-D unpermute gathers (the cost of returning results in query order)
  3. jnp.sort / argsort of 1M and 10M keys
  4. dedup-style two-stage gather (unique rows -> VMEM-resident expand)

Timing: chained dependent passes in one fori_loop (see bench.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


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
    import jax
    import jax.numpy as jnp
    from jax import lax

    from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    B = 1 << 20
    N_ROWS = 2_000_000  # ~bins of the 1M-cell cover table
    width = int(sys.argv[sys.argv.index("--width") + 1]) if "--width" in sys.argv else 384

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.random((N_ROWS, width), dtype=np.float32))
    idx_rand_np = rng.integers(0, N_ROWS, B).astype(np.int32)
    idx_rand = jnp.asarray(idx_rand_np)
    idx_sort = jnp.asarray(np.sort(idx_rand_np))
    # 10M-query protocol: a 32k chunk of the globally sorted stream
    # covers ~2M*32k/10M = 6.5k contiguous bins -> ~5 dups per bin.
    # Emulate per-32k-chunk locality across the whole 1M batch.
    chunks = []
    per = 1 << 15
    span = int(N_ROWS * per / 10_000_000)
    for c in range(B // per):
        base = int(rng.integers(0, N_ROWS - span))
        chunks.append(np.sort(rng.integers(base, base + span, per)))
    idx_dup = jnp.asarray(np.concatenate(chunks).astype(np.int32))

    def gather_sum(tab, idx, n):
        def body(i, carry):
            idxv, acc = carry
            rows = tab[idxv]
            s = rows.sum(axis=1)
            idxv = (idxv + (s[:1] > 1e30).astype(jnp.int32)) % N_ROWS
            return (idxv, acc + s[0])

        _, acc = lax.fori_loop(0, n, body, (idx, jnp.zeros((), jnp.float32)))
        return acc

    for name, ix in (("random", idx_rand), ("sorted", idx_sort),
                     ("sorted+dup(x5)", idx_dup)):
        t = chain(gather_sum, tab, ix)
        print(f"row gather {width*4:5d}B  {name:16s}: {t*1e3:7.2f} ms/1M "
              f"({B*width*4/t/1e9:.0f} GB/s)", flush=True)

    # ---- 1-D unpermute: y = x[perm] ----
    perm = jnp.asarray(rng.permutation(B).astype(np.int32))
    x1 = jnp.asarray(rng.random(B, dtype=np.float32))

    def unperm1(x, p, n):
        def body(i, carry):
            x, acc = carry
            y = x[p]
            return (y, acc + y[0])

        _, acc = lax.fori_loop(0, n, body, (x, jnp.zeros((), jnp.float32)))
        return acc

    t = chain(unperm1, x1, perm)
    print(f"1-D f32 unpermute x[perm] 1M: {t*1e3:7.2f} ms/1M", flush=True)

    # packed unpermute: (B, 8) rows = 32B (vals + ic + found together)
    x8 = jnp.asarray(rng.random((B, 8), dtype=np.float32))

    def unperm8(x, p, n):
        def body(i, carry):
            x, acc = carry
            y = x[p]
            return (y, acc + y[0, 0])

        _, acc = lax.fori_loop(0, n, body, (x, jnp.zeros((), jnp.float32)))
        return acc

    t = chain(unperm8, x8, perm)
    print(f"row  32B unpermute x[perm] 1M: {t*1e3:7.2f} ms/1M", flush=True)

    # inverse perm is sorted-ish when queries are uniform: unpermuting
    # FROM a sorted stream gathers nearly-sequential sources
    inv = np.empty(B, np.int32)
    inv[np.argsort(idx_rand_np, kind="stable")] = np.arange(B, dtype=np.int32)
    inv_j = jnp.asarray(inv)
    t = chain(unperm1, x1, inv_j)
    print(f"1-D f32 unpermute x[inv_of_binsort] 1M: {t*1e3:7.2f} ms/1M",
          flush=True)

    # ---- sort costs ----
    keys1 = jnp.asarray(idx_rand_np)

    def sort1(k, n):
        def body(i, carry):
            k, acc = carry
            s = jnp.sort(k)
            return (s, acc + s[0].astype(jnp.float32))

        _, acc = lax.fori_loop(0, n, body, (k, jnp.zeros((), jnp.float32)))
        return acc

    t = chain(sort1, keys1)
    print(f"jnp.sort int32 1M: {t*1e3:7.2f} ms", flush=True)

    def argsort1(k, n):
        def body(i, carry):
            k, acc = carry
            s = jnp.argsort(k)
            return (k + (s[:1] > (1 << 30)).astype(jnp.int32),
                    acc + s[0].astype(jnp.float32))

        _, acc = lax.fori_loop(0, n, body, (k, jnp.zeros((), jnp.float32)))
        return acc

    t = chain(argsort1, keys1)
    print(f"jnp.argsort int32 1M: {t*1e3:7.2f} ms", flush=True)

    # sort key+payload co-sorted (what the pipeline actually needs):
    # lax.sort of (keys, idx) pair
    def sortkv(k, n):
        v0 = jnp.arange(B, dtype=jnp.int32)

        def body(i, carry):
            k, acc = carry
            sk, sv = lax.sort((k, v0), num_keys=1)
            return (k + (sv[:1] > (1 << 30)).astype(jnp.int32),
                    acc + sk[0].astype(jnp.float32))

        _, acc = lax.fori_loop(0, n, body, (k, jnp.zeros((), jnp.float32)))
        return acc

    t = chain(sortkv, keys1)
    print(f"lax.sort (k,v) int32 1M: {t*1e3:7.2f} ms", flush=True)

    if "--big" in sys.argv:
        keys10 = jnp.asarray(rng.integers(0, N_ROWS, 10_000_000).astype(np.int32))

        def sortkv10(k, n):
            v0 = jnp.arange(10_000_000, dtype=jnp.int32)

            def body(i, carry):
                k, acc = carry
                sk, sv = lax.sort((k, v0), num_keys=1)
                return (k + (sv[:1] > (1 << 30)).astype(jnp.int32),
                        acc + sk[0].astype(jnp.float32))

            _, acc = lax.fori_loop(0, n, body, (k, jnp.zeros((), jnp.float32)))
            return acc

        t = chain(sortkv10, keys10, n0=1, n1=4)
        print(f"lax.sort (k,v) int32 10M: {t*1e3:7.2f} ms ({t*1e2:.2f} ms/1M)",
              flush=True)




def table_size_sweep():
    """Does gather cost depend on TABLE footprint (rows x width)?

    round-3 measured 9.2 ms/1M for 2KB rows on a ~1M-row table; the
    round-4 run above got 16.6 for 1.5KB rows on a 2M-row table —
    if per-row issue cost grows with table size, fewer/fatter bins
    beat more/thinner ones.
    """
    import jax.numpy as jnp
    from jax import lax

    B = 1 << 20
    rng = np.random.default_rng(1)
    for n_rows, width in [
        (500_000, 384), (1_000_000, 384), (2_000_000, 384),
        (4_000_000, 384), (1_000_000, 512), (2_000_000, 256),
        (1_000_000, 768), (500_000, 768),
    ]:
        tab = jnp.asarray(rng.random((n_rows, width), dtype=np.float32))
        idx = jnp.asarray(rng.integers(0, n_rows, B), jnp.int32)

        def gather_sum(tab, idx, n, n_rows=n_rows):
            def body(i, carry):
                idxv, acc = carry
                rows = tab[idxv]
                s = rows.sum(axis=1)
                idxv = (idxv + (s[:1] > 1e30).astype(jnp.int32)) % n_rows
                return (idxv, acc + s[0])

            _, acc = lax.fori_loop(
                0, n, body, (idx, jnp.zeros((), jnp.float32))
            )
            return acc

        t = chain(gather_sum, tab, idx)
        print(f"gather {width*4:5d}B rows, table {n_rows/1e6:4.1f}M rows "
              f"({n_rows*width*4/2**30:5.2f} GiB): {t*1e3:7.2f} ms/1M",
              flush=True)
        del tab


if __name__ == "__main__":
    if "--tables" in sys.argv:
        table_size_sweep()
    else:
        main()
