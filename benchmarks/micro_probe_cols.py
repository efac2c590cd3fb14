"""Column-sliced XLA probe: can the candidate probe ride the gather
fusion with zero materialization?

Round 3 established the production split (XLA row gather -> material-
ized chunk -> Pallas kernel) pays ~3.9 ms/1M materializing + ~0.9 ms
kernel over the fused-gather floor, and that a (B, K)-shaped "whole
probe in XLA" loses it all back to K->128 lane padding.

The untried variant: slice the gathered (B, W) rows COLUMN-WISE into
(B,) full-lane vectors, unrolling the K candidates in Python.  Every
intermediate is (B,)-shaped (zero padding), the whole probe is one
elementwise DAG over the gather output, and XLA can input-fuse the
gather — nothing materializes and no chunking is needed.

This measures the construct with the quantized-row op structure
(per-cand: 4 faces x (int16 unpack + 3 madd), running min, running
argmax, value-plane madd, winner select) on synthetic data.

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
    N_ROWS = 2_000_000
    K = 24
    PER = 13  # int16 probe pairs (8) + value plane (4) + id (1)
    W = K * PER + 2  # + count + dscale
    Wp = -(-W // 128) * 128  # padded physical row (384 = 1536 B)

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.random((N_ROWS, Wp), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, N_ROWS, B), jnp.int32)
    r = jnp.asarray(rng.random((3, B), dtype=np.float32))

    def probe_cols(tab, idx, r, n):
        """Full probe, (B,)-column math, K unrolled in Python."""

        def body(i, carry):
            idxv, acc = carry
            g = tab[idxv]  # (B, Wp)
            rx, ry, rz = r[0], r[1], r[2]
            best_m = None
            best_val = None
            best_id = None
            for k in range(K):
                c0 = k * PER
                # 4 faces: margin = off - n . r (int16 unpack approximated
                # by bitcast+shift on the f32 column — same op count)
                m = None
                for f in range(4):
                    w = lax.bitcast_convert_type(g[:, c0 + f], jnp.int32)
                    lo = jnp.right_shift(
                        jnp.left_shift(w, 16), 16
                    ).astype(jnp.float32)
                    hi = jnp.right_shift(w, 16).astype(jnp.float32)
                    mf = g[:, c0 + 4 + f] - (
                        lo * rx + hi * ry + (lo - hi) * rz
                    )
                    m = mf if m is None else jnp.minimum(m, mf)
                val = (
                    g[:, c0 + 8] * rx + g[:, c0 + 9] * ry
                    + g[:, c0 + 10] * rz + g[:, c0 + 11]
                )
                cid = g[:, c0 + 12]
                if best_m is None:
                    best_m, best_val, best_id = m, val, cid
                else:
                    take = m > best_m
                    best_m = jnp.where(take, m, best_m)
                    best_val = jnp.where(take, val, best_val)
                    best_id = jnp.where(take, cid, best_id)
            found = best_m >= -1e-6
            out = jnp.where(found, best_val, 0.0)
            idxv = (idxv + (out[:1] > 1e30).astype(jnp.int32)) % N_ROWS
            return (idxv, acc + out[0])

        _, acc = lax.fori_loop(0, n, body, (idx, jnp.zeros((), jnp.float32)))
        return acc

    t = chain(probe_cols, tab, idx, r)
    print(f"probe_cols (B,)-sliced, K={K}, {Wp*4}B rows, full batch: "
          f"{t*1e3:7.2f} ms/1M", flush=True)

    # narrow consumer floor: same gather, read 2 columns only
    def gather_narrow(tab, idx, n):
        def body(i, carry):
            idxv, acc = carry
            g = tab[idxv]
            s = g[:, 0]
            idxv = (idxv + (s[:1] > 1e30).astype(jnp.int32)) % N_ROWS
            return (idxv, acc + g[0, 1])

        _, acc = lax.fori_loop(0, n, body, (idx, jnp.zeros((), jnp.float32)))
        return acc

    t = chain(gather_narrow, tab, idx)
    print(f"gather + 2-column consume (floor construct): {t*1e3:7.2f} ms/1M",
          flush=True)

    # half-row consumer: do columns beyond what's read cost anything?
    def probe_half(tab, idx, r, n):
        def body(i, carry):
            idxv, acc = carry
            g = tab[idxv]
            s = None
            for c in range(0, W, 2):  # touch every other used column
                x = g[:, c] * r[0]
                s = x if s is None else s + x
            idxv = (idxv + (s[:1] > 1e30).astype(jnp.int32)) % N_ROWS
            return (idxv, acc + s[0])

        _, acc = lax.fori_loop(0, n, body, (idx, jnp.zeros((), jnp.float32)))
        return acc

    t = chain(probe_half, tab, idx, r)
    print(f"gather + every-2nd-column sum: {t*1e3:7.2f} ms/1M", flush=True)


if __name__ == "__main__":
    main()
