"""Sort-and-stream Pallas join: the ONE un-priced cold-path shape (VERDICT r4 #1).

Construction under test: sort queries by candidate bin, partition the
sorted stream into fixed-size query blocks, scalar-prefetch each
block's first-bin row offset, DMA the block's CONTIGUOUS table-row
window into VMEM (sequential multi-row streams, not per-row gather
issues), and join each query to its bin's resident row inside the
kernel.  The join needs a per-query dynamic row selection from the
VMEM window — the primitive whose cost decides the design:

  stage 0: can Mosaic lower an in-VMEM vector row gather at all,
           and at what rate? (window[idx] with idx a traced vector)
  stage 1: windowed stream DMA bandwidth (2-spec aligned windows via
           PrefetchScalarGridSpec index maps)
  stage 2: full prototype: sort + searchsorted + stream-join kernel +
           unpermute, end-to-end ms/1M on the 10M-query protocol
  stage 3: piece costs (5-payload co-sort, searchsorted) for the
           bookkeeping ledger

Timing: chained dependent passes in one fori_loop (bench.py protocol).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def chain(fn, *args, n0=1, n1=4, reps=4):
    import jax

    jfn = jax.jit(fn)
    float(jfn(*args, n0))

    def timed(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jfn(*args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((timed(n1) - timed(n0)) / (n1 - n0), 1e-9)


# ---------------------------------------------------------------------------
# stage 0: in-VMEM row gather feasibility + rate
# ---------------------------------------------------------------------------

def stage0():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Q == R: Mosaic's dynamic_gather path wants matching shapes
    R, W, Q = 1024, 384, 1024

    def kern(win_ref, idx_ref, out_ref):
        idx = idx_ref[0, :]                      # (Q,) int32 in [0, R)
        idx2 = jnp.broadcast_to(idx[:, None], (Q, W))
        g = jnp.take_along_axis(win_ref[:], idx2, axis=0)  # (Q, W)
        out_ref[:] = jnp.sum(g, axis=1, keepdims=True).T

    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.random((R, W), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, R, (1, Q)).astype(np.int32))

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, Q), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        out = jax.jit(f)(win, idx)
        ref = np.asarray(win)[np.asarray(idx)[0]].sum(axis=1)
        err = float(np.abs(np.asarray(out)[0] - ref).max())
        print(f"stage0 jnp.take in-VMEM: COMPILES, max_err={err:.2e}",
              flush=True)
    except Exception as e:
        print(f"stage0 jnp.take in-VMEM: FAILS -> {type(e).__name__}: "
              f"{str(e)[:500]}", flush=True)
        return False

    # rate: many tiles, chained
    n_tiles = 512  # 1M queries total

    def timed_fn(win, idx, n):
        def body(i, carry):
            idxv, acc = carry
            o = f(win, idxv)
            idxv = (idxv + (o[:, :1] > 1e30).astype(jnp.int32)) % R
            return (idxv, acc + o[0, 0])

        def tile_loop(j, carry):
            return lax.fori_loop(0, n_tiles, body, carry)

        _, acc = lax.fori_loop(
            0, n, tile_loop, (idx, jnp.zeros((), jnp.float32))
        )
        return acc

    t = chain(timed_fn, win, idx)
    per1m = t / (n_tiles * Q / 1e6) * 1e3
    print(f"stage0 VMEM row-gather rate: {per1m:7.2f} ms/1M queries "
          f"({n_tiles*Q*W*4/t/1e9:.0f} GB/s expanded)", flush=True)
    return True


# ---------------------------------------------------------------------------
# stage 1+2: windowed stream join prototype
# ---------------------------------------------------------------------------

def make_join(n_rows, W, G, RB, join: str, n_blocks):
    """Build the stream-join pallas_call.

    G: queries per block; RB: aligned row-window granule (window = 2*RB
    rows via two specs).  join: 'take' (vector gather) or 'touch'
    (no per-query selection — prices pure streaming+output).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(off_ref, qa_ref, qb_ref, wa_ref, wb_ref, out_ref):
        i = pl.program_id(0)
        base = (off_ref[i] // RB) * RB
        bins = qb_ref[0, :]                 # (G,) int32 global bin ids
        loc = bins - base                   # in [0, 2*RB) when covered
        win = jnp.concatenate([wa_ref[:], wb_ref[:]], axis=0)
        covered = (loc >= 0) & (loc < 2 * RB)
        locc = jnp.where(covered, loc, 0)
        if join == "take":
            g = jnp.take(win, locc, axis=0)          # (G, W)
            s = jnp.sum(g * qa_ref[0:1, :].T, axis=1)
        else:
            s = jnp.sum(win[:8], axis=(0, 1)) + qa_ref[0, :]
        out_ref[:] = jnp.where(covered, s, -1.0)[None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((4, G), lambda i, off: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda i, off: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, W), lambda i, off: (off[i] // RB, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, W), lambda i, off: (off[i] // RB + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G), lambda i, off: (0, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, n_blocks * G), jnp.float32),
    )


def stage12(join="take", B=10_000_000, n_rows=2_000_000, W=384, G=2048,
            RB=512):
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(1)
    B = (B // G) * G
    tab = jnp.asarray(rng.random((n_rows + RB, W), dtype=np.float32))
    bins_np = np.sort(rng.integers(0, n_rows, B).astype(np.int32))
    n_blocks = B // G
    # per-block first-row offsets (host-side here; searchsorted priced
    # in stage 3)
    off_np = bins_np[::G].copy()
    # query payload rows: x, y(=weights for the checksum), z, pad
    q_np = rng.random((4, B), dtype=np.float32)

    qa = jnp.asarray(q_np)
    qb = jnp.asarray(bins_np[None, :])
    off = jnp.asarray(off_np)
    f = make_join(n_rows, W, G, RB, join, n_blocks)

    # coverage check: how many queries fall outside their block window?
    span_bad = 0
    for i in range(n_blocks):
        base = (off_np[i] // RB) * RB
        lo, hi = bins_np[i * G], bins_np[min((i + 1) * G, B) - 1]
        if hi - base >= 2 * RB:
            span_bad += 1
    print(f"stage1 window-coverage: {span_bad}/{n_blocks} blocks "
          f"exceed the 2x{RB}-row window", flush=True)

    def timed_fn(off, qa, qb, tab, n):
        def body(i, carry):
            qa_v, acc = carry
            o = f(off, qa_v, qb, tab, tab)
            qa_v = qa_v + (o[:1, :1] > 1e30).astype(jnp.float32)
            return (qa_v, acc + o[0, 0])

        _, acc = lax.fori_loop(0, n, body, (qa, jnp.zeros((), jnp.float32)))
        return acc

    out = jax.jit(lambda off, qa, qb, tab: f(off, qa, qb, tab, tab))(
        off, qa, qb, tab
    )
    miss = int((np.asarray(out[0]) < 0).sum())
    print(f"stage2[{join}] kernel runs; uncovered queries: {miss}/{B}",
          flush=True)
    t = chain(timed_fn, off, qa, qb, tab, n0=1, n1=3)
    print(f"stage2[{join}] stream-join: {t/B*1e9:7.2f} ms/1M "
          f"(total {t*1e3:.1f} ms for {B/1e6:.0f}M)", flush=True)


# ---------------------------------------------------------------------------
# stage 3: bookkeeping pieces at 10M
# ---------------------------------------------------------------------------

def stage3(B=10_000_000, n_rows=2_000_000):
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(2)
    bins = jnp.asarray(rng.integers(0, n_rows, B).astype(np.int32))
    q = jnp.asarray(rng.random((3, B), dtype=np.float32))

    def co_sort(bins, q, n):
        iota = jnp.arange(B, dtype=jnp.int32)

        def body(i, carry):
            b, acc = carry
            sk, sx, sy, sz, si = lax.sort(
                (b, q[0], q[1], q[2], iota), num_keys=1
            )
            return (b + (si[:1] > (1 << 30)).astype(jnp.int32),
                    acc + sk[0].astype(jnp.float32) + sx[0])

        _, acc = lax.fori_loop(0, n, body, (bins, jnp.zeros((), jnp.float32)))
        return acc

    t = chain(co_sort, bins, q, n0=1, n1=3)
    print(f"stage3 5-payload co-sort 10M: {t/B*1e9:7.2f} ms/1M", flush=True)

    sb = jnp.sort(bins)
    G = 2048
    n_blocks = B // G

    def block_offsets(sb, n):
        def body(i, carry):
            s, acc = carry
            off = s[:: G]  # first bin of each block — a strided slice
            return (s + (off[:1] > (1 << 30)).astype(jnp.int32),
                    acc + off[0].astype(jnp.float32))

        _, acc = lax.fori_loop(0, n, body, (sb, jnp.zeros((), jnp.float32)))
        return acc

    t = chain(block_offsets, sb, n0=1, n1=5)
    print(f"stage3 block-offset strided slice 10M: {t/B*1e9:7.2f} ms/1M",
          flush=True)


if __name__ == "__main__":
    from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    args = set(sys.argv[1:])
    if not args or "--stage0" in args:
        ok = stage0()
    if "--stage1" in args:
        stage12(join="touch")
    if "--stage2" in args:
        stage12(join="take")
    if "--stage3" in args:
        stage3()
