"""In-kernel DMA row gather vs XLA gather (the round-3 blocker retest).

The cold candidate path spends ~12 of 13 ms/1M on an XLA gather that
materializes 2 KB rows to HBM and reloads them into the Pallas kernel
(benchmarks/RESULTS.md).  A dynamic-offset ``make_async_copy`` inside
the kernel reads each row from HBM exactly once — this microbench
measures whether the DMA issue rate sustains that at 1M rows (earlier
in round 3 every dynamic-offset copy crashed the axon remote-compile
helper; it no longer does).

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
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    B = 1 << 20  # queries
    N_ROWS = 998_250
    width = int(sys.argv[sys.argv.index("--width") + 1]) if "--width" in sys.argv else 512
    TILE = int(sys.argv[sys.argv.index("--tile") + 1]) if "--tile" in sys.argv else 256

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.random((N_ROWS, width), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, N_ROWS, B), jnp.int32)

    # ---- XLA gather + in-XLA consume (the current approach) ----
    def xla_gather(tab, idx, n):
        def body(i, carry):
            idxv, acc = carry
            rows = tab[idxv]
            s = rows.sum(axis=1)
            idxv = (idxv + (s[:1] > 1e30).astype(jnp.int32)) % N_ROWS
            return (idxv, acc + s[0])

        _, acc = lax.fori_loop(0, n, body, (idx, jnp.zeros((), jnp.float32)))
        return acc

    t = chain(xla_gather, tab, idx)
    print(f"XLA gather+sum      {width * 4}B rows: {t * 1e3:7.2f} ms/1M "
          f"({B * width * 4 / t / 1e9:.0f} GB/s payload)", flush=True)

    # ---- in-kernel DMA gather: start-all / wait-all per tile ----
    # Wide rows hit Mosaic's "slice aligned to tiling (8)" check; a
    # width-W row stored as W//128 sublane-rows of a 128-wide table
    # DMAs fine as an (s, 128) slice at dynamic offset s*idx.
    s_rows = width // 128
    tab4 = tab.reshape(N_ROWS * s_rows, 128)

    def dma_kernel(idx_ref, tab_ref, o_ref, scratch, sem):
        def start(k, _):
            pltpu.make_async_copy(
                tab_ref.at[pl.ds(idx_ref[k] * s_rows, s_rows), :],
                scratch.at[pl.ds(k * s_rows, s_rows), :],
                sem,
            ).start()
            return 0

        lax.fori_loop(0, TILE, start, 0)

        def wait(k, _):
            pltpu.make_async_copy(
                tab_ref.at[pl.ds(0, s_rows), :],
                scratch.at[pl.ds(0, s_rows), :], sem,
            ).wait()
            return 0

        lax.fori_loop(0, TILE, wait, 0)
        o_ref[:] = (
            scratch[:].reshape(TILE, width).sum(axis=1).reshape(1, TILE)
        )

    grid = (B // TILE,)
    dma_call = pl.pallas_call(
        dma_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE * s_rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    def dma_gather(tab4, idx, n):
        def body(i, carry):
            idxv, acc = carry
            s = dma_call(idxv, tab4)
            idxv = (idxv + (s[0, :1] > 1e30).astype(jnp.int32)) % N_ROWS
            return (idxv, acc + s.sum())

        _, acc = lax.fori_loop(0, n, body, (idx, jnp.zeros((), jnp.float32)))
        return acc

    # correctness first
    s = jax.jit(lambda t_, i_: dma_call(i_, t_))(tab4, idx)
    ref = np.asarray(tab)[np.asarray(idx)].sum(axis=1)
    err = np.abs(np.asarray(s[0]) - ref).max() / np.abs(ref).max()
    assert err < 1e-5, f"dma gather wrong: {err}"

    t = chain(dma_gather, tab4, idx)
    print(f"DMA gather tile={TILE:4d} {width * 4}B rows: {t * 1e3:7.2f} ms/1M "
          f"({B * width * 4 / t / 1e9:.0f} GB/s payload)", flush=True)


main()
