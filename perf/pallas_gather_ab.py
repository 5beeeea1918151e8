"""Pallas/Mosaic DMA-gather experiment (VERDICT r4 #5).

Question: can a hand-written double-buffered per-row DMA gather beat XLA's
gather for the walk's hot shapes — (N,) random indices into a (C, W) f32
row table (the peel / small-table gathers, ~22-30 ms per 10M indices)?

Prior evidence said Mosaic cannot express VECTOR-rate gathers
(tpu.dynamic_gather cannot cross vregs along lanes; sublane gathers
rejected — docs/PERFORMANCE.md round-2 finding 7), leaving only the
DMA route: one async HBM→VMEM copy per row, overlapped NBUF-deep.  DMA
descriptors have fixed per-transfer cost, so 56-byte row transfers at 10M
rows/step price that overhead directly — this harness turns the prose
claim into a measured number (win or clean rejection).

  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/pallas_gather_ab.py
  PG_N=1000000 PG_INTERPRET=1 JAX_PLATFORMS=cpu python perf/pallas_gather_ab.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("PG_INTERPRET"):
    jax.config.update("jax_platforms", "cpu")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("PG_N", 10_000_000))
C = int(os.environ.get("PG_C", 24_576))
W = int(os.environ.get("PG_W", 14))
BLOCK = int(os.environ.get("PG_BLOCK", 2048))     # rows per grid step
NBUF = int(os.environ.get("PG_NBUF", 16))         # DMAs in flight
ITERS = int(os.environ.get("PG_ITERS", 10))
INTERPRET = bool(os.environ.get("PG_INTERPRET"))


def row_dma_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """out[i] = table[idx[i]] via per-row async copies, NBUF-deep."""
    n = idx.shape[0]
    grid = pl.cdiv(n, BLOCK)

    def kernel(idx_ref, table_ref, out_ref, sem):
        def dma(i):
            r = idx_ref[i]
            return pltpu.make_async_copy(
                table_ref.at[r], out_ref.at[i], sem.at[i % NBUF])

        def start(i, _):
            dma(i).start()
            return 0

        jax.lax.fori_loop(0, min(NBUF, BLOCK), start, 0)

        def step(i, _):
            dma(i).wait()
            nxt = i + NBUF

            @pl.when(nxt < BLOCK)
            def _():
                dma(nxt).start()

            return 0

        jax.lax.fori_loop(0, BLOCK, step, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, W), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda g: (g,),
                         memory_space=pltpu.VMEM),       # index block
            pl.BlockSpec(memory_space=pl.ANY),        # table stays HBM
        ],
        out_specs=pl.BlockSpec((BLOCK, W), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
        interpret=INTERPRET,
    )(idx, table)


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(C, W)).astype(np.float32))
    idx0 = jnp.asarray(rng.integers(0, C, N).astype(np.int32))

    # correctness first (small slice)
    small = idx0[: 4 * BLOCK]
    try:
        got = np.asarray(row_dma_gather(table, small))
    except Exception as e:
        print(f"REJECTED at compile/run: {type(e).__name__}: "
              f"{str(e)[:500]}", flush=True)
        return
    want = np.asarray(table)[np.asarray(small)]
    if not np.array_equal(got, want):
        print("REJECTED: wrong results "
              f"(mismatch at {int((got != want).any(axis=1).sum())} rows)",
              flush=True)
        return
    print("correctness ok on 4 blocks", flush=True)

    # honest fori-fused A/B: evolving indices inside one jit, consumed
    # output (sum) so XLA can't fold the gather away
    def make_loop(gather_fn):
        @jax.jit
        def run(idx):
            def body(_, carry):
                ix, acc = carry
                rows = gather_fn(table, ix)
                acc = acc + rows[:, 0]
                # evolve indices from the gathered data (dependency chain)
                ix = (ix + rows[:, 1].astype(jnp.int32) % 7 + 1) % C
                return ix, acc

            ix, acc = jax.lax.fori_loop(
                0, ITERS, body, (idx, jnp.zeros((N,), jnp.float32)))
            return acc.sum(), ix

        return run

    xla = make_loop(lambda t, ix: t[ix])
    pal = make_loop(row_dma_gather)

    for name, fn in (("xla gather", xla), ("pallas row-DMA", pal)):
        try:
            out, _ = fn(idx0)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out, _ = fn(idx0)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / ITERS * 1e3
            print(f"{name:16s} {dt:9.2f} ms per {N / 1e6:.0f}M-row gather "
                  f"(C={C}, W={W})", flush=True)
        except Exception as e:
            print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)


if __name__ == "__main__":
    main()
