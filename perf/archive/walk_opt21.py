"""Round-3c: row-gather vs transposed take(axis=1) for walk tables.

The 30M OOM dump showed the while-body row gather MATERIALIZES its
(N, 12) output in a T(8,128) layout — 10.7x padded bytes — and feeds 10
separate column-slice fusions.  The transposed (12, E) take(axis=1) form
yields a (12, N) output with ~1.3x padding.  Rows won round-2's A/B
against per-column SPLIT gathers, but the transposed single-take form was
never measured.  Honest fori-fused primitive A/B with evolving indices
and fully-consumed outputs (walk_opt16 methodology), at the two hot
shapes: the 24k walk_geom (E=24k, 12 cols) and the cpe16 cell table
(K=384k, 14 cols), 10M indices.

  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/walk_opt21.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("WO21_PTCLS", 10_000_000))
ITERS = int(os.environ.get("WO21_ITERS", 8))


def bench(label, E, C):
    rng = np.random.default_rng(5)
    tbl = jnp.asarray(rng.normal(size=(E, C)).astype(np.float32))
    tbl_t = tbl.T                      # (C, E) closure constant
    idx0 = jnp.asarray(rng.integers(0, E, N).astype(np.int32))

    @jax.jit
    def rows(idx):
        def body(i, c):
            ix, acc = c
            g = tbl[ix]                              # (N, C) row gather
            s = g[:, 0]
            for k in range(1, C):
                s = s + g[:, k] * (0.5 + k)
            ix = (ix + s.astype(jnp.int32) + i) % E  # evolving, consumed
            return ix, acc + s
        return jax.lax.fori_loop(0, ITERS, body, (idx, jnp.zeros((N,), jnp.float32)))

    @jax.jit
    def taket(idx):
        def body(i, c):
            ix, acc = c
            g = jnp.take(tbl_t, ix, axis=1)          # (C, N)
            s = g[0]
            for k in range(1, C):
                s = s + g[k] * (0.5 + k)
            ix = (ix + s.astype(jnp.int32) + i) % E
            return ix, acc + s
        return jax.lax.fori_loop(0, ITERS, body, (idx, jnp.zeros((N,), jnp.float32)))

    for name, fn in (("rows", rows), ("take_t", taket)):
        out = jax.block_until_ready(fn(idx0))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(out[0]))
        dt = (time.perf_counter() - t0) * 1e3 / ITERS
        print(f"{label} {name}: {dt:.1f} ms/gather-pass "
              f"(E={E}, cols={C})", flush=True)


def main():
    bench("walk_geom", 24_000, 12)
    bench("cell_rows", 384_000, 14)


if __name__ == "__main__":
    main()
