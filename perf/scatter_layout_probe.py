"""Compile-only probe: TPU layout of 1-D scatter-into-zeros at 18M.

The scs_opt A/B OOM'd with two 8.58 GB s32[1,18M]{0,1:T(8,128)} copies
(128x padding) — hypothesis: each ``zeros(C).at[pos].add(v)`` 1-D scatter
copies its 18M operand into a degenerate sublane-major layout.  Probe
compiles three formulations AOT and prints peak-memory analysis:

  flat1   one 1-D scatter + cumsum            (current segment_of_slot)
  flat2   two 1-D scatters + two cumsums      (scs_opt _seg_offsets_nogather)
  block2  two scatters into a (C//128, 128) view + two cumsums
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

C = int(os.environ.get("PROBE_C", 18_000_000))
NCH = 32
LID = jnp.int32


def flat1(chunk_off):
    ind = jnp.zeros((C,), LID).at[chunk_off[1:-1]].add(1, mode="drop")
    return jnp.cumsum(ind)


def flat2(chunk_off):
    pos = chunk_off[1:-1]
    jump = jnp.diff(chunk_off)[:-1]
    ind = jnp.zeros((C,), LID).at[pos].add(1, mode="drop")
    gj = jnp.zeros((C,), LID).at[pos].add(jump, mode="drop")
    return jnp.cumsum(ind) + jnp.cumsum(gj)


def block2(chunk_off):
    W = 128
    rows = -(-C // W)
    pos = chunk_off[1:-1]
    jump = jnp.diff(chunk_off)[:-1]
    r, c = pos // W, pos % W
    ind = jnp.zeros((rows, W), LID).at[r, c].add(1, mode="drop").reshape(-1)[:C]
    gj = jnp.zeros((rows, W), LID).at[r, c].add(jump, mode="drop").reshape(-1)[:C]
    return jnp.cumsum(ind) + jnp.cumsum(gj)


def main():
    off = jax.ShapeDtypeStruct((NCH + 1,), LID)
    for name, fn in (("flat1", flat1), ("flat2", flat2), ("block2", block2)):
        try:
            comp = jax.jit(fn).lower(off).compile()
            m = comp.memory_analysis()
            peak = getattr(m, "temp_size_in_bytes", None)
            print(f"{name}: temp {peak / 2**30:.2f} GiB" if peak is not None
                  else f"{name}: {m}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
