"""Compile-only bisect of the scs_rebuild_new 17 GB layout blowup.

Toggles each new-pipeline ingredient back to the current formulation and
prints AOT temp memory, to find which consumer induces the two
s32[1,18M]{0,1:T(8,128)} 128x-padded copies.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from pumipic_tpu.particles.structure import _scs_row_order
from pumipic_tpu.ops.scatter import count_per_key_matmul

C = int(os.environ.get("BISECT_C", 18_000_000))
E = 1000
CHUNK = 32
LID = jnp.int32


def rebuild(elem, active, vals, pid, *, seg_mode, rowtab_mode, counts_mode):
    key = jnp.where(active, elem, E)
    order = jnp.argsort(key, stable=True)
    if counts_mode == "hist":
        counts = count_per_key_matmul(key, E).astype(LID)
        start = jnp.concatenate(
            [jnp.zeros(1, LID), jnp.cumsum(counts).astype(LID)])
    else:
        sorted_key = key[order]
        start = jnp.searchsorted(
            sorted_key, jnp.arange(E + 1, dtype=key.dtype)).astype(LID)
        counts = jnp.diff(start)
    row_to_elem, elem_to_row, chunk_width = _scs_row_order(
        counts, 2 ** 30, CHUNK, E)
    nchunks = chunk_width.shape[0]
    chunk_slots = CHUNK * chunk_width
    chunk_off = jnp.concatenate(
        [jnp.zeros(1, chunk_slots.dtype), jnp.cumsum(chunk_slots)]
    ).astype(LID)
    needed = chunk_off[nchunks]

    j = jnp.arange(C, dtype=LID)
    if seg_mode == "nogather":
        pos = chunk_off[1:-1]
        jump = jnp.diff(chunk_off)[:-1]
        ind = jnp.zeros((C,), LID).at[pos].add(1, mode="drop")
        gj = jnp.zeros((C,), LID).at[pos].add(jump, mode="drop")
        ch, G = jnp.cumsum(ind), jnp.cumsum(gj)
        o = j - G
    else:
        ind = jnp.zeros((C,), LID).at[chunk_off[1:-1]].add(1, mode="drop")
        ch = jnp.cumsum(ind)
        o = j - chunk_off[jnp.clip(ch, 0, nchunks - 1)]
    of = o.astype(jnp.float32)
    rank = jnp.floor(of / CHUNK).astype(LID)
    local_row = o - rank * CHUNK
    row = jnp.minimum(ch * CHUNK + local_row, row_to_elem.shape[0] - 1)

    if rowtab_mode == "packed":
        rte = row_to_elem
        real = rte < E
        er = jnp.where(real, rte, 0)
        rowtab = jnp.stack([
            jnp.where(real, rte, -1).astype(LID),
            start[er],
            jnp.where(real, counts[er], 0).astype(LID),
        ], axis=1)
        rt = rowtab[row]
        elem_j, start_j, count_j = rt[:, 0], rt[:, 1], rt[:, 2]
    else:
        elem_j = row_to_elem[row]
        ec = jnp.clip(elem_j, 0, E - 1)
        start_j = start[ec]
        count_j = counts[ec]
        elem_j = jnp.where(elem_j < E, elem_j, -1)
    valid = (rank < count_j) & (j < needed) & (elem_j >= 0)
    src = order[jnp.minimum(start_j + rank, C - 1)]
    take = jnp.where(valid, src, 0)
    return (jnp.where(valid, elem_j, -1).astype(LID), valid,
            vals[take], pid[take])


def main():
    args = (jax.ShapeDtypeStruct((C,), LID),
            jax.ShapeDtypeStruct((C,), jnp.bool_),
            jax.ShapeDtypeStruct((C, 3), jnp.float32),
            jax.ShapeDtypeStruct((C,), jnp.int32))
    cases = [
        ("all-new", dict(seg_mode="nogather", rowtab_mode="packed",
                         counts_mode="hist")),
        ("seg=cur", dict(seg_mode="cur", rowtab_mode="packed",
                         counts_mode="hist")),
        ("rowtab=cur", dict(seg_mode="nogather", rowtab_mode="cur",
                            counts_mode="hist")),
        ("counts=cur", dict(seg_mode="nogather", rowtab_mode="packed",
                            counts_mode="cur")),
        ("all-cur-ish", dict(seg_mode="cur", rowtab_mode="cur",
                             counts_mode="cur")),
    ]
    only = os.environ.get("BISECT_ONLY", "")
    for name, kw in cases:
        if only and name not in only.split(","):
            continue
        try:
            comp = jax.jit(
                lambda e, a, v, p: rebuild(e, a, v, p, **kw)
            ).lower(*args).compile()
            m = comp.memory_analysis()
            print(f"{name}: temp {m.temp_size_in_bytes / 2**30:.2f} GiB",
                  flush=True)
        except Exception as ex:
            print(f"{name}: FAILED {str(ex)[:200]}", flush=True)


if __name__ == "__main__":
    main()
