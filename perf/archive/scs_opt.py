"""Round-3 A/B: SCS/CabM rebuild slot-pipeline reformulation.

VERDICT r2 #8 asked SCS rebuild <= 2x CSR; the round-3 gather formulation
reached 3.75x (1425 vs 380 ms at 10M uniform).  Remaining suspects, all at
slot rate (C = 1.8N = 18M for SCS):

  - ``key[order]`` gather in the prologue (lax.sort can return the sorted
    key AND the permutation from ONE sort);
  - five slot-rate gathers in the slot->source map: chunk_off[ch],
    row_to_elem[row], counts[elem], start[elem], order[src_pos].

Candidate ("new"): derive the within-segment offset ``o`` by scattering the
segment-length jumps at segment starts and taking a cumsum (no gather), and
pack (elem, start, count) into ONE per-row int32 table so a single 3-col
row gather replaces three.  order[src_pos] and the per-field gathers remain.

Variants are timed with evolving state in ONE process (docs/PERFORMANCE.md
measurement rules); exactness of new-vs-cur is asserted on the first
rebuild before timing.

  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/scs_opt.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from pumipic_tpu.particles import CabM, SCSInput, SellCSigma, distribute
from pumipic_tpu.particles.structure import _scs_row_order

NE = int(os.environ.get("SCSOPT_NE", 1000))
NP = int(os.environ.get("SCSOPT_NP", 10_000_000))
ITERS = int(os.environ.get("SCSOPT_ITERS", 4))
CHUNK = 32
LID = jnp.int32


def _seg_offsets_nogather(C, seg_off):
    """ch (segment id per slot) and G = seg_off[ch] via jump-scatter+cumsum:
    when ch increments at slot seg_off[c], G jumps by seg_off[c]-seg_off[c-1].
    Coincident starts (empty segments) accumulate, which is exactly right."""
    pos = seg_off[1:-1]
    jump = jnp.diff(seg_off)[:-1]
    ind = jnp.zeros((C,), LID).at[pos].add(1, mode="drop")
    gj = jnp.zeros((C,), LID).at[pos].add(jump, mode="drop")
    return jnp.cumsum(ind), jnp.cumsum(gj)


def _counts_start(key, active, E):
    """Per-element counts + exclusive offsets WITHOUT touching the sorted
    key: MXU one-hot histogram + a mesh-rate cumsum.  Replaces the
    ``sorted_key = key[order]`` slot-rate gather + searchsorted of the
    current path (keeping lax.sort's own sorted output alive instead
    triggers an 8.6 GB padded-layout copy at 18M — rejected)."""
    from pumipic_tpu.ops.scatter import count_per_key_matmul

    counts = count_per_key_matmul(key, E).astype(LID)
    start = jnp.concatenate(
        [jnp.zeros(1, LID), jnp.cumsum(counts).astype(LID)])
    return counts, start


def scs_rebuild_new(elem, active, fields, E, chunk, sigma):
    """Packed-rowtab SCS rebuild (same outputs as structure._rebuild scs)."""
    C = elem.shape[0]
    kdt = jnp.uint16 if E + 1 < (1 << 16) else LID
    key = jnp.where(active, elem, E).astype(kdt)
    order = jnp.argsort(key, stable=True)
    counts, start = _counts_start(key, active, E)
    row_to_elem, elem_to_row, chunk_width = _scs_row_order(
        counts, sigma, chunk, E)
    nchunks = chunk_width.shape[0]
    chunk_slots = chunk * chunk_width
    chunk_off = jnp.concatenate(
        [jnp.zeros(1, chunk_slots.dtype), jnp.cumsum(chunk_slots)]
    ).astype(LID)
    needed = chunk_off[nchunks]

    j = jnp.arange(C, dtype=LID)
    ch, G = _seg_offsets_nogather(C, chunk_off)
    o = j - G
    # chunk is small; o < chunk * max ppe stays well under 2^24
    of = o.astype(jnp.float32)
    rank = jnp.floor(of / chunk).astype(LID)
    local_row = o - rank * chunk
    row = jnp.minimum(ch * chunk + local_row, row_to_elem.shape[0] - 1)

    # separate 1-D row/element-table gathers: a PACKED s32 (R,3) table
    # gather at 18M indices induces two s32[1,18M] 128x-padded layout
    # copies (8.6 GB each -> OOM; perf/scs_bisect.py) — the round-2
    # "all-float rows or keep gathers 1-D" rule applies to s32 tables
    elem_j = row_to_elem[row]
    ec = jnp.clip(elem_j, 0, E - 1)
    start_j = start[ec]
    count_j = counts[ec]
    valid = (rank < count_j) & (j < needed) & (elem_j < E)
    src = order[jnp.minimum(start_j + rank, C - 1)]
    take = jnp.where(valid, src, 0)
    out_fields = {k: v[take] for k, v in fields.items()}
    out_elem = jnp.where(valid, ec, -1).astype(LID)
    elem_offsets = (
        chunk_off[elem_to_row // chunk] + (elem_to_row % chunk)
    ).astype(LID)
    return out_elem, valid, out_fields, elem_offsets, needed > C


def cabm_rebuild_new(elem, active, fields, E, soa):
    C = elem.shape[0]
    kdt = jnp.uint16 if E + 1 < (1 << 16) else LID
    key = jnp.where(active, elem, E).astype(kdt)
    order = jnp.argsort(key, stable=True)
    counts, start = _counts_start(key, active, E)
    seg = ((counts + soa - 1) // soa) * soa
    offsets = jnp.concatenate(
        [jnp.zeros(1, seg.dtype), jnp.cumsum(seg)]).astype(LID)
    needed = offsets[E]

    j = jnp.arange(C, dtype=LID)
    ch, G = _seg_offsets_nogather(C, offsets)
    rank = j - G
    ec = jnp.minimum(ch, E - 1)
    valid = (rank < counts[ec]) & (j < needed)
    src = order[jnp.minimum(start[ec] + rank, C - 1)]
    take = jnp.where(valid, src, 0)
    out_fields = {k: v[take] for k, v in fields.items()}
    out_elem = jnp.where(valid, ec, -1).astype(LID)
    return out_elem, valid, out_fields, offsets, needed > C


def csr_rebuild_new(elem, active, fields, E):
    """CSR without the sorted-key gather: out_elem comes from the
    segment-id cumsum and offsets from the MXU histogram."""
    C = elem.shape[0]
    kdt = jnp.uint16 if E + 1 < (1 << 16) else LID
    key = jnp.where(active, elem, E).astype(kdt)
    order = jnp.argsort(key, stable=True)
    counts, start = _counts_start(key, active, E)
    needed = start[E]
    j = jnp.arange(C, dtype=LID)
    ind = jnp.zeros((C,), LID).at[start[1:-1]].add(1, mode="drop")
    seg_id = jnp.cumsum(ind)
    valid = j < needed
    take = jnp.where(valid, order[jnp.minimum(j, C - 1)], 0)
    out_fields = {k: v[take] for k, v in fields.items()}
    out_elem = jnp.where(valid, jnp.minimum(seg_id, E - 1), -1).astype(LID)
    return out_elem, valid, out_fields, start, needed > C


def sort_probe(elem, active, E, dtype):
    key = jnp.where(active, elem, E).astype(dtype)
    order = jnp.argsort(key, stable=True)
    return order[:8], order  # tiny consume + full permutation


def main():
    ppe, elems = distribute.distribute_particles(NE, NP, "uniform", 0)
    n = len(elems)
    base_fields = {
        "vals": jnp.zeros((n, 3), jnp.float32),
        "pid": jnp.arange(n, dtype=jnp.int32),
    }

    if os.environ.get("SCSOPT_SORTPROBE", "0") == "1":
        # honest evolving-state argsort floor at capacity width
        C = int(1.8 * NP) // 8 * 8
        e = jnp.asarray(np.resize(elems, C), jnp.int32)
        a = jnp.ones((C,), bool)
        for dt in (jnp.int32, jnp.uint16):
            probe = jax.jit(lambda e, a, dt=dt: sort_probe(e, a, NE, dt))
            h, order = probe(e, a)
            jax.block_until_ready(order)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                e = jnp.where(a, (e + 1) % NE, -1)
                h, order = probe(e, a)
            jax.block_until_ready(order)
            dt_ms = (time.perf_counter() - t0) / ITERS * 1e3
            print(f"argsort[{jnp.dtype(dt).name}] @ {C}: {dt_ms:.1f} ms",
                  flush=True)
        return

    for struct in os.environ.get("SCSOPT_STRUCTS", "scs,cabm").split(","):
        if struct == "scs":
            ps = SellCSigma(NE, elems, fields=base_fields,
                            scs_input=SCSInput(chunk_size=CHUNK, sigma=None))
            new_fn = lambda e, a, f: scs_rebuild_new(
                e, a, f, NE, CHUNK, ps.sigma)
        elif struct == "csr":
            from pumipic_tpu.particles import CSR

            ps = CSR(NE, elems, fields=base_fields)
            new_fn = lambda e, a, f: csr_rebuild_new(e, a, f, NE)
        else:
            ps = CabM(NE, elems, fields=base_fields)
            new_fn = lambda e, a, f: cabm_rebuild_new(
                e, a, f, NE, ps.soa_width)
        C = ps.capacity
        print(f"== {struct}: capacity {C} ({C / NP:.2f}x)", flush=True)

        shift_cur = jax.jit(lambda p: p.rebuild(
            jnp.where(p.active, (p.elem + 1) % NE, -1)))

        @jax.jit
        def shift_new(e, a, f):
            ne2 = jnp.where(a, (e + 1) % NE, -1)
            e2 = jnp.where(a, ne2, -1)
            out_elem, valid, fout, _, _ = new_fn(e2, e2 >= 0, f)
            return out_elem, valid, fout

        # exactness: one cur rebuild vs one new rebuild from the same state
        want = shift_cur(ps)
        got_elem, got_act, got_f = shift_new(ps.elem, ps.active, ps.fields)
        for name, a, b in (("elem", want.elem, got_elem),
                           ("active", want.active, got_act),
                           ("pid", want.fields["pid"], got_f["pid"])):
            ok = bool(jnp.array_equal(a, b))
            print(f"   exact {name}: {ok}", flush=True)
            assert ok, f"{struct} {name} mismatch"

        # timing, evolving state
        p = ps
        t0 = time.perf_counter()
        for _ in range(ITERS):
            p = shift_cur(p)
        jax.block_until_ready(p.elem)
        t_cur = (time.perf_counter() - t0) / ITERS * 1e3

        e, a, f = ps.elem, ps.active, ps.fields
        e0, a0, f0 = shift_new(e, a, f)  # warm
        jax.block_until_ready(e0)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            e, a, f = shift_new(e, a, f)
        jax.block_until_ready(e)
        t_new = (time.perf_counter() - t0) / ITERS * 1e3

        print(f"   cur: {t_cur:.1f} ms   new: {t_new:.1f} ms   "
              f"({t_cur / t_new:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
