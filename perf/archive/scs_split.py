"""Round-3c: where do SCS-rebuild's 1425 ms go (vs CSR 380 at 10M uniform)?

CAUTION (measured): the tiny "stage sort"/"stage segmap" results are XLA
slice-sinking artifacts — returning ``order[:1]``-shaped outputs lets XLA
reduce the argsort itself, so those stages price almost nothing.  Only the
full-pipeline numbers (and the standalone primitive timings) are
decision-grade; the honest stage attribution came from perf/rebuild_fused
A/Bs of real rebuild variants (docs/PERFORMANCE.md round-3c).

Stage-split timings of the gather-formulated SCS rebuild pipeline plus
primitive candidates, all fori-fused with evolving state in ONE process
(docs/PERFORMANCE.md measurement rules).  Output drives the next
reformulation; VERDICT r2 #8 target is SCS rebuild <= 2x CSR.

Primitive suspects measured standalone (slot rate, C ~= 1.44N):
  - jnp.cumsum int32/f32 at 14.4M (the slot->segment map uses TWO of them)
  - blocked triangular-MXU cumsum (reshape (B,1024), tri-matmul + block
    offsets) as the candidate replacement
  - stable argsort of the (C,) int32 key (shared with CSR)

  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/scs_split.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from pumipic_tpu.particles import CSR, SCSInput, SellCSigma, distribute

NE = int(os.environ.get("SCSS_NE", 1000))
NP = int(os.environ.get("SCSS_NP", 10_000_000))
ITERS = int(os.environ.get("SCSS_ITERS", 4))


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) * 1e3
    print(f"  {name}: {dt:.1f} ms", flush=True)
    return out


def fori(n, body, x):
    return jax.lax.fori_loop(0, n, lambda i, c: body(c), x)


def main():
    ppe, elems = distribute.distribute_particles(NE, NP, "uniform", seed=7)
    spec = {"pos": ((3,), jnp.float32), "vel": ((3,), jnp.float32),
            "pid": ((), jnp.int32)}
    scs = SellCSigma(NE, elems, field_spec=spec,
                     scs_input=SCSInput(chunk_size=32))
    csr = CSR(NE, elems, field_spec=spec)
    C = scs.capacity
    print(f"NE={NE} NP={NP} scs capacity={C} csr capacity={csr.capacity}",
          flush=True)

    key = jnp.where(scs.active, scs.elem, NE).astype(jnp.int32)

    # ---- primitives at slot rate (evolving via +i to defeat the relay)
    @jax.jit
    def prim_cumsum_i32(k):
        def body(c):
            return jnp.cumsum(c + 1) % jnp.int32(1 << 22)
        return fori(ITERS, body, k)

    @jax.jit
    def prim_cumsum_f32(k):
        kf = k.astype(jnp.float32)
        def body(c):
            return jnp.cumsum(c * 1e-7) % jnp.float32(997.0)
        return fori(ITERS, body, kf)

    TRI = 1024

    def blocked_cumsum(v):
        # inclusive cumsum via (B, TRI) @ lower-triangular ones + block bases
        n = v.shape[0]
        pad = (-n) % TRI
        vp = jnp.pad(v, (0, pad)) if pad else v
        blk = vp.reshape(-1, TRI)
        tri = jnp.tril(jnp.ones((TRI, TRI), jnp.float32))
        within = jax.lax.dot_general(
            blk.astype(jnp.bfloat16), tri.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        # bf16 mantissa truncation is NOT exact for arbitrary values; this
        # benchmark only prices the op shape.  Exact variant: f32 operands.
        bases = jnp.cumsum(blk.sum(1)) - blk.sum(1)
        return (within + bases[:, None]).reshape(-1)[:n]

    def blocked_cumsum_f32(v):
        n = v.shape[0]
        pad = (-n) % TRI
        vp = jnp.pad(v, (0, pad)) if pad else v
        blk = vp.reshape(-1, TRI)
        tri = jnp.tril(jnp.ones((TRI, TRI), jnp.float32))
        within = jax.lax.dot_general(
            blk, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        bases = jnp.cumsum(blk.sum(1)) - blk.sum(1)
        return (within + bases[:, None]).reshape(-1)[:n]

    @jax.jit
    def prim_blocked_bf16(k):
        kf = (k % 2).astype(jnp.float32)
        def body(c):
            return blocked_cumsum(c) % jnp.float32(2.0)
        return fori(ITERS, body, kf)

    @jax.jit
    def prim_blocked_f32(k):
        kf = (k % 2).astype(jnp.float32)
        def body(c):
            return blocked_cumsum_f32(c) % jnp.float32(2.0)
        return fori(ITERS, body, kf)

    @jax.jit
    def prim_argsort(k):
        def body(c):
            return jnp.argsort(c, stable=True).astype(jnp.int32)
        return fori(ITERS, body, key + (k[:1] % 2))
    print("primitives (x%d fori-fused, per-call below):" % ITERS, flush=True)
    t0 = time.perf_counter(); jax.block_until_ready(prim_cumsum_i32(key))
    t0 = time.perf_counter(); jax.block_until_ready(prim_cumsum_i32(key))
    print(f"  cumsum int32 @{C}: {(time.perf_counter()-t0)*1e3/ITERS:.1f} ms",
          flush=True)
    t0 = time.perf_counter(); jax.block_until_ready(prim_cumsum_f32(key))
    t0 = time.perf_counter(); jax.block_until_ready(prim_cumsum_f32(key))
    print(f"  cumsum f32 @{C}: {(time.perf_counter()-t0)*1e3/ITERS:.1f} ms",
          flush=True)
    jax.block_until_ready(prim_blocked_bf16(key))
    t0 = time.perf_counter(); jax.block_until_ready(prim_blocked_bf16(key))
    print(f"  blocked tri-MXU cumsum bf16 @{C}: "
          f"{(time.perf_counter()-t0)*1e3/ITERS:.1f} ms", flush=True)
    jax.block_until_ready(prim_blocked_f32(key))
    t0 = time.perf_counter(); jax.block_until_ready(prim_blocked_f32(key))
    print(f"  blocked tri-MXU cumsum f32 @{C}: "
          f"{(time.perf_counter()-t0)*1e3/ITERS:.1f} ms", flush=True)
    jax.block_until_ready(prim_argsort(key))
    t0 = time.perf_counter(); jax.block_until_ready(prim_argsort(key))
    print(f"  stable argsort int32 @{C}: "
          f"{(time.perf_counter()-t0)*1e3/ITERS:.1f} ms", flush=True)

    # ---- pipeline stage splits on the real SCS state -------------------
    # stage A: argsort only; B: + slot->segment map (both cumsums);
    # C: + elem/rank/src math + one field gather; full: production rebuild.
    from pumipic_tpu.particles.structure import _scs_row_order
    from pumipic_tpu.ops.scatter import count_per_key_matmul
    LIDT = jnp.int32
    E = NE
    chunk = scs.chunk_size

    def stage(upto):
        @jax.jit
        def run(ps):
            def body(i, c):
                elem0, active, f0 = c
                k = jnp.where(active, (elem0 + i) % E, E).astype(LIDT)
                order = jnp.argsort(k, stable=True)
                if upto == "sort":
                    return ((elem0 + order[:1] % 1) % E, active, f0)
                counts = count_per_key_matmul(k, E).astype(LIDT)
                start = jnp.concatenate(
                    [jnp.zeros(1, LIDT), jnp.cumsum(counts).astype(LIDT)])
                row_to_elem, elem_to_row, chunk_width = _scs_row_order(
                    counts, scs.sigma, chunk, E)
                nchunks = chunk_width.shape[0]
                chunk_slots = chunk * chunk_width
                chunk_off = jnp.concatenate(
                    [jnp.zeros(1, chunk_slots.dtype),
                     jnp.cumsum(chunk_slots)]).astype(LIDT)
                pos = chunk_off[1:-1]
                jump = jnp.diff(chunk_off)[:-1]
                if upto.endswith("f32"):
                    indf = jnp.zeros((C,), jnp.float32).at[pos].add(
                        1.0, mode="drop")
                    gjf = jnp.zeros((C,), jnp.float32).at[pos].add(
                        jump.astype(jnp.float32), mode="drop")
                    ch = jnp.cumsum(indf).astype(LIDT)
                    G = jnp.cumsum(gjf).astype(LIDT)
                else:
                    ind = jnp.zeros((C,), LIDT).at[pos].add(1, mode="drop")
                    gj = jnp.zeros((C,), LIDT).at[pos].add(jump, mode="drop")
                    ch = jnp.cumsum(ind)
                    G = jnp.cumsum(gj)
                if upto.startswith("segmap"):
                    return ((elem0 + (ch[:1] + G[:1]) % 1) % E, active, f0)
                j = jnp.arange(C, dtype=LIDT)
                o = j - G
                of = o.astype(jnp.float32)
                rank_j = jnp.floor(of / chunk).astype(LIDT)
                local_row = (o - rank_j * chunk).astype(LIDT)
                row = jnp.clip(ch, 0, nchunks - 1) * chunk + local_row
                elem_j = row_to_elem[jnp.minimum(row, row_to_elem.shape[0] - 1)]
                elem_c = jnp.clip(elem_j, 0, E - 1)
                valid = ((elem_j >= 0) & (elem_j < E) & (rank_j >= 0)
                         & (rank_j < counts[elem_c]))
                src = order[jnp.minimum(start[elem_c] + rank_j, C - 1)]
                take = jnp.where(valid, src, 0)
                f1 = f0[take]
                return (jnp.where(valid, elem_c, -1), valid, f1)
            return jax.lax.fori_loop(0, ITERS, body, ps)
        return run

    st0 = (scs.elem, scs.active, scs.fields["pos"])
    for name in ("sort", "segmap", "segmap_f32", "onefield", "onefield_f32"):
        run = stage(name)
        out = jax.block_until_ready(run(st0))
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(st0))
        dt = (time.perf_counter() - t0) * 1e3 / ITERS
        print(f"stage {name}: {dt:.1f} ms", flush=True)

    # ---- full rebuild A/B: scs vs csr (evolving elem assignment)
    def churn(ps, i):
        # move ~10% of particles one element right (evolving, no recompiles)
        e = ps.elem
        move = (jnp.arange(ps.capacity) % 10) == (i % 10)
        ne = jnp.where(ps.active & move, (e + 1) % NE, e)
        return jnp.where(ps.active, ne, -1)

    @jax.jit
    def scs_loop(ps):
        def body(i, c):
            return c.rebuild(churn(c, i))
        return jax.lax.fori_loop(0, ITERS, body, ps)

    @jax.jit
    def csr_loop(ps):
        def body(i, c):
            return c.rebuild(churn(c, i))
        return jax.lax.fori_loop(0, ITERS, body, ps)

    for name, loop, ps in (("scs", scs_loop, scs), ("csr", csr_loop, csr)):
        out = jax.block_until_ready(loop(ps))
        t0 = time.perf_counter()
        out = jax.block_until_ready(loop(out))
        dt = (time.perf_counter() - t0) * 1e3 / ITERS
        print(f"full rebuild {name}: {dt:.1f} ms/rebuild "
              f"(nptcls={int(out.num_ptcls)})", flush=True)


if __name__ == "__main__":
    main()
