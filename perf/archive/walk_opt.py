"""TPU microbenchmarks for round-2 walk/deposition optimization candidates.

Measures, in ONE process (within-process A/B is decision-grade, see
docs/PERFORMANCE.md "Measurement rules"), the per-pass cost of walk-body
variants and deposition alternatives at 10M particles on the 24k annulus.
All loops run inside a single jit (lax.fori_loop) with evolving state.

Usage:  PYTHONPATH=/root/repo python perf/walk_opt.py [variant ...]
Variants: floor current affine two_gather transposed pallas hist
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N = 10_000_000
T = 20  # fori iterations per measurement


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / T * 1e3
    print(f"{name:28s} {dt:8.2f} ms/pass", flush=True)
    return dt


def main():
    variants = sys.argv[1:] or [
        "floor", "current", "affine", "two_gather", "transposed", "pallas",
        "hist",
    ]
    from pumipic_tpu.models.pseudo_xgcm import make_default_mesh

    mesh = make_default_mesh(24_000)
    E = mesh.nelems
    print(f"mesh E={E} N={N}", flush=True)

    rng = np.random.default_rng(0)
    elem0 = jnp.asarray(rng.integers(0, E, N), jnp.int32)
    # destinations: random points in the annulus bounding box
    dx0 = jnp.asarray(rng.uniform(-1, 1, N), jnp.float32)
    dy0 = jnp.asarray(rng.uniform(-1, 1, N), jnp.float32)

    wg = mesh.walk_geom  # (E, 12)

    # --- variant tables -----------------------------------------------------
    wg_h = np.asarray(wg)
    ib = wg_h[:, 0:4]
    v0 = wg_h[:, 4:6]
    # affine: l1 = a11*dx + a12*dy + c1 with c = -ib @ v0
    c1 = -(ib[:, 0] * v0[:, 0] + ib[:, 1] * v0[:, 1])
    c2 = -(ib[:, 2] * v0[:, 0] + ib[:, 3] * v0[:, 1])
    nbr_i = wg_h[:, 6:9].view(np.int32)
    aff = np.zeros((E, 12), np.float32)
    aff[:, 0] = ib[:, 0]; aff[:, 1] = ib[:, 1]; aff[:, 2] = c1
    aff[:, 3] = ib[:, 2]; aff[:, 4] = ib[:, 3]; aff[:, 5] = c2
    aff[:, 6:9] = nbr_i.astype(np.float32)        # exact for ids < 2^24
    aff_j = jnp.asarray(aff)
    aff6_j = jnp.asarray(aff[:, :6].copy())
    nbr_flat = jnp.asarray(nbr_i.reshape(-1))      # (3E,) int32
    aff_t = jnp.asarray(aff.T.copy())              # (12, E)

    def evolve(dx, dy):
        # cheap deterministic position evolution (keeps relay honest)
        return dx * 0.999 + 0.001, dy * 0.999 - 0.001

    # --- 0) single-consumer gather floor ------------------------------------
    if "floor" in variants:
        @jax.jit
        def floor_loop(elem, dx, dy):
            def body(i, s):
                e, a, b = s
                g = wg[e]
                r = jnp.sum(g, axis=1)  # single consumer
                e = (e + r.astype(jnp.int32) % 3 + 1) % E
                a, b = evolve(a, b)
                return e, a, b
            return jax.lax.fori_loop(0, T, body, (elem, dx, dy))
        timeit("gather floor (12col,1use)", floor_loop, elem0, dx0, dy0)

    # --- 1) current walk body ------------------------------------------------
    def step_current(e, dx, dy):
        g = wg[e]
        rx = dx - g[:, 4]
        ry = dy - g[:, 5]
        l1 = g[:, 0] * rx + g[:, 1] * ry
        l2 = g[:, 2] * rx + g[:, 3] * ry
        w0 = 1.0 - l1 - l2
        inside = (w0 >= -1e-6) & (l1 >= -1e-6) & (l2 >= -1e-6)
        wmin = jnp.minimum(w0, l1)
        kmin = jnp.where(w0 <= l1, 0, 1)
        kmin = jnp.where(l2 < wmin, 2, kmin)
        exit_local = (kmin + 1) % 3
        nbr3 = jax.lax.bitcast_convert_type(g[:, 6:9], jnp.int32)
        nxt = jnp.where(
            exit_local == 0, nbr3[:, 0],
            jnp.where(exit_local == 1, nbr3[:, 1], nbr3[:, 2]))
        return jnp.where(inside | (nxt < 0), e, nxt)

    # --- 2) affine all-float row ----------------------------------------------
    def step_affine(e, dx, dy):
        g = aff_j[e]
        l1 = g[:, 0] * dx + g[:, 1] * dy + g[:, 2]
        l2 = g[:, 3] * dx + g[:, 4] * dy + g[:, 5]
        w0 = 1.0 - l1 - l2
        inside = (w0 >= -1e-6) & (l1 >= -1e-6) & (l2 >= -1e-6)
        wmin = jnp.minimum(w0, l1)
        kmin = jnp.where(w0 <= l1, 0, 1)
        kmin = jnp.where(l2 < wmin, 2, kmin)
        exit_local = (kmin + 1) % 3
        nf = jnp.where(
            exit_local == 0, g[:, 6],
            jnp.where(exit_local == 1, g[:, 7], g[:, 8]))
        nxt = nf.astype(jnp.int32)
        return jnp.where(inside | (nxt < 0), e, nxt)

    # --- 3) 6-col float gather + flat int gather -------------------------------
    def step_two_gather(e, dx, dy):
        g = aff6_j[e]
        l1 = g[:, 0] * dx + g[:, 1] * dy + g[:, 2]
        l2 = g[:, 3] * dx + g[:, 4] * dy + g[:, 5]
        w0 = 1.0 - l1 - l2
        inside = (w0 >= -1e-6) & (l1 >= -1e-6) & (l2 >= -1e-6)
        wmin = jnp.minimum(w0, l1)
        kmin = jnp.where(w0 <= l1, 0, 1)
        kmin = jnp.where(l2 < wmin, 2, kmin)
        exit_local = (kmin + 1) % 3
        nxt = nbr_flat[e * 3 + exit_local]
        return jnp.where(inside | (nxt < 0), e, nxt)

    # --- 4) transposed (12, N) gather -----------------------------------------
    def step_transposed(e, dx, dy):
        # gather columns of (12, E): out[:, n] = aff_t[:, e[n]]
        g = jax.lax.gather(
            aff_t, e[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(0,), collapsed_slice_dims=(1,),
                start_index_map=(1,)),
            slice_sizes=(12, 1),
        )  # -> (12, N)
        l1 = g[0] * dx + g[1] * dy + g[2]
        l2 = g[3] * dx + g[4] * dy + g[5]
        w0 = 1.0 - l1 - l2
        inside = (w0 >= -1e-6) & (l1 >= -1e-6) & (l2 >= -1e-6)
        wmin = jnp.minimum(w0, l1)
        kmin = jnp.where(w0 <= l1, 0, 1)
        kmin = jnp.where(l2 < wmin, 2, kmin)
        exit_local = (kmin + 1) % 3
        nf = jnp.where(exit_local == 0, g[6],
                       jnp.where(exit_local == 1, g[7], g[8]))
        nxt = nf.astype(jnp.int32)
        return jnp.where(inside | (nxt < 0), e, nxt)

    def make_loop(step):
        @jax.jit
        def loop(elem, dx, dy):
            def body(i, s):
                e, a, b = s
                e = step(e, a, b)
                a, b = evolve(a, b)
                return e, a, b
            return jax.lax.fori_loop(0, T, body, (elem, dx, dy))
        return loop

    for name, step in (
        ("current", step_current),
        ("affine", step_affine),
        ("two_gather", step_two_gather),
        ("transposed", step_transposed),
    ):
        if name in variants:
            try:
                timeit(f"walk pass [{name}]", make_loop(step), elem0, dx0, dy0)
            except Exception as ex:  # noqa: BLE001
                print(f"walk pass [{name}] FAILED: {type(ex).__name__}: {ex}",
                      flush=True)

    # --- 5) pallas lane-gather kernel -----------------------------------------
    if "pallas" in variants:
        try:
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            Ep = ((E + 127) // 128) * 128
            tab = np.zeros((16, Ep), np.float32)
            tab[:12, :E] = aff.T
            tab_j = jnp.asarray(tab)
            B = 8 * 2048

            def kernel(tab_ref, e_ref, dx_ref, dy_ref, out_ref):
                idx = e_ref[:]                      # (1, B) int32
                idxb = jnp.broadcast_to(idx, (16, idx.shape[1]))
                g = jnp.take_along_axis(tab_ref[:], idxb, axis=1)  # (16, B)
                dx = dx_ref[:]
                dy = dy_ref[:]
                l1 = g[0:1] * dx + g[1:2] * dy + g[2:3]
                l2 = g[3:4] * dx + g[4:5] * dy + g[5:6]
                w0 = 1.0 - l1 - l2
                inside = (w0 >= -1e-6) & (l1 >= -1e-6) & (l2 >= -1e-6)
                wmin = jnp.minimum(w0, l1)
                kmin = jnp.where(w0 <= l1, 0, 1)
                kmin = jnp.where(l2 < wmin, 2, kmin)
                exit_local = (kmin + 1) % 3
                nf = jnp.where(exit_local == 0, g[6:7],
                               jnp.where(exit_local == 1, g[7:8], g[8:9]))
                nxt = nf.astype(jnp.int32)
                out_ref[:] = jnp.where(inside | (nxt < 0), idx, nxt)

            def pallas_step(e, dx, dy):
                n = e.shape[0]
                grid = n // B
                return pl.pallas_call(
                    kernel,
                    grid=(grid,),
                    in_specs=[
                        pl.BlockSpec((16, Ep), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, B), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, B), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, B), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, B), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((grid, B), jnp.int32),
                )(tab_j, e.reshape(grid, B), dx.reshape(grid, B),
                  dy.reshape(grid, B)).reshape(n)

            timeit("walk pass [pallas]", make_loop(pallas_step),
                   elem0, dx0, dy0)
        except Exception as ex:  # noqa: BLE001
            print(f"walk pass [pallas] FAILED: {type(ex).__name__}: {ex}",
                  flush=True)

    # --- 6) histogram variants --------------------------------------------
    if "hist" in variants:
        @jax.jit
        def seg_loop(elem):
            def body(i, s):
                e, acc = s
                c = jax.ops.segment_sum(
                    jnp.ones(e.shape, jnp.float32), e, num_segments=E)
                e = (e + c[e].astype(jnp.int32) % 7 + 1) % E
                return e, acc + c[0]
            return jax.lax.fori_loop(0, T, body, (elem, jnp.float32(0)))
        timeit("hist [segment_sum f32]", seg_loop, elem0)

        @jax.jit
        def seg_loop_i(elem):
            def body(i, s):
                e, acc = s
                c = jax.ops.segment_sum(
                    jnp.ones(e.shape, jnp.int32), e, num_segments=E)
                e = (e + c[e] % 7 + 1) % E
                return e, acc + c[0]
            return jax.lax.fori_loop(0, T, body, (elem, jnp.int32(0)))
        timeit("hist [segment_sum i32]", seg_loop_i, elem0)

        @jax.jit
        def sort_loop(elem):
            def body(i, s):
                e, acc = s
                se = jnp.sort(e)
                bounds = jnp.searchsorted(se, jnp.arange(E + 1, dtype=e.dtype))
                c = jnp.diff(bounds).astype(jnp.float32)
                e = (e + c[e].astype(jnp.int32) % 7 + 1) % E
                return e, acc + c[0]
            return jax.lax.fori_loop(0, T, body, (elem, jnp.float32(0)))
        timeit("hist [sort+searchsorted]", sort_loop, elem0)

        @jax.jit
        def argsort_loop(done):
            def body(i, s):
                d, acc = s
                idx = jnp.argsort(d, stable=True)
                d = jnp.roll(d, 1) ^ (idx[0] > 0)
                return d, acc + idx[0]
            return jax.lax.fori_loop(0, T, body, (done, jnp.int32(0)))
        timeit("argsort bool (compaction)",
               argsort_loop, jnp.asarray(rng.uniform(size=N) < 0.8))


if __name__ == "__main__":
    main()
