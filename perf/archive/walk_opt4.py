"""Round-2 experiments, part 4.

1. Pallas walk pass using tpu.dynamic_gather: Mosaic's gather lowering
   (jax/_src/pallas/mosaic/lowering.py:2464) supports take_along_axis on the
   LANE axis when indices.shape == table.shape — so each kernel invocation
   gathers exactly Ep (= padded table width) particles, indices broadcast
   over the 16 sublane rows.
2. Locator resolution sweep: higher cells_per_elem → better guesses → fewer
   full-width passes.

Usage: PYTHONPATH=/root/repo python perf/walk_opt4.py [pallas] [locator]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 10_000_000
T = 20


def main():
    variants = sys.argv[1:] or ["pallas", "locator"]
    from pumipic_tpu.models.pseudo_xgcm import make_default_mesh

    mesh = make_default_mesh(24_000)
    E = mesh.nelems
    aff = np.asarray(mesh.walk_geom)
    print(f"mesh E={E} N={N}", flush=True)

    rng = np.random.default_rng(0)
    elem0 = jnp.asarray(rng.integers(0, E, N), jnp.int32)
    dx0 = jnp.asarray(rng.uniform(-1, 1, N), jnp.float32)
    dy0 = jnp.asarray(rng.uniform(-1, 1, N), jnp.float32)

    def evolve(dx, dy):
        return dx * 0.999 + 0.001, dy * 0.999 - 0.001

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

    def timeit(name, fn, *args, iters=T):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:40s} {dt:8.2f} ms", flush=True)
        return dt

    if "pallas" in variants:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        Ep = ((E + 127) // 128) * 128           # lanes per block
        tab = np.zeros((16, Ep), np.float32)
        tab[:12, :E] = aff.T
        tab_j = jnp.asarray(tab)
        NB = -(-N // (8 * Ep))                   # blocks of (8, Ep)
        Npad = NB * 8 * Ep

        SUB = 8   # particle rows per block; kernel loops over them

        def kernel(tab_ref, e_ref, dx_ref, dy_ref, out_ref):
            tab = tab_ref[:]
            for r in range(SUB):
                idx = e_ref[r:r + 1]            # (1, Ep)
                idxb = jnp.broadcast_to(idx, (16, Ep))
                g = jnp.take_along_axis(tab, idxb, axis=1,
                                        mode="promise_in_bounds")  # (16, Ep)
                dx = dx_ref[r:r + 1]
                dy = dy_ref[r:r + 1]
                l1 = g[0:1] * dx + g[1:2] * dy + g[2:3]
                l2 = g[3:4] * dx + g[4:5] * dy + g[5:6]
                w0 = 1.0 - l1 - l2
                inside = (w0 >= -1e-6) & (l1 >= -1e-6) & (l2 >= -1e-6)
                wmin = jnp.minimum(w0, l1)
                kmin = jnp.where(w0 <= l1, 0, 1)
                kmin = jnp.where(l2 < wmin, 2, kmin)
                nf = jnp.where(kmin == 0, g[6:7],
                               jnp.where(kmin == 1, g[7:8], g[8:9]))
                nxt = nf.astype(jnp.int32)
                out_ref[r:r + 1] = jnp.where(inside | (nxt < 0), idx, nxt)

        def pallas_step(e, dx, dy):
            def pad(a, fill):
                return jnp.concatenate(
                    [a, jnp.full((Npad - N,), fill, a.dtype)]
                ).reshape(NB * 8, Ep)
            out = pl.pallas_call(
                kernel,
                grid=(NB,),
                in_specs=[
                    pl.BlockSpec((16, Ep), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, Ep), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, Ep), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, Ep), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, Ep), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NB * 8, Ep), jnp.int32),
            )(tab_j, pad(e, 0), pad(dx, 0.0), pad(dy, 0.0))
            return out.reshape(Npad)[:N]

        # correctness vs the plain XLA step on a small slice
        def ref_step(e, dx, dy):
            g = jnp.asarray(aff)[e]
            l1 = g[:, 0] * dx + g[:, 1] * dy + g[:, 2]
            l2 = g[:, 3] * dx + g[:, 4] * dy + g[:, 5]
            w0 = 1.0 - l1 - l2
            inside = (w0 >= -1e-6) & (l1 >= -1e-6) & (l2 >= -1e-6)
            wmin = jnp.minimum(w0, l1)
            kmin = jnp.where(w0 <= l1, 0, 1)
            kmin = jnp.where(l2 < wmin, 2, kmin)
            nf = jnp.where(kmin == 0, g[:, 6],
                           jnp.where(kmin == 1, g[:, 7], g[:, 8]))
            nxt = nf.astype(jnp.int32)
            return jnp.where(inside | (nxt < 0), e, nxt)

        try:
            got = jax.device_get(pallas_step(elem0, dx0, dy0))[:100_000]
            want = jax.device_get(jax.jit(ref_step)(
                elem0[:100_000], dx0[:100_000], dy0[:100_000]))
            ok = (got == want).all()
            print(f"pallas dynamic_gather correctness: {ok}", flush=True)
            if ok:
                timeit("walk pass [pallas dyn_gather]",
                       make_loop(pallas_step), elem0, dx0, dy0)
        except Exception as ex:  # noqa: BLE001
            import traceback
            traceback.print_exc(limit=3)
            print(f"pallas dyn_gather FAILED: {type(ex).__name__}", flush=True)

    if "locator" in variants:
        from pumipic_tpu.mesh.locator import build_locator_grid
        from pumipic_tpu.models.pseudo_xgcm import (
            XGCmConfig, GyroConfig, seed_particles_per_element,
            uniform_points_in_elements,
        )
        from pumipic_tpu.ops import push as push_ops
        from pumipic_tpu.ops import search as search_ops

        cfg = XGCmConfig(
            num_ptcls=N,
            mdl_face=max(int(np.asarray(mesh.class_id).max()) // 2, 2),
            deg_per_push=15.0, max_search_iters=64, gyro=GyroConfig(),
        )
        r2 = np.random.default_rng(1024 * 1024)
        ppe = seed_particles_per_element(mesh, cfg, r2)
        elems = np.repeat(np.arange(mesh.nelems), ppe)
        pos = uniform_points_in_elements(
            mesh, elems, np.random.default_rng(512 * 512))
        phi, b = push_ops.elliptical_setup(jnp.asarray(pos), cfg.h, cfg.k, cfg.d)
        x0 = jnp.asarray(pos[:, 0], jnp.float32)
        x1 = jnp.asarray(pos[:, 1], jnp.float32)
        phi = phi.astype(jnp.float32)
        b = b.astype(jnp.float32)
        elem = jnp.asarray(elems, jnp.int32)
        active = jnp.ones(len(elems), bool)

        def push(x0, x1, phi, elem):
            cid = mesh.class_id[jnp.maximum(elem, 0)]
            return push_ops.elliptical_push_components(
                phi, b, cid, cfg.deg_per_push, cfg.h, cfg.k, cfg.d)

        for cpe in (4.0, 16.0, 64.0):
            loc = build_locator_grid(
                np.asarray(mesh.coords), np.asarray(mesh.elem2verts),
                cells_per_elem=cpe)
            tx, ty, _ = jax.jit(push)(x0, x1, phi, elem)
            r1 = search_ops.search_mesh_2d_accel(
                mesh, loc, (x0, x1), (tx, ty), elem, active, 1, widths=())
            u = int(jax.device_get(jnp.sum(active & (r1.elem_ids < 0))))
            print(f"cpe={cpe}: survivors after 1 pass: {u} ({u/N:.3%})",
                  flush=True)

            @jax.jit
            def step(s, _loc=loc):
                x0, x1, phi, elem, active = s
                tx, ty, phi_new = push(x0, x1, phi, elem)
                res = search_ops.search_mesh_2d_accel(
                    mesh, _loc, (x0, x1), (tx, ty), elem, active, 64)
                return (res.dest_c[0], res.dest_c[1], phi_new, res.elem_ids,
                        active & (res.elem_ids >= 0)), res.iters

            s = (x0, x1, phi, elem, active)
            out, it = step(s)
            jax.block_until_ready(out)
            s = out
            t0 = time.perf_counter()
            for _ in range(5):
                s, it = step(s)
            jax.block_until_ready(s[0])
            dt = (time.perf_counter() - t0) / 5 * 1e3
            print(f"cpe={cpe}: push+search {dt:8.2f} ms "
                  f"iters={int(jax.device_get(it))}", flush=True)


if __name__ == "__main__":
    main()
