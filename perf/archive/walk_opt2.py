"""Round-2 TPU experiments, part 2: pallas lane-gather (fixed block), complex
row packing, and REAL grid-accelerated search with pyramid-width variants.

Usage:  PYTHONPATH=/root/repo python perf/walk_opt2.py [variant ...]
Variants: pallas complex real
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 10_000_000
T = 20


def timeit(name, fn, *args, iters=T):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:34s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    variants = sys.argv[1:] or ["pallas", "complex", "real"]
    from pumipic_tpu.models.pseudo_xgcm import make_default_mesh

    mesh = make_default_mesh(24_000)
    E = mesh.nelems
    print(f"mesh E={E} N={N}", flush=True)

    rng = np.random.default_rng(0)
    elem0 = jnp.asarray(rng.integers(0, E, N), jnp.int32)
    dx0 = jnp.asarray(rng.uniform(-1, 1, N), jnp.float32)
    dy0 = jnp.asarray(rng.uniform(-1, 1, N), jnp.float32)
    aff = np.asarray(mesh.walk_geom)  # affine layout now

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

    if "pallas" in variants:
        try:
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            Ep = ((E + 127) // 128) * 128
            tab = np.zeros((16, Ep), np.float32)
            tab[:12, :E] = aff.T
            tab_j = jnp.asarray(tab)
            SUB, LAN = 8, 2048                  # block (8, 2048)
            B = SUB * LAN
            N2 = (N // B) * B                   # trim to a block multiple

            def kernel(tab_ref, e_ref, dx_ref, dy_ref, out_ref):
                idx = e_ref[:].reshape(1, B)
                idxb = jnp.broadcast_to(idx, (16, B))
                g = jnp.take_along_axis(tab_ref[:], idxb, axis=1)  # (16, B)
                dx = dx_ref[:].reshape(1, B)
                dy = dy_ref[:].reshape(1, B)
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
                out_ref[:] = jnp.where(inside | (nxt < 0), idx,
                                       nxt).reshape(SUB, LAN)

            def pallas_step(e, dx, dy):
                grid = N2 // B
                out = pl.pallas_call(
                    kernel,
                    grid=(grid,),
                    in_specs=[
                        pl.BlockSpec((16, Ep), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((SUB, LAN), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((SUB, LAN), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((SUB, LAN), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((SUB, LAN), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((grid * SUB, LAN),
                                                   jnp.int32),
                )(tab_j, e[:N2].reshape(grid * SUB, LAN),
                  dx[:N2].reshape(grid * SUB, LAN),
                  dy[:N2].reshape(grid * SUB, LAN)).reshape(N2)
                return jnp.concatenate([out, e[N2:]])

            timeit(f"walk pass [pallas {SUB}x{LAN}]", make_loop(pallas_step),
                   elem0, dx0, dy0)
        except Exception as ex:  # noqa: BLE001
            print(f"walk pass [pallas] FAILED: {type(ex).__name__}: {ex}",
                  flush=True)

    if "complex" in variants:  # complex64 is UNIMPLEMENTED on this backend
        # row: 3 complex cols [a11+i*a21, a12+i*a22, c1+i*c2] + 3 float nbr
        cz = (aff[:, 0:3] + 1j * aff[:, 3:6]).astype(np.complex64)
        cz_j = jnp.asarray(cz)
        nbr_j = jnp.asarray(aff[:, 6:9].copy())

        def step_complex(e, dx, dy):
            gc = cz_j[e]                                     # (N, 3) c64
            l = gc[:, 0] * dx + gc[:, 1] * dy + gc[:, 2]
            l1, l2 = jnp.real(l), jnp.imag(l)
            w0 = 1.0 - l1 - l2
            inside = (w0 >= -1e-6) & (l1 >= -1e-6) & (l2 >= -1e-6)
            wmin = jnp.minimum(w0, l1)
            kmin = jnp.where(w0 <= l1, 0, 1)
            kmin = jnp.where(l2 < wmin, 2, kmin)
            exit_local = (kmin + 1) % 3
            gn = nbr_j[e]
            nf = jnp.where(exit_local == 0, gn[:, 0],
                           jnp.where(exit_local == 1, gn[:, 1], gn[:, 2]))
            nxt = nf.astype(jnp.int32)
            return jnp.where(inside | (nxt < 0), e, nxt)

        try:
            timeit("walk pass [complex]", make_loop(step_complex),
                   elem0, dx0, dy0)
        except Exception as ex:  # noqa: BLE001
            print(f"walk pass [complex] FAILED: {type(ex).__name__}: {ex}",
                  flush=True)

    if "real" in variants:
        from pumipic_tpu.mesh.locator import build_locator_grid
        from pumipic_tpu.ops import search as search_ops

        grid = build_locator_grid(
            np.asarray(mesh.coords), np.asarray(mesh.elem2verts)
        )
        # realistic start: random annulus points, located once
        r = np.sqrt(rng.uniform(0.3**2, 1.0**2, N))
        th = rng.uniform(0, 2 * np.pi, N)
        px = jnp.asarray(r * np.cos(th), jnp.float32)
        py = jnp.asarray(r * np.sin(th), jnp.float32)
        act = jnp.ones((N,), bool)
        res0 = search_ops.search_mesh_2d_accel(
            mesh, grid, (px, py), (px, py), jnp.zeros((N,), jnp.int32), act, 64
        )
        elem = jnp.where(res0.elem_ids >= 0, res0.elem_ids, 0)
        jax.block_until_ready(elem)
        # per-particle rotation angle ~ elliptical push at deg_per_push=15
        ang = jnp.asarray(
            np.deg2rad(rng.uniform(3.0, 15.0, N)), jnp.float32
        )
        ca, sa = jnp.cos(ang), jnp.sin(ang)

        def rot(x, y):
            return ca * x - sa * y, sa * x + ca * y

        # survivors after ONE accel pass (pyramid design input)
        tx, ty = rot(px, py)
        r1 = search_ops.search_mesh_2d_accel(
            mesh, grid, (px, py), (tx, ty), elem, act, 1, widths=())
        undone1 = int(jax.device_get(jnp.sum(act & (r1.elem_ids < 0))))
        for it in (2, 3):
            rk = search_ops.search_mesh_2d_accel(
                mesh, grid, (px, py), (tx, ty), elem, act, it, widths=())
            u = int(jax.device_get(jnp.sum(act & (rk.elem_ids < 0))))
            print(f"survivors after {it} passes: {u} ({u/N:.3%})", flush=True)
        print(f"survivors after 1 pass: {undone1} ({undone1/N:.3%})",
              flush=True)

        for widths in (None,
                       (N // 4, N // 32, 2048),
                       (N // 2, N // 8, N // 64, 2048),
                       (N // 4, N // 16, N // 64, 2048),
                       (N // 8, N // 64, 2048)):
            def run(e, x, y, _w=widths):
                tx, ty = rot(x, y)
                res = search_ops.search_mesh_2d_accel(
                    mesh, grid, (x, y), (tx, ty), e, act, 64, widths=_w)
                e2 = jnp.where(res.elem_ids >= 0, res.elem_ids, 0)
                return e2, res.dest_c[0], res.dest_c[1], res.iters

            # evolve state across calls (honest timing)
            e, x, y = elem, px, py
            e, x, y, _ = run(e, x, y)  # warmup/compile
            jax.block_until_ready(e)
            t0 = time.perf_counter()
            K = 5
            for _ in range(K):
                e, x, y, its = run(e, x, y)
            jax.block_until_ready(e)
            dt = (time.perf_counter() - t0) / K * 1e3
            print(f"real search widths={widths}: {dt:8.2f} ms "
                  f"iters={int(jax.device_get(its))}", flush=True)


if __name__ == "__main__":
    main()
