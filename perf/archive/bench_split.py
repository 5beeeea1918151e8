"""Component-split timing of the flagship 10M step on one chip.

Measures, in ONE process with evolving state: (a) push only, (b) push +
accel search, (c) the full step (push + search + deposition ×2).  The
differences give per-component costs driving optimization priorities
(docs/PERFORMANCE.md).

Usage: PYTHONPATH=/root/repo [N=10000000] python perf/bench_split.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from pumipic_tpu.mesh.locator import build_locator_grid
from pumipic_tpu.models.pseudo_xgcm import (
    GyroConfig, XGCmConfig, build_gyro_mappings, make_default_mesh,
    seed_particles_per_element, uniform_points_in_elements,
)
from pumipic_tpu.ops import push as push_ops
from pumipic_tpu.ops import scatter as scatter_ops
from pumipic_tpu.ops import search as search_ops

N = int(os.environ.get("N", 10_000_000))
ITERS = int(os.environ.get("ITERS", 10))


def main():
    mesh = make_default_mesh(24_000)
    cfg = XGCmConfig(
        num_ptcls=N, mdl_face=max(int(np.asarray(mesh.class_id).max()) // 2, 2),
        deg_per_push=15.0, max_search_iters=64, gyro=GyroConfig(),
    )
    rng = np.random.default_rng(1024 * 1024)
    ppe = seed_particles_per_element(mesh, cfg, rng)
    elems = np.repeat(np.arange(mesh.nelems), ppe)
    pos = uniform_points_in_elements(mesh, elems, np.random.default_rng(512 * 512))
    phi, b = push_ops.elliptical_setup(jnp.asarray(pos), cfg.h, cfg.k, cfg.d)
    state = {
        "x0": jnp.asarray(pos[:, 0], jnp.float32),
        "x1": jnp.asarray(pos[:, 1], jnp.float32),
        "cphi": jnp.cos(phi).astype(jnp.float32),
        "sphi": jnp.sin(phi).astype(jnp.float32),
        "b": b.astype(jnp.float32),
        "elem": jnp.asarray(elems, jnp.int32),
        "active": jnp.ones(len(elems), bool),
    }
    locator = build_locator_grid(np.asarray(mesh.coords),
                                 np.asarray(mesh.elem2verts),
                                 walk_geom=mesh.walk_geom)
    rot_table = push_ops.elliptical_rot_table(mesh.class_id, cfg.deg_per_push)
    gyro_fwd, gyro_bwd = build_gyro_mappings(mesh, cfg.gyro)
    gyro = cfg.gyro

    def push_part(s):
        tx, ty, c2, s2 = push_ops.elliptical_push_rot(
            s["cphi"], s["sphi"], s["b"], s["elem"], rot_table,
            cfg.h, cfg.k, cfg.d
        )
        a = s["active"]
        return (jnp.where(a, tx, s["x0"]), jnp.where(a, ty, s["x1"]),
                jnp.where(a, c2, s["cphi"]), jnp.where(a, s2, s["sphi"]))

    @jax.jit
    def step_push(s):
        tx, ty, c2, s2 = push_part(s)
        # evolve state so the relay can't cache (positions march)
        return {**s, "x0": tx, "x1": ty, "cphi": c2, "sphi": s2}

    @jax.jit
    def step_search(s):
        tx, ty, c2, s2 = push_part(s)
        res = search_ops.search_mesh_2d_accel(
            mesh, locator, (s["x0"], s["x1"]), (tx, ty), s["elem"],
            s["active"], cfg.max_search_iters,
        )
        return {**s, "x0": res.dest_c[0], "x1": res.dest_c[1],
                "cphi": c2, "sphi": s2, "elem": res.elem_ids,
                "active": s["active"] & (res.elem_ids >= 0)}, res.iters

    @jax.jit
    def step_full(s):
        s2, iters = step_search(s)
        ring = scatter_ops.accumulate_to_rings(
            s2["elem"], s2["active"], mesh.elem2verts, mesh.nverts,
            gyro.num_rings, gyro.rmax,
        )
        fwd = scatter_ops.scatter_to_mapped_verts(
            ring, gyro_fwd, mesh.nverts, gyro.num_rings, gyro.points_per_ring)
        bwd = scatter_ops.scatter_to_mapped_verts(
            ring, gyro_bwd, mesh.nverts, gyro.num_rings, gyro.points_per_ring)
        return s2, fwd, bwd, iters

    def measure(name, fn, s):
        out = fn(s)
        jax.block_until_ready(out)
        s2 = out[0] if isinstance(out, tuple) else out
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(s2)
            s2 = out[0] if isinstance(out, tuple) else out
        jax.block_until_ready(s2["x0"])
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        extra = ""
        if isinstance(out, tuple) and len(out) >= 2:
            it = out[-1]
            extra = f" iters={int(jax.device_get(it))}"
            alive = int(jax.device_get(s2['active'].sum()))
            extra += f" alive={alive}"
        print(f"{name:16s} {dt:8.2f} ms/step{extra}", flush=True)
        return dt

    t_push = measure("push only", step_push, state)
    t_search = measure("push+search", step_search, state)
    t_full = measure("full step", step_full, state)
    print(f"-> search = {t_search - t_push:.1f} ms, "
          f"deposit = {t_full - t_search:.1f} ms, push = {t_push:.1f} ms")


if __name__ == "__main__":
    main()
