"""Locator resolution vs the fast-table cliff: cpe8 (10.7 MB, fast gathers,
8% miss) vs cpe16 (21.5 MB, slow gathers, 4.6% miss), two pyramids each."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from pumipic_tpu.mesh.locator import build_locator_grid
from pumipic_tpu.models.pseudo_xgcm import (
    XGCmConfig, GyroConfig, make_default_mesh,
    seed_particles_per_element, uniform_points_in_elements,
)
from pumipic_tpu.ops import push as push_ops
from pumipic_tpu.ops import search as search_ops

N = 10_000_000
K = 5

mesh = make_default_mesh(24_000)
cfg = XGCmConfig(
    num_ptcls=N, mdl_face=max(int(np.asarray(mesh.class_id).max()) // 2, 2),
    deg_per_push=15.0, max_search_iters=64, gyro=GyroConfig(),
)
rng = np.random.default_rng(1024 * 1024)
ppe = seed_particles_per_element(mesh, cfg, rng)
elems = np.repeat(np.arange(mesh.nelems), ppe)
pos = uniform_points_in_elements(mesh, elems, np.random.default_rng(512 * 512))
phi0, b0 = push_ops.elliptical_setup(jnp.asarray(pos), cfg.h, cfg.k, cfg.d)
bb = b0.astype(jnp.float32)
rot = push_ops.elliptical_rot_table(mesh.class_id, cfg.deg_per_push)

S0 = (
    jnp.asarray(pos[:, 0], jnp.float32), jnp.asarray(pos[:, 1], jnp.float32),
    jnp.cos(phi0).astype(jnp.float32), jnp.sin(phi0).astype(jnp.float32),
    jnp.asarray(elems, jnp.int32), jnp.ones(len(elems), bool),
)

loc8 = build_locator_grid(np.asarray(mesh.coords), np.asarray(mesh.elem2verts),
                          cells_per_elem=8.0, walk_geom=mesh.walk_geom)
loc16 = build_locator_grid(np.asarray(mesh.coords), np.asarray(mesh.elem2verts),
                           cells_per_elem=16.0, walk_geom=mesh.walk_geom)


def timeit(name, step_fn, s0, k=K):
    @jax.jit
    def loop(s):
        return jax.lax.fori_loop(0, k, lambda i, s: step_fn(s), s)

    out = loop(s0); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(out); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / k * 1e3
    print(f"{name:56s} {dt:8.2f} ms/iter", flush=True)
    return dt


def mk(loc, widths):
    def stepf(s):
        x0, x1, cphi, sphi, elem, active = s
        tx, ty, c2, s2 = push_ops.elliptical_push_rot(
            cphi, sphi, bb, elem, rot, cfg.h, cfg.k, cfg.d)
        xt = (jnp.where(active, tx, x0), jnp.where(active, ty, x1))
        res = search_ops.search_mesh_2d_accel(
            mesh, loc, (x0, x1), xt, elem, active, 64, widths=widths)
        act = active & (res.elem_ids >= 0)
        return (xt[0], xt[1], jnp.where(active, c2, cphi),
                jnp.where(active, s2, sphi), res.elem_ids, act)
    return stepf


timeit("cpe16 W=(N/16,N/256,1024) [control]",
       mk(loc16, (N // 16, N // 256, 1024)), S0)
timeit("cpe8  W=(N/8,N/128,1024)", mk(loc8, (N // 8, N // 128, 1024)), S0)
timeit("cpe8  W=(N/16,N/256,1024)", mk(loc8, (N // 16, N // 256, 1024)), S0)
timeit("cpe8  W=(N/8,N/64,1024)", mk(loc8, (N // 8, N // 64, 1024)), S0)
