"""Fine-grained search split after the 2-candidate peel landed.

Stages (all production code paths, fori-fused, evolving state):
  A: push + peel only            (max_iters=1, widths=())
  B: push + peel + 1 full pass   (max_iters=2, widths=())
  C: push + peel + compact@N/16 + 1 narrow pass (max_iters=2, widths=(N/16,))
  D: production                  (max_iters=64, default pyramid)
Micro: 26-col cell-row gather vs 13-col vs plain (N,) gather.
"""
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
loc = build_locator_grid(np.asarray(mesh.coords), np.asarray(mesh.elem2verts),
                         walk_geom=mesh.walk_geom)
rot = push_ops.elliptical_rot_table(mesh.class_id, cfg.deg_per_push)

S0 = (
    jnp.asarray(pos[:, 0], jnp.float32), jnp.asarray(pos[:, 1], jnp.float32),
    jnp.cos(phi0).astype(jnp.float32), jnp.sin(phi0).astype(jnp.float32),
    jnp.asarray(elems, jnp.int32), jnp.ones(len(elems), bool),
)

# survivor rate after the 2-candidate peel
x0, x1, cphi, sphi, elem, active = S0
tx, ty, _, _ = push_ops.elliptical_push_rot(cphi, sphi, bb, elem, rot, 0., 0., 0.9)
res1 = search_ops.search_mesh_2d_accel(
    mesh, loc, (x0, x1), (jnp.where(active, tx, x0), jnp.where(active, ty, x1)),
    elem, active, 1, widths=())
surv = int(jax.device_get((res1.elem_ids < 0).sum()))
print(f"peel miss rate (2-candidate): {surv/N:.4f}  (N/16={1/16:.4f})",
      flush=True)


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


def mk(max_iters, widths):
    def stepf(s):
        x0, x1, cphi, sphi, elem, active = s
        tx, ty, c2, s2 = push_ops.elliptical_push_rot(
            cphi, sphi, bb, elem, rot, cfg.h, cfg.k, cfg.d)
        xt = (jnp.where(active, tx, x0), jnp.where(active, ty, x1))
        res = search_ops.search_mesh_2d_accel(
            mesh, loc, (x0, x1), xt, elem, active, max_iters, widths=widths)
        act = active & (res.elem_ids >= 0)
        return (xt[0], xt[1], jnp.where(active, c2, cphi),
                jnp.where(active, s2, sphi), res.elem_ids, act)
    return stepf


timeit("A push+peel (mi=1, widths=())", mk(1, ()), S0)
timeit("B push+peel+1 full pass (mi=2, widths=())", mk(2, ()), S0)
timeit("C push+peel+compact+1 narrow (mi=2, w=(N/16,))",
       mk(2, (N // 16,)), S0)
timeit("D production (mi=64, default)", mk(64, None), S0)
timeit("D2 production w=(N/16,N/256,1024)", mk(64, (N // 16, N // 256, 1024)),
       S0)

# gather micro: row width effect at 10M
rows26 = loc.cell_rows
rows13 = jnp.asarray(np.asarray(rows26)[:, :13].copy())
cell0 = loc.cell_of((x0, x1))


def g_mk(table, w):
    def stepf(s):
        c, acc = s
        g = table[c]
        acc = acc + g[:, 0] + g[:, w - 1]
        c = jnp.where(c + 1 < table.shape[0], c + 1, 0)  # no int mod (VPU)
        return (c, acc)
    return stepf


timeit("gather (n_cells,26) full row", g_mk(rows26, 26), (cell0, x0 * 0), k=10)
timeit("gather (n_cells,13) row", g_mk(rows13, 13), (cell0, x0 * 0), k=10)
