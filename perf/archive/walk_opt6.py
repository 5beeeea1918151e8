"""Dispatch-overhead quantification: python-loop step calls vs one
jit(fori_loop) over the same step (the production stepping shape)."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from pumipic_tpu.mesh.locator import build_locator_grid
from pumipic_tpu.models.pseudo_xgcm import (
    XGCmConfig, GyroConfig, make_default_mesh, build_gyro_mappings,
    seed_particles_per_element, uniform_points_in_elements,
)
from pumipic_tpu.ops import push as push_ops
from pumipic_tpu.ops import scatter as scatter_ops
from pumipic_tpu.ops import search as search_ops

N = 10_000_000
K = 10

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
state = (
    jnp.asarray(pos[:, 0], jnp.float32), jnp.asarray(pos[:, 1], jnp.float32),
    phi.astype(jnp.float32), jnp.asarray(elems, jnp.int32),
    jnp.ones(len(elems), bool),
)
bb = b.astype(jnp.float32)
loc = build_locator_grid(np.asarray(mesh.coords), np.asarray(mesh.elem2verts))
gyro_fwd, gyro_bwd = build_gyro_mappings(mesh, cfg.gyro)
gyro = cfg.gyro

def step(s):
    x0, x1, phi, elem, active = s
    cid = mesh.class_id[jnp.maximum(elem, 0)]
    tx, ty, phi_new = push_ops.elliptical_push_components(
        phi, bb, cid, cfg.deg_per_push, cfg.h, cfg.k, cfg.d)
    res = search_ops.search_mesh_2d_accel(
        mesh, loc, (x0, x1), (tx, ty), elem, active, cfg.max_search_iters)
    act = active & (res.elem_ids >= 0)
    ring = scatter_ops.accumulate_to_rings(
        res.elem_ids, act, mesh.elem2verts, mesh.nverts,
        gyro.num_rings, gyro.rmax)
    fwd = scatter_ops.scatter_to_mapped_verts(
        ring, gyro_fwd, mesh.nverts, gyro.num_rings, gyro.points_per_ring)
    bwd = scatter_ops.scatter_to_mapped_verts(
        ring, gyro_bwd, mesh.nverts, gyro.num_rings, gyro.points_per_ring)
    return (res.dest_c[0], res.dest_c[1], phi_new, res.elem_ids, act), fwd, bwd

step_j = jax.jit(step)

@jax.jit
def steps_fused(s):
    def body(i, carry):
        s, _, _ = carry
        return step(s)
    return jax.lax.fori_loop(0, K, body, (s, jnp.zeros(mesh.nverts),
                                          jnp.zeros(mesh.nverts)))

# python-loop
out = step_j(state); jax.block_until_ready(out[1])
s = out[0]
t0 = time.perf_counter()
for _ in range(K):
    s, fwd, bwd = step_j(s)
jax.block_until_ready(fwd)
print(f"python-loop: {(time.perf_counter()-t0)/K*1e3:8.2f} ms/step "
      f"alive={int(jax.device_get(s[4].sum()))}", flush=True)

# fused fori
out = steps_fused(state); jax.block_until_ready(out[1])
s2 = out[0]
t0 = time.perf_counter()
out = steps_fused(s2)
jax.block_until_ready(out[1])
print(f"fori-fused:  {(time.perf_counter()-t0)/K*1e3:8.2f} ms/step "
      f"alive={int(jax.device_get(out[0][4].sum()))}", flush=True)
