"""Pyramid re-tuning at cpe=16 survivor rates + guess cost after f32 fix."""
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

mesh = make_default_mesh(24_000)
cfg = XGCmConfig(
    num_ptcls=N, mdl_face=max(int(np.asarray(mesh.class_id).max()) // 2, 2),
    deg_per_push=15.0, max_search_iters=64, gyro=GyroConfig(),
)
r2 = np.random.default_rng(1024 * 1024)
ppe = seed_particles_per_element(mesh, cfg, r2)
elems = np.repeat(np.arange(mesh.nelems), ppe)
pos = uniform_points_in_elements(mesh, elems, np.random.default_rng(512 * 512))
phi, b = push_ops.elliptical_setup(jnp.asarray(pos), cfg.h, cfg.k, cfg.d)
x0 = jnp.asarray(pos[:, 0], jnp.float32)
x1 = jnp.asarray(pos[:, 1], jnp.float32)
phi = phi.astype(jnp.float32)
b = b.astype(jnp.float32)
elem = jnp.asarray(elems, jnp.int32)
active = jnp.ones(len(elems), bool)
loc = build_locator_grid(np.asarray(mesh.coords), np.asarray(mesh.elem2verts))

def push(x0, x1, phi, elem):
    cid = mesh.class_id[jnp.maximum(elem, 0)]
    return push_ops.elliptical_push_components(
        phi, b, cid, cfg.deg_per_push, cfg.h, cfg.k, cfg.d)

@jax.jit
def guess_only(a, c):
    g = loc.guess((a, c))
    return a * 0.999 + 0.001, c * 0.999, g

a, c = x0, x1
out = guess_only(a, c); jax.block_until_ready(out)
a, c, _ = out
t0 = time.perf_counter()
for _ in range(10):
    a, c, g = guess_only(a, c)
jax.block_until_ready(g)
print(f"guess-only (f32 idx, cpe16): {(time.perf_counter()-t0)/10*1e3:8.2f} ms",
      flush=True)

def variant(name, widths, max_iters=64):
    @jax.jit
    def step(s):
        x0, x1, phi, elem, active = s
        tx, ty, phi_new = push(x0, x1, phi, elem)
        res = search_ops.search_mesh_2d_accel(
            mesh, loc, (x0, x1), (tx, ty), elem, active,
            max_iters, widths=widths)
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
    print(f"{name:44s} {dt:8.2f} ms iters={int(jax.device_get(it))}", flush=True)

variant("push+search widths=() iters=1", (), 1)
variant("push+search widths=() iters=2", (), 2)
variant("push+search default (N/8,N/64,2048)", None)
variant("push+search (N//3, N//12, 2048)", (N // 3, N // 12, 2048))
variant("push+search (N//3, N//24, 4096)", (N // 3, N // 24, 4096))
variant("push+search (N//3, N//12, N//48, 2048)", (N // 3, N // 12, N // 48, 2048))
