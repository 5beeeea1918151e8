"""Precise in-jit component attribution: every stage measured as a
fori-fused 10-iteration loop (no dispatch noise)."""
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
phi0, b0 = push_ops.elliptical_setup(jnp.asarray(pos), cfg.h, cfg.k, cfg.d)
S0 = (
    jnp.asarray(pos[:, 0], jnp.float32), jnp.asarray(pos[:, 1], jnp.float32),
    phi0.astype(jnp.float32), jnp.asarray(elems, jnp.int32),
    jnp.ones(len(elems), bool),
)
bb = b0.astype(jnp.float32)
loc = build_locator_grid(np.asarray(mesh.coords), np.asarray(mesh.elem2verts))
gyro_fwd, gyro_bwd = build_gyro_mappings(mesh, cfg.gyro)
gyro = cfg.gyro


def push(s):
    x0, x1, phi, elem, active = s
    cid = mesh.class_id[jnp.maximum(elem, 0)]
    tx, ty, phi_new = push_ops.elliptical_push_components(
        phi, bb, cid, cfg.deg_per_push, cfg.h, cfg.k, cfg.d)
    return tx, ty, phi_new


def make(kind, widths=None, max_iters=64):
    def one(s):
        x0, x1, phi, elem, active = s
        tx, ty, phi_new = push(s)
        if kind == "push":
            return (tx, ty, phi_new, elem, active)
        if kind == "guess":
            g = loc.guess((tx, ty))
            return (tx, ty, phi_new, jnp.where(active, g, elem), active)
        res = search_ops.search_mesh_2d_accel(
            mesh, loc, (x0, x1), (tx, ty), elem, active, max_iters,
            widths=widths)
        act = active & (res.elem_ids >= 0)
        s2 = (res.dest_c[0], res.dest_c[1], phi_new, res.elem_ids, act)
        if kind == "search":
            return s2
        ring = scatter_ops.accumulate_to_rings(
            res.elem_ids, act, mesh.elem2verts, mesh.nverts,
            gyro.num_rings, gyro.rmax)
        fwd = scatter_ops.scatter_to_mapped_verts(
            ring, gyro_fwd, mesh.nverts, gyro.num_rings, gyro.points_per_ring)
        bwd = scatter_ops.scatter_to_mapped_verts(
            ring, gyro_bwd, mesh.nverts, gyro.num_rings, gyro.points_per_ring)
        return (res.dest_c[0] + 0 * fwd[0], res.dest_c[1] + 0 * bwd[0],
                phi_new, res.elem_ids, act)

    @jax.jit
    def loop(s):
        return jax.lax.fori_loop(0, K, lambda i, s: one(s), s)

    return loop


for name, fn in (
    ("push", make("push")),
    ("push+guess", make("guess")),
    ("search iters=1 widths=()", make("search", (), 1)),
    ("search iters=2 widths=()", make("search", (), 2)),
    ("search default", make("search")),
    ("full", make("full")),
):
    s = fn(S0)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s = fn(s)
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:30s} {dt:8.2f} ms/step "
          f"alive={int(jax.device_get(s[4].sum()))}", flush=True)
