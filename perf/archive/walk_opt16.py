"""Deposition histogram: sorted u16 vs one-hot MXU matmul at 10M keys."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from pumipic_tpu.models.pseudo_xgcm import (
    XGCmConfig, GyroConfig, make_default_mesh, build_gyro_mappings,
    seed_particles_per_element, uniform_points_in_elements,
)
from pumipic_tpu.ops import scatter as scatter_ops

N = 10_000_000
K = 10

mesh = make_default_mesh(24_000)
E = mesh.nelems
cfg = XGCmConfig(
    num_ptcls=N, mdl_face=max(int(np.asarray(mesh.class_id).max()) // 2, 2))
rng = np.random.default_rng(1024 * 1024)
ppe = seed_particles_per_element(mesh, cfg, rng)
elems = jnp.asarray(np.repeat(np.arange(mesh.nelems), ppe), jnp.int32)
active = jnp.ones(elems.shape[0], bool)
gyro_fwd, gyro_bwd = build_gyro_mappings(mesh, GyroConfig())
gyro = GyroConfig()


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


def h_sorted(s):
    e, acc = s
    key = jnp.where(e < E, e, E)
    c = scatter_ops.count_per_key(key, E).astype(jnp.float32)
    return (jnp.roll(e, 1), acc + c[0])


def h_matmul(s):
    e, acc = s
    key = jnp.where(e < E, e, E)
    c = scatter_ops.count_per_key_matmul(key, E)
    return (jnp.roll(e, 1), acc + c[0])


# exactness at 10M on TPU
c1 = jax.jit(lambda e: scatter_ops.count_per_key(e, E))(elems)
c2 = jax.jit(lambda e: scatter_ops.count_per_key_matmul(e, E))(elems)
print("exact at 10M:", bool(jnp.all(c1.astype(jnp.float32) == c2)), flush=True)

timeit("hist sorted-u16", h_sorted, (elems, jnp.float32(0)))
timeit("hist one-hot matmul (lo=128)", h_matmul, (elems, jnp.float32(0)))


def full_dep(counts_fn):
    def stepf(s):
        e, acc = s
        ring = scatter_ops.accumulate_to_rings(
            e, active, mesh.elem2verts, mesh.nverts, gyro.num_rings,
            gyro.rmax)
        fwd = scatter_ops.scatter_to_mapped_verts(
            ring, gyro_fwd, mesh.nverts, gyro.num_rings, gyro.points_per_ring)
        bwd = scatter_ops.scatter_to_mapped_verts(
            ring, gyro_bwd, mesh.nverts, gyro.num_rings, gyro.points_per_ring)
        return (jnp.roll(e, 1), acc + fwd[0] + bwd[0])
    return stepf


timeit("full deposit (current)", full_dep(None), (elems, jnp.float32(0)))


# table-size scaling of a 14-col row gather at 10M indices: is there a
# fast-table threshold (VMEM residency)?
for rows in (24_000, 96_000, 192_000, 384_000):
    tbl = jnp.asarray(
        np.random.default_rng(7).normal(size=(rows, 14)).astype(np.float32))
    idx0 = jnp.asarray(
        np.random.default_rng(8).integers(0, rows, N), jnp.int32)

    def g_step(s, tbl=tbl, rows=rows):
        c, acc = s
        g = tbl[c]
        acc = acc + g[:, 0] + g[:, 13]
        c = jnp.where(c + 1 < rows, c + 1, 0)
        return (c, acc)

    timeit(f"gather ({rows}x14) {rows * 56 / 1e6:.1f} MB", g_step,
           (idx0, jnp.float32(0)))


# does index locality help big-table gathers? (round-1 said no — retest with
# the honest fori-fused method; if yes, periodic particle reordering pays)
rows = 384_000
tbl = jnp.asarray(
    np.random.default_rng(7).normal(size=(rows, 14)).astype(np.float32))
r = np.random.default_rng(9)
idx_rand = jnp.asarray(r.integers(0, rows, N), jnp.int32)
idx_sort = jnp.sort(idx_rand)
# clustered: sorted blocks of 1024 (the post-reorder drift pattern)
blk = np.sort(np.asarray(idx_rand).reshape(-1, 1024), axis=1)
idx_blk = jnp.asarray(blk.reshape(-1))

for nm, idx in (("random", idx_rand), ("sorted", idx_sort),
                ("block-sorted-1k", idx_blk)):
    def g_step(s, idx=idx):
        c, acc = s
        g = tbl[jnp.minimum(idx + c, rows - 1)]
        acc = acc + g[:, 0] + g[:, 13]
        return (jnp.where(c + 1 < 7, c + 1, 0), acc)

    timeit(f"gather 384kx14 idx={nm}", g_step,
           (jnp.int32(0), jnp.zeros((N,), jnp.float32)))
