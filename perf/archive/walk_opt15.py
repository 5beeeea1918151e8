"""Compaction, round 3: honest sort/extraction micros + two alternatives
in-pipeline:

  (i) two-stage group prefilter: 8-slot groups -> sort surviving group ids
      (1.25M u32) -> expand x8 -> final stable sort (3.2M u32);
  (c) cumsum-table + fixed-round binary-search gather (sort-free).

Both bit-equal to _compact_idx.
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
from pumipic_tpu.ops.search import _compact_idx

N = 10_000_000
K = 5
G = 8                      # group size for the two-stage variant
BLK = 8192                 # block size for the binary-search variant

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


def compact_binsearch(done, m):
    n = done.shape[0]
    nb = -(-n // BLK)
    pad = nb * BLK - n
    keep = jnp.pad(~done, (0, pad), constant_values=False).reshape(nb, BLK)
    cum = jnp.cumsum(keep, axis=1, dtype=jnp.int32)    # (nb, BLK)
    cnt = cum[:, -1]
    off = jnp.cumsum(cnt) - cnt
    total = off[-1] + cnt[-1]
    marks = jnp.zeros((m,), jnp.int32).at[jnp.minimum(off, m)].add(
        1, mode="drop")
    b = jnp.cumsum(marks) - 1                          # block per output
    j = jnp.arange(m, dtype=jnp.int32)
    r = j - off[b] + 1                                 # target rank in block
    cum_flat = cum.reshape(-1)
    lo = jnp.zeros((m,), jnp.int32)
    hi = jnp.full((m,), BLK - 1, jnp.int32)

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) >> 1
        v = cum_flat[b * BLK + mid]
        go_hi = v < r
        return (jnp.where(go_hi, mid + 1, lo), jnp.where(go_hi, hi, mid))

    lo, hi = jax.lax.fori_loop(0, 13, body, (lo, hi))  # 2^13 = BLK
    gid = b * BLK + lo
    return jnp.where(j < total, gid, n)


done_np = np.random.default_rng(3).uniform(size=N) < 0.95
dj = jnp.asarray(done_np)
m = N // 16
a = jax.device_get(jax.jit(lambda: _compact_idx(dj, m))())
for nm, fn in [("binsearch", compact_binsearch)]:
    v = jax.device_get(jax.jit(lambda fn=fn: fn(dj, m))())
    print(f"{nm} equal: {bool((a == v).all())}", flush=True)


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


# honest sort micros (input re-derived per iteration from rolled bits)
def sort_micro(dtype, n_):
    base = jnp.asarray(
        np.random.default_rng(5).integers(0, 1 << 24, n_, np.int64)
    ).astype(dtype)

    def stepf(s):
        x, acc = s
        x = jnp.roll(x, 1)
        sk = jnp.sort(x)
        return (x, acc + sk[0].astype(jnp.int32))
    return stepf, (base, jnp.int32(0))


for nm, dt_, n_ in [("sort u32 10M", jnp.uint32, N),
                    ("sort u32 3.2M", jnp.uint32, 3_200_000),
                    ("sort u32 1.25M", jnp.uint32, 1_250_000)]:
    f, s = sort_micro(dt_, n_)
    timeit(nm, f, s, k=10)


def mk_mi(max_iters, widths):
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


orig = search_ops._compact_idx
timeit("prod pack_u32 (w=N/16,N/256,1024)",
       mk_mi(64, (N // 16, N // 256, 1024)), S0)
search_ops._compact_idx = compact_binsearch
timeit("prod binsearch (w+32 retrace)",
       mk_mi(64, (N // 16 + 32, N // 256, 1024)), S0)
search_ops._compact_idx = orig
