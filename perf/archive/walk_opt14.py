"""Compaction deep-dive: true in-pipeline cost + blocked-u16 with
cumsum-marks assembly (searchsorted-free).

walk_opt11 put peel+compact+narrow at 88 ms over the peel; the pack_u32
roll-micro said ~31.  This measures compaction truly in-pipeline and tries
a 2-pass-radix u16 blocked sort whose block-of-output assembly is a cheap
scatter+cumsum instead of a per-output searchsorted (which sank the
walk_opt12 variant).
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
BLK = 8192

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


def compact_blocked_cumsum(done, m):
    """Blocked u16 sort + scatter/cumsum block assembly; same contract as
    _compact_idx."""
    n = done.shape[0]
    nb = -(-n // BLK)
    pad = nb * BLK - n
    d = jnp.pad(done, (0, pad), constant_values=True).reshape(nb, BLK)
    widx = jnp.arange(BLK, dtype=jnp.uint16)
    key = jnp.where(d, jnp.uint16(1 << 15), jnp.uint16(0)) | widx
    sk = jnp.sort(key, axis=1)
    cnt = jnp.sum(~d, axis=1, dtype=jnp.int32)
    off = jnp.cumsum(cnt) - cnt
    # block id per output slot via start markers + cumsum (no searchsorted)
    marks = jnp.zeros((m,), jnp.int32).at[jnp.minimum(off, m)].add(
        1, mode="drop")
    b = jnp.cumsum(marks) - 1
    j = jnp.arange(m, dtype=jnp.int32)
    within = j - off[b]
    val = sk[b, within].astype(jnp.int32) & 0x7FFF
    gid = b * BLK + val
    total = off[-1] + cnt[-1]
    return jnp.where(j < total, gid, n)


# contract check
done_np = np.zeros(N, bool)
done_np[np.random.default_rng(3).uniform(size=N) < 0.95] = True
dj = jnp.asarray(done_np)
m = N // 16
a = jax.device_get(jax.jit(lambda: _compact_idx(dj, m))())
b2 = jax.device_get(jax.jit(lambda: compact_blocked_cumsum(dj, m))())
print("blocked-cumsum equal:", bool((a == b2).all()), flush=True)


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


W = (N // 16, N // 256, 1024)


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


timeit("A  peel only (mi=1)", mk_mi(1, ()), S0)
timeit("B  peel+compact+0 iters (mi=1, w=(N/16,))", mk_mi(1, (N // 16,)), S0)
timeit("C  peel+compact+narrow-til-done (w=(N/16,))", mk_mi(64, (N // 16,)),
       S0)
timeit("D  production (w=(N/16,N/256,1024))", mk_mi(64, W), S0)

# blocked-cumsum compactor in-pipeline: late-binding monkeypatch; widths
# perturbed (+64) so jit can't reuse the pack_u32-compiled executable
search_ops._compact_idx_orig = _compact_idx
search_ops._compact_idx = compact_blocked_cumsum
timeit("E  production + blocked-cumsum compaction",
       mk_mi(64, (N // 16 + 64, N // 256 + 64, 1024)), S0)
search_ops._compact_idx = search_ops._compact_idx_orig
