"""Gather cost model (width/dtype) + slim peel rows + blocked-u16 compaction.

After walk_opt11 found gather cost ~ 26 ms + 3.2 ms/column at 10M (NOT
width-insensitive as previously documented), this round: (a) fit the model
(width sweep, bf16), (b) slim the peel row to 14 cols by deferring the rare
peel miss to the pyramid instead of carrying neighbor columns, (c) replace
the 10M uint32 compaction sort with a blocked uint16 sort.
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
from pumipic_tpu.ops.search import (
    BCC_ABS_TOL, BCC_REL_TOL, INVALID, _make_step, _core_2d, remove_on_exit,
    _run_walk, _compact_idx,
)

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
E = mesh.nelems

S0 = (
    jnp.asarray(pos[:, 0], jnp.float32), jnp.asarray(pos[:, 1], jnp.float32),
    jnp.cos(phi0).astype(jnp.float32), jnp.sin(phi0).astype(jnp.float32),
    jnp.asarray(elems, jnp.int32), jnp.ones(len(elems), bool),
)
x0, x1 = S0[0], S0[1]

rows26 = np.asarray(loc.cell_rows)
# slim peel row: [A affine 6 | elemA | B affine 6 | elemB] = 14 cols
rows14 = jnp.asarray(np.concatenate(
    [rows26[:, 0:6], rows26[:, 12:13], rows26[:, 13:19], rows26[:, 25:26]],
    axis=1))


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


# ---- gather model micro ----------------------------------------------------
cell0 = loc.cell_of((x0, x1))
for w, dt_ in [(1, jnp.float32), (4, jnp.float32), (9, jnp.float32),
               (13, jnp.float32), (13, jnp.bfloat16)]:
    tbl = jnp.asarray(rows26[:, :w].astype(
        np.float32 if dt_ == jnp.float32 else np.float32)).astype(dt_)
    if w == 1:
        tbl = tbl.reshape(-1)

        def stepf(s, tbl=tbl):
            c, acc = s
            g = tbl[c]
            acc = acc + g.astype(jnp.float32)
            c = jnp.where(c + 1 < tbl.shape[0], c + 1, 0)
            return (c, acc)
    else:
        def stepf(s, tbl=tbl, w=w):
            c, acc = s
            g = tbl[c]
            acc = acc + g[:, 0].astype(jnp.float32) + g[:, w - 1].astype(
                jnp.float32)
            c = jnp.where(c + 1 < tbl.shape[0], c + 1, 0)
            return (c, acc)
    timeit(f"gather width={w} dtype={dt_.__name__}", stepf,
           (cell0, x0 * 0), k=10)


# ---- blocked-u16 compaction ------------------------------------------------
BLK = 8192          # slots per block (< 2^15 so done<<15 | widx fits u16)


def compact_blocked_u16(done, m):
    n = done.shape[0]
    nb = -(-n // BLK)
    pad = nb * BLK - n
    d = jnp.pad(done, (0, pad), constant_values=True).reshape(nb, BLK)
    widx = jnp.arange(BLK, dtype=jnp.uint16)
    key = jnp.where(d, jnp.uint16(1 << 15), jnp.uint16(0)) | widx
    sk = jnp.sort(key, axis=1)                       # (nb, BLK) u16
    cnt = jnp.sum(~d, axis=1, dtype=jnp.int32)       # survivors per block
    off = jnp.cumsum(cnt) - cnt                      # (nb,) exclusive
    # output j -> block b = searchsorted(off, j, 'right')-1, pick within
    j = jnp.arange(m, dtype=jnp.int32)
    b = jnp.searchsorted(off, j, side="right").astype(jnp.int32) - 1
    within = j - off[b]
    val = sk[b, within].astype(jnp.int32) & 0x7FFF
    gid = b * BLK + val
    total = off[-1] + cnt[-1]
    return jnp.where(j < total, gid, n)


done_t = jax.device_get(
    search_ops.search_mesh_2d_accel(
        mesh, loc, (x0, x1), (x0 * 1.0001, x1 * 1.0001), S0[4], S0[5], 1,
        widths=()).elem_ids) >= 0
done_j = jnp.asarray(done_t)
a = jax.device_get(jax.jit(lambda: _compact_idx(done_j, N // 16))())
bv = jax.device_get(jax.jit(lambda: compact_blocked_u16(done_j, N // 16))())
print("blocked-u16 compaction equal:", bool((a == bv).all()), flush=True)


def c_step(fn):
    def stepf(s):
        d, acc = s
        out = fn(d, N // 16)
        acc = acc + out[0]
        d = jnp.roll(d, 1)        # evolve so nothing folds
        return (d, acc)
    return stepf


timeit("compact pack_u32 (10M)", c_step(_compact_idx), (done_j, jnp.int32(0)))
timeit("compact blocked_u16 (10M)", c_step(compact_blocked_u16),
       (done_j, jnp.int32(0)))


# ---- slim peel end-to-end ---------------------------------------------------
def search_slim(orig, xtgt, elem_prev, active, widths, max_iters=64):
    dx, dy = xtgt
    g = rows14[loc.cell_of(xtgt)]                  # (N, 14)
    elem_a = g[:, 6].astype(jnp.int32)
    elem_b = g[:, 13].astype(jnp.int32)

    def inside_of(o):
        l1 = g[:, o + 0] * dx + g[:, o + 1] * dy + g[:, o + 2]
        l2 = g[:, o + 3] * dx + g[:, o + 4] * dy + g[:, o + 5]
        w0 = 1.0 - l1 - l2
        m1 = (jnp.abs(g[:, o + 0] * dx) + jnp.abs(g[:, o + 1] * dy)
              + jnp.abs(g[:, o + 2]))
        m2 = (jnp.abs(g[:, o + 3] * dx) + jnp.abs(g[:, o + 4] * dy)
              + jnp.abs(g[:, o + 5]))
        t1 = BCC_REL_TOL * m1 + BCC_ABS_TOL
        t2 = BCC_REL_TOL * m2 + BCC_ABS_TOL
        return (w0 >= -(t1 + t2)) & (l1 >= -t1) & (l2 >= -t2)

    inside_a = inside_of(0)
    inside_b = inside_of(7)
    inside = inside_a | inside_b
    fallback = jnp.where(
        active, jnp.clip(elem_prev.astype(jnp.int32), 0, E - 1), INVALID)
    # miss -> stay on the guess element A, still flagged as guess; the
    # pyramid's first (narrow) pass crosses or retries from fallback
    elem0 = jnp.where(
        active, jnp.where(inside_a | ~inside, elem_a, elem_b), INVALID)
    fg0 = active & ~inside
    done0 = ~active | (active & inside)
    step = _make_step(_core_2d(mesh), mesh, remove_on_exit, True, False)
    return _run_walk(step, elem0, xtgt, done0=done0, orig=orig,
                     max_iters=max_iters, fallback=fallback, fg0=fg0,
                     widths=widths, it0=1)


tx, ty, _, _ = push_ops.elliptical_push_rot(
    S0[2], S0[3], bb, S0[4], rot, 0.0, 0.0, 0.9)
xt0 = (jnp.where(S0[5], tx, x0), jnp.where(S0[5], ty, x1))
ref = search_ops.search_mesh_2d_accel(mesh, loc, (x0, x1), xt0, S0[4], S0[5], 64)
ids = jax.jit(lambda: search_slim((x0, x1), xt0, S0[4], S0[5],
                                  (N // 16, N // 256, 1024)))().elem_ids
nmis = int((jax.device_get(ids) != jax.device_get(ref.elem_ids)).sum())
print(f"verify slim peel: mismatches={nmis}", flush=True)


def mk(search_fn, widths):
    def stepf(s):
        x0, x1, cphi, sphi, elem, active = s
        tx, ty, c2, s2 = push_ops.elliptical_push_rot(
            cphi, sphi, bb, elem, rot, cfg.h, cfg.k, cfg.d)
        xt = (jnp.where(active, tx, x0), jnp.where(active, ty, x1))
        res = search_fn((x0, x1), xt, elem, active, widths)
        act = active & (res.elem_ids >= 0)
        return (xt[0], xt[1], jnp.where(active, c2, cphi),
                jnp.where(active, s2, sphi), res.elem_ids, act)
    return stepf


W = (N // 16, N // 256, 1024)
timeit("push+search slim peel W", mk(search_slim, W), S0)
timeit("push+search production W", mk(
    lambda o, t, e, a, w: search_ops.search_mesh_2d_accel(
        mesh, loc, o, t, e, a, 64, widths=w), W), S0)
