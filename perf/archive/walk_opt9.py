"""Round 2b: cell-resident rows at default widths (exact-parity tolerance),
single-word packed-sort compaction, and the full-step prototype
(cellrow + rotation push + packed compaction + deposition)."""
import sys
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
from pumipic_tpu.ops.search import (
    BCC_ABS_TOL, BCC_REL_TOL, INVALID, _make_step, _core_2d, remove_on_exit,
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
S0 = (
    jnp.asarray(pos[:, 0], jnp.float32), jnp.asarray(pos[:, 1], jnp.float32),
    phi0.astype(jnp.float32), jnp.asarray(elems, jnp.int32),
    jnp.ones(len(elems), bool),
)
bb = b0.astype(jnp.float32)
loc = build_locator_grid(np.asarray(mesh.coords), np.asarray(mesh.elem2verts))
E = mesh.nelems
geom12 = np.asarray(mesh.walk_geom)

# cell-resident rows, EXACT walk_geom columns + elem id: bit-parity with the
# production walk (per-particle tolerance computed from the same columns)
cell_elem_h = np.asarray(loc.cell_elem)
cell_rows13 = jnp.asarray(np.concatenate(
    [geom12[cell_elem_h], cell_elem_h[:, None].astype(np.float32)], axis=1))

nxf = float(np.asarray(loc.nx)); nyf = float(np.asarray(loc.ny))
ox = float(np.asarray(loc.origin)[0]); oy = float(np.asarray(loc.origin)[1])
ihx = float(np.asarray(loc.inv_h)[0]); ihy = float(np.asarray(loc.inv_h)[1])

gyro_fwd, gyro_bwd = build_gyro_mappings(mesh, cfg.gyro)
gyro = cfg.gyro


def push(s):
    x0, x1, phi, elem, active = s
    cid = mesh.class_id[jnp.maximum(elem, 0)]
    tx, ty, phi_new = push_ops.elliptical_push_components(
        phi, bb, cid, cfg.deg_per_push, cfg.h, cfg.k, cfg.d)
    return tx, ty, phi_new


# ---------------------------------------------------------------------------
# compaction strategies (return sidx (m,) int32 with out-of-range == n)
# ---------------------------------------------------------------------------

def compact_argsort(done, m, n):
    sidx = jnp.argsort(done, stable=True)[:m]
    return jnp.where(done[sidx], n, sidx.astype(jnp.int32))


def compact_pack_u32(done, m, n):
    key = jnp.where(done, jnp.uint32(1 << 24), jnp.uint32(0)) | jnp.arange(
        n, dtype=jnp.uint32)
    sk = jnp.sort(key)[:m]
    return jnp.where(sk >> 24 > 0, n, sk & jnp.uint32(0xFFFFFF)).astype(
        jnp.int32)


def compact_pack_f32(done, m, n):
    key = jnp.arange(n, dtype=jnp.float32) + jnp.where(
        done, jnp.float32(1 << 24), 0.0)
    sk = jnp.sort(key)[:m]
    return jnp.where(sk >= (1 << 24), n, sk).astype(jnp.int32)


def compact_pack_i32(done, m, n):
    key = jnp.where(done, jnp.int32(1 << 24), jnp.int32(0)) | jnp.arange(
        n, dtype=jnp.int32)
    sk = jnp.sort(key)[:m]
    return jnp.where(sk >= (1 << 24), n, sk)


# ---------------------------------------------------------------------------
# cellrow walk (exact parity) with pluggable compaction
# ---------------------------------------------------------------------------

def search_cellrow(orig, xtgt, elem_prev, active, widths, compact,
                   max_iters=64):
    dx, dy = xtgt
    rx = (dx - ox) * ihx
    ry = (dy - oy) * ihy
    ix = jnp.clip(jnp.floor(rx), 0.0, nxf - 1.0)
    iy = jnp.clip(jnp.floor(ry), 0.0, nyf - 1.0)
    cell = (ix * nyf + iy).astype(jnp.int32)
    g = cell_rows13[cell]                      # (N, 13)
    elem0 = g[:, 12].astype(jnp.int32)
    l1 = g[:, 0] * dx + g[:, 1] * dy + g[:, 2]
    l2 = g[:, 3] * dx + g[:, 4] * dy + g[:, 5]
    w0 = 1.0 - l1 - l2
    m1 = jnp.abs(g[:, 0] * dx) + jnp.abs(g[:, 1] * dy) + jnp.abs(g[:, 2])
    m2 = jnp.abs(g[:, 3] * dx) + jnp.abs(g[:, 4] * dy) + jnp.abs(g[:, 5])
    tt1 = BCC_REL_TOL * m1 + BCC_ABS_TOL
    tt2 = BCC_REL_TOL * m2 + BCC_ABS_TOL
    inside = (w0 >= -(tt1 + tt2)) & (l1 >= -tt1) & (l2 >= -tt2)
    wmin = jnp.minimum(w0, l1)
    kmin = jnp.where(w0 <= l1, 0, 1)
    kmin = jnp.where(l2 < wmin, 2, kmin)
    next_elem = jnp.where(
        kmin == 0, g[:, 6], jnp.where(kmin == 1, g[:, 7], g[:, 8]),
    ).astype(jnp.int32)
    exposed = next_elem == INVALID
    fallback = jnp.where(
        active, jnp.clip(elem_prev.astype(jnp.int32), 0, E - 1), INVALID)
    elem1 = jnp.where(
        active & ~inside, jnp.where(exposed, fallback, next_elem),
        jnp.where(active, elem0, INVALID))
    fg1 = active & ~inside & ~exposed
    done1 = ~active | (active & inside)

    step = _make_step(_core_2d(mesh), mesh, remove_on_exit, True, False)

    # ---- inline pyramid with pluggable compaction (dest-const fast path)
    n = elem1.shape[0]
    dest = xtgt

    def run_level(dest_arr, orig_arr, fb_arr, thresh, state):
        elem, done, fg, it = state

        def cond(s):
            return (s[-1] < max_iters) & (jnp.sum(~s[1]) > thresh)

        def body(s):
            elem, done, fg, it = s
            elem, _, done, fg, _ = step(elem, dest_arr, done, fg, orig_arr,
                                        fb_arr, ())
            return elem, done, fg, it + 1

        return jax.lax.while_loop(cond, body, state)

    thresh0 = widths[0] if widths else 0
    elem, done, fg, it = run_level(
        dest, orig, fallback, thresh0, (elem1, done1, fg1, jnp.int32(1)))

    prev = (elem, done, fg, orig, fallback)
    levels = []
    for li, m in enumerate(widths):
        p_elem, p_done, p_fg, p_orig, p_fb = prev
        next_thresh = widths[li + 1] if li + 1 < len(widths) else 0
        pn = p_elem.shape[0]
        sidx = compact(p_done, m, pn)
        in_range = sidx < pn
        sidx_c = jnp.minimum(sidx, pn - 1)
        s_elem = jnp.where(in_range, p_elem[sidx_c], INVALID)
        s_done = ~in_range
        s_fg = p_fg[sidx_c] & in_range
        s_dest = tuple(d[sidx_c] for d in dest) if li == 0 else tuple(
            d[sidx_c] for d in prev_dest)
        s_orig = tuple(o[sidx_c] for o in p_orig)
        s_fb = p_fb[sidx_c]
        if li == 0:
            gidx = jnp.where(in_range, sidx, n)
        else:
            gidx = jnp.where(in_range, levels[-1][0][sidx_c], n)
        s_elem, s_done, s_fg, it = run_level(
            s_dest, s_orig, s_fb, next_thresh, (s_elem, s_done, s_fg, it))
        levels.append((gidx, (s_elem, s_done)))
        prev = (s_elem, s_done, s_fg, s_orig, s_fb)
        prev_dest = s_dest

    for gidx, (s_elem, s_done) in levels:
        elem = elem.at[gidx].set(s_elem, mode="drop")
        done = done.at[gidx].set(s_done, mode="drop")

    elem = jnp.where(done, elem, INVALID)
    return elem, it


# ---- verification ----------------------------------------------------------
x0, x1, phi, elem, active = S0
tx, ty, _ = push(S0)
xtgt = (jnp.where(active, tx, x0), jnp.where(active, ty, x1))
ref = search_ops.search_mesh_2d_accel(mesh, loc, (x0, x1), xtgt, elem, active, 64)
ref_ids = jax.device_get(ref.elem_ids)

WD = (N // 8, N // 64, 2048)
ids, _ = jax.jit(lambda: search_cellrow(
    (x0, x1), xtgt, elem, active, WD, compact_argsort))()
nmis = int((jax.device_get(ids) != ref_ids).sum())
print(f"verify cellrow13+argsort: mismatches={nmis}", flush=True)
ids, _ = jax.jit(lambda: search_cellrow(
    (x0, x1), xtgt, elem, active, WD, compact_pack_u32))()
nmis = int((jax.device_get(ids) != ref_ids).sum())
print(f"verify cellrow13+pack_u32: mismatches={nmis}", flush=True)


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


which = set(sys.argv[1:]) or {"compact", "search", "full"}

if "compact" in which:
    done1 = jax.device_get(ids >= 0)
    done_j = jnp.asarray(done1)
    m = N // 8
    for nm, fn in [("argsort", compact_argsort), ("pack_u32", compact_pack_u32),
                   ("pack_f32", compact_pack_f32), ("pack_i32", compact_pack_i32)]:
        a = jax.device_get(jax.jit(lambda: fn(done_j, m, N))())
        b = jax.device_get(jax.jit(lambda: compact_argsort(done_j, m, N))())
        print(f"compact {nm}: equal={bool((a == b).all())}", flush=True)

        @jax.jit
        def run(d, fn=fn):
            def body(i, acc):
                s = fn(d ^ (i > 1000), m, N)
                return acc + s[0]
            return jax.lax.fori_loop(0, 10, body, jnp.int32(0))

        jax.block_until_ready(run(done_j))
        t0 = time.perf_counter()
        jax.block_until_ready(run(done_j))
        print(f"compact {nm}: {(time.perf_counter()-t0)/10*1e3:8.2f} ms",
              flush=True)

if "search" in which:
    def mk(compact, widths):
        def stepf(s):
            x0, x1, phi, elem, active = s
            tx, ty, phi_new = push(s)
            xt = (jnp.where(active, tx, x0), jnp.where(active, ty, x1))
            eids, _ = search_cellrow((x0, x1), xt, elem, active, widths,
                                     compact)
            return (xt[0], xt[1], phi_new, eids, active & (eids >= 0))
        return stepf

    timeit("push+search cellrow13 argsort WD", mk(compact_argsort, WD), S0)
    timeit("push+search cellrow13 pack_u32 WD", mk(compact_pack_u32, WD), S0)
    timeit("push+search cellrow13 pack_u32 (N/8,N/64)",
           mk(compact_pack_u32, (N // 8, N // 64)), S0)
    timeit("push+search cellrow13 pack_u32 (N/16,N/128,1024)",
           mk(compact_pack_u32, (N // 16, N // 128, 1024)), S0)

if "full" in which:
    # full-step prototype: rot push + cellrow search + deposition
    cidh = np.asarray(mesh.class_id)
    cf = np.where(cidh == 1, 0.01, 1.0)
    delta = cfg.deg_per_push * cf / np.maximum(cidh, 1) * np.pi / 180.0
    rot = jnp.asarray(np.stack([np.cos(delta), np.sin(delta)], 1), jnp.float32)

    def full_step(s):
        x0, x1, cphi, sphi, elem, active = s
        tx, ty, c2, s2 = push_ops.elliptical_push_rot(
            cphi, sphi, bb, elem, rot, cfg.h, cfg.k, cfg.d)
        xt = (jnp.where(active, tx, x0), jnp.where(active, ty, x1))
        eids, _ = search_cellrow((x0, x1), xt, elem, active, WD,
                                 compact_pack_u32)
        act = active & (eids >= 0)
        ring = scatter_ops.accumulate_to_rings(
            eids, act, mesh.elem2verts, mesh.nverts, gyro.num_rings, gyro.rmax)
        fwd = scatter_ops.scatter_to_mapped_verts(
            ring, gyro_fwd, mesh.nverts, gyro.num_rings, gyro.points_per_ring)
        bwd = scatter_ops.scatter_to_mapped_verts(
            ring, gyro_bwd, mesh.nverts, gyro.num_rings, gyro.points_per_ring)
        return (xt[0] + 0 * fwd[0], xt[1] + 0 * bwd[0],
                jnp.where(active, c2, cphi), jnp.where(active, s2, sphi),
                eids, act)

    F0 = (S0[0], S0[1], jnp.cos(phi0).astype(jnp.float32),
          jnp.sin(phi0).astype(jnp.float32), S0[3], S0[4])
    timeit("FULL STEP rot+cellrow+pack_u32+deposit", full_step, F0)

    def full_step_old(s):
        x0, x1, phi, elem, active = s
        tx, ty, phi_new = push(s)
        xt = (jnp.where(active, tx, x0), jnp.where(active, ty, x1))
        res = search_ops.search_mesh_2d_accel(
            mesh, loc, (x0, x1), xt, elem, active, 64)
        act = active & (res.elem_ids >= 0)
        ring = scatter_ops.accumulate_to_rings(
            res.elem_ids, act, mesh.elem2verts, mesh.nverts, gyro.num_rings,
            gyro.rmax)
        fwd = scatter_ops.scatter_to_mapped_verts(
            ring, gyro_fwd, mesh.nverts, gyro.num_rings, gyro.points_per_ring)
        bwd = scatter_ops.scatter_to_mapped_verts(
            ring, gyro_bwd, mesh.nverts, gyro.num_rings, gyro.points_per_ring)
        return (res.dest_c[0] + 0 * fwd[0], res.dest_c[1] + 0 * bwd[0],
                phi_new, res.elem_ids, act)

    timeit("FULL STEP current production", full_step_old, S0)
