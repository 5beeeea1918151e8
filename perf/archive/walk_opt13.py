"""Guarded bf16 peel prototype.

Gather cost is byte-driven (walk_opt12: 13-col bf16 = 26 ms vs f32 68 ms at
10M), but bf16 affine forms are too sloppy for exact containment.  Scheme:
store CELL-RELATIVE affine rows in bf16 (small |x_rel| keeps the rounding
error ~2^-8 of O(1) terms) and classify with a rigorous guard band:

  definitely-inside  (l >= guard)    -> done (f32 result provably inside)
  definitely-outside (l <= -2*guard) -> f32 would reject too
  gray                               -> survivor; the f32 pyramid decides

Element ids ride as bitcast uint16 halves in bf16 columns (bits preserved
through the gather).  16 bf16 cols = 32 B/row vs the f32 peel's 56 B.
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
    INVALID, _make_step, _core_2d, remove_on_exit, _run_walk,
)

N = 10_000_000
K = 5
GUARD = 2.0 ** -8          # bf16 relative rounding bound (1 ulp of mantissa-8)

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

# ---- host build of the bf16 cell table -------------------------------------
rows14 = np.asarray(loc.cell_rows)
a_id = rows14[:, 6].astype(np.int64)
b_id = rows14[:, 13].astype(np.int64)
geom = np.asarray(mesh.walk_geom, np.float64)
nx = int(np.asarray(loc.nx)); ny = int(np.asarray(loc.ny))
n_cells = rows14.shape[0]
ox, oy = np.asarray(loc.origin, np.float64)
hx = 1.0 / float(np.asarray(loc.inv_h)[0])
hy = 1.0 / float(np.asarray(loc.inv_h)[1])
ci = np.arange(n_cells)
ccx = ox + (np.minimum(ci // ny, nx - 1) + 0.5) * hx
ccy = oy + (np.minimum(ci % ny, ny - 1) + 0.5) * hy


def cand_cols(e):
    g = geom[e]
    c1 = g[:, 0] * ccx + g[:, 1] * ccy + g[:, 2]
    c2 = g[:, 3] * ccx + g[:, 4] * ccy + g[:, 5]
    return np.stack([g[:, 0], g[:, 1], c1, g[:, 3], g[:, 4], c2], axis=1)


def id_cols_u16(e):
    lo = (e & 0xFFFF).astype(np.uint16)
    hi = (e >> 16).astype(np.uint16)
    return np.stack([lo, hi], axis=1)


colsA = cand_cols(a_id).astype(np.float32)
colsB = cand_cols(b_id).astype(np.float32)
geo16 = jnp.concatenate(
    [jnp.asarray(colsA, jnp.bfloat16), jnp.asarray(colsB, jnp.bfloat16)],
    axis=1)                                                 # (n_cells, 12)
ids16 = jax.lax.bitcast_convert_type(
    jnp.asarray(np.concatenate([id_cols_u16(a_id), id_cols_u16(b_id)],
                               axis=1)), jnp.bfloat16)      # (n_cells, 4)
tbl16 = jnp.concatenate([geo16, ids16], axis=1)             # (n_cells, 16)

ccx_j = jnp.float32(0)  # cc computed on the fly from cell index


def peel16(xtgt, active, elem_prev):
    dx, dy = xtgt
    rx = (dx - np.float32(ox)) * loc.inv_h[0]
    ry = (dy - np.float32(oy)) * loc.inv_h[1]
    nxf = loc.nx.astype(jnp.float32)
    nyf = loc.ny.astype(jnp.float32)
    ix = jnp.clip(jnp.floor(rx), 0.0, nxf - 1.0)
    iy = jnp.clip(jnp.floor(ry), 0.0, nyf - 1.0)
    cell = (ix * nyf + iy).astype(jnp.int32)
    ccx = np.float32(ox) + (ix + 0.5) * np.float32(hx)
    ccy = np.float32(oy) + (iy + 0.5) * np.float32(hy)
    xr, yr = dx - ccx, dy - ccy

    g = tbl16[cell]                                         # (N, 16) bf16
    gf = g[:, 0:12].astype(jnp.float32)

    def classify(o):
        t1 = gf[:, o + 0] * xr
        t2 = gf[:, o + 1] * yr
        c1 = gf[:, o + 2]
        l1 = t1 + t2 + c1
        g1 = GUARD * (jnp.abs(t1) + jnp.abs(t2) + jnp.abs(c1)) + 1e-6
        t3 = gf[:, o + 3] * xr
        t4 = gf[:, o + 4] * yr
        c2 = gf[:, o + 5]
        l2 = t3 + t4 + c2
        g2 = GUARD * (jnp.abs(t3) + jnp.abs(t4) + jnp.abs(c2)) + 1e-6
        w0 = 1.0 - l1 - l2
        gw = g1 + g2
        inside_def = (l1 >= g1) & (l2 >= g2) & (w0 >= gw)
        outside_def = (l1 <= -2 * g1) | (l2 <= -2 * g2) | (w0 <= -2 * gw)
        return inside_def, outside_def

    inA, outA = classify(0)
    inB, outB = classify(6)
    idu = jax.lax.bitcast_convert_type(g[:, 12:16], jnp.uint16).astype(
        jnp.int32)
    eA = (idu[:, 1] << 16) | idu[:, 0]
    eB = (idu[:, 3] << 16) | idu[:, 2]

    doneA = inA
    doneB = outA & inB
    done0 = ~active | doneA | doneB
    start_b = outA & ~outB
    elem0 = jnp.where(
        active,
        jnp.where(doneA, eA, jnp.where(doneB | start_b, eB, eA)),
        INVALID)
    fg0 = active & ~doneA & ~doneB
    return elem0, done0, fg0


def search16(orig, xtgt, elem_prev, active, widths, max_iters=64):
    elem0, done0, fg0 = peel16(xtgt, active, elem_prev)
    fallback = jnp.where(
        active, jnp.clip(elem_prev.astype(jnp.int32), 0, E - 1), INVALID)
    step = _make_step(_core_2d(mesh), mesh, remove_on_exit, True, False)
    return _run_walk(step, elem0, xtgt, done0=done0, orig=orig,
                     max_iters=max_iters, fallback=fallback, fg0=fg0,
                     widths=widths, it0=1)


# ---- verify -----------------------------------------------------------------
tx, ty, _, _ = push_ops.elliptical_push_rot(
    S0[2], S0[3], bb, S0[4], rot, 0.0, 0.0, 0.9)
xt0 = (jnp.where(S0[5], tx, x0), jnp.where(S0[5], ty, x1))
ref = search_ops.search_mesh_2d_accel(mesh, loc, (x0, x1), xt0, S0[4], S0[5], 64)
W = (N // 8, N // 128, 1024)
res16 = jax.jit(lambda: search16((x0, x1), xt0, S0[4], S0[5], W))()
nmis = int((jax.device_get(res16.elem_ids)
            != jax.device_get(ref.elem_ids)).sum())
e0, d0, f0 = jax.jit(lambda: peel16(xt0, S0[5], S0[4]))()
surv = int(jax.device_get((~d0).sum()))
print(f"verify bf16 peel: mismatches={nmis}; survivors={surv/N:.4f} "
      f"(N/8={1/8:.4f})", flush=True)


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


timeit("push+search bf16 peel (N/8,N/128,1024)", mk(search16, W), S0)
timeit("push+search bf16 peel (N/16,N/256,1024)",
       mk(search16, (N // 16, N // 256, 1024)), S0)
timeit("push+search f32 slim peel (N/16,N/256,1024)", mk(
    lambda o, t, e, a, w: search_ops.search_mesh_2d_accel(
        mesh, loc, o, t, e, a, 64, widths=w), (N // 16, N // 256, 1024)), S0)
