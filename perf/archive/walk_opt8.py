"""Round-2 batch: gather-consumer fusion, cell-resident walk rows,
trig-free rotation push, compaction strategies, pyramid re-tune.

All search variants verified against the production search on the same
inputs before timing.  Timings are fori-fused K-iteration loops (honest
evolving-state measurement; docs/PERFORMANCE.md "Measurement rules").
"""
import sys
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
    BCC_ABS_TOL, BCC_REL_TOL, INVALID, _make_step, _run_walk, _components,
    remove_on_exit,
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

# ---- extended geometry tables --------------------------------------------
geom12 = np.asarray(mesh.walk_geom)
cz = np.asarray(mesh.coords)
mx, my = np.abs(cz[:, 0]).max(), np.abs(cz[:, 1]).max()
# per-element tolerance upper bound (replaces per-particle |A.x| terms):
t1 = (BCC_REL_TOL * (np.abs(geom12[:, 0]) * mx + np.abs(geom12[:, 1]) * my
                     + np.abs(geom12[:, 2])) + BCC_ABS_TOL)
t2 = (BCC_REL_TOL * (np.abs(geom12[:, 3]) * mx + np.abs(geom12[:, 4]) * my
                     + np.abs(geom12[:, 5])) + BCC_ABS_TOL)
geom14 = np.concatenate(
    [geom12, t1[:, None], t2[:, None]], axis=1).astype(np.float32)
geom14_j = jnp.asarray(geom14)

# cell-resident rows: [geom14 | elem_id_f32] per locator cell
cell_elem_h = np.asarray(loc.cell_elem)
cell_rows = np.concatenate(
    [geom14[cell_elem_h], cell_elem_h[:, None].astype(np.float32)], axis=1)
cell_rows_j = jnp.asarray(cell_rows)

nxf = float(np.asarray(loc.nx))
nyf = float(np.asarray(loc.ny))
ox = float(np.asarray(loc.origin)[0])
oy = float(np.asarray(loc.origin)[1])
ihx = float(np.asarray(loc.inv_h)[0])
ihy = float(np.asarray(loc.inv_h)[1])


def push(s):
    x0, x1, phi, elem, active = s
    cid = mesh.class_id[jnp.maximum(elem, 0)]
    tx, ty, phi_new = push_ops.elliptical_push_components(
        phi, bb, cid, cfg.deg_per_push, cfg.h, cfg.k, cfg.d)
    return tx, ty, phi_new


def make_core(table, tolcols: bool, barrier: bool):
    def core(e_safe, dest, orig, need_t):
        dx, dy = dest
        g = table[e_safe]
        if barrier:
            g = jax.lax.optimization_barrier(g)
        l1 = g[:, 0] * dx + g[:, 1] * dy + g[:, 2]
        l2 = g[:, 3] * dx + g[:, 4] * dy + g[:, 5]
        w0 = 1.0 - l1 - l2
        if tolcols:
            tt1, tt2 = g[:, 12], g[:, 13]
        else:
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
        side = jnp.where(
            kmin == 0, g[:, 9], jnp.where(kmin == 1, g[:, 10], g[:, 11]),
        ).astype(jnp.int32)
        return inside, next_elem, side, None

    return core


def search_custom(core, orig, xtgt, elem_prev, active, widths):
    guess = loc.guess(xtgt)
    step = _make_step(core, mesh, remove_on_exit, True, False)
    elem0 = jnp.where(active, guess, INVALID)
    fallback = jnp.where(
        active, jnp.clip(elem_prev.astype(jnp.int32), 0, E - 1), INVALID)
    return _run_walk(step, elem0, xtgt, done0=~active, orig=orig,
                     max_iters=64, fallback=fallback, fg0=active,
                     widths=widths)


def search_cellrow(orig, xtgt, elem_prev, active, widths, barrier=False):
    """Peeled first pass straight off the locator-cell-resident walk rows:
    guess gather + first containment test collapse into ONE gather."""
    dx, dy = xtgt
    rx = (dx - ox) * ihx
    ry = (dy - oy) * ihy
    ix = jnp.clip(jnp.floor(rx), 0.0, nxf - 1.0)
    iy = jnp.clip(jnp.floor(ry), 0.0, nyf - 1.0)
    cell = (ix * nyf + iy).astype(jnp.int32)
    g = cell_rows_j[cell]                      # (N, 15)
    if barrier:
        g = jax.lax.optimization_barrier(g)
    elem0 = g[:, 14].astype(jnp.int32)
    l1 = g[:, 0] * dx + g[:, 1] * dy + g[:, 2]
    l2 = g[:, 3] * dx + g[:, 4] * dy + g[:, 5]
    w0 = 1.0 - l1 - l2
    tt1, tt2 = g[:, 12], g[:, 13]
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
    # guess-walk boundary hit -> retry from true previous element
    elem1 = jnp.where(
        active & ~inside, jnp.where(exposed, fallback, next_elem),
        jnp.where(active, elem0, INVALID))
    fg1 = active & ~inside & ~exposed          # still on a guess trajectory
    done1 = ~active | (active & inside)

    core = make_core(geom14_j, True, barrier)
    step = _make_step(core, mesh, remove_on_exit, True, False)
    return _run_walk(step, elem1, xtgt, done0=done1, orig=orig,
                     max_iters=63, fallback=fallback, fg0=fg1,
                     widths=widths)


# ---- verification ---------------------------------------------------------
x0, x1, phi, elem, active = S0
tx, ty, _ = push(S0)
xtgt = (jnp.where(active, tx, x0), jnp.where(active, ty, x1))
ref = search_ops.search_mesh_2d_accel(
    mesh, loc, (x0, x1), xtgt, elem, active, 64)
ref_ids = jax.device_get(ref.elem_ids)

W = (N // 3, N // 24, 4096)
for name, fn in [
    ("tolcols", lambda: search_custom(
        make_core(geom14_j, True, False), (x0, x1), xtgt, elem, active, W)),
    ("barrier", lambda: search_custom(
        make_core(mesh.walk_geom, False, True), (x0, x1), xtgt, elem, active, W)),
    ("cellrow", lambda: search_cellrow((x0, x1), xtgt, elem, active, W)),
]:
    ids = jax.device_get(jax.jit(fn)().elem_ids)
    nmis = int((ids != ref_ids).sum())
    # on-edge ties may legitimately differ: check containment of mismatches
    print(f"verify {name}: mismatches={nmis} ({nmis/N:.2e})", flush=True)

# survivor rates after the peeled cell-row pass (pyramid design input)
res1 = jax.jit(lambda: search_cellrow((x0, x1), xtgt, elem, active, ()))()
print("cellrow walk iters (64-cap loop from peel):",
      int(jax.device_get(res1.iters)), flush=True)


# ---- timing ---------------------------------------------------------------
def timeit(name, step_fn, s0, k=K):
    @jax.jit
    def loop(s):
        return jax.lax.fori_loop(0, k, lambda i, s: step_fn(s), s)

    out = loop(s0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / k * 1e3
    print(f"{name:52s} {dt:8.2f} ms/iter", flush=True)
    return dt


def mk_step(search_fn, widths):
    def step(s):
        x0, x1, phi, elem, active = s
        tx, ty, phi_new = push(s)
        xt = (jnp.where(active, tx, x0), jnp.where(active, ty, x1))
        res = search_fn((x0, x1), xt, elem, active, widths)
        return (res.dest_c[0], res.dest_c[1], phi_new, res.elem_ids,
                active & (res.elem_ids >= 0))
    return step


which = set(sys.argv[1:]) or {"search", "push", "compact"}

if "search" in which:
    base_fn = lambda o, t, e, a, w: search_ops.search_mesh_2d_accel(
        mesh, loc, o, t, e, a, 64, widths=w)
    timeit("push+search base default-widths", mk_step(base_fn, None), S0)
    timeit("push+search base W=(N/3,N/24,4096)", mk_step(base_fn, W), S0)
    timeit("push+search tolcols W", mk_step(
        lambda o, t, e, a, w: search_custom(
            make_core(geom14_j, True, False), o, t, e, a, w), W), S0)
    timeit("push+search barrier W", mk_step(
        lambda o, t, e, a, w: search_custom(
            make_core(mesh.walk_geom, False, True), o, t, e, a, w), W), S0)
    timeit("push+search tolcols+barrier W", mk_step(
        lambda o, t, e, a, w: search_custom(
            make_core(geom14_j, True, True), o, t, e, a, w), W), S0)
    timeit("push+search cellrow W", mk_step(
        lambda o, t, e, a, w: search_cellrow(o, t, e, a, w), W), S0)
    timeit("push+search cellrow+barrier W", mk_step(
        lambda o, t, e, a, w: search_cellrow(o, t, e, a, w, barrier=True),
        W), S0)
    timeit("push+search cellrow W2=(N/3,N/12,N/48,2048)", mk_step(
        lambda o, t, e, a, w: search_cellrow(o, t, e, a, w),
        (N // 3, N // 12, N // 48, 2048)), S0)

if "push" in which:
    # trig push vs rotation push (per-element rotation table)
    cidh = np.asarray(mesh.class_id)
    cf = np.where(cidh == 1, 0.01, 1.0)
    delta = cfg.deg_per_push * cf / np.maximum(cidh, 1) * np.pi / 180.0
    rot = jnp.asarray(
        np.stack([np.cos(delta), np.sin(delta)], axis=1), jnp.float32)

    def trig_step(s):
        x0, x1, phi, elem, active = s
        tx, ty, phi_new = push(s)
        return (tx, ty, phi_new, jnp.minimum(elem + 1, E - 1), active)

    def rot_step(s):
        cphi, sphi, elem, active = s
        r = rot[jnp.maximum(elem, 0)]
        cd, sd = r[:, 0], r[:, 1]
        c2 = cphi * cd - sphi * sd
        s2 = sphi * cd + cphi * sd
        f = 1.5 - 0.5 * (c2 * c2 + s2 * s2)   # Newton renorm
        c2, s2 = c2 * f, s2 * f
        tx = bb * cfg.d * c2 + cfg.h
        ty = bb * s2 + cfg.k
        return (c2 + 0 * tx, s2 + 0 * ty, jnp.minimum(elem + 1, E - 1), active)

    timeit("push trig (cid gather + sincos)", trig_step, S0, k=10)
    timeit("push rot (elem rot-row gather, no trig)", rot_step,
           (jnp.cos(phi0).astype(jnp.float32), jnp.sin(phi0).astype(jnp.float32),
            S0[3], S0[4]), k=10)
    # rotation accuracy drift over 50 steps
    st = (jnp.cos(phi0).astype(jnp.float32), jnp.sin(phi0).astype(jnp.float32),
          S0[3], S0[4])
    sp = S0
    for _ in range(50):
        st = jax.jit(rot_step)(st)
        sp = jax.jit(trig_step)(sp)
    err = jnp.max(jnp.abs(st[0] - jnp.cos(sp[2])))
    print(f"rot-push max |cos| error after 50 steps: {float(err):.3e}",
          flush=True)

if "compact" in which:
    done = jax.device_get(res1.elem_ids >= 0)  # ~70% True
    done_j = jnp.asarray(done)
    m = N // 3

    def argsort_c(d):
        sidx = jnp.argsort(d, stable=True)[:m]
        return sidx, (~d[sidx])

    def cumsum_c(d):
        keep = ~d
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        gidx = jnp.where(keep & (pos < m), pos, m)
        out = jnp.full((m + 1,), N, jnp.int32).at[gidx].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop")
        sidx = out[:m]
        return sidx, sidx < N

    a1 = jax.jit(argsort_c)(done_j)
    a2 = jax.jit(cumsum_c)(done_j)
    ok = bool(jnp.all(jnp.where(a2[1], a2[0], -1)
                      == jnp.where(a1[1], a1[0].astype(jnp.int32), -1)))
    print(f"compaction equivalence: {ok}", flush=True)

    def loop_c(fn):
        @jax.jit
        def run(d):
            def body(i, acc):
                sidx, valid = fn(d != (i % 2 == 999))  # keep d live
                return acc + sidx[0] + valid[0]
            return jax.lax.fori_loop(0, 10, body, jnp.int32(0))
        run(done_j)
        t0 = time.perf_counter()
        jax.block_until_ready(run(done_j))
        return (time.perf_counter() - t0) / 10 * 1e3

    print(f"compact argsort: {loop_c(argsort_c):8.2f} ms", flush=True)
    print(f"compact cumsum+scatter: {loop_c(cumsum_c):8.2f} ms", flush=True)
