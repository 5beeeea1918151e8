"""Shared prototype pieces for walk_opt9/10: cell-resident-row search with
pack_u32 compaction, rotation push, full-step builder."""
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
from pumipic_tpu.ops.search import (
    BCC_ABS_TOL, BCC_REL_TOL, INVALID, _make_step, _core_2d, remove_on_exit,
)


def setup(N):
    mesh = make_default_mesh(24_000)
    cfg = XGCmConfig(
        num_ptcls=N, mdl_face=max(int(np.asarray(mesh.class_id).max()) // 2, 2),
        deg_per_push=15.0, max_search_iters=64, gyro=GyroConfig(),
    )
    rng = np.random.default_rng(1024 * 1024)
    ppe = seed_particles_per_element(mesh, cfg, rng)
    elems = np.repeat(np.arange(mesh.nelems), ppe)
    pos = uniform_points_in_elements(
        mesh, elems, np.random.default_rng(512 * 512))
    phi0, b0 = push_ops.elliptical_setup(jnp.asarray(pos), cfg.h, cfg.k, cfg.d)
    loc = build_locator_grid(
        np.asarray(mesh.coords), np.asarray(mesh.elem2verts))
    geom12 = np.asarray(mesh.walk_geom)
    cell_elem_h = np.asarray(loc.cell_elem)
    cell_rows13 = jnp.asarray(np.concatenate(
        [geom12[cell_elem_h], cell_elem_h[:, None].astype(np.float32)],
        axis=1))
    gyro_fwd, gyro_bwd = build_gyro_mappings(mesh, cfg.gyro)
    return dict(
        mesh=mesh, cfg=cfg, loc=loc, cell_rows=cell_rows13,
        x0=jnp.asarray(pos[:, 0], jnp.float32),
        x1=jnp.asarray(pos[:, 1], jnp.float32),
        phi0=phi0.astype(jnp.float32), b=b0.astype(jnp.float32),
        elem=jnp.asarray(elems, jnp.int32),
        active=jnp.ones(len(elems), bool),
        gyro_fwd=gyro_fwd, gyro_bwd=gyro_bwd,
    )


def compact_pack_u32(done, m, n):
    key = jnp.where(done, jnp.uint32(1 << 24), jnp.uint32(0)) | jnp.arange(
        n, dtype=jnp.uint32)
    sk = jnp.sort(key)[:m]
    return jnp.where(sk >> 24 > 0, n, sk & jnp.uint32(0xFFFFFF)).astype(
        jnp.int32)


def search_cellrow(ctx, orig, xtgt, elem_prev, active, widths, max_iters=64):
    mesh = ctx["mesh"]
    loc = ctx["loc"]
    E = mesh.nelems
    n = elem_prev.shape[0]
    nxf = loc.nx.astype(jnp.float32)
    nyf = loc.ny.astype(jnp.float32)

    dx, dy = xtgt
    rx = (dx - loc.origin[0]) * loc.inv_h[0]
    ry = (dy - loc.origin[1]) * loc.inv_h[1]
    ix = jnp.clip(jnp.floor(rx), 0.0, nxf - 1.0)
    iy = jnp.clip(jnp.floor(ry), 0.0, nyf - 1.0)
    cell = (ix * nyf + iy).astype(jnp.int32)
    g = ctx["cell_rows"][cell]
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
    dest = xtgt

    def run_level(dest_arr, orig_arr, fb_arr, thresh, state):
        def cond(s):
            return (s[-1] < max_iters) & (jnp.sum(~s[1]) > thresh)

        def body(s):
            # new step signature: fused fbg carry (fallback where on-guess)
            elem, done, fg, it = s
            fbg = jnp.where(fg, fb_arr, -2)
            elem, _, done, fbg, _ = step(elem, dest_arr, done, fbg,
                                         orig_arr, ())
            return elem, done, fbg >= 0, it + 1

        return jax.lax.while_loop(cond, body, state)

    thresh0 = widths[0] if widths else 0
    elem, done, fg, it = run_level(
        dest, orig, fallback, thresh0, (elem1, done1, fg1, jnp.int32(1)))

    prev = (elem, done, fg, orig, fallback)
    prev_dest = dest
    levels = []
    for li, m in enumerate(widths):
        p_elem, p_done, p_fg, p_orig, p_fb = prev
        next_thresh = widths[li + 1] if li + 1 < len(widths) else 0
        pn = p_elem.shape[0]
        sidx = compact_pack_u32(p_done, m, pn)
        in_range = sidx < pn
        sidx_c = jnp.minimum(sidx, pn - 1)
        s_elem = jnp.where(in_range, p_elem[sidx_c], INVALID)
        s_done = ~in_range
        s_fg = p_fg[sidx_c] & in_range
        s_dest = tuple(d[sidx_c] for d in prev_dest)
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

    return jnp.where(done, elem, INVALID), it


def make_full_step(ctx, widths):
    mesh = ctx["mesh"]
    cfg = ctx["cfg"]
    gyro = cfg.gyro
    bb = ctx["b"]
    rot = push_ops.elliptical_rot_table(mesh.class_id, cfg.deg_per_push)
    gyro_fwd, gyro_bwd = ctx["gyro_fwd"], ctx["gyro_bwd"]

    def full_step(s):
        x0, x1, cphi, sphi, elem, active = s
        tx, ty, c2, s2 = push_ops.elliptical_push_rot(
            cphi, sphi, bb, elem, rot, cfg.h, cfg.k, cfg.d)
        xt = (jnp.where(active, tx, x0), jnp.where(active, ty, x1))
        eids, _ = search_cellrow(ctx, (x0, x1), xt, elem, active, widths)
        act = active & (eids >= 0)
        ring = scatter_ops.accumulate_to_rings(
            eids, act, mesh.elem2verts, mesh.nverts, gyro.num_rings,
            gyro.rmax)
        fwd = scatter_ops.scatter_to_mapped_verts(
            ring, gyro_fwd, mesh.nverts, gyro.num_rings, gyro.points_per_ring)
        bwd = scatter_ops.scatter_to_mapped_verts(
            ring, gyro_bwd, mesh.nverts, gyro.num_rings, gyro.points_per_ring)
        return (xt[0] + 0 * fwd[0], xt[1] + 0 * bwd[0],
                jnp.where(active, c2, cphi), jnp.where(active, s2, sphi),
                eids, act)

    F0 = (ctx["x0"], ctx["x1"],
          jnp.cos(ctx["phi0"]).astype(jnp.float32),
          jnp.sin(ctx["phi0"]).astype(jnp.float32),
          ctx["elem"], ctx["active"])
    return full_step, F0
