"""Picparts-gap isolation, part 3: the ANALYTIC fused-route step at R=1.

After round-4d's route fusion the R=1 picparts-vs-dp premium is 56 ms
(79.7 vs 23.5 at 10M, capf1.05).  At R=1 both migrate() and repartition()
take static early-outs, so the candidates are: the fused [g2l|route]
(E_global, 2) row gather, route_decode arithmetic, the gyroSync
reduceCommArray, the stats collectives, and the 1.05x capacity width.

Variants (one process, 10 evolving steps each, block on state+outputs):
  prod       — production make_picparts_setup step (use_lb=True)
  nolb       — production with use_lb=False (expect ~0: static early-out)
  core       — harness replica of the production analytic step (sanity)
  nog2l      — lid = global id, route = constant safe/owner=me (no gather)
  nosync     — core minus reduceCommArray gyroSync
  nostats    — core with alive-only stats (no all_gathers/psums)
  nodep      — core minus gyroScatter+gyroSync (deposit block)
  dp         — flagship dp step (the 23.5 ms base)

PYTHONPATH=/root/repo:$PYTHONPATH python perf/picparts_split3.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from pumipic_tpu.mesh.generate import annulus_mesh
from pumipic_tpu.models.pseudo_xgcm import (
    GyroConfig, XGCmConfig, make_default_mesh, make_dp_setup,
    make_picparts_setup,
)
from pumipic_tpu.mesh.locator import detect_annulus_structured
from pumipic_tpu.ops import push as push_ops
from pumipic_tpu.ops import scatter as scatter_ops
from pumipic_tpu.ops import search as search_ops
from pumipic_tpu.parallel import migrate as mig
from pumipic_tpu.parallel import picparts as ppm
from pumipic_tpu.parallel import reduce as red
from pumipic_tpu.parallel.balancer import ptcl_imbalance
from pumipic_tpu.parallel.mesh_axis import RANK_AXIS, make_device_mesh


def bench(step, state, iters):
    state, out = step(state)
    jax.block_until_ready((state, out))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = step(state)
    jax.block_until_ready((state, out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    n = int(os.environ.get("PS_PTCLS", 10_000_000))
    iters = int(os.environ.get("PS_ITERS", 10))
    mesh_elems = int(os.environ.get("PS_ELEMS", 24_000))
    capf = float(os.environ.get("PS_CAPF", 1.05))

    n_rings = max(int(np.sqrt(mesh_elems / 8)), 2)
    n_sectors = mesh_elems // (2 * n_rings)
    coords, tris, cls = annulus_mesh(n_rings, n_sectors, 0.3, 1.0)
    cfg = XGCmConfig(
        num_ptcls=n,
        mdl_face=max(int(cls.max()) // 2, 2),
        deg_per_push=15.0,
        max_search_iters=64,
    )
    device_mesh = make_device_mesh()
    R = int(np.prod([device_mesh.shape[a] for a in device_mesh.axis_names]))
    assert R == 1, "this split harness reasons about the R=1 premium"

    results = {}

    # --- production arms
    pp, state0, gyro_map, pstep = make_picparts_setup(
        coords, tris, cls, cfg, device_mesh, use_lb=True, cap_factor=capf)

    def pwrap(s):
        s, fwd, stats = pstep(s)
        return s, (fwd, stats["alive"])

    results["prod"] = bench(pwrap, state0, iters)
    print(f"prod      {results['prod']:8.2f} ms", flush=True)

    _, state_nl, _, pstep_nl = make_picparts_setup(
        coords, tris, cls, cfg, device_mesh, use_lb=False, cap_factor=capf)

    def pwrap_nl(s):
        s, fwd, stats = pstep_nl(s)
        return s, (fwd, stats["alive"])

    results["nolb"] = bench(pwrap_nl, state_nl, iters)
    print(f"nolb      {results['nolb']:8.2f} ms", flush=True)

    # --- harness replica with toggles.  Rebuild the tables the setup binds.
    from jax.sharding import NamedSharding, PartitionSpec as P

    analytic = detect_annulus_structured(coords, tris, cls=cls)
    assert analytic is not None and analytic.ring_class
    gmesh_nelems = tris.shape[0]
    elem_gid_h = np.asarray(pp.elem_gid)
    g2l_h = np.full((R, gmesh_nelems), -1, np.int32)
    for r in range(R):
        valid = elem_gid_h[r] >= 0
        g2l_h[r][elem_gid_h[r][valid]] = np.nonzero(valid)[0]
    # fused [g2l | route] rows, exactly as the setup builds them
    route_rows = np.zeros((R, gmesh_nelems, 2), np.int32)
    for r in range(R):
        route = np.asarray(mig.pack_route(
            pp.elem_safe[r], pp.elem_owner[r], None, R)).astype(np.int64)
        route_rows[r, :, 0] = g2l_h[r]
        valid = g2l_h[r] >= 0
        route_rows[r, valid, 1] = route[g2l_h[r][valid]]
    sharding = NamedSharding(device_mesh, P(RANK_AXIS))
    g2l_tbl = jax.device_put(jnp.asarray(route_rows), sharding)
    gyro = cfg.gyro

    def make_step(g2l=True, sync=True, stats_full=True, deposit=True):
        @jax.jit
        @partial(jax.shard_map, mesh=device_mesh,
                 in_specs=(P(RANK_AXIS), P(RANK_AXIS), P(RANK_AXIS),
                           P(RANK_AXIS)),
                 out_specs=(P(RANK_AXIS), P(RANK_AXIS), P()),
                 check_vma=False)
        def step(pp_l, gmap_l, g2l_l, s):
            lpp = ppm.local_view(pp_l)
            lmesh = lpp.mesh
            s = ppm.local_view(s)
            gmap = gmap_l[0]
            me = jax.lax.axis_index(RANK_AXIS).astype(jnp.int32)
            active = s["active"]

            cd, sd = push_ops.rot_vals_from_class(
                analytic.class_of(jnp.maximum(s["gelem"], 0)),
                cfg.deg_per_push)
            tx, ty, cphi_new, sphi_new = push_ops.elliptical_push_rot_vals(
                s["cphi"], s["sphi"], s["b"], cd, sd, cfg.h, cfg.k, cfg.d)
            xtgt = (jnp.where(active, tx, s["x0"]),
                    jnp.where(active, ty, s["x1"]))
            e_gl, _ins = analytic.locate(xtgt)
            e_gl = jnp.where(active, e_gl, search_ops.INVALID)
            if g2l:
                g_row = g2l_l[0][jnp.maximum(e_gl, 0)]
                lid = jnp.where(e_gl >= 0, g_row[:, 0], search_ops.INVALID)
                route_v = g_row[:, 1].astype(jnp.float32)
            else:
                lid = e_gl
                route_v = jnp.full_like(
                    e_gl, 3 * R, jnp.float32) + me.astype(jnp.float32)
            gelem_new = jnp.where(lid >= 0, e_gl, search_ops.INVALID)

            mid = {
                "x0": xtgt[0], "x1": xtgt[1],
                "cphi": jnp.where(active, cphi_new, s["cphi"]),
                "sphi": jnp.where(active, sphi_new, s["sphi"]),
                "b": s["b"], "pid": s["pid"], "elem": lid,
                "active": active & (lid >= 0), "gelem": gelem_new,
            }
            dest, sbar_p, noncore_p = mig.route_decode(
                route_v, mid["active"], me, R)
            mres = mig.migrate(
                mid, lid, dest, lpp.elem_gid, lpp.elem_gid_sorted,
                lpp.elem_gid_perm, me, R, 64, plan=None)
            s2 = mres.state

            if deposit:
                fwd = scatter_ops.gyro_scatter(
                    s2["elem"], s2["active"], lmesh.elem2verts, gmap,
                    lmesh.nverts, gyro.num_rings, gyro.points_per_ring,
                    gyro.rmax)
                if sync:
                    fwd = red.reduce_comm_array(
                        lpp.vert_send_ids, lpp.vert_recv_ids, fwd,
                        red.Op.SUM)
            else:
                fwd = jnp.zeros((lmesh.nverts,), jnp.float32) + jnp.sum(
                    s2["x0"])
            nloc = jnp.sum(s2["active"].astype(jnp.int32))
            if stats_full:
                _, _, imb = ptcl_imbalance(nloc)
                stats = {
                    "alive": jax.lax.psum(nloc, RANK_AXIS),
                    "sent": jax.lax.psum(mres.num_sent, RANK_AXIS),
                    "overflow": jax.lax.pmax(
                        mres.overflow.astype(jnp.int32), RANK_AXIS),
                    "imbalance": imb,
                    "alive_per_rank": jax.lax.all_gather(nloc, RANK_AXIS),
                    "sent_per_rank": jax.lax.all_gather(
                        mres.num_sent, RANK_AXIS),
                }
            else:
                stats = {"alive": jax.lax.psum(nloc, RANK_AXIS)}
            return (jax.tree_util.tree_map(lambda a: a[None], s2),
                    fwd[None], stats)

        return lambda s: step(pp, gyro_map, g2l_tbl, s)

    variants = [
        ("core", dict()),
        ("nog2l", dict(g2l=False)),
        ("nosync", dict(sync=False)),
        ("nostats", dict(stats_full=False)),
        ("nodep", dict(deposit=False)),
    ]
    for name, kw in variants:
        vstep = make_step(**kw)

        def vwrap(s, _vs=vstep):
            s, fwd, stats = _vs(s)
            return s, (fwd, stats["alive"])

        results[name] = bench(vwrap, state0, iters)
        print(f"{name:9s} {results[name]:8.2f} ms", flush=True)

    # --- dp base
    mesh = make_default_mesh(mesh_elems)
    dstate, dstep = make_dp_setup(mesh, cfg, device_mesh)
    results["dp"] = bench(dstep, dstate, iters)
    print(f"dp        {results['dp']:8.2f} ms", flush=True)

    print("\n=== split (ms) ===")
    for k, v in results.items():
        print(f"{k:9s} {v:8.2f}")
    c = results["core"]
    print(f"\ng2l gather : {c - results['nog2l']:+8.2f}")
    print(f"gyroSync   : {c - results['nosync']:+8.2f}")
    print(f"stats      : {c - results['nostats']:+8.2f}")
    print(f"deposit+syn: {c - results['nodep']:+8.2f}")
    print(f"lb         : {results['prod'] - results['nolb']:+8.2f}")
    print(f"replica-vs-prod: {c - results['prod']:+8.2f}")
    print(f"picparts-vs-dp : {results['prod'] - results['dp']:+8.2f}")


if __name__ == "__main__":
    main()
