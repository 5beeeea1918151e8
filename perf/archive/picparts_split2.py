"""Picparts-gap isolation, part 2: args-vs-constants.

The part-1 split (perf/picparts_split.py) showed the +90 ms R=1 gap is NOT
in set_unsafe_procs / migrate / reduce — variants removing them ran no
faster (within relay noise).  Remaining structural difference vs the dp
step: every table (mesh walk rows, locator cells, gyro map, rot) reaches
the picparts step as a SHARD_MAP ARGUMENT sliced with [0], while the dp
step closes over them as jit constants.

Variants:
  full    — production picparts step (tables as sharded args)
  full2   — same again (in-process variance check)
  const   — IDENTICAL math, but every table a closure constant (R=1)
  dp      — flagship dp step

PYTHONPATH=/root/repo:$PYTHONPATH python perf/picparts_split2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from pumipic_tpu.mesh.generate import annulus_mesh
from pumipic_tpu.models.pseudo_xgcm import (
    GyroConfig, XGCmConfig, make_default_mesh, make_dp_setup,
    make_picparts_setup,
)
from pumipic_tpu.ops import push as push_ops
from pumipic_tpu.ops import scatter as scatter_ops
from pumipic_tpu.ops import search as search_ops
from pumipic_tpu.parallel import migrate as mig
from pumipic_tpu.parallel import picparts as ppm
from pumipic_tpu.parallel import reduce as red
from pumipic_tpu.parallel.balancer import ptcl_imbalance


def bench(step, state, iters):
    state, out = step(state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = step(state)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    n = int(os.environ.get("PS_PTCLS", 10_000_000))
    iters = int(os.environ.get("PS_ITERS", 8))
    mesh_elems = int(os.environ.get("PS_ELEMS", 24_000))

    n_rings = max(int(np.sqrt(mesh_elems / 8)), 2)
    n_sectors = mesh_elems // (2 * n_rings)
    coords, tris, cls = annulus_mesh(n_rings, n_sectors, 0.3, 1.0)
    cfg = XGCmConfig(
        num_ptcls=n,
        mdl_face=max(int(cls.max()) // 2, 2),
        deg_per_push=15.0,
        max_search_iters=64,
        gyro=GyroConfig(),
    )
    from pumipic_tpu.parallel.mesh_axis import make_device_mesh

    device_mesh = make_device_mesh()
    gyro = cfg.gyro

    pp, state0, gyro_map, full_step = make_picparts_setup(
        coords, tris, cls, cfg, device_mesh, use_lb=True
    )
    R = 1

    # everything-as-constants variant (valid at R=1 only)
    from pumipic_tpu.mesh.locator import build_locator_grid

    lmesh = jax.tree_util.tree_map(lambda a: np.asarray(a[0]), pp.mesh)
    lmesh = jax.tree_util.tree_map(jnp.asarray, lmesh)
    rot = push_ops.elliptical_rot_table(lmesh.class_id, cfg.deg_per_push)
    loc = build_locator_grid(
        np.asarray(lmesh.coords), np.asarray(lmesh.elem2verts),
        walk_geom=lmesh.walk_geom, peel=cfg.peel,
        cells_per_elem=cfg.locator_cpe)
    gmap = jnp.asarray(gyro_map[0])
    route = mig.pack_route(
        jnp.asarray(pp.elem_safe[0]), jnp.asarray(pp.elem_owner[0]),
        None, R)
    vsend = jnp.asarray(pp.vert_send_ids[0])
    vrecv = jnp.asarray(pp.vert_recv_ids[0])

    @jax.jit
    def const_step(s):
        s = {k: v[0] for k, v in s.items()}
        me = jnp.int32(0)
        elem, active = s["elem"], s["active"]
        tx, ty, cphi_new, sphi_new = push_ops.elliptical_push_rot(
            s["cphi"], s["sphi"], s["b"], elem, rot, cfg.h, cfg.k, cfg.d)
        xtgt = (jnp.where(active, tx, s["x0"]),
                jnp.where(active, ty, s["x1"]))
        res = search_ops.search_mesh_2d_accel(
            lmesh, loc, (s["x0"], s["x1"]), xtgt, elem, active,
            cfg.max_search_iters)
        mid = {
            "x0": res.dest_c[0], "x1": res.dest_c[1],
            "cphi": jnp.where(active, cphi_new, s["cphi"]),
            "sphi": jnp.where(active, sphi_new, s["sphi"]),
            "b": s["b"], "pid": s["pid"],
            "elem": res.elem_ids,
            "active": active & (res.elem_ids >= 0),
        }
        dest, _, _ = mig.route_particles(
            route, res.elem_ids, mid["active"], me, R)
        mres = mig.migrate(
            mid, res.elem_ids, dest,
            jnp.asarray(pp.elem_gid[0]), jnp.asarray(pp.elem_gid_sorted[0]),
            jnp.asarray(pp.elem_gid_perm[0]), me, R,
            max(s["elem"].shape[0], 64) // 8)
        s2 = mres.state
        fwd = scatter_ops.gyro_scatter(
            s2["elem"], s2["active"], lmesh.elem2verts, gmap,
            lmesh.nverts, gyro.num_rings, gyro.points_per_ring, gyro.rmax)
        # R=1: reduce/psums degenerate; keep the same calls minus collectives
        nloc = jnp.sum(s2["active"].astype(jnp.int32))
        return ({k: v[None] for k, v in s2.items()},
                {"fwd": fwd, "alive": nloc})

    for kind in ("full", "full2", "const", "dp"):
        if kind == "dp":
            mesh = make_default_mesh(mesh_elems)
            st, step = make_dp_setup(mesh, cfg, device_mesh)
            dt = bench(step, st, iters)
        elif kind == "const":
            dt = bench(const_step, state0, iters)
        else:
            dt = bench(
                lambda s: (lambda st, fwd, stats: (st, fwd))(*full_step(s)),
                state0, iters)
        print(f"{kind}: {dt:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
