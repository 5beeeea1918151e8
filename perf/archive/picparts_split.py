"""Round-3 picparts-gap profiler (VERDICT #1): where do the +81 ms go at
R=1 (259.0 picparts vs 177.9 dp at 10M/24k)?

Builds the REAL picparts step pieces (same modules as
make_picparts_setup) but assembles variants with components disabled:

  full     — the production step (baseline)
  nodest   — set_unsafe_procs replaced by dest=me (skips safe/owner gathers)
  nomig    — nodest + apply post-search elems directly (no migrate call)
  nosync   — nomig + no reduce_comm_array / stats (raw scatter out)
  dp       — the flagship dp step for reference

Run on the TPU:  PYTHONPATH=/root/repo:$PYTHONPATH python perf/picparts_split.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

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
from pumipic_tpu.parallel.mesh_axis import RANK_AXIS, make_device_mesh


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
    variants = os.environ.get(
        "PS_VARIANTS", "full,nodest,nomig,nosync,dp").split(",")

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
    device_mesh = make_device_mesh()
    gyro = cfg.gyro

    pp, state0, gyro_map, full_step = make_picparts_setup(
        coords, tris, cls, cfg, device_mesh, use_lb=True
    )
    R = 1

    # rebuild the per-rank pieces exactly as make_picparts_setup does
    from pumipic_tpu.mesh.locator import build_locator_grid

    lmesh0 = jax.tree_util.tree_map(lambda a: a[0], pp.mesh)
    eg0 = np.asarray(pp.elem_gid[0])
    rot = push_ops.elliptical_rot_table(lmesh0.class_id, cfg.deg_per_push)
    loc = build_locator_grid(
        np.asarray(lmesh0.coords), np.asarray(lmesh0.elem2verts),
        walk_geom=lmesh0.walk_geom, peel=cfg.peel)
    gmap0 = gyro_map[0]

    def make_variant(kind):
        @jax.jit
        @partial(jax.shard_map, mesh=device_mesh,
                 in_specs=(P(RANK_AXIS), P(RANK_AXIS)),
                 out_specs=(P(RANK_AXIS), P()), check_vma=False)
        def step(pp_l, s):
            lpp = ppm.local_view(pp_l)
            lmesh = lpp.mesh
            s = ppm.local_view(s)
            me = jax.lax.axis_index(RANK_AXIS).astype(jnp.int32)
            elem, active = s["elem"], s["active"]
            tx, ty, cphi_new, sphi_new = push_ops.elliptical_push_rot(
                s["cphi"], s["sphi"], s["b"], elem, rot,
                cfg.h, cfg.k, cfg.d)
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
            if kind == "nodest":
                dest = jnp.full(elem.shape, 0, jnp.int32) + me * 0
                mres = mig.migrate(
                    mid, res.elem_ids, dest, lpp.elem_gid,
                    lpp.elem_gid_sorted, lpp.elem_gid_perm, me, R,
                    max(s["elem"].shape[0] // 8, 64))
                s2 = mres.state
            elif kind in ("nomig", "nosync"):
                s2 = dict(mid)
            else:  # full-ish: dest + migrate
                dest = mig.set_unsafe_procs(
                    lpp.elem_safe, lpp.elem_owner, res.elem_ids,
                    mid["active"], me)
                mres = mig.migrate(
                    mid, res.elem_ids, dest, lpp.elem_gid,
                    lpp.elem_gid_sorted, lpp.elem_gid_perm, me, R,
                    max(s["elem"].shape[0] // 8, 64))
                s2 = mres.state
            fwd = scatter_ops.gyro_scatter(
                s2["elem"], s2["active"], lmesh.elem2verts, gmap0,
                lmesh.nverts, gyro.num_rings, gyro.points_per_ring,
                gyro.rmax)
            if kind == "nosync":
                out = {"fwd": fwd[None]}
            else:
                fwd = red.reduce_comm_array(
                    lpp.vert_send_ids, lpp.vert_recv_ids, fwd, red.Op.SUM)
                nloc = jnp.sum(s2["active"].astype(jnp.int32))
                _, _, imb = ptcl_imbalance(nloc)
                out = {"fwd": fwd[None],
                       "alive": jax.lax.psum(nloc, RANK_AXIS),
                       "imb": imb}
            return jax.tree_util.tree_map(lambda a: a[None], s2), out

        return lambda s: step(pp, s)

    for kind in variants:
        kind = kind.strip()
        if kind == "dp":
            mesh = make_default_mesh(mesh_elems)
            st, step = make_dp_setup(mesh, cfg, device_mesh)
            dt = bench(step, st, iters)
        elif kind == "full":
            dt = bench(
                lambda s: (lambda st, fwd, stats: (st, fwd))(*full_step(s)),
                state0, iters)
        else:
            dt = bench(make_variant(kind), state0, iters)
        print(f"{kind}: {dt:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
