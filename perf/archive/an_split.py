"""Stage split of the ANALYTIC-locate flagship step (the 23.5 ms state):
truncated pipelines with evolving state, one process, so the deltas
attribute cost per stage (docs/PERFORMANCE.md measurement rules).

Stages: push (gather-free ring rotation) -> analytic locate ->
DPS-flat rebuild (where-updates) -> ring histogram (MXU) ->
2x mapped vertex scatter (mesh-rate).

  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/an_split.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("AS_PTCLS", 10_000_000))
ITERS = int(os.environ.get("AS_ITERS", 10))


def main():
    from pumipic_tpu.mesh.locator import detect_annulus_structured
    from pumipic_tpu.models.pseudo_xgcm import (
        ELEMENT_SEED, PARTICLE_SEED, XGCmConfig, build_gyro_mappings,
        make_default_mesh, seed_particles_per_element,
        uniform_points_in_elements,
    )
    from pumipic_tpu.ops import push as push_ops
    from pumipic_tpu.ops import scatter as scatter_ops
    from pumipic_tpu.ops.search import INVALID

    mesh = make_default_mesh(24000)
    cfg = XGCmConfig(
        num_ptcls=N, mdl_face=max(int(np.asarray(mesh.class_id).max()) // 2, 2),
        deg_per_push=15.0)
    analytic = detect_annulus_structured(
        np.asarray(mesh.coords), np.asarray(mesh.elem2verts),
        cls=np.asarray(mesh.class_id))
    assert analytic is not None and analytic.ring_class
    gyro = cfg.gyro
    gyro_fwd, gyro_bwd = build_gyro_mappings(mesh, gyro)

    rng = np.random.default_rng(ELEMENT_SEED)
    ppe = seed_particles_per_element(mesh, cfg, rng)
    pe = np.repeat(np.arange(mesh.nelems), ppe)
    pos = uniform_points_in_elements(
        mesh, pe, np.random.default_rng(PARTICLE_SEED))
    phi, b = push_ops.elliptical_setup(
        jnp.asarray(pos), cfg.h, cfg.k, cfg.d)
    state0 = {
        "x0": jnp.asarray(pos[:, 0], jnp.float32),
        "x1": jnp.asarray(pos[:, 1], jnp.float32),
        "cphi": jnp.cos(phi).astype(jnp.float32),
        "sphi": jnp.sin(phi).astype(jnp.float32),
        "b": b.astype(jnp.float32),
        "elem": jnp.asarray(pe, jnp.int32),
        "active": jnp.ones(len(pe), bool),
    }

    def stage_step(s, upto):
        elem, active = s["elem"], s["active"]
        cd, sd = push_ops.rot_vals_from_class(
            analytic.class_of(jnp.maximum(elem, 0)), cfg.deg_per_push)
        tx, ty, cphi_new, sphi_new = push_ops.elliptical_push_rot_vals(
            s["cphi"], s["sphi"], s["b"], cd, sd, cfg.h, cfg.k, cfg.d)
        xtgt = (jnp.where(active, tx, s["x0"]),
                jnp.where(active, ty, s["x1"]))
        if upto == "push":
            # carry rotated positions/phases; keep elem fixed
            return dict(s, x0=xtgt[0], x1=xtgt[1],
                        cphi=jnp.where(active, cphi_new, s["cphi"]),
                        sphi=jnp.where(active, sphi_new, s["sphi"])), None
        e_an, _ins = analytic.locate(xtgt)
        new_elem = jnp.where(active, e_an, INVALID)
        new_active = new_elem >= 0
        ns = dict(s, x0=xtgt[0], x1=xtgt[1],
                  cphi=jnp.where(active, cphi_new, s["cphi"]),
                  sphi=jnp.where(active, sphi_new, s["sphi"]),
                  elem=new_elem, active=new_active)
        if upto == "locate":
            return ns, None
        ring = scatter_ops.accumulate_to_rings(
            new_elem, new_active, mesh.elem2verts, mesh.nverts,
            gyro.num_rings, gyro.rmax)
        if upto == "hist":
            return ns, ring.sum()
        fwd = scatter_ops.scatter_to_mapped_verts(
            ring, gyro_fwd, mesh.nverts, gyro.num_rings,
            gyro.points_per_ring)
        bwd = scatter_ops.scatter_to_mapped_verts(
            ring, gyro_bwd, mesh.nverts, gyro.num_rings,
            gyro.points_per_ring)
        return ns, (fwd, bwd)

    prev = None
    for upto in ("push", "locate", "hist", "full"):
        step = jax.jit(lambda s, u=upto: stage_step(s, u))
        s = state0
        s, out = step(s)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s, out = step(s)
        jax.block_until_ready((s, out))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        delta = "" if prev is None else f"  (+{dt - prev:.2f})"
        print(f"{upto:8s}: {dt:7.3f} ms/step{delta}", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
