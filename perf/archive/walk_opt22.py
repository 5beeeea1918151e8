"""Round-4 flagship campaign: packed-rec aux-captured rotation A/B + a
fresh in-pipeline stage split at the 176 ms state.

Round-2e rejected walk-captured rotation with the UNPACKED rec channel
(209.1 vs 177.9 ms): +4 peel cols (+~13 ms) were cheaper than the saved
rot gather (~26 ms), but the aux arrays paid per-entry extraction gathers
and merge scatters at every pyramid level.  Round 4 packs the rec channel
into the SAME one-gather extraction and one-scatter merge as elem/fbg/dest
(ops/search.py _run_walk), so the only remaining tax should be the peel
columns.  This harness decides the production default.

Stage probes (evolving-state, one process, python-loop over jitted full
steps — the bench.py measurement mode):
  push_only    : rotation push + state rewrite, no search/deposit
  peel_probe   : + the 14-col cell-rows gather + containment + elem update
  nodeposit    : + the full pyramid walk (full step minus gyro scatter)
  full         : the production dp step (= bench.py flagship)
  full_aux     : same with rot_aux_capture=True (18-col peel, no rot gather)

  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/walk_opt22.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from pumipic_tpu.mesh.locator import build_locator_grid
from pumipic_tpu.models.pseudo_xgcm import (
    GyroConfig, XGCmConfig, make_default_mesh, make_dp_setup,
    resolve_locator_policy, seed_particles_per_element,
    uniform_points_in_elements,
)
from pumipic_tpu.ops import push as push_ops
from pumipic_tpu.ops import scatter as scatter_ops
from pumipic_tpu.ops import search as search_ops
from pumipic_tpu.parallel.mesh_axis import make_device_mesh

N = int(os.environ.get("WO_N", 10_000_000))
ITERS = int(os.environ.get("WO_ITERS", 10))
MESH_E = int(os.environ.get("WO_ELEMS", 24_000))

mesh = make_default_mesh(MESH_E)
cfg_kw = dict(
    num_ptcls=N, mdl_face=max(int(np.asarray(mesh.class_id).max()) // 2, 2),
    deg_per_push=15.0, max_search_iters=64, gyro=GyroConfig(),
)
dm = make_device_mesh(1)


def timeit(name, step, state):
    state, f = step(state)
    jax.block_until_ready(f)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, f = step(state)
    jax.block_until_ready(f)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:56s} {dt:8.2f} ms/step", flush=True)
    return dt


# --- stage probes built on the same seeded state as the dp step
rng = np.random.default_rng(1024 * 1024)
ppe = seed_particles_per_element(mesh, XGCmConfig(**cfg_kw), rng)
elems = np.repeat(np.arange(mesh.nelems), ppe)
pos = uniform_points_in_elements(mesh, elems, np.random.default_rng(512 * 512))
phi0, b0 = push_ops.elliptical_setup(jnp.asarray(pos), 0.0, 0.0, 0.9)
rot = push_ops.elliptical_rot_table(mesh.class_id, 15.0)
cpe, peel, widths = resolve_locator_policy(
    XGCmConfig(**cfg_kw), mesh.nelems, len(elems))
loc = build_locator_grid(np.asarray(mesh.coords), np.asarray(mesh.elem2verts),
                         walk_geom=mesh.walk_geom, peel=peel,
                         cells_per_elem=cpe)

S0 = {
    "x0": jnp.asarray(pos[:, 0], jnp.float32),
    "x1": jnp.asarray(pos[:, 1], jnp.float32),
    "cphi": jnp.cos(phi0).astype(jnp.float32),
    "sphi": jnp.sin(phi0).astype(jnp.float32),
    "b": b0.astype(jnp.float32),
    "elem": jnp.asarray(elems, jnp.int32),
    "active": jnp.ones(len(elems), bool),
}


def push_part(s):
    tx, ty, c2, s2 = push_ops.elliptical_push_rot(
        s["cphi"], s["sphi"], s["b"], s["elem"], rot, 0.0, 0.0, 0.9)
    a = s["active"]
    return ((jnp.where(a, tx, s["x0"]), jnp.where(a, ty, s["x1"])),
            jnp.where(a, c2, s["cphi"]), jnp.where(a, s2, s["sphi"]))


@jax.jit
def step_push_only(s):
    (tx, ty), c2, s2 = push_part(s)
    s2_ = dict(s, x0=tx, x1=ty, cphi=c2, sphi=s2)
    return s2_, tx


@jax.jit
def step_peel_probe(s):
    dest, c2, s2 = push_part(s)
    dx, dy = dest
    g = loc.cell_rows[loc.cell_of(dest)]
    elem_a = g[:, 6].astype(jnp.int32)
    elem_b = g[:, 13].astype(jnp.int32)

    def _inside(o):
        l1 = g[:, o + 0] * dx + g[:, o + 1] * dy + g[:, o + 2]
        l2 = g[:, o + 3] * dx + g[:, o + 4] * dy + g[:, o + 5]
        w0 = 1.0 - l1 - l2
        m1 = (jnp.abs(g[:, o + 0] * dx) + jnp.abs(g[:, o + 1] * dy)
              + jnp.abs(g[:, o + 2]))
        m2 = (jnp.abs(g[:, o + 3] * dx) + jnp.abs(g[:, o + 4] * dy)
              + jnp.abs(g[:, o + 5]))
        t1 = search_ops.BCC_REL_TOL * m1 + search_ops.BCC_ABS_TOL
        t2 = search_ops.BCC_REL_TOL * m2 + search_ops.BCC_ABS_TOL
        return (w0 >= -(t1 + t2)) & (l1 >= -t1) & (l2 >= -t2)

    ia = _inside(0)
    ib = _inside(7)
    e = jnp.where(ia, elem_a, jnp.where(ib, elem_b, s["elem"]))
    s2_ = dict(s, x0=dx, x1=dy, cphi=c2, sphi=s2, elem=e)
    return s2_, e


@jax.jit
def step_nodeposit(s):
    dest, c2, s2 = push_part(s)
    res = search_ops.search_mesh_2d_accel(
        mesh, loc, (s["x0"], s["x1"]), dest, s["elem"], s["active"],
        64, widths=widths)
    act = s["active"] & (res.elem_ids >= 0)
    s2_ = dict(s, x0=res.dest_c[0], x1=res.dest_c[1], cphi=c2, sphi=s2,
               elem=res.elem_ids, active=act)
    return s2_, res.elem_ids


print(f"# N={N} mesh={mesh.nelems} iters={ITERS}", flush=True)
timeit("push_only", step_push_only, dict(S0))
timeit("peel_probe (push + 14-col peel + containment)",
       step_peel_probe, dict(S0))
timeit("nodeposit (push + full search)", step_nodeposit, dict(S0))

# --- production A/B: full dp step, rot gather vs packed aux capture
s_a, step_a = make_dp_setup(mesh, XGCmConfig(**cfg_kw), dm)
t_full = timeit("full (production, rot-table gather)", step_a, s_a)
s_b, step_b = make_dp_setup(
    mesh, XGCmConfig(rot_aux_capture=True, **cfg_kw), dm)
t_aux = timeit("full_aux (packed aux-captured rotation)", step_b, s_b)
print(f"# aux-capture delta: {t_aux - t_full:+.1f} ms", flush=True)
