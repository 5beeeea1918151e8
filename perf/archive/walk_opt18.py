"""Round-3 A/B: slim separating-line peel vs 2-candidate containment rows.

Runs the FULL dp-mode pseudoXGCm step (push + accel search + deposit) at 10M
on the 24k annulus with peel="rows" then peel="lines" in ONE process,
evolving state (docs/PERFORMANCE.md measurement rules).  Optionally a .msh
mesh via WO18_MESH (the 120k workload).

  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/walk_opt18.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

from pumipic_tpu.models.pseudo_xgcm import (
    GyroConfig, XGCmConfig, make_default_mesh, make_dp_setup,
)
from pumipic_tpu.parallel.mesh_axis import make_device_mesh
from pumipic_tpu.mesh.core import Mesh2D


def run(mesh, cfg, device_mesh, iters):
    state, step = make_dp_setup(mesh, cfg, device_mesh)
    state, fields = step(state)
    jax.block_until_ready(fields)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, fields = step(state)
    jax.block_until_ready(fields)
    dt = (time.perf_counter() - t0) / iters * 1e3
    alive = int(jax.device_get(state["active"]).sum())
    return dt, alive


def main():
    n = int(os.environ.get("WO18_PTCLS", 10_000_000))
    iters = int(os.environ.get("WO18_ITERS", 10))
    mesh_path = os.environ.get("WO18_MESH", "")
    modes = os.environ.get("WO18_MODES", "rows,lines").split(",")
    if mesh_path:
        from pumipic_tpu.mesh.gmsh import read_msh

        c, t, cl = read_msh(mesh_path)
        mesh = Mesh2D.from_arrays(c, t, cl)
    else:
        mesh = make_default_mesh(int(os.environ.get("WO18_ELEMS", 24_000)))
    device_mesh = make_device_mesh()
    cpe = float(os.environ.get("WO18_CPE", 16.0))
    widths = os.environ.get("WO18_WIDTHS", "")
    widths = (tuple(int(w) for w in widths.split("/")) if widths else None)
    for peel in modes:
        cfg = XGCmConfig(
            num_ptcls=n,
            mdl_face=max(int(np.asarray(mesh.class_id).max()) // 2, 2),
            deg_per_push=15.0,
            max_search_iters=64,
            gyro=GyroConfig(),
            peel=peel.strip(),
            locator_cpe=cpe,
            search_widths=widths,
        )
        dt, alive = run(mesh, cfg, device_mesh, iters)
        print(f"peel={peel} cpe={cpe} widths={widths}: {dt:.1f} ms/step  "
              f"alive={alive}  ({n/dt*1e3/1e6:.1f}M ptcl-steps/s)",
              flush=True)


if __name__ == "__main__":
    main()
