"""Round-3c: rotation-table shape A/B — (E,2) row gather vs 1-D sinΔ.

The push's (N,2) rotation row-gather output gets a T(8,128) tiled layout
(64x padded HBM traffic; the same narrow-gather tax as the rebuild meta
fusion).  The 1-D variant gathers sinΔ only (padding-free) and recomputes
cosΔ = sqrt(1-sin²) elementwise — exact for Δ in (0°, deg].  Both
variants run the FULL dp step in ONE process (measurement rules).

  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/walk_opt20.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

from pumipic_tpu.models import pseudo_xgcm as px
from pumipic_tpu.parallel.mesh_axis import make_device_mesh

N = int(os.environ.get("WO20_PTCLS", 10_000_000))
ITERS = int(os.environ.get("WO20_ITERS", 10))


def main():
    mesh = px.make_default_mesh(int(os.environ.get("WO20_ELEMS", 24_000)))
    device_mesh = make_device_mesh()
    cfg = px.XGCmConfig(
        num_ptcls=N,
        mdl_face=max(int(np.asarray(mesh.class_id).max()) // 2, 2),
        deg_per_push=15.0,
        max_search_iters=64,
        gyro=px.GyroConfig(),
    )
    results = {}
    for flag in (False, True):
        px.ROT_TABLE_1D = flag
        state, step = px.make_dp_setup(mesh, cfg, device_mesh)
        state, fields = step(state)
        jax.block_until_ready(fields)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, fields = step(state)
        jax.block_until_ready(fields)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        alive = int(jax.device_get(state["active"]).sum())
        results[flag] = (dt, alive, state)
        print(f"rot_1d={int(flag)}: {dt:.1f} ms/step  alive={alive}",
              flush=True)
    # trajectory agreement after 11 steps (sqrt-recomputed cos must track)
    s0, s1 = results[False][2], results[True][2]
    dx = float(jax.device_get(abs(s0["x0"] - s1["x0"]).max()))
    same_elem = float(jax.device_get(
        (s0["elem"] == s1["elem"]).astype("float32").mean()))
    print(f"trajectory: max|dx|={dx:.2e}, same-elem frac={same_elem:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
