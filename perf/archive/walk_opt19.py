"""Round-3 big-mesh locator sweep: arbitrary (peel, cpe, widths) configs in
ONE process (per-config processes recompile everything and can wedge the
relay; docs/PERFORMANCE.md measurement rules).

The 120k workload sits at 275.9 ms with cpe4 + lines + (N/8, N/128, 2048);
VERDICT r2 asked <= 250.  Remaining grid: rows at cpe2/cpe4 (the cpe2 cell
table is 13.4 MB -- near the sub-cliff band -- with a ~14% miss tail that a
wide first pyramid level absorbs), lines at cpe2.

  WO19_MESH=data/xgc_like_120k.msh.gz \
  WO19_CONFIGS="rows:4:n8/n128/2048,rows:2:n4/n64/2048" \
  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/walk_opt19.py

Width tokens: n<k> means num_ptcls // k; plain integers pass through.
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


def parse_widths(spec: str, n: int):
    if not spec:
        return None
    out = []
    for tok in spec.split("/"):
        tok = tok.strip()
        out.append(n // int(tok[1:]) if tok.startswith("n") else int(tok))
    return tuple(out)


def main():
    n = int(os.environ.get("WO19_PTCLS", 10_000_000))
    iters = int(os.environ.get("WO19_ITERS", 10))
    mesh_path = os.environ.get("WO19_MESH", "data/xgc_like_120k.msh.gz")
    configs = os.environ.get(
        "WO19_CONFIGS",
        "rows:4:n8/n128/2048,rows:2:n4/n64/2048,lines:2:n4/n64/2048",
    )
    if mesh_path:
        from pumipic_tpu.mesh.gmsh import read_msh

        c, t, cl = read_msh(mesh_path)
        mesh = Mesh2D.from_arrays(c, t, cl)
    else:
        mesh = make_default_mesh(int(os.environ.get("WO19_ELEMS", 24_000)))
    device_mesh = make_device_mesh()

    for spec in configs.split(","):
        peel, cpe, widths = spec.strip().split(":")
        cfg = XGCmConfig(
            num_ptcls=n,
            mdl_face=max(int(np.asarray(mesh.class_id).max()) // 2, 2),
            deg_per_push=15.0,
            max_search_iters=64,
            gyro=GyroConfig(),
            peel=peel,
            locator_cpe=float(cpe),
            search_widths=parse_widths(widths, n),
        )
        state, step = make_dp_setup(mesh, cfg, device_mesh)
        state, fields = step(state)
        jax.block_until_ready(fields)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, fields = step(state)
        jax.block_until_ready(fields)
        dt = (time.perf_counter() - t0) / iters * 1e3
        alive = int(jax.device_get(state["active"]).sum())
        print(f"{spec}: {dt:.1f} ms/step  alive={alive}  "
              f"({n / dt * 1e3 / 1e6:.1f}M ptcl-steps/s)", flush=True)


if __name__ == "__main__":
    main()
