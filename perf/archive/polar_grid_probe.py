"""Host-side probe: peel candidate hit rate, polar vs cartesian locator
cells, on the shaped (non-structured) meshes where the walk is the
production path (the 120k tokamak workload; the structured annulus takes
the analytic locate and never builds a grid).

For K random in-domain points per cell budget, reports the fraction whose
true element is candidate A or B of their cell — the peel hit rate that
determines the walk's straggler volume.  Pure numpy; decision-grade TPU
A/B happens in bench.py BENCH_MESH runs.

  PYTHONPATH="/root/repo:$PYTHONPATH" JAX_PLATFORMS=cpu python perf/polar_grid_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from pumipic_tpu.mesh.core import Mesh2D
from pumipic_tpu.mesh.gmsh import read_msh
from pumipic_tpu.mesh.locator import (
    _host_walk,
    build_locator_grid,
)

MESH = os.environ.get("PG_MESH", "data/xgc_like_120k.msh.gz")
N = int(os.environ.get("PG_N", 200_000))


def hit_rate(grid, mesh, pts, true_elem):
    cell = np.asarray(grid.cell_of((pts[:, 0], pts[:, 1])))
    if grid.cell_rows is not None and grid.cell_rows.shape[1] >= 14:
        rows = np.asarray(grid.cell_rows)
        a = rows[cell, 6].astype(np.int64)
        b = rows[cell, 13].astype(np.int64)
    elif grid.cell_lines is not None:
        rows = np.asarray(grid.cell_lines)
        a = rows[cell, 3].astype(np.int64)
        b = rows[cell, 4].astype(np.int64)
    else:
        raise ValueError("no candidate rows attached")
    return float(((true_elem == a) | (true_elem == b)).mean())


def main():
    coords, tris, cls = read_msh(MESH)
    mesh = Mesh2D.from_arrays(coords, tris, cls)
    ch = np.asarray(mesh.coords)
    evh = np.asarray(mesh.elem2verts)
    wg = np.asarray(mesh.walk_geom)
    E = evh.shape[0]
    print(f"mesh: {E} elems ({MESH})")

    # ground truth: random points inside random elements (barycentric)
    rng = np.random.default_rng(42)
    te = rng.integers(0, E, N)
    w = rng.dirichlet((1.0, 1.0, 1.0), N)
    pts = (ch[evh[te]] * w[:, :, None]).sum(axis=1)

    cpes = tuple(float(x) for x in os.environ.get(
        "PG_CPES", "2,4").split(","))
    for cpe in cpes:
        for polar in (False, True):
            g = build_locator_grid(ch, evh, walk_geom=wg,
                                   cells_per_elem=cpe, peel="rows",
                                   polar=polar)
            hr = hit_rate(g, mesh, pts, te)
            n_cells = int(np.asarray(g.cell_elem).shape[0])
            lbl = "polar" if polar else "cart "
            print(f"cpe={cpe:4.0f} {lbl}: hit={hr * 100:6.2f}%  "
                  f"cells={n_cells}  rows_mb="
                  f"{n_cells * 14 * 4 / 1e6:.1f}")


if __name__ == "__main__":
    main()
