"""Isolate the BandGrid2D ψ-evaluation cost on the TPU: fori-fused evolving
loop computing ONLY cell_of() (consumed), band vs cartesian grid at 10M —
attributes the round-5 arm-1 regression (313.9 vs 217.2 ms) between the
band peel's gather and the analytic band evaluation.

  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/band_eval_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from pumipic_tpu.mesh.core import Mesh2D
from pumipic_tpu.mesh.gmsh import read_msh
from pumipic_tpu.mesh.locator import build_locator_grid, detect_banded_locator

N = int(os.environ.get("BE_N", 10_000_000))
ITERS = int(os.environ.get("BE_ITERS", 10))
MESH = os.environ.get("BE_MESH", "data/xgc_like_120k.msh.gz")


def main():
    coords, tris, cls = read_msh(MESH)
    mesh = Mesh2D.from_arrays(coords, tris, cls)
    bg = detect_banded_locator(np.asarray(coords), np.asarray(tris),
                               np.asarray(cls), mesh.walk_geom)
    print(f"band grid: K={bg.n_bands} T={bg.n_theta} J={bg.n_harm} "
          f"P={bg.n_cheb} rank={bg.rank}", flush=True)
    cg = build_locator_grid(np.asarray(coords), np.asarray(tris),
                            walk_geom=mesh.walk_geom, cells_per_elem=4.0)

    rng = np.random.default_rng(0)
    r0 = rng.uniform(0.3, 0.9, N).astype(np.float32)
    t0_ = rng.uniform(0, 2 * np.pi, N).astype(np.float32)
    px = (r0 * np.cos(t0_)).astype(np.float32)
    py = (r0 * np.sin(t0_)).astype(np.float32)

    def run(name, cell_fn, peel_rows=None):
        @jax.jit
        def loop(px, py):
            def body(_, carry):
                x, y, acc = carry
                c = cell_fn((x, y))
                if peel_rows is not None:
                    g = peel_rows[c]
                    acc = acc + g[:, 0]
                    # evolve from gathered data (dependency chain)
                    x = x + 1e-6 * g[:, 1]
                else:
                    acc = acc + c.astype(jnp.float32)
                    x = x + 1e-7 * (c % 3).astype(jnp.float32)
                y = y - 1e-7
                return x, y, acc

            x, y, acc = jax.lax.fori_loop(
                0, ITERS, body, (px, py, jnp.zeros((N,), jnp.float32)))
            return acc.sum() + x.sum()

        out = loop(jnp.asarray(px), jnp.asarray(py))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = loop(jnp.asarray(px) * 1.0000001, jnp.asarray(py))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:44s} {dt:8.2f} ms/pass", flush=True)
        return dt

    run("cartesian cell_of (index arithmetic)", cg.cell_of)
    run("band cell_of (harmonics + bisection)", bg.cell_of)
    run("cartesian cell_of + 14-col rows gather", cg.cell_of, cg.cell_rows)
    run("band cell_of + 14-col rows gather", bg.cell_of, bg.cell_rows)


if __name__ == "__main__":
    main()
