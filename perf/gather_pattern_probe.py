"""Why does the 14-col peel gather cost 105 ms from the 10.3 MB band
table but 72 ms from the 27.4 MB cartesian table (perf/band_bench_diag,
round 5)?  Controlled in-process A/B: same fori-fused evolving harness,
gather cost vs {table row count} x {index pattern}:

- real band indices / real cart indices (the bench population),
- uniform random indices,
- sorted copies of the real indices (locality upper bound),

each against tables of the band shape (184320, 14) and the cart shape
(489958, 14).  Indices evolve by +-1 per pass to defeat relay caching.

  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/gather_pattern_probe.py
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

N = int(os.environ.get("GP_N", 10_000_000))
ITERS = int(os.environ.get("GP_ITERS", 10))
MESH = os.environ.get("GP_MESH", "data/xgc_like_120k.msh.gz")


def main():
    coords, tris, cls = read_msh(MESH)
    mesh = Mesh2D.from_arrays(coords, tris, cls)
    coords = np.asarray(coords, np.float64)
    tris64 = np.asarray(tris, np.int64)
    cls = np.asarray(cls)
    bg = detect_banded_locator(coords, tris64, cls, mesh.walk_geom,
                               n_theta=1536)
    cg = build_locator_grid(coords, tris64, walk_geom=mesh.walk_geom,
                            cells_per_elem=4.0, peel="rows")

    K = int(cls.max())
    mdl = max(K // 2, 2)
    marked = np.nonzero(cls <= mdl)[0]
    rng = np.random.default_rng(7)
    te = marked[rng.integers(0, len(marked), N)]
    w = rng.dirichlet((1.0, 1.0, 1.0), N).astype(np.float32)
    pts = (coords[tris64[te]] * w[:, :, None]).sum(1).astype(np.float32)
    px = jnp.asarray(pts[:, 0])
    py = jnp.asarray(pts[:, 1])

    idx_band = np.asarray(jax.jit(lambda x, y: bg.cell_of((x, y)))(px, py))
    idx_cart = np.asarray(jax.jit(lambda x, y: cg.cell_of((x, y)))(px, py))
    nb = bg.cell_rows.shape[0]
    nc = cg.cell_rows.shape[0]
    print(f"band rows {nb}  cart rows {nc}", flush=True)
    # occupancy diagnostics
    for name, idx, n_rows in (("band", idx_band, nb), ("cart", idx_cart,
                                                       nc)):
        u, cnts = np.unique(idx, return_counts=True)
        # adjacent-particle index deltas (vreg-batch locality)
        d = np.abs(np.diff(idx.astype(np.int64)))
        print(f"{name}: distinct rows {len(u)} "
              f"({len(u) * 56 / 1e6:.1f} MB hot @56B) "
              f"mean hits/row {cnts.mean():.0f}  "
              f"|Δidx|: median {np.median(d):.0f} p90 "
              f"{np.percentile(d, 90):.0f}", flush=True)

    tab_band = jnp.asarray(np.asarray(bg.cell_rows))
    tab_cart = jnp.asarray(np.asarray(cg.cell_rows))

    def timeit(name, tab, idx_np):
        idx = jnp.asarray(idx_np.astype(np.int32))
        n_rows = tab.shape[0]

        @jax.jit
        def loop(idx):
            def body(i, carry):
                idx, acc = carry
                g = tab[idx]
                acc = acc + g[:, 0] + g[:, 6]
                # evolve: shift indices by +-1 within range
                idx = jnp.clip(idx + (i % 3 - 1), 0, n_rows - 1)
                return idx, acc

            idx, acc = jax.lax.fori_loop(
                0, ITERS, body, (idx, jnp.zeros((N,), jnp.float32)))
            return acc.sum() + idx.sum()

        jax.block_until_ready(loop(idx))
        idx2 = jax.jit(lambda a: jnp.clip(a + 1, 0, n_rows - 1))(idx)
        jax.block_until_ready(idx2)
        t0 = time.perf_counter()
        out = loop(idx2)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:44s} {dt:8.2f} ms/pass", flush=True)

    uni_band = rng.integers(0, nb, N)
    uni_cart = rng.integers(0, nc, N)
    timeit("band table, real band idx", tab_band, idx_band)
    timeit("cart table, real cart idx", tab_cart, idx_cart)
    timeit("band table, uniform idx", tab_band, uni_band)
    timeit("cart table, uniform idx", tab_cart, uni_cart)
    timeit("band table, sorted real idx", tab_band, np.sort(idx_band))
    timeit("cart table, sorted real idx", tab_cart, np.sort(idx_cart))
    # cross: cart's index pattern scaled into the band table's range
    scaled = (idx_cart.astype(np.int64) * nb // nc).astype(np.int32)
    timeit("band table, cart idx scaled", tab_band, scaled)


if __name__ == "__main__":
    main()
