"""Device-faithful BandGrid2D diagnostics on the TPU (round 5):

1. A|B candidate hit rate measured with the DEVICE cell_of (f32 SVD +
   Newton) — perf/band_probe.py's 94.3% used the host float64 mirror, and
   any device/calibration disagreement near cell boundaries lands on the
   pyramid tail at full walk cost.
2. In-pipeline cost split of the band evaluation stages (harmonics,
   Newton, floor/cell arithmetic) via cumulative truncated variants, each
   fori-fused over evolving inputs (docs/PERFORMANCE.md measurement rules).

  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/band_device_probe.py
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

N = int(os.environ.get("BD_N", 10_000_000))
ITERS = int(os.environ.get("BD_ITERS", 10))
MESH = os.environ.get("BD_MESH", "data/xgc_like_120k.msh.gz")


def main():
    coords, tris, cls = read_msh(MESH)
    mesh = Mesh2D.from_arrays(coords, tris, cls)
    bg = detect_banded_locator(np.asarray(coords), np.asarray(tris),
                               np.asarray(cls), mesh.walk_geom)
    print(f"band grid: K={bg.n_bands} T={bg.n_theta} J={bg.n_harm} "
          f"P={bg.n_cheb} rank={bg.rank} rows={bg.cell_rows.shape}",
          flush=True)
    # match the model policy at 120k (resolve_locator_policy: cpe4 + rows)
    cg = build_locator_grid(np.asarray(coords), np.asarray(tris),
                            walk_geom=mesh.walk_geom, cells_per_elem=4.0,
                            peel="rows")
    print(f"cart grid: rows={cg.cell_rows.shape}", flush=True)

    # --- 1. device hit rate: sample points inside known elements
    rng = np.random.default_rng(7)
    M = 2_000_000
    te = rng.integers(0, len(tris), M)
    w = rng.dirichlet((1.0, 1.0, 1.0), M)
    pts = (np.asarray(coords)[np.asarray(tris)[te]] * w[:, :, None]).sum(1)
    px = jnp.asarray(pts[:, 0], jnp.float32)
    py = jnp.asarray(pts[:, 1], jnp.float32)

    for name, g in (("band", bg), ("cart", cg)):
        c = jax.jit(g.cell_of)((px, py))
        rows = np.asarray(g.cell_rows[c])
        a = rows[:, 6].astype(np.int64)
        b = rows[:, 13].astype(np.int64)
        hit_a = a == te
        hit_ab = hit_a | (b == te)
        print(f"{name}: device A hit {hit_a.mean():.4f}  "
              f"A|B {hit_ab.mean():.4f}", flush=True)

    # --- 2. stage cost split (evolving fori loops)
    r0 = rng.uniform(0.3, 0.9, N).astype(np.float32)
    t0_ = rng.uniform(0, 2 * np.pi, N).astype(np.float32)
    bx = (r0 * np.cos(t0_)).astype(np.float32)
    by = (r0 * np.sin(t0_)).astype(np.float32)

    def timeit(name, body_fn):
        @jax.jit
        def loop(x, y):
            def body(_, carry):
                x, y, acc = carry
                v = body_fn(x, y)
                acc = acc + v
                x = x + 1e-7 * (v % 3.0)
                y = y - 1e-7
                return x, y, acc

            x, y, acc = jax.lax.fori_loop(
                0, ITERS, body, (x, y, jnp.zeros((N,), jnp.float32)))
            return acc.sum() + x.sum()

        args = (jnp.asarray(bx), jnp.asarray(by))
        out = loop(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = loop(jnp.asarray(bx) * 1.0000001, jnp.asarray(by))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:46s} {dt:8.2f} ms/pass", flush=True)
        return dt

    J, P, rk = bg.n_harm, bg.n_cheb, bg.rank

    def harmonics_only(x, y):
        xx = x - bg.cx
        yy = y - bg.cy
        r = jnp.sqrt(xx * xx + yy * yy)
        th = jnp.arctan2(yy, xx)
        c1, s1 = jnp.cos(th), jnp.sin(th)
        t = [jnp.full(r.shape, bg.coef_v[k, 0]) for k in range(rk)]
        cj, sj = c1, s1
        for j in range(J):
            for k in range(rk):
                t[k] = t[k] + bg.coef_v[k, 1 + j] * cj
                t[k] = t[k] + bg.coef_v[k, 1 + J + j] * sj
            if j + 1 < J:
                cj, sj = cj * c1 - sj * s1, sj * c1 + cj * s1
        return sum(t) + r

    def full_band(x, y):
        bstar, _th = bg._band_continuous(x, y)
        return bstar

    def cell_f(x, y):
        return bg.cell_of((x, y)).astype(jnp.float32)

    def cart_cell_f(x, y):
        return cg.cell_of((x, y)).astype(jnp.float32)

    def rank_space_band(x, y):
        # alternative evaluation: never form the (P+1) per-particle q
        # arrays; each Newton step runs a Chebyshev BASIS recurrence in u
        # and contracts against U on the fly (rank live accumulators)
        xx = x - bg.cx
        yy = y - bg.cy
        r = jnp.sqrt(xx * xx + yy * yy)
        th = jnp.arctan2(yy, xx)
        c1, s1 = jnp.cos(th), jnp.sin(th)
        t = [jnp.full(r.shape, bg.coef_v[k, 0]) for k in range(rk)]
        cj, sj = c1, s1
        for j in range(J):
            for k in range(rk):
                t[k] = t[k] + bg.coef_v[k, 1 + j] * cj
                t[k] = t[k] + bg.coef_v[k, 1 + J + j] * sj
            if j + 1 < J:
                cj, sj = cj * c1 - sj * s1, sj * c1 + cj * s1
        u = jnp.full(r.shape, bg.inv_coef[-1], r.dtype)
        for p in range(bg.inv_coef.shape[0] - 2, -1, -1):
            u = u * r + bg.inv_coef[p]
        u = jnp.clip(u, -1.05, 1.05)
        for _ in range(bg.newton_iters):
            # c_k(u), c_k'(u) via basis recurrence, contracted on the fly
            val = jnp.zeros_like(u)
            dv = jnp.zeros_like(u)
            tp2 = jnp.ones_like(u)          # T_0
            dp2 = jnp.zeros_like(u)
            tp1 = u                          # T_1
            dp1 = jnp.ones_like(u)
            for k in range(rk):
                val = val + bg.coef_u[0, k] * t[k]
            if P >= 1:
                for k in range(rk):
                    val = val + (bg.coef_u[1, k] * t[k]) * tp1
                    dv = dv + (bg.coef_u[1, k] * t[k])
            for p in range(2, P + 1):
                tp, dp = (2.0 * u * tp1 - tp2,
                          2.0 * u * dp1 - dp2 + 2.0 * tp1)
                for k in range(rk):
                    ck = bg.coef_u[p, k] * t[k]
                    val = val + ck * tp
                    dv = dv + ck * dp
                tp2, tp1, dp2, dp1 = tp1, tp, dp1, dp
            u = u - (val - r) / jnp.maximum(dv, 1e-6)
            u = jnp.clip(u, -1.05, 1.05)
        return (u + 1.0) * (0.5 * bg.n_bands)

    timeit("polar + harmonics (rank accumulators)", harmonics_only)
    timeit("full band eval (harm + q + seed + newton)", full_band)
    timeit("rank-space newton (no q arrays)", rank_space_band)
    timeit("band cell_of", cell_f)
    timeit("cartesian cell_of", cart_cell_f)


if __name__ == "__main__":
    main()
