"""Device diagnosis of the 120k band-arm gap (round 5): on the BENCH
particle distribution (class <= mdl_face seeding), measure ON DEVICE

1. the A|B peel hit rate of the band grid (T from env) vs the cartesian
   cpe4 grid — through the exact peel containment math search uses;
2. in-pipeline stage costs with device-resident evolving inputs (the
   earlier probe re-transferred 80 MB per timed call through the relay,
   poisoning every number): band cell_of, cart cell_of, 14-col row
   gather from each table.

  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/band_bench_diag.py
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
from pumipic_tpu.ops.search import BCC_ABS_TOL, BCC_REL_TOL

N = int(os.environ.get("BD_N", 10_000_000))
ITERS = int(os.environ.get("BD_ITERS", 10))
MESH = os.environ.get("BD_MESH", "data/xgc_like_120k.msh.gz")
BANDT = int(os.environ["BD_T"]) if os.environ.get("BD_T") else None


def peel_hit(g, dx, dy):
    """A|B containment through the exact 14-col peel math (2D rows)."""
    l1a = g[:, 0] * dx + g[:, 1] * dy + g[:, 2]
    l2a = g[:, 3] * dx + g[:, 4] * dy + g[:, 5]
    w0a = 1.0 - l1a - l2a
    m1a = jnp.abs(g[:, 0] * dx) + jnp.abs(g[:, 1] * dy) + jnp.abs(g[:, 2])
    m2a = jnp.abs(g[:, 3] * dx) + jnp.abs(g[:, 4] * dy) + jnp.abs(g[:, 5])
    t1a = BCC_REL_TOL * m1a + BCC_ABS_TOL
    t2a = BCC_REL_TOL * m2a + BCC_ABS_TOL
    in_a = (w0a >= -(t1a + t2a)) & (l1a >= -t1a) & (l2a >= -t2a)
    l1b = g[:, 7] * dx + g[:, 8] * dy + g[:, 9]
    l2b = g[:, 10] * dx + g[:, 11] * dy + g[:, 12]
    w0b = 1.0 - l1b - l2b
    m1b = jnp.abs(g[:, 7] * dx) + jnp.abs(g[:, 8] * dy) + jnp.abs(g[:, 9])
    m2b = jnp.abs(g[:, 10] * dx) + jnp.abs(g[:, 11] * dy) + jnp.abs(g[:, 12])
    t1b = BCC_REL_TOL * m1b + BCC_ABS_TOL
    t2b = BCC_REL_TOL * m2b + BCC_ABS_TOL
    in_b = (w0b >= -(t1b + t2b)) & (l1b >= -t1b) & (l2b >= -t2b)
    return in_a, in_a | in_b


def main():
    coords, tris, cls = read_msh(MESH)
    mesh = Mesh2D.from_arrays(coords, tris, cls)
    coords = np.asarray(coords, np.float64)
    tris64 = np.asarray(tris, np.int64)
    cls = np.asarray(cls)
    bg = detect_banded_locator(coords, tris64, cls, mesh.walk_geom,
                               n_theta=BANDT)
    print(f"band grid: K={bg.n_bands} T={bg.n_theta} "
          f"rows={tuple(bg.cell_rows.shape)} "
          f"({bg.cell_rows.size * 4 / 1e6:.1f} MB)", flush=True)
    cg = build_locator_grid(coords, tris64, walk_geom=mesh.walk_geom,
                            cells_per_elem=4.0, peel="rows")
    print(f"cart grid: rows={tuple(cg.cell_rows.shape)} "
          f"({cg.cell_rows.size * 4 / 1e6:.1f} MB)", flush=True)

    # bench-like points: uniform inside class <= mdl_face elements
    K = int(cls.max())
    mdl = max(K // 2, 2)
    marked = np.nonzero(cls <= mdl)[0]
    rng = np.random.default_rng(7)
    te = marked[rng.integers(0, len(marked), N)]
    w = rng.dirichlet((1.0, 1.0, 1.0), N).astype(np.float32)
    pts = (coords[tris64[te]] * w[:, :, None]).sum(1).astype(np.float32)
    px = jnp.asarray(pts[:, 0])
    py = jnp.asarray(pts[:, 1])
    te_d = jnp.asarray(te, jnp.int32)
    jax.block_until_ready((px, py, te_d))

    @jax.jit
    def hits(px, py, te_d):
        out = {}
        for name, g in (("band", bg), ("cart", cg)):
            c = g.cell_of((px, py))
            rows = g.cell_rows[c]
            in_a, in_ab = peel_hit(rows, px, py)
            ida = rows[:, 6].astype(jnp.int32)
            idb = rows[:, 13].astype(jnp.int32)
            out[name + "_A"] = in_a.mean(dtype=jnp.float32)
            out[name + "_AB"] = in_ab.mean(dtype=jnp.float32)
            out[name + "_idA"] = (ida == te_d).mean(dtype=jnp.float32)
            out[name + "_idAB"] = (
                (ida == te_d) | (idb == te_d)).mean(dtype=jnp.float32)
        return out

    h = jax.device_get(hits(px, py, te_d))
    for k in sorted(h):
        print(f"  {k:12s} {float(h[k]):.4f}", flush=True)

    # ---- stage costs: device-resident evolving in-jit loops ------------
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

        jax.block_until_ready(loop(px, py))
        x2 = jax.jit(lambda a: a * 1.0000001)(px)
        jax.block_until_ready(x2)
        t0 = time.perf_counter()
        out = loop(x2, py)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:46s} {dt:8.2f} ms/pass", flush=True)
        return dt

    timeit("band cell_of (tau, no-trig)",
           lambda x, y: bg.cell_of((x, y)).astype(jnp.float32))
    timeit("cart cell_of",
           lambda x, y: cg.cell_of((x, y)).astype(jnp.float32))

    # literal-coefficient variant: same math, but the ~500 model
    # coefficients are baked as HLO literals (VPU immediates) instead of
    # dynamic-slice+broadcast reads of a device array — the one
    # structural difference vs perf/pallas_smoke.py's 7 ms measurement
    cvn = np.asarray(bg.coef_v)
    cun = np.asarray(bg.coef_u)
    icn = np.asarray(bg.inv_coef)
    cxn, cyn = float(bg.cx), float(bg.cy)
    J, P, rk = bg.n_harm, bg.n_cheb, bg.rank
    Kb, T = bg.n_bands, bg.n_theta

    def cell_lit(x, y):
        xx = x - cxn
        yy = y - cyn
        r = jnp.sqrt(xx * xx + yy * yy)
        inv_r = 1.0 / jnp.maximum(r, 1e-30)
        c1 = xx * inv_r
        s1 = yy * inv_r
        t = [jnp.full(r.shape, cvn[k, 0], jnp.float32) for k in range(rk)]
        cj, sj = c1, s1
        for j in range(J):
            for k in range(rk):
                t[k] = t[k] + float(cvn[k, 1 + j]) * cj
                t[k] = t[k] + float(cvn[k, 1 + J + j]) * sj
            if j + 1 < J:
                cj, sj = cj * c1 - sj * s1, sj * c1 + cj * s1
        q = [sum(float(cun[p, k]) * t[k] for k in range(rk))
             for p in range(P + 1)]
        u = jnp.full(r.shape, icn[-1], jnp.float32)
        for p in range(len(icn) - 2, -1, -1):
            u = u * r + float(icn[p])
        u = jnp.clip(u, -1.05, 1.05)
        for _ in range(bg.newton_iters):
            bk1 = jnp.zeros_like(u)
            bk2 = jnp.zeros_like(u)
            dk1 = jnp.zeros_like(u)
            dk2 = jnp.zeros_like(u)
            for p in range(P, 0, -1):
                dk1, dk2 = 2.0 * bk1 + 2.0 * u * dk1 - dk2, dk1
                bk1, bk2 = q[p] + 2.0 * u * bk1 - bk2, bk1
            val = q[0] + u * bk1 - bk2
            dv = bk1 + u * dk1 - dk2
            u = u - (val - r) / jnp.maximum(dv, 1e-6)
            u = jnp.clip(u, -1.05, 1.05)
        bstar = (u + 1.0) * (0.5 * Kb)
        bf = jnp.clip(jnp.floor(bstar), 0.0, Kb - 1.0)
        d = yy / jnp.maximum(jnp.abs(xx) + jnp.abs(yy), 1e-30)
        tau = jnp.where(xx >= 0, jnp.where(yy >= 0, d, 4.0 + d), 2.0 - d)
        tf = jnp.clip(jnp.floor(tau * (T / 4.0)), 0.0, T - 1.0)
        return bf * jnp.float32(T) + tf

    # agreement with the array-coef path (must be bitwise: same values)
    a1 = jax.jit(lambda x, y: bg.cell_of((x, y)))(px, py)
    a2 = jax.jit(lambda x, y: cell_lit(x, y).astype(jnp.int32))(px, py)
    print(f"literal-vs-array cell agreement: "
          f"{float(jnp.mean((a1 == a2).astype(jnp.float32))):.6f}",
          flush=True)
    timeit("band cell_of LITERAL coefs", cell_lit)

    def peel_cost(g, barrier=False):
        def f(x, y):
            c = g.cell_of((x, y))
            if barrier:
                # materialize the index array so XLA cannot fuse the
                # full band evaluation into the gather kernel
                c = jax.lax.optimization_barrier(c)
            rows = g.cell_rows[c]
            in_a, in_ab = peel_hit(rows, x, y)
            return (rows[:, 6] + in_ab.astype(jnp.float32)
                    + in_a.astype(jnp.float32))
        return f

    timeit("band cell_of + 14-col gather + containment", peel_cost(bg))
    timeit("cart cell_of + 14-col gather + containment", peel_cost(cg))
    timeit("band peel + index barrier", peel_cost(bg, barrier=True))
    timeit("cart peel + index barrier", peel_cost(cg, barrier=True))


if __name__ == "__main__":
    main()
