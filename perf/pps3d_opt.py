"""3D pseudoPushAndSearch locator/pyramid A/B sweep (one TPU process).

The tet 2-candidate guess-miss rate is far above the 2D meshes'
(CPU-measured at 24.5k Kuhn tets: cpe2 37.4%, cpe4 27.4%, cpe8 19.3%,
cpe16 13.7%), so the 2D-tuned defaults (cpe2, N/16-first pyramid) leave a
multi-million-particle tail running full-width 16-col walk passes.  This
sweeps (cells_per_elem, peel, widths) for the production policy
(resolve_locator_policy_3d).  All configs in ONE process — cross-process
TPU timings are not comparable (docs/PERFORMANCE.md measurement rules).

  PYTHONPATH=/root/repo:$PYTHONPATH python perf/pps3d_opt.py [config ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

from pumipic_tpu.mesh.core import Mesh3D
from pumipic_tpu.mesh.generate import box_tet_mesh
from pumipic_tpu.models.pseudo_push_and_search import (
    PseudoPushAndSearch, PushSearchConfig,
)

N = int(os.environ.get("PPS_PTCLS", 10_000_000))
ITERS = int(os.environ.get("PPS_ITERS", 5))

CONFIGS = {
    # name: (cells_per_elem, peel, widths)
    "base": (2.0, "rows", None),
    "cpe2_wide": (2.0, "rows", (N // 4, N // 64, 2048)),
    "cpe4_wide": (4.0, "rows", (N // 4, N // 64, 2048)),
    "cpe8_wide": (8.0, "rows", (N // 4, N // 64, 2048)),
    "cpe8_half": (8.0, "rows", (N // 2, N // 32, 2048)),
    "cpe4_lines": (4.0, "lines", (N // 4, N // 64, 2048)),
    "cpe16_wide": (16.0, "rows", (N // 4, N // 64, 2048)),
    # lines peel: sub-cliff 6-col cell table + chained 16-col walk_geom
    # gather — trades the above-cliff 26-col rows gather for two smaller
    # ones (wins on big tables, docs/PERFORMANCE.md round-3 finding 2)
    "cpe16_lines": (16.0, "lines", (N // 4, N // 64, 2048)),
    "cpe32_lines": (32.0, "lines", (N // 4, N // 64, 2048)),
    # two independent 13-col tables (20 MB each) vs one 26-col 40 MB gather
    "cpe16_split": (16.0, "rows_split", (N // 4, N // 64, 2048)),
    # rows_ab: A's full row + B's id only (14 cols, ~22 MB) — A-misses
    # start the pyramid at B; first level must absorb the wider tail
    # (~26% A-miss at cpe16 vs 13.7% both-miss)
    "cpe16_ab": (16.0, "rows_ab", (N // 4, N // 64, 2048)),
    "cpe16_ab_wide": (16.0, "rows_ab", (N // 3, N // 48, 2048)),
    "cpe32_ab": (32.0, "rows_ab", (N // 4, N // 64, 2048)),
    # big-mesh (PPS_SIDE=27, 118k tets) candidates: the cpe16 rows table is
    # 193 MB there, so the policy falls to lines — pick its resolution
    "cpe8_lines": (8.0, "lines", (N // 4, N // 64, 2048)),
    "cpe4_lines_half": (4.0, "lines", (N // 2, N // 32, 2048)),
    # round-4: third-ranked candidate as a walk start hint (+1 col) for
    # the 13.7% both-miss tail; narrower first level rides the smaller tail
    "cpe16_abc": (16.0, "rows_abc", (N // 4, N // 64, 2048)),
    "cpe16_abc_n8": (16.0, "rows_abc", (N // 8, N // 128, 2048)),
    "cpe32_abc": (32.0, "rows_abc", (N // 4, N // 64, 2048)),
    # round-5 id-diet peel (attach_cell_ids_3d): top-k int32 ids per cell
    # + chained sub-cliff walk_geom gathers — resolution decoupled from
    # table bytes (cpe32 k=2 = 6.2 MB vs 81 MB inline @26col), so the
    # locator buys hit rate with cells the rows layouts could never afford
    "cpe16_ids": (16.0, "ids", (N // 4, N // 64, 2048)),
    "cpe32_ids": (32.0, "ids", (N // 4, N // 64, 2048)),
    "cpe64_ids": (64.0, "ids", (N // 4, N // 64, 2048)),
    "cpe32_ids4": (32.0, "ids4", (N // 4, N // 64, 2048)),
    "cpe64_ids4": (64.0, "ids4", (N // 8, N // 128, 2048)),
}

# round-4: structured-Kuhn analytic locate (no table, no gather, no walk;
# exact by connectivity proof — mesh/locator.py detect_box_kuhn)
KUHN_CONFIGS = {"kuhn"}


def stats():
    """CPU-side guess-miss and hop statistics for the tet locator (the
    calibration behind resolve_locator_policy_3d; run with
    JAX_PLATFORMS=cpu)."""
    from pumipic_tpu.mesh import locator as loc

    n_side = int(os.environ.get("PPS_SIDE", 16))
    coords, tets = box_tet_mesh(n_side, n_side, n_side)
    mesh = Mesh3D.from_arrays(coords, tets)
    wg = np.asarray(mesh.walk_geom)
    rng = np.random.default_rng(0)
    n = 100_000
    p = rng.uniform(0, 1, size=(n, 3))

    def bary(g, p):
        l1 = g[:, 0] * p[:, 0] + g[:, 1] * p[:, 1] + g[:, 2] * p[:, 2] + g[:, 3]
        l2 = g[:, 4] * p[:, 0] + g[:, 5] * p[:, 1] + g[:, 6] * p[:, 2] + g[:, 7]
        l3 = g[:, 8] * p[:, 0] + g[:, 9] * p[:, 1] + g[:, 10] * p[:, 2] + g[:, 11]
        return np.stack([1.0 - l1 - l2 - l3, l1, l2, l3], 1)

    for cpe in (2.0, 4.0, 8.0, 16.0, 32.0):
        g = loc.build_locator_grid_3d(
            np.asarray(mesh.coords), np.asarray(mesh.elem2verts),
            cells_per_elem=cpe, walk_geom=mesh.walk_geom, peel="rows")
        rows = np.asarray(g.cell_rows)
        o = np.asarray(g.origin, np.float64)
        invh = np.asarray(g.inv_h, np.float64)
        ijk = np.clip((p - o) * invh, 0, None).astype(np.int64)
        for ax, nax in enumerate((g.nx, g.ny, g.nz)):
            ijk[:, ax] = np.clip(ijk[:, ax], 0, nax - 1)
        cell = (ijk[:, 0] * g.ny + ijk[:, 1]) * g.nz + ijk[:, 2]
        r = rows[cell]
        hit_a = bary(r[:, 0:12], p).min(1) >= -1e-6
        hit_b = bary(r[:, 13:25], p).min(1) >= -1e-6
        miss = ~(hit_a | hit_b)
        # hop count from candidate A by greedy BCC descent
        e = r[:, 12].astype(np.int64)
        hops = np.zeros(n, np.int64)
        done = np.zeros(n, bool)
        for _ in range(64):
            gg = wg[np.maximum(e, 0)]
            L = bary(gg[:, 0:12], p)
            inside = L.min(1) >= -1e-6
            done |= inside
            if done.all():
                break
            nxt = np.take_along_axis(
                gg[:, 12:16], L.argmin(1)[:, None], 1)[:, 0].astype(np.int64)
            adv = ~done & (nxt >= 0)
            hops = np.where(adv, hops + 1, hops)
            e = np.where(adv, nxt, e)
            done |= nxt < 0
        q = {f"p{x}": int(np.percentile(hops, x)) for x in (50, 90, 99)}
        print(f"cpe={cpe:<4} cells={rows.shape[0]:>7} "
              f"rows_MB={rows.shape[0] * 26 * 4 / 1e6:6.1f} "
              f"miss={100 * miss.mean():5.1f}%  A-hit={100 * hit_a.mean():5.1f}%  "
              f"hops-from-A {q}", flush=True)


def main():
    if "--stats" in sys.argv:
        return stats()
    names = sys.argv[1:] or (list(CONFIGS) + sorted(KUHN_CONFIGS))
    n_side = int(os.environ.get("PPS_SIDE", 16))
    coords, tets = box_tet_mesh(n_side, n_side, n_side)
    mesh = Mesh3D.from_arrays(coords, tets)
    print(f"mesh: {mesh.nelems} tets, {N} particles, {ITERS} iters",
          flush=True)

    for name in names:
        if name in KUHN_CONFIGS:
            cfg = PushSearchConfig(
                num_ptcls=N, structure="dps", wall="periodic",
                distance=0.05, max_search_iters=64, kuhn="force",
            )
            cpe, peel, widths = "-", "kuhn", None
        else:
            cpe, peel, widths = CONFIGS[name]
            cfg = PushSearchConfig(
                num_ptcls=N, structure="dps", wall="periodic",
                distance=0.05, max_search_iters=64, cells_per_elem=cpe,
                peel=peel, widths=widths, kuhn="off",
            )
        t0 = time.perf_counter()
        app = PseudoPushAndSearch(mesh, cfg)
        ptcls, _ = app._step(app.ptcls)        # compile + warmup
        jax.block_until_ready(ptcls.elem)
        t_setup = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(ITERS):
            ptcls, iters = app._step(ptcls)
        jax.block_until_ready(ptcls.elem)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        alive = int(jax.device_get(ptcls.active).sum())
        print(f"{name:<12} cpe={cpe:<4} peel={peel:<5} widths={widths} "
              f"-> {dt:8.1f} ms/step  (alive {alive}, setup {t_setup:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
