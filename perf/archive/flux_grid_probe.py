"""Host-side probe: can FITTED flux-aligned locator cells beat cartesian
cells on the shaped 120k tokamak workload?

Idea: the mesh is graded along nested flux surfaces (class_id = flux band,
nondecreasing — detect_banded_class).  Fit a smooth analytic band
coordinate g(x, y) = sum_{d,j} a_{dj} r^d cos(j th) + b_{dj} r^d sin(j th)
to the element centroids' band indices (least squares, ~(D+1)(2J+1)
coefficients), then bucket locator cells in (g, theta) instead of (x, y):
cells follow the mesh anisotropy at ZERO extra particle-rate gathers
(the transform is fused VPU arithmetic: sqrt + atan2 + Horner).

Candidates per cell are assigned from element-stratified calibration
samples (true element known by construction — no host walk needed), the
same policy for every coordinate mode, so hit rates are comparable.

  PYTHONPATH="/root/repo:$PYTHONPATH" JAX_PLATFORMS=cpu \
      python perf/flux_grid_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from pumipic_tpu.mesh.gmsh import read_msh

MESH = os.environ.get("FG_MESH", "data/xgc_like_120k.msh.gz")
N = int(os.environ.get("FG_N", 200_000))
CAL_PER_ELEM = int(os.environ.get("FG_CAL", 8))
D = int(os.environ.get("FG_D", 4))          # radial polynomial degree
J = int(os.environ.get("FG_J", 4))          # Fourier order


def fit_flux(coords, tris, cls):
    """Least-squares band coordinate g(x,y); returns (center, rscale, coef,
    features fn)."""
    cent = coords[tris].mean(axis=1)
    c = coords.mean(axis=0)
    dx = cent[:, 0] - c[0]
    dy = cent[:, 1] - c[1]
    r = np.hypot(dx, dy)
    rs = r.max()
    rn = r / rs
    th = np.arctan2(dy, dx)

    def features(rn, th):
        cols = []
        for d in range(D + 1):
            rd = rn**d
            cols.append(rd)
            for j in range(1, J + 1):
                cols.append(rd * np.cos(j * th))
                cols.append(rd * np.sin(j * th))
        return np.stack(cols, axis=1)

    A = features(rn, th)
    y = cls.astype(np.float64)
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    resid = A @ coef - y
    return c, rs, coef, features, resid


def fit_surface_model(coords, tris, cls,
                      DK=int(os.environ.get('FG_DK', 8)),
                      JF=int(os.environ.get('FG_JF', 8)),
                      DM=int(os.environ.get('FG_DM', 3))):
    """Multiplicative flux-surface model: radius of band-k surfaces
    R(k, th) = sum_d rho_d k^d + sum_{d<=DM, 1<=j<=JF} k^d (a cos + b sin)(j th);
    linear in coefficients, fitted on centroids (target r at k = band-0.5).
    The band coordinate g(r, th) is then recovered per particle by a few
    Newton iterations on R(g, th) = r — pure elementwise VPU arithmetic."""
    cent = coords[tris].mean(axis=1)
    c = coords.mean(axis=0)
    dx = cent[:, 0] - c[0]
    dy = cent[:, 1] - c[1]
    r = np.hypot(dx, dy)
    th = np.arctan2(dy, dx)
    K = cls.max()
    kn = (cls - 0.5) / K          # normalized band in (0,1)

    def feats(kn, th, deriv=False):
        cols = []
        for d in range(DK + 1):
            cols.append(d * kn ** max(d - 1, 0) if deriv else kn**d)
        for d in range(DM + 1):
            kd = d * kn ** max(d - 1, 0) if deriv else kn**d
            for j in range(1, JF + 1):
                cols.append(kd * np.cos(j * th))
                cols.append(kd * np.sin(j * th))
        return np.stack(cols, axis=1)

    A = feats(kn, th)
    coef, *_ = np.linalg.lstsq(A, r, rcond=None)
    resid = A @ coef - r

    rho = coef[: DK + 1]
    four = coef[DK + 1:].reshape(DM + 1, 2 * JF)

    def g_of(r_q, th_q, iters=8):
        # poly coeffs per point: p_d = rho_d + S_d(th) (d <= DM), Horner
        # evaluation — the device form is the same fused elementwise math
        cj = np.stack([np.cos(j * th_q) for j in range(1, JF + 1)]
                      + [np.sin(j * th_q) for j in range(1, JF + 1)], axis=1)
        fr = np.concatenate([four[:, 0::2], four[:, 1::2]], axis=1)
        S = cj @ fr.T                      # (N, DM+1)

        def R(g):
            f = np.zeros_like(g)
            for d in range(DK, -1, -1):
                pd = rho[d] + (S[:, d] if d <= DM else 0.0)
                f = f * g + pd
            return f

        # bisection: robust against the polynomial's non-monotone
        # extrapolation region (Newton diverged on ~3% outer-band points);
        # 18 halvings on [-0.1, 1.15] ≈ 1e-4 band resolution, each step
        # one Horner pass — still pure fused elementwise math on device
        lo = np.full_like(r_q, -0.1)
        hi = np.full_like(r_q, 1.15)
        for _ in range(18):
            mid = 0.5 * (lo + hi)
            below = R(mid) < r_q
            lo = np.where(below, mid, lo)
            hi = np.where(below, hi, mid)
        return 0.5 * (lo + hi) * K

    return g_of, resid, c


def top2_per_cell(cell, elem, n_cells, fallback):
    """Two most frequent elements per cell (order pairs, count, pick)."""
    order = np.lexsort((elem, cell))
    cs, es = cell[order], elem[order]
    new = np.ones(len(cs), bool)
    new[1:] = (cs[1:] != cs[:-1]) | (es[1:] != es[:-1])
    starts = np.nonzero(new)[0]
    counts = np.diff(np.append(starts, len(cs)))
    ucell, uelem = cs[starts], es[starts]
    a = fallback.copy()
    b = fallback.copy()
    best = np.zeros(n_cells, np.int64)
    second = np.zeros(n_cells, np.int64)
    # two passes of "argmax with removal"
    for cnt, ce, el in sorted(zip(counts, ucell, uelem)):
        if cnt >= best[ce]:
            second[ce] = best[ce]
            b[ce] = a[ce]
            best[ce] = cnt
            a[ce] = el
        elif cnt >= second[ce]:
            second[ce] = cnt
            b[ce] = el
    return a, b


def probe(name, ax0, ax1, wrap1, cal_ax, test_ax, te_cal, te_test, E, cpe):
    """Grid in (ax0, ax1) coordinates of element centroids; calibration and
    test points given in the same coordinates."""
    lo = np.array([ax0.min(), ax1.min()])
    hi = np.array([ax0.max(), ax1.max()])
    extent = np.maximum(hi - lo, 1e-30)
    n_cells = max(int(E * cpe), 16)
    # square-ish in normalized units
    nx = max(int(np.sqrt(n_cells)), 1)
    ny = max(n_cells // nx, 1)
    h = extent / np.array([nx, ny])

    def cell_of(a0, a1):
        i = np.clip(((a0 - lo[0]) / h[0]).astype(np.int64), 0, nx - 1)
        j = np.clip(((a1 - lo[1]) / h[1]).astype(np.int64), 0, ny - 1)
        return i * ny + j

    cent_cell = cell_of(ax0, ax1)
    fallback = np.zeros(nx * ny, np.int64)
    fallback[cent_cell] = np.arange(E)
    a, b = top2_per_cell(cell_of(*cal_ax), te_cal, nx * ny, fallback)
    cell = cell_of(*test_ax)
    hit = (te_test == a[cell]) | (te_test == b[cell])
    print(f"  cpe={cpe:4.1f} {name}: hit={hit.mean() * 100:6.2f}%  "
          f"cells={nx * ny}")
    return hit.mean()


def main():
    coords, tris, cls = read_msh(MESH)
    E = len(tris)
    print(f"mesh: {E} elems, {cls.max()} bands ({MESH})")
    c, rs, coef, features, resid = fit_flux(coords, tris, cls)
    print(f"flux fit: D={D} J={J} resid max={np.abs(resid).max():.3f} "
          f"rms={np.sqrt((resid**2).mean()):.3f} (bands)")
    g_of, sresid, _c2 = fit_surface_model(coords, tris, cls)
    print(f"surface fit: resid max={np.abs(sresid).max():.4f} "
          f"rms={np.sqrt((sresid**2).mean()):.4f} (radius units)")

    rng = np.random.default_rng(42)

    def sample(n_per_elem_or_total, stratified):
        if stratified:
            te = np.repeat(np.arange(E), n_per_elem_or_total)
        else:
            te = rng.integers(0, E, n_per_elem_or_total)
        w = rng.dirichlet((1.0, 1.0, 1.0), len(te))
        pts = (coords[tris[te]] * w[:, :, None]).sum(axis=1)
        return te, pts

    te_cal, pts_cal = sample(CAL_PER_ELEM, True)
    te_test, pts_test = sample(N, False)

    cent = coords[tris].mean(axis=1)

    def coords_of(pts):
        dx = pts[:, 0] - c[0]
        dy = pts[:, 1] - c[1]
        r = np.hypot(dx, dy)
        th = np.arctan2(dy, dx)
        g = features(r / rs, th) @ coef
        return pts[:, 0], pts[:, 1], r, np.mod(th, 2 * np.pi), g

    cx, cy, cr, cth, cg = coords_of(cent)
    kx, ky, kr, kth, kg = coords_of(pts_cal)
    tx, ty, tr, tth, tg = coords_of(pts_test)
    csg = g_of(cr, np.arctan2(cent[:, 1] - c[1], cent[:, 0] - c[0]))
    ksg = g_of(kr, np.arctan2(pts_cal[:, 1] - c[1], pts_cal[:, 0] - c[0]))
    tsg = g_of(tr, np.arctan2(pts_test[:, 1] - c[1], pts_test[:, 0] - c[0]))

    for cpe in (float(x) for x in os.environ.get("FG_CPES", "2,4").split(",")):
        probe("cart ", cx, cy, False, (kx, ky), (tx, ty),
              te_cal, te_test, E, cpe)
        probe("polar", cr, cth, True, (kr, kth), (tr, tth),
              te_cal, te_test, E, cpe)
        probe("flux ", cg, cth, True, (kg, kth), (tg, tth),
              te_cal, te_test, E, cpe)
        probe("surf ", csg, cth, True, (ksg, kth), (tsg, tth),
              te_cal, te_test, E, cpe)


if __name__ == "__main__":
    main()
