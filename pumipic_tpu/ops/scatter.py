"""Charge scatter / deposition kernels.

Reference parity: ``test/gyroScatter.hpp`` —
- ``accumulateToRings`` (:183-205): every particle deposits into the two gyro
  rings bracketing its gyro-radius, at each vertex of its parent element
  (device atomics in the reference).
- ``scatterToMappedVerts`` (:207-225): per-(vertex, ring, ring-point), the
  accumulated value (averaged over points-per-ring) is scattered to the three
  vertices of the element containing the projected ring point, via the
  precomputed gyro-avg map.

TPU-first: atomics become deterministic ``segment_sum`` scatters (fixed
reduction order, bit-reproducible — the reference's atomic adds are not).
Both phases are linear operators with *static* index structure, so the
framework also exposes a fused path where the ring-point map is applied as a
single gather/segment-sum pipeline.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def count_per_key(key: jax.Array, num_keys: int) -> jax.Array:
    """Histogram of int keys in [0, num_keys) (entries >= num_keys ignored).

    Sort + diff-of-searchsorted instead of ``segment_sum``: on TPU the
    particle-rate scatter-add runs ~125M adds/s while a radix sort + a
    mesh-rate binary search is ~30% cheaper at 10M keys (perf/walk_opt.py).
    Key spaces that fit uint16 sort with half the radix passes."""
    if num_keys + 1 < (1 << 16):
        sk = jnp.sort(key.astype(jnp.uint16))
        grid = jnp.arange(num_keys + 1, dtype=jnp.uint16)
    else:
        sk = jnp.sort(key)
        grid = jnp.arange(num_keys + 1, dtype=key.dtype)
    bounds = jnp.searchsorted(sk, grid)
    return jnp.diff(bounds)


def _auto_lo_width(num_keys: int) -> int:
    """One-hot work scales with (lo_width + ceil(num_keys/lo_width)); pick
    the power-of-two minimizer (~sqrt(num_keys)) within [128, 1024].
    128 is optimal through ~32k keys; big meshes (120k elements) save ~30%
    of the one-hot elements at 256-512."""
    best, best_cost = 128, None
    for lw in (128, 256, 512, 1024):
        cost = lw + -(-(num_keys + 1) // lw)
        if best_cost is None or cost < best_cost:
            best, best_cost = lw, cost
    return best


# largest key count whose histogram is exact in one f32 MXU accumulation;
# beyond it the histogram runs in chunks of half this (int32-accumulated)
_MATMUL_MAX_N = 1 << 24

# module default for the histogram one-hot operand dtype (see
# count_per_key_matmul); perf harnesses flip this for in-pipeline A/Bs
HIST_ONEHOT_DTYPE = jnp.bfloat16


def count_per_key_matmul(key: jax.Array, num_keys: int,
                         lo_width: Optional[int] = None,
                         onehot_dtype=None) -> jax.Array:
    """Histogram as ONE MXU matmul: split the key into (hi, lo) digits and
    compute ``hi_onehot.T @ lo_onehot`` — entry (h, l) counts keys with
    value h*lo_width + l.  Exact (0/1 operands, f32 accumulation) for
    counts < 2^24.

    The sorted-histogram path (:func:`count_per_key`) costs a 10M-key radix
    sort (~35 ms); this trades it for 10M×(hi+lo) one-hot MACs on the MXU.
    Entries >= num_keys are ignored (callers pass ``num_keys`` as the
    overflow bucket like count_per_key).

    Exactness bounds: the f32 key cast needs ``num_keys < 2^24`` and the f32
    MXU accumulation needs every bucket count < 2^24 (guaranteed when the
    total key count is); outside them this silently undercounts (both are
    static shape facts).  Key VALUES >= 2^24 fall back to the sorted
    histogram; key COUNTS >= 2^24 split into chunks whose per-bucket counts
    are provably < 2^24 and accumulate exactly in int32 (a 2^24-slot array
    at 1.8x capacity padding is just an 18M-slot structure rebuild — common,
    not extreme).
    """
    if num_keys + 1 >= (1 << 24):
        return count_per_key(key, num_keys).astype(jnp.float32)
    n = key.shape[0]
    if n >= _MATMUL_MAX_N:
        chunk = _MATMUL_MAX_N // 2
        nch = -(-n // chunk)
        pad = nch * chunk - n
        kp = jnp.concatenate(
            [key, jnp.full((pad,), num_keys, key.dtype)]) if pad else key
        tot = jnp.zeros((num_keys,), jnp.int32)
        for c in range(nch):
            tot = tot + count_per_key_matmul(
                kp[c * chunk:(c + 1) * chunk], num_keys, lo_width
            ).astype(jnp.int32)
        return tot.astype(jnp.float32)
    if lo_width is None:
        lo_width = _auto_lo_width(num_keys)
    n_hi = -(-(num_keys + 1) // lo_width)
    kf = key.astype(jnp.float32)                  # exact < 2^24
    lw = jnp.float32(lo_width)
    hi = jnp.floor(kf / lw)
    lo = kf - hi * lw
    hi_oh = (hi[:, None] == jnp.arange(n_hi, dtype=jnp.float32)[None, :])
    lo_oh = (lo[:, None] == jnp.arange(lo_width, dtype=jnp.float32)[None, :])
    # one-hot operand dtype: bf16 (default, f32 accumulation, exact < 2^24)
    # or int8 (half the HBM bytes for the materialized one-hots — the
    # matmul is HBM-bound on them — with EXACT int32 accumulation < 2^31;
    # A/B: perf/hist8_ab.py)
    if onehot_dtype is None:
        onehot_dtype = HIST_ONEHOT_DTYPE
    if onehot_dtype == jnp.int8:
        counts = jax.lax.dot_general(
            hi_oh.astype(jnp.int8), lo_oh.astype(jnp.int8),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                         # (n_hi, lo_width)
    else:
        counts = jax.lax.dot_general(
            hi_oh.astype(onehot_dtype), lo_oh.astype(onehot_dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                         # (n_hi, lo_width)
    return counts.reshape(-1)[:num_keys].astype(jnp.float32)


def particles_per_element(
    elem: jax.Array, active: jax.Array, num_elems: int, weights: jax.Array | None = None
) -> jax.Array:
    """Count (or weight-sum) particles per element.  Counts use the sorted
    histogram; weighted sums use a deterministic segment_sum."""
    if weights is None:
        key = jnp.where(active, elem, num_elems).astype(jnp.int32)
        return count_per_key_matmul(key, num_elems)
    w = jnp.where(active, weights, 0.0)
    seg = jnp.where(active, elem, num_elems)  # inactive -> overflow bucket
    out = jax.ops.segment_sum(w, seg, num_segments=num_elems + 1)
    return out[:num_elems]


def accumulate_to_rings(
    elem: jax.Array,
    active: jax.Array,
    elem2verts: jax.Array,
    num_verts: int,
    num_rings: int,
    gyro_rmax: float,
    ptcl_radius: jax.Array | None = None,
) -> jax.Array:
    """Deposit particles into the two rings bracketing their gyro radius at
    each vertex of their parent element.  Returns (num_verts, num_rings).

    ``ptcl_radius``: per-particle gyro radius; defaults to the reference's
    placeholder 1.125×ring-width (gyroScatter.hpp:185 'TODO compute the
    radius').
    """
    ring_width = gyro_rmax / num_rings
    num_elems = elem2verts.shape[0]
    nvpe = elem2verts.shape[1]
    R = num_rings

    # Stage 1: per-(element, ring) counts — O(N) scatter-adds.  The naive
    # per-particle-per-vertex scatter costs 2*nvpe*N adds; counting at
    # element granularity first cuts the particle-rate scatter 6x, and the
    # vertex expansion then runs at mesh size (E*nvpe*R adds, negligible).
    if R == 1:
        # degenerate single-ring config: both brackets coincide, deposit
        # each particle ONCE.  (The general paths assume R >= 2: rd=-1
        # would wrap `.at[:, -1]` onto ring 0 and double-count, and the
        # per-particle clip(lo=0, hi=R-2=-1) would shift keys to elem-1 —
        # round-5 review finding, regression test_gyro_scatter_one_ring.)
        key = jnp.where(active, elem, num_elems).astype(jnp.int32)
        elem_ring = count_per_key_matmul(key, num_elems)[:, None]
    elif ptcl_radius is None:
        # uniform radius (the reference's 1.125*ringWidth placeholder,
        # gyroScatter.hpp:185): ring pair is the same for every particle
        rd = min(max(int(1.125) - 1, 0), R - 2)
        ru = rd + 1
        key = jnp.where(active, elem, num_elems).astype(jnp.int32)
        # MXU one-hot matmul histogram: 12.7 vs 30.9 ms at 10M keys
        # (perf/walk_opt16.py), exact f32 counts
        counts = count_per_key_matmul(key, num_elems)
        elem_ring = (
            jnp.zeros((num_elems, R), jnp.float32)
            .at[:, rd].add(counts)
            .at[:, ru].add(counts)
        )
    else:
        # per-particle radius: two MXU one-hot histograms over the
        # (element, ring) key space replace the particle-rate segment_sums
        # (~13 vs ~120 ms each at 10M, perf/walk_opt16.py); key arithmetic
        # stays in f32 (exact for E·R < 2^24 — int32 mul is VPU-emulated)
        rdf = jnp.clip(
            jnp.floor(ptcl_radius / jnp.float32(ring_width)) - 1.0,
            0.0, R - 2,
        )
        ER = num_elems * R
        elem_ring_flat = jnp.zeros((ER,), jnp.float32)
        if ER >= (1 << 24):
            # f32 key construction rounds at >= 2^24, and the sorted-
            # histogram fallback inside count_per_key_matmul would bin the
            # ALREADY-ROUNDED keys silently (ADVICE r4; same hazard class
            # as locator._check_ids_f32_exact).  Build keys in int32 —
            # VPU-emulated multiply, but this is the >2.8M-element corner.
            rdi = rdf.astype(jnp.int32)
            ei = elem.astype(jnp.int32) * jnp.int32(R)
            for ring_i in (rdi, rdi + 1):
                key = jnp.where(active, ei + ring_i, jnp.int32(ER))
                elem_ring_flat = elem_ring_flat + count_per_key_matmul(
                    key, ER)
        else:
            ef = elem.astype(jnp.float32) * jnp.float32(R)
            for ring_f in (rdf, rdf + 1.0):
                key = jnp.where(active, ef + ring_f, jnp.float32(ER))
                elem_ring_flat = elem_ring_flat + count_per_key_matmul(
                    key, ER)
        elem_ring = elem_ring_flat.reshape(num_elems, R)

    # Stage 2: expand per-element ring counts to the element's vertices
    # (mesh-sized, deterministic segment_sum replaces the reference atomics)
    keys = (elem2verts[:, :, None] * R
            + jnp.arange(R, dtype=elem2verts.dtype)[None, None, :])  # (E,nvpe,R)
    vals = jnp.broadcast_to(elem_ring[:, None, :], (num_elems, nvpe, R))
    out = jax.ops.segment_sum(
        vals.reshape(-1), keys.reshape(-1), num_segments=num_verts * R
    )
    return out.reshape(num_verts, num_rings)


def scatter_to_mapped_verts(
    ring_accum: jax.Array,
    gyro_map: jax.Array,
    num_verts: int,
    num_rings: int,
    points_per_ring: int,
) -> jax.Array:
    """Apply the gyro-average map: (V, R) ring accumulation -> (V,) weights.

    gyro_map: (V * R * P * 3,) vertex ids (-1 = ring point outside domain),
    laid out [vertex][ring][point][3 mapped verts] exactly like the
    reference's ``gyro_avg_map`` (gyroScatter.hpp:70-92).
    """
    V, R, P = num_verts, num_rings, points_per_ring
    vals = ring_accum / P                                # (V, R)
    # expand to (V, R, P, 3)
    vals_exp = jnp.broadcast_to(vals[:, :, None, None], (V, R, P, 3)).reshape(-1)
    idx = gyro_map.astype(jnp.int32)
    idx = jnp.where(idx >= 0, idx, V)                    # invalid -> overflow
    out = jax.ops.segment_sum(vals_exp, idx, num_segments=V + 1)
    return out[:V]


def gyro_scatter(
    elem: jax.Array,
    active: jax.Array,
    elem2verts: jax.Array,
    gyro_map: jax.Array,
    num_verts: int,
    num_rings: int,
    points_per_ring: int,
    gyro_rmax: float,
) -> jax.Array:
    """Full gyroScatter (gyroScatter.hpp:169-232): ring accumulate + mapped
    scatter, returning the (V,) vertex tag array."""
    ring_accum = accumulate_to_rings(
        elem, active, elem2verts, num_verts, num_rings, gyro_rmax
    )
    return scatter_to_mapped_verts(
        ring_accum, gyro_map, num_verts, num_rings, points_per_ring
    )


def scatter_to_verts_bcc(
    elem: jax.Array,
    active: jax.Array,
    bcc: jax.Array,
    elem2verts: jax.Array,
    num_verts: int,
    charge: jax.Array | None = None,
) -> jax.Array:
    """Standard PIC charge deposition: barycentric-weighted scatter of
    particle charge to parent-element vertices.  (N,), (N,k) -> (V,)."""
    verts = elem2verts[jnp.maximum(elem, 0)]            # (N, k)
    q = jnp.ones(elem.shape, bcc.dtype) if charge is None else charge
    w = bcc * q[:, None]
    idx = jnp.where(active[:, None], verts, num_verts)
    out = jax.ops.segment_sum(
        w.reshape(-1), idx.reshape(-1), num_segments=num_verts + 1
    )
    return out[:num_verts]
