"""Particle load balancing across picparts ("sbar" diffusion).

Reference parity: ``ParticleBalancer`` (``src/pumipic_lb.hpp:33-114``,
``pumipic_lb.cpp``) — build time: compute **sbars**, the distinct
sets-of-ranks whose safe zones overlap an element; build an EnGPar N-graph
whose hyperedges are sbars and vertices are (sbar × member-rank).  Run time
(``repartition``): accumulate particle weight per (sbar, rank) counting
forced migrations at their destination (``addWeights``, lb.hpp:128-205), run
EnGPar's diffusive weight balancer to a tolerance, then greedily relabel
particles' target ranks against the per-sbar send plan
(``selectParticles``, lb.hpp:229-287).

TPU-native redesign (no EnGPar): the sbar map and the hyperedge pair list
are host preprocessing; at run time every rank computes the SAME diffusion
plan from an all-gathered (rank × sbar) weight matrix — a fixed-iteration
Jacobi flow relaxation over the pair edges, fully jitted, zero extra
communication beyond one ``all_gather`` of S floats — and applies its own
slice of the plan with a rank-within-sbar selection (the same sort machinery
as rebuild).  Deterministic: every rank derives identical flows.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pumipic_tpu.parallel.mesh_axis import RANK_AXIS
from pumipic_tpu.utils.types import LID_DTYPE


def _static_field(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BalancerTables:
    """Host-built sbar structures (device-resident, mostly replicated)."""

    sbar_of_elem: jax.Array   # (R, E) sbar id per local elem; -1 immovable
    edge_sbar: jax.Array      # (P,) sbar of each directed pair edge
    edge_src: jax.Array       # (P,)
    edge_dst: jax.Array       # (P,)
    # per-rank views of outgoing edges, sorted by sbar (padded -1)
    my_edge_idx: jax.Array    # (R, Pmax) index into the global edge list
    num_sbars: int = _static_field(default=0)
    num_edges: int = _static_field(default=0)


def build_balancer(pp, num_ranks: int) -> BalancerTables:
    """Compute sbars from the picparts' safe zones (buildLocalSbarMap /
    buildNgraph analog, pumipic_lb.cpp:93-110,434-490)."""
    eg = np.asarray(pp.elem_gid)
    es = np.asarray(pp.elem_safe)
    R = num_ranks
    E_local = eg.shape[1]

    E_g = int(eg.max()) + 1
    safe_by_rank = np.zeros((R, E_g), np.uint8)
    for r in range(R):
        valid = (eg[r] >= 0) & es[r]
        safe_by_rank[r, eg[r][valid]] = 1

    from pumipic_tpu import native

    res = native.sbar_map(safe_by_rank)
    if res is not None:
        sbar_of_gelem, mem_lists = res
        sbar_ids = {tuple(int(x) for x in mem): s
                    for s, mem in enumerate(mem_lists)}
        S = len(mem_lists)
    else:
        member_sets: Dict[int, list] = {g: [] for g in range(E_g)}
        for r in range(R):
            valid = (eg[r] >= 0) & es[r]
            for g in eg[r][valid]:
                member_sets[int(g)].append(r)

        sbar_ids = {}
        sbar_of_gelem = np.full(E_g, -1, np.int64)
        for g in range(E_g):
            mem = tuple(sorted(set(member_sets[g])))
            if len(mem) < 2:
                continue  # singleton: particles here can't be rebalanced
            if mem not in sbar_ids:
                sbar_ids[mem] = len(sbar_ids)
            sbar_of_gelem[g] = sbar_ids[mem]
        S = len(sbar_ids)

    sbar_of_elem = np.full((R, E_local), -1, np.int64)
    for r in range(R):
        valid = eg[r] >= 0
        sbar_of_elem[r][valid] = sbar_of_gelem[eg[r][valid]]

    edges = []  # (sbar, src, dst)
    for mem, s in sbar_ids.items():
        for a in mem:
            for b in mem:
                if a != b:
                    edges.append((s, a, b))
    edges.sort(key=lambda e: (e[1], e[0]))  # by (src, sbar) for prefix scans
    P = max(len(edges), 1)
    e_arr = np.asarray(edges or [(0, 0, 0)], np.int64)

    Pmax = 1
    per_rank = []
    for r in range(R):
        idx = [i for i, e in enumerate(edges) if e[1] == r]
        per_rank.append(idx)
        Pmax = max(Pmax, len(idx))
    my_edge_idx = np.full((R, Pmax), -1, np.int64)
    for r, idx in enumerate(per_rank):
        my_edge_idx[r, : len(idx)] = idx

    return BalancerTables(
        sbar_of_elem=jnp.asarray(sbar_of_elem, LID_DTYPE),
        edge_sbar=jnp.asarray(e_arr[:, 0], LID_DTYPE),
        edge_src=jnp.asarray(e_arr[:, 1], LID_DTYPE),
        edge_dst=jnp.asarray(e_arr[:, 2], LID_DTYPE),
        my_edge_idx=jnp.asarray(my_edge_idx, LID_DTYPE),
        num_sbars=max(S, 1),
        num_edges=P,
    )


def plan_flows(
    bt: BalancerTables,
    w_sr: jax.Array,          # (R, S) weight per (rank, sbar), all-gathered
    w_fixed: jax.Array,       # (R,) immovable weight per rank
    tol: float = 1.05,
    num_iters: int = 32,
    alpha: float = 0.5,
) -> jax.Array:
    """Jacobi flow relaxation over the sbar pair edges: returns integer
    particle flows per edge (the EnGPar balanceWeights replacement).  Pure
    function of replicated inputs → identical on every rank."""
    R, S = w_sr.shape
    P = bt.num_edges
    src, dst, sb = bt.edge_src, bt.edge_dst, bt.edge_sbar

    outdeg = jax.ops.segment_sum(
        jnp.ones((P,), jnp.float32), src, num_segments=R
    )
    outdeg = jnp.maximum(outdeg, 1.0)

    def body(t, carry):
        w, avail, flows = carry
        total = jnp.sum(w)
        avg = total / R
        surplus = w[src] - avg
        deficit = avg - w[dst]
        f = alpha * jnp.minimum(surplus, deficit) / outdeg[src]
        f = jnp.clip(f, 0.0, avail[src, sb])
        w = w + jax.ops.segment_sum(f, dst, num_segments=R) \
              - jax.ops.segment_sum(f, src, num_segments=R)
        avail = avail.at[src, sb].add(-f)
        return w, avail, flows + f

    w0 = w_fixed + jnp.sum(w_sr, axis=1)
    _, _, flows = jax.lax.fori_loop(
        0, num_iters, body, (w0, w_sr, jnp.zeros((P,), jnp.float32))
    )
    return jnp.floor(flows).astype(jnp.int32)


def select_particles(
    bt: BalancerTables,
    flows: jax.Array,         # (P,) from plan_flows
    sbar: jax.Array,          # (N,) particle sbar (-1 immovable)
    candidate: jax.Array,     # (N,) bool: active & staying home
    dest_rank: jax.Array,     # (N,) current destinations
    me: jax.Array,
) -> jax.Array:
    """Relabel up to flow[e] candidates per outgoing edge (selectParticles,
    lb.hpp:229-287).  Returns updated dest_rank."""
    N = sbar.shape[0]
    S = bt.num_sbars
    Pmax = bt.my_edge_idx.shape[1]

    mye = bt.my_edge_idx[me]                       # (Pmax,)
    mye_valid = mye >= 0
    mye_c = jnp.maximum(mye, 0)
    e_sbar = jnp.where(mye_valid, bt.edge_sbar[mye_c], S)
    e_dst = jnp.where(mye_valid, bt.edge_dst[mye_c], -1)
    e_flow = jnp.where(mye_valid, flows[mye_c], 0)

    # per-sbar prefix of my edges (my_edge_idx is sorted by sbar)
    cumsum = jnp.cumsum(e_flow)
    sbar_first = jax.ops.segment_min(
        jnp.arange(Pmax, dtype=jnp.int32), e_sbar, num_segments=S + 1
    )  # first edge position per sbar
    base = jnp.where(
        sbar_first[jnp.minimum(e_sbar, S)] > 0,
        cumsum[jnp.maximum(sbar_first[jnp.minimum(e_sbar, S)] - 1, 0)],
        0,
    )
    e_start = jnp.concatenate([jnp.zeros(1, e_flow.dtype), cumsum[:-1]]) - base
    e_end = e_start + e_flow

    # rank of each candidate within its sbar
    key = jnp.where(candidate & (sbar >= 0), sbar, S)
    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    counts = jax.ops.segment_sum(
        jnp.ones((N,), jnp.int32), sorted_key, num_segments=S + 1
    )
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)])
    rank_sorted = jnp.arange(N, dtype=jnp.int32) - starts[
        jnp.minimum(sorted_key, S)
    ]
    rank_in_sbar = jnp.zeros((N,), jnp.int32).at[order].set(rank_sorted)

    # assign: candidate i in sbar s goes to edge e iff s==e_sbar and
    # e_start <= rank < e_end  (N x Pmax mask)
    ps = sbar[:, None]
    pr = rank_in_sbar[:, None]
    hit = (
        candidate[:, None]
        & (ps >= 0)
        & (ps == e_sbar[None, :])
        & (pr >= e_start[None, :])
        & (pr < e_end[None, :])
    )
    chosen_dst = jnp.max(
        jnp.where(hit, e_dst[None, :], -1), axis=1
    )
    return jnp.where(chosen_dst >= 0, chosen_dst, dest_rank).astype(dest_rank.dtype)


def repartition(
    bt: BalancerTables,
    sbar_of_elem_local: jax.Array,   # (E,) this rank's sbar map
    new_elem: jax.Array,             # (N,) post-search local elements
    active: jax.Array,
    dest_rank: jax.Array,            # (N,) from set_unsafe_procs
    me: jax.Array,
    tol: float = 1.05,
    axis_name: str = RANK_AXIS,
) -> jax.Array:
    """Full LB pass inside shard_map: weight accumulation (forced migrations
    counted at their destination, addWeights analog), diffusion plan,
    particle selection.  Returns updated dest_rank."""
    S = bt.num_sbars
    R = jax.lax.axis_size(axis_name)

    sbar = jnp.where(
        active & (new_elem >= 0),
        sbar_of_elem_local[jnp.maximum(new_elem, 0)],
        -1,
    )
    staying = active & (dest_rank == me)

    # local movable weight per sbar; weight headed elsewhere is "fixed" at
    # its destination for planning purposes
    keys = jnp.where(staying & (sbar >= 0), sbar, S)
    w_local = jax.ops.segment_sum(
        jnp.ones_like(keys, jnp.float32), keys, num_segments=S + 1
    )[:S]
    fixed_local = jnp.sum(
        (active & ((sbar < 0) | ~staying)).astype(jnp.float32)
    )

    w_sr = jax.lax.all_gather(w_local, axis_name)          # (R, S)
    w_fixed = jax.lax.all_gather(fixed_local, axis_name)   # (R,)

    flows = plan_flows(bt, w_sr, w_fixed, tol)
    return select_particles(bt, flows, sbar, staying, dest_rank, me)


def ptcl_imbalance(num_local: jax.Array, axis_name: str = RANK_AXIS):
    """printPtclImb analog (lb.hpp:380-398): (max, avg, imbalance) across
    ranks; call inside shard_map."""
    n = num_local.astype(jnp.float32)
    mx = jax.lax.pmax(n, axis_name)
    total = jax.lax.psum(n, axis_name)
    R = jax.lax.axis_size(axis_name)
    avg = total / R
    return mx, avg, jnp.where(avg > 0, mx / avg, 1.0)
