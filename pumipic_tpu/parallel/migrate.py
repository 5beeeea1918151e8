"""Distributed particle migration over the device mesh.

Reference parity: ``SellCSigma::migrate`` (scs/SCS_migrate.h:4-221) and
``pumipic::migrate_ptcls``/``setUnsafeProcs`` (src/pumipic_ptcl_ops.hpp:17-85)
— particles whose post-search element is outside the safe zone are sent to
that element's owner; ranks exchange counts then per-member views; receivers
translate global element ids to local ids and rebuild.

TPU-native: the ragged Isend/Irecv exchange becomes a **fixed-capacity
bucketed all_to_all**: each rank packs up to ``cap`` departing particles per
destination into a (R, cap, F) buffer (slot = dest-rank-relative rank,
computed with the same sort machinery as rebuild), one ``lax.all_to_all``
moves every bucket in one collective, and arrivals translate GID→LID with a
binary search over the picpart's sorted global ids (the reference's
``Kokkos::UnorderedMap`` lookup, SCS_buildFns.h:102-113).  Overflow (more
than ``cap`` leavers to one destination) is detected and reported, not
silently dropped — the caller grows ``cap`` and re-runs (same recompile
economics as particle-structure capacity growth).

All functions run INSIDE shard_map on local views.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pumipic_tpu.parallel.mesh_axis import RANK_AXIS

INVALID = -1


class MigrateResult(NamedTuple):
    state: Dict[str, jax.Array]   # updated local particle state
    num_sent: jax.Array           # () particles that left this rank
    num_recv: jax.Array           # () particles that arrived
    overflow: jax.Array           # () bool: a destination bucket overflowed


def set_unsafe_procs(
    elem_safe: jax.Array,
    elem_owner: jax.Array,
    new_elem: jax.Array,
    active: jax.Array,
    my_rank: jax.Array,
) -> jax.Array:
    """setUnsafeProcs analog (ptcl_ops.hpp:32-52): destination rank per
    particle — stay home while in the safe zone, else the element's owner."""
    e = jnp.maximum(new_elem, 0)
    safe = elem_safe[e] & (new_elem >= 0)
    owner = elem_owner[e]
    return jnp.where(active & (new_elem >= 0) & ~safe, owner, my_rank)


def gid_to_lid(gid_sorted: jax.Array, gid_perm: jax.Array, gids: jax.Array
               ) -> jax.Array:
    """Translate global element ids to local ids via binary search over the
    picpart's sorted gid table; -1 if not present."""
    E = gid_sorted.shape[0]
    pos = jnp.searchsorted(gid_sorted, gids)
    pos_c = jnp.minimum(pos, E - 1)
    found = gid_sorted[pos_c] == gids
    return jnp.where(found & (gids >= 0), gid_perm[pos_c], INVALID).astype(jnp.int32)


def migrate(
    state: Dict[str, jax.Array],   # flat particle arrays incl "elem","active"
    new_elem: jax.Array,           # (N,) post-search local element (-1 = lost)
    dest_rank: jax.Array,          # (N,) from set_unsafe_procs
    elem_gid: jax.Array,           # (E,) local -> global element id
    gid_sorted: jax.Array,         # (E,)
    gid_perm: jax.Array,           # (E,)
    my_rank: jax.Array,
    num_ranks: int,
    cap: int,
    axis_name: str = RANK_AXIS,
) -> MigrateResult:
    """Bucketed all_to_all migration (call inside shard_map).

    ``state`` fields ride in a single packed f32 buffer (ints bitcast), so
    the collective is ONE all_to_all regardless of member count — the
    reference sends one message per member type per neighbor
    (SCS_migrate.h:147-175).
    """
    N = new_elem.shape[0]
    R, K = num_ranks, cap
    active = state["active"] & (new_elem >= 0)
    leaving = active & (dest_rank != my_rank)
    staying = active & ~leaving

    # slot within destination bucket: order leavers by dest, rank them
    key = jnp.where(leaving, dest_rank, R)
    order = jnp.argsort(key, stable=True)          # leavers grouped by dest
    sorted_key = key[order]
    # counts per dest and start offsets
    counts = jax.ops.segment_sum(
        jnp.ones((N,), jnp.int32), sorted_key, num_segments=R + 1
    )[:R]
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)])
    rank_in_dest = jnp.arange(N, dtype=jnp.int32) - starts[
        jnp.minimum(sorted_key, R)
    ]
    # slot in (R*K) send buffer; >=K overflows (dropped + flagged)
    slot_sorted = jnp.where(
        (sorted_key < R) & (rank_in_dest < K),
        sorted_key * K + rank_in_dest,
        R * K,
    )
    slot = jnp.zeros((N,), jnp.int32).at[order].set(slot_sorted)
    overflow = jnp.any(counts > K)
    num_sent = jnp.sum(leaving.astype(jnp.int32))

    # pack payload: gid + every field, as f32 lanes (ints bitcast)
    def to_lanes(arr):
        if arr.ndim == 1:
            arr = arr[:, None]
        if arr.dtype == jnp.float32:
            return arr
        if arr.dtype == jnp.int32:
            return jax.lax.bitcast_convert_type(arr, jnp.float32)
        if arr.dtype == jnp.bool_:
            return arr.astype(jnp.float32)
        raise TypeError(f"unsupported migrate dtype {arr.dtype}")

    gid = jnp.where(leaving, elem_gid[jnp.maximum(new_elem, 0)], INVALID)
    payload_parts = [to_lanes(gid.astype(jnp.int32))]
    field_slices = {}
    off = 1
    for name in sorted(state.keys()):
        if name in ("elem", "active"):
            continue
        lanes = to_lanes(state[name])
        field_slices[name] = (off, off + lanes.shape[1], state[name].dtype,
                              state[name].ndim)
        off += lanes.shape[1]
        payload_parts.append(lanes)
    payload = jnp.concatenate(payload_parts, axis=1)   # (N, F)
    F = payload.shape[1]

    send = jnp.full((R * K, F), jnp.float32(0), jnp.float32)
    # invalid gid marker for empty slots
    send = send.at[:, 0].set(
        jax.lax.bitcast_convert_type(jnp.full((R * K,), INVALID, jnp.int32),
                                     jnp.float32)
    )
    send = send.at[slot].set(payload, mode="drop")
    send = send.reshape(R, K, F)

    recv = jax.lax.all_to_all(
        send, axis_name, split_axis=0, concat_axis=0, tiled=False
    ).reshape(R * K, F)

    arr_gid = jax.lax.bitcast_convert_type(recv[:, 0], jnp.int32)
    arr_valid = arr_gid >= 0
    arr_lid = gid_to_lid(gid_sorted, gid_perm, arr_gid)
    arr_valid = arr_valid & (arr_lid >= 0)
    num_recv = jnp.sum(arr_valid.astype(jnp.int32))

    # place arrivals into free slots (stayers keep theirs); stable argsort
    # compaction instead of bounded nonzero (much cheaper on TPU)
    free = jnp.argsort(staying, stable=True).astype(jnp.int32)
    n_free = jnp.sum((~staying).astype(jnp.int32))
    arr_pos = jnp.cumsum(arr_valid.astype(jnp.int32)) - 1
    arr_slot = jnp.where(
        arr_valid & (arr_pos < n_free), free[jnp.minimum(arr_pos, N - 1)], N
    )
    recv_overflow = num_recv > n_free

    new_state = {}
    elem_out = jnp.where(staying, new_elem, INVALID)
    elem_out = elem_out.at[arr_slot].set(arr_lid, mode="drop")
    active_out = staying.at[arr_slot].set(arr_valid, mode="drop")
    new_state["elem"] = elem_out
    new_state["active"] = active_out
    for name in sorted(state.keys()):
        if name in ("elem", "active"):
            continue
        lo, hi, dtype, ndim = field_slices[name]
        lanes = recv[:, lo:hi]
        if dtype == jnp.int32:
            vals = jax.lax.bitcast_convert_type(lanes, jnp.int32)
        elif dtype == jnp.bool_:
            vals = lanes > 0.5
        else:
            vals = lanes
        if ndim == 1:
            vals = vals[:, 0]
        kept = jnp.where(
            staying if state[name].ndim == 1 else staying[:, None],
            state[name], jnp.zeros_like(state[name]),
        )
        new_state[name] = kept.at[arr_slot].set(vals, mode="drop")

    return MigrateResult(
        state=new_state,
        num_sent=num_sent,
        num_recv=num_recv,
        overflow=overflow | recv_overflow,
    )
