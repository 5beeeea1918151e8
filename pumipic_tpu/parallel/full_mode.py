"""FULL-buffer distributed mode: pure particle data-parallelism.

Reference parity: ``Input::FULL`` — every rank holds the complete mesh, the
whole domain is the safe zone, so particles never migrate and mesh-field
reductions collapse to a host ``MPI_Allreduce``
(``src/pumipic_comm.cpp:233-247``).  This is the reference's easiest
distribution and the TPU's most natural one: particles are sharded along
their flat axis over the ``"ranks"`` device axis, the mesh is replicated, and
every per-step field reduction is a single ``psum`` riding the ICI.

The per-device body is the SAME single-device code (search, rebuild, scatter
are all shape-local); ``shard_map`` + ``psum`` is the only distribution
logic.  Load balance across devices is by construction (equal shard sizes).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pumipic_tpu.parallel.mesh_axis import RANK_AXIS


def reduce_vertex_field(field: jax.Array) -> jax.Array:
    """reduceCommArray(FULL, SUM) analog: allreduce over the rank axis.
    Call inside a shard_map body."""
    return jax.lax.psum(field, RANK_AXIS)


def shard_particles(mesh: Mesh, arrays, pad_value=0):
    """Place flat particle arrays (leading axis N) sharded over ranks,
    padding N up to a multiple of the rank count."""
    n_ranks = mesh.shape[RANK_AXIS]

    def place(x):
        n = x.shape[0]
        rem = (-n) % n_ranks
        if rem:
            pad = jnp.full((rem,) + x.shape[1:], pad_value, x.dtype)
            x = jnp.concatenate([x, pad])
        return jax.device_put(x, NamedSharding(mesh, P(RANK_AXIS)))

    return jax.tree_util.tree_map(place, arrays)


def make_dp_step(mesh: Mesh, per_device_step: Callable):
    """Wrap a single-device step ``(local_state) -> (local_state, fields)``
    into an SPMD step where ``fields`` (per-vertex arrays) are psummed.

    ``per_device_step`` must be shape-local (it is — all our kernels are).
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(RANK_AXIS),),
        out_specs=(P(RANK_AXIS), P()),
        check_vma=False,
    )
    def step(local_state):
        new_state, fields = per_device_step(local_state)
        fields = jax.tree_util.tree_map(
            lambda f: jax.lax.psum(f, RANK_AXIS), fields
        )
        return new_state, fields

    return jax.jit(step)
