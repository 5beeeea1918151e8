"""Adjacency-walk particle search through unstructured meshes.

Reference parity:
- ``search_mesh_2d`` (``src/pumipic_adjacency.hpp:1011-1158``): per-particle
  BCC edge walk — check current element, mark boundary exits, cross the most
  violated edge; loop until a global min-reduce says everyone is done.
- ``search_mesh`` / ``search_mesh_3d`` (``:314-768``): tet BCC walk with
  intersection fallback.
- ``trace_particle_through_mesh`` (``src/pumipic_adjacency.tpp:460-615``):
  unified driver with a user-pluggable boundary handler (default
  ``RemoveParticleOnGeometricModelExit``, ``:617-639``).

TPU-first redesign: the whole walk is ONE ``lax.while_loop`` whose body is a
fully vectorized step over every particle (gather element basis → barycentric
matvec → argmin side → dual-graph crossing).  The reference re-launches three
kernels per step and reads a device-to-host min each iteration
(``adjacency.hpp:1120-1123``); here the convergence test is a device-side
``jnp.all`` folded into the loop condition, so the chip never stalls on the
host.  Cost per step is O(N) gathers + FMAs regardless of how many particles
are already done — profitable on TPU because the walk usually terminates in a
few steps and the masked lanes are pure bandwidth.

Termination semantics (same as the reference): the walk greedily crosses the
most-violated side toward the destination, which reaches any destination on a
convex domain or for local (few-element) moves.  On a non-convex domain a
walk aimed across a hole hits the interior boundary and is handed to the
boundary handler (default: delete) — identical to the reference's exposed-
side handling in ``checkExposedEdges``.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pumipic_tpu.mesh.core import Mesh2D, Mesh3D
from pumipic_tpu.ops import geometry as geo

INVALID = -1


class BoundaryCtx(NamedTuple):
    """What a boundary handler sees for particles that hit an exposed side."""

    elem: jax.Array      # (N,) element the particle is leaving
    side: jax.Array      # (N,) mesh edge/face id crossed
    orig: jax.Array      # (N, dim) walk origin
    dest: jax.Array      # (N, dim) current destination
    mesh: object


class BoundaryResult(NamedTuple):
    dest: jax.Array      # possibly modified destination
    elem: jax.Array      # element to continue in (INVALID to remove)
    done: jax.Array      # True → stop walking this particle


def remove_on_exit(ctx: BoundaryCtx) -> BoundaryResult:
    """Default handler: particle leaves the domain and is deleted
    (``RemoveParticleOnGeometricModelExit``, adjacency.tpp:617-639)."""
    n = ctx.elem.shape[0]
    return BoundaryResult(
        dest=ctx.dest,
        elem=jnp.full((n,), INVALID, dtype=ctx.elem.dtype),
        done=jnp.ones((n,), dtype=bool),
    )


def reflect_on_exit_2d(ctx: BoundaryCtx) -> BoundaryResult:
    """Specular reflection off the boundary edge; the walk continues in the
    same element with the mirrored destination (GITR-style wall handler)."""
    mesh: Mesh2D = ctx.mesh
    ev = mesh.edge2verts[jnp.maximum(ctx.side, 0)]
    a = mesh.coords[ev[:, 0]]
    b = mesh.coords[ev[:, 1]]
    t = b - a
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-30)
    ad = ctx.dest - a
    along = jnp.sum(ad * t, axis=-1, keepdims=True) * t
    mirrored = a + (2 * along - ad)
    return BoundaryResult(
        dest=mirrored,
        elem=ctx.elem,
        done=jnp.zeros(ctx.elem.shape[0], dtype=bool),
    )


class SearchResult(NamedTuple):
    elem_ids: jax.Array   # (N,) parent element per particle; INVALID if removed
    dest: jax.Array       # (N, dim) final destination (handlers may move it)
    iters: jax.Array      # () number of walk steps taken
    all_found: jax.Array  # () bool: everyone finished within the loop limit


@partial(jax.jit, static_argnames=("max_iters", "boundary_handler"))
def search_mesh_2d(
    mesh: Mesh2D,
    x_orig: jax.Array,
    x_tgt: jax.Array,
    elem_init: jax.Array,
    active: jax.Array,
    max_iters: int = 200,
    boundary_handler: Callable[[BoundaryCtx], BoundaryResult] = remove_on_exit,
) -> SearchResult:
    """Walk every active particle from ``elem_init`` to the element containing
    ``x_tgt``.  Inactive particles get ``elem_ids == INVALID``.

    Matches ``search_mesh_2d`` semantics (adjacency.hpp:1011-1158): boundary
    exits are delegated to ``boundary_handler``; particles still walking when
    ``max_iters`` is hit are deleted (elem = INVALID), as the reference does
    at its loop limit.
    """
    n = x_tgt.shape[0]
    elem0 = jnp.where(active, elem_init.astype(jnp.int32), INVALID)
    done0 = ~active

    def cond(state):
        elem, dest, done, it = state
        return (it < max_iters) & ~jnp.all(done)

    def body(state):
        elem, dest, done, it = state
        e_safe = jnp.maximum(elem, 0)

        inv_b = mesh.elem_inv_basis[e_safe]        # (N, 2, 2)
        v0 = mesh.elem_v0[e_safe]                  # (N, 2)
        w = geo.bcc_2d(inv_b, v0, dest)            # (N, 3)
        inside = geo.all_positive(w)

        # side to cross = edge opposite the most negative vertex weight
        exit_local = geo.exit_edge_2d(w)           # (N,)
        edge = mesh.elem2edges[e_safe, exit_local]  # (N,)
        nbrs = mesh.edge2elems[jnp.maximum(edge, 0)]  # (N, 2)
        exposed = nbrs[:, 1] == INVALID
        next_elem = jnp.where(nbrs[:, 0] == elem, nbrs[:, 1], nbrs[:, 0])

        walking = ~done
        hits_boundary = walking & ~inside & exposed

        bres = boundary_handler(
            BoundaryCtx(elem=elem, side=edge, orig=x_orig, dest=dest, mesh=mesh)
        )

        new_elem = jnp.where(
            walking & ~inside,
            jnp.where(exposed, bres.elem, next_elem),
            elem,
        )
        new_dest = jnp.where(hits_boundary[:, None], bres.dest, dest)
        new_done = done | (walking & inside) | (hits_boundary & bres.done)
        return new_elem, new_dest, new_done, it + 1

    elem, dest, done, iters = jax.lax.while_loop(
        cond, body, (elem0, x_tgt, done0, jnp.int32(0))
    )
    all_found = jnp.all(done)
    # loop-limit fallback: delete unfinished walkers (adjacency.hpp:1126-1149)
    elem = jnp.where(done, elem, INVALID)
    return SearchResult(elem_ids=elem, dest=dest, iters=iters, all_found=all_found)


@partial(jax.jit, static_argnames=("max_iters", "boundary_handler"))
def search_mesh_3d(
    mesh: Mesh3D,
    x_orig: jax.Array,
    x_tgt: jax.Array,
    elem_init: jax.Array,
    active: jax.Array,
    max_iters: int = 200,
    boundary_handler: Callable[[BoundaryCtx], BoundaryResult] = remove_on_exit,
) -> SearchResult:
    """Tet-mesh walk (BCC descent): cross the face opposite the most negative
    vertex weight until the destination's weights are all nonnegative.

    Equivalent to the reference's BCC path in ``search_mesh``
    (adjacency.hpp:558-768) with the same boundary/loop-limit semantics.
    """
    n = x_tgt.shape[0]
    elem0 = jnp.where(active, elem_init.astype(jnp.int32), INVALID)
    done0 = ~active

    def cond(state):
        elem, dest, done, it = state
        return (it < max_iters) & ~jnp.all(done)

    def body(state):
        elem, dest, done, it = state
        e_safe = jnp.maximum(elem, 0)

        inv_b = mesh.elem_inv_basis[e_safe]
        v0 = mesh.elem_v0[e_safe]
        w = geo.bcc_3d(inv_b, v0, dest)            # (N, 4)
        inside = geo.all_positive(w)

        exit_local = geo.min_index(w)              # face i opposite vertex i
        face = mesh.elem2faces[e_safe, exit_local]
        nbrs = mesh.face2elems[jnp.maximum(face, 0)]
        exposed = nbrs[:, 1] == INVALID
        next_elem = jnp.where(nbrs[:, 0] == elem, nbrs[:, 1], nbrs[:, 0])

        walking = ~done
        hits_boundary = walking & ~inside & exposed

        bres = boundary_handler(
            BoundaryCtx(elem=elem, side=face, orig=x_orig, dest=dest, mesh=mesh)
        )

        new_elem = jnp.where(
            walking & ~inside,
            jnp.where(exposed, bres.elem, next_elem),
            elem,
        )
        new_dest = jnp.where(hits_boundary[:, None], bres.dest, dest)
        new_done = done | (walking & inside) | (hits_boundary & bres.done)
        return new_elem, new_dest, new_done, it + 1

    elem, dest, done, iters = jax.lax.while_loop(
        cond, body, (elem0, x_tgt, done0, jnp.int32(0))
    )
    all_found = jnp.all(done)
    elem = jnp.where(done, elem, INVALID)
    return SearchResult(elem_ids=elem, dest=dest, iters=iters, all_found=all_found)


def trace_particle_through_mesh(
    mesh,
    x_orig: jax.Array,
    x_tgt: jax.Array,
    elem_init: jax.Array,
    active: jax.Array,
    max_iters: int = 200,
    boundary_handler: Callable[[BoundaryCtx], BoundaryResult] = remove_on_exit,
) -> SearchResult:
    """Unified 2D/3D driver (``trace_particle_through_mesh``,
    adjacency.tpp:460-615): dispatches on mesh dimension."""
    if mesh.dim == 2:
        return search_mesh_2d(
            mesh, x_orig, x_tgt, elem_init, active, max_iters, boundary_handler
        )
    return search_mesh_3d(
        mesh, x_orig, x_tgt, elem_init, active, max_iters, boundary_handler
    )
