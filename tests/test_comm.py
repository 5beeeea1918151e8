"""Comm-layer unit tests — the ViewComm_test.cpp analog (SURVEY.md §4):
exercises the collective primitives the framework builds on (psum/pmax/
all_to_all/all_gather/ppermute under shard_map) plus our wrappers, on the
8-virtual-device CPU mesh.  This is how the reference tests GPU-aware comm
without special hardware — MPI itself (here: XLA collectives) is the
simulator."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pumipic_tpu.parallel.mesh_axis import (
    RANK_AXIS,
    make_device_mesh,
    num_ranks,
    particle_sharding,
    replicated,
)

R = 8


def _mesh():
    return make_device_mesh(R)


def _smap(mesh, f, in_specs, out_specs):
    return jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      check_vma=False)
    )


def test_mesh_helpers():
    mesh = _mesh()
    assert num_ranks(mesh) == R
    assert particle_sharding(mesh).spec == P(RANK_AXIS)
    assert replicated(mesh).spec == P()


def test_psum_allreduce():
    mesh = _mesh()
    x = jax.device_put(
        jnp.arange(R, dtype=jnp.float32), NamedSharding(mesh, P(RANK_AXIS))
    )
    f = _smap(mesh, lambda v: jax.lax.psum(v, RANK_AXIS), (P(RANK_AXIS),), P())
    out = f(x)
    assert float(out[0]) == sum(range(R))


def test_all_to_all_transpose():
    """all_to_all with (R, K) send rows delivers row j to rank j — the
    exchange pattern migration and reduceCommArray rely on."""
    mesh = _mesh()
    K = 4
    # send[r, d, k] = r*100 + d  (payload labels source and destination)
    send = np.zeros((R, R, K), np.float32)
    for r in range(R):
        for d in range(R):
            send[r, d] = r * 100 + d
    x = jax.device_put(jnp.asarray(send), NamedSharding(mesh, P(RANK_AXIS)))

    def body(v):
        out = jax.lax.all_to_all(v[0], RANK_AXIS, split_axis=0, concat_axis=0)
        return out[None]

    f = _smap(mesh, body, (P(RANK_AXIS),), P(RANK_AXIS))
    out = np.asarray(f(x))
    # on rank d, row s must be s*100 + d
    for d in range(R):
        for s in range(R):
            assert (out[d, s] == s * 100 + d).all()


def test_all_gather():
    mesh = _mesh()
    x = jax.device_put(
        jnp.arange(R, dtype=jnp.float32)[:, None],
        NamedSharding(mesh, P(RANK_AXIS)),
    )

    def body(v):
        return jax.lax.all_gather(v[0], RANK_AXIS)[None]

    f = _smap(mesh, body, (P(RANK_AXIS),), P(RANK_AXIS))
    out = np.asarray(f(x))
    for r in range(R):
        np.testing.assert_array_equal(
            out[r].ravel(), np.arange(R, dtype=np.float32)
        )


def test_ppermute_ring():
    """ppermute ring shift — the Distributor-style neighbor exchange."""
    mesh = _mesh()
    x = jax.device_put(
        jnp.arange(R, dtype=jnp.float32)[:, None],
        NamedSharding(mesh, P(RANK_AXIS)),
    )

    def body(v):
        out = jax.lax.ppermute(
            v[0], RANK_AXIS, [(i, (i + 1) % R) for i in range(R)]
        )
        return out[None]

    f = _smap(mesh, body, (P(RANK_AXIS),), P(RANK_AXIS))
    out = np.asarray(f(x))[:, 0]
    np.testing.assert_array_equal(out, np.roll(np.arange(R), 1))


def test_pmax_pmin():
    mesh = _mesh()
    x = jax.device_put(
        jnp.arange(R, dtype=jnp.float32), NamedSharding(mesh, P(RANK_AXIS))
    )

    def body(v):
        return jnp.stack([
            jax.lax.pmax(v[0], RANK_AXIS), jax.lax.pmin(v[0], RANK_AXIS)
        ])

    f = _smap(mesh, body, (P(RANK_AXIS),), P())
    out = np.asarray(f(x))
    assert out[0] == R - 1 and out[1] == 0
