"""Search tests — analogs of the reference's search2d / test_adj drivers
(test/search2d.cpp, test/test_adj.cpp): walk particles from a wrong starting
element to the element containing their destination, verify containment and
boundary-exit behavior against an exhaustive numpy point-location oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from pumipic_tpu.mesh import generate as gen
from pumipic_tpu.mesh.core import Mesh2D, Mesh3D
from pumipic_tpu.ops import search


def _cross2(u, v):
    return u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0]


def test_search_2d_rectangle():
    coords, tris = gen.rectangle_mesh(8, 8)
    m = Mesh2D.from_arrays(coords, tris)
    rng = np.random.default_rng(0)
    n = 256
    pts = rng.uniform(0.02, 0.98, size=(n, 2))
    elem_init = jnp.zeros(n, jnp.int32)  # deliberately wrong start
    active = jnp.ones(n, bool)
    res = search.search_mesh_2d(
        m, jnp.asarray(pts), jnp.asarray(pts), elem_init, active
    )
    assert bool(res.all_found)
    got = np.asarray(res.elem_ids)
    # verify containment (the oracle may pick the twin triangle on edges)
    ev = np.asarray(m.elem2verts)
    cz = np.asarray(m.coords)
    for i in range(n):
        t = ev[got[i]]
        a, b, c = cz[t[0]], cz[t[1]], cz[t[2]]
        p = pts[i]
        d1 = _cross2(b - a, p - a)
        d2 = _cross2(c - b, p - b)
        d3 = _cross2(a - c, p - c)
        assert d1 >= -1e-5 and d2 >= -1e-5 and d3 >= -1e-5, (i, got[i])


def test_search_2d_exit_domain():
    coords, tris = gen.rectangle_mesh(4, 4)
    m = Mesh2D.from_arrays(coords, tris)
    pts = jnp.asarray([[2.0, 0.5], [-1.0, 0.5], [0.5, 0.5]])
    elem_init = jnp.zeros(3, jnp.int32)
    active = jnp.ones(3, bool)
    res = search.search_mesh_2d(m, pts, pts, elem_init, active)
    assert bool(res.all_found)
    ids = np.asarray(res.elem_ids)
    assert ids[0] == -1 and ids[1] == -1 and ids[2] >= 0


def test_search_2d_inactive_particles():
    coords, tris = gen.rectangle_mesh(4, 4)
    m = Mesh2D.from_arrays(coords, tris)
    pts = jnp.asarray([[0.5, 0.5], [0.6, 0.6]])
    active = jnp.asarray([True, False])
    res = search.search_mesh_2d(m, pts, pts, jnp.zeros(2, jnp.int32), active)
    ids = np.asarray(res.elem_ids)
    assert ids[0] >= 0 and ids[1] == -1


def test_search_2d_reflect_boundary():
    coords, tris = gen.rectangle_mesh(4, 4)
    m = Mesh2D.from_arrays(coords, tris)
    # target outside across x=1 wall: reflected destination should be inside
    pts_tgt = jnp.asarray([[1.3, 0.52]])
    res = search.search_mesh_2d(
        m,
        jnp.asarray([[0.9, 0.52]]),
        pts_tgt,
        jnp.zeros(1, jnp.int32),
        jnp.ones(1, bool),
        boundary_handler=search.reflect_on_exit_2d,
    )
    assert bool(res.all_found)
    assert int(res.elem_ids[0]) >= 0
    np.testing.assert_allclose(np.asarray(res.dest)[0], [0.7, 0.52], atol=1e-5)


def test_search_3d_box():
    coords, tets = gen.box_tet_mesh(4, 4, 4)
    m = Mesh3D.from_arrays(coords, tets)
    rng = np.random.default_rng(1)
    n = 128
    pts = rng.uniform(0.05, 0.95, size=(n, 3))
    res = search.search_mesh_3d(
        m, jnp.asarray(pts), jnp.asarray(pts),
        jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
    )
    assert bool(res.all_found)
    got = np.asarray(res.elem_ids)
    assert np.all(got >= 0)
    # containment check via volumes
    ev = np.asarray(m.elem2verts)
    cz = np.asarray(m.coords)
    for i in range(n):
        t = ev[got[i]]
        v = cz[t]
        p = pts[i]
        vol = np.dot(v[3] - v[0], np.cross(v[1] - v[0], v[2] - v[0]))
        for k in range(4):
            vv = v.copy()
            vv[k] = p
            w = np.dot(vv[3] - vv[0], np.cross(vv[1] - vv[0], vv[2] - vv[0]))
            assert w / vol >= -1e-4, (i, got[i], k)


def test_search_3d_exit_domain():
    coords, tets = gen.box_tet_mesh(2, 2, 2)
    m = Mesh3D.from_arrays(coords, tets)
    pts = jnp.asarray([[0.5, 0.5, 3.0]])
    res = search.search_mesh_3d(
        m, pts, pts, jnp.zeros(1, jnp.int32), jnp.ones(1, bool)
    )
    assert int(res.elem_ids[0]) == -1


def test_trace_dispatch():
    coords, tris = gen.rectangle_mesh(2, 2)
    m2 = Mesh2D.from_arrays(coords, tris)
    pts = jnp.asarray([[0.5, 0.5]])
    res = search.trace_particle_through_mesh(
        m2, pts, pts, jnp.zeros(1, jnp.int32), jnp.ones(1, bool)
    )
    assert int(res.elem_ids[0]) >= 0
