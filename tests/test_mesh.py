"""Mesh core tests: adjacency derivation invariants on generated meshes.

Mirrors the reference's reliance on Omega_h invariants (manifoldness,
exposed-side marking, measures) that pumi-pic assumes.
"""
import numpy as np
import pytest

from pumipic_tpu.mesh import adjacency as adj
from pumipic_tpu.mesh import generate as gen
from pumipic_tpu.mesh.core import Mesh2D, Mesh3D


def test_rectangle_adjacency():
    coords, tris = gen.rectangle_mesh(4, 3)
    a = adj.build_tri_adjacency(coords, tris)
    E = tris.shape[0]
    assert E == 2 * 4 * 3
    # Euler: V - E + F = 1 for a disk-like region (without outer face)
    V, Ned = coords.shape[0], a["edge2verts"].shape[0]
    assert V - Ned + E == 1
    # every interior edge has 2 elems, boundary edges 1
    exposed = a["side_is_exposed"]
    assert np.all((a["edge2elems"][:, 1] == -1) == exposed)
    assert exposed.sum() == 2 * (4 + 3)
    # total area
    assert np.isclose(a["elem_area"].sum(), 1.0)
    assert np.all(a["elem_area"] > 0)


def test_disk_mesh_valid():
    coords, tris, cls = gen.disk_mesh(5, 8)
    a = adj.build_tri_adjacency(coords, tris)
    assert np.isclose(a["elem_area"].sum(), np.pi, rtol=0.15)
    # boundary edge count == outermost ring vertex count
    assert a["side_is_exposed"].sum() == 8 * 5
    assert cls.min() == 1 and cls.max() == 5


def test_annulus_mesh_valid():
    coords, tris, cls = gen.annulus_mesh(4, 16, 0.5, 1.0)
    a = adj.build_tri_adjacency(coords, tris)
    exact = np.pi * (1.0**2 - 0.5**2)
    assert np.isclose(a["elem_area"].sum(), exact, rtol=0.1)
    assert a["side_is_exposed"].sum() == 2 * 16  # inner + outer boundary


def test_box_tet_adjacency():
    coords, tets = gen.box_tet_mesh(2, 2, 2)
    a = adj.build_tet_adjacency(coords, tets)
    assert tets.shape[0] == 6 * 8
    assert np.isclose(a["elem_volume"].sum(), 1.0)
    assert np.all(a["elem_volume"] > 0)
    # boundary faces: each box face has 2*n^2 triangles = 2*4=8, 6 faces
    assert a["side_is_exposed"].sum() == 6 * 8
    exposed = a["side_is_exposed"]
    assert np.all((a["face2elems"][:, 1] == -1) == exposed)


def test_mesh2d_device_build():
    coords, tris, cls = gen.disk_mesh(3, 6)
    m = Mesh2D.from_arrays(coords, tris, cls)
    assert m.nelems == tris.shape[0]
    assert m.elem_inv_basis.shape == (m.nelems, 2, 2)
    # inverse basis actually inverts: bcc of centroid == (1/3, 1/3)
    import jax.numpy as jnp

    cent = m.elem_centroids
    rel = cent - m.elem_v0
    lam = jnp.einsum("eij,ej->ei", m.elem_inv_basis, rel)
    assert np.allclose(np.asarray(lam), 1.0 / 3.0, atol=1e-5)


def test_mesh3d_device_build():
    coords, tets = gen.box_tet_mesh(2, 1, 1)
    m = Mesh3D.from_arrays(coords, tets)
    import jax.numpy as jnp

    cent = m.elem_centroids
    rel = cent - m.elem_v0
    lam = jnp.einsum("eij,ej->ei", m.elem_inv_basis, rel)
    assert np.allclose(np.asarray(lam), 0.25, atol=1e-5)


def test_tags_roundtrip():
    coords, tris = gen.rectangle_mesh(2, 2)
    m = Mesh2D.from_arrays(coords, tris)
    import jax.numpy as jnp

    m2 = m.set_tag(2, "has_particles", jnp.zeros(m.nelems, jnp.int32))
    assert m2.get_tag(2, "has_particles").shape == (m.nelems,)
    m3 = m2.set_tag(0, "w", jnp.ones(m.nverts))
    assert m3.get_tag(0, "w").shape == (m.nverts,)
