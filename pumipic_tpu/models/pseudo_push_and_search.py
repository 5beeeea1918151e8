"""pseudoPushAndSearch — 3D push + search + migrate mini-app.

Reference parity: ``test/pseudoPushAndSearch.cpp`` — particles seeded on a
model face of a tet mesh, pushed a fixed distance along a direction vector
each step (push, :87-118), located with the 3D adjacency search, and
migrated/rebuilt; particles exiting the domain are deleted.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pumipic_tpu.mesh import generate as gen
from pumipic_tpu.mesh.core import Mesh3D
from pumipic_tpu.ops import push as push_ops
from pumipic_tpu.ops import search as search_ops
from pumipic_tpu.particles import SellCSigma, SCSInput, CSR, DPS, CabM

_BUILDERS = {
    "scs": lambda E, elems, fields: SellCSigma(
        E, elems, fields=fields, scs_input=SCSInput(chunk_size=8, sigma=None)
    ),
    "csr": lambda E, elems, fields: CSR(E, elems, fields=fields),
    "cabm": lambda E, elems, fields: CabM(E, elems, fields=fields),
    "dps": lambda E, elems, fields: DPS(E, elems, fields=fields),
}


@dataclass(frozen=True)
class PushSearchConfig:
    num_ptcls: int = 10_000
    num_iterations: int = 5
    push_dir: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    distance: float = 0.05       # reference: domain height / 20
    structure: str = "scs"
    max_search_iters: int = 100
    use_locator: bool = True


class PseudoPushAndSearch:
    def __init__(self, mesh: Mesh3D, cfg: PushSearchConfig, seed: int = 0):
        self.mesh = mesh
        self.cfg = cfg
        rng = np.random.default_rng(seed)

        # seed particles uniformly over elements, at element centroids with
        # jitter toward a random vertex (uniform-in-tet via folded sampling)
        elems = rng.integers(0, mesh.nelems, size=cfg.num_ptcls)
        ev = np.asarray(mesh.elem2verts)[elems]
        cz = np.asarray(mesh.coords)
        r = rng.dirichlet(np.ones(4), size=cfg.num_ptcls)
        pos = np.einsum("nk,nkd->nd", r, cz[ev])

        d = np.asarray(cfg.push_dir, np.float64)
        d = d / np.linalg.norm(d)
        fields = {
            "x": jnp.asarray(pos, jnp.float32),
            "pid": jnp.arange(cfg.num_ptcls, dtype=jnp.int32),
        }
        self.direction = jnp.asarray(d, jnp.float32)
        self.ptcls = _BUILDERS[cfg.structure](
            mesh.nelems, np.sort(elems), {
                "x": fields["x"][np.argsort(elems, kind="stable")],
                "pid": fields["pid"][np.argsort(elems, kind="stable")],
            }
        )
        self._step = self._make_step()

    def _make_step(self):
        mesh, cfg, direction = self.mesh, self.cfg, self.direction
        locator = None
        if cfg.use_locator:
            from pumipic_tpu.mesh.locator import build_locator_grid_3d

            locator = build_locator_grid_3d(
                np.asarray(mesh.coords), np.asarray(mesh.elem2verts),
                walk_geom=mesh.walk_geom,
            )

        @jax.jit
        def step(ptcls):
            x = ptcls.get("x")
            xtgt = push_ops.straight_line_push(x, direction, cfg.distance)
            if locator is not None:
                res = search_ops.search_mesh_3d_accel(
                    mesh, locator, x, xtgt, ptcls.elem, ptcls.active,
                    cfg.max_search_iters,
                )
            else:
                res = search_ops.search_mesh_3d(
                    mesh, x, xtgt, ptcls.elem, ptcls.active,
                    cfg.max_search_iters,
                )
            ptcls2 = ptcls.set("x", res.dest).rebuild(res.elem_ids)
            return ptcls2, res.iters

        return step

    def run(self, num_iterations: Optional[int] = None, verbose: bool = False):
        iters = num_iterations or self.cfg.num_iterations
        history = []
        for i in range(iters):
            self.ptcls, walk_iters = self._step(self.ptcls)
            history.append(self.ptcls.n_ptcls())
            if verbose:
                from pumipic_tpu.utils.plog import print_info

                print_info("iter %d: ptcls %d walk %d", i, history[-1], int(walk_iters))
            if history[-1] == 0:
                break
        return history
