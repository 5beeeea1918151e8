"""Device-mesh helpers: the TPU analog of the reference's MPI communicator
setup (``pumipic::Library``, src/pumipic_library.cpp:5-30).

One flat axis ``"ranks"`` plays the role of MPI_COMM_WORLD: each device holds
one PICpart (or one particle shard in FULL-buffer mode).  Multi-slice
topologies can reshape this into ("slice", "ranks") later; all collectives in
this package go through the axis name, not device ids.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RANK_AXIS = "ranks"


def make_device_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (RANK_AXIS,))


def num_ranks(mesh: Mesh) -> int:
    return mesh.shape[RANK_AXIS]


def particle_sharding(mesh: Mesh) -> NamedSharding:
    """Particles sharded along their flat axis."""
    return NamedSharding(mesh, P(RANK_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
