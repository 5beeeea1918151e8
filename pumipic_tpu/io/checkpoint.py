"""Checkpoint / resume.

Reference parity: ``pumipic::write/read`` (``src/pumipic_file.cpp:46-207``)
— persists picparts as one directory ``<prefix>_<nranks>.ppm`` holding a
per-rank Omega_h binary mesh plus a versioned blob of comm metadata (zlib,
endian-handled); the ParticleBalancer is rebuilt on read.  Particle state is
NOT checkpointed by the reference (apps own it) — here we checkpoint it too,
since resuming a PIC run without particles is rarely useful.

TPU-native: one compressed ``.npz`` per artifact (numpy handles endianness);
static metadata rides in a JSON sidecar array.  Device placement is the
caller's job (arrays come back on host).
"""
from __future__ import annotations

import dataclasses
import json
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1


def _flatten_tree(prefix: str, tree) -> Dict[str, np.ndarray]:
    out = {}
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for i, leaf in enumerate(leaves):
        out[f"{prefix}.{i}"] = np.asarray(leaf)
    return out


# ---------------------------------------------------------------------------
# picparts
# ---------------------------------------------------------------------------

def write_picparts(prefix: str, pp) -> str:
    """Persist a PicParts bundle to ``<prefix>_<nranks>.ppm.npz``
    (file-name parity with the reference's ``.ppm`` directories)."""
    from pumipic_tpu.mesh.core import Mesh2D

    path = f"{prefix}_{pp.num_ranks}.ppm.npz"
    mesh = pp.mesh
    meta = {
        "version": FORMAT_VERSION,
        "num_ranks": pp.num_ranks,
        "num_core_elems": pp.num_core_elems,
        "dim": mesh.dim,
        "nelems": mesh.nelems,
        "nverts": mesh.nverts,
        "nsides": mesh.nedges if mesh.dim == 2 else mesh.nfaces,
    }
    arrays: Dict[str, np.ndarray] = {
        "__meta__": np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    }
    for f in dataclasses.fields(pp):
        if f.name == "mesh" or f.metadata.get("static"):
            continue
        val = getattr(pp, f.name)
        if val is None:      # optional per-dim tables absent on this mesh dim
            continue
        arrays[f"pp.{f.name}"] = np.asarray(val)
    for f in dataclasses.fields(mesh):
        if f.metadata.get("static"):
            continue
        val = getattr(mesh, f.name)
        if isinstance(val, dict):
            for k, v in val.items():
                arrays[f"meshtag.{f.name}.{k}"] = np.asarray(v)
        else:
            arrays[f"mesh.{f.name}"] = np.asarray(val)
    np.savez_compressed(path, **arrays)
    return path


def read_picparts(path: str):
    """Load a PicParts bundle written by :func:`write_picparts`."""
    from pumipic_tpu.mesh.core import Mesh2D, Mesh3D
    from pumipic_tpu.parallel.picparts import PicParts

    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    if meta["version"] > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint version {meta['version']} newer than supported "
            f"{FORMAT_VERSION}"
        )
    mesh_cls = Mesh2D if meta["dim"] == 2 else Mesh3D
    mesh_kwargs = {}
    tags: Dict[str, Dict[str, jnp.ndarray]] = {"elem_tags": {}, "vert_tags": {}}
    for key in data.files:
        if key.startswith("mesh."):
            mesh_kwargs[key[5:]] = jnp.asarray(data[key])
        elif key.startswith("meshtag."):
            _, field, name = key.split(".", 2)
            tags[field][name] = jnp.asarray(data[key])
    static = dict(nelems=meta["nelems"], nverts=meta["nverts"])
    if meta["dim"] == 2:
        static["nedges"] = meta["nsides"]
    else:
        static["nfaces"] = meta["nsides"]
    mesh = mesh_cls(**mesh_kwargs, **tags, **static)

    pp_kwargs = {
        key[3:]: jnp.asarray(data[key])
        for key in data.files
        if key.startswith("pp.")
    }
    return PicParts(
        mesh=mesh,
        num_ranks=meta["num_ranks"],
        num_core_elems=meta["num_core_elems"],
        **pp_kwargs,
    )


# ---------------------------------------------------------------------------
# particle state
# ---------------------------------------------------------------------------

def write_particles(path: str, state: Dict[str, jax.Array], step: int = 0) -> str:
    """Persist a flat particle-state dict (the distributed state or a
    ParticleStructure's host mirror)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    meta = {"version": FORMAT_VERSION, "step": step,
            "fields": sorted(state.keys())}
    arrays = {f"f.{k}": np.asarray(v) for k, v in state.items()}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)
    return path


def read_particles(path: str) -> Tuple[Dict[str, np.ndarray], int]:
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    state = {k[2:]: data[k] for k in data.files if k.startswith("f.")}
    return state, meta["step"]


def write_particle_structure(path: str, ps, step: int = 0) -> str:
    """Checkpoint a ParticleStructure (layout rebuilt on read)."""
    host = ps.copy_to_host()
    host["__layout__"] = np.frombuffer(
        json.dumps({
            "layout": ps.layout, "num_elems": ps.num_elems,
            "capacity": ps.capacity, "soa_width": ps.soa_width,
            "chunk_size": ps.chunk_size, "sigma": min(ps.sigma, 2**30),
            "extra_padding": ps.scs_extra_padding,
            "pad_strategy": ps.scs_pad_strategy,
            "cabm_extra_padding": ps.cabm_extra_padding,
            "name": ps.name,
        }).encode(), dtype=np.uint8,
    )
    return write_particles(path, host, step)


def read_particle_structure(path: str):
    from pumipic_tpu.particles.structure import CSR, DPS, CabM, SCSInput, SellCSigma

    state, step = read_particles(path)
    cfg = json.loads(bytes(state.pop("__layout__")).decode())
    active = state.pop("active")
    elem = np.where(active, state.pop("elem"), -1)
    fields = {k: jnp.asarray(v) for k, v in state.items()}
    if cfg["layout"] == "scs":
        ps = SellCSigma(
            cfg["num_elems"], elem, fields=fields, capacity=cfg["capacity"],
            scs_input=SCSInput(
                chunk_size=cfg["chunk_size"], sigma=cfg["sigma"],
                extra_padding=cfg.get("extra_padding", 0.0),
                pad_strategy=cfg.get("pad_strategy", "proportionally"),
            ),
            name=cfg["name"],
        )
    elif cfg["layout"] == "cabm":
        ps = CabM(cfg["num_elems"], elem, fields=fields,
                  capacity=cfg["capacity"], soa_width=cfg["soa_width"],
                  extra_padding=cfg.get("cabm_extra_padding", 0.0),
                  name=cfg["name"])
    else:
        builder = {"csr": CSR, "dps": DPS}[cfg["layout"]]
        ps = builder(cfg["num_elems"], elem, fields=fields,
                     capacity=cfg["capacity"], name=cfg["name"])
    return ps, step
