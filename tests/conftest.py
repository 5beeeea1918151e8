"""Test configuration: run on CPU with 8 virtual devices.

This is the analog of the reference's ``mpirun -np {1,2,4}`` CTest harness
(SURVEY.md §4): XLA's host-platform device-count flag stands in for MPI ranks,
so distributed code paths (shard_map collectives) execute for real on one box.

Note: this environment's sitecustomize registers an out-of-tree TPU plugin
and forces ``jax_platforms`` via jax.config (the env var alone is NOT
enough) — so we must update the config after import, before any backend use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert len(jax.devices()) == 8, (
    f"tests need 8 virtual CPU devices, got {jax.devices()}"
)
