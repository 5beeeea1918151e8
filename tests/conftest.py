"""Test configuration: run on CPU with 8 virtual devices.

This is the analog of the reference's ``mpirun -np {1,2,4}`` CTest harness
(SURVEY.md §4): XLA's host-platform device-count flag stands in for MPI ranks,
so distributed code paths (shard_map collectives) execute for real on one box.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
