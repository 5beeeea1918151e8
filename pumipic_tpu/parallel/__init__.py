from pumipic_tpu.parallel import mesh_axis  # noqa: F401
