from pumipic_tpu.ops import geometry, interpolate, push, scatter, search  # noqa: F401
