from pumipic_tpu.io import checkpoint  # noqa: F401
