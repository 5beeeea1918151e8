"""Width sweep for the full prototype step (rot push + cell-resident rows +
pack_u32 compaction + deposition)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from pumipic_tpu.mesh.locator import build_locator_grid
from pumipic_tpu.models.pseudo_xgcm import (
    XGCmConfig, GyroConfig, make_default_mesh, build_gyro_mappings,
    seed_particles_per_element, uniform_points_in_elements,
)
from pumipic_tpu.ops import push as push_ops
from pumipic_tpu.ops import scatter as scatter_ops

from walk_opt9_lib import make_full_step, setup

N = 10_000_000
K = 5

ctx = setup(N)

for widths in [
    (N // 16, N // 128, 1024),
    (N // 24, N // 192, 1024),
    (N // 32, N // 256, 1024),
    (N // 16, N // 256, 1024),
    (N // 16, N // 128, N // 1024, 512),
    (N // 64, N // 512, 1024),
]:
    step, F0 = make_full_step(ctx, widths)

    @jax.jit
    def loop(s):
        return jax.lax.fori_loop(0, K, lambda i, s: step(s), s)

    out = loop(F0); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(out); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / K * 1e3
    wstr = ",".join(f"N/{N//w}" if w > 600 else str(w) for w in widths)
    print(f"FULL STEP widths=({wstr}) {dt:8.2f} ms/iter", flush=True)
