"""In-pipeline A/B: bf16 vs int8 one-hot operands in the MXU histogram
(the flagship's deposition counts, ops/scatter.py count_per_key_matmul).

The histogram matmul is HBM-bound on its two materialized one-hot operands
(10M x (n_hi + lo_width) elements); int8 halves those bytes and the MXU
accumulates 0/1 values EXACTLY in int32 (< 2^31, wider than f32's 2^24).
Both arms run the FULL dp flagship step (analytic locate default mesh) in
ONE process with evolving state — the only decision-grade comparison on
the relay (docs/PERFORMANCE.md measurement rules).

  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/hist8_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from pumipic_tpu.ops import scatter as sc

N = int(os.environ.get("H8_PTCLS", 10_000_000))
ITERS = int(os.environ.get("H8_ITERS", 10))
MODE = os.environ.get("H8_MODE", "dp")  # dp | walk


def main():
    from pumipic_tpu.models.pseudo_xgcm import (
        XGCmConfig, make_default_mesh, make_dp_setup,
    )
    from pumipic_tpu.parallel.mesh_axis import make_device_mesh

    mesh = make_default_mesh(24000)
    cfg = XGCmConfig(
        num_ptcls=N, mdl_face=max(int(np.asarray(mesh.class_id).max()) // 2, 2),
        deg_per_push=15.0, max_search_iters=64,
        analytic_locate=("off" if MODE == "walk" else "auto"),
    )
    dm = make_device_mesh()

    results = {}
    for arm, dt in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
        sc.HIST_ONEHOT_DTYPE = dt
        state, step = make_dp_setup(mesh, cfg, dm)
        state, fields = step(state)
        jax.block_until_ready(fields)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, fields = step(state)
        jax.block_until_ready(fields)
        dtm = (time.perf_counter() - t0) / ITERS * 1e3
        results[arm] = (dtm, float(np.asarray(fields["fwd"]).sum()))
        print(f"{arm}: {dtm:.3f} ms/step  fwd_sum={results[arm][1]:.1f}",
              flush=True)
    # identical deposition results (both exact integer counts)
    assert abs(results["bf16"][1] - results["int8"][1]) < 1e-3 * max(
        1.0, abs(results["bf16"][1]))
    sc.HIST_ONEHOT_DTYPE = jnp.bfloat16


if __name__ == "__main__":
    main()
