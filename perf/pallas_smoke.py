"""Smoke test: does a fused elementwise Pallas kernel of the band-eval
shape (sqrt + divides + long FMA recurrences, NO transcendentals) compile
and run on the axon TPU relay, and does it agree with the same math
evaluated through XLA?

Design notes baked in here and consumed by mesh/locator.py:
- atan2 is NOT lowered by Pallas TPU -> harmonics use c1 = x/r, s1 = y/r
  (exact, no angle), and the theta-bin uses the transcendental-free
  "diamond angle" tau(x, y) in [0, 4) (monotone in theta; calibration
  uses the same function, so bin-shape changes are absorbed).

  PYTHONPATH=/root/repo python perf/pallas_smoke.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("PS_N", 10_000_000))
ROWS = int(os.environ.get("PS_ROWS", 256))
COLS = 1024
J = 24
P = 12
RK = 8
NEWTON = 3
K_BANDS = 120
T_BINS = 1024

rng = np.random.default_rng(0)
cv = rng.normal(size=(RK, 2 * J + 1)).astype(np.float32) * 0.01
cu = rng.normal(size=(P + 1, RK)).astype(np.float32) * 0.1
ic = rng.normal(size=(11,)).astype(np.float32) * 0.05


def eval_block(x, y):
    """Full band-eval arithmetic shape: harmonics by recurrence from
    (x/r, y/r), rank->q projection, Horner seed, 3 Newton/Clenshaw
    passes, diamond-angle bin, fused cell id."""
    r2 = x * x + y * y
    r = jnp.sqrt(r2)
    inv_r = 1.0 / jnp.maximum(r, 1e-30)
    c1 = x * inv_r
    s1 = y * inv_r
    t = [jnp.full(x.shape, cv[k, 0], jnp.float32) for k in range(RK)]
    cj, sj = c1, s1
    for j in range(J):
        for k in range(RK):
            t[k] = t[k] + cv[k, 1 + j] * cj
            t[k] = t[k] + cv[k, 1 + J + j] * sj
        if j + 1 < J:
            cj, sj = cj * c1 - sj * s1, sj * c1 + cj * s1
    q = [sum(cu[p, k] * t[k] for k in range(RK)) for p in range(P + 1)]

    u = jnp.full(x.shape, ic[-1], jnp.float32)
    for p in range(len(ic) - 2, -1, -1):
        u = u * r + ic[p]
    u = jnp.clip(u, -1.05, 1.05)
    for _ in range(NEWTON):
        bk1 = jnp.zeros_like(u)
        bk2 = jnp.zeros_like(u)
        dk1 = jnp.zeros_like(u)
        dk2 = jnp.zeros_like(u)
        for p in range(P, 0, -1):
            dk1, dk2 = 2.0 * bk1 + 2.0 * u * dk1 - dk2, dk1
            bk1, bk2 = q[p] + 2.0 * u * bk1 - bk2, bk1
        val = q[0] + u * bk1 - bk2
        dv = bk1 + u * dk1 - dk2
        u = u - (val - r) / jnp.maximum(dv, 1e-6)
        u = jnp.clip(u, -1.05, 1.05)
    bstar = (u + 1.0) * (0.5 * K_BANDS)
    bf = jnp.clip(jnp.floor(bstar), 0.0, K_BANDS - 1.0)

    # diamond angle tau in [0, 4): monotone in theta, pure arithmetic
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    d = y / jnp.maximum(ax + ay, 1e-30)
    tau = jnp.where(x >= 0, jnp.where(y >= 0, d, 4.0 + d), 2.0 - d)
    tf = jnp.clip(jnp.floor(tau * (T_BINS / 4.0)), 0.0, T_BINS - 1.0)
    return bf * jnp.float32(T_BINS) + tf


def kernel(x_ref, y_ref, o_ref):
    o_ref[:] = eval_block(x_ref[:], y_ref[:])


def pallas_eval(x, y):
    n = x.shape[0]
    pad = (-n) % (ROWS * COLS)
    x2 = jnp.pad(x, (0, pad)).reshape(-1, COLS)
    y2 = jnp.pad(y, (0, pad)).reshape(-1, COLS)
    grid = x2.shape[0] // ROWS
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2, y2)
    return out.reshape(-1)[:n]


def main():
    print("backend:", jax.default_backend(), flush=True)
    x = jnp.asarray(rng.uniform(0.5, 2.0, N).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1.0, 1.0, N).astype(np.float32))

    f_p = jax.jit(pallas_eval)
    f_x = jax.jit(lambda a, b: eval_block(a, b))
    rp = jax.block_until_ready(f_p(x, y))
    rx = jax.block_until_ready(f_x(x, y))
    agree = float(jnp.mean((rp == rx).astype(jnp.float32)))
    print(f"cell agreement pallas vs xla: {agree:.6f}", flush=True)

    # evolving-state in-jit loop timing (measurement rules)
    def loop(f):
        @jax.jit
        def g(x, y):
            def body(_, c):
                x, y, a = c
                v = f(x, y)
                return x + 1e-7, y - 1e-7, a + v

            x, y, a = jax.lax.fori_loop(0, 10, body,
                                        (x, y, jnp.zeros_like(x)))
            return a.sum() + x.sum()
        return g

    for name, f in (("pallas", pallas_eval), ("xla", eval_block)):
        g = loop(f)
        jax.block_until_ready(g(x, y))
        t0 = time.perf_counter()
        jax.block_until_ready(g(x, y))
        dt = (time.perf_counter() - t0) / 10 * 1e3
        print(f"{name:8s} {dt:8.2f} ms/pass", flush=True)


if __name__ == "__main__":
    main()
