"""Round-3c A/B: packed single-gather rebuild vs per-field gathers.

Full-rebuild fori churn loops (10% of particles move each iteration) for
SCS / CSR / CabM at 10M particles, with ``PACKED_REBUILD_GATHER`` toggled
at trace time through the unjitted ``_rebuild`` (the module flag is read
during tracing; using the jitted wrapper would hit its cache and ignore
the toggle).  One process, evolving state (docs/PERFORMANCE.md
measurement rules).

  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/rebuild_fused.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from pumipic_tpu.particles import (
    CSR, CabM, SCSInput, SellCSigma, distribute,
)
from pumipic_tpu.particles import structure as S

NE = int(os.environ.get("RF_NE", 1000))
NP = int(os.environ.get("RF_NP", 10_000_000))
ITERS = int(os.environ.get("RF_ITERS", 4))


def main():
    ppe, elems = distribute.distribute_particles(NE, NP, "uniform", seed=7)
    spec = {"pos": ((3,), jnp.float32), "vel": ((3,), jnp.float32),
            "pid": ((), jnp.int32)}
    structures = {
        "scs": SellCSigma(NE, elems, field_spec=spec,
                          scs_input=SCSInput(chunk_size=32)),
        "csr": CSR(NE, elems, field_spec=spec),
        "cabm": CabM(NE, elems, field_spec=spec),
    }
    raw_rebuild = S._rebuild.__wrapped__

    def churn(ps, i):
        e = ps.elem
        move = (jnp.arange(ps.capacity) % 10) == (i % 10)
        ne = jnp.where(ps.active & move, (e + 1) % NE, e)
        return jnp.where(ps.active, ne, -1)

    for packed in (False, True):
        S.PACKED_REBUILD_GATHER = packed
        for name, ps in structures.items():
            @jax.jit
            def loop(p):
                def body(i, c):
                    return raw_rebuild(c, churn(c, i), None, None)
                return jax.lax.fori_loop(0, ITERS, body, p)

            out = jax.block_until_ready(loop(ps))
            t0 = time.perf_counter()
            out = jax.block_until_ready(loop(out))
            dt = (time.perf_counter() - t0) * 1e3 / ITERS
            print(f"packed={int(packed)} {name}: {dt:.1f} ms/rebuild "
                  f"(capacity={ps.capacity}, nptcls={int(out.num_ptcls)})",
                  flush=True)


if __name__ == "__main__":
    main()
