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
    import dataclasses

    structures = {
        "scs": SellCSigma(NE, elems, field_spec=spec,
                          scs_input=SCSInput(chunk_size=32)),
        "csr": CSR(NE, elems, field_spec=spec),
        "cabm": CabM(NE, elems, field_spec=spec),
    }
    # unique pids on the active slots so the loop can assert conservation
    expected = {}
    for name, ps in structures.items():
        pid = jnp.arange(ps.capacity, dtype=jnp.int32)
        structures[name] = dataclasses.replace(
            ps, fields={**ps.fields, "pid": pid})
        act0 = jax.device_get(ps.active)
        assert int(act0.sum()) == NP, (
            f"{name}: construction placed {int(act0.sum())}/{NP}")
        expected[name] = (int(act0.sum()),
                          int(jax.device_get(pid)[act0].astype("int64").sum()))
    raw_rebuild = S._rebuild.__wrapped__

    def churn(ps, i):
        e = ps.elem
        move = (jnp.arange(ps.capacity) % 10) == (i % 10)
        ne = jnp.where(ps.active & move, (e + 1) % NE, e)
        return jnp.where(ps.active, ne, -1)

    modes = (
        ("packed=0", dict(PACKED_REBUILD_GATHER=False,
                          SCS_VALID_FROM_KEYLANE=False)),
        ("packed=1 keylane=0", dict(PACKED_REBUILD_GATHER=True,
                                    SCS_VALID_FROM_KEYLANE=False)),
        ("packed=1 keylane=1", dict(PACKED_REBUILD_GATHER=True,
                                    SCS_VALID_FROM_KEYLANE=True)),
    )
    for label, flags in modes:
        for k, v in flags.items():
            setattr(S, k, v)
        for name, ps in structures.items():
            if name in ("csr",) and "keylane=1" in label:
                continue  # keylane only affects scs/cabm
            @jax.jit
            def loop(p):
                def body(i, c):
                    return raw_rebuild(c, churn(c, i), None, None)
                return jax.lax.fori_loop(0, ITERS, body, p)

            out = jax.block_until_ready(loop(ps))
            t0 = time.perf_counter()
            out = jax.block_until_ready(loop(out))
            dt = (time.perf_counter() - t0) * 1e3 / ITERS
            # corruption tripwires: the TPU flushes denormal bit patterns in
            # f32-carried int lanes (round-3c) — CPU tests cannot catch it,
            # so every TPU A/B asserts conservation here.
            act = jax.device_get(out.active)
            pid = jax.device_get(out.fields["pid"])
            n_act = int(act.sum())
            pid_sum = int(pid[act].astype("int64").sum())
            ok = (n_act, pid_sum) == expected[name]
            print(f"{label} {name}: {dt:.1f} ms/rebuild "
                  f"(capacity={ps.capacity}, active={n_act}, "
                  f"pid_conserved={ok})", flush=True)
            assert ok, f"{label} {name}: particle/pid corruption"


if __name__ == "__main__":
    main()
