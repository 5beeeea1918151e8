"""On-chip invariant checks for the particle-structure data paths.

CPU tests cannot see TPU-only failure classes — round-3c found the TPU
flushing denormal bit patterns in f32-carried int lanes (a 10M SCS
construction silently placed 0.1% of its particles while every CPU test
stayed green) and narrow-pack layout blowups that only OOM at real sizes.
This script runs the classes of op that can fail that way AT SIZE on the
chip and asserts conservation:

  PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/tpu_invariants.py

Checks (default 10M particles, ~5 min with compile):
  1. construction places every particle, for all four layouts;
  2. two churn rebuilds conserve the active count and the pid multiset
     (packed s32-carrier gather exactness, incl. the int lane);
  3. single-process migrate (remove + rebuild) conserves the survivors;
  4. the MXU histogram matches the sorted histogram at >2^24 rows;
  5. the in-place reshuffle (rebuild mode="auto", scs/cabm) conserves the
     active count and pid multiset at size, and its fits-guard falls back
     to the sort path identically (the mover sort + searchsorted matching
     runs int32 end-to-end — no f32-carried lanes — but the at-size check
     guards the scatter/gather layout class).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses

import jax
import jax.numpy as jnp

from pumipic_tpu.ops.scatter import count_per_key, count_per_key_matmul
from pumipic_tpu.particles import (
    CSR, DPS, CabM, SCSInput, SellCSigma, distribute,
)

NE = int(os.environ.get("TI_NE", 1000))
NP = int(os.environ.get("TI_NP", 10_000_000))


def check(name, cond, detail=""):
    status = "ok" if cond else "FAIL"
    print(f"  [{status}] {name} {detail}", flush=True)
    assert cond, f"{name}: {detail}"


def main():
    ppe, elems = distribute.distribute_particles(NE, NP, "uniform", seed=11)
    spec = {"pos": ((3,), jnp.float32), "pid": ((), jnp.int32)}
    builders = {
        "scs": lambda: SellCSigma(NE, elems, field_spec=spec,
                                  scs_input=SCSInput(chunk_size=32)),
        "csr": lambda: CSR(NE, elems, field_spec=spec),
        "cabm": lambda: CabM(NE, elems, field_spec=spec),
        "dps": lambda: DPS(NE, elems, field_spec=spec),
    }
    for name, build in builders.items():
        print(f"{name}:", flush=True)
        ps = build()
        act = jax.device_get(ps.active)
        check("construction places all", int(act.sum()) == NP,
              f"({int(act.sum())}/{NP})")
        # unique pids so the rebuild can be audited
        pid = jnp.arange(ps.capacity, dtype=jnp.int32)
        ps = dataclasses.replace(ps, fields={**ps.fields, "pid": pid})
        import numpy as np
        exp_pid = int(np.asarray(jax.device_get(pid))[act].astype("int64").sum())

        @jax.jit
        def two_churns(p):
            e = jnp.where(p.active, (p.elem + 1) % NE, -1)
            p = p.rebuild(e)
            e = jnp.where(p.active, (p.elem + 7) % NE, -1)
            return p.rebuild(e)

        ps2 = two_churns(ps)
        act2 = jax.device_get(ps2.active)
        pid2 = np.asarray(jax.device_get(ps2.fields["pid"]))
        check("rebuild conserves actives", int(act2.sum()) == NP,
              f"({int(act2.sum())}/{NP})")
        check("rebuild conserves pid multiset",
              int(pid2[act2].astype("int64").sum()) == exp_pid)
        # single-process migrate: ~1/8 of particles leave to another rank
        leave = (pid % 8) == 3
        ps3 = ps.migrate(ps.elem, jnp.where(leave, 1, 0), my_rank=0)
        act3 = jax.device_get(ps3.active)
        keep = int(jax.device_get(
            (ps.active & ~leave).astype(jnp.int32)).sum())
        check("migrate removes exactly the leavers",
              int(act3.sum()) == keep, f"({int(act3.sum())}/{keep})")

    # reshuffle at size: count-preserving swap churn (always fits), then a
    # shifted churn (never fits -> in-cond fallback to the sort path)
    import numpy as np
    for name in ("scs", "cabm"):
        print(f"{name} reshuffle:", flush=True)
        if name == "scs":
            ps = SellCSigma(NE, elems, field_spec=spec,
                            scs_input=SCSInput(chunk_size=32,
                                               extra_padding=0.15))
        else:
            ps = CabM(NE, elems, field_spec=spec)
        pid = jnp.arange(ps.capacity, dtype=jnp.int32)
        ps = dataclasses.replace(ps, fields={**ps.fields, "pid": pid})
        act = jax.device_get(ps.active)
        exp_pid = int(np.asarray(jax.device_get(pid))[act].astype("int64").sum())

        # count-preserving swap churn built on host: pair up 10% of live
        # particles and swap their elements — per-element counts unchanged,
        # so the reshuffle ALWAYS fits (movers into e == leavers from e)
        cur = np.where(act, np.asarray(jax.device_get(ps.elem)), -1)
        new_elem = cur.copy()
        rng = np.random.default_rng(5)
        live = np.flatnonzero(cur >= 0)
        k = (len(live) // 10) // 2 * 2
        sel = rng.choice(live, size=k, replace=False)
        a, b = sel[: k // 2], sel[k // 2:]
        new_elem[a], new_elem[b] = cur[b], cur[a]

        step = jax.jit(lambda p, ne: p.rebuild(ne, mode="auto"))
        ps1 = step(ps, jnp.asarray(new_elem))
        act1 = jax.device_get(ps1.active)
        pid1 = np.asarray(jax.device_get(ps1.fields["pid"]))
        keep = act & (new_elem == cur) & (new_elem >= 0)
        pid0 = np.asarray(jax.device_get(pid))
        check("reshuffle branch ran (stayers kept slots)",
              bool(np.array_equal(pid1[keep], pid0[keep]))
              and bool(act1[keep].all()))
        check("reshuffle conserves actives", int(act1.sum()) == NP,
              f"({int(act1.sum())}/{NP})")
        check("reshuffle conserves pid multiset",
              int(pid1[act1].astype("int64").sum()) == exp_pid)
        # global shift: every particle moves -> misfit -> in-cond fallback
        ps2 = jax.jit(lambda p: p.rebuild(
            jnp.where(p.active, (p.elem + 7) % NE, -1), mode="auto"))(ps1)
        act2 = jax.device_get(ps2.active)
        pid2 = np.asarray(jax.device_get(ps2.fields["pid"]))
        check("fallback conserves actives", int(act2.sum()) == NP,
              f"({int(act2.sum())}/{NP})")
        check("fallback conserves pid multiset",
              int(pid2[act2].astype("int64").sum()) == exp_pid)
        check("no overflow", not bool(ps2.overflowed))

    # histogram exactness past 2^24 rows (the chunked-accumulation path)
    key = jnp.concatenate([
        jnp.full((12_000_000,), NE, jnp.int32),
        jnp.asarray(elems, jnp.int32),
    ])
    cm, cs = jax.device_get(jax.jit(
        lambda k: (count_per_key_matmul(k, NE), count_per_key(k, NE)))(key))
    check("MXU histogram exact at >2^24 rows", int((cm != cs).sum()) == 0,
          f"(rows={key.shape[0]})")
    print("TPU INVARIANTS PASS", flush=True)


if __name__ == "__main__":
    main()
