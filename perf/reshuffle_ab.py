"""Round-3d A/B: in-place reshuffle (rebuild mode="auto") vs full sort.

The reference's SCS rebuild reshuffles into holes when the new counts fit
the existing layout (SCS_rebuild.h:3-120) and only re-constructs otherwise;
this harness measures the TPU formulation against the full sort rebuild
under the same churn the rebuild_fused harness used (10% of slots move to
the next element each iteration — counts stay ~constant, so the reshuffle
keeps fitting), plus a 50%-churn arm where the mover budget forces the
in-cond fallback every step (measures the guard tax).

One process, fori-fused evolving loops, conservation tripwires on-chip
(docs/PERFORMANCE.md measurement rules; round-3c corruption class).

  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/reshuffle_ab.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from pumipic_tpu.particles import CabM, SCSInput, SellCSigma, distribute
from pumipic_tpu.particles import structure as S

NE = int(os.environ.get("RS_NE", 1000))
NP = int(os.environ.get("RS_NP", 10_000_000))
ITERS = int(os.environ.get("RS_ITERS", 4))
PAD = float(os.environ.get("RS_PAD", 0.15))

raw_rebuild = S._rebuild.__wrapped__


def main():
    ppe, elems = distribute.distribute_particles(NE, NP, "uniform", seed=7)
    spec = {"pos": ((3,), jnp.float32), "vel": ((3,), jnp.float32),
            "pid": ((), jnp.int32)}
    structures = {
        "scs": SellCSigma(
            NE, elems, field_spec=spec,
            scs_input=SCSInput(chunk_size=32, extra_padding=PAD)),
        "cabm": CabM(NE, elems, field_spec=spec, extra_padding=PAD),
    }
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

    def churn(ps, i, denom):
        e = ps.elem
        move = (jnp.arange(ps.capacity) % denom) == (i % denom)
        ne = jnp.where(ps.active & move, (e + 1) % NE, e)
        return jnp.where(ps.active, ne, -1)

    denoms = tuple(int(d) for d in os.environ.get(
        "RS_DENOMS", "100,20,10,4,2").split(","))
    for denom in denoms:
        churn_label = f"{100.0 / denom:.0f}% churn"
        for mode in ("sort", "auto"):
            for name, ps in structures.items():

                @jax.jit
                def loop(p, _denom=denom, _mode=mode):
                    def body(i, c):
                        return raw_rebuild(c, churn(c, i, _denom), None,
                                           None, mode=_mode)
                    return jax.lax.fori_loop(0, ITERS, body, p)

                out = jax.block_until_ready(loop(ps))
                t0 = time.perf_counter()
                out = jax.block_until_ready(loop(out))
                dt = (time.perf_counter() - t0) * 1e3 / ITERS
                act = jax.device_get(out.active)
                pid = jax.device_get(out.fields["pid"])
                n_act = int(act.sum())
                pid_sum = int(pid[act].astype("int64").sum())
                conserved = (n_act, pid_sum) == expected[name]
                ovf = bool(jax.device_get(out.overflowed))
                # high-churn count drift can outgrow the fixed layout
                # capacity — a FLAGGED overflow with bounded drops is the
                # structure's documented behavior; the tripwire here is
                # silent corruption (unflagged loss or duplicated pids)
                pids_live = pid[act]
                intact = (conserved or
                          (ovf and len(np.unique(pids_live)) == n_act
                           and n_act >= int(0.95 * NP)))
                print(f"{churn_label} mode={mode} {name}: {dt:.1f} ms/rebuild "
                      f"(capacity={ps.capacity}, active={n_act}, "
                      f"conserved={conserved}, overflow={ovf})", flush=True)
                assert intact, f"{churn_label} {mode} {name}: corruption"


if __name__ == "__main__":
    main()
