"""σ-window sweep for SellCSigma on skewed distributions (VERDICT r3 #7).

The σ knob trades sort locality against padding (the reference's
scs_input.hpp:15-64 / SCS_sort.h:3-49): a full sort (σ=∞) minimizes
padding on uniform counts but 40% of slots pad on exponential skew; small
windows keep hot rows together.  This sweeps σ × distribution at 10M
particles / 1000 elements: reports the padded-slot fraction (host
arithmetic) and the TPU cost of the two slot-rate contracts that pay
capacity width — the full rebuild and a pseudo-push over slots.

  PYTHONPATH="/root/repo:$PYTHONPATH" python perf/sigma_sweep.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from pumipic_tpu.particles import SCSInput, SellCSigma, distribute
from pumipic_tpu.particles import structure as S

NE = int(os.environ.get("SG_NE", 1000))
NP = int(os.environ.get("SG_NP", 10_000_000))
ITERS = int(os.environ.get("SG_ITERS", 4))
CHUNKS = tuple(int(c) for c in os.environ.get("SG_CHUNKS", "32,8").split(","))
# per-segment headroom: σ-windowed layouts DRIFT under churn (window
# composition changes as counts move; docs/PERFORMANCE.md round-4 finding
# 2) — size it so every arm survives the 2·ITERS churn rounds and the
# padded%% column reflects the σ-vs-padding trade at equal headroom
EXTRA_PAD = float(os.environ.get("SG_EXTRA_PAD", 0.3))
SIGMAS = tuple(None if s == "full" else int(s)
               for s in os.environ.get("SG_SIGMAS", "64,1024,full").split(","))
DISTS = tuple(os.environ.get("SG_DISTS", "uniform,exponential").split(","))

raw_rebuild = S._rebuild.__wrapped__


def main():
    for dist in DISTS:
        ppe, elems = distribute.distribute_particles(NE, NP, dist, seed=7)
        for chunk in CHUNKS:
         for sigma in SIGMAS:
            spec = {"w": ((), jnp.float32), "pid": ((), jnp.int32)}
            # constant per-segment headroom across arms so the churned
            # counts keep fitting (the σ-vs-padding trade is the delta)
            ps = SellCSigma(
                NE, elems, field_spec=spec,
                scs_input=SCSInput(chunk_size=chunk, sigma=sigma,
                                   extra_padding=EXTRA_PAD))
            cap = ps.capacity
            padded = 1.0 - NP / cap
            pid = jnp.arange(cap, dtype=jnp.int32)
            ps = dataclasses.replace(ps, fields={**ps.fields, "pid": pid})

            def churn(p, i):
                e = p.elem
                move = (jnp.arange(p.capacity) % 10) == (i % 10)
                ne = jnp.where(p.active & move, (e + 1) % NE, e)
                return jnp.where(p.active, ne, -1)

            @jax.jit
            def loop(p):
                def body(i, c):
                    # slot-rate "push": every op pays capacity width
                    w = c.fields["w"]
                    c = dataclasses.replace(
                        c, fields={**c.fields,
                                   "w": w + jnp.where(c.active, 1.0, 0.0)})
                    return raw_rebuild(c, churn(c, i), None, None,
                                       mode="sort")
                return jax.lax.fori_loop(0, ITERS, body, p)

            out = jax.block_until_ready(loop(ps))
            t0 = time.perf_counter()
            out = jax.block_until_ready(loop(out))
            dt = (time.perf_counter() - t0) * 1e3 / ITERS
            act = jax.device_get(out.active)
            pids = jax.device_get(out.fields["pid"])[act]
            n_act = int(act.sum())
            # σ-windowed layouts can outgrow fixed capacity under count
            # drift; ``overflowed`` is STICKY (round 4), so a mid-loop drop
            # stays visible in the final flag even when the last rebuild
            # fits.  Corruption tripwire: duplicate/out-of-range pids ABORT;
            # population loss from FLAGGED overflow is a recorded outcome
            intact = len(np.unique(pids)) == n_act
            ok = intact and n_act >= int(0.95 * NP)
            ovf = bool(jax.device_get(out.overflowed))
            sg = "full" if sigma is None else sigma
            print(f"{dist:12s} chunk={chunk:2d} sigma={sg!s:5s}: capacity={cap} "
                  f"padded={padded * 100:5.1f}% rebuild+push="
                  f"{dt:7.1f} ms active={n_act} overflow={ovf} "
                  f"survived={ok}",
                  flush=True)
            assert intact


if __name__ == "__main__":
    main()
