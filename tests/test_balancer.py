"""Load-balancer tests — analogs of the reference's test_lb
(test/test_lb.cpp:62-71): balance a particle population against the sbar
overlap graph and check the imbalance drops."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pumipic_tpu.mesh import generate as gen
from pumipic_tpu.parallel import balancer as lbm
from pumipic_tpu.parallel import migrate as mig
from pumipic_tpu.parallel import picparts as ppm
from pumipic_tpu.parallel.mesh_axis import RANK_AXIS, make_device_mesh

R = 4


def _setup():
    coords, tris, cls = gen.annulus_mesh(6, 32, 0.3, 1.0)
    owners = ppm.partition_rcb(coords, tris, R)
    pp = ppm.build_picparts(
        coords, tris, owners, R, ppm.PicPartsInput(safe_layers=2), cls
    )
    bt = lbm.build_balancer(pp, R)
    return coords, tris, owners, pp, bt


def test_sbar_structure():
    coords, tris, owners, pp, bt = _setup()
    assert bt.num_sbars >= 1
    # every sbar edge connects two distinct ranks
    src = np.asarray(bt.edge_src)
    dst = np.asarray(bt.edge_dst)
    assert np.all(src != dst)
    # sbar elements on each rank are safe there
    so = np.asarray(bt.sbar_of_elem)
    es = np.asarray(pp.elem_safe)
    for r in range(R):
        has_sbar = so[r] >= 0
        assert np.all(es[r][has_sbar])


def test_plan_flows_balances():
    coords, tris, owners, pp, bt = _setup()
    S = bt.num_sbars
    # artificial: rank 0 has 100 movable units spread over its sbars,
    # everyone else has none
    w_sr = np.zeros((R, S), np.float32)
    so = np.asarray(bt.sbar_of_elem)
    sbars_r0 = np.unique(so[0][so[0] >= 0])
    w_sr[0, sbars_r0] = 100.0 / len(sbars_r0)
    w_fixed = np.zeros(R, np.float32)

    flows = lbm.plan_flows(bt, jnp.asarray(w_sr), jnp.asarray(w_fixed))
    flows = np.asarray(flows)
    assert flows.min() >= 0
    src = np.asarray(bt.edge_src)
    moved_out = flows[src == 0].sum()
    assert moved_out > 0  # weight leaves the overloaded rank
    # can't move more than rank 0 has
    assert moved_out <= 100.0 + 1e-3


def test_repartition_reduces_imbalance():
    coords, tris, owners, pp, bt = _setup()
    mesh = make_device_mesh(R)
    sharding = NamedSharding(mesh, P(RANK_AXIS))
    pp_d = jax.device_put(pp, sharding)

    # all particles on rank 0, inside sbar-capable (overlap) elements
    so = np.asarray(bt.sbar_of_elem)
    cand_elems = np.nonzero(so[0] >= 0)[0]
    n_cap = 256
    n0 = 200
    state_h = {
        "elem": np.full((R, n_cap), -1, np.int32),
        "active": np.zeros((R, n_cap), bool),
    }
    rng = np.random.default_rng(0)
    state_h["elem"][0, :n0] = rng.choice(cand_elems, n0)
    state_h["active"][0, :n0] = True
    state = {k: jax.device_put(jnp.asarray(v), sharding)
             for k, v in state_h.items()}

    @jax.jit
    @lambda f: jax.shard_map(
        f, mesh=mesh, in_specs=(P(RANK_AXIS), P(), P(RANK_AXIS)),
        out_specs=P(), check_vma=False,
    )
    def run(pp_l, bt_r, s):
        lpp = ppm.local_view(pp_l)
        s = ppm.local_view(s)
        me = jax.lax.axis_index(RANK_AXIS).astype(jnp.int32)
        dest0 = mig.set_unsafe_procs(
            lpp.elem_safe, lpp.elem_owner, s["elem"], s["active"], me
        )
        dest = lbm.repartition(
            bt_r, bt_r.sbar_of_elem[me], s["elem"], s["active"], dest0, me
        )
        # resulting per-rank loads if everyone lands at dest
        load = jnp.zeros((R,), jnp.int32).at[
            jnp.where(s["active"], dest, R)
        ].add(1, mode="drop")
        return jax.lax.psum(load, RANK_AXIS)

    loads = np.asarray(run(pp_d, bt, state))
    assert loads.sum() == n0
    # before: (200, 0, 0, 0) -> imbalance 4.0; after diffusion it must drop
    imb = loads.max() / (loads.sum() / R)
    assert imb < 3.0, loads
    assert (loads[1:] > 0).any(), loads


def test_picparts_step_with_lb():
    from pumipic_tpu.models.pseudo_xgcm import (
        GyroConfig, XGCmConfig, make_picparts_setup,
    )

    coords, tris, cls = gen.annulus_mesh(6, 32, 0.3, 1.0)
    mesh = make_device_mesh(R)
    cfg = XGCmConfig(
        num_ptcls=800,
        mdl_face=4,
        deg_per_push=5.0,
        gyro=GyroConfig(rmax=0.05, num_rings=2, points_per_ring=4),
        max_search_iters=64,
    )
    pp, state, gyro_map, step = make_picparts_setup(
        coords, tris, cls, cfg, mesh, use_lb=True
    )
    for i in range(2):
        state, fwd, stats = step(state)
        assert int(stats["overflow"]) == 0
        assert int(stats["alive"]) > 0
        assert float(stats["imbalance"]) >= 1.0
