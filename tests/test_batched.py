"""Batched device ensembles (vmapped superstep, sharded batch axis)."""

import numpy as np

import jax

from devicekmc_tpu.parallel import make_mesh
from devicekmc_tpu.parallel.batched import (
    batch_states, make_batched_superstep, shard_batch,
)
from devicekmc_tpu.physics import heat as heat_mod
from devicekmc_tpu.physics.potential import solve_cb_edge

from test_sharding import sim_pieces  # noqa: F401


def test_batched_matches_per_device(sim_pieces):
    cfg, geom, params, state, heat = sim_pieces
    # pin plain Jacobi: this test asserts BIT-equality of a vmapped batch
    # member against a single run, and XLA reassociates the deflation's
    # [N, K] matmuls differently under vmap (same solution, last-ulp dt
    # difference -> different event selection downstream)
    params = params.replace(boundary_precond="jacobi")
    Vd = 2.0
    state, _ = jax.jit(solve_cb_edge)(geom, params, state, Vd)

    B = 4
    states = batch_states(state, B, base_seed=11)
    step = make_batched_superstep(geom, params, heat)
    out, dts, metrics = step(states, Vd)

    assert out.element.shape == (B, geom.N)
    assert dts.shape == (B,)
    # independent RNG streams -> trajectories differ across the batch
    elems = np.asarray(out.element)
    assert any(
        not np.array_equal(elems[0], elems[b]) for b in range(1, B)
    ) or len(np.unique(np.asarray(dts))) > 1

    # batch member equals a single-device run with the same key
    from devicekmc_tpu.superstep import superstep_impl

    single = state.replace(key=jax.tree_util.tree_map(lambda k: k[0], states.key))
    s_out, s_dt, _ = jax.jit(superstep_impl)(geom, params, heat, single, Vd)
    np.testing.assert_array_equal(np.asarray(s_out.element), elems[0])
    assert float(s_dt) == float(dts[0])


def test_batched_sharded(sim_pieces, cpu_devices):
    cfg, geom, params, state, heat = sim_pieces
    B = 8
    mesh = make_mesh(8, axis_names=("batch",), devices=cpu_devices)
    states = shard_batch(batch_states(state, B, base_seed=3), mesh)
    step = make_batched_superstep(geom, params, heat, mesh=mesh)
    out, dts, _ = step(states, 2.0)
    assert out.element.shape == (B, geom.N)
    assert np.isfinite(np.asarray(out.I_macro)).all()
