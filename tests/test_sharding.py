"""Multi-device sharding: spatial domain decomposition over the virtual
8-device CPU mesh (the stand-in the reference never had, SURVEY.md §4e)."""

import numpy as np
import pytest

import jax


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _setup(x=32):
    from blub_tpu.core.seeding import add_fluid_cube
    from blub_tpu.core.types import SimParams
    from blub_tpu.sim.step_dense import make_dense_state

    dim = (x, 8, 8)
    pos = add_fluid_cube(dim, (1, 1, 1), (x - 1, 6, 7), 10**9)
    params = SimParams(
        grid_dim=dim, dt=1.0 / 120.0, gravity_grid=(0.0, -981.0, 0.0), num_particles=pos.shape[0]
    )
    return params, make_dense_state(params, pos, capacity=10)


def test_sharded_step_matches_single_device():
    from blub_tpu.parallel.sharding import make_mesh, shard_state, state_shardings
    from blub_tpu.sim.step_dense import step_dense
    from blub_tpu.sim.table import to_positions

    params, state = _setup()
    ref = step_dense(params, state)

    mesh = make_mesh(8)
    sharded = shard_state(mesh, state)
    shardings = state_shardings(mesh, state)
    step = jax.jit(
        lambda s: step_dense(params, s), in_shardings=(shardings,), out_shardings=shardings
    )
    out = step(sharded)

    p_ref = to_positions(ref.table)
    p_out = to_positions(jax.device_get(out).table)
    assert p_ref.shape == p_out.shape
    np.testing.assert_allclose(
        np.sort(p_ref, axis=0), np.sort(p_out, axis=0), rtol=1e-4, atol=1e-4
    )
    assert int(out.table.lost) == int(ref.table.lost)


def test_dryrun_multichip_contract():
    import sys
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def _solids(dim):
    import jax.numpy as jnp
    from blub_tpu.core.types import SolidState

    occ = np.zeros(dim, np.float32)
    occ[dim[0] // 2 - 2 : dim[0] // 2, 1:5, 2:6] = 1.0
    vel = np.zeros(dim + (3,), np.float32)
    vel[occ > 0] = (30.0, 0.0, 0.0)
    return SolidState(occupancy=jnp.asarray(occ), velocity=jnp.asarray(vel))


def test_sharded_multistep_with_solids_invariants():
    """30 steps of a dam collapse THROUGH a moving solid on the 8-device mesh,
    X shard width 4 cells, so particles cross shard boundaries repeatedly.
    Asserts the per-step particle-count+lost invariant against the
    single-device run, early-step position equivalence, and end-state
    center-of-mass agreement (float scheduling drift compounds chaotically, so
    late steps are compared statistically). VERDICT.md weak #8."""
    from blub_tpu.parallel.sharding import make_mesh, shard_state, state_shardings
    from blub_tpu.sim.step_dense import step_dense
    from blub_tpu.sim.table import to_positions

    params, state = _setup()
    solids = _solids(params.grid_dim)

    mesh = make_mesh(8)
    shardings = state_shardings(mesh, state)
    step_sharded = jax.jit(
        lambda s: step_dense(params, s, solids),
        in_shardings=(shardings,), out_shardings=shardings,
    )
    step_single = jax.jit(lambda s: step_dense(params, s, solids))

    ref = state
    out = shard_state(mesh, state)
    n0 = int(state.table.num_particles())
    for i in range(30):
        ref = step_single(ref)
        out = step_sharded(out)
        n_ref = int(ref.table.num_particles())
        n_out = int(out.table.num_particles())
        assert n_out + int(out.table.lost) == n0, f"step {i}: sharded leak"
        assert n_ref + int(ref.table.lost) == n0, f"step {i}: single leak"
        # cross-path lost: a small band, not exact — rel16 quantization
        # (round 5) makes overflow victim counts a discontinuous function of
        # quantum-level trajectory divergence (measured: first +-1 at step
        # 24 of this flow); per-path conservation above stays the hard
        # invariant
        dlost = abs(int(out.table.lost) - int(ref.table.lost))
        assert dlost <= max(10, n0 // 50), f"step {i}: lost diverged by {dlost}"
        if i == 4:
            p_ref = to_positions(ref.table)
            p_out = to_positions(jax.device_get(out).table)
            n = min(p_ref.shape[0], p_out.shape[0])
            np.testing.assert_allclose(
                np.sort(p_ref, axis=0)[:n], np.sort(p_out, axis=0)[:n],
                rtol=1e-3, atol=1e-3,
            )
    p_ref = to_positions(ref.table)
    p_out = to_positions(jax.device_get(out).table)
    n = min(p_ref.shape[0], p_out.shape[0])
    p_ref, p_out = p_ref[:n], p_out[:n]
    np.testing.assert_allclose(p_ref.mean(axis=0), p_out.mean(axis=0), atol=0.05)
    np.testing.assert_allclose(
        float(ref.max_speed), float(out.max_speed), rtol=0.2, atol=5.0
    )


def test_sharded_step_inserts_expected_collectives():
    """The GSPMD-compiled sharded step must contain halo exchanges
    (collective-permute for the jnp.roll/shift stencils) and cross-shard
    reductions (all-reduce for PCG dots / max_speed) — evidence the X
    decomposition actually communicates instead of gathering everything."""
    from blub_tpu.parallel.sharding import make_mesh, shard_state, state_shardings
    from blub_tpu.sim.step_dense import step_dense

    params, state = _setup()
    mesh = make_mesh(8)
    shardings = state_shardings(mesh, state)
    lowered = jax.jit(
        lambda s: step_dense(params, s),
        in_shardings=(shardings,), out_shardings=shardings,
    ).lower(shard_state(mesh, state))
    hlo = lowered.compile().as_text()
    n_cp = hlo.count("collective-permute")
    n_ar = hlo.count("all-reduce")
    assert n_cp > 0, "no halo exchanges inserted - shards are not communicating"
    assert n_ar > 0, "no cross-shard reductions inserted"
    # no full-array gathers of the particle table: an all-gather whose shape
    # is the entire [X,Y,Z,K,*] table would mean GSPMD gave up on sharding
    import re

    table_numel = int(np.prod(np.asarray(state.table.pos.shape)))
    for m in re.finditer(r"all-gather[^\n]*f32\[([0-9,]+)\]", hlo):
        dims = [int(v) for v in m.group(1).split(",") if v]
        assert int(np.prod(dims)) < table_numel, f"full-table all-gather: {m.group(0)[:120]}"


def test_sharded_frame_dense_cfl():
    """The on-device CFL frame path composes with shardings (the substep
    while-loop carries sharded state through)."""
    from blub_tpu.parallel.sharding import make_mesh, shard_state, state_shardings
    from blub_tpu.sim.step_dense import frame_dense

    params, state = _setup()
    mesh = make_mesh(8)
    shardings = state_shardings(mesh, state)
    frame = jax.jit(
        lambda s: frame_dense(params, s, cfl_target=1.5, max_substeps=4)[0],
        in_shardings=(shardings,), out_shardings=shardings,
    )
    out = frame(shard_state(mesh, state))
    n0 = int(state.table.num_particles())
    assert int(out.table.num_particles()) + int(out.table.lost) == n0


def test_sharded_drift_bounded_per_step():
    """Per-step bounded-divergence metric (VERDICT.md r2 weak #7): at EVERY
    step of a 30-step dam-through-moving-solid run, the sorted-position error
    between the 8-way-sharded and single-device runs stays inside a measured
    envelope — not just statistically at the end. Calibration
    (scripts/calibrate_shard_drift.py, 2026-08-17): p95 <= 4e-6 cells and
    max <= 5e-5 cells through step 30 with f32 ulp seeds — GSPMD X-sharding
    reproduces the single-device trajectory to float round-off on this flow.
    Since round 5 every position store quantizes to the rel16 grid, so a
    reduction-order ulp that straddles a rounding boundary becomes a 2^-13
    quantum and the occasional particle takes a visibly different path,
    shifting its sorted neighbors with it (measured: p95 1.4e-2 cells by
    step 24 of this flow). Both bounds are loose tripwires for gross bugs
    (wrong halos drift by many cells AND leak particles — the count/lost
    asserts in the multistep test above are the hard invariants; the
    end-state center-of-mass there pins the macro physics)."""
    from blub_tpu.parallel.sharding import make_mesh, shard_state, state_shardings
    from blub_tpu.sim.step_dense import step_dense
    from blub_tpu.sim.table import to_positions

    params, state = _setup()
    solids = _solids(params.grid_dim)
    mesh = make_mesh(8)
    shardings = state_shardings(mesh, state)
    step_sharded = jax.jit(
        lambda s: step_dense(params, s, solids),
        in_shardings=(shardings,), out_shardings=shardings,
    )
    step_single = jax.jit(lambda s: step_dense(params, s, solids))

    ref, out = state, shard_state(mesh, state)
    for i in range(30):
        ref = step_single(ref)
        out = step_sharded(out)
        p_ref = np.sort(to_positions(ref.table), axis=0)
        p_out = np.sort(to_positions(jax.device_get(out).table), axis=0)
        n = min(p_ref.shape[0], p_out.shape[0])
        err = np.abs(p_ref[:n] - p_out[:n]).max(axis=1)
        p95 = float(np.percentile(err, 95))
        mx = float(err.max())
        assert p95 <= 1.0, f"step {i}: p95 drift {p95:.2e} out of envelope"
        assert mx <= 3.0, f"step {i}: max drift {mx:.2e} out of envelope"
