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
