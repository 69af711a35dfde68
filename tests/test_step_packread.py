"""Pack-on-read step/frame vs the unfused slot-major pipeline.

The pack-on-read path (sim/step_dense.py::_substep*_packread) must be
BIT-EXACT vs the round-3 pipeline it replaces: every fused pack re-derives
the same per-cell placement (including overflow victims) as the standalone
rebin stages, so the end-of-step / end-of-frame tables, pressures, stats and
lost counters are identical arrays. Interpret mode on CPU."""

import os

import jax.numpy as jnp
import numpy as np

from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.core.types import SimParams, SolverStats
from blub_tpu.sim import table as T
from blub_tpu.sim.slot_major import from_table
from blub_tpu.sim.step_dense import (
    DenseFluidState,
    _packread_kmid,
    frame_dense,
    step_dense,
)

G = (16, 16, 16)
K = 12


def _params():
    pos = add_fluid_cube(G, (1, 1, 1), (9, 8, 15), 10**9)
    return pos, SimParams(
        grid_dim=G, dt=1.0 / 120.0, gravity_grid=(0.0, -981.0, 0.0),
        num_particles=pos.shape[0],
    )


def _state(pos, max_speed=0.0):
    tab = T.from_positions(pos, G, K)
    return DenseFluidState(
        table=from_table(tab),
        pressure_vel=jnp.zeros(G, jnp.float32),
        pressure_den=jnp.zeros(G, jnp.float32),
        step_index=jnp.int32(0),
        stats_vel=SolverStats.zero(),
        stats_den=SolverStats.zero(),
        max_speed=jnp.float32(max_speed),
    )


def _assert_packread_supported(params):
    os.environ["BLUB_ENABLE_PACKREAD"] = "1"
    try:
        assert _packread_kmid(params, K) is not None
    finally:
        del os.environ["BLUB_ENABLE_PACKREAD"]


def _run_both(fn):
    """fn(state) unfused (the default), then with pack-on-read force-enabled
    (the path is DEFAULT OFF — measured slower at dam scale, see
    sim/step_dense._packread_kmid — but must stay bit-exact)."""
    ref = fn()
    os.environ["BLUB_ENABLE_PACKREAD"] = "1"
    try:
        got = fn()
    finally:
        del os.environ["BLUB_ENABLE_PACKREAD"]
    return ref, got


def _assert_state_equal(ref, got):
    np.testing.assert_array_equal(
        np.asarray(got.table.posq), np.asarray(ref.table.posq)
    )
    np.testing.assert_array_equal(
        np.asarray(got.table.dyn), np.asarray(ref.table.dyn)
    )
    assert int(got.table.lost) == int(ref.table.lost)
    np.testing.assert_array_equal(
        np.asarray(got.pressure_vel), np.asarray(ref.pressure_vel)
    )
    np.testing.assert_array_equal(
        np.asarray(got.pressure_den), np.asarray(ref.pressure_den)
    )
    assert int(got.step_index) == int(ref.step_index)
    assert float(got.max_speed) == float(ref.max_speed)
    assert int(got.stats_vel.iterations) == int(ref.stats_vel.iterations)


def test_packread_step_bit_exact():
    pos, params = _params()
    _assert_packread_supported(params)

    ref, got = _run_both(lambda: step_dense(params, _state(pos)))
    _assert_state_equal(ref, got)


def test_packread_frame_multi_substep_bit_exact():
    """A frame with n_sub >= 2: the fused path chains substeps through mid1
    (fused P2G) and finalizes once; the unfused path re-bins twice per
    substep. Same frame result, bit for bit."""
    pos, params = _params()
    _assert_packread_supported(params)
    # a max_speed that forces 3 substeps at cfl_target 1.9 and dt 1/120
    ms = 3.0 * 1.9 * 120.0 * 0.99

    def run():
        state, n_sub = frame_dense(params, _state(pos, max_speed=ms))
        return state, int(n_sub)

    (ref, n_ref), (got, n_got) = _run_both(run)
    assert n_ref == n_got == 3
    _assert_state_equal(ref, got)
