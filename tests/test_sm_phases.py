"""Slot-major phase ports and the full slot-major step vs the ParticleTable
oracles (Pallas kernels in interpret mode on CPU)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.core.types import SimParams
from blub_tpu.sim import table as T
from blub_tpu.sim.dense_advect import advect_dense, correct_particles_dense
from blub_tpu.sim.dense_transfer import marker_from_table
from blub_tpu.sim.slot_major import from_table, to_table
from blub_tpu.sim.sm_phases import (
    advect_slot_major,
    correct_slot_major,
    marker_from_slot_major,
)

G = (16, 16, 16)


def _table(k=8, seed=0):
    pos = add_fluid_cube(G, (1, 1, 1), (9, 8, 15), 10**9)
    tab = T.from_positions(pos, G, k)
    rng = np.random.default_rng(seed)
    return dataclasses.replace(
        tab,
        vel=jnp.asarray(rng.standard_normal(np.asarray(tab.vel).shape).astype(np.float32) * 5),
        affine=jnp.asarray(rng.standard_normal(np.asarray(tab.affine).shape).astype(np.float32)),
    )


def _grids(seed=1):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.standard_normal(G).astype(np.float32) * 20) for _ in range(3))


def _solids():
    occ = np.zeros(G, np.float32)
    occ[6:9, 2:5, 6:9] = 1.0
    sv = np.zeros(G + (3,), np.float32)
    sv[6:9, 2:5, 6:9] = (12.0, 4.0, -2.0)
    return jnp.asarray(occ), jnp.asarray(sv)


def test_marker_matches_oracle():
    tab = _table()
    occ, _ = _solids()
    for o in (None, occ):
        ref = marker_from_table(tab, o)
        got = marker_from_slot_major(from_table(tab), o)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_advect_matches_oracle():
    tab = _table()
    vel = _grids()
    occ, sv = _solids()
    dt = 1.0 / 120.0
    for o, s in ((None, None), (occ, sv)):
        ref = advect_dense(tab, vel, o, s, dt)
        got = to_table(advect_slot_major(from_table(tab), vel, o, s, dt))
        valid = np.asarray(ref.valid)
        np.testing.assert_array_equal(valid, np.asarray(got.valid))
        np.testing.assert_allclose(
            np.asarray(ref.pos)[valid], np.asarray(got.pos)[valid], atol=1e-6
        )
        # the slot-major table stores vel/affine bf16-quantized
        np.testing.assert_allclose(
            np.asarray(ref.vel)[valid], np.asarray(got.vel)[valid],
            rtol=1e-2, atol=1e-2,
        )
        np.testing.assert_allclose(
            np.asarray(ref.affine)[valid], np.asarray(got.affine)[valid],
            rtol=1e-2, atol=1e-2,
        )


def test_correct_matches_oracle():
    tab = _table(seed=2)
    change = tuple(g * 0.002 for g in _grids(3))
    marker = marker_from_table(tab, None)
    ref = correct_particles_dense(tab, change, marker)
    got = to_table(correct_slot_major(from_table(tab), change, marker))
    valid = np.asarray(ref.valid)
    np.testing.assert_array_equal(valid, np.asarray(got.valid))
    np.testing.assert_allclose(
        np.asarray(ref.pos)[valid], np.asarray(got.pos)[valid], atol=1e-6
    )


def test_full_step_matches_oracle():
    """One full step: slot-major Pallas path vs the ParticleTable XLA path.
    Compared as per-cell position multisets (slot order may differ) plus
    solver stats."""
    import collections

    from blub_tpu.sim.step_dense import DenseFluidState, step_dense
    from blub_tpu.core.types import SolverStats

    pos = add_fluid_cube(G, (1, 1, 1), (9, 8, 15), 10**9)
    params = SimParams(
        grid_dim=G, dt=1.0 / 120.0, gravity_grid=(0.0, -981.0, 0.0),
        num_particles=pos.shape[0],
    )

    def state_for(table):
        return DenseFluidState(
            table=table,
            pressure_vel=jnp.zeros(G, jnp.float32),
            pressure_den=jnp.zeros(G, jnp.float32),
            step_index=jnp.int32(0),
            stats_vel=SolverStats.zero(),
            stats_den=SolverStats.zero(),
            max_speed=jnp.float32(0.0),
        )

    # capacity 12 for an 8/cell seeding: the step must not overflow, because
    # the Pallas rebin's overflow-victim choice legitimately differs from the
    # XLA oracle's, which would make this exact comparison vacuous
    tab = T.from_positions(pos, G, 12)
    out_pt = step_dense(params, state_for(tab))
    out_sm = step_dense(params, state_for(from_table(tab)))

    def cells(t):
        p = np.asarray(t.pos)
        v = np.asarray(t.valid)
        c = collections.Counter()
        for x, y, z, k in np.argwhere(v):
            c[(x, y, z, np.round(p[x, y, z, k], 4).tobytes())] += 1
        return c

    a = cells(out_pt.table)
    b = cells(to_table(out_sm.table))
    assert int(out_sm.table.lost) == int(out_pt.table.lost)
    # positions can differ by float round-off (different summation order in
    # P2G): compare multisets after rounding to 1e-4 grid units
    only_a, only_b = a - b, b - a
    assert sum(only_a.values()) + sum(only_b.values()) <= max(2, len(a) // 200), (
        sum(only_a.values()), sum(only_b.values()),
    )
    assert int(out_sm.stats_vel.iterations) == int(out_pt.stats_vel.iterations)
    # sm max_speed reads bf16-stored velocities
    np.testing.assert_allclose(
        float(out_sm.max_speed), float(out_pt.max_speed), rtol=1e-2
    )
