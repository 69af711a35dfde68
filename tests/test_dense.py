"""Equivalence tests: dense-table fast path vs the flat-array oracle.

The scatter/gather implementation (transfer.py / advect.py / density.py) is
validated against analytic expectations in its own tests; here the dense
ParticleTable implementation must reproduce it to float tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.core.types import CELL_FLUID, SimParams
from blub_tpu.sim import table as T
from blub_tpu.sim.advect import advect_particles
from blub_tpu.sim.dense_advect import advect_dense, correct_particles_dense
from blub_tpu.sim.dense_transfer import (
    marker_from_table,
    p2g_density_dense,
    p2g_velocity_dense,
)
from blub_tpu.sim.density import correct_particles, density_error_rhs
from blub_tpu.sim.dense_transfer import density_rhs_from_raw
from blub_tpu.sim.step import make_jitted_step, step
from blub_tpu.sim.step_dense import make_dense_state, make_jitted_dense_step, step_dense
from blub_tpu.sim.transfer import build_marker, p2g_density, p2g_velocity

DIM = (12, 10, 14)
DT = 1.0 / 120.0


def _random_particles(n=300, seed=0):
    rng = np.random.default_rng(seed)
    pos = (1.01 + (np.array(DIM) - 2.02) * rng.random((n, 3))).astype(np.float32)
    # rel16 position grid (sim/slot_major.quantize_pos): from_positions
    # quantizes, so the _table_from position-matching lookup must see the
    # same values
    pos = (np.round(pos * np.float32(8192.0)) * np.float32(2.0 ** -13)).astype(np.float32)
    vel = rng.standard_normal((n, 3)).astype(np.float32) * 10.0
    aff = rng.standard_normal((n, 3, 3)).astype(np.float32)
    return pos, vel, aff


def _table_from(pos, vel, aff, capacity=16):
    tab = T.from_positions(pos, DIM, capacity)
    assert int(tab.lost) == 0
    # place vel/aff at matching slots: rebuild mapping by matching positions
    tpos = np.asarray(tab.pos).reshape(-1, 3)
    tvalid = np.asarray(tab.valid).reshape(-1)
    tvel = np.zeros_like(tpos)
    taff = np.zeros((tpos.shape[0], 3, 3), np.float32)
    lookup = {tuple(p): i for i, p in enumerate(np.asarray(pos))}
    for slot in np.nonzero(tvalid)[0]:
        i = lookup[tuple(tpos[slot])]
        tvel[slot] = vel[i]
        taff[slot] = aff[i]
    return dataclasses.replace(
        tab,
        vel=jnp.asarray(tvel.reshape(np.asarray(tab.vel).shape)),
        affine=jnp.asarray(taff.reshape(np.asarray(tab.affine).shape)),
    )


def _sorted_rows(a):
    a = np.asarray(a)
    return a[np.lexsort(a.T)]


def test_marker_equivalence():
    pos, vel, aff = _random_particles()
    tab = _table_from(pos, vel, aff)
    m_oracle = np.asarray(build_marker(jnp.asarray(pos), None, DIM))
    m_dense = np.asarray(marker_from_table(tab, None))
    np.testing.assert_array_equal(m_oracle, m_dense)


def test_marker_with_solids():
    pos, vel, aff = _random_particles()
    tab = _table_from(pos, vel, aff)
    occ = jnp.zeros(DIM, jnp.float32).at[5, 5, 5].set(1.0)
    m_oracle = np.asarray(build_marker(jnp.asarray(pos), occ, DIM))
    m_dense = np.asarray(marker_from_table(tab, occ))
    np.testing.assert_array_equal(m_oracle, m_dense)


def test_p2g_velocity_equivalence():
    pos, vel, aff = _random_particles()
    tab = _table_from(pos, vel, aff)
    marker = build_marker(jnp.asarray(pos), None, DIM)
    g_oracle = p2g_velocity(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(aff), marker, None, (0.0, -981.0, 0.0), DT
    )
    g_dense = p2g_velocity_dense(tab, marker, (0.0, -981.0, 0.0), DT)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(g_oracle[c]), np.asarray(g_dense[c]), rtol=1e-4, atol=1e-4
        )


def test_p2g_density_equivalence():
    pos, vel, aff = _random_particles()
    tab = _table_from(pos, vel, aff)
    d_oracle = np.asarray(p2g_density(jnp.asarray(pos), DIM))
    d_dense = np.asarray(p2g_density_dense(tab))
    np.testing.assert_allclose(d_oracle, d_dense, rtol=1e-4, atol=1e-4)


def test_density_rhs_equivalence():
    pos, vel, aff = _random_particles()
    tab = _table_from(pos, vel, aff)
    marker = build_marker(jnp.asarray(pos), None, DIM)
    rhs_oracle = np.asarray(density_error_rhs(jnp.asarray(pos), marker, DT))
    rhs_dense = np.asarray(density_rhs_from_raw(p2g_density_dense(tab), marker, DT))
    np.testing.assert_allclose(rhs_oracle, rhs_dense, rtol=1e-4, atol=1e-3)


def test_advect_equivalence_no_solids():
    pos, vel, aff = _random_particles(200, seed=3)
    tab = _table_from(pos, vel, aff)
    rng = np.random.default_rng(7)
    grids = tuple(jnp.asarray(rng.standard_normal(DIM).astype(np.float32) * 20.0) for _ in range(3))

    p_o, v_o, a_o = advect_particles(jnp.asarray(pos), grids, None, None, DT)
    tab2 = advect_dense(tab, grids, None, None, DT)

    tvalid = np.asarray(tab2.valid)
    rows_dense = np.concatenate(
        [
            np.asarray(tab2.pos)[tvalid],
            np.asarray(tab2.vel)[tvalid],
            np.asarray(tab2.affine)[tvalid].reshape(-1, 9),
        ],
        axis=1,
    )
    rows_oracle = np.concatenate(
        [np.asarray(p_o), np.asarray(v_o), np.asarray(a_o).reshape(-1, 9)], axis=1
    )
    np.testing.assert_allclose(
        _sorted_rows(rows_dense), _sorted_rows(rows_oracle), rtol=1e-4, atol=1e-4
    )


def test_correct_particles_equivalence():
    pos, vel, aff = _random_particles(200, seed=4)
    tab = _table_from(pos, vel, aff)
    marker = build_marker(jnp.asarray(pos), None, DIM)
    rng = np.random.default_rng(8)
    change = tuple(jnp.asarray(rng.standard_normal(DIM).astype(np.float32) * 0.05) for _ in range(3))

    p_o = correct_particles(jnp.asarray(pos), change, marker)
    tab2 = correct_particles_dense(tab, change, marker)
    p_d = np.asarray(tab2.pos)[np.asarray(tab2.valid)]
    np.testing.assert_allclose(_sorted_rows(p_d), _sorted_rows(np.asarray(p_o)), rtol=1e-4, atol=1e-4)


def test_full_step_equivalence():
    """One full dense step vs one full oracle step on a small dam."""
    pos = add_fluid_cube(DIM, (1, 1, 1), (6, 8, 13), 10**9)
    params = SimParams(grid_dim=DIM, dt=DT, gravity_grid=(0, -981.0, 0), num_particles=pos.shape[0])

    from blub_tpu.core.types import make_state

    state_o = make_state(params, pos)
    state_d = make_dense_state(params, pos)

    out_o = step(params, state_o)
    out_d = step_dense(params, state_d)

    p_o = _sorted_rows(np.asarray(out_o.particles.pos))
    p_d = _sorted_rows(np.asarray(out_d.table.pos)[np.asarray(out_d.table.valid)])
    assert p_o.shape == p_d.shape
    # flat and dense compute the same math in different op orders (1 f32 ulp
    # apart at worst); since round 5 every position store quantizes to the
    # rel16 grid, so an ulp pair straddling a rounding boundary lands one
    # 2^-13 quantum apart, and when that flips a particle's bin its sorted
    # NEIGHBORS shift too. Measured: 12/10080 sorted coords past 1e-3 after
    # one step. Bound the mismatch fraction instead of every element.
    err = np.abs(p_o - p_d).max(axis=1)
    frac = float((err > 1e-3).mean())
    assert frac <= 0.005, f"{frac:.2%} of sorted rows past 1e-3"
    np.testing.assert_allclose(p_o.mean(axis=0), p_d.mean(axis=0), atol=1e-3)
    assert int(out_d.table.lost) == 0
    np.testing.assert_allclose(
        np.asarray(out_o.pressure_vel), np.asarray(out_d.pressure_vel), rtol=1e-3, atol=1e-2
    )


def test_multi_step_dense_stability():
    pos = add_fluid_cube(DIM, (1, 1, 1), (6, 8, 13), 10**9)
    params = SimParams(grid_dim=DIM, dt=DT, gravity_grid=(0, -981.0, 0), num_particles=pos.shape[0])
    state = make_dense_state(params, pos)
    jstep = make_jitted_dense_step(params, donate=False)
    for _ in range(30):
        state = jstep(state)
    state = jax.block_until_ready(state)
    tp = np.asarray(state.table.pos)[np.asarray(state.table.valid)]
    assert np.isfinite(tp).all()
    assert (tp >= 1.0).all() and (tp <= np.array(DIM) - 1.0).all()
    assert int(state.table.num_particles()) + int(state.table.lost) == pos.shape[0]
    assert int(state.table.lost) <= pos.shape[0] // 100  # <1% loss budget


def test_frame_dense_on_device_cfl():
    """frame_dense decides the substep count on device: a fast flow splits the
    frame into n_sub substeps of dt/n_sub; a calm one runs a single step —
    and the split frame conserves particles (VERDICT.md weak #3/#4)."""
    from blub_tpu.sim.step_dense import frame_dense, multi_frame_dense

    pos = add_fluid_cube(DIM, (1, 1, 1), (6, 8, 13), 10**9)
    params = SimParams(
        grid_dim=DIM, dt=1.0 / 120.0, gravity_grid=(0.0, -981.0, 0.0),
        num_particles=pos.shape[0],
    )
    state = make_dense_state(params, pos, capacity=16, layout="pt")
    n0 = int(state.table.num_particles())

    calm, n_calm = jax.jit(lambda s: frame_dense(params, s, cfl_target=1.5, max_substeps=4))(state)
    assert int(n_calm) == 1

    fast = dataclasses.replace(state, max_speed=jnp.float32(400.0))
    out, n_fast = jax.jit(lambda s: frame_dense(params, s, cfl_target=1.5, max_substeps=4))(fast)
    assert int(n_fast) == 3  # 400/120 = 3.33 cells/frame over a 1.5 target
    assert int(out.table.num_particles()) + int(out.table.lost) == n0

    batched, nsubs = jax.jit(
        lambda s: multi_frame_dense(params, s, 4, cfl_target=1.5, max_substeps=4)
    )(state)
    assert nsubs.shape == (4,)
    assert int(batched.table.num_particles()) + int(batched.table.lost) == n0
    assert int(batched.step_index) == int(jnp.sum(nsubs))
