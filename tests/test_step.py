"""End-to-end simulation step tests: the TPU-native analog of the reference's
single_cell_debug / column validation scenes (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blub_tpu.core.config import SimSettings, SolverConfig
from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.core.types import CELL_FLUID, SimParams, make_state
from blub_tpu.sim.divergence import compute_divergence_rhs
from blub_tpu.sim.pressure import solve_pressure
from blub_tpu.sim.step import make_jitted_step, step
from blub_tpu.sim.transfer import build_marker, p2g_velocity


def _params(dim, n, **kw):
    return SimParams(
        grid_dim=dim,
        dt=1.0 / 120.0,
        gravity_grid=kw.pop("gravity", (0.0, -981.0, 0.0)),
        num_particles=n,
        **kw,
    )


def _column_state(dim=(16, 24, 16), box=((4, 1, 4), (12, 12, 12))):
    pos = add_fluid_cube(dim, box[0], box[1], 10**9)
    params = _params(dim, pos.shape[0])
    return params, make_state(params, pos)


def test_single_cell_one_step():
    """8 particles in one cell survive a full step (single_cell_debug.json)."""
    dim = (16, 16, 32)
    pos = add_fluid_cube(dim, (8, 8, 20), (9, 9, 21), 10**9)
    params = _params(dim, pos.shape[0])
    state = make_state(params, pos)
    out = step(params, state)
    p = np.asarray(out.particles.pos)
    assert np.isfinite(p).all()
    assert (p >= 1.0).all() and (p <= np.array(dim) - 1.0).all()
    # free fall: particles moved down
    assert (p[:, 1] < np.asarray(pos)[:, 1]).all()
    assert np.isfinite(np.asarray(out.particles.vel)).all()


def test_column_collapse_divergence_free():
    """After the pressure projection the velocity field must be (nearly)
    divergence free — the core invariant of the method."""
    params, state = _column_state()
    jstep = make_jitted_step(params, donate=False)
    for _ in range(10):
        state = jstep(state)

    # recompute post-projection divergence with a fresh P2G of the final state
    p = state.particles
    marker = build_marker(p.pos, None, params.grid_dim)
    vel = p2g_velocity(p.pos, p.vel, p.affine, marker, None, params.gravity_grid, params.dt)
    rhs = compute_divergence_rhs(vel, marker, None)
    res = solve_pressure(state.pressure_vel, rhs, marker, SolverConfig(), params.dt)
    # converged within default budget and tolerance (0.1/dt = 12 grid units)
    assert float(res.stats.error) < 0.15

    pos = np.asarray(p.pos)
    assert np.isfinite(pos).all()
    assert (pos >= 1.0).all()


def test_volume_conservation_over_time():
    """Implicit density projection keeps the particle-count-per-fluid-cell
    (~volume) drift bounded (SURVEY §7.2 step 4)."""
    params, state = _column_state(dim=(16, 16, 16), box=((2, 1, 2), (14, 8, 14)))
    jstep = make_jitted_step(params, donate=False)
    for _ in range(40):
        state = jstep(state)
    marker = build_marker(state.particles.pos, None, params.grid_dim)
    n_fluid = int((np.asarray(marker) == CELL_FLUID).sum())
    particles_per_cell = params.num_particles / max(n_fluid, 1)
    # rest density is 8/cell; allow modest compression/expansion transients
    assert 5.5 < particles_per_cell < 11.0


def test_stats_populated():
    params, state = _column_state(dim=(12, 16, 12), box=((3, 1, 3), (9, 9, 9)))
    out = step(params, state)
    assert int(out.stats_vel.iterations) >= 0
    assert np.isfinite(float(out.stats_vel.error))
    assert int(out.step_index) == 1


def test_step_jit_cache():
    """Repeated jitted steps must not retrace (static shapes by design)."""
    params, state = _column_state(dim=(12, 12, 12), box=((3, 3, 3), (9, 9, 9)))
    jstep = make_jitted_step(params, donate=False)
    state = jstep(state)
    compiled = jstep.lower(state).compile()
    state2 = compiled(state)
    assert state2.particles.pos.shape == state.particles.pos.shape
