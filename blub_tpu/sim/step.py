"""One full simulation step — the jittable analog of HybridFluid::step
(src/simulation/hybrid_fluid.rs:770-977), same pass sequence:

  marker build -> P2G + gravity -> divergence RHS -> PCG (velocity) ->
  divergence remove -> velocity extrapolate -> G2P/RK4 advect ->
  marker rebuild -> density RHS -> PCG (density) -> position-change ->
  extrapolate -> particle correction

Everything here is pure and traced once per (grid_dim, num_particles) — the
CPU<->device boundary of the reference (command submission, async stat
readbacks) collapses into a single jit call returning the new state.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.types import FluidState, SimParams, SolidState
from .advect import advect_particles
from .density import correct_particles, density_error_rhs, position_change_field
from .divergence import compute_divergence_rhs, remove_divergence
from .extrapolate import extrapolate_velocity
from .pressure import solve_pressure
from .transfer import build_marker, p2g_velocity


def step(params: SimParams, state: FluidState, solids: Optional[SolidState] = None) -> FluidState:
    """Advance the simulation by params.dt. ``solids`` carries the (possibly
    animated) voxelized solid boundary for this step; None = static empty."""
    p = state.particles
    occupancy = solids.occupancy if solids is not None else None
    solid_vel = solids.velocity if solids is not None else None

    # --- transfer & divergence ------------------------------------------------
    marker = build_marker(p.pos, occupancy, params.grid_dim)
    vel = p2g_velocity(p.pos, p.vel, p.affine, marker, solid_vel, params.gravity_grid, params.dt)
    rhs = compute_divergence_rhs(vel, marker, solid_vel)

    # --- pressure projection (velocity) --------------------------------------
    res_vel = solve_pressure(state.pressure_vel, rhs, marker, params.solver_vel, params.dt)
    vel = remove_divergence(vel, res_vel.pressure, marker, solid_vel)
    vel = extrapolate_velocity(vel, marker)

    # --- advection ------------------------------------------------------------
    new_pos, new_vel, new_affine = advect_particles(p.pos, vel, occupancy, solid_vel, params.dt)

    # --- implicit density projection ------------------------------------------
    marker2 = build_marker(new_pos, occupancy, params.grid_dim)
    den_rhs = density_error_rhs(new_pos, marker2, params.dt)
    res_den = solve_pressure(state.pressure_den, den_rhs, marker2, params.solver_den, params.dt)
    change = position_change_field(res_den.pressure, marker2, params.dt)
    change = extrapolate_velocity(change, marker2)
    new_pos = correct_particles(new_pos, change, marker2)

    particles = dataclass_replace(p, pos=new_pos, vel=new_vel, affine=new_affine)
    return FluidState(
        particles=particles,
        pressure_vel=res_vel.pressure,
        pressure_den=res_den.pressure,
        step_index=state.step_index + 1,
        stats_vel=res_vel.stats,
        stats_den=res_den.stats,
    )


def dataclass_replace(obj, **kw):
    import dataclasses

    return dataclasses.replace(obj, **kw)


def make_jitted_step(params: SimParams, donate: bool = True):
    """jit-compiled step closure over static params."""
    fn = partial(step, params)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def multi_step(params: SimParams, state: FluidState, num_steps: int, solids: Optional[SolidState] = None) -> FluidState:
    """K steps fused in one device program via lax.scan — the analog of the
    reference's 16-step fast-forward batches (simulation_controller.rs:112-141),
    minus the TDR dance TPUs don't need."""

    def body(s, _):
        return step(params, s, solids), None

    out, _ = jax.lax.scan(body, state, None, length=num_steps)
    return out


def make_jitted_multi_step(params: SimParams, num_steps: int):
    fn = partial(multi_step, params)
    return jax.jit(lambda s, solids=None: fn(s, num_steps, solids), donate_argnums=(0,))
