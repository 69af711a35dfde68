"""Implicit density projection (Kugelstadt et al. 2019) — volume conservation.

Three passes mirroring the reference:
1. density error RHS (density_projection_gather_error.comp): particle density
   gathered at cell centers, fixed 0.5625 contribution per solid direct
   neighbor, free-surface clamp (density >= 8 if any direct air neighbor),
   rhs = clamp(1 - rho/8, -0.5, 0.5) / dt at fluid cells;
2. position-change field (density_projection_position_change.comp):
   dx = (p_nbr - p_center) * dt per staggered face, zero if either side SOLID;
3. particle correction (density_projection_correct_particles.comp): trilinear
   sample of the (extrapolated) position-change field at the staggered sample
   positions, with the same wall clamp as advection (no push force).

The reference follows the paper's deviations, not the paper (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.types import CELL_AIR, CELL_FLUID, CELL_SOLID
from .advect import _clamp_step_to_cell
from .gridops import AXES, gather_cells, sample_trilinear_clamped, shift
from .transfer import p2g_density

DENSITY0 = 8.0  # particles per cell at rest (PARTICLES_PER_GRID_CELL)
SOLID_NEIGHBOR_CONTRIBUTION = 0.5625


def density_error_rhs(pos: jax.Array, marker: jax.Array, dt: float) -> jax.Array:
    grid_dim = marker.shape
    density = p2g_density(pos, grid_dim)

    any_air = jnp.zeros(grid_dim, jnp.bool_)
    for ax in AXES:
        nax = tuple(-a for a in ax)
        for off in (ax, nax):
            nbr = shift(marker, off)  # out of bounds reads SOLID
            density = density + jnp.where(nbr == CELL_SOLID, SOLID_NEIGHBOR_CONTRIBUTION, 0.0)
            any_air = any_air | (nbr == CELL_AIR)
    density = jnp.where(any_air, jnp.maximum(DENSITY0, density), density)

    rhs = jnp.clip(1.0 - density / DENSITY0, -0.5, 0.5) / dt
    return jnp.where(marker == CELL_FLUID, rhs, 0.0)


def position_change_field(
    pressure: jax.Array, marker: jax.Array, dt: float
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    fluid = marker == CELL_FLUID
    p_fluid = jnp.where(fluid, pressure, 0.0)
    out = []
    for _, ax in enumerate(AXES):
        nbr_marker = shift(marker, ax)
        nbr_p = jnp.where(nbr_marker == CELL_FLUID, shift(p_fluid, ax), 0.0)
        change = (nbr_p - p_fluid) * dt
        solid_face = (marker == CELL_SOLID) | (nbr_marker == CELL_SOLID)
        out.append(jnp.where(solid_face, 0.0, change))
    return tuple(out)


def correct_particles(
    pos: jax.Array,
    change: Tuple[jax.Array, jax.Array, jax.Array],
    marker: jax.Array,
) -> jax.Array:
    """Move particles by the trilinearly-sampled position change; same wall
    clamp as advection but no push force (density_projection_correct_particles
    .comp:44-70)."""
    grid_dim = jnp.asarray(marker.shape, jnp.int32)
    grid_max = grid_dim.astype(jnp.float32) - 1.001

    moves = []
    for c in range(3):
        # Staggered sample position: texcoord (pos - 0.5*e_c)/dim with a
        # trilinear sampler == index-space pos - 0.5*e_c - 0.5.
        off = jnp.full((3,), 0.5, jnp.float32).at[c].add(0.5)
        q = jnp.maximum(0.0, pos - (off - 0.5)) - 0.5
        moves.append(sample_trilinear_clamped(change[c], q))
    movement = jnp.stack(moves, axis=-1)
    new_pos = pos + movement

    out_of_bounds = jnp.any((new_pos < 1.001) | (new_pos > grid_max), axis=-1)
    target_cell = jnp.clip(jnp.floor(new_pos).astype(jnp.int32), 0, grid_dim - 1)
    in_solid = gather_cells(marker, target_cell) == CELL_SOLID
    penetrates = out_of_bounds | in_solid

    direction, max_step, _ = _clamp_step_to_cell(pos, movement)
    corrected = jnp.clip(pos + direction * max_step[:, None], 1.001, grid_max)
    from .slot_major import quantize_pos

    # positions store on the rel16 grid (slot_major.py module docstring)
    return quantize_pos(jnp.where(penetrates[:, None], corrected, new_pos))
