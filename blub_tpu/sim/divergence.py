"""Divergence right-hand side and pressure-gradient velocity correction.

Replicates shader/simulation/divergence_compute.comp and divergence_remove.comp
on dense staggered grids. Velocity component c lives on the face between cell g
and g+e_c (value stored at g), identical to the reference's staggered layout.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.types import CELL_FLUID, CELL_SOLID
from .gridops import AXES, shift


def compute_divergence_rhs(
    vel: Tuple[jax.Array, jax.Array, jax.Array],
    marker: jax.Array,
    solid_velocity: jax.Array | None,
) -> jax.Array:
    """RHS of the velocity pressure solve: staggered divergence at fluid cells
    plus moving-solid wall corrections (divergence_compute.comp:28-87).

    ``solid_velocity`` is f32[X,Y,Z,3] (grid-space solid velocity from the
    voxelization), or None for all-static solids.
    """
    fluid = marker == CELL_FLUID
    div = jnp.zeros_like(vel[0])
    for c, ax in enumerate(AXES):
        nax = tuple(-a for a in ax)
        v_pos = vel[c]
        v_neg = shift(vel[c], nax)
        div = div + v_pos - v_neg

        marker_neg = shift(marker, nax)
        marker_pos = shift(marker, ax)
        sv_neg = shift(solid_velocity[..., c], nax) if solid_velocity is not None else 0.0
        sv_pos = shift(solid_velocity[..., c], ax) if solid_velocity is not None else 0.0
        # Negative-side solid wall: += (v_neg - solid_v); positive side: -=.
        div = div + jnp.where(marker_neg == CELL_SOLID, v_neg - sv_neg, 0.0)
        div = div - jnp.where(marker_pos == CELL_SOLID, v_pos - sv_pos, 0.0)
    return jnp.where(fluid, div, 0.0)


def remove_divergence(
    vel: Tuple[jax.Array, jax.Array, jax.Array],
    pressure: jax.Array,
    marker: jax.Array,
    solid_velocity: jax.Array | None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Subtract the pressure gradient across every fluid-adjacent face
    (divergence_remove.comp): faces into solids take the solid velocity, faces
    not adjacent to any fluid are zeroed."""
    fluid = marker == CELL_FLUID
    p_fluid = jnp.where(fluid, pressure, 0.0)
    out = []
    for c, ax in enumerate(AXES):
        nbr_marker = shift(marker, ax)
        nbr_fluid = nbr_marker == CELL_FLUID
        any_fluid = fluid | nbr_fluid

        corrected = vel[c] - (p_fluid - jnp.where(nbr_fluid, shift(p_fluid, ax), 0.0))
        if solid_velocity is not None:
            center_solid_v = solid_velocity[..., c]
            nbr_solid_v = shift(solid_velocity[..., c], ax)
        else:
            center_solid_v = jnp.zeros_like(vel[c])
            nbr_solid_v = jnp.zeros_like(vel[c])
        v = jnp.where(
            marker == CELL_SOLID,
            center_solid_v,
            jnp.where(nbr_marker == CELL_SOLID, nbr_solid_v, corrected),
        )
        out.append(jnp.where(any_fluid, v, 0.0))
    return tuple(out)
