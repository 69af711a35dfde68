"""Velocity extrapolation into air/solid cells (extrapolate_velocity.comp).

For every non-fluid cell whose +axis neighbor is also non-fluid, the face
velocity is replaced by the average of "valid" face velocities among the 8
in-plane neighbors (the plane perpendicular... strictly: the 8 offsets around
the cell within the two axes other than the face axis). A face is valid if
either of its adjacent cells is FLUID.

The reference kernel reads and writes the same image in one dispatch (a benign
data race); here all reads see the pre-pass values, which is the deterministic
interpretation of the same algorithm.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.types import CELL_FLUID
from .gridops import AXES, shift


def _in_plane_offsets(axis: int):
    other = [a for a in range(3) if a != axis]
    offsets = []
    for u in (-1, 0, 1):
        for v in (-1, 0, 1):
            if u == 0 and v == 0:
                continue
            off = [0, 0, 0]
            off[other[0]] = u
            off[other[1]] = v
            offsets.append(tuple(off))
    return offsets


def extrapolate_velocity(
    vel: Tuple[jax.Array, jax.Array, jax.Array], marker: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    fluid = marker == CELL_FLUID
    out = []
    for c, ax in enumerate(AXES):
        # A face (g, g+e_c) is valid if either adjacent cell is fluid
        # (extrapolate_velocity.comp isValidVelocity).
        valid = fluid | shift(fluid, ax)
        num = jnp.zeros_like(vel[c])
        avg = jnp.zeros_like(vel[c])
        for off in _in_plane_offsets(c):
            v_off = shift(valid, off)
            num = num + v_off.astype(jnp.float32)
            avg = avg + jnp.where(v_off, shift(vel[c], off), 0.0)
        write = (
            jnp.logical_not(fluid)
            & jnp.logical_not(shift(fluid, ax))
            & (num > 0.0)
        )
        out.append(jnp.where(write, avg / jnp.where(num > 0.0, num, 1.0), vel[c]))
    return tuple(out)
