"""Particle-to-grid (P2G) APIC transfer and marker construction.

TPU-native redesign of the reference's three-pass linked-list transfer
(shader/simulation/transfer_clear.comp, transfer_build_linkedlist.comp,
transfer_set_boundary_marker.comp, transfer_gather_velocity.comp): instead of
atomic linked lists walked per cell with workgroup shared memory, each particle
scatters trilinear-weighted APIC contributions to the 8 corners of its
per-component dual cell and XLA accumulates them. This is deterministic (no
atomics) and exposes the whole transfer as a handful of fused dense ops.

Math preserved exactly from the reference:
- dual cell of component c: floor(pos - offset), offset = 0.5 except 1.0 on the
  active axis (transfer_build_linkedlist.comp:18-20);
- staggered sample position: cell + 0.5 (+0.5 on active axis)
  (transfer_gather_velocity.comp:52-53);
- weight = prod(saturate(1 - |node - p|)); APIC value = w * dot(row, (node-p, 1))
  (transfer_gather_velocity.comp:17-24);
- Shepard normalization, then gravity*dt, zeroed into solids, written only at
  fluid-adjacent faces (transfer_gather_velocity.comp:117-126).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.types import CELL_AIR, CELL_FLUID, CELL_SOLID
from .gridops import border_mask, linear_index, shift

_CORNERS = [(cx, cy, cz) for cx in (0, 1) for cy in (0, 1) for cz in (0, 1)]


def build_marker(pos: jax.Array, solid_occupancy: jax.Array | None, grid_dim: Tuple[int, int, int]) -> jax.Array:
    """Marker grid: AIR everywhere, FLUID at cells containing particles, SOLID
    on the border ring and voxelized solids (SOLID overrides FLUID, matching
    the pass order transfer_build_linkedlist -> transfer_set_boundary_marker).

    Returns i8[X,Y,Z] with the reference encoding (0 solid / 1 fluid / -1 air).
    """
    cell = jnp.clip(
        jnp.floor(pos).astype(jnp.int32),
        0,
        jnp.asarray(grid_dim, jnp.int32) - 1,
    )
    fluid = (
        jnp.zeros(grid_dim, jnp.bool_)
        .reshape(-1)
        .at[linear_index(cell, grid_dim)]
        .set(True, mode="drop")
        .reshape(grid_dim)
    )
    marker = jnp.where(fluid, jnp.int8(CELL_FLUID), jnp.int8(CELL_AIR))
    solid = border_mask(grid_dim)
    if solid_occupancy is not None:
        solid = solid | (solid_occupancy != 0.0)
    return jnp.where(solid, jnp.int8(CELL_SOLID), marker)


def p2g_component(
    pos: jax.Array,
    vel_c: jax.Array,
    row_c: jax.Array,
    component: int,
    grid_dim: Tuple[int, int, int],
) -> Tuple[jax.Array, jax.Array]:
    """Accumulate one staggered velocity component.

    Returns (weight_sum, weighted_value_sum), each f32[X,Y,Z].
    """
    n = pos.shape[0]
    dual_offset = jnp.float32([0.5, 0.5, 0.5]).at[component].set(1.0)
    dual = jnp.floor(pos - dual_offset).astype(jnp.int32)  # f32 -> dual cell

    stag = jnp.float32([0.5, 0.5, 0.5]).at[component].set(1.0)

    idx_all = []
    val_all = []
    for corner in _CORNERS:
        node = dual + jnp.int32(corner)
        node_pos = node.astype(jnp.float32) + stag
        delta = node_pos - pos  # f32[N,3]
        w = jnp.prod(jnp.clip(1.0 - jnp.abs(delta), 0.0, 1.0), axis=-1)
        val = w * (vel_c + jnp.sum(row_c * delta, axis=-1))
        idx_all.append(linear_index(node, grid_dim))
        val_all.append(jnp.stack([w, val], axis=-1))

    idx = jnp.concatenate(idx_all)
    vals = jnp.concatenate(val_all)
    g = grid_dim[0] * grid_dim[1] * grid_dim[2]
    acc = jnp.zeros((g, 2), jnp.float32).at[idx].add(vals, mode="drop")
    acc = acc.reshape(grid_dim + (2,))
    return acc[..., 0], acc[..., 1]


def p2g_velocity(
    pos: jax.Array,
    vel: jax.Array,
    affine: jax.Array,
    marker: jax.Array,
    solid_velocity: jax.Array | None,
    gravity_grid: Tuple[float, float, float],
    dt: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full P2G velocity transfer + gravity. Returns (vx, vy, vz) grids.

    Face write rules replicate transfer_gather_velocity.comp:46-51,117-126:
    a face (g, g+e_c) is written iff one side is FLUID; it gets the normalized
    APIC velocity + gravity*dt if neither side is SOLID, else 0 (no flow into
    solids). Faces not adjacent to fluid are 0 (the reference leaves stale
    values there; nothing reads them before they are overwritten -- zero is the
    deterministic choice).
    """
    grid_dim = marker.shape
    markerf = marker.astype(jnp.float32)
    out = []
    for c in range(3):
        wsum, vsum = p2g_component(pos, vel[:, c], affine[:, c, :], c, grid_dim)
        a = markerf
        b = shift(markerf, _axis_offset(c))  # out of bounds reads SOLID(0)
        writes = (a == CELL_FLUID) | (b == CELL_FLUID)
        computes = (a != CELL_SOLID) & (b != CELL_SOLID)
        vnorm = jnp.where(wsum > 0.0, vsum / jnp.where(wsum > 0.0, wsum, 1.0), 0.0)
        v = jnp.where(writes & computes, vnorm + gravity_grid[c] * dt, 0.0)
        out.append(v)
    return tuple(out)


def _axis_offset(c: int):
    off = [0, 0, 0]
    off[c] = 1
    return tuple(off)


def p2g_density(pos: jax.Array, grid_dim: Tuple[int, int, int]) -> jax.Array:
    """Particle density per cell-centered sample (density_projection_gather_error
    .comp:27-31): dual cell floor(p - 0.5), sample position cell + 0.5,
    trilinear weights; particle mass 1."""
    dual = jnp.floor(pos - 0.5).astype(jnp.int32)
    idx_all = []
    w_all = []
    for corner in _CORNERS:
        node = dual + jnp.int32(corner)
        node_pos = node.astype(jnp.float32) + 0.5
        delta = node_pos - pos
        w = jnp.prod(jnp.clip(1.0 - jnp.abs(delta), 0.0, 1.0), axis=-1)
        idx_all.append(linear_index(node, grid_dim))
        w_all.append(w)
    idx = jnp.concatenate(idx_all)
    w = jnp.concatenate(w_all)
    g = grid_dim[0] * grid_dim[1] * grid_dim[2]
    return jnp.zeros((g,), jnp.float32).at[idx].add(w, mode="drop").reshape(grid_dim)
