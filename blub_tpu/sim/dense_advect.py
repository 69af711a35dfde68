"""Dense-table G2P + RK4 advection and density position correction.

Same math as ``advect.py`` / ``density.correct_particles`` (the flat-array
oracles) but in the ParticleTable layout: because a valid slot's dual bin
equals its cell, every grid lookup a particle needs resolves to a *small fixed
window* of rolled grids plus a per-slot select — no gathers anywhere.

Window derivations (b = table cell = floor(p - 0.5), xi = p - 0.5 - b in
[0,1)):
- staggered corner cells for component c: own axis in {b-1, b, b+1} (select on
  xi_c >= 0.5), other axes {b, b+1};
- primal cell floor(p): b + (xi >= 0.5) per axis -> window {0,1}^3;
- penetration lookup at floor(new_pos): window +-ceil(max_move).
"""

from __future__ import annotations

from itertools import product
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.types import CELL_SOLID
from .advect import StaggeredSamples, _clamp_step_to_cell, _rk4, g2p_apic
from .dense_transfer import _roll
from .slot_major import quantize_pos
from .table import ParticleTable

import os

# Advect bin-movement clamp in cells per substep; sets the rebin window
# (ADVECT_SHIFT = ceil). Default +-2 pairs with CFL 1.9. BLUB_ADVECT_SHIFT=3
# widens the clamp to +-2.99 for the CFL ~2.9 experiment (PERF.md roadmap #3):
# fewer substeps per frame, at ~1.3x wider rebin/advect windows and coarser
# APIC accuracy per substep — adopt only if bench.py's lost_pct /
# max_divergence / density_drift telemetry holds at the dam's violent phase.
ADVECT_SHIFT = int(os.environ.get("BLUB_ADVECT_SHIFT", "2"))
MAX_ADVECT_MOVE = ADVECT_SHIFT - 0.01  # cells per step
MAX_CORRECT_MOVE = 0.99  # density correction: paper clamp is 0.5; window +-1


def _xi(table: ParticleTable) -> jax.Array:
    """Per-slot in-bin fraction xi = pos - 0.5 - cell in [0,1)."""
    grid_dim = table.grid_dim
    idx = jnp.stack(
        [jax.lax.broadcasted_iota(jnp.float32, grid_dim, a) for a in range(3)], axis=-1
    )[:, :, :, None, :]
    return table.pos - 0.5 - idx


def staggered_corners_dense(
    vel: Tuple[jax.Array, jax.Array, jax.Array], table: ParticleTable
) -> StaggeredSamples:
    """StaggeredSamples in [X,Y,Z,K,3] layout, matching
    advect.gather_staggered_corners bit-for-bit on valid slots."""
    # Clamp the sampling fraction to [0,1): solid-escaped particles can sit up
    # to one cell outside their bin; they then sample from the bin's own
    # neighborhood (approximation confined to particles inside solids, which
    # the penetration clamp handles right after).
    xi = jnp.clip(_xi(table), 0.0, 1.0 - 1e-6)
    sel = xi >= 0.5  # bool[X,Y,Z,K,3]

    # Pre-roll each component grid at its 12 window offsets.
    rolled = []
    for c in range(3):
        d = {}
        for off in product(*[(-1, 0, 1) if a == c else (0, 1) for a in range(3)]):
            d[off] = _roll(vel[c], off)[:, :, :, None]  # broadcast over K
        rolled.append(d)

    def corner_value(c, corner):
        # own-axis cell offset: (-1 if xi_c < 0.5 else 0) + corner_c
        lo_off = list(corner)
        lo_off[c] = corner[c] - 1
        hi_off = tuple(corner)
        return jnp.where(sel[..., c], rolled[c][hi_off], rolled[c][tuple(lo_off)])

    names = {
        "v000": (0, 0, 0), "v100": (1, 0, 0), "v010": (0, 1, 0), "v110": (1, 1, 0),
        "v001": (0, 0, 1), "v101": (1, 0, 1), "v011": (0, 1, 1), "v111": (1, 1, 1),
    }
    fields = {
        k: jnp.stack([corner_value(c, corner) for c in range(3)], axis=-1)
        for k, corner in names.items()
    }

    # interpolants: non-c axes -> xi_a; own axis -> xi_c + 0.5 - (xi_c>=0.5)
    interp = []
    for c in range(3):
        cols = []
        for a in range(3):
            if a == c:
                cols.append(xi[..., c] + jnp.where(sel[..., c], -0.5, 0.5))
            else:
                cols.append(xi[..., a])
        interp.append(jnp.stack(cols, axis=-1))  # [X,Y,Z,K,3(axis)]
    it = jnp.stack(interp, axis=-2)  # [X,Y,Z,K,comp,axis]
    return StaggeredSamples(
        ix=it[..., 0], iy=it[..., 1], iz=it[..., 2], **fields
    )


def _point_select(grid: jax.Array, d: jax.Array, window: int) -> jax.Array:
    """value[slot] = grid[cell + d[slot]] for integer offsets |d| <= window.
    Dense: sum of where(d==o) over the (2w+1)^3 window of rolled grids."""
    acc = jnp.zeros(d.shape[:-1], jnp.float32)
    r = range(-window, window + 1)
    for off in product(r, r, r):
        hit = jnp.all(d == jnp.asarray(off, jnp.int32), axis=-1)
        acc = acc + jnp.where(hit, _roll(grid, off)[:, :, :, None], 0.0)
    return acc


def _primal_select(grid: jax.Array, sel: jax.Array) -> jax.Array:
    """value[slot] = grid[floor(pos)] = grid[cell + (xi>=0.5)]: 8-offset select."""
    acc = 0.0
    for off in product((0, 1), (0, 1), (0, 1)):
        hit = (sel[..., 0] == bool(off[0])) & (sel[..., 1] == bool(off[1])) & (sel[..., 2] == bool(off[2]))
        acc = acc + jnp.where(hit, _roll(grid, off)[:, :, :, None], 0.0)
    return acc


def _trilinear_center_field(field: jax.Array, xi: jax.Array) -> jax.Array:
    """Trilinear sample of a cell-centered field at the particle position:
    corners are exactly cell + {0,1}^3 with weights xi (q = pos-0.5 has
    floor(q) == cell by the table invariant)."""
    acc = 0.0
    for off in product((0, 1), (0, 1), (0, 1)):
        w = 1.0
        for a in range(3):
            w = w * (xi[..., a] if off[a] else (1.0 - xi[..., a]))
        acc = acc + w * _roll(field, off)[:, :, :, None]
    return acc


def advect_dense(
    table: ParticleTable,
    vel_grids: Tuple[jax.Array, jax.Array, jax.Array],
    solid_occupancy: jax.Array | None,
    solid_velocity: jax.Array | None,
    dt: float,
) -> ParticleTable:
    """Advect all table slots; positions move but bins are NOT updated —
    caller must rebin(max_shift=2) afterwards."""
    import dataclasses

    grid_dim = jnp.asarray(table.grid_dim, jnp.int32)
    grid_max = grid_dim.astype(jnp.float32) - 1.001
    pos = table.pos
    xi = _xi(table)
    sel = xi >= 0.5

    if solid_occupancy is not None:
        occ_here = _primal_select(solid_occupancy, sel)
        sv_here = jnp.stack(
            [_primal_select(solid_velocity[..., a], sel) for a in range(3)], axis=-1
        )
        abs_sv = jnp.abs(sv_here)
        use_x = (abs_sv[..., 0] > abs_sv[..., 1]) & (abs_sv[..., 0] > abs_sv[..., 2])
        use_y = jnp.logical_not(use_x) & (abs_sv[..., 1] > abs_sv[..., 2])
        use_z = jnp.logical_not(use_x) & jnp.logical_not(use_y)
        escape = jnp.stack(
            [
                jnp.where(use_x, jnp.sign(sv_here[..., 0]), 0.0),
                jnp.where(use_y, jnp.sign(sv_here[..., 1]), 0.0),
                jnp.where(use_z, jnp.sign(sv_here[..., 2]), 0.0),
            ],
            axis=-1,
        )
        pos = jnp.where((occ_here > 0.0)[..., None], pos + escape, pos)
        # Escaped positions may be up to 1 cell from their bin; the windows
        # below tolerate that via the +-2 penetration window, and the
        # subsequent rebin(max_shift=2) covers escape+advection.
        xi = pos - 0.5 - (_cell_idx(table))
        sel = xi >= 0.5

    samples = staggered_corners_dense(vel_grids, _with_pos(table, pos))
    velocity, affine = g2p_apic(samples)
    movement = _rk4(samples, velocity, dt)
    # CFL clamp (TPU-native addition): bound per-step motion so rebinning is a
    # fixed +-2 window. The reference has no such bound; at its 120 steps/s
    # design point real flows stay well under 2 cells/step.
    movement = jnp.clip(movement, -MAX_ADVECT_MOVE, MAX_ADVECT_MOVE)
    # Clamp the target position per axis so floor(new_pos) stays within +-2 of
    # the slot's cell — this keeps BOTH the rebin window (+-2 on the dual bin)
    # and the solid-penetration lookup window valid. Without it a fast
    # particle's floor(new_pos) can land at cell+3 where the +-2 occupancy
    # window can't see a solid, and the flood front tunnels through moving
    # solids (the reference has the same unchecked-tunneling artifact; here
    # the CFL clamp makes containment airtight instead).
    cellf = _cell_idx(table)
    new_pos = jnp.clip(pos + movement, cellf - 1.499, cellf + 2.499)
    movement = new_pos - pos

    out_of_bounds = jnp.any((new_pos < 1.001) | (new_pos > grid_max), axis=-1)
    if solid_occupancy is not None:
        d = jnp.floor(new_pos).astype(jnp.int32) - _cell_idx(table).astype(jnp.int32)
        d = jnp.clip(d, -2, 2)
        occ_target = _point_select(solid_occupancy, d, 2)
        penetrates = out_of_bounds | (occ_target > 0.0)
    else:
        penetrates = out_of_bounds

    direction, max_step, _ = _clamp_step_to_cell(pos, movement)
    clamped_movement = direction * max_step[..., None]

    if solid_occupancy is not None:
        stuck = jnp.all(
            jnp.floor(pos).astype(jnp.int32) == jnp.floor(new_pos).astype(jnp.int32),
            axis=-1,
        )
        # Push force: trilinear sample of the (grid-level central-difference)
        # occupancy gradient at the original position. The reference instead
        # takes differences of trilinear occupancy samples +-1 texel around the
        # *new* position (advect_particles.comp:152-170) — same smoothing
        # radius, evaluated one sub-cell away; cheaper here and only active in
        # the rare stuck-inside-solid case.
        from .gridops import shift as gshift

        grad = jnp.stack(
            [
                0.5 * (gshift(solid_occupancy, _e(a, -1)) - gshift(solid_occupancy, _e(a, 1)))
                for a in range(3)
            ],
            axis=-1,
        )
        push = jnp.stack(
            [_trilinear_center_field(grad[..., a], xi) for a in range(3)], axis=-1
        ) * (dt * 50.0)
        clamped_movement = clamped_movement + jnp.where(
            (stuck & penetrates)[..., None], push, 0.0
        )

    corrected_pos = jnp.clip(pos + clamped_movement, 1.001, grid_max)
    corrected_vel = direction * (max_step / dt)[..., None]

    new_pos = jnp.where(penetrates[..., None], corrected_pos, new_pos)
    velocity = jnp.where(penetrates[..., None], corrected_vel, velocity)

    # rel16 position-grid store (slot_major.py module docstring)
    new_pos = quantize_pos(new_pos)
    new_pos = jnp.where(table.valid[..., None], new_pos, table.pos)
    return dataclasses.replace(
        table,
        pos=new_pos,
        vel=jnp.where(table.valid[..., None], velocity, table.vel),
        affine=jnp.where(table.valid[..., None, None], affine, table.affine),
    )


def correct_particles_dense(
    table: ParticleTable,
    change: Tuple[jax.Array, jax.Array, jax.Array],
    marker: jax.Array,
) -> ParticleTable:
    """Density-projection position correction in table layout (oracle:
    density.correct_particles). Caller must rebin(max_shift=1) afterwards."""
    import dataclasses

    grid_dim = jnp.asarray(table.grid_dim, jnp.int32)
    grid_max = grid_dim.astype(jnp.float32) - 1.001
    pos = table.pos

    samples = staggered_corners_dense(change, table)
    # trilinear value per component from its own corner set
    from .advect import _trilinear

    movement = _trilinear(samples, samples.ix, samples.iy, samples.iz)
    movement = jnp.clip(movement, -MAX_CORRECT_MOVE, MAX_CORRECT_MOVE)
    # Keep floor(new_pos) within +-1 of the cell so the marker lookup window
    # and the subsequent rebin(max_shift=1) stay valid (see advect_dense).
    cellf = _cell_idx(table)
    new_pos = jnp.clip(pos + movement, cellf - 0.499, cellf + 1.999)
    movement = new_pos - pos

    out_of_bounds = jnp.any((new_pos < 1.001) | (new_pos > grid_max), axis=-1)
    d = jnp.floor(new_pos).astype(jnp.int32) - cellf.astype(jnp.int32)
    d = jnp.clip(d, -1, 1)
    target_marker = _point_select(marker.astype(jnp.float32), d, 1)
    penetrates = out_of_bounds | (target_marker == CELL_SOLID)

    direction, max_step, _ = _clamp_step_to_cell(pos, movement)
    corrected = jnp.clip(pos + direction * max_step[..., None], 1.001, grid_max)
    new_pos = jnp.where(penetrates[..., None], corrected, new_pos)
    # rel16 position-grid store (slot_major.py module docstring)
    new_pos = quantize_pos(new_pos)
    new_pos = jnp.where(table.valid[..., None], new_pos, table.pos)
    return dataclasses.replace(table, pos=new_pos)


# --- small helpers ----------------------------------------------------------


def _cell_idx(table: ParticleTable) -> jax.Array:
    grid_dim = table.grid_dim
    return jnp.stack(
        [jax.lax.broadcasted_iota(jnp.float32, grid_dim, a) for a in range(3)], axis=-1
    )[:, :, :, None, :]


def _with_pos(table: ParticleTable, pos: jax.Array) -> ParticleTable:
    import dataclasses

    return dataclasses.replace(table, pos=pos)


def _e(axis: int, sign: int):
    off = [0, 0, 0]
    off[axis] = sign
    return tuple(off)
