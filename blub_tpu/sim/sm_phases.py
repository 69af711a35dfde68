"""Slot-major ports of the table-consuming XLA phases: marker, G2P advect,
density position correction.

Same math as dense_transfer.marker_from_table / dense_advect.advect_dense /
correct_particles_dense (the oracles, layout [X,Y,Z,K,*]) but consuming the
resident ``SlotMajorTable`` (rel16 posq f32[K,2,X,Y,Zp] + bf16-packed dyn
f32[K,6,X,Y,Zp], see slot_major.py) directly — no transposes.
Grid inputs ([X,Y,Z]) are zero-padded to Zp on entry (cheap; tables are 16x
bigger than grids). Equivalence is regression-tested per phase
(tests/test_sm_phases.py).

Layout conventions here: particle quantities are [K,X,Y,Zp] per channel or
[K,X,Y,Zp,3] stacked; grid rolls broadcast as [None,X,Y,Zp]. The z padding
rows carry valid=0 and every write is masked by valid, so they stay all-zero.
"""

from __future__ import annotations

from itertools import product
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.types import CELL_AIR, CELL_FLUID, CELL_SOLID
from .advect import StaggeredSamples, _clamp_step_to_cell, _rk4, _trilinear, g2p_apic
from .dense_advect import MAX_ADVECT_MOVE, MAX_CORRECT_MOVE
from .gridops import border_mask
from .slot_major import (
    CH_XY,
    CH_ZV,
    SlotMajorTable,
    pack_dyn,
    pack_posq,
    pos_to_rel,
    rel_to_pos,
    unpack_posq,
)


def _pad_grid(g: jax.Array, zp: int) -> jax.Array:
    """[X,Y,Z] -> [X,Y,Zp] zero-padded."""
    z = g.shape[2]
    if z == zp:
        return g
    return jnp.pad(g, ((0, 0), (0, 0), (0, zp - z)))


def _roll_g(a: jax.Array, off) -> jax.Array:
    """read[g] = a[g + off] on a padded grid [X,Y,Zp]."""
    return jnp.roll(a, tuple(-o for o in off), axis=(0, 1, 2))


def _cellf(shape4) -> jax.Array:
    """Cell index vector field [1,X,Y,Zp,3] (f32)."""
    k, x, y, zp = shape4
    return jnp.stack(
        [jax.lax.broadcasted_iota(jnp.float32, (1, x, y, zp), 1 + a) for a in range(3)],
        axis=-1,
    )


def _pos_t(posq: jax.Array) -> jax.Array:
    """rel16 posq channels -> decoded global positions [K,X,Y,Zp,3] (exact;
    slot_major.py module docstring). Invalid slots decode to garbage finite
    values; every consumer masks by the valid bit."""
    rx, ry, rz, _ = unpack_posq(posq[:, CH_XY], posq[:, CH_ZV])
    shape = rx.shape
    return jnp.stack(
        [
            rel_to_pos(r, jax.lax.broadcasted_iota(jnp.float32, shape, 1 + a))
            for a, r in enumerate((rx, ry, rz))
        ],
        axis=-1,
    )


def _validb(posq: jax.Array) -> jax.Array:
    """bool[K,X,Y,Zp] valid mask from the rel16 posq channels."""
    b1 = jax.lax.bitcast_convert_type(posq[:, CH_ZV], jnp.int32)
    return (b1 & 1) == 1


def marker_from_counts(fluid_count: jax.Array, grid_dim, solid_occupancy) -> jax.Array:
    """Marker from the P2G kernel's primal-cell fluid-count output channel —
    the table sweep already happened inside the kernel; this is only the
    cheap grid-sized overrides (border ring + voxelized solids). Matches
    marker_from_slot_major exactly (fluid iff any particle's floor(pos) is
    the cell; reference transfer_set_boundary_marker.comp:8-19)."""
    x, y, z = grid_dim
    fluid = fluid_count[:x, :y, :z] > 0.5
    marker = jnp.where(fluid, jnp.int8(CELL_FLUID), jnp.int8(CELL_AIR))
    solid = border_mask((x, y, z))
    if solid_occupancy is not None:
        solid = solid | (solid_occupancy != 0.0)
    return jnp.where(solid, jnp.int8(CELL_SOLID), marker)


def marker_from_slot_major(sm: SlotMajorTable, solid_occupancy) -> jax.Array:
    """Marker grid [X,Y,Z] i8 from the resident table — port of
    dense_transfer.marker_from_table (same 3-bit primal-offset code rolls)."""
    x, y, z = sm.grid_dim
    data = sm.posq
    valid = _validb(data)  # [K,X,Y,Zp]
    # primal offset per axis: floor(pos) - floor(pos - 0.5) = (r >= 0) under
    # the bin invariant (pos - b in [0.5, 1.5) <=> r in [-4096, 4096))
    rx, ry, rz, _ = unpack_posq(data[:, CH_XY], data[:, CH_ZV])
    code = (
        (rx >= 0).astype(jnp.float32)
        + 2.0 * (ry >= 0).astype(jnp.float32)
        + 4.0 * (rz >= 0).astype(jnp.float32)
    )
    fluid = jnp.zeros(data.shape[2:], jnp.bool_)
    for off in product((-1, 0), (-1, 0), (-1, 0)):
        need = float(-off[0] + 2 * -off[1] + 4 * -off[2])
        hit = jnp.roll(
            valid & (code == need), tuple(-o for o in off), axis=(1, 2, 3)
        )
        fluid = fluid | jnp.any(hit, axis=0)
    fluid = fluid[:, :, :z]
    marker = jnp.where(fluid, jnp.int8(CELL_FLUID), jnp.int8(CELL_AIR))
    solid = border_mask((x, y, z))
    if solid_occupancy is not None:
        solid = solid | (solid_occupancy != 0.0)
    return jnp.where(solid, jnp.int8(CELL_SOLID), marker)


def _staggered_corners_sm(
    vel_p: Tuple[jax.Array, jax.Array, jax.Array], pos: jax.Array
) -> StaggeredSamples:
    """StaggeredSamples with fields [K,X,Y,Zp,3] — port of
    dense_advect.staggered_corners_dense (vel_p grids are Zp-padded)."""
    cellf = _cellf(pos.shape[:1] + pos.shape[1:4])
    xi = jnp.clip(pos - 0.5 - cellf, 0.0, 1.0 - 1e-6)
    sel = xi >= 0.5

    rolled = []
    for c in range(3):
        d = {}
        for off in product(*[(-1, 0, 1) if a == c else (0, 1) for a in range(3)]):
            d[off] = _roll_g(vel_p[c], off)[None]  # [1,X,Y,Zp]
        rolled.append(d)

    def corner_value(c, corner):
        lo_off = list(corner)
        lo_off[c] = corner[c] - 1
        return jnp.where(sel[..., c], rolled[c][tuple(corner)], rolled[c][tuple(lo_off)])

    names = {
        "v000": (0, 0, 0), "v100": (1, 0, 0), "v010": (0, 1, 0), "v110": (1, 1, 0),
        "v001": (0, 0, 1), "v101": (1, 0, 1), "v011": (0, 1, 1), "v111": (1, 1, 1),
    }
    fields = {
        k: jnp.stack([corner_value(c, corner) for c in range(3)], axis=-1)
        for k, corner in names.items()
    }
    interp = []
    for c in range(3):
        cols = []
        for a in range(3):
            if a == c:
                cols.append(xi[..., c] + jnp.where(sel[..., c], -0.5, 0.5))
            else:
                cols.append(xi[..., a])
        interp.append(jnp.stack(cols, axis=-1))
    it = jnp.stack(interp, axis=-2)  # [K,X,Y,Zp,comp,axis]
    return StaggeredSamples(ix=it[..., 0], iy=it[..., 1], iz=it[..., 2], **fields)


def _point_select_sm(grid_p: jax.Array, d: jax.Array, window: int) -> jax.Array:
    """value[slot] = grid[cell + d[slot]] for integer offsets |d| <= window."""
    acc = jnp.zeros(d.shape[:-1], jnp.float32)
    r = range(-window, window + 1)
    for off in product(r, r, r):
        hit = jnp.all(d == jnp.asarray(off, jnp.int32), axis=-1)
        acc = acc + jnp.where(hit, _roll_g(grid_p, off)[None], 0.0)
    return acc


def _primal_select_sm(grid_p: jax.Array, sel: jax.Array) -> jax.Array:
    """value[slot] = grid[floor(pos)] = grid[cell + (xi>=0.5)]."""
    acc = 0.0
    for off in product((0, 1), (0, 1), (0, 1)):
        hit = (
            (sel[..., 0] == bool(off[0]))
            & (sel[..., 1] == bool(off[1]))
            & (sel[..., 2] == bool(off[2]))
        )
        acc = acc + jnp.where(hit, _roll_g(grid_p, off)[None], 0.0)
    return acc


def _trilinear_center_sm(field_p: jax.Array, xi: jax.Array) -> jax.Array:
    acc = 0.0
    for off in product((0, 1), (0, 1), (0, 1)):
        w = 1.0
        for a in range(3):
            w = w * (xi[..., a] if off[a] else (1.0 - xi[..., a]))
        acc = acc + w * _roll_g(field_p, off)[None]
    return acc


def _e(axis: int, sign: int):
    off = [0, 0, 0]
    off[axis] = sign
    return tuple(off)


def _pack_pos_sm(new_pos, validb) -> jax.Array:
    """Encode global positions back into the rel16 posq channels (quantizing
    to the 2^-13 grid exactly as the Pallas kernels and the oracle stores
    do), masking by validity so invalid slots stay exactly zero."""
    shape = validb.shape
    vbit = validb.astype(jnp.int32)
    rels = [
        jnp.where(
            validb,
            pos_to_rel(
                new_pos[..., a],
                jax.lax.broadcasted_iota(jnp.float32, shape, 1 + a),
            ),
            0,
        )
        for a in range(3)
    ]
    ch0, ch1 = pack_posq(rels[0], rels[1], rels[2], vbit)
    return jnp.stack([ch0, ch1], axis=1)


def _repack(
    posq: jax.Array, new_pos, new_vel, new_aff, validb
):
    """Rebuild (posq, dyn), masking writes by validity so invalid slots (and
    z padding) stay exactly zero; velocity/affine quantize-pack to bf16
    pairs and positions to rel16 exactly as the Pallas advect kernel does."""
    new_posq = _pack_pos_sm(new_pos, validb)
    vel_q = [jnp.where(validb, new_vel[..., a], 0.0) for a in range(3)]
    aff_q = [
        jnp.where(validb, new_aff[..., i, j], 0.0)
        for i in range(3)
        for j in range(3)
    ]
    new_dyn = jnp.stack(pack_dyn(vel_q, aff_q), axis=1)
    return new_posq, new_dyn


def advect_slot_major(
    sm: SlotMajorTable,
    vel_grids,
    solid_occupancy,
    solid_velocity,
    dt: float,
) -> SlotMajorTable:
    """G2P + RK4 advection on the resident table — port of
    dense_advect.advect_dense (cites advect_particles.comp:1-193; see the
    oracle for the documented deviations). Caller must rebin(max_shift=2)."""
    x, yd, z = sm.grid_dim
    data = sm.posq
    zp = data.shape[-1]
    grid_max = jnp.asarray((x, yd, z), jnp.float32) - 1.001
    vel_p = tuple(_pad_grid(v, zp) for v in vel_grids)

    pos = _pos_t(data)  # [K,X,Y,Zp,3]
    validb = _validb(data)
    cellf = _cellf(data.shape[:1] + data.shape[2:])
    xi = pos - 0.5 - cellf
    sel = xi >= 0.5

    if solid_occupancy is not None:
        occ_p = _pad_grid(solid_occupancy, zp)
        sv_p = tuple(_pad_grid(solid_velocity[..., a], zp) for a in range(3))
        occ_here = _primal_select_sm(occ_p, sel)
        sv_here = jnp.stack([_primal_select_sm(g, sel) for g in sv_p], axis=-1)
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
        xi = pos - 0.5 - cellf
        sel = xi >= 0.5

    samples = _staggered_corners_sm(vel_p, pos)
    velocity, affine = g2p_apic(samples)
    movement = _rk4(samples, velocity, dt)
    movement = jnp.clip(movement, -MAX_ADVECT_MOVE, MAX_ADVECT_MOVE)
    new_pos = jnp.clip(pos + movement, cellf - 1.499, cellf + 2.499)
    movement = new_pos - pos

    out_of_bounds = jnp.any((new_pos < 1.001) | (new_pos > grid_max), axis=-1)
    if solid_occupancy is not None:
        d = jnp.floor(new_pos).astype(jnp.int32) - cellf.astype(jnp.int32)
        d = jnp.clip(d, -2, 2)
        occ_target = _point_select_sm(occ_p, d, 2)
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
        grad = [
            0.5 * (_roll_g(occ_p, _e(a, -1)) - _roll_g(occ_p, _e(a, 1))) for a in range(3)
        ]
        push = jnp.stack(
            [_trilinear_center_sm(g, xi) for g in grad], axis=-1
        ) * (dt * 50.0)
        clamped_movement = clamped_movement + jnp.where(
            (stuck & penetrates)[..., None], push, 0.0
        )

    corrected_pos = jnp.clip(pos + clamped_movement, 1.001, grid_max)
    corrected_vel = direction * (max_step / dt)[..., None]

    new_pos = jnp.where(penetrates[..., None], corrected_pos, new_pos)
    velocity = jnp.where(penetrates[..., None], corrected_vel, velocity)

    new_posq, new_dyn = _repack(data, new_pos, velocity, affine, validb)
    return SlotMajorTable(
        posq=new_posq, dyn=new_dyn, lost=sm.lost, grid_dim=sm.grid_dim
    )


def correct_slot_major(
    sm: SlotMajorTable, change, marker: jax.Array
) -> SlotMajorTable:
    """Density-projection position correction — port of
    dense_advect.correct_particles_dense. Caller must rebin(max_shift=1)."""
    x, yd, z = sm.grid_dim
    data = sm.posq
    zp = data.shape[-1]
    grid_max = jnp.asarray((x, yd, z), jnp.float32) - 1.001
    change_p = tuple(_pad_grid(c, zp) for c in change)

    pos = _pos_t(data)
    validb = _validb(data)
    cellf = _cellf(data.shape[:1] + data.shape[2:])

    samples = _staggered_corners_sm(change_p, pos)
    movement = _trilinear(samples, samples.ix, samples.iy, samples.iz)
    movement = jnp.clip(movement, -MAX_CORRECT_MOVE, MAX_CORRECT_MOVE)
    new_pos = jnp.clip(pos + movement, cellf - 0.499, cellf + 1.999)
    movement = new_pos - pos

    out_of_bounds = jnp.any((new_pos < 1.001) | (new_pos > grid_max), axis=-1)
    d = jnp.floor(new_pos).astype(jnp.int32) - cellf.astype(jnp.int32)
    d = jnp.clip(d, -1, 1)
    marker_p = _pad_grid(marker.astype(jnp.float32), zp)
    target_marker = _point_select_sm(marker_p, d, 1)
    penetrates = out_of_bounds | (target_marker == CELL_SOLID)

    direction, max_step, _ = _clamp_step_to_cell(pos, movement)
    corrected = jnp.clip(pos + direction * max_step[..., None], 1.001, grid_max)
    new_pos = jnp.where(penetrates[..., None], corrected, new_pos)

    new_posq = _pack_pos_sm(new_pos, validb)
    # dyn untouched: position correction moves particles only
    return SlotMajorTable(
        posq=new_posq, dyn=sm.dyn, lost=sm.lost, grid_dim=sm.grid_dim
    )
