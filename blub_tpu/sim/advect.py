"""Grid-to-particle transfer + APIC affine reconstruction + RK4 advection +
solid-wall handling (shader/simulation/advect_particles.comp).

Per particle: sample the 8 corners of all three staggered grids once, build the
trilinear velocity and the APIC affine rows (velocity Jacobian via
interpolation differences), integrate RK4 *confined to the current cell* (all
corner values already in registers), then clamp motion at solid cells exactly
like the reference (truncate the step at the current cell border; if stuck
inside a moving solid, escape along its dominant velocity axis / add an
occupancy-gradient push force).

One deliberate deviation: the reference nudges the RK4 sample interpolants with
the *vector* step added componentwise across the three staggered grids
(``saturate(interpolantsX + stepK2)`` adds step.y to the Y-grid's x-interpolant,
advect_particles.comp:118-127). We apply each step component to the matching
axis of all three grids, which is the mathematically intended RK4 refinement.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .gridops import gather_cells, sample_trilinear_clamped


class StaggeredSamples(NamedTuple):
    """8 corner values for all 3 staggered grids; each entry f32[N, 3]
    (component-stacked), plus per-axis interpolants f32[N, 3]."""

    v000: jax.Array
    v100: jax.Array
    v010: jax.Array
    v110: jax.Array
    v001: jax.Array
    v101: jax.Array
    v011: jax.Array
    v111: jax.Array
    ix: jax.Array
    iy: jax.Array
    iz: jax.Array


def _mix(a, b, t):
    return a + (b - a) * t


def gather_staggered_corners(
    vel: Tuple[jax.Array, jax.Array, jax.Array], pos: jax.Array
) -> StaggeredSamples:
    """Mirror of advect_particles.comp:71-99: per component c the sample
    origin is max(0, pos - (0.5 + 0.5*e_c)), corner max clamped to dim-1."""
    grid_dim = jnp.asarray(vel[0].shape, jnp.int32)
    corners = {k: [] for k in ("v000", "v100", "v010", "v110", "v001", "v101", "v011", "v111")}
    interp = []
    for c in range(3):
        off = jnp.full((3,), 0.5, jnp.float32).at[c].add(0.5)
        offp = jnp.maximum(0.0, pos - off)
        lo = jnp.floor(offp).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, grid_dim - 1)
        interp.append(offp - lo.astype(jnp.float32))

        def corner(sel):
            return jnp.stack(
                [jnp.where(sel[a], hi[:, a], lo[:, a]) for a in range(3)], axis=-1
            )

        g = vel[c]
        corners["v000"].append(gather_cells(g, corner((0, 0, 0))))
        corners["v100"].append(gather_cells(g, corner((1, 0, 0))))
        corners["v010"].append(gather_cells(g, corner((0, 1, 0))))
        corners["v110"].append(gather_cells(g, corner((1, 1, 0))))
        corners["v001"].append(gather_cells(g, corner((0, 0, 1))))
        corners["v101"].append(gather_cells(g, corner((1, 0, 1))))
        corners["v011"].append(gather_cells(g, corner((0, 1, 1))))
        corners["v111"].append(gather_cells(g, corner((1, 1, 1))))

    stacked = {k: jnp.stack(v, axis=-1) for k, v in corners.items()}
    it = jnp.stack(interp, axis=1)  # f32[N, component, axis]
    return StaggeredSamples(
        ix=it[:, :, 0], iy=it[:, :, 1], iz=it[:, :, 2], **stacked
    )


def _trilinear(s: StaggeredSamples, ix, iy, iz):
    return _mix(
        _mix(_mix(s.v000, s.v100, ix), _mix(s.v010, s.v110, ix), iy),
        _mix(_mix(s.v001, s.v101, ix), _mix(s.v011, s.v111, ix), iy),
        iz,
    )


def g2p_apic(s: StaggeredSamples):
    """Velocity + APIC affine rows from corner samples
    (advect_particles.comp:101-115). Returns (vel f32[N,3], affine f32[N,3,3])
    where affine rows are (cx, cy, cz)."""
    ix, iy, iz = s.ix, s.iy, s.iz
    v_x00 = _mix(s.v000, s.v100, ix)
    v_x01 = _mix(s.v001, s.v101, ix)
    v_x10 = _mix(s.v010, s.v110, ix)
    v_x11 = _mix(s.v011, s.v111, ix)
    v_xy0 = _mix(v_x00, v_x10, iy)
    v_xy1 = _mix(v_x01, v_x11, iy)
    velocity = _mix(v_xy0, v_xy1, iz)

    cx = _mix(_mix(s.v100, s.v110, iy), _mix(s.v101, s.v111, iy), iz) - _mix(
        _mix(s.v000, s.v010, iy), _mix(s.v001, s.v011, iy), iz
    )
    cy = _mix(v_x10, v_x11, iz) - _mix(v_x00, v_x01, iz)
    cz = v_xy1 - v_xy0
    # cx = dv/dx for all three components (a Jacobian *column*). The reference
    # stores these columns directly as its per-component transfer rows
    # (advect_particles.comp:185 writes vec4(cx, v.x)), i.e. it transfers with
    # C^T. Correct APIC needs row c = grad(v_c), so affine[p, comp, axis]:
    affine = jnp.stack([cx, cy, cz], axis=-1)  # [..., comp, axis]
    return velocity, affine


def _rk4(s: StaggeredSamples, velocity: jax.Array, dt: float) -> jax.Array:
    """RK4 confined to the current cell (advect_particles.comp:117-128)."""

    def probe(step):
        return _trilinear(
            s,
            jnp.clip(s.ix + step[..., 0:1], 0.0, 1.0),
            jnp.clip(s.iy + step[..., 1:2], 0.0, 1.0),
            jnp.clip(s.iz + step[..., 2:3], 0.0, 1.0),
        )

    k1 = velocity
    k2 = probe(dt * 0.5 * k1)
    k3 = probe(dt * 0.5 * k2)
    k4 = probe(dt * k3)
    return dt * (1.0 / 6.0) * (k1 + 2.0 * (k2 + k3) + k4)


def _clamp_step_to_cell(original_pos, movement):
    """Truncate the movement so the particle stays in its current cell
    (advect_particles.comp:137-151): returns (direction, max_allowed_step,
    step_length).

    Deviation: the reference's ternary picks the distance to the border
    *behind* the motion (``direction.x > 0 ? posInCell.x : 1-posInCell.x``),
    which lets fast particles step up to a whole cell into solids before the
    next-step escape logic kicks in. We use the distance to the border being
    approached, which actually confines the step to the current cell."""
    step_len = jnp.linalg.norm(movement, axis=-1, keepdims=True) + 1e-10
    direction = movement / step_len
    abs_dir = jnp.abs(direction)
    pos_in_cell = original_pos - jnp.floor(original_pos)
    dist = jnp.where(direction > 0.0, 1.0 - pos_in_cell, pos_in_cell)
    per_axis = jnp.where(abs_dir > 0.0, dist / jnp.where(abs_dir > 0.0, abs_dir, 1.0) - 0.001, jnp.inf)
    max_step = jnp.minimum(step_len[..., 0], jnp.min(per_axis, axis=-1))
    return direction, max_step, step_len[..., 0]


def advect_particles(
    pos: jax.Array,
    vel_grids: Tuple[jax.Array, jax.Array, jax.Array],
    solid_occupancy: jax.Array | None,
    solid_velocity: jax.Array | None,
    dt: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full advect pass. Returns (new_pos, new_vel, new_affine)."""
    grid_dim = jnp.asarray(vel_grids[0].shape, jnp.int32)
    grid_max = grid_dim.astype(jnp.float32) - 1.001

    # Escape from moving solids that swallowed the particle
    # (advect_particles.comp:46-66).
    if solid_occupancy is not None:
        cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, grid_dim - 1)
        occ = gather_cells(solid_occupancy, cell)
        sv = jnp.stack([gather_cells(solid_velocity[..., a], cell) for a in range(3)], axis=-1)
        abs_sv = jnp.abs(sv)
        use_x = (abs_sv[:, 0] > abs_sv[:, 1]) & (abs_sv[:, 0] > abs_sv[:, 2])
        use_y = jnp.logical_not(use_x) & (abs_sv[:, 1] > abs_sv[:, 2])
        use_z = jnp.logical_not(use_x) & jnp.logical_not(use_y)
        escape = jnp.stack(
            [
                jnp.where(use_x, jnp.sign(sv[:, 0]), 0.0),
                jnp.where(use_y, jnp.sign(sv[:, 1]), 0.0),
                jnp.where(use_z, jnp.sign(sv[:, 2]), 0.0),
            ],
            axis=-1,
        )
        pos = jnp.where((occ > 0.0)[:, None], pos + escape, pos)

    samples = gather_staggered_corners(vel_grids, pos)
    velocity, affine = g2p_apic(samples)
    movement = _rk4(samples, velocity, dt)
    new_pos = pos + movement

    # Solid / domain-border penetration handling (advect_particles.comp:130-180).
    out_of_bounds = jnp.any((new_pos < 1.001) | (new_pos > grid_max), axis=-1)
    if solid_occupancy is not None:
        target_cell = jnp.clip(jnp.floor(new_pos).astype(jnp.int32), 0, grid_dim - 1)
        in_solid = gather_cells(solid_occupancy, target_cell) > 0.0
        penetrates = out_of_bounds | in_solid
    else:
        penetrates = out_of_bounds

    direction, max_step, _ = _clamp_step_to_cell(pos, movement)
    clamped_movement = direction * max_step[..., None]

    if solid_occupancy is not None:
        # "Stuck" case: target cell equals the current cell -> occupancy-gradient
        # push force, sampled trilinearly at +-1 cell (comp:152-170).
        stuck = jnp.all(
            jnp.floor(pos).astype(jnp.int32) == jnp.floor(new_pos).astype(jnp.int32), axis=-1
        )
        q = new_pos - 0.5  # texel-center shift for trilinear occupancy samples
        grad = []
        for a in range(3):
            e = jnp.zeros((3,), jnp.float32).at[a].set(1.0)
            grad.append(
                sample_trilinear_clamped(solid_occupancy, q - e)
                - sample_trilinear_clamped(solid_occupancy, q + e)
            )
        push = jnp.stack(grad, axis=-1) * (dt * 50.0)
        clamped_movement = clamped_movement + jnp.where((stuck & penetrates)[:, None], push, 0.0)

    corrected_pos = jnp.clip(pos + clamped_movement, 1.001, grid_max)
    corrected_vel = direction * (max_step / dt)[..., None]

    new_pos = jnp.where(penetrates[:, None], corrected_pos, new_pos)
    velocity = jnp.where(penetrates[:, None], corrected_vel, velocity)
    return new_pos, velocity, affine
