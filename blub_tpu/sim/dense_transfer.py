"""Dense-table P2G transfer and marker construction — the TPU fast path.

Equivalent math to ``transfer.py`` (which scatter/gathers flat particle arrays
and serves as the test oracle), but operating on the ``ParticleTable``
cell-slot layout where every access pattern is a *dense shifted window*:

- a staggered face at cell g accumulates from particles whose dual bin lies in
  a fixed 3x2x2 window around g (the dense analog of the reference's
  shared-memory linked-list walk over the 2x2x2 dual-cell neighborhood,
  transfer_gather_velocity.comp:14-17);
- all four transfers (3 velocity components + particle density) fuse into ONE
  sweep over the 20-offset union window — weights vanish automatically outside
  each field's support, so no per-field masking is needed;
- cells wrapped in by ``jnp.roll`` contribute zero weight because weights are
  computed from absolute particle positions (positions are clamped inside
  [1, dim-1]), so no border masking is needed either.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.types import CELL_AIR, CELL_FLUID, CELL_SOLID
from .gridops import border_mask, shift
from .table import ParticleTable

# Union window: dual bins b = g + o that can contribute to any of the four
# transfers at cell g. Velocity component c needs o_c in {-1,0,1} and {-1,0}
# on the other axes; density needs {-1,0}^3.
_UNION_OFFSETS = tuple(
    (ox, oy, oz)
    for ox in (-1, 0, 1)
    for oy in (-1, 0, 1)
    for oz in (-1, 0, 1)
    if ((ox, oy, oz).count(1) <= 1)
)


def _roll(a: jax.Array, off) -> jax.Array:
    """read[g] = a[g + off] (wrap-around; callers rely on position-based
    weights to zero wrapped contributions)."""
    return jnp.roll(a, tuple(-o for o in off), axis=(0, 1, 2))


def _cell_centers(grid_dim) -> jax.Array:
    return jnp.stack(
        [jax.lax.broadcasted_iota(jnp.float32, grid_dim, a) for a in range(3)], axis=-1
    )


def marker_from_table(
    table: ParticleTable, solid_occupancy: jax.Array | None
) -> jax.Array:
    """Marker grid from the table: FLUID where any particle has floor(pos)==g.

    Particles with primal cell g have base bin b = floor(p-0.5) equal to g or
    g-1 per axis, so scan the 8-offset window o in {-1,0}^3 (read[g] = bin
    g+o; the particle belongs iff its floor == g, i.e. its per-axis primal
    offset floor(p)-bin equals -o). The test rolls a tiny 3-bit per-slot code
    instead of full position vectors — ~12x less traffic.
    """
    grid_dim = table.grid_dim
    idx = _cell_centers(grid_dim)[:, :, :, None, :]  # [X,Y,Z,1,3]
    prim = (jnp.floor(table.pos) - jnp.floor(table.pos - 0.5)).astype(jnp.int8)
    code = prim[..., 0] + 2 * prim[..., 1] + 4 * prim[..., 2]  # i8[X,Y,Z,K]
    fluid = jnp.zeros(grid_dim, jnp.bool_)
    for off in ((ox, oy, oz) for ox in (-1, 0) for oy in (-1, 0) for oz in (-1, 0)):
        need = jnp.int8(-off[0] + 2 * -off[1] + 4 * -off[2])
        hit = _roll(table.valid & (code == need), off)
        fluid = fluid | jnp.any(hit, axis=-1)
    marker = jnp.where(fluid, jnp.int8(CELL_FLUID), jnp.int8(CELL_AIR))
    solid = border_mask(grid_dim)
    if solid_occupancy is not None:
        solid = solid | (solid_occupancy != 0.0)
    return jnp.where(solid, jnp.int8(CELL_SOLID), marker)


def p2g_velocity_dense(
    table: ParticleTable,
    marker: jax.Array,
    gravity_grid: Tuple[float, float, float],
    dt: float,
):
    """One fused sweep producing the three staggered velocity grids (with
    Shepard normalization, gravity, and solid-face rules identical to
    transfer.p2g_velocity). Returns (vx, vy, vz)."""
    grid_dim = table.grid_dim
    centers = _cell_centers(grid_dim)[:, :, :, None, :]  # [X,Y,Z,1,3]

    stags = [
        jnp.float32([1.0, 0.5, 0.5]),
        jnp.float32([0.5, 1.0, 0.5]),
        jnp.float32([0.5, 0.5, 1.0]),
    ]

    acc_w = [jnp.zeros(grid_dim, jnp.float32) for _ in range(3)]
    acc_v = [jnp.zeros(grid_dim, jnp.float32) for _ in range(3)]

    for off in _UNION_OFFSETS:
        p = _roll(table.pos, off)
        v = _roll(table.vel, off)
        aff = _roll(table.affine, off)
        valid = _roll(table.valid, off).astype(jnp.float32)

        for c in range(3):
            delta = centers + stags[c] - p  # [X,Y,Z,K,3]
            w = jnp.prod(jnp.clip(1.0 - jnp.abs(delta), 0.0, 1.0), axis=-1) * valid
            val = w * (v[..., c] + jnp.sum(aff[..., c, :] * delta, axis=-1))
            acc_w[c] = acc_w[c] + jnp.sum(w, axis=-1)
            acc_v[c] = acc_v[c] + jnp.sum(val, axis=-1)

    markerf = marker.astype(jnp.float32)
    vel_out = []
    for c in range(3):
        e = [0, 0, 0]
        e[c] = 1
        a = markerf
        b = shift(markerf, tuple(e))
        writes = (a == CELL_FLUID) | (b == CELL_FLUID)
        computes = (a != CELL_SOLID) & (b != CELL_SOLID)
        wsum = acc_w[c]
        vnorm = jnp.where(wsum > 0.0, acc_v[c] / jnp.where(wsum > 0.0, wsum, 1.0), 0.0)
        vel_out.append(
            jnp.where(writes & computes, vnorm + gravity_grid[c] * dt, 0.0)
        )
    return tuple(vel_out)


def p2g_density_dense(table: ParticleTable) -> jax.Array:
    """Raw particle density at cell centers from the (post-advect, rebinned)
    table: dual bins in the 8-offset window {-1,0}^3."""
    grid_dim = table.grid_dim
    centers = _cell_centers(grid_dim)[:, :, :, None, :]
    acc = jnp.zeros(grid_dim, jnp.float32)
    for off in ((ox, oy, oz) for ox in (-1, 0) for oy in (-1, 0) for oz in (-1, 0)):
        p = _roll(table.pos, off)
        valid = _roll(table.valid, off).astype(jnp.float32)
        delta = centers + 0.5 - p
        w = jnp.prod(jnp.clip(1.0 - jnp.abs(delta), 0.0, 1.0), axis=-1) * valid
        acc = acc + jnp.sum(w, axis=-1)
    return acc


def density_rhs_from_raw(density: jax.Array, marker: jax.Array, dt: float) -> jax.Array:
    """Finish the density-error RHS from the raw particle density (solid
    neighbor contributions, free-surface clamp, +-0.5 clamp, /dt) — identical
    post-processing to density.density_error_rhs."""
    from .density import DENSITY0, SOLID_NEIGHBOR_CONTRIBUTION

    any_air = jnp.zeros(marker.shape, jnp.bool_)
    out = density
    for ax in ((1, 0, 0), (0, 1, 0), (0, 0, 1)):
        for off in (ax, tuple(-a for a in ax)):
            nbr = shift(marker, off)
            out = out + jnp.where(nbr == CELL_SOLID, SOLID_NEIGHBOR_CONTRIBUTION, 0.0)
            any_air = any_air | (nbr == CELL_AIR)
    out = jnp.where(any_air, jnp.maximum(DENSITY0, out), out)
    rhs = jnp.clip(1.0 - out / DENSITY0, -0.5, 0.5) / dt
    return jnp.where(marker == CELL_FLUID, rhs, 0.0)
