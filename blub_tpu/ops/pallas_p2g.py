"""Pallas P2G kernel: fused particle-to-grid transfer for all four fields.

The TPU analog of the reference's hottest kernel — the shared-memory
linked-list gather (shader/simulation/transfer_gather_velocity.comp, ">4x
speedup" over the naive walk): each program block DMAs its table window
(core + 1-cell halo) into VMEM ONCE and accumulates the 20-offset window sweep
entirely on-chip, instead of XLA's per-offset HBM re-reads (20x traffic).

Inputs come in slot-major layout [K, 16, X+2, Y+2, Z] (x/y padded by one halo
cell so every block window is a static in-bounds slice; Z rides the 128-wide
lane axis); outputs are the raw accumulators [7, X, Y, Z]:
  0..2: Shepard weight sums per velocity component
  3..5: weighted APIC velocity sums
  6:    particle density at cell centers
Marker-based masking/normalization/gravity stay outside (cheap dense XLA).
Weights use absolute particle positions and a per-slab bin check, so halo
padding and z-shift borders contribute exactly zero.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# union window: dual bins g+o contributing to any field at cell g
_OFFSETS = tuple(
    (ox, oy, oz)
    for ox in (-1, 0, 1)
    for oy in (-1, 0, 1)
    for oz in (-1, 0, 1)
    if (ox, oy, oz).count(1) <= 1
)

_STAGS = ((1.0, 0.5, 0.5), (0.5, 1.0, 0.5), (0.5, 0.5, 1.0))


def _kernel(data_hbm, out_ref, win, sem, *, bx: int, by: int, z: int, density_only: bool = False):
    i = pl.program_id(0)
    j = pl.program_id(1)

    # padded coords: x window [i*bx, i*bx+bx+2) covers cells [i*bx-1, i*bx+bx+1).
    # The y window is 16 rows starting at j*by: Mosaic requires sublane-dim
    # DMA slices to be 8-aligned in start and size, so the window overshoots
    # to the right (y is padded accordingly; overshoot rows fail the bin
    # check / carry valid=0).
    copy = pltpu.make_async_copy(
        data_hbm.at[:, :, pl.ds(i * bx, bx + 2), pl.ds(j * by, 16), :],
        win,
        sem,
    )
    copy.start()
    copy.wait()

    # global coordinates of the output core
    gx = (i * bx + jax.lax.broadcasted_iota(jnp.int32, (bx, by, z), 0)).astype(jnp.float32)
    gy = (j * by + jax.lax.broadcasted_iota(jnp.int32, (bx, by, z), 1)).astype(jnp.float32)
    gz = jax.lax.broadcasted_iota(jnp.int32, (bx, by, z), 2).astype(jnp.float32)

    n_out = 1 if density_only else 7
    acc = [jnp.zeros((bx, by, z), jnp.float32) for _ in range(n_out)]

    offsets = (
        tuple(o for o in _OFFSETS if all(v <= 0 for v in o)) if density_only else _OFFSETS
    )
    for off in offsets:
        ox, oy, oz = off
        slab = win[:, :, 1 + ox : 1 + ox + bx, 1 + oy : 1 + oy + by, :]
        if oz != 0:
            # read[z] = value[z+oz]; the wrap-around rows fail the bin check
            # below, so a cyclic lane roll is safe (and cheap on the VPU).
            slab = jnp.roll(slab, -oz, axis=4)

        p0 = slab[:, 0]
        p1 = slab[:, 1]
        p2 = slab[:, 2]
        v0 = slab[:, 3]
        v1 = slab[:, 4]
        v2 = slab[:, 5]
        # Safety: only count particles whose dual bin really is (cell + off)
        # (also double-enforces the table's bin invariant in-kernel).
        valid = (
            slab[:, 15]
            * (jnp.floor(p0 - 0.5) == gx[None] + ox)
            * (jnp.floor(p1 - 0.5) == gy[None] + oy)
            * (jnp.floor(p2 - 0.5) == gz[None] + oz)
        )

        for c in range(0 if not density_only else 3, 3):
            sx, sy, sz = _STAGS[c]
            dx = gx[None] + sx - p0
            dy = gy[None] + sy - p1
            dz = gz[None] + sz - p2
            w = (
                jnp.clip(1.0 - jnp.abs(dx), 0.0, 1.0)
                * jnp.clip(1.0 - jnp.abs(dy), 0.0, 1.0)
                * jnp.clip(1.0 - jnp.abs(dz), 0.0, 1.0)
                * valid
            )
            row0 = slab[:, 6 + 3 * c]
            row1 = slab[:, 7 + 3 * c]
            row2 = slab[:, 8 + 3 * c]
            vc = (v0, v1, v2)[c]
            val = w * (vc + row0 * dx + row1 * dy + row2 * dz)
            acc[c] = acc[c] + jnp.sum(w, axis=0)
            acc[3 + c] = acc[3 + c] + jnp.sum(val, axis=0)

        # density: sample at cell centers
        dx = gx[None] + 0.5 - p0
        dy = gy[None] + 0.5 - p1
        dz = gz[None] + 0.5 - p2
        w = (
            jnp.clip(1.0 - jnp.abs(dx), 0.0, 1.0)
            * jnp.clip(1.0 - jnp.abs(dy), 0.0, 1.0)
            * jnp.clip(1.0 - jnp.abs(dz), 0.0, 1.0)
            * valid
        )
        acc[-1] = acc[-1] + jnp.sum(w, axis=0)

    for q in range(n_out):
        out_ref[q] = acc[q]


@functools.partial(jax.jit, static_argnames=("bx", "by", "interpret", "density_only"))
def p2g_accumulate(
    data: jax.Array, bx: int = 8, by: int = 8, interpret: bool = False, density_only: bool = False
) -> jax.Array:
    """data: f32[K, 16, X+2, Y+2, Z] padded slot-major table
    (channels: pos3 | vel3 | affine9 | valid) -> f32[7 or 1, X, Y, Z]."""
    k, ch, xp, yp, z = data.shape
    x, y = xp - 2, yp - 10
    assert ch == 16, ch
    assert x % bx == 0 and y % by == 0, (x, y, bx, by)

    n_out = 1 if density_only else 7
    grid = (x // bx, y // by)
    kernel = functools.partial(_kernel, bx=bx, by=by, z=z, density_only=density_only)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (n_out, bx, by, z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_out, x, y, z), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k, 16, bx + 2, 16, z), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(data)


def p2g_density_pallas(table, interpret: bool = False) -> jax.Array:
    """Particle density only (post-advect pass): 8-offset window, 1 output."""
    x, y, z = table.grid_dim
    data = table_to_slot_major(table)
    bx, by = _pick_blocks(x, y, data.shape[-1], table.capacity)
    acc = p2g_accumulate(data, bx=bx, by=by, interpret=interpret, density_only=True)
    return acc[0, :, :, :z]


def table_to_slot_major(table) -> jax.Array:
    """[X,Y,Z,K,*] table fields -> one f32[K, 16, X+2, Y+2, Zp] padded array.

    x/y gain a 1-cell halo pad; z pads up to a multiple of 128 because Mosaic
    requires lane-dimension DMA slices to be 128-aligned (padded z rows carry
    valid=0 and are sliced off the kernel output)."""
    grid_dim = table.grid_dim
    k = table.capacity
    z = grid_dim[2]
    zp = max(128, ((z + 127) // 128) * 128)
    payload = jnp.concatenate(
        [
            table.pos,
            table.vel,
            table.affine.reshape(grid_dim + (k, 9)),
            table.valid.astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )  # [X,Y,Z,K,16]
    data = jnp.transpose(payload, (3, 4, 0, 1, 2))
    # y right-pad of 9: each block's 16-row aligned y-window may overshoot
    return jnp.pad(data, ((0, 0), (0, 0), (1, 1), (1, 9), (0, zp - z)))


def _pick_blocks(x: int, y: int, zp: int, k: int, budget_bytes: int = 6 << 20):
    """(bx, by) with the halo window inside the VMEM budget. Pallas requires
    the output block's second-minor dim (by) divisible by 8 (or == Y)."""
    assert y % 8 == 0, f"pallas p2g requires Y divisible by 8, got {y}"
    by = 8
    for bx in (8, 4, 2, 1):
        if x % bx == 0 and k * 16 * (bx + 2) * 16 * zp * 4 <= budget_bytes:
            return bx, by
    return 1, by


def p2g_velocity_density_pallas(
    table, marker: jax.Array, gravity_grid: Tuple[float, float, float], dt: float,
    interpret: bool = False,
):
    """Drop-in replacement for dense_transfer.p2g_velocity_dense +
    p2g_density_dense (one fused kernel). Returns ((vx,vy,vz), density)."""
    from ..core.types import CELL_FLUID, CELL_SOLID
    from ..sim.gridops import shift

    x, y, z = table.grid_dim
    data = table_to_slot_major(table)
    bx, by = _pick_blocks(x, y, data.shape[-1], table.capacity)
    acc = p2g_accumulate(data, bx=bx, by=by, interpret=interpret)
    acc = acc[..., :z]

    markerf = marker.astype(jnp.float32)
    vel_out = []
    for c in range(3):
        e = [0, 0, 0]
        e[c] = 1
        a = markerf
        b = shift(markerf, tuple(e))
        writes = (a == CELL_FLUID) | (b == CELL_FLUID)
        computes = (a != CELL_SOLID) & (b != CELL_SOLID)
        wsum = acc[c]
        vnorm = jnp.where(wsum > 0.0, acc[3 + c] / jnp.where(wsum > 0.0, wsum, 1.0), 0.0)
        vel_out.append(jnp.where(writes & computes, vnorm + gravity_grid[c] * dt, 0.0))
    return tuple(vel_out), acc[6]
