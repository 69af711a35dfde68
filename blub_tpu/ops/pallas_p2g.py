"""Pallas P2G kernel: fused particle-to-grid transfer for all four fields.

The TPU analog of the reference's hottest kernel — the shared-memory
linked-list gather (shader/simulation/transfer_gather_velocity.comp, ">4x
speedup" over the naive walk): each program block DMAs its table window
(core + 1-cell halo) into VMEM ONCE and accumulates the 20-offset window sweep
entirely on-chip, instead of XLA's per-offset HBM re-reads (20x traffic).

Inputs are the resident slot-major table ``data f32[K, 16, X, Y, Zp]``
(sim/slot_major.py) — UNPADDED in x/y: each block loads its halo window in 9
statically-placed rectangle DMAs (3 x-parts x 3 y-parts, edge parts clamped
into bounds). Clamped duplicate rows need no masking: the in-kernel bin check
(floor(pos-0.5) == cell + offset, on absolute positions) zeroes them exactly.

Outputs are the raw accumulators [7, X, Y, Zp]:
  0..2: Shepard weight sums per velocity component
  3..5: weighted APIC velocity sums
  6:    particle density at cell centers
Marker-based masking/normalization/gravity stay outside (cheap dense XLA).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sim.slot_major import NUM_CH, SlotMajorTable, from_table

# union window: dual bins g+o contributing to any field at cell g
_OFFSETS = tuple(
    (ox, oy, oz)
    for ox in (-1, 0, 1)
    for oy in (-1, 0, 1)
    for oz in (-1, 0, 1)
    if (ox, oy, oz).count(1) <= 1
)

_STAGS = ((1.0, 0.5, 0.5), (0.5, 1.0, 0.5), (0.5, 0.5, 1.0))

_YH = 8  # y halo part size (sublane alignment unit)


def _kernel(
    data_hbm, out_ref, win, sems, *, bx: int, by: int, X: int, Y: int, z: int,
    density_only: bool = False, velocity_only: bool = False,
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    # 9-part window DMA: x parts [1 | bx | 1], y parts [8 | by | 8]
    xa = jnp.clip(i * bx - 1, 0, X - 1)
    xc = jnp.clip(i * bx + bx, 0, X - 1)
    ya = jnp.clip(j * by - _YH, 0, Y - _YH)
    yc = jnp.clip(j * by + by, 0, Y - _YH)
    xparts = ((xa, 0, 1), (i * bx, 1, bx), (xc, 1 + bx, 1))
    yparts = ((ya, 0, _YH), (j * by, _YH, by), (yc, _YH + by, _YH))
    copies = []
    for n, (xs, xd, xn) in enumerate(xparts):
        for m, (ys, yd, yn) in enumerate(yparts):
            copies.append(
                pltpu.make_async_copy(
                    data_hbm.at[:, :, pl.ds(xs, xn), pl.ds(ys, yn), :],
                    win.at[:, :, pl.ds(xd, xn), pl.ds(yd, yn), :],
                    sems.at[n * 3 + m],
                )
            )
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    # global coordinates of the output core
    gx = (i * bx + jax.lax.broadcasted_iota(jnp.int32, (bx, by, z), 0)).astype(jnp.float32)
    gy = (j * by + jax.lax.broadcasted_iota(jnp.int32, (bx, by, z), 1)).astype(jnp.float32)
    gz = jax.lax.broadcasted_iota(jnp.int32, (bx, by, z), 2).astype(jnp.float32)

    n_out = 1 if density_only else (6 if velocity_only else 7)
    acc = [jnp.zeros((bx, by, z), jnp.float32) for _ in range(n_out)]

    offsets = (
        tuple(o for o in _OFFSETS if all(v <= 0 for v in o)) if density_only else _OFFSETS
    )
    for off in offsets:
        ox, oy, oz = off
        slab = win[:, :, 1 + ox : 1 + ox + bx, _YH + oy : _YH + oy + by, :]
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
        # Only count particles whose dual bin really is (cell + off): this
        # enforces the table's bin invariant in-kernel AND exactly zeroes the
        # clamped duplicate window rows and z-roll wraps.
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

        if not velocity_only:
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


@functools.partial(
    jax.jit, static_argnames=("bx", "by", "interpret", "density_only", "velocity_only")
)
def p2g_accumulate(
    data: jax.Array, bx: int = 8, by: int = 8, interpret: bool = False,
    density_only: bool = False, velocity_only: bool = False,
) -> jax.Array:
    """data: f32[K, 16, X, Y, Zp] resident slot-major table -> f32[7|6|1, X, Y, Zp]."""
    k, ch, x, y, zp = data.shape
    assert ch == NUM_CH, ch
    assert x % bx == 0 and y % by == 0 and by % 8 == 0, (x, y, bx, by)
    assert not (density_only and velocity_only)

    n_out = 1 if density_only else (6 if velocity_only else 7)
    grid = (x // bx, y // by)
    kernel = functools.partial(
        _kernel, bx=bx, by=by, X=x, Y=y, z=zp,
        density_only=density_only, velocity_only=velocity_only,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (n_out, bx, by, zp), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_out, x, y, zp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k, NUM_CH, bx + 2, by + 2 * _YH, zp), jnp.float32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(data)


def _pick_blocks(x: int, y: int, zp: int, k: int, budget_bytes: int = 64 << 20):
    """(bx, by) with the halo window inside the VMEM budget. Wide by is
    preferred: the y halo parts are fixed 8-wide (sublane alignment), so the
    window read amplification is (by+16)/by."""
    assert y % 8 == 0, f"pallas p2g requires Y divisible by 8, got {y}"
    for by in (32, 16, 8):
        if y % by:
            continue
        for bx in (8, 4, 2, 1):
            if x % bx == 0 and k * NUM_CH * (bx + 2) * (by + 2 * _YH) * zp * 4 <= budget_bytes:
                return bx, by
    return 1, 8


def _as_slot_major(table) -> SlotMajorTable:
    return table if isinstance(table, SlotMajorTable) else from_table(table)


def p2g_density_pallas(table, interpret: bool = False) -> jax.Array:
    """Particle density only (post-advect pass): 8-offset window, 1 output.
    Accepts a ParticleTable (converts) or the resident SlotMajorTable."""
    sm = _as_slot_major(table)
    x, y, z = sm.grid_dim
    bx, by = _pick_blocks(x, y, sm.data.shape[-1], sm.capacity)
    acc = p2g_accumulate(sm.data, bx=bx, by=by, interpret=interpret, density_only=True)
    return acc[0, :, :, :z]


def supports(grid_dim, capacity: int) -> bool:
    """Whether the kernel path can run this configuration."""
    x, y, z = grid_dim
    if y % 8:
        return False
    zp = max(128, -(-z // 128) * 128)
    return capacity * NUM_CH * 3 * (8 + 2 * _YH) * zp * 4 <= (64 << 20)


def p2g_velocity_density_pallas(
    table, marker: jax.Array, gravity_grid: Tuple[float, float, float], dt: float,
    interpret: bool = False, with_density: bool = True,
):
    """Drop-in replacement for dense_transfer.p2g_velocity_dense (+
    p2g_density_dense when with_density). Returns ((vx,vy,vz), density|None)."""
    from ..core.types import CELL_FLUID, CELL_SOLID
    from ..sim.gridops import shift

    sm = _as_slot_major(table)
    x, y, z = sm.grid_dim
    bx, by = _pick_blocks(x, y, sm.data.shape[-1], sm.capacity)
    acc = p2g_accumulate(
        sm.data, bx=bx, by=by, interpret=interpret, velocity_only=not with_density
    )
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
    return tuple(vel_out), (acc[6] if with_density else None)
