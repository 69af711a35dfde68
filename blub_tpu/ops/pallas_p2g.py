"""Pallas P2G kernel: fused particle-to-grid transfer for all four fields.

The TPU analog of the reference's hottest kernel — the shared-memory
linked-list gather (shader/simulation/transfer_gather_velocity.comp, ">4x
speedup" over the naive walk): each program block DMAs its table window
(core + 1-cell halo) into VMEM ONCE and accumulates the 20-offset window sweep
entirely on-chip, instead of XLA's per-offset HBM re-reads (20x traffic).

Inputs are the resident slot-major table (sim/slot_major.py): rel16
positions+valid ``posq f32[K,2,X,Y,Zp]`` (bit patterns; decoded to exact f32
deltas in-register) and the bf16-packed velocity/affine channels
``dyn f32[K,6,X,Y,Zp]``. The density-only pass reads ONLY posq — density
needs no velocities. Arrays are UNPADDED in x/y: each block loads its halo
window in 9 statically-placed rectangle DMAs (3 x-parts x 3 y-parts, edge
parts clamped into bounds). Clamped duplicate rows and z-roll wraps are
killed by an in-domain mask on the EXPECTED source coordinate (cell + offset
in [0, dim)): the window parts clamp only at domain edges, so a row is a
duplicate exactly when its expected coordinate is out of domain. (The old
absolute-position bin check killed these as a side effect; cell-relative
positions are locally valid everywhere, so the mask is now explicit.)

Outputs are the raw accumulators:
  0..2: Shepard weight sums per velocity component
  3..5: weighted APIC velocity sums
  [6]:  particle density at cell centers (when with_density)
  last: FLUID count — number of valid particles whose PRIMAL cell
        (floor(pos)) is this cell. This folds the marker pass's table sweep
        into the window already resident here (the reference marks fluid
        during its linked-list build for the same reason,
        transfer_build_linkedlist.comp:24-26); the cheap border/solid
        overrides stay in XLA (sim/sm_phases.marker_from_counts).
Marker-based masking/normalization/gravity stay outside (cheap dense XLA).
Blocks whose window holds no particles early-exit to a zero write.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sim.slot_major import (
    CH_XY,
    CH_ZV,
    NUM_DYN,
    NUM_POSQ,
    POS_INV,
    SlotMajorTable,
    from_table,
    unpack_hi,
    unpack_lo,
)

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


def _window_parts(i, j, bx, by, X, Y):
    xa = jnp.clip(i * bx - 1, 0, X - 1)
    xc = jnp.clip(i * bx + bx, 0, X - 1)
    ya = jnp.clip(j * by - _YH, 0, Y - _YH)
    yc = jnp.clip(j * by + by, 0, Y - _YH)
    xparts = ((xa, 0, 1), (i * bx, 1, bx), (xc, 1 + bx, 1))
    yparts = ((ya, 0, _YH), (j * by, _YH, by), (yc, _YH + by, _YH))
    return xparts, yparts


def _kernel(
    *refs, bx: int, by: int, X: int, Y: int, z: int,
    density_only: bool = False, velocity_only: bool = False,
    with_xs: bool = False, with_gmask: bool = False,
):
    gmask = None
    if with_gmask:
        gmask, *refs = refs
    xs_ref = None
    if with_xs:
        xs_ref, *refs = refs
    if density_only:
        posq_hbm, out_ref, winp, sems = refs
        srcs = ((posq_hbm, winp),)
    else:
        posq_hbm, dyn_hbm, out_ref, winp, wind, sems = refs
        srcs = ((posq_hbm, winp), (dyn_hbm, wind))
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    it = i * nj + j
    slot = jax.lax.rem(it, 2)
    k_slots = winp.shape[1]

    # 9-part window DMA per source: x parts [1 | bx | 1], y parts [8 | by | 8].
    # Windows are double-buffered: block n+1's window streams in while block n
    # computes (the window DMA is the bulk of calm-flow P2G time). Slot groups
    # above _G0 are occupancy-gated via ``gmask`` (see
    # pallas_rebin.block_group_mask): groups with no valid particle anywhere
    # in the window skip their DMA and zero-fill instead (bit-identical bytes
    # — empty slots hold exact zeros).
    from .pallas_rebin import group_ranges

    ranges = group_ranges(k_slots) if with_gmask else [(0, k_slots, None)]

    def group_parts(ii, jj, sl, gi):
        q0, q1, _ = ranges[gi]
        qs = pl.ds(q0, q1 - q0)
        xparts, yparts = _window_parts(ii, jj, bx, by, X, Y)
        copies = []
        for t, (hbm, win) in enumerate(srcs):
            for n, (xs, xd, xn) in enumerate(xparts):
                for m, (ys, yd, yn) in enumerate(yparts):
                    copies.append(
                        pltpu.make_async_copy(
                            hbm.at[qs, :, pl.ds(xs, xn), pl.ds(ys, yn), :],
                            win.at[sl, qs, :, pl.ds(xd, xn), pl.ds(yd, yn), :],
                            sems.at[sl, 9 * (len(srcs) * gi + t) + n * 3 + m],
                        )
                    )
        return copies

    def start_all(ii, jj, sl):
        for gi, (q0, q1, bit) in enumerate(ranges):
            cs = group_parts(ii, jj, sl, gi)
            if bit is None:
                for c in cs:
                    c.start()
                continue
            on = jax.lax.shift_right_logical(gmask[ii, jj], bit) & 1

            @pl.when(on == 1)
            def _start(cs=cs):
                for c in cs:
                    c.start()

            @pl.when(on == 0)
            def _zero(q0=q0, q1=q1, sl=sl):
                for _, win in srcs:
                    wv = win.at[sl]
                    wv[q0:q1] = jnp.zeros(
                        (q1 - q0,) + win.shape[2:], jnp.float32
                    )

    @pl.when(it == 0)
    def _warm():
        start_all(i, j, slot)

    nxt = it + 1

    @pl.when(nxt < ni * nj)
    def _prefetch():
        start_all(nxt // nj, jax.lax.rem(nxt, nj), 1 - slot)

    for gi, (q0, q1, bit) in enumerate(ranges):
        cs = group_parts(i, j, slot, gi)
        if bit is None:
            for c in cs:
                c.wait()
            continue
        on = jax.lax.shift_right_logical(gmask[i, j], bit) & 1

        @pl.when(on == 1)
        def _wait(cs=cs):
            for c in cs:
                c.wait()
    if density_only:
        winp = winp.at[slot]
    else:
        winp, wind = winp.at[slot], wind.at[slot]

    # ARRAY-frame coordinates of the output core, for the in-domain masks
    # (module docstring). rel16 positions are cell-relative, so the weights
    # need no coordinates at all — under sharding (with_xs) the global frame
    # origin xs_ref is now irrelevant to this kernel and stays unread (the
    # wrapper interface is shared with the advect kernels).
    gxw = i * bx + jax.lax.broadcasted_iota(jnp.int32, (bx, by, z), 0)
    gyw = j * by + jax.lax.broadcasted_iota(jnp.int32, (bx, by, z), 1)
    gzw = jax.lax.broadcasted_iota(jnp.int32, (bx, by, z), 2)

    n_out = 2 if density_only else (7 if velocity_only else 8)

    # block-level early-exit: air blocks (no particles anywhere in the
    # window) are common in free-surface scenes and cost only this reduce
    has_particles = jnp.any(
        (jax.lax.bitcast_convert_type(winp[:, CH_ZV], jnp.int32) & 1) == 1
    )

    @pl.when(jnp.logical_not(has_particles))
    def _empty():
        out_ref[...] = jnp.zeros((n_out, bx, by, z), jnp.float32)

    # slot-group occupancy gating: compute runs per GROUP of 4 slots, skipped
    # entirely (one cheap reduce) when no particle occupies the group anywhere
    # in the window. Packs fill the lowest empty slots first, so typical flows
    # (~2-3 particles/cell vs capacity 16) leave the upper groups empty almost
    # everywhere — this is where P2G's VPU time goes (PERF.md round 3).
    k_slots = winp.shape[0]
    wvbit = jax.lax.bitcast_convert_type(winp[:, CH_ZV], jnp.int32) & 1
    _GSZ = 4

    def _accumulate_group(g0, g1):
        acc = [jnp.zeros((bx, by, z), jnp.float32) for _ in range(n_out)]

        offsets = (
            tuple(o for o in _OFFSETS if all(v <= 0 for v in o))
            if density_only
            else _OFFSETS
        )
        for off in offsets:
            ox, oy, oz = off

            def slabify(win, o=off):
                s = win[
                    g0:g1, :, 1 + o[0] : 1 + o[0] + bx, _YH + o[1] : _YH + o[1] + by, :
                ]
                if o[2] != 0:
                    # read[z] = value[z+oz]; wrap rows are killed by the
                    # in-domain mask below, so a cyclic lane roll is safe.
                    s = jnp.roll(s, -o[2], axis=4)
                return s

            slabp = slabify(winp)
            b0 = jax.lax.bitcast_convert_type(slabp[:, CH_XY], jnp.int32)
            b1 = jax.lax.bitcast_convert_type(slabp[:, CH_ZV], jnp.int32)
            rx = b0 >> 16
            ry = (b0 << 16) >> 16
            rz = b1 >> 16
            # Valid = the slot's valid bit AND the expected source coordinate
            # (cell + off) in-domain: kills clamped duplicate halo rows and
            # z-roll wraps exactly (module docstring). Within the domain the
            # table's bin invariant holds by rebin construction, so the dual
            # bin IS cell + off and no position-based bin re-check is needed.
            okd = jnp.ones((bx, by, z), jnp.bool_)
            if ox:
                okd = okd & (gxw + ox >= 0) & (gxw + ox < X)
            if oy:
                okd = okd & (gyw + oy >= 0) & (gyw + oy < Y)
            if oz:
                okd = okd & (gzw + oz >= 0) & (gzw + oz < z)
            valid = ((b1 & 1) == 1) & okd[None]
            validf = valid.astype(jnp.float32)

            # shared trilinear stagger factors: component weights differ only
            # in which axis uses the 1.0-staggered factor, so 6 factors serve
            # all three components AND the cell-centered density. The rel16
            # decode composes into the delta directly:
            #   cell+0.5 - pos = cell+0.5 - ((cell+off)+1+r*2^-13)
            #                  = (-0.5 - off) - r*2^-13     (exact f32)
            dx5 = (-0.5 - ox) - rx.astype(jnp.float32) * POS_INV
            dy5 = (-0.5 - oy) - ry.astype(jnp.float32) * POS_INV
            dz5 = (-0.5 - oz) - rz.astype(jnp.float32) * POS_INV
            fx5 = jnp.clip(1.0 - jnp.abs(dx5), 0.0, 1.0)
            fy5 = jnp.clip(1.0 - jnp.abs(dy5), 0.0, 1.0)
            fz5 = jnp.clip(1.0 - jnp.abs(dz5), 0.0, 1.0)

            if not density_only:
                dx1 = dx5 + 0.5
                dy1 = dy5 + 0.5
                dz1 = dz5 + 0.5
                fx1 = jnp.clip(1.0 - jnp.abs(dx1), 0.0, 1.0)
                fy1 = jnp.clip(1.0 - jnp.abs(dy1), 0.0, 1.0)
                fz1 = jnp.clip(1.0 - jnp.abs(dz1), 0.0, 1.0)
                ds = ((dx1, dy5, dz5), (dx5, dy1, dz5), (dx5, dy5, dz1))
                ws = (
                    fx1 * (fy5 * fz5) * validf,
                    fx5 * (fy1 * fz5) * validf,
                    (fx5 * fy5) * fz1 * validf,
                )

                slabd = slabify(wind)
                vel = (
                    unpack_hi(slabd[:, 0]),
                    unpack_lo(slabd[:, 0]),
                    unpack_hi(slabd[:, 1]),
                )
                aff = (
                    unpack_lo(slabd[:, 1]), unpack_hi(slabd[:, 2]), unpack_lo(slabd[:, 2]),
                    unpack_hi(slabd[:, 3]), unpack_lo(slabd[:, 3]), unpack_hi(slabd[:, 4]),
                    unpack_lo(slabd[:, 4]), unpack_hi(slabd[:, 5]), unpack_lo(slabd[:, 5]),
                )
                for c in range(3):
                    w = ws[c]
                    dx, dy, dz = ds[c]
                    val = w * (
                        vel[c] + aff[3 * c] * dx + aff[3 * c + 1] * dy + aff[3 * c + 2] * dz
                    )
                    acc[c] = acc[c] + jnp.sum(w, axis=0)
                    acc[3 + c] = acc[3 + c] + jnp.sum(val, axis=0)

            if not velocity_only:
                # density: sample at cell centers
                acc[-2] = acc[-2] + jnp.sum(fx5 * fy5 * fz5 * validf, axis=0)

            if all(v <= 0 for v in off):
                # fluid marking: particles whose PRIMAL cell (floor(pos)) is
                # this cell all live in dual bins at offsets {-1,0}^3. Under
                # the bin invariant floor(pos) - bin = (r >= 0), so the
                # primal cell is this cell iff r {>= 0 at off -1, < 0 at 0}
                # per axis — pure integer sign tests.
                prim = (
                    valid
                    & ((rx >= 0) if ox else (rx < 0))
                    & ((ry >= 0) if oy else (ry < 0))
                    & ((rz >= 0) if oz else (rz < 0))
                )
                acc[-1] = acc[-1] + jnp.sum(prim.astype(jnp.float32), axis=0)

        for q in range(n_out):
            out_ref[q] = out_ref[q] + acc[q]

    @pl.when(has_particles)
    def _accumulate():
        for q in range(n_out):
            out_ref[q] = jnp.zeros((bx, by, z), jnp.float32)
        for g0 in range(0, k_slots, _GSZ):
            g1 = min(g0 + _GSZ, k_slots)
            vg = (
                has_particles
                if g0 == 0 and g1 >= k_slots
                else jnp.any(wvbit[g0:g1] == 1)
            )

            @pl.when(vg)
            def _group(g0=g0, g1=g1):
                _accumulate_group(g0, g1)


@functools.partial(
    jax.jit, static_argnames=("bx", "by", "interpret", "density_only", "velocity_only")
)
def p2g_accumulate(
    posq: jax.Array, dyn: jax.Array | None, bx: int = 8, by: int = 8,
    interpret: bool = False,
    density_only: bool = False, velocity_only: bool = False,
    x_start=None,
) -> jax.Array:
    """Slot-major table -> f32[8|7|2, X, Y, Zp] raw accumulators (the last
    channel is always the primal-cell fluid count).

    ``x_start``: global cell coordinate of array column 0 (traced i32 OK;
    None keeps the unsharded program byte-identical). Set only on the sharded
    path, where each shard passes a halo-extended local window of the table
    (parallel/sharded_sm.py)."""
    k, chp, x, y, zp = posq.shape
    assert chp == NUM_POSQ, chp
    assert x % bx == 0 and y % by == 0 and by % 8 == 0, (x, y, bx, by)
    assert not (density_only and velocity_only)

    n_out = 2 if density_only else (7 if velocity_only else 8)
    grid = (x // bx, y // by)
    with_xs = x_start is not None
    from .pallas_rebin import block_group_mask, cell_group_any, group_ranges

    nranges = len(group_ranges(k))
    with_gmask = nranges > 1
    kernel = functools.partial(
        _kernel, bx=bx, by=by, X=x, Y=y, z=zp,
        density_only=density_only, velocity_only=velocity_only,
        with_xs=with_xs, with_gmask=with_gmask,
    )
    win_shape = (2, k, NUM_POSQ, bx + 2, by + 2 * _YH, zp)
    scratch = [pltpu.VMEM(win_shape, jnp.float32)]
    in_specs = []
    inputs = []
    if with_gmask:
        # occupancy-gated window DMA (pallas_rebin.block_group_mask)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(block_group_mask(cell_group_any(posq), bx, by, 1, _YH))
    if with_xs:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.reshape(jnp.asarray(x_start, jnp.int32), (1,)))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    inputs.append(posq)
    nsrcs = 1
    if not density_only:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(dyn)
        scratch.append(
            pltpu.VMEM((2, k, NUM_DYN, bx + 2, by + 2 * _YH, zp), jnp.float32)
        )
        nsrcs = 2
    scratch.append(pltpu.SemaphoreType.DMA((2, 9 * nsrcs * nranges)))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (n_out, bx, by, zp), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_out, x, y, zp), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)


def _pick_blocks(x: int, y: int, zp: int, k: int, budget_bytes: int = 64 << 20):
    """(bx, by) with the double-buffered halo window inside the VMEM budget.
    Wide by is preferred: the y halo parts are fixed 8-wide (sublane
    alignment), so the window read amplification is (by+16)/by."""
    assert y % 8 == 0, f"pallas p2g requires Y divisible by 8, got {y}"
    nch = NUM_POSQ + NUM_DYN
    for by in (32, 16, 8):
        if y % by:
            continue
        for bx in (8, 4, 2, 1):
            win = 2 * k * nch * (bx + 2) * (by + 2 * _YH) * zp * 4
            if x % bx == 0 and win <= budget_bytes:
                return bx, by
    return 1, 8


def _as_slot_major(table) -> SlotMajorTable:
    return table if isinstance(table, SlotMajorTable) else from_table(table)


def p2g_density_pallas(table, interpret: bool = False, with_fluid: bool = False):
    """Particle density (post-advect pass): 8-offset window, positions-only
    window (density reads no velocities). Accepts a ParticleTable (converts)
    or the resident SlotMajorTable. With ``with_fluid``, also returns the
    primal-cell fluid count (for marker_from_counts)."""
    sm = _as_slot_major(table)
    x, y, z = sm.grid_dim
    bx, by = _pick_blocks(x, y, sm.zp, sm.capacity)
    acc = p2g_accumulate(
        sm.posq, None, bx=bx, by=by, interpret=interpret, density_only=True
    )
    if with_fluid:
        return acc[0, :, :, :z], acc[1, :, :, :z]
    return acc[0, :, :, :z]


def supports(grid_dim, capacity: int) -> bool:
    """Whether the kernel path can run this configuration."""
    x, y, z = grid_dim
    if y % 8:
        return False
    zp = max(128, -(-z // 128) * 128)
    nch = NUM_POSQ + NUM_DYN
    return 2 * capacity * nch * 3 * (8 + 2 * _YH) * zp * 4 <= (64 << 20)


def p2g_raw_accumulators(table, interpret: bool = False, with_density: bool = True):
    """Raw accumulator grids [7|8, X, Y, Z] (weights, weighted velocities,
    [density], fluid count) — one table pass serving P2G AND the marker."""
    sm = _as_slot_major(table)
    x, y, z = sm.grid_dim
    bx, by = _pick_blocks(x, y, sm.zp, sm.capacity)
    acc = p2g_accumulate(
        sm.posq, sm.dyn, bx=bx, by=by, interpret=interpret,
        velocity_only=not with_density,
    )
    return acc[..., :z]


def normalize_velocity(acc, marker, gravity_grid, dt):
    """Marker-gated Shepard normalization + gravity (the XLA tail of P2G)."""
    from ..core.types import CELL_FLUID, CELL_SOLID
    from ..sim.gridops import shift

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
    return tuple(vel_out)


def p2g_velocity_density_pallas(
    table, marker: jax.Array, gravity_grid: Tuple[float, float, float], dt,
    interpret: bool = False, with_density: bool = True,
):
    """Drop-in replacement for dense_transfer.p2g_velocity_dense (+
    p2g_density_dense when with_density). Returns ((vx,vy,vz), density|None).
    The production step uses p2g_raw_accumulators + normalize_velocity
    directly (deriving the marker from the same pass); this wrapper keeps the
    oracle-equivalence interface."""
    acc = p2g_raw_accumulators(table, interpret=interpret, with_density=with_density)
    vel = normalize_velocity(acc, marker, gravity_grid, dt)
    return vel, (acc[6] if with_density else None)
