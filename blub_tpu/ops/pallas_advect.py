"""Pallas G2P kernels: APIC advection and density position-correction on the
resident slot-major table.

TPU analog of the reference's advection kernel
(shader/simulation/advect_particles.comp:1-193) and the position-correction
half of its density projection (correct_particles.comp). The math is the
slot-major oracle's (sim/sm_phases.py::advect_slot_major / correct_slot_major,
which in turn mirror sim/advect.py — see there for the documented deviations
from the reference); this module only changes WHERE it runs: the oracle
materializes ~40 `[K,X,Y,Zp]` intermediates in HBM (64 MiB each at dam scale),
the kernel keeps them in VMEM per block, so HBM traffic drops to one table
read + one table write + small grid windows.

Window semantics: the oracle reads grids with `jnp.roll` (cyclic). Each block
DMAs a haloed grid window in 9 statically-placed parts whose source offsets
are taken MODULO the grid dim — exact cyclic semantics, no padding. The y
parts are 8-wide (sublane alignment; Y % 8 == 0 keeps modular starts aligned),
x parts are `hx`-wide (outer dim, unconstrained).

Per-particle 3-vectors are component-unrolled Python tuples of f32
[K, bx, by, Zp] arrays (a trailing length-3 dim would waste the 128-lane VPU).
"""

from __future__ import annotations

import functools
from itertools import product

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import CELL_SOLID
from ..sim.dense_advect import MAX_ADVECT_MOVE, MAX_CORRECT_MOVE
from ..sim.slot_major import (
    CH_XY,
    CH_ZV,
    NUM_DYN,
    NUM_POSQ,
    POS_INV,
    POS_SCALE,
    SlotMajorTable,
    pack_pair,
)

_YH = 8  # y halo part size (sublane slices must be 8-aligned in start+size)


def _bits(a):
    return jax.lax.bitcast_convert_type(a, jnp.int32)


def _f32i(a):
    return jax.lax.bitcast_convert_type(a, jnp.float32)


def _decode_pos(posq_slice, gf):
    """rel16 posq slot slice [G, 2, ...] -> ([px, py, pz] exact f32 global
    positions, validb bool). `gf` are the slots' f32 cell coordinates
    (global under sharding). Invalid slots decode to finite garbage; every
    consumer masks by validb."""
    b0 = _bits(posq_slice[:, CH_XY])
    b1 = _bits(posq_slice[:, CH_ZV])
    rs = (b0 >> 16, (b0 << 16) >> 16, b1 >> 16)
    pos = [gf[a] + 1.0 + rs[a].astype(jnp.float32) * POS_INV for a in range(3)]
    return pos, (b1 & 1) == 1


def _encode_pos(new_pos, validb, gf):
    """Global positions -> rel16 posq channels (quantizing to the 2^-13
    grid exactly like slot_major.quantize_pos — see there for the f32
    exactness argument), masked so invalid slots stay exact zeros."""
    rs = [
        jnp.round((new_pos[a] - gf[a] - 1.0) * POS_SCALE).astype(jnp.int32)
        for a in range(3)
    ]
    vbit = validb.astype(jnp.int32)
    ch0 = jnp.where(validb, (rs[0] << 16) | (rs[1] & 0xFFFF), 0)
    ch1 = jnp.where(validb, (rs[2] << 16) | vbit, 0)
    return _f32i(ch0), _f32i(ch1)


def _valid_bits(posq_slice):
    return _bits(posq_slice[:, CH_ZV]) & 1


_CORNERS = {
    "v000": (0, 0, 0), "v100": (1, 0, 0), "v010": (0, 1, 0), "v110": (1, 1, 0),
    "v001": (0, 0, 1), "v101": (1, 0, 1), "v011": (0, 1, 1), "v111": (1, 1, 1),
}


def _mix(a, b, t):
    return a + (b - a) * t


def _window_copies(g_hbm, win, sems, sem0, i, j, *, bx, by, X, Y, hx):
    """9-part cyclic window DMA for one grid [X, Y, Zp] into a
    [bx + 2*hx, by + 2*_YH, Zp] VMEM window (core at [hx, _YH]). Modular part
    placement reproduces `jnp.roll` halo semantics exactly."""
    xparts = (
        ((i * bx - hx) % X, 0, hx),
        (i * bx, hx, bx),
        ((i * bx + bx) % X, hx + bx, hx),
    )
    yparts = (
        ((j * by - _YH) % Y, 0, _YH),
        (j * by, _YH, by),
        ((j * by + by) % Y, _YH + by, _YH),
    )
    copies = []
    for n, (xs, xd, xn) in enumerate(xparts):
        for m, (ys, yd, yn) in enumerate(yparts):
            copies.append(
                pltpu.make_async_copy(
                    g_hbm.at[pl.ds(xs, xn), pl.ds(ys, yn), :],
                    win.at[pl.ds(xd, xn), pl.ds(yd, yn), :],
                    sems.at[sem0 + n * 3 + m],
                )
            )
    return copies


def _slab(win, off, hx, bx, by):
    """Grid window read at integer offset: value[g] = grid[g + off], shaped
    [1, bx, by, Zp] for K-broadcast. The z component is a cyclic lane roll
    (same as the oracle's jnp.roll on the z-padded grid)."""
    ox, oy, oz = off
    s = win[hx + ox : hx + ox + bx, _YH + oy : _YH + oy + by, :]
    if oz:
        s = jnp.roll(s, -oz, axis=2)
    return s[None]


def _staggered_corners(wins_v, sel, xi, bx, by):
    """Port of sm_phases._staggered_corners_sm, component-unrolled.
    Returns (corners, interps): corners[c] maps corner name -> f32[K,bx,by,Zp];
    interps[c] = (ix, iy, iz) for staggered grid c. `xi` must be the clipped
    in-cell coordinate; `sel` its >= 0.5 mask."""
    rolled = []
    for c in range(3):
        d = {}
        for off in product(*[(-1, 0, 1) if a == c else (0, 1) for a in range(3)]):
            d[off] = _slab(wins_v[c], off, 1, bx, by)
        rolled.append(d)

    corners, interps = [], []
    for c in range(3):
        cc = {}
        for name, corner in _CORNERS.items():
            lo = list(corner)
            lo[c] -= 1
            cc[name] = jnp.where(sel[c], rolled[c][corner], rolled[c][tuple(lo)])
        corners.append(cc)
        it = tuple(
            xi[c] + jnp.where(sel[c], -0.5, 0.5) if a == c else xi[a] for a in range(3)
        )
        interps.append(it)
    return corners, interps


def _tri(cc, ix, iy, iz):
    return _mix(
        _mix(_mix(cc["v000"], cc["v100"], ix), _mix(cc["v010"], cc["v110"], ix), iy),
        _mix(_mix(cc["v001"], cc["v101"], ix), _mix(cc["v011"], cc["v111"], ix), iy),
        iz,
    )


def _g2p_apic(corners, interps):
    """Port of advect.g2p_apic: per-component velocity + affine rows."""
    vel, aff = [], []
    for c in range(3):
        s, (ix, iy, iz) = corners[c], interps[c]
        v_x00 = _mix(s["v000"], s["v100"], ix)
        v_x01 = _mix(s["v001"], s["v101"], ix)
        v_x10 = _mix(s["v010"], s["v110"], ix)
        v_x11 = _mix(s["v011"], s["v111"], ix)
        v_xy0 = _mix(v_x00, v_x10, iy)
        v_xy1 = _mix(v_x01, v_x11, iy)
        vel.append(_mix(v_xy0, v_xy1, iz))
        cx = _mix(_mix(s["v100"], s["v110"], iy), _mix(s["v101"], s["v111"], iy), iz) - _mix(
            _mix(s["v000"], s["v010"], iy), _mix(s["v001"], s["v011"], iy), iz
        )
        cy = _mix(v_x10, v_x11, iz) - _mix(v_x00, v_x01, iz)
        cz = v_xy1 - v_xy0
        aff.append((cx, cy, cz))
    return vel, aff


def _rk4(corners, interps, velocity, dt):
    """Port of advect._rk4 (cell-confined probes)."""

    def probe(sx, sy, sz):
        out = []
        for c in range(3):
            ix, iy, iz = interps[c]
            out.append(
                _tri(
                    corners[c],
                    jnp.clip(ix + sx, 0.0, 1.0),
                    jnp.clip(iy + sy, 0.0, 1.0),
                    jnp.clip(iz + sz, 0.0, 1.0),
                )
            )
        return out

    k1 = velocity
    k2 = probe(*(dt * 0.5 * k for k in k1))
    k3 = probe(*(dt * 0.5 * k for k in k2))
    k4 = probe(*(dt * k for k in k3))
    return [dt * (1.0 / 6.0) * (k1[a] + 2.0 * (k2[a] + k3[a]) + k4[a]) for a in range(3)]


def _clamp_step(pos, movement):
    """Port of advect._clamp_step_to_cell, component-unrolled."""
    step_len = (
        jnp.sqrt(movement[0] ** 2 + movement[1] ** 2 + movement[2] ** 2) + 1e-10
    )
    direction = [m / step_len for m in movement]
    max_step = step_len
    big = jnp.float32(jnp.inf)
    for a in range(3):
        d = direction[a]
        ad = jnp.abs(d)
        pic = pos[a] - jnp.floor(pos[a])
        dist = jnp.where(d > 0.0, 1.0 - pic, pic)
        per_axis = jnp.where(ad > 0.0, dist / jnp.where(ad > 0.0, ad, 1.0) - 0.001, big)
        max_step = jnp.minimum(max_step, per_axis)
    return direction, max_step


def _point_select(win, d, window, hx, bx, by):
    """Port of sm_phases._point_select_sm: value[slot] = grid[cell + d]."""
    acc = jnp.zeros(d[0].shape, jnp.float32)
    r = range(-window, window + 1)
    for off in product(r, r, r):
        hit = (d[0] == off[0]) & (d[1] == off[1]) & (d[2] == off[2])
        acc = acc + jnp.where(hit, _slab(win, off, hx, bx, by), 0.0)
    return acc


def _primal_select(win, sel, hx, bx, by):
    """Port of sm_phases._primal_select_sm: value[slot] = grid[floor(pos)]."""
    acc = 0.0
    for off in product((0, 1), (0, 1), (0, 1)):
        hit = (
            (sel[0] == bool(off[0]))
            & (sel[1] == bool(off[1]))
            & (sel[2] == bool(off[2]))
        )
        acc = acc + jnp.where(hit, _slab(win, off, hx, bx, by), 0.0)
    return acc


def _push_force(win_occ, xi, hx, bx, by, dt):
    """Occupancy-gradient push (advect_particles.comp:152-170): trilinear
    sample of the central-difference gradient, composed so grad_a at trilinear
    offset `off` reads occ[g + off -/+ e_a] straight from the window."""
    out = []
    for a in range(3):
        acc = 0.0
        for off in product((0, 1), (0, 1), (0, 1)):
            w = 1.0
            for b in range(3):
                w = w * (xi[b] if off[b] else (1.0 - xi[b]))
            lo = list(off)
            lo[a] -= 1
            hi = list(off)
            hi[a] += 1
            g = 0.5 * (
                _slab(win_occ, tuple(lo), hx, bx, by)
                - _slab(win_occ, tuple(hi), hx, bx, by)
            )
            acc = acc + w * g
        out.append(acc * (dt * 50.0))
    return out


def _block_coords(i, j, bx, by, zp, xpad=0):
    """Global cell coordinates of the compute block. With ``xpad``, the block
    is x-extended by pad cells each side (fused advect+pack), so the first
    compute cell sits at global x = i*bx - xpad (clamped halo rows near the
    domain edge carry WRONG coordinates here — the pack's rowok mask kills
    them; see _rowok in pallas_rebin)."""
    shape = (bx + 2 * xpad, by, zp)
    gx = (i * bx - xpad + jax.lax.broadcasted_iota(jnp.int32, shape, 0))[None]
    gy = (j * by + jax.lax.broadcasted_iota(jnp.int32, shape, 1))[None]
    gz = jax.lax.broadcasted_iota(jnp.int32, shape, 2)[None]
    return (gx, gy, gz)


def _advect_kernel(*refs, bx, by, X, Y, grid_dim, with_solids, with_xs=False):
    if with_solids:
        (dt_ref, posq_ref, v0, v1, v2, occ, s0, s1, s2,
         outp_ref, outd_ref, ms_ref,
         wv0, wv1, wv2, wocc, ws0, ws1, ws2, sems) = refs
        grids = ((v0, wv0, 1), (v1, wv1, 1), (v2, wv2, 1), (occ, wocc, 2),
                 (s0, ws0, 1), (s1, ws1, 1), (s2, ws2, 1))
    else:
        (dt_ref, posq_ref, v0, v1, v2, outp_ref, outd_ref, ms_ref,
         wv0, wv1, wv2, sems) = refs
        grids = ((v0, wv0, 1), (v1, wv1, 1), (v2, wv2, 1))
    i = pl.program_id(0)
    j = pl.program_id(1)
    dt = dt_ref[0]
    # with_xs: dt_ref[1] is the global x cell coordinate of array column 0
    # (f32-encoded integer; spatial sharding only — parallel/sharded_sm.py)
    xs = dt_ref[1] if with_xs else None
    zp = posq_ref.shape[-1]
    k = posq_ref.shape[0]

    # air blocks (no particles) skip everything, grid-window DMAs included
    has_particles = jnp.any(_valid_bits(posq_ref) == 1)

    @pl.when(jnp.logical_not(has_particles))
    def _empty():
        outp_ref[...] = jnp.zeros((k, NUM_POSQ, bx, by, zp), jnp.float32)
        outd_ref[...] = jnp.zeros((k, NUM_DYN, bx, by, zp), jnp.float32)
        ms_ref[...] = jnp.zeros((8, 128), jnp.float32)

    @pl.when(has_particles)
    def _run():
        _advect_block(
            dt, posq_ref, grids, outp_ref, outd_ref, ms_ref, sems, i, j,
            bx=bx, by=by, X=X, Y=Y, grid_dim=grid_dim, with_solids=with_solids,
            xs=xs,
        )


def _advect_block(
    dt, posq_ref, grids, outp_ref, outd_ref, ms_ref, sems, i, j,
    *, bx, by, X, Y, grid_dim, with_solids, xpad=0, rowok_b=None, xs=None,
):
    """With ``xpad`` > 0 (fused advect+x-pack), the compute block is
    x-extended by xpad cells each side: grid windows widen by xpad (their
    structural margin `hx` around the extended core is unchanged, so every
    _slab/_point_select margin below stays as-is), and coordinates anchor at
    i*bx - xpad. ``rowok_b`` masks clamped duplicate halo rows out of the
    max-speed by-product (their advect outputs are garbage; the pack masks
    them out of the table separately)."""
    zp = posq_ref.shape[-1]
    k = posq_ref.shape[0]
    bxc = bx + 2 * xpad  # compute width
    if with_solids:
        (_, wv0, _), (_, wv1, _), (_, wv2, _), (_, wocc, _), (_, ws0, _), (_, ws1, _), (_, ws2, _) = grids
    else:
        (_, wv0, _), (_, wv1, _), (_, wv2, _) = grids

    copies = []
    for n, (g, w, hx) in enumerate(grids):
        copies += _window_copies(
            g, w, sems, 9 * n, i, j, bx=bx, by=by, X=X, Y=Y, hx=hx + xpad
        )
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    gi = _block_coords(i, j, bx, by, zp, xpad)
    gf = [g.astype(jnp.float32) for g in gi]
    if xs is not None:
        # sharded: array x frame is a halo-extended local window; positions
        # stay GLOBAL, so cell coordinates get the window's global origin.
        # grid_dim is the GLOBAL domain (the caller passes domain_dim); the
        # clamp bounds below therefore stay correct at every shard seam.
        gf[0] = gf[0] + xs
    gmax = [float(grid_dim[a]) - 1.001 for a in range(3)]
    wins_v = (wv0, wv1, wv2)

    # slot-group occupancy gating (PERF.md round 3): the G2P/RK4/collision
    # math runs per GROUP of 4 slots and is skipped (one cheap reduce) when no
    # particle occupies the group anywhere in the block — packs fill lowest
    # slots first, so upper groups are empty almost everywhere in typical
    # flows (~2-3 particles/cell vs capacity 16). ms_ref accumulates across
    # groups via maximum.
    ms_ref[...] = jnp.zeros((8, 128), jnp.float32)
    for q0 in range(0, k, _GSZ):
        q1 = min(q0 + _GSZ, k)
        vg = jnp.any(_valid_bits(posq_ref[q0:q1]) == 1)

        @pl.when(vg)
        def _grp(q0=q0, q1=q1):
            _advect_group(
                dt, posq_ref, outp_ref, outd_ref, ms_ref, q0, q1,
                gi=gi, gf=gf, gmax=gmax, wins_v=wins_v,
                wocc=wocc if with_solids else None,
                wsv=(ws0, ws1, ws2) if with_solids else None,
                bxc=bxc, by=by, with_solids=with_solids,
                rowok_b=rowok_b, xs=xs,
            )

        @pl.when(jnp.logical_not(vg))
        def _zero(q0=q0, q1=q1):
            outp_ref[q0:q1] = jnp.zeros(
                (q1 - q0, NUM_POSQ, bxc, by, zp), jnp.float32
            )
            outd_ref[q0:q1] = jnp.zeros(
                (q1 - q0, NUM_DYN, bxc, by, zp), jnp.float32
            )


_GSZ = 4  # slot-group size for occupancy gating


def _advect_group(
    dt, posq_ref, outp_ref, outd_ref, ms_ref, q0, q1,
    *, gi, gf, gmax, wins_v, wocc, wsv, bxc, by, with_solids, rowok_b, xs,
):
    """The advect math of _advect_block for slots [q0, q1)."""
    pos, validb = _decode_pos(posq_ref[q0:q1], gf)

    xi = [pos[a] - 0.5 - gf[a] for a in range(3)]
    sel = [x >= 0.5 for x in xi]

    if with_solids:
        # escape from moving solids (advect_particles.comp:46-66)
        occ_here = _primal_select(wocc, sel, 2, bxc, by)
        sv_here = [_primal_select(w, sel, 1, bxc, by) for w in wsv]
        abs_sv = [jnp.abs(v) for v in sv_here]
        use_x = (abs_sv[0] > abs_sv[1]) & (abs_sv[0] > abs_sv[2])
        use_y = jnp.logical_not(use_x) & (abs_sv[1] > abs_sv[2])
        use_z = jnp.logical_not(use_x) & jnp.logical_not(use_y)
        uses = (use_x, use_y, use_z)
        swallowed = occ_here > 0.0
        pos = [
            jnp.where(
                swallowed, pos[a] + jnp.where(uses[a], jnp.sign(sv_here[a]), 0.0), pos[a]
            )
            for a in range(3)
        ]
        xi = [pos[a] - 0.5 - gf[a] for a in range(3)]
        sel = [x >= 0.5 for x in xi]

    # clipping xi preserves the >= 0.5 select, so `sel` is shared
    xi_c = [jnp.clip(x, 0.0, 1.0 - 1e-6) for x in xi]
    corners, interps = _staggered_corners(wins_v, sel, xi_c, bxc, by)
    velocity, affine = _g2p_apic(corners, interps)
    movement = _rk4(corners, interps, velocity, dt)
    movement = [jnp.clip(m, -MAX_ADVECT_MOVE, MAX_ADVECT_MOVE) for m in movement]
    new_pos = [
        jnp.clip(pos[a] + movement[a], gf[a] - 1.499, gf[a] + 2.499) for a in range(3)
    ]
    movement = [new_pos[a] - pos[a] for a in range(3)]

    oob = jnp.zeros(pos[0].shape, jnp.bool_)
    for a in range(3):
        oob = oob | (new_pos[a] < 1.001) | (new_pos[a] > gmax[a])
    if with_solids:
        # window-relative cell offsets: positions are global, gi is the array
        # frame — under sharding (xs) translate x back into the array frame
        # first (exact f32: subtracting an integer reduces the magnitude)
        np_arr = list(new_pos)
        if xs is not None:
            np_arr[0] = new_pos[0] - xs
        d = [
            jnp.clip(jnp.floor(np_arr[a]).astype(jnp.int32) - gi[a], -2, 2)
            for a in range(3)
        ]
        penetrates = oob | (_point_select(wocc, d, 2, 2, bxc, by) > 0.0)
    else:
        penetrates = oob

    direction, max_step = _clamp_step(pos, movement)
    clamped = [direction[a] * max_step for a in range(3)]

    if with_solids:
        stuck = jnp.ones(pos[0].shape, jnp.bool_)
        for a in range(3):
            stuck = stuck & (
                jnp.floor(pos[a]).astype(jnp.int32)
                == jnp.floor(new_pos[a]).astype(jnp.int32)
            )
        push = _push_force(wocc, xi, 2, bxc, by, dt)
        clamped = [
            clamped[a] + jnp.where(stuck & penetrates, push[a], 0.0) for a in range(3)
        ]

    inv_dt = max_step / dt
    for a in range(3):
        corrected_pos = jnp.clip(pos[a] + clamped[a], 1.001, gmax[a])
        new_pos[a] = jnp.where(penetrates, corrected_pos, new_pos[a])
        velocity[a] = jnp.where(penetrates, direction[a] * inv_dt, velocity[a])

    ch0, ch1 = _encode_pos(new_pos, validb, gf)
    outp_ref[q0:q1, CH_XY] = ch0
    outp_ref[q0:q1, CH_ZV] = ch1
    # per-block max |v|^2 by-product (drives CFL substepping without a
    # separate whole-table reduction; scalar in an (8,128)-tile like
    # pallas_pcg's stats output — scatter doesn't lower in Mosaic);
    # max-accumulated across slot groups (ms_ref is zeroed before the loop)
    # clamped duplicate halo rows (fused path) hold garbage — zero them out of
    # the payload and the max-speed reduction; the pack drops them anyway
    okb = validb if rowok_b is None else (validb & rowok_b[None])
    vq = [jnp.where(okb, velocity[a], 0.0) for a in range(3)]
    ms = jnp.max(vq[0] * vq[0] + vq[1] * vq[1] + vq[2] * vq[2])
    ii = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    ms_ref[...] = jnp.maximum(
        ms_ref[...], jnp.where((ii == 0) & (jj == 0), ms, 0.0)
    )
    aq = [
        jnp.where(okb, affine[c][a], 0.0) for c in range(3) for a in range(3)
    ]
    pairs = (
        (vq[0], vq[1]), (vq[2], aq[0]), (aq[1], aq[2]),
        (aq[3], aq[4]), (aq[5], aq[6]), (aq[7], aq[8]),
    )
    for c, (hi, lo) in enumerate(pairs):
        outd_ref[q0:q1, c] = pack_pair(hi, lo)


def _correct_kernel(*refs, bx, by, X, Y, grid_dim, with_xs=False):
    xs = None
    if with_xs:
        sc_ref, *refs = refs
        xs = sc_ref[0]
    posq_ref, c0, c1, c2, mk, out_ref, wc0, wc1, wc2, wmk, sems = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    zp = posq_ref.shape[-1]
    k = posq_ref.shape[0]

    # air blocks (no particles) skip everything, grid-window DMAs included
    has_particles = jnp.any(_valid_bits(posq_ref) == 1)

    @pl.when(jnp.logical_not(has_particles))
    def _empty():
        out_ref[...] = jnp.zeros((k, NUM_POSQ, bx, by, zp), jnp.float32)

    @pl.when(has_particles)
    def _run():
        _correct_block(
            posq_ref, (c0, wc0), (c1, wc1), (c2, wc2), (mk, wmk), out_ref,
            sems, i, j, bx=bx, by=by, X=X, Y=Y, grid_dim=grid_dim, xs=xs,
        )


def _correct_block(
    posq_ref, g0, g1, g2, gm, out_ref, sems, i, j, *, bx, by, X, Y, grid_dim,
    xpad=0, xs=None,
):
    zp = posq_ref.shape[-1]
    bxc = bx + 2 * xpad  # compute width (x-extended in the fused path)
    (c0, wc0), (c1, wc1), (c2, wc2), (mk, wmk) = g0, g1, g2, gm

    copies = []
    for n, (g, w) in enumerate(((c0, wc0), (c1, wc1), (c2, wc2), (mk, wmk))):
        copies += _window_copies(
            g, w, sems, 9 * n, i, j, bx=bx, by=by, X=X, Y=Y, hx=1 + xpad
        )
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    gi = _block_coords(i, j, bx, by, zp, xpad)
    gf = [g.astype(jnp.float32) for g in gi]
    if xs is not None:
        # sharded frame translation — see _advect_block
        gf[0] = gf[0] + xs
    gmax = [float(grid_dim[a]) - 1.001 for a in range(3)]

    # slot-group occupancy gating, as in _advect_block
    k = posq_ref.shape[0]
    for q0 in range(0, k, _GSZ):
        q1 = min(q0 + _GSZ, k)
        vg = jnp.any(_valid_bits(posq_ref[q0:q1]) == 1)

        @pl.when(vg)
        def _grp(q0=q0, q1=q1):
            _correct_group(
                posq_ref, out_ref, q0, q1, gi=gi, gf=gf, gmax=gmax,
                wins_c=(wc0, wc1, wc2), wmk=wmk, bxc=bxc, by=by, xs=xs,
            )

        @pl.when(jnp.logical_not(vg))
        def _zero(q0=q0, q1=q1):
            out_ref[q0:q1] = jnp.zeros(
                (q1 - q0, NUM_POSQ, bxc, by, zp), jnp.float32
            )


def _correct_group(
    posq_ref, out_ref, q0, q1, *, gi, gf, gmax, wins_c, wmk, bxc, by, xs,
):
    """The position-correction math of _correct_block for slots [q0, q1)."""
    pos, validb = _decode_pos(posq_ref[q0:q1], gf)

    xi = [jnp.clip(pos[a] - 0.5 - gf[a], 0.0, 1.0 - 1e-6) for a in range(3)]
    sel = [x >= 0.5 for x in xi]
    corners, interps = _staggered_corners(wins_c, sel, xi, bxc, by)
    movement = [_tri(corners[c], *interps[c]) for c in range(3)]
    movement = [jnp.clip(m, -MAX_CORRECT_MOVE, MAX_CORRECT_MOVE) for m in movement]
    new_pos = [
        jnp.clip(pos[a] + movement[a], gf[a] - 0.499, gf[a] + 1.999) for a in range(3)
    ]
    movement = [new_pos[a] - pos[a] for a in range(3)]

    oob = jnp.zeros(pos[0].shape, jnp.bool_)
    for a in range(3):
        oob = oob | (new_pos[a] < 1.001) | (new_pos[a] > gmax[a])
    np_arr = list(new_pos)
    if xs is not None:
        np_arr[0] = new_pos[0] - xs  # exact; see _advect_block
    d = [
        jnp.clip(jnp.floor(np_arr[a]).astype(jnp.int32) - gi[a], -1, 1)
        for a in range(3)
    ]
    target_marker = _point_select(wmk, d, 1, 1, bxc, by)
    penetrates = oob | (target_marker == float(CELL_SOLID))

    direction, max_step = _clamp_step(pos, movement)
    for a in range(3):
        corrected = jnp.clip(pos[a] + direction[a] * max_step, 1.001, gmax[a])
        new_pos[a] = jnp.where(penetrates, corrected, new_pos[a])

    ch0, ch1 = _encode_pos(new_pos, validb, gf)
    out_ref[q0:q1, CH_XY] = ch0
    out_ref[q0:q1, CH_ZV] = ch1


def _grid_window_scratch(bx, by, zp, hx):
    return pltpu.VMEM((bx + 2 * hx, by + 2 * _YH, zp), jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("grid_dim", "bx", "by", "interpret", "with_solids")
)
def _advect_call(
    posq, dt_arr, v0, v1, v2, occ, s0, s1, s2,
    *, grid_dim, bx, by, interpret, with_solids,
):
    k, chp, x, y, zp = posq.shape
    kernel = functools.partial(
        _advect_kernel, bx=bx, by=by, X=x, Y=y, grid_dim=grid_dim,
        with_solids=with_solids, with_xs=dt_arr.shape[0] >= 2,
    )
    posq_spec = pl.BlockSpec(
        (k, NUM_POSQ, bx, by, zp), lambda i, j: (0, 0, i, j, 0),
        memory_space=pltpu.VMEM,
    )
    dyn_spec = pl.BlockSpec(
        (k, NUM_DYN, bx, by, zp), lambda i, j: (0, 0, i, j, 0),
        memory_space=pltpu.VMEM,
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), posq_spec, any_spec, any_spec, any_spec]
    inputs = [dt_arr, posq, v0, v1, v2]
    scratch = [
        _grid_window_scratch(bx, by, zp, 1),
        _grid_window_scratch(bx, by, zp, 1),
        _grid_window_scratch(bx, by, zp, 1),
    ]
    if with_solids:
        in_specs += [any_spec] * 4
        inputs += [occ, s0, s1, s2]
        scratch += [
            _grid_window_scratch(bx, by, zp, 2),
            _grid_window_scratch(bx, by, zp, 1),
            _grid_window_scratch(bx, by, zp, 1),
            _grid_window_scratch(bx, by, zp, 1),
        ]
    scratch.append(pltpu.SemaphoreType.DMA((9 * (7 if with_solids else 3),)))
    ms_spec = pl.BlockSpec((8, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(x // bx, y // by),
        in_specs=in_specs,
        out_specs=[posq_spec, dyn_spec, ms_spec],
        out_shape=[
            jax.ShapeDtypeStruct(posq.shape, jnp.float32),
            jax.ShapeDtypeStruct((k, NUM_DYN, x, y, zp), jnp.float32),
            jax.ShapeDtypeStruct((8 * (x // bx), 128 * (y // by)), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.jit, static_argnames=("grid_dim", "bx", "by", "interpret"))
def _correct_call(posq, c0, c1, c2, marker_f, *, grid_dim, bx, by, interpret,
                  sc_arr=None):
    k, chp, x, y, zp = posq.shape
    with_xs = sc_arr is not None
    kernel = functools.partial(
        _correct_kernel, bx=bx, by=by, X=x, Y=y, grid_dim=grid_dim,
        with_xs=with_xs,
    )
    posq_spec = pl.BlockSpec(
        (k, NUM_POSQ, bx, by, zp), lambda i, j: (0, 0, i, j, 0),
        memory_space=pltpu.VMEM,
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [_grid_window_scratch(bx, by, zp, 1) for _ in range(4)]
    scratch.append(pltpu.SemaphoreType.DMA((36,)))
    in_specs = [posq_spec] + [any_spec] * 4
    inputs = [posq, c0, c1, c2, marker_f]
    if with_xs:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        inputs = [sc_arr] + inputs
    return pl.pallas_call(
        kernel,
        grid=(x // bx, y // by),
        in_specs=in_specs,
        out_specs=posq_spec,
        out_shape=jax.ShapeDtypeStruct(posq.shape, jnp.float32),
        scratch_shapes=scratch,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)


def _pad_z(g: jax.Array, zp: int) -> jax.Array:
    z = g.shape[2]
    if z == zp:
        return g
    return jnp.pad(g, ((0, 0), (0, 0), (0, zp - z)))


_LIVE_CH = 2 * (NUM_POSQ + NUM_POSQ + NUM_DYN) + 48  # in/out blocks x2 + temps


def _pick_blocks(x: int, y: int, zp: int, k: int, budget_bytes: int = 88 << 20):
    """(bx, by): the VMEM-heavy live set is the in+out table blocks (x2 for
    pipelining) plus ~48 K-shaped compute intermediates."""
    assert y % 8 == 0, f"pallas advect requires Y divisible by 8, got {y}"
    by = 8
    for bx in (8, 4, 2, 1):
        if x % bx == 0 and _LIVE_CH * k * bx * by * zp * 4 <= budget_bytes:
            return bx, by
    return 1, by


def supports(grid_dim, capacity: int) -> bool:
    x, y, z = grid_dim
    if y % 8:
        return False
    zp = max(128, -(-z // 128) * 128)
    return _LIVE_CH * capacity * 1 * 8 * zp * 4 <= (88 << 20)


def advect_sm_pallas(
    sm: SlotMajorTable, vel_grids, solid_occupancy, solid_velocity, dt,
    interpret: bool = False, with_max_speed: bool = False,
    x_start=None, domain_dim=None,
):
    """Drop-in replacement for sm_phases.advect_slot_major. `dt` may be a
    traced scalar (it rides in SMEM). Caller must rebin(max_shift=2).
    With ``with_max_speed``, also returns max |v| (f32 scalar) as a kernel
    by-product — the CFL driver, saving a whole-table reduction per substep.

    Sharded calls (parallel/sharded_sm.py) pass ``x_start`` (traced: global x
    cell of array column 0) and ``domain_dim`` (the GLOBAL grid dims, for the
    wall-clamp bounds) while ``sm`` holds the halo-extended local window."""
    x, y, z = sm.grid_dim
    zp = sm.zp
    bx, by = _pick_blocks(x, y, zp, sm.capacity)
    dt_arr = jnp.reshape(jnp.asarray(dt, jnp.float32), (1,))
    if x_start is not None:
        dt_arr = jnp.concatenate(
            [dt_arr, jnp.reshape(jnp.asarray(x_start, jnp.float32), (1,))]
        )
    vel_p = [_pad_z(v, zp) for v in vel_grids]
    gdim = domain_dim if domain_dim is not None else sm.grid_dim
    if solid_occupancy is None:
        zero = jnp.zeros((), jnp.float32)  # placeholder, not passed to the kernel
        posq, dyn, ms = _advect_call(
            sm.posq, dt_arr, *vel_p, zero, zero, zero, zero,
            grid_dim=gdim, bx=bx, by=by, interpret=interpret,
            with_solids=False,
        )
    else:
        occ_p = _pad_z(solid_occupancy, zp)
        sv_p = [_pad_z(solid_velocity[..., a], zp) for a in range(3)]
        posq, dyn, ms = _advect_call(
            sm.posq, dt_arr, *vel_p, occ_p, *sv_p,
            grid_dim=gdim, bx=bx, by=by, interpret=interpret,
            with_solids=True,
        )
    out = SlotMajorTable(posq=posq, dyn=dyn, lost=sm.lost, grid_dim=sm.grid_dim)
    if with_max_speed:
        return out, jnp.sqrt(jnp.max(ms)).astype(jnp.float32)
    return out


def correct_sm_pallas(
    sm: SlotMajorTable, change, marker, interpret: bool = False,
    x_start=None, domain_dim=None,
) -> SlotMajorTable:
    """Drop-in replacement for sm_phases.correct_slot_major.
    Caller must rebin(max_shift=1). ``x_start``/``domain_dim``: see
    advect_sm_pallas (sharded calls only)."""
    x, y, z = sm.grid_dim
    zp = sm.zp
    bx, by = _pick_blocks(x, y, zp, sm.capacity)
    change_p = [_pad_z(c, zp) for c in change]
    marker_f = _pad_z(marker.astype(jnp.float32), zp)
    sc_arr = None
    if x_start is not None:
        sc_arr = jnp.reshape(jnp.asarray(x_start, jnp.float32), (1,))
    posq = _correct_call(
        sm.posq, *change_p, marker_f,
        grid_dim=(domain_dim if domain_dim is not None else sm.grid_dim),
        bx=bx, by=by, interpret=interpret, sc_arr=sc_arr,
    )
    # dyn untouched: position correction moves particles only (the reference's
    # correct_particles.comp rewrites positions alone)
    return SlotMajorTable(posq=posq, dyn=sm.dyn, lost=sm.lost, grid_dim=sm.grid_dim)


# --- fused advect/correct + x-rebin-pack --------------------------------------
#
# The two rebins are the step's dominant cost (PERF.md round-3 roadmap #1:
# ~13 ms of a 24.5 ms dam step; ~98 ms of a ~208 ms highres substep). Each
# rebin is an x-stage and a fused y+z stage, each a full table HBM roundtrip.
# Advect and correct are PER-CELL maps of (posq, small grid windows) — so the
# x-stage pack can run inside them: compute the phase on an x-extended block
# (bx + 2s cells), then run pallas_rebin's pack core over the advected values
# still in VMEM. The x rebin stage's table read+write disappears; per-cell
# results are bit-identical to phase-then-_rebin_stage_x because the pack is
# a pure per-output-cell function of the (identically computed) candidate
# window. Cost: the halo cells' phase compute is done twice ((bx+2s)/bx
# amplification); the x-stage's full-table roundtrip was far larger.
#
# Reference analog: none — the reference rebins every 60 frames as a cache
# nicety (particle_binning*.comp); here binning is correctness-bearing. The
# fusion is the TPU answer to its absence of per-step binning cost.

from .pallas_rebin import (
    _pack_core,
    _ref_writers,
    _rowok,
    _window_parts,
    group_ranges,
)

# advect clamps bin movement to +-ADVECT_SHIFT (MAX_ADVECT_MOVE clamp);
# env-configurable for the wide-CFL experiment — single source of truth in
# sim/dense_advect.py so the kernel windows and the clamp always agree
from ..sim.dense_advect import ADVECT_SHIFT

CORRECT_SHIFT = 1  # correct clamps to +-1


def _pipelined_table_window(pairs, sems, i, j, *, s, bx, by, X, Y, gmask=None):
    """Double-buffered clamped x-halo table-window DMA (same scheme as
    pallas_rebin._pipelined_window): block n+1's window streams in while
    block n computes. Returns the window buffer slot for the current block.

    ``gmask`` (SMEM i32[ni, nj], see pallas_rebin.block_group_mask):
    occupancy-gated slot transport — upper slot groups with no valid particle
    anywhere in the window skip their DMA and zero-fill instead (bit-identical
    bytes; empty slots are exact zeros)."""
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    it = i * nj + j
    slot = jax.lax.rem(it, 2)
    k_in = pairs[0][1].shape[1]
    ranges = group_ranges(k_in) if gmask is not None else [(0, k_in, None)]
    npair = len(pairs)

    def group_copies(ii, jj, sl, gi):
        q0, q1, _ = ranges[gi]
        cs = []
        for n, (hbm, win) in enumerate(pairs):
            cs += _window_parts(
                hbm, win, sems, 3 * (npair * gi + n), 0, ii, jj, sl,
                s=s, bx=bx, by=by, X=X, Y=Y, q0=q0, q1=q1,
            )
        return cs

    def start_all(ii, jj, sl):
        for gi, (q0, q1, bit) in enumerate(ranges):
            cs = group_copies(ii, jj, sl, gi)
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
                for _, win in pairs:
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
        cs = group_copies(i, j, slot, gi)
        if bit is None:
            for c in cs:
                c.wait()
            continue
        on = jax.lax.shift_right_logical(gmask[i, j], bit) & 1

        @pl.when(on == 1)
        def _wait(cs=cs):
            for c in cs:
                c.wait()

    return slot


def _advect_pack_kernel(*refs, s, k_out, bx, by, X, Y, grid_dim, with_solids,
                        with_xs=False, with_gmask=False):
    gmask = None
    if with_gmask:
        gm_ref, *refs = refs
        gmask = gm_ref
    if with_solids:
        (dt_ref, posq_hbm, v0, v1, v2, occ, s0, s1, s2,
         outp_ref, outd_ref, ms_ref,
         twinp, wv0, wv1, wv2, wocc, ws0, ws1, ws2,
         aposq, adyn, tsems, gsems) = refs
        grids = ((v0, wv0, 1), (v1, wv1, 1), (v2, wv2, 1), (occ, wocc, 2),
                 (s0, ws0, 1), (s1, ws1, 1), (s2, ws2, 1))
    else:
        (dt_ref, posq_hbm, v0, v1, v2, outp_ref, outd_ref, ms_ref,
         twinp, wv0, wv1, wv2, aposq, adyn, tsems, gsems) = refs
        grids = ((v0, wv0, 1), (v1, wv1, 1), (v2, wv2, 1))
    i = pl.program_id(0)
    j = pl.program_id(1)
    dt = dt_ref[0]
    xs = dt_ref[1] if with_xs else None  # sharded frame origin, see _advect_block
    zp = twinp.shape[-1]
    k = twinp.shape[1]

    slot = _pipelined_table_window(
        ((posq_hbm, twinp),), tsems, i, j, s=s, bx=bx, by=by, X=X, Y=Y,
        gmask=gmask,
    )
    posq_win = twinp.at[slot]

    # air blocks (no particles anywhere in the extended window; clamped
    # duplicate rows only ever replicate empty border cells) skip everything
    has_particles = jnp.any(_valid_bits(posq_win) == 1)

    @pl.when(jnp.logical_not(has_particles))
    def _empty():
        outp_ref[...] = jnp.zeros((k_out, NUM_POSQ, bx, by, zp), jnp.float32)
        outd_ref[...] = jnp.zeros((k_out, NUM_DYN, bx, by, zp), jnp.float32)
        ms_ref[...] = jnp.zeros((8, 128), jnp.float32)

    @pl.when(has_particles)
    def _run():
        rowok = _rowok(0, i, j, (bx + 2 * s, by, zp), s=s, bx=bx, by=by, X=X, Y=Y)
        _advect_block(
            dt, posq_win, grids, aposq, adyn, ms_ref, gsems, i, j,
            bx=bx, by=by, X=X, Y=Y, grid_dim=grid_dim,
            with_solids=with_solids, xpad=s, rowok_b=rowok[0], xs=xs,
        )
        write_p, write_d, read_out_p, read_out_d = _ref_writers(outp_ref, outd_ref)
        _pack_core(
            aposq, adyn, write_p, write_d, read_out_p, read_out_d,
            axis=0, s=s, k_in=k, k_out=k_out, bx=bx, by=by, Zp=zp,
            dim_a=grid_dim[0],
            core=(slice(s, s + bx), slice(None), slice(None)),
            rowok=rowok, riota=None, gout_base=i * bx, x_off=xs,
        )


@functools.partial(
    jax.jit,
    static_argnames=("grid_dim", "s", "k_out", "bx", "by", "interpret", "with_solids"),
)
def _advect_pack_call(
    posq, dt_arr, v0, v1, v2, occ, s0, s1, s2,
    *, grid_dim, s, k_out, bx, by, interpret, with_solids,
):
    k, chp, x, y, zp = posq.shape
    bxe = bx + 2 * s
    from .pallas_rebin import block_group_mask, cell_group_any, group_ranges

    nranges = len(group_ranges(k))
    with_gmask = nranges > 1
    kernel = functools.partial(
        _advect_pack_kernel, s=s, k_out=k_out, bx=bx, by=by, X=x, Y=y,
        grid_dim=grid_dim, with_solids=with_solids,
        with_xs=dt_arr.shape[0] >= 2, with_gmask=with_gmask,
    )
    outp_spec = pl.BlockSpec(
        (k_out, NUM_POSQ, bx, by, zp), lambda i, j: (0, 0, i, j, 0),
        memory_space=pltpu.VMEM,
    )
    outd_spec = pl.BlockSpec(
        (k_out, NUM_DYN, bx, by, zp), lambda i, j: (0, 0, i, j, 0),
        memory_space=pltpu.VMEM,
    )
    ms_spec = pl.BlockSpec((8, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), any_spec, any_spec, any_spec, any_spec]
    inputs = [dt_arr, posq, v0, v1, v2]
    if with_gmask:
        # occupancy-gated table-window DMA (pallas_rebin.block_group_mask)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        inputs = [block_group_mask(cell_group_any(posq), bx, by, s, 0)] + inputs
    gscratch = [_grid_window_scratch(bx, by, zp, 1 + s) for _ in range(3)]
    ngrids = 3
    if with_solids:
        in_specs += [any_spec] * 4
        inputs += [occ, s0, s1, s2]
        gscratch += [
            _grid_window_scratch(bx, by, zp, 2 + s),
            _grid_window_scratch(bx, by, zp, 1 + s),
            _grid_window_scratch(bx, by, zp, 1 + s),
            _grid_window_scratch(bx, by, zp, 1 + s),
        ]
        ngrids = 7
    scratch = (
        [pltpu.VMEM((2, k, NUM_POSQ, bxe, by, zp), jnp.float32)]
        + gscratch
        + [
            pltpu.VMEM((k, NUM_POSQ, bxe, by, zp), jnp.float32),
            pltpu.VMEM((k, NUM_DYN, bxe, by, zp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3 * nranges)),
            pltpu.SemaphoreType.DMA((9 * ngrids,)),
        ]
    )
    return pl.pallas_call(
        kernel,
        grid=(x // bx, y // by),
        in_specs=in_specs,
        out_specs=[outp_spec, outd_spec, ms_spec],
        out_shape=[
            jax.ShapeDtypeStruct((k_out, NUM_POSQ, x, y, zp), jnp.float32),
            jax.ShapeDtypeStruct((k_out, NUM_DYN, x, y, zp), jnp.float32),
            jax.ShapeDtypeStruct((8 * (x // bx), 128 * (y // by)), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)


def _correct_pack_kernel(
    *refs, s, k_out, bx, by, X, Y, grid_dim, with_xs=False, with_gmask=False,
):
    gmask = None
    if with_gmask:
        gm_ref, *refs = refs
        gmask = gm_ref
    xs = None
    if with_xs:
        sc_ref, *refs = refs
        xs = sc_ref[0]
    (posq_hbm, dyn_hbm, c0, c1, c2, mk,
     outp_ref, outd_ref,
     twinp, twind, wc0, wc1, wc2, wmk, aposq, tsems, gsems) = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    zp = twinp.shape[-1]
    k = twinp.shape[1]

    slot = _pipelined_table_window(
        ((posq_hbm, twinp), (dyn_hbm, twind)), tsems, i, j,
        s=s, bx=bx, by=by, X=X, Y=Y, gmask=gmask,
    )
    posq_win = twinp.at[slot]
    dyn_win = twind.at[slot]

    has_particles = jnp.any(_valid_bits(posq_win) == 1)

    @pl.when(jnp.logical_not(has_particles))
    def _empty():
        outp_ref[...] = jnp.zeros((k_out, NUM_POSQ, bx, by, zp), jnp.float32)
        outd_ref[...] = jnp.zeros((k_out, NUM_DYN, bx, by, zp), jnp.float32)

    @pl.when(has_particles)
    def _run():
        _correct_block(
            posq_win, (c0, wc0), (c1, wc1), (c2, wc2), (mk, wmk), aposq,
            gsems, i, j, bx=bx, by=by, X=X, Y=Y, grid_dim=grid_dim, xpad=s,
            xs=xs,
        )
        rowok = _rowok(0, i, j, (bx + 2 * s, by, zp), s=s, bx=bx, by=by, X=X, Y=Y)
        write_p, write_d, read_out_p, read_out_d = _ref_writers(outp_ref, outd_ref)
        # dyn is untouched by correct (positions only), so the pack's payload
        # source for dyn is the PRE-correct window — same cells, same slots
        _pack_core(
            aposq, dyn_win, write_p, write_d, read_out_p, read_out_d,
            axis=0, s=s, k_in=k, k_out=k_out, bx=bx, by=by, Zp=zp,
            dim_a=grid_dim[0],
            core=(slice(s, s + bx), slice(None), slice(None)),
            rowok=rowok, riota=None, gout_base=i * bx, x_off=xs,
        )


@functools.partial(
    jax.jit, static_argnames=("grid_dim", "s", "k_out", "bx", "by", "interpret")
)
def _correct_pack_call(
    posq, dyn, c0, c1, c2, marker_f, *, grid_dim, s, k_out, bx, by, interpret,
    sc_arr=None,
):
    k, chp, x, y, zp = posq.shape
    bxe = bx + 2 * s
    with_xs = sc_arr is not None
    from .pallas_rebin import block_group_mask, cell_group_any, group_ranges

    nranges = len(group_ranges(k))
    with_gmask = nranges > 1
    kernel = functools.partial(
        _correct_pack_kernel, s=s, k_out=k_out, bx=bx, by=by, X=x, Y=y,
        grid_dim=grid_dim, with_xs=with_xs, with_gmask=with_gmask,
    )
    outp_spec = pl.BlockSpec(
        (k_out, NUM_POSQ, bx, by, zp), lambda i, j: (0, 0, i, j, 0),
        memory_space=pltpu.VMEM,
    )
    outd_spec = pl.BlockSpec(
        (k_out, NUM_DYN, bx, by, zp), lambda i, j: (0, 0, i, j, 0),
        memory_space=pltpu.VMEM,
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((2, k, NUM_POSQ, bxe, by, zp), jnp.float32),
        pltpu.VMEM((2, k, NUM_DYN, bxe, by, zp), jnp.float32),
    ]
    scratch += [_grid_window_scratch(bx, by, zp, 1 + s) for _ in range(4)]
    scratch += [
        pltpu.VMEM((k, NUM_POSQ, bxe, by, zp), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 6 * nranges)),
        pltpu.SemaphoreType.DMA((36,)),
    ]
    in_specs = [any_spec] * 6
    inputs = [posq, dyn, c0, c1, c2, marker_f]
    if with_xs:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        inputs = [sc_arr] + inputs
    if with_gmask:
        # occupancy-gated table-window DMA (pallas_rebin.block_group_mask)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        inputs = [block_group_mask(cell_group_any(posq), bx, by, s, 0)] + inputs
    return pl.pallas_call(
        kernel,
        grid=(x // bx, y // by),
        in_specs=in_specs,
        out_specs=[outp_spec, outd_spec],
        out_shape=[
            jax.ShapeDtypeStruct((k_out, NUM_POSQ, x, y, zp), jnp.float32),
            jax.ShapeDtypeStruct((k_out, NUM_DYN, x, y, zp), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)


def _pick_blocks_fused(x, y, zp, k, k_out, s, hx_max, budget_bytes=92 << 20):
    """(bx, by) for the fused phase+pack kernels. Constraints: the modular
    grid-window halo parts (width hx_max + s) must not straddle the x
    boundary (bx >= hx_max + s), and the VMEM live set — double-buffered
    posq window, phase output scratch, pipelined out blocks, ~48 K-shaped
    compute temps (see _LIVE_CH), pack flag/rank temps — must fit."""
    by = 8
    for bx in (8, 4):
        if x % bx or bx < hx_max + s or bx < s:
            continue
        bxe = bx + 2 * s
        live = (
            2 * k * NUM_POSQ * bxe
            + k * (NUM_POSQ + NUM_DYN) * bxe
            + 2 * k_out * (NUM_POSQ + NUM_DYN) * bx
            + 48 * k * bxe
            + 3 * k_out * bx
        )
        if live * by * zp * 4 <= budget_bytes:
            return bx, by
    return None


def fused_supports(grid_dim, capacity: int, k_out: int, with_solids: bool) -> bool:
    x, y, z = grid_dim
    if y % 8:
        return False
    zp = max(128, -(-z // 128) * 128)
    hx = 2 if with_solids else 1
    if _pick_blocks_fused(x, y, zp, capacity, k_out, ADVECT_SHIFT, hx) is None:
        return False
    return _pick_blocks_fused(x, y, zp, capacity, k_out, CORRECT_SHIFT, 1) is not None


def advect_pack_sm_pallas(
    sm: SlotMajorTable, vel_grids, solid_occupancy, solid_velocity, dt,
    k_out: int, interpret: bool = False, x_start=None, domain_dim=None,
):
    """Fused advect + x-rebin pack (capacity K in, ``k_out`` = K + slack out).
    Bit-identical to advect_sm_pallas followed by the s=2 x rebin stage;
    caller finishes the rebin with pallas_rebin.rebin_yz_slot_major.
    Returns (posq_mid, dyn_mid, max_speed). ``x_start``/``domain_dim``: see
    advect_sm_pallas (sharded calls only; the table must then carry an
    exchanged +-s x halo and outputs need the [s:s+local] core slice)."""
    x, y, z = sm.grid_dim
    zp = sm.zp
    with_solids = solid_occupancy is not None
    blocks = _pick_blocks_fused(
        x, y, zp, sm.capacity, k_out, ADVECT_SHIFT, 2 if with_solids else 1
    )
    assert blocks is not None, "caller must gate on fused_supports()"
    bx, by = blocks
    dt_arr = jnp.reshape(jnp.asarray(dt, jnp.float32), (1,))
    if x_start is not None:
        dt_arr = jnp.concatenate(
            [dt_arr, jnp.reshape(jnp.asarray(x_start, jnp.float32), (1,))]
        )
    gdim = domain_dim if domain_dim is not None else sm.grid_dim
    vel_p = [_pad_z(v, zp) for v in vel_grids]
    if not with_solids:
        zero = jnp.zeros((), jnp.float32)  # placeholder, not passed to the kernel
        posq, dyn, ms = _advect_pack_call(
            sm.posq, dt_arr, *vel_p, zero, zero, zero, zero,
            grid_dim=gdim, s=ADVECT_SHIFT, k_out=k_out, bx=bx, by=by,
            interpret=interpret, with_solids=False,
        )
    else:
        occ_p = _pad_z(solid_occupancy, zp)
        sv_p = [_pad_z(solid_velocity[..., a], zp) for a in range(3)]
        posq, dyn, ms = _advect_pack_call(
            sm.posq, dt_arr, *vel_p, occ_p, *sv_p,
            grid_dim=gdim, s=ADVECT_SHIFT, k_out=k_out, bx=bx, by=by,
            interpret=interpret, with_solids=True,
        )
    return posq, dyn, jnp.sqrt(jnp.max(ms)).astype(jnp.float32)


def correct_pack_sm_pallas(
    sm: SlotMajorTable, change, marker, k_out: int, interpret: bool = False,
    x_start=None, domain_dim=None,
):
    """Fused position-correct + x-rebin pack (s=1). Bit-identical to
    correct_sm_pallas followed by the s=1 x rebin stage. Returns
    (posq_mid, dyn_mid). ``x_start``/``domain_dim``: see
    advect_pack_sm_pallas (sharded calls only)."""
    x, y, z = sm.grid_dim
    zp = sm.zp
    blocks = _pick_blocks_fused(x, y, zp, sm.capacity, k_out, CORRECT_SHIFT, 1)
    assert blocks is not None, "caller must gate on fused_supports()"
    bx, by = blocks
    change_p = [_pad_z(c, zp) for c in change]
    marker_f = _pad_z(marker.astype(jnp.float32), zp)
    sc_arr = None
    if x_start is not None:
        sc_arr = jnp.reshape(jnp.asarray(x_start, jnp.float32), (1,))
    return _correct_pack_call(
        sm.posq, sm.dyn, *change_p, marker_f,
        grid_dim=(domain_dim if domain_dim is not None else sm.grid_dim),
        s=CORRECT_SHIFT, k_out=k_out, bx=bx, by=by,
        interpret=interpret, sc_arr=sc_arr,
    )
