"""Pack-on-read fused consumer kernels: the round-4 structural move that
removes both standalone rebin-yz table sweeps from the substep.

Round 3 ended with four table-sweeping kernels at 95% of device time
(PERF.md): advect+xpack and correct+xpack produce X-PACKED stage tables
(mid2 / mid1, capacity k_mid = K + slack, bin invariant along x only), and a
standalone fused y+z rebin stage re-bins each back to the K-slot table before
its consumers read it. But the consumers (P2G, the density gather, the
position correction) already hold x±1 / y-haloed VMEM windows of the table —
exactly the geometry the y+z pack needs. So each consumer packs ON READ:

  p2g_pack_read      mid1 (s=1) -> in-VMEM y-pack -> z-pack -> APIC gather
                     over the packed scratch, AND writes the packed K-slot
                     table as a by-product (advect consumes it unchanged).
                     Replaces rebin_yz(mid1) + p2g: one table read instead
                     of two.
  density_pack_read  mid2 (s=2) -> posq-ONLY y/z pack (density reads no
                     velocities; pack decisions are a pure function of posq)
                     -> density gather. No table write at all.
  correct_pack_read  mid2 (s=2) -> y/z pack -> position correction on the
                     packed core -> x-pack (s=1) -> mid1. Replaces
                     rebin_yz(mid2) + correct+xpack.

The carried state between substeps becomes mid1; the full bin invariant is
finalized once per FRAME (rebin_yz_slot_major) for renderer / checkpoint /
sharding consumers (sim/step_dense.py). Every pack here reuses
pallas_rebin._pack_core, so per-cell placement (overflow drops included) is
BIT-IDENTICAL to the standalone stages: density and correct re-derive the
same post-drop multiset independently (the pack is a pure per-cell function
of the candidate window), which keeps the whole fused step bit-exact vs the
unfused pipeline — pinned by tests/test_packread.py.

Window geometry: 9-part clamped double-buffered DMA exactly like
ops/pallas_p2g.py (x parts [1|bx|1], y parts [8|by|8], edge parts clamped
into bounds), occupancy-gated per slot group (pallas_rebin.block_group_mask).
The pack region extends past the core where a later phase needs packed
neighbors: (bx+2, by+2) for the gathers (dual bins at core±1), (bx+2, by)
for correct (x-pack candidates at core±1). Clamped duplicate window rows and
columns are excluded from the packs via the rowok mask (and `core_ok` for
the copy-through fast path); the gather's absolute-position bin check kills
them independently, as in pallas_p2g.

Reference analog: the binning pipeline this replaces
(/root/reference/shader/simulation/particle_binning*.comp +
src/simulation/hybrid_fluid.rs:854-894) — there binning is a perf nicety
every 60 steps; here it is correctness-bearing, so its cost had to be fused
away rather than amortized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sim.slot_major import (
    CH_VALID,
    NUM_DYN,
    NUM_POSQ,
    unpack_hi,
    unpack_lo,
)
from .pallas_advect import (
    CORRECT_SHIFT,
    _correct_block,
    _grid_window_scratch,
    _pad_z,
)
from .pallas_p2g import _OFFSETS
from .pallas_rebin import (
    _YH,
    _pack_core,
    _ref_writers,
    block_group_mask,
    cell_group_any,
    group_ranges,
)

_NCH = NUM_POSQ + NUM_DYN


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


# --- shared 9-part clamped window DMA (pallas_p2g layout) ---------------------


def _win9_parts(hbm, win, sems, sem0, ii, jj, sl, *, bx, by, X, Y, q0, q1):
    """One source's 9 clamped window parts for block (ii, jj) into buffer
    ``sl``: x parts [1 | bx | 1], y parts [8 | by | 8], edge parts clamped
    into bounds (the duplicate rows they produce are masked by _rowok9 /
    killed by the gather's bin check)."""
    qs = pl.ds(q0, q1 - q0)
    xa = jnp.clip(ii * bx - 1, 0, X - 1)
    xc = jnp.clip(ii * bx + bx, 0, X - 1)
    ya = jnp.clip(jj * by - _YH, 0, Y - _YH)
    yc = jnp.clip(jj * by + by, 0, Y - _YH)
    xparts = ((xa, 0, 1), (ii * bx, 1, bx), (xc, 1 + bx, 1))
    yparts = ((ya, 0, _YH), (jj * by, _YH, by), (yc, _YH + by, _YH))
    copies = []
    for n, (xs, xd, xn) in enumerate(xparts):
        for m, (ys, yd, yn) in enumerate(yparts):
            copies.append(
                pltpu.make_async_copy(
                    hbm.at[qs, :, pl.ds(xs, xn), pl.ds(ys, yn), :],
                    win.at[sl, qs, :, pl.ds(xd, xn), pl.ds(yd, yn), :],
                    sems.at[sl, sem0 + n * 3 + m],
                )
            )
    return copies


def _pipelined_window9(srcs, sems, gmask, *, bx, by, X, Y):
    """Double-buffered, occupancy-gated window acquisition; same scheme as
    pallas_p2g._kernel. ``srcs``: ((hbm, win[2, k, ch, bx+2, by+16, Zp]), ...).
    Returns the current block's window views."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    it = i * nj + j
    slot = jax.lax.rem(it, 2)
    k_slots = srcs[0][1].shape[1]
    ranges = group_ranges(k_slots) if gmask is not None else [(0, k_slots, None)]
    nsrc = len(srcs)

    def group_copies(ii, jj, sl, gi):
        q0, q1, _ = ranges[gi]
        cs = []
        for t, (hbm, win) in enumerate(srcs):
            cs += _win9_parts(
                hbm, win, sems, 9 * (nsrc * gi + t), ii, jj, sl,
                bx=bx, by=by, X=X, Y=Y, q0=q0, q1=q1,
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
                for _, win in srcs:
                    wv = win.at[sl]
                    wv[q0:q1] = jnp.zeros((q1 - q0,) + win.shape[2:], jnp.float32)

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

    return [win.at[slot] for _, win in srcs]


def _rowok9(i, j, wshape, *, bx, by, X, Y):
    """(ok, actual_y f32) over the 9-part window shape (bx+2, by+16, Zp):
    ok is False exactly on the clamped duplicate rows/columns (both axes
    folded — _pack_core's flags need one mask), actual_y is the y coordinate
    each window row really holds (the y-pack's mover check compares targets
    against it)."""
    xio = jax.lax.broadcasted_iota(jnp.int32, wshape, 0)
    yio = jax.lax.broadcasted_iota(jnp.int32, wshape, 1)
    xa = jnp.clip(i * bx - 1, 0, X - 1)
    xc = jnp.clip(i * bx + bx, 0, X - 1)
    x_actual = jnp.where(
        xio < 1, xa + xio, jnp.where(xio < 1 + bx, i * bx + xio - 1, xc + xio - 1 - bx)
    )
    x_expected = i * bx - 1 + xio
    ya = jnp.clip(j * by - _YH, 0, Y - _YH)
    yc = jnp.clip(j * by + by, 0, Y - _YH)
    y_actual = jnp.where(
        yio < _YH,
        ya + yio,
        jnp.where(yio < _YH + by, j * by + yio - _YH, yc + yio - _YH - by),
    )
    y_expected = j * by - _YH + yio
    ok = (x_actual == x_expected) & (y_actual == y_expected)
    return ok, y_actual.astype(jnp.float32)


# --- the fused yz-pack (shared by all three consumers) ------------------------


def _yz_pack(
    winp, wind, rowok9, midp, midd, pkp, pkd, i, j,
    *, s, k_out, bx, by, byr, y0off, Zp, X, Y, Z,
):
    """y-pack (s sources, k->k) then z-pack (k->k_out) of the window into the
    ``pk`` scratch, over the region (bx+2, byr) whose y rows start at window
    row _YH - y0off (byr = by + 2*y0off; y0off=1 for the gathers' core±1,
    0 for correct's core-only region). Bit-identical per cell to
    pallas_rebin._stage_yz_kernel's two packs (same _pack_core)."""
    k = winp.shape[0]
    rowok_b, actual_y = rowok9
    a0 = _YH - y0off
    wx = bx + 2
    # copy-through must zero the region's out-of-domain / clamped-duplicate
    # cells; build the mask directly on the region shape (never slice an
    # iota-derived array — Mosaic vector-layout trap, PERF.md round 2)
    xio = jax.lax.broadcasted_iota(jnp.int32, (wx, byr, Zp), 0)
    yio = jax.lax.broadcasted_iota(jnp.int32, (wx, byr, Zp), 1)
    gx = i * bx - 1 + xio
    gy = j * by - y0off + yio
    core_ok = (gx >= 0) & (gx < X) & (gy >= 0) & (gy < Y)

    mw_p, mw_d, m_read = _ref_writers(midp, midd)
    if wind is None:
        midd_in = None
    else:
        midd_in = wind
    _pack_core(
        winp, midd_in, mw_p, mw_d, m_read,
        axis=1, s=s, k_in=k, k_out=k, bx=wx, by=byr, Zp=Zp, dim_a=Y,
        core=(slice(None), slice(a0, a0 + byr), slice(None)),
        rowok=(rowok_b, actual_y), riota=None, gout_base=j * by - y0off,
        a0=a0, core_ok=core_ok,
    )

    pw_p, pw_d, p_read = _ref_writers(pkp, pkd)
    riota = jax.lax.broadcasted_iota(jnp.int32, (wx, byr, Zp), 2)
    _pack_core(
        midp, None if wind is None else midd, pw_p, pw_d, p_read,
        axis=2, s=s, k_in=k, k_out=k_out, bx=wx, by=byr, Zp=Zp, dim_a=Z,
        core=(slice(None), slice(None), slice(None)),
        rowok=None, riota=riota, gout_base=0,
    )


# --- the APIC / density gather over the packed scratch ------------------------


def _gather_accumulate(pkp, pkd, out_ref, i, j, *, bx, by, z, density_only):
    """Port of pallas_p2g._kernel's accumulation loop reading the packed
    region scratch (core at offset (1, 1)) instead of the haloed table
    window. Identical math, identical absolute-position bin checks (which
    also kill the clamped-duplicate region cells and z-roll wraps), so the
    accumulators are bit-equal to pallas_p2g on the same particle multiset."""
    k_slots = pkp.shape[0]
    n_out = 2 if density_only else 7

    gx = (i * bx + jax.lax.broadcasted_iota(jnp.int32, (bx, by, z), 0)).astype(
        jnp.float32
    )
    gy = (j * by + jax.lax.broadcasted_iota(jnp.int32, (bx, by, z), 1)).astype(
        jnp.float32
    )
    gz = jax.lax.broadcasted_iota(jnp.int32, (bx, by, z), 2).astype(jnp.float32)

    offsets = (
        tuple(o for o in _OFFSETS if all(v <= 0 for v in o))
        if density_only
        else _OFFSETS
    )

    def _accumulate_group(g0, g1):
        acc = [jnp.zeros((bx, by, z), jnp.float32) for _ in range(n_out)]
        for off in offsets:
            ox, oy, oz = off

            def slabify(win, o=off):
                s_ = win[g0:g1, :, 1 + o[0] : 1 + o[0] + bx, 1 + o[1] : 1 + o[1] + by, :]
                if o[2] != 0:
                    s_ = jnp.roll(s_, -o[2], axis=4)
                return s_

            slabp = slabify(pkp)
            p0 = slabp[:, 0]
            p1 = slabp[:, 1]
            p2 = slabp[:, 2]
            valid = (
                slabp[:, 3]
                * (jnp.floor(p0 - 0.5) == gx[None] + ox)
                * (jnp.floor(p1 - 0.5) == gy[None] + oy)
                * (jnp.floor(p2 - 0.5) == gz[None] + oz)
            )

            dx5 = gx[None] + 0.5 - p0
            dy5 = gy[None] + 0.5 - p1
            dz5 = gz[None] + 0.5 - p2
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
                    fx1 * (fy5 * fz5) * valid,
                    fx5 * (fy1 * fz5) * valid,
                    (fx5 * fy5) * fz1 * valid,
                )
                slabd = slabify(pkd)
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
            else:
                acc[0] = acc[0] + jnp.sum(fx5 * fy5 * fz5 * valid, axis=0)

            if all(v <= 0 for v in off):
                prim = (
                    valid
                    * (jnp.floor(p0) == gx[None])
                    * (jnp.floor(p1) == gy[None])
                    * (jnp.floor(p2) == gz[None])
                )
                acc[-1] = acc[-1] + jnp.sum(prim, axis=0)

        for q in range(n_out):
            out_ref[q] = out_ref[q] + acc[q]

    for q in range(n_out):
        out_ref[q] = jnp.zeros((bx, by, z), jnp.float32)
    for g0 in range(0, k_slots, 4):
        g1 = min(g0 + 4, k_slots)
        vg = jnp.any(pkp[g0:g1, CH_VALID] > 0.5)

        @pl.when(vg)
        def _group(g0=g0, g1=g1):
            _accumulate_group(g0, g1)


# --- fused P2G / density kernels ----------------------------------------------


def _consume_kernel(
    *refs, s, k_out, bx, by, X, Y, Z, density_only, with_table, with_gmask,
):
    gmask = None
    if with_gmask:
        gmask, *refs = refs
    if density_only:
        posq_hbm, acc_ref, winp, midp, pkp, sems = refs
        wind = midd = pkd = None
        outp_ref = outd_ref = cnt_ref = None
        srcs = ((posq_hbm, winp),)
    else:
        (posq_hbm, dyn_hbm, acc_ref, outp_ref, outd_ref, cnt_ref,
         winp, wind, midp, midd, pkp, pkd, sems) = refs
        srcs = ((posq_hbm, winp), (dyn_hbm, wind))
    i = pl.program_id(0)
    j = pl.program_id(1)
    zp = winp.shape[-1]
    n_out = 2 if density_only else 7
    byr = by + 2

    wins = _pipelined_window9(srcs, sems, gmask, bx=bx, by=by, X=X, Y=Y)
    winp_v = wins[0]
    wind_v = wins[1] if not density_only else None

    has_particles = jnp.any(winp_v[:, CH_VALID] > 0.5)

    @pl.when(jnp.logical_not(has_particles))
    def _empty():
        acc_ref[...] = jnp.zeros((n_out, bx, by, zp), jnp.float32)
        if with_table:
            outp_ref[...] = jnp.zeros((k_out, NUM_POSQ, bx, by, zp), jnp.float32)
            outd_ref[...] = jnp.zeros((k_out, NUM_DYN, bx, by, zp), jnp.float32)
            cnt_ref[...] = jnp.zeros((8, 128), jnp.float32)

    @pl.when(has_particles)
    def _run():
        rowok = _rowok9(i, j, winp_v.shape[2:], bx=bx, by=by, X=X, Y=Y)
        _yz_pack(
            winp_v, wind_v, rowok, midp, midd, pkp, pkd, i, j,
            s=s, k_out=k_out, bx=bx, by=by, byr=byr, y0off=1, Zp=zp,
            X=X, Y=Y, Z=Z,
        )
        _gather_accumulate(
            pkp, pkd, acc_ref, i, j, bx=bx, by=by, z=zp, density_only=density_only
        )
        if with_table:
            # by-product: the packed K-slot table core — bit-identical to
            # rebin_yz_slot_major's output for this block
            outp_ref[...] = pkp[:, :, 1 : 1 + bx, 1 : 1 + by, :]
            outd_ref[...] = pkd[:, :, 1 : 1 + bx, 1 : 1 + by, :]
            cnt = jnp.zeros((), jnp.float32)
            for q in range(k_out):
                cnt = cnt + jnp.sum(pkp[q, CH_VALID, 1 : 1 + bx, 1 : 1 + by, :])
            ii = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            cnt_ref[...] = jnp.where((ii == 0) & (jj == 0), cnt, 0.0)


def _amp_sorted_blocks(X, Y):
    """Candidate (bx, by) pairs sorted by window read amplification
    ((bx+2)/bx)*((by+16)/by) — smallest first."""
    cands = [
        (bx, by)
        for by in (64, 32, 16, 8)
        for bx in (16, 8, 4, 2)
        if Y % by == 0 and X % bx == 0
    ]
    return sorted(cands, key=lambda p: ((p[0] + 2) / p[0]) * ((p[1] + 16) / p[1]))


_BUDGET = 80 << 20  # pack/gather temps ride on top within the 100MB vmem limit


def _pick_blocks_consume(X, Y, Zp, k_in, k_out, density_only, with_table):
    nch = NUM_POSQ if density_only else _NCH
    n_out = 2 if density_only else 7
    for bx, by in _amp_sorted_blocks(X, Y):
        wx = bx + 2
        byr8 = _pad8(by + 2)
        win = 2 * k_in * nch * wx * (by + 2 * _YH) * Zp * 4
        mid = k_in * nch * wx * byr8 * Zp * 4
        pk = k_out * nch * wx * byr8 * Zp * 4
        outs = 2 * n_out * bx * by * Zp * 4
        if with_table:
            outs += 2 * k_out * _NCH * bx * by * Zp * 4
        if win + mid + pk + outs <= _BUDGET:
            return bx, by
    return None


@functools.partial(
    jax.jit,
    static_argnames=("grid_dim", "s", "k_out", "bx", "by", "interpret", "density_only"),
)
def _consume_call(
    posq, dyn, *, grid_dim, s, k_out, bx, by, interpret, density_only,
):
    k, chp, x, y, zp = posq.shape
    assert chp == NUM_POSQ
    X, Y, Z = grid_dim
    nranges = len(group_ranges(k))
    with_gmask = nranges > 1
    with_table = not density_only
    n_out = 2 if density_only else 7
    kernel = functools.partial(
        _consume_kernel, s=s, k_out=k_out, bx=bx, by=by, X=x, Y=y, Z=Z,
        density_only=density_only, with_table=with_table, with_gmask=with_gmask,
    )
    byr = by + 2
    wx = bx + 2
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = []
    inputs = []
    if with_gmask:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(block_group_mask(cell_group_any(posq), bx, by, 1, _YH))
    in_specs.append(any_spec)
    inputs.append(posq)
    nsrc = 1
    if not density_only:
        in_specs.append(any_spec)
        inputs.append(dyn)
        nsrc = 2
    acc_spec = pl.BlockSpec(
        (n_out, bx, by, zp), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM
    )
    out_specs = [acc_spec]
    out_shape = [jax.ShapeDtypeStruct((n_out, x, y, zp), jnp.float32)]
    if with_table:
        out_specs += [
            pl.BlockSpec(
                (k_out, NUM_POSQ, bx, by, zp), lambda i, j: (0, 0, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k_out, NUM_DYN, bx, by, zp), lambda i, j: (0, 0, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((8, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((k_out, NUM_POSQ, x, y, zp), jnp.float32),
            jax.ShapeDtypeStruct((k_out, NUM_DYN, x, y, zp), jnp.float32),
            jax.ShapeDtypeStruct((8 * (x // bx), 128 * (y // by)), jnp.float32),
        ]
    scratch = [pltpu.VMEM((2, k, NUM_POSQ, wx, by + 2 * _YH, zp), jnp.float32)]
    if not density_only:
        scratch.append(pltpu.VMEM((2, k, NUM_DYN, wx, by + 2 * _YH, zp), jnp.float32))
    scratch.append(pltpu.VMEM((k, NUM_POSQ, wx, byr, zp), jnp.float32))
    if not density_only:
        scratch.append(pltpu.VMEM((k, NUM_DYN, wx, byr, zp), jnp.float32))
    scratch.append(pltpu.VMEM((k_out, NUM_POSQ, wx, byr, zp), jnp.float32))
    if not density_only:
        scratch.append(pltpu.VMEM((k_out, NUM_DYN, wx, byr, zp), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2, 9 * nsrc * nranges)))
    return pl.pallas_call(
        kernel,
        grid=(x // bx, y // by),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)


def supports_consume(grid_dim, k_in: int, k_out: int, density_only: bool) -> bool:
    X, Y, Z = grid_dim
    if Y % 8:
        return False
    zp = max(128, -(-Z // 128) * 128)
    return (
        _pick_blocks_consume(X, Y, zp, k_in, k_out, density_only, not density_only)
        is not None
    )


def p2g_pack_read(
    posq_mid, dyn_mid, grid_dim, *, s: int, k_out: int, interpret: bool = False,
):
    """Fused rebin_yz + P2G: consumes an x-packed mid stage (bin invariant
    along x only, y/z off by <= s), returns
    (acc f32[7, X, Y, Z], table SlotMajorTable-arrays (posq, dyn), cnt f32[...])
    where acc matches pallas_p2g.p2g_raw_accumulators(with_density=False) on
    rebin_yz(mid) bit-exactly, and (posq, dyn) match rebin_yz(mid) itself.
    ``cnt``: per-block survivor-count tiles (sum -> table particle count)."""
    X, Y, Z = grid_dim
    zp = posq_mid.shape[-1]
    k = posq_mid.shape[0]
    blocks = _pick_blocks_consume(X, Y, zp, k, k_out, False, True)
    assert blocks is not None, "caller must gate on supports_consume()"
    bx, by = blocks
    acc, posq, dyn, cnt = _consume_call(
        posq_mid, dyn_mid, grid_dim=grid_dim, s=s, k_out=k_out,
        bx=bx, by=by, interpret=interpret, density_only=False,
    )
    return acc[..., :Z], posq, dyn, cnt


def density_pack_read(
    posq_mid, grid_dim, *, s: int, k_out: int, interpret: bool = False,
):
    """Fused rebin_yz + density gather, positions-only: returns
    (density f32[X, Y, Z], fluid_count f32[X, Y, Z]) matching
    pallas_p2g.p2g_density_pallas(with_fluid=True) on rebin_yz(mid)
    bit-exactly (the posq-only pack makes identical decisions; overflow
    drops are re-derived identically, so the density sees exactly the
    post-drop multiset the later correct pass persists)."""
    X, Y, Z = grid_dim
    zp = posq_mid.shape[-1]
    k = posq_mid.shape[0]
    blocks = _pick_blocks_consume(X, Y, zp, k, k_out, True, False)
    assert blocks is not None, "caller must gate on supports_consume()"
    bx, by = blocks
    acc = _consume_call(
        posq_mid, None, grid_dim=grid_dim, s=s, k_out=k_out,
        bx=bx, by=by, interpret=interpret, density_only=True,
    )[0]
    return acc[0, :, :, :Z], acc[1, :, :, :Z]


# --- fused correct ------------------------------------------------------------


def _correct_pack_kernel(
    *refs, s_in, k_out, bx, by, X, Y, grid_dim, with_gmask,
):
    gmask = None
    if with_gmask:
        gmask, *refs = refs
    (posq_hbm, dyn_hbm, c0, c1, c2, mk,
     outp_ref, outd_ref, cnt_ref,
     winp, wind, midp, midd, pkp, pkd, aposq,
     wc0, wc1, wc2, wmk, tsems, gsems) = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    zp = winp.shape[-1]
    k = winp.shape[1]
    kk = pkp.shape[0]

    wins = _pipelined_window9(
        ((posq_hbm, winp), (dyn_hbm, wind)), tsems, gmask, bx=bx, by=by, X=X, Y=Y
    )
    winp_v, wind_v = wins

    has_particles = jnp.any(winp_v[:, CH_VALID] > 0.5)

    @pl.when(jnp.logical_not(has_particles))
    def _empty():
        outp_ref[...] = jnp.zeros((k_out, NUM_POSQ, bx, by, zp), jnp.float32)
        outd_ref[...] = jnp.zeros((k_out, NUM_DYN, bx, by, zp), jnp.float32)
        cnt_ref[...] = jnp.zeros((8, 128), jnp.float32)

    @pl.when(has_particles)
    def _run():
        rowok = _rowok9(i, j, winp_v.shape[2:], bx=bx, by=by, X=X, Y=Y)
        # yz-pack over (bx+2, by): the correct phase and its x-pack need
        # packed cells at core x±1 only (x-pack candidates); no y extension
        _yz_pack(
            winp_v, wind_v, rowok, midp, midd, pkp, pkd, i, j,
            s=s_in, k_out=kk, bx=bx, by=by, byr=by, y0off=0, Zp=zp,
            X=X, Y=Y, Z=grid_dim[2],
        )
        # position correction on the packed core±1 (identical math/windows to
        # pallas_advect._correct_pack_kernel's xpad=1 path)
        _correct_block(
            pkp, (c0, wc0), (c1, wc1), (c2, wc2), (mk, wmk), aposq,
            gsems, i, j, bx=bx, by=by, X=X, Y=Y, grid_dim=grid_dim,
            xpad=CORRECT_SHIFT,
        )
        # x-pack s=1 -> mid1; dyn payload is the (position-only) packed dyn.
        # NO rowok here: the standalone x stage masks clamped duplicate window
        # columns with _rowok, but _rowok(axis=0)'s mask is constant along y,
        # so Mosaic gives it a sublane-REPLICATED layout and _pack_core's slab
        # slice then requests by/8 sublane tiles against 1 — a compiler crash
        # (`Check failed: limits[i] <= dim(i) (by/8 vs. 1)`) for every by > 8.
        # Here the mask is unnecessary anyway: _yz_pack already leaves the
        # domain-edge duplicate columns EMPTY (rowok9 excludes them as pack
        # candidates; core_ok zeroes them on copy-through), and _correct_block
        # never revives invalid cells — so wvalid alone excludes them. Only
        # actual_x (window column coordinates, used UNSLICED) is supplied.
        xio = jax.lax.broadcasted_iota(jnp.int32, (bx + 2, by, zp), 0)
        actual_x = (i * bx - 1 + xio).astype(jnp.float32)
        w_p, w_d, r_d = _ref_writers(outp_ref, outd_ref)
        _pack_core(
            aposq, pkd, w_p, w_d, r_d,
            axis=0, s=CORRECT_SHIFT, k_in=kk, k_out=k_out, bx=bx, by=by, Zp=zp,
            dim_a=grid_dim[0],
            core=(slice(1, 1 + bx), slice(None), slice(None)),
            rowok=(None, actual_x),
            riota=None, gout_base=i * bx,
        )
        cnt = jnp.zeros((), jnp.float32)
        for q in range(k_out):
            cnt = cnt + jnp.sum(outp_ref[q, CH_VALID])
        ii = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        cnt_ref[...] = jnp.where((ii == 0) & (jj == 0), cnt, 0.0)


def _pick_blocks_correct(X, Y, Zp, k_in, k_pk, k_out):
    for bx, by in _amp_sorted_blocks(X, Y):
        wx = bx + 2
        win = 2 * k_in * _NCH * wx * (by + 2 * _YH) * Zp * 4
        mid = k_in * _NCH * wx * by * Zp * 4
        pk = k_pk * _NCH * wx * by * Zp * 4
        apos = k_pk * NUM_POSQ * wx * by * Zp * 4
        outs = 2 * k_out * _NCH * bx * by * Zp * 4
        grids = 4 * (bx + 4) * (by + 2 * _YH) * Zp * 4
        if win + mid + pk + apos + outs + grids <= _BUDGET:
            return bx, by
    return None


@functools.partial(
    jax.jit,
    static_argnames=("grid_dim", "s_in", "k_pk", "k_out", "bx", "by", "interpret"),
)
def _correct_pack_read_call(
    posq, dyn, c0, c1, c2, marker_f,
    *, grid_dim, s_in, k_pk, k_out, bx, by, interpret,
):
    k, chp, x, y, zp = posq.shape
    nranges = len(group_ranges(k))
    with_gmask = nranges > 1
    kernel = functools.partial(
        _correct_pack_kernel, s_in=s_in, k_out=k_out, bx=bx, by=by, X=x, Y=y,
        grid_dim=grid_dim, with_gmask=with_gmask,
    )
    wx = bx + 2
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = []
    inputs = []
    if with_gmask:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(block_group_mask(cell_group_any(posq), bx, by, 1, _YH))
    in_specs += [any_spec] * 6
    inputs += [posq, dyn, c0, c1, c2, marker_f]
    out_specs = [
        pl.BlockSpec(
            (k_out, NUM_POSQ, bx, by, zp), lambda i, j: (0, 0, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (k_out, NUM_DYN, bx, by, zp), lambda i, j: (0, 0, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((8, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((k_out, NUM_POSQ, x, y, zp), jnp.float32),
        jax.ShapeDtypeStruct((k_out, NUM_DYN, x, y, zp), jnp.float32),
        jax.ShapeDtypeStruct((8 * (x // bx), 128 * (y // by)), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((2, k, NUM_POSQ, wx, by + 2 * _YH, zp), jnp.float32),
        pltpu.VMEM((2, k, NUM_DYN, wx, by + 2 * _YH, zp), jnp.float32),
        pltpu.VMEM((k, NUM_POSQ, wx, by, zp), jnp.float32),
        pltpu.VMEM((k, NUM_DYN, wx, by, zp), jnp.float32),
        pltpu.VMEM((k_pk, NUM_POSQ, wx, by, zp), jnp.float32),
        pltpu.VMEM((k_pk, NUM_DYN, wx, by, zp), jnp.float32),
        pltpu.VMEM((k_pk, NUM_POSQ, wx, by, zp), jnp.float32),
        _grid_window_scratch(bx, by, zp, 1 + CORRECT_SHIFT),
        _grid_window_scratch(bx, by, zp, 1 + CORRECT_SHIFT),
        _grid_window_scratch(bx, by, zp, 1 + CORRECT_SHIFT),
        _grid_window_scratch(bx, by, zp, 1 + CORRECT_SHIFT),
        pltpu.SemaphoreType.DMA((2, 9 * 2 * nranges)),
        pltpu.SemaphoreType.DMA((36,)),
    ]
    return pl.pallas_call(
        kernel,
        grid=(x // bx, y // by),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)


def supports_correct(grid_dim, k_in: int, k_pk: int, k_out: int) -> bool:
    X, Y, Z = grid_dim
    if Y % 8:
        return False
    zp = max(128, -(-Z // 128) * 128)
    return _pick_blocks_correct(X, Y, zp, k_in, k_pk, k_out) is not None


def correct_pack_read(
    posq_mid, dyn_mid, change, marker, grid_dim, *, s_in: int, k_pk: int,
    k_out: int, interpret: bool = False,
):
    """Fused rebin_yz + position-correct + x-pack: consumes the x-packed mid2
    stage (y/z off by <= s_in), packs it in VMEM (k -> k -> k_pk, the table
    capacity), runs the density position correction on the packed core, and
    x-packs the result (s=1) to a k_out(=k_mid)-slot mid1 stage. Returns
    (posq_mid1, dyn_mid1, cnt). Bit-identical to
    rebin_yz_slot_major(mid2) -> correct_pack_sm_pallas."""
    X, Y, Z = grid_dim
    zp = posq_mid.shape[-1]
    k = posq_mid.shape[0]
    blocks = _pick_blocks_correct(X, Y, zp, k, k_pk, k_out)
    assert blocks is not None, "caller must gate on supports_correct()"
    bx, by = blocks
    change_p = [_pad_z(c, zp) for c in change]
    marker_f = _pad_z(marker.astype(jnp.float32), zp)
    return _correct_pack_read_call(
        posq_mid, dyn_mid, *change_p, marker_f,
        grid_dim=grid_dim, s_in=s_in, k_pk=k_pk, k_out=k_out,
        bx=bx, by=by, interpret=interpret,
    )
