"""Pallas fused grid-correction kernels: pressure-gradient velocity fix (or
density position-change field) immediately followed by velocity extrapolation,
in one VMEM pass.

The XLA oracles run these as separate passes with ~50 shifted reads
(sim/divergence.py::remove_divergence + sim/extrapolate.py, and
sim/density.py::position_change_field + extrapolate) — each shift a
materialized HBM copy. Here one block computes the corrected face velocities
on its core plus a 1-cell ring, then averages the 8 in-plane neighbors for
non-fluid faces (extrapolate_velocity.comp's rule) without leaving VMEM.

Math is the oracles' exactly, including the zero-fill shift semantics
(gridops.shift): windows are modular (wrap-around DMA parts), and global
coordinate masks zero any out-of-domain read — note an out-of-range marker
reads 0 == CELL_SOLID, the reference's own boundary trick
(hybrid_fluid.glsl:21-24), which the masks reproduce.

Reference: divergence_remove.comp:1-49, extrapolate_velocity.comp:1-89,
density_projection_position_change.comp:1-50.
"""

from __future__ import annotations

import functools
from itertools import product

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import CELL_FLUID, CELL_SOLID

_YH = 8  # y halo part size (sublane alignment)
_HX = 2  # x halo (1 ring for extrapolate + 1 stencil reach)


def _window_copies(g_hbm, win, sems, sem0, i, j, *, bx, by, X, Y):
    """9-part cyclic window DMA, halo _HX in x and _YH in y."""
    xparts = (
        ((i * bx - _HX) % X, 0, _HX),
        (i * bx, _HX, bx),
        ((i * bx + bx) % X, _HX + bx, _HX),
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


def _gcoords(i, j, ext):
    """Global (x, y, z) i32 coords of the EXTENDED region [bx+2, by+2, Zp]
    whose origin is core-(1,1,0)."""
    gx = i + jax.lax.broadcasted_iota(jnp.int32, ext, 0) - 1
    gy = j + jax.lax.broadcasted_iota(jnp.int32, ext, 1) - 1
    gz = jax.lax.broadcasted_iota(jnp.int32, ext, 2)
    return gx, gy, gz


def _kernel(*refs, mode, with_solids, bx, by, X, Y, Z, Zp, dt_is_input):
    """mode: "remove" (velocity -= grad p, solid faces take solid velocity)
    or "change" (position-change field = dt * forward pressure difference).
    Outputs the three extrapolated face-velocity grids."""
    idx = 0
    if dt_is_input:
        dt_ref = refs[idx]
        idx += 1
    marker_h = refs[idx]; p_h = refs[idx + 1]; idx += 2
    if mode == "remove":
        v_h = refs[idx : idx + 3]; idx += 3
    if with_solids:
        sv_h = refs[idx : idx + 3]; idx += 3
    outs = refs[idx : idx + 3]; idx += 3
    wmk = refs[idx]; wp = refs[idx + 1]; idx += 2
    if mode == "remove":
        wv = refs[idx : idx + 3]; idx += 3
    if with_solids:
        wsv = refs[idx : idx + 3]; idx += 3
    sems = refs[idx]

    i = pl.program_id(0) * bx
    j = pl.program_id(1) * by

    srcs = [(marker_h, wmk), (p_h, wp)]
    if mode == "remove":
        srcs += list(zip(v_h, wv))
    if with_solids:
        srcs += list(zip(sv_h, wsv))
    copies = []
    for n, (g, w) in enumerate(srcs):
        copies += _window_copies(
            g, w, sems, 9 * n, pl.program_id(0), pl.program_id(1),
            bx=bx, by=by, X=X, Y=Y,
        )
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    ext = (bx + 2, by + 2, Zp)
    gx, gy, gz = _gcoords(i, j, ext)

    def loadwin(win):
        # full-window VALUE load: subsequent slices are vector ops, free of
        # Mosaic's 8-aligned sublane REF-slice rule
        return win[...]

    def read(w, ox, oy, oz):
        """window VALUE at extended-region cell + (ox,oy,oz), zero-filled
        outside the domain (gridops.shift semantics); offsets static."""
        s = jax.lax.slice(
            w,
            (_HX - 1 + ox, _YH - 1 + oy, 0),
            (_HX - 1 + ox + bx + 2, _YH - 1 + oy + by + 2, Zp),
        )
        if oz:
            s = jnp.roll(s, -oz, axis=2)
        okx = (gx + ox >= 0) & (gx + ox < X)
        oky = (gy + oy >= 0) & (gy + oy < Y)
        okz = (gz + oz >= 0) & (gz + oz < Z)
        return jnp.where(okx & oky & okz, s, 0.0)

    dt = dt_ref[0] if dt_is_input else None
    wmk_v = loadwin(wmk)
    wp_v = loadwin(wp)
    mk0 = read(wmk_v, 0, 0, 0)
    fluid0 = mk0 == float(CELL_FLUID)
    pf0 = jnp.where(fluid0, read(wp_v, 0, 0, 0), 0.0)

    base = []  # corrected face velocity per component, on the extended region
    validf = []  # face has an adjacent fluid cell
    for c in range(3):
        e = [0, 0, 0]
        e[c] = 1
        mk1 = read(wmk_v, *e)
        fluid1 = mk1 == float(CELL_FLUID)
        pf1 = jnp.where(fluid1, read(wp_v, *e), 0.0)
        if mode == "remove":
            v = read(loadwin(wv[c]), 0, 0, 0)
            corrected = v - (pf0 - jnp.where(fluid1, pf1, 0.0))
            if with_solids:
                wsv_v = loadwin(wsv[c])
                sv0 = read(wsv_v, 0, 0, 0)
                sv1 = read(wsv_v, *e)
            else:
                sv0 = jnp.zeros(ext, jnp.float32)
                sv1 = jnp.zeros(ext, jnp.float32)
            out = jnp.where(
                mk0 == float(CELL_SOLID),
                sv0,
                jnp.where(mk1 == float(CELL_SOLID), sv1, corrected),
            )
            out = jnp.where(fluid0 | fluid1, out, 0.0)
        else:
            change = (jnp.where(fluid1, pf1, 0.0) - pf0) * dt
            solid_face = (mk0 == float(CELL_SOLID)) | (mk1 == float(CELL_SOLID))
            out = jnp.where(solid_face, 0.0, change)
        base.append(out)
        # f32 validity flags: Mosaic can't roll/concat i1 vregs
        validf.append((fluid0 | fluid1).astype(jnp.float32))

    # extrapolation on the core (extrapolate_velocity.comp): non-fluid faces
    # take the average of valid faces among the 8 in-plane neighbors.
    # Core-shaped coordinates are built fresh rather than sliced from the
    # extended iotas: Mosaic crashes slicing replicated-layout (broadcast)
    # values (vector_extract_strided_slice, limits > stored vreg dims).
    core = (slice(1, 1 + bx), slice(1, 1 + by), slice(None))
    gz_core = jax.lax.broadcasted_iota(jnp.int32, (bx, by, Zp), 2)
    inb_core = gz_core < Z  # core x/y are always inside the domain
    for c in range(3):
        other = [a for a in range(3) if a != c]
        num = jnp.zeros((bx, by, Zp), jnp.float32)
        avg = jnp.zeros((bx, by, Zp), jnp.float32)
        for u, v in product((-1, 0, 1), repeat=2):
            if u == 0 and v == 0:
                continue
            off = [0, 0, 0]
            off[other[0]] = u
            off[other[1]] = v
            # x/y components via extended-region slices, z via a lane roll —
            # an in-plane offset can have BOTH (e.g. component x averages
            # over (0, u, v) neighbors)
            sh = (
                slice(1 + off[0], 1 + off[0] + bx),
                slice(1 + off[1], 1 + off[1] + by),
                slice(None),
            )
            vv = validf[c][sh]
            bb = base[c][sh]
            if off[2]:
                vv = jnp.roll(vv, -off[2], axis=2)
                bb = jnp.roll(bb, -off[2], axis=2)
                okz = (gz_core + off[2] >= 0) & (gz_core + off[2] < Z)
                vv = jnp.where(okz, vv, 0.0)
            num = num + vv
            avg = avg + jnp.where(vv > 0.5, bb, 0.0)
        writeb = (validf[c][core] < 0.5) & (num > 0.0)
        outc = jnp.where(
            writeb, avg / jnp.where(num > 0.0, num, 1.0), base[c][core]
        )
        outs[c][...] = jnp.where(inb_core, outc, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "with_solids", "grid_dim", "bx", "by", "interpret"),
)
def _call(
    dt_arr, marker_f, pressure, v0, v1, v2, sv0, sv1, sv2,
    *, mode, with_solids, grid_dim, bx, by, interpret,
):
    X, Y, Z = grid_dim
    Zp = marker_f.shape[-1]
    kernel = functools.partial(
        _kernel, mode=mode, with_solids=with_solids,
        bx=bx, by=by, X=X, Y=Y, Z=Z, Zp=Zp, dt_is_input=(mode == "change"),
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec(
        (bx, by, Zp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    win = lambda: pltpu.VMEM((bx + 2 * _HX, by + 2 * _YH, Zp), jnp.float32)
    in_specs = []
    inputs = []
    if mode == "change":
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(dt_arr)
    in_specs += [any_spec, any_spec]
    inputs += [marker_f, pressure]
    n_win = 2
    if mode == "remove":
        in_specs += [any_spec] * 3
        inputs += [v0, v1, v2]
        n_win += 3
    if with_solids:
        in_specs += [any_spec] * 3
        inputs += [sv0, sv1, sv2]
        n_win += 3
    scratch = [win() for _ in range(n_win)]
    scratch.append(pltpu.SemaphoreType.DMA((9 * n_win,)))
    return pl.pallas_call(
        kernel,
        grid=(X // bx, Y // by),
        in_specs=in_specs,
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((X, Y, Zp), jnp.float32)] * 3,
        scratch_shapes=scratch,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)


def _pad_z(g, zp):
    z = g.shape[2]
    return g if z == zp else jnp.pad(g, ((0, 0), (0, 0), (0, zp - z)))


def _pick_blocks(X, Y):
    by = 32 if Y % 32 == 0 else (16 if Y % 16 == 0 else 8)
    bx = 8 if X % 8 == 0 else (4 if X % 4 == 0 else 2)
    return bx, by


def supports(grid_dim) -> bool:
    X, Y, Z = grid_dim
    bx, by = _pick_blocks(X, Y)
    return Y % 8 == 0 and X % bx == 0 and Y % by == 0


def remove_extrapolate_pallas(
    vel, pressure, marker, solid_velocity, interpret: bool = False
):
    """Fused remove_divergence + extrapolate_velocity (drop-in for the oracle
    pair). solid_velocity: f32[X,Y,Z,3] or None."""
    X, Y, Z = marker.shape
    zp = max(128, -(-Z // 128) * 128)
    bx, by = _pick_blocks(X, Y)
    mk = _pad_z(marker.astype(jnp.float32), zp)
    p = _pad_z(pressure, zp)
    vs = [_pad_z(v, zp) for v in vel]
    zero = jnp.zeros((), jnp.float32)
    if solid_velocity is not None:
        svs = [_pad_z(solid_velocity[..., a], zp) for a in range(3)]
        out = _call(
            zero, mk, p, *vs, *svs, mode="remove", with_solids=True,
            grid_dim=(X, Y, Z), bx=bx, by=by, interpret=interpret,
        )
    else:
        out = _call(
            zero, mk, p, *vs, zero, zero, zero, mode="remove",
            with_solids=False, grid_dim=(X, Y, Z), bx=bx, by=by,
            interpret=interpret,
        )
    return tuple(o[:, :, :Z] for o in out)


def change_extrapolate_pallas(pressure, marker, dt, interpret: bool = False):
    """Fused position_change_field + extrapolate_velocity (drop-in for the
    oracle pair). `dt` may be traced (rides in SMEM)."""
    X, Y, Z = marker.shape
    zp = max(128, -(-Z // 128) * 128)
    bx, by = _pick_blocks(X, Y)
    mk = _pad_z(marker.astype(jnp.float32), zp)
    p = _pad_z(pressure, zp)
    dt_arr = jnp.reshape(jnp.asarray(dt, jnp.float32), (1,))
    zero = jnp.zeros((), jnp.float32)
    out = _call(
        dt_arr, mk, p, zero, zero, zero, zero, zero, zero, mode="change",
        with_solids=False, grid_dim=(X, Y, Z), bx=bx, by=by,
        interpret=interpret,
    )
    return tuple(o[:, :, :Z] for o in out)
