"""Blocked Pallas PCG: the pressure projection for grids BEYOND whole-VMEM
residency (ops/pallas_pcg.py caps out at ~100 MB of grid arrays; the
256x128x128 north star needs ~201 MB — VERDICT.md weak #2).

Same math as the XLA oracle (sim/pressure.py — see there for the reference
shader citations) and the whole-solve kernel, restructured as the classic
two-kernel PCG iteration, streamed through VMEM in x-blocks:

  K1 "matvec":  s_i = z + beta*s_{i-1};  As = A s_i;  partial s.As
  K2 "update":  p += alpha*s_i;  r = F*(r - alpha*As);  z = M^-1 r;
                partial z.r;  partial max|r|

Design: BANDWIDTH-bound, not compute-bound. The first cut of this kernel
recomputed the marker-derived neighbor masks in-VMEM per block and lost to
the XLA oracle on pure VPU op count (~100 ops/element). Two structural facts
remove nearly all of that compute:

  1. Every PCG vector (r, z, s, and therefore z + beta*s) is fluid-masked by
     construction, and domain borders/z-padding are never fluid. A shifted
     masked value is therefore already zero wherever the neighbor-fluid mask
     would be zero — so A and the IP preconditioner reduce to UNMASKED rolls
     and multiply-adds; the 12 neighbor masks and all shift zero-fill masks
     drop out. (Requires the solid-border invariant; the wrapper enforces it
     by masking border cells out of `fluid` — markers from
     sim/sm_phases.marker_from_counts always satisfy it anyway.)
  2. The per-cell coefficients are loop-invariant: `diag` (neighbor count)
     and `fi = fluid * (1/dsafe)` are precomputed ONCE per solve in XLA
     (reusing sim/pressure.diag_coefficients) and streamed — replacing the
     two per-element divisions per iteration with multiplies. The fluid mask
     itself rides as `fi > 0` (dsafe >= 1, so fi is positive exactly on
     fluid cells): no separate mask array.

Per iteration the streamed set is 13 grid arrays (K1: z,s,diag -> snew,As;
K2: r,As,fi,p,snew -> p,r,z) vs the XLA oracle's ~22, and every
stencil/axpy/dot fuses into the two passes. Window DMAs are double-buffered
(block i+1 streams while block i computes).

Reference analog: pressure_apply_coeff.comp:1-32 +
pressure_apply_preconditioner.comp:1-97 (the kernel pair being fused) driven
by pressure_solver.rs:655-723; iteration control is a jax.lax.while_loop with
on-device scalars instead of indirect dispatch.

Windowing: arrays are [X, Y, Zp] with Y, Zp fully resident per block and x
blocked. x-halo windows load in three statically-placed clamped parts (lead |
core | trail); clamped duplicate rows hold fluid-masked values of border
cells, which are zero — so no row masks are needed either. y/z neighbor
reads are unmasked VMEM rolls (wraps land on solid borders / zero padding);
x-shifts are leading-dim rolls whose wrapped rows are statically never
consumed by core outputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SolverConfig
from ..core.types import CELL_FLUID, SolverStats
from ..sim.pressure import PressureSolveResult, diag_coefficients

_EPS = 1e-10

_AXES = ((1, 0, 0), (0, 1, 0), (0, 0, 1))


def _roll(a: jax.Array, off) -> jax.Array:
    """out[i] = a[i + off], as UNMASKED cyclic rolls. Safe for fluid-masked
    values only (wraps land on solid borders / z padding, which are zero);
    the x component's wrapped rows are garbage rows the callers statically
    never consume from core outputs (see module docstring)."""
    ox, oy, oz = off
    out = a
    if ox:
        out = jnp.roll(out, -ox, axis=0)
    if oy:
        out = jnp.roll(out, -oy, axis=1)
    if oz:
        out = jnp.roll(out, -oz, axis=2)
    return out


def _neg(off):
    return tuple(-o for o in off)


def _scalar_tile(pairs):
    """(8,128) tile holding scalars at row 0, columns given by `pairs`."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.zeros((8, 128), jnp.float32)
    for col, val in pairs:
        out = jnp.where((ii == 0) & (jj == col), val, out)
    return out


def _win_x(hbm, win, sems, sem0, i, slot, *, h: int, bx: int, X: int):
    """3-part clamped x-halo window DMA into window buffer `slot`: rows map to
    x = i*bx - h .. i*bx+bx+h."""
    a0 = jnp.clip(i * bx - h, 0, X - h)
    c0 = jnp.clip(i * bx + bx, 0, X - h)
    return [
        pltpu.make_async_copy(
            hbm.at[pl.ds(a0, h)], win.at[slot, pl.ds(0, h)], sems.at[slot, sem0]
        ),
        pltpu.make_async_copy(
            hbm.at[pl.ds(i * bx, bx)],
            win.at[slot, pl.ds(h, bx)],
            sems.at[slot, sem0 + 1],
        ),
        pltpu.make_async_copy(
            hbm.at[pl.ds(c0, h)],
            win.at[slot, pl.ds(h + bx, h)],
            sems.at[slot, sem0 + 2],
        ),
    ]


def _pipelined_wins(srcs, sems, i, *, bx: int, X: int):
    """Double-buffered acquisition of this block's x-halo windows.

    `srcs` is a list of (hbm_ref, win_scratch[2, ...], halo) triples. Starts
    block 0's windows on step 0, prefetches block i+1's into the other
    buffer, waits for block i's, returns the current-slot window views."""
    slot = jax.lax.rem(i, 2)
    nb = pl.num_programs(0)

    def parts(ii, sl):
        out = []
        for n, (hbm, win, h) in enumerate(srcs):
            out += _win_x(hbm, win, sems, 3 * n, ii, sl, h=h, bx=bx, X=X)
        return out

    @pl.when(i == 0)
    def _warm():
        for c in parts(i, slot):
            c.start()

    @pl.when(i + 1 < nb)
    def _prefetch():
        for c in parts(i + 1, 1 - slot):
            c.start()

    for c in parts(i, slot):
        c.wait()
    return [win.at[slot] for _, win, _ in srcs]


def _k1_kernel(
    beta_ref, z_hbm, s_hbm, diag_hbm, snew_ref, as_ref, dot_ref, wz, ws, wd, sems,
    *, bx: int, X: int, Y: int, Zp: int,
):
    """s_new = z + beta*s (fluid-masked by construction); As = A s_new on the
    core (UNMASKED — garbage on non-fluid cells; K2 masks at use)."""
    i = pl.program_id(0)
    wz, ws, wd = _pipelined_wins(
        [(z_hbm, wz, 1), (s_hbm, ws, 1), (diag_hbm, wd, 1)], sems, i, bx=bx, X=X
    )

    beta = beta_ref[0]
    snew = wz[...] + beta * ws[...]
    acc = wd[...] * snew
    for ax in _AXES:
        acc = acc - _roll(snew, ax)
        acc = acc - _roll(snew, _neg(ax))

    snew_core = snew[1 : 1 + bx]
    as_core = acc[1 : 1 + bx]  # rows 1..bx (x = 0..bx-1) exact; edges garbage
    snew_ref[...] = snew_core
    as_ref[...] = as_core
    # snew is fluid-masked, so the unmasked-As garbage never enters the dot
    dot_ref[...] = _scalar_tile([(0, jnp.sum(snew_core * as_core))])


def _k2_kernel(
    alpha_ref, p_core, snew_core, r_hbm, as_hbm, fi_hbm,
    p_out, r_out, z_out, stat_ref, wr, wa, wf, sems,
    *, bx: int, X: int, Y: int, Zp: int,
):
    """p += alpha*s; r = F*(r - alpha*As); z = M^-1 r (Incomplete-Poisson,
    both sweeps in-window); partial z.r and max|r| — one streamed pass.

    fi = fluid/dsafe: positive exactly on fluid cells, so F = (fi > 0) and
    both preconditioner divisions become multiplies by fi (t is already
    fluid-masked when it multiplies fi again)."""
    i = pl.program_id(0)
    wr, wa, wf = _pipelined_wins(
        [(r_hbm, wr, 1), (as_hbm, wa, 1), (fi_hbm, wf, 1)], sems, i, bx=bx, X=X
    )

    alpha = alpha_ref[0]
    fi = wf[...]
    F = jnp.where(fi > 0.0, 1.0, 0.0)
    rp = F * (wr[...] - alpha * wa[...])

    up = jnp.zeros(rp.shape, jnp.float32)
    for ax in _AXES:
        up = up + _roll(rp, ax)
    t = rp + up * fi  # rows 0..bx (x = -1..bx-1) exact; last row garbage
    td = t * fi
    lo = jnp.zeros(rp.shape, jnp.float32)
    for ax in _AXES:
        lo = lo + _roll(td, _neg(ax))
    z = t + F * lo  # rows 1..bx (x = 0..bx-1 = core) exact

    r_core = rp[1 : 1 + bx]
    z_core = z[1 : 1 + bx]
    p_out[...] = p_core[...] + alpha * snew_core[...]
    r_out[...] = r_core
    z_out[...] = z_core
    stat_ref[...] = _scalar_tile(
        [(0, jnp.sum(z_core * r_core)), (1, jnp.max(jnp.abs(r_core)))]
    )


def _core_spec(bx, Y, Zp):
    return pl.BlockSpec((bx, Y, Zp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _tile_spec():
    return pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _win_scratch(bx, Y, Zp, h=1):
    return pltpu.VMEM((2, bx + 2 * h, Y, Zp), jnp.float32)


@functools.partial(jax.jit, static_argnames=("bx", "interpret"))
def _k1_call(beta, z, s, diag, *, bx: int, interpret: bool):
    X, Y, Zp = z.shape
    nb = X // bx
    kern = functools.partial(_k1_kernel, bx=bx, X=X, Y=Y, Zp=Zp)
    anys = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), anys, anys, anys],
        out_specs=[_core_spec(bx, Y, Zp), _core_spec(bx, Y, Zp), _tile_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((X, Y, Zp), jnp.float32),
            jax.ShapeDtypeStruct((X, Y, Zp), jnp.float32),
            jax.ShapeDtypeStruct((8 * nb, 128), jnp.float32),
        ],
        scratch_shapes=[
            _win_scratch(bx, Y, Zp),
            _win_scratch(bx, Y, Zp),
            _win_scratch(bx, Y, Zp),
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(beta, z, s, diag)


@functools.partial(jax.jit, static_argnames=("bx", "interpret"))
def _k2_call(alpha, p, snew, r, As, fi, *, bx: int, interpret: bool):
    X, Y, Zp = p.shape
    nb = X // bx
    kern = functools.partial(_k2_kernel, bx=bx, X=X, Y=Y, Zp=Zp)
    anys = pl.BlockSpec(memory_space=pl.ANY)
    core = _core_spec(bx, Y, Zp)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), core, core, anys, anys, anys],
        out_specs=[core, core, core, _tile_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((X, Y, Zp), jnp.float32),
            jax.ShapeDtypeStruct((X, Y, Zp), jnp.float32),
            jax.ShapeDtypeStruct((X, Y, Zp), jnp.float32),
            jax.ShapeDtypeStruct((8 * nb, 128), jnp.float32),
        ],
        scratch_shapes=[
            _win_scratch(bx, Y, Zp),
            _win_scratch(bx, Y, Zp),
            _win_scratch(bx, Y, Zp),
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(alpha, p, snew, r, As, fi)


def _gdiv(num, den):
    return num / (den + jnp.where(den < 0.0, -_EPS, _EPS))


def _pick_bx(X: int, Y: int, Zp: int, budget: int = 72 << 20) -> int | None:
    """Largest block with ~24 live window-row arrays under the VMEM budget
    (double-buffered windows + pipelined io blocks + stencil temporaries)."""
    for bx in (32, 16, 8, 4, 2, 1):
        if X % bx == 0 and 24 * (bx + 4) * Y * Zp * 4 <= budget:
            return bx
    return None


def supports(grid_dim) -> bool:
    x, y, z = grid_dim
    if y % 8:
        return False
    zp = max(128, -(-z // 128) * 128)
    return _pick_bx(x, y, zp) is not None


def _zpad(g: jax.Array, zp: int) -> jax.Array:
    z = g.shape[2]
    return g if z == zp else jnp.pad(g, ((0, 0), (0, 0), (0, zp - z)))


def _interior(shape):
    m = jnp.ones(shape, bool)
    for a in range(3):
        idx = jax.lax.broadcasted_iota(jnp.int32, shape, a)
        m = m & (idx > 0) & (idx < shape[a] - 1)
    return m


def solve_pressure_blocked(
    initial_pressure: jax.Array,
    rhs: jax.Array,
    marker: jax.Array,
    config: SolverConfig,
    dt,
    interpret: bool = False,
    with_history: bool = False,
) -> PressureSolveResult:
    """Drop-in replacement for sim/pressure.py::solve_pressure for grids too
    large for the whole-VMEM kernel. Identical pass order, guards, and
    convergence rule; differs from the oracle only by blocked dot summation
    order and 1/dsafe-reciprocal-multiply (vs divide) rounding.

    Requires the solid-border marker invariant (marker_from_counts enforces
    it); border cells are masked out of `fluid` here, so a (non-physical)
    border-fluid cell would solve to pressure 0 instead of the oracle's
    zero-fill-neighbor solve."""
    x, y, z = marker.shape
    zp = max(128, -(-z // 128) * 128)
    bx = _pick_bx(x, y, zp)
    assert bx is not None, "caller must gate on supports()"

    fluid = (marker == CELL_FLUID) & _interior(marker.shape)
    diag = diag_coefficients(marker)
    dsafe = jnp.where(diag > 0.0, diag, 1.0)
    fi = _zpad(jnp.where(fluid, 1.0 / dsafe, 0.0), zp)
    dg = _zpad(diag, zp)
    p0 = _zpad(jnp.where(fluid, initial_pressure, 0.0), zp)
    r_in = _zpad(jnp.where(fluid, rhs, 0.0), zp)

    tol = jnp.asarray(config.error_tolerance / dt, jnp.float32)
    max_iter = int(config.max_num_iterations)
    freq = max(int(config.error_check_frequency), 1)

    def k1(beta, zv, sv):
        return _k1_call(
            jnp.reshape(beta.astype(jnp.float32), (1,)), zv, sv, dg,
            bx=bx, interpret=interpret,
        )

    def k2(alpha, p, snew, r, As):
        return _k2_call(
            jnp.reshape(alpha.astype(jnp.float32), (1,)), p, snew, r, As, fi,
            bx=bx, interpret=interpret,
        )

    # init == oracle pre-loop, expressed with the same two kernels:
    # K1(z=p0, beta=0) gives A p0 (p0 pre-masked above);
    # K2(p=0, r=fluid*rhs, alpha=1) gives p=p0, r0, z0, sigma0.
    p0f, As0, _ = k1(jnp.float32(0.0), p0, p0)
    p_init, r0, z0, tiles0 = k2(
        jnp.float32(1.0), jnp.zeros_like(p0), p0f, r_in, As0
    )
    sigma0 = jnp.sum(tiles0[:, 0])

    def cond(carry):
        i, converged = carry[5], carry[7]
        return (i < max_iter) & jnp.logical_not(converged)

    def body(carry):
        p, r, zv, s, sigma, i, beta, _, err, hist = carry
        snew, As, dots = k1(beta, zv, s)
        alpha = _gdiv(sigma, jnp.sum(dots[:, 0]))
        p, r, zv, tiles = k2(alpha, p, snew, r, As)
        sigma_new = jnp.sum(tiles[:, 0])
        check = ((i % freq) == 0) | (i == max_iter - 1)
        cur = jnp.max(tiles[:, 1])
        new_err = jnp.where(check, cur, err)
        converged = check & (new_err < tol)
        beta_new = _gdiv(sigma_new, sigma)
        if with_history:
            # per-iteration max|r| (the K2 kernel's reduce by-product — free
            # here), same semantics as sim/pressure.py with_history
            hist = hist.at[i].set(cur)
        return (
            p, r, zv, snew, sigma_new, i + 1, beta_new, converged, new_err,
            hist,
        )

    init = (
        p_init, r0, z0, z0, sigma0, jnp.int32(0), jnp.float32(0.0),
        jnp.bool_(False), jnp.float32(jnp.inf),
        jnp.full((max_iter if with_history else 1,), jnp.inf, jnp.float32),
    )
    p, _, _, _, _, iters, _, _, err, hist = jax.lax.while_loop(cond, body, init)
    return PressureSolveResult(
        pressure=p[:, :, :z],
        stats=SolverStats(error=(err * dt).astype(jnp.float32), iterations=iters),
        history=(hist * dt).astype(jnp.float32) if with_history else None,
    )
