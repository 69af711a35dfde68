"""Pallas whole-solve PCG kernel: the pressure projection with ALL state
resident in VMEM.

The XLA solver (sim/pressure.py, the oracle) runs each `lax.while_loop`
iteration as HBM-to-HBM passes: apply_A + preconditioner + dots stream
~15 grid arrays per iteration. At dam scale a grid array is 4 MB — the whole
working set (p, r, s, marker-derived coefficients, temporaries) is ~30-50 MB
and fits v5e VMEM, so this kernel runs the ENTIRE solve on-chip: one read of
(p0, rhs, marker), the full while-loop with on-VMEM stencils and reductions,
one write of p. Zero HBM traffic per iteration.

Math is bit-for-bit the oracle's (same pass order, same ±1e-10 guards, same
check-frequency convergence rule — see sim/pressure.py for the reference
shader citations). Zero-fill boundary semantics of gridops.shift are
reproduced with cyclic rolls + iota edge masks (and the z padding rows are
zero = SOLID, which self-masks z rolls).

Used when the grid fits the VMEM budget (supports()); larger grids (the
256x128x128 north star) fall back to the XLA solver.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SolverConfig
from ..core.types import CELL_FLUID, SolverStats
from ..sim.pressure import PressureSolveResult

_EPS = 1e-10


def _rollz(a: jax.Array, off, X: int, Y: int, Z: int) -> jax.Array:
    """out[i] = a[i + off] with zero fill — gridops.shift on a VMEM-resident
    [X, Y, Zp] array. Cyclic roll + edge mask; z needs masking too (the wrap
    crosses the zero padding only when |off| <= Zp - Z, which holds for the
    1-cell stencils here, but the padding itself must stay zero for the NEXT
    roll, so we mask anyway for exactness)."""
    ox, oy, oz = off
    out = a
    if ox:
        out = jnp.roll(out, -ox, axis=0)
        e = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
        out = jnp.where((e + ox >= 0) & (e + ox < X), out, 0.0)
    if oy:
        out = jnp.roll(out, -oy, axis=1)
        e = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
        out = jnp.where((e + oy >= 0) & (e + oy < Y), out, 0.0)
    if oz:
        out = jnp.roll(out, -oz, axis=2)
        e = jax.lax.broadcasted_iota(jnp.int32, out.shape, 2)
        out = jnp.where((e + oz >= 0) & (e + oz < Z), out, 0.0)
    return out


_AXES = ((1, 0, 0), (0, 1, 0), (0, 0, 1))


def _neg(off):
    return tuple(-o for o in off)


def _kernel(
    p0_ref, rhs_ref, marker_ref, tol_ref, p_out, stats_out,
    *, X: int, Y: int, Z: int, max_iter: int, freq: int,
    with_history: bool = False,
):
    marker = marker_ref[...]
    fluid = marker == float(CELL_FLUID)
    fluidf = fluid.astype(jnp.float32)

    # diag + neighbor-fluid masks (as f32 multiplicands), matching
    # sim/pressure.py::diag_coefficients / neighbor_fluid_masks
    diag = jnp.zeros(marker.shape, jnp.float32)
    nbr = []
    for ax in _AXES:
        mp = _rollz(marker, ax, X, Y, Z)
        mn = _rollz(marker, _neg(ax), X, Y, Z)
        diag = diag + jnp.abs(mp) + jnp.abs(mn)
        nbr.append(((mp == float(CELL_FLUID)).astype(jnp.float32),
                    (mn == float(CELL_FLUID)).astype(jnp.float32)))
    dsafe = jnp.where(diag > 0.0, diag, 1.0)

    def apply_A(x):
        acc = diag * x
        for c, ax in enumerate(_AXES):
            acc = acc - nbr[c][0] * _rollz(x, ax, X, Y, Z)
            acc = acc - nbr[c][1] * _rollz(x, _neg(ax), X, Y, Z)
        return jnp.where(fluid, acc, 0.0)

    def precondition(r):
        up = jnp.zeros(r.shape, jnp.float32)
        for c, ax in enumerate(_AXES):
            up = up + nbr[c][0] * _rollz(r, ax, X, Y, Z)
        t = jnp.where(fluid, r + up / dsafe, 0.0)
        td = t / dsafe
        lo = jnp.zeros(r.shape, jnp.float32)
        for c, ax in enumerate(_AXES):
            lo = lo + nbr[c][1] * _rollz(td, _neg(ax), X, Y, Z)
        return jnp.where(fluid, t + lo, 0.0)

    def dot(a, b):
        return jnp.sum(a * b)

    def gdiv(num, den):
        return num / (den + jnp.where(den < 0.0, -_EPS, _EPS))

    tol = tol_ref[0]
    p = jnp.where(fluid, p0_ref[...], 0.0)
    r = jnp.where(fluid, rhs_ref[...] - apply_A(p), 0.0)
    z = precondition(r)
    s = z
    sigma = dot(z, r)

    ii = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    lin = ii * 128 + jj  # history slot index (with_history; 1024 max)

    def cond(carry):
        i, converged = carry[4], carry[5]
        return (i < max_iter) & jnp.logical_not(converged)

    def body(carry):
        p, r, s, sigma, i, _, err, hist = carry
        As = apply_A(s)
        alpha = gdiv(sigma, dot(s, As))
        p = p + alpha * s
        r = r - alpha * As
        check = ((i % freq) == 0) | (i == max_iter - 1)
        # cur is computed unconditionally either way (where() evaluates both
        # sides), so recording EVERY iteration into the history tile costs
        # one select — same semantics as sim/pressure.py's with_history
        cur = jnp.max(jnp.abs(r))
        new_err = jnp.where(check, cur, err)
        converged = check & (new_err < tol)
        if with_history:
            hist = jnp.where(lin == i, cur, hist)
        zv = precondition(r)
        sigma_new = dot(zv, r)
        beta = gdiv(sigma_new, sigma)
        s = zv + beta * s
        return (p, r, s, sigma_new, i + 1, converged, new_err, hist)

    hist0 = jnp.full((8, 128), jnp.inf, jnp.float32)
    p, r, _, _, iters, _, err, hist = jax.lax.while_loop(
        cond, body,
        (p, r, s, sigma, jnp.int32(0), jnp.bool_(False), jnp.float32(jnp.inf),
         hist0),
    )
    p_out[...] = p
    # scalar outputs as a lane-masked tile (scatter doesn't lower in Mosaic);
    # with_history, rows [8, 16) carry the per-iteration max|r| history
    stats = jnp.where((ii == 0) & (jj == 0), err, 0.0)
    stats = jnp.where((ii == 0) & (jj == 1), iters.astype(jnp.float32), stats)
    stats_out[0:8] = stats
    if with_history:
        stats_out[8:16] = hist


@functools.partial(
    jax.jit, static_argnames=("max_iter", "freq", "interpret", "with_history")
)
def _solve_call(p0, rhs, marker_f, tol_arr, *, max_iter: int, freq: int,
                interpret: bool, with_history: bool = False):
    xdim, ydim, zp = p0.shape
    # Z = full extent: the z padding rows are zero/SOLID already, so the
    # stencil masks only need the x/y edges; Z here is the PADDED extent
    # (padding cells behave exactly like the oracle's out-of-range zero fills
    # because marker=0 there).
    kernel = functools.partial(
        _kernel, X=xdim, Y=ydim, Z=zp, max_iter=max_iter, freq=freq,
        with_history=with_history,
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[vm, vm, vm, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[vm, vm],
        out_shape=[
            jax.ShapeDtypeStruct(p0.shape, jnp.float32),
            jax.ShapeDtypeStruct((16 if with_history else 8, 128), jnp.float32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(p0, rhs, marker_f, tol_arr)


def _zpad(g: jax.Array, zp: int) -> jax.Array:
    z = g.shape[2]
    if z == zp:
        return g
    return jnp.pad(g, ((0, 0), (0, 0), (0, zp - z)))


def supports(grid_dim) -> bool:
    """Whole-solve VMEM residency: ~12 grid-sized arrays must fit ~100MB."""
    x, y, z = grid_dim
    if y % 8:
        return False
    zp = max(128, -(-z // 128) * 128)
    return 12 * x * y * zp * 4 <= (100 << 20)


def solve_pressure_pallas(
    initial_pressure: jax.Array,
    rhs: jax.Array,
    marker: jax.Array,
    config: SolverConfig,
    dt,
    interpret: bool = False,
    with_history: bool = False,
) -> PressureSolveResult:
    """Drop-in replacement for sim/pressure.py::solve_pressure.

    ``with_history`` (VERDICT r4 next #7): the while-loop carries a (8,128)
    history tile recording max|r| at EVERY iteration (same semantics as the
    XLA solver's with_history), so `app profile --solver-history` reflects
    the solver that actually runs in production. History mode compiles a
    separate program; production solves keep the lean carry."""
    x, y, z = marker.shape
    zp = max(128, -(-z // 128) * 128)
    max_iter = int(config.max_num_iterations)
    assert max_iter <= 1024, "history tile holds 1024 iterations"
    tol = jnp.reshape(jnp.asarray(config.error_tolerance / dt, jnp.float32), (1,))
    p, stats = _solve_call(
        _zpad(initial_pressure, zp),
        _zpad(rhs, zp),
        _zpad(marker.astype(jnp.float32), zp),
        tol,
        max_iter=max_iter,
        freq=max(int(config.error_check_frequency), 1),
        interpret=interpret,
        with_history=with_history,
    )
    err = stats[0, 0]
    iters = stats[0, 1].astype(jnp.int32)
    history = None
    if with_history:
        history = (stats[8:16].reshape(-1)[:max_iter] * dt).astype(jnp.float32)
    return PressureSolveResult(
        pressure=p[:, :, :z],
        stats=SolverStats(error=(err * dt).astype(jnp.float32), iterations=iters),
        history=history,
    )
