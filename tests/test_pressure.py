"""Pressure solver validation against dense scipy/numpy reference solves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blub_tpu.core.config import SolverConfig
from blub_tpu.core.types import CELL_AIR, CELL_FLUID, CELL_SOLID
from blub_tpu.sim.pressure import (
    apply_A,
    diag_coefficients,
    jacobi_solve,
    neighbor_fluid_masks,
    solve_pressure,
)

DT = 1.0 / 120.0


def _make_marker(dim, fluid_box):
    """Solid border ring, AIR elsewhere, FLUID in the given box."""
    m = np.full(dim, CELL_AIR, np.int8)
    m[0, :, :] = m[-1, :, :] = CELL_SOLID
    m[:, 0, :] = m[:, -1, :] = CELL_SOLID
    m[:, :, 0] = m[:, :, -1] = CELL_SOLID
    (x0, x1), (y0, y1), (z0, z1) = fluid_box
    m[x0:x1, y0:y1, z0:z1] = CELL_FLUID
    return jnp.asarray(m)


def _dense_A(marker):
    """Dense matrix of the reference operator on fluid cells."""
    m = np.asarray(marker)
    fl = np.argwhere(m == CELL_FLUID)
    index = {tuple(c): i for i, c in enumerate(fl)}
    n = len(fl)
    A = np.zeros((n, n))
    dims = m.shape
    for i, c in enumerate(fl):
        diag = 0
        for ax in range(3):
            for s in (-1, 1):
                nb = c.copy()
                nb[ax] += s
                if (nb < 0).any() or (nb >= dims).any():
                    continue  # out of bounds = solid
                t = m[tuple(nb)]
                if t != CELL_SOLID:
                    diag += 1
                if t == CELL_FLUID:
                    A[i, index[tuple(nb)]] = -1.0
        A[i, i] = diag
    return A, fl


def test_apply_A_matches_dense():
    marker = _make_marker((8, 8, 8), ((2, 6), (2, 5), (3, 6)))
    A, fl = _dense_A(marker)
    rng = np.random.default_rng(0)
    x = np.zeros((8, 8, 8), np.float32)
    xv = rng.standard_normal(len(fl)).astype(np.float32)
    x[tuple(fl.T)] = xv

    fluid = marker == CELL_FLUID
    diag = diag_coefficients(marker)
    nbr_pos, nbr_neg = neighbor_fluid_masks(marker)
    out = np.asarray(apply_A(jnp.asarray(x), fluid, diag, nbr_pos, nbr_neg))
    np.testing.assert_allclose(out[tuple(fl.T)], A @ xv, rtol=1e-5, atol=1e-5)
    # zero outside fluid
    assert (out[~np.asarray(fluid)] == 0).all()


def test_A_symmetric_positive_definite():
    marker = _make_marker((8, 8, 8), ((2, 6), (2, 6), (2, 6)))
    A, _ = _dense_A(marker)
    np.testing.assert_allclose(A, A.T)
    eig = np.linalg.eigvalsh(A)
    assert eig.min() > 0  # PD because air cells touch the fluid (Dirichlet)


def test_pcg_matches_dense_solve():
    marker = _make_marker((10, 10, 10), ((2, 8), (2, 7), (2, 8)))
    A, fl = _dense_A(marker)
    rng = np.random.default_rng(1)
    b = np.zeros((10, 10, 10), np.float32)
    bv = rng.standard_normal(len(fl)).astype(np.float32)
    b[tuple(fl.T)] = bv

    cfg = SolverConfig(error_tolerance=1e-6, max_num_iterations=200, error_check_frequency=1)
    res = solve_pressure(jnp.zeros((10, 10, 10), jnp.float32), jnp.asarray(b), marker, cfg, DT)
    expect = np.linalg.solve(A, bv)
    np.testing.assert_allclose(np.asarray(res.pressure)[tuple(fl.T)], expect, rtol=1e-3, atol=1e-3)


def test_pcg_converges_under_default_config():
    marker = _make_marker((16, 16, 16), ((2, 14), (2, 10), (2, 14)))
    rng = np.random.default_rng(2)
    b = np.zeros((16, 16, 16), np.float32)
    fluid = np.asarray(marker) == CELL_FLUID
    b[fluid] = 100.0 * rng.standard_normal(fluid.sum()).astype(np.float32)

    cfg = SolverConfig()  # reference defaults: tol 0.1, 32 iters, check every 4
    res = solve_pressure(jnp.zeros((16, 16, 16), jnp.float32), jnp.asarray(b), marker, cfg, DT)
    assert int(res.stats.iterations) <= 32
    # residual max |b - A p| must be below tol/dt at exit (unless iteration-capped)
    diag = diag_coefficients(marker)
    nbr_pos, nbr_neg = neighbor_fluid_masks(marker)
    r = np.asarray(
        jnp.where(marker == CELL_FLUID, jnp.asarray(b) - apply_A(res.pressure, marker == CELL_FLUID, diag, nbr_pos, nbr_neg), 0.0)
    )
    if int(res.stats.iterations) < 32:
        assert np.abs(r).max() < 0.1 / DT


def test_warm_start_zero_iterations():
    """Solving twice with the same rhs: second solve converges immediately."""
    marker = _make_marker((12, 12, 12), ((2, 10), (2, 8), (2, 10)))
    rng = np.random.default_rng(3)
    b = np.zeros((12, 12, 12), np.float32)
    fluid = np.asarray(marker) == CELL_FLUID
    b[fluid] = 10.0 * rng.standard_normal(fluid.sum()).astype(np.float32)
    cfg = SolverConfig(error_tolerance=0.1, max_num_iterations=64, error_check_frequency=1)
    res1 = solve_pressure(jnp.zeros((12, 12, 12), jnp.float32), jnp.asarray(b), marker, cfg, DT)
    res2 = solve_pressure(res1.pressure, jnp.asarray(b), marker, cfg, DT)
    assert int(res2.stats.iterations) <= 2


def test_jacobi_agrees_with_pcg():
    marker = _make_marker((8, 8, 8), ((2, 6), (2, 6), (2, 6)))
    rng = np.random.default_rng(4)
    b = np.zeros((8, 8, 8), np.float32)
    fluid = np.asarray(marker) == CELL_FLUID
    b[fluid] = rng.standard_normal(fluid.sum()).astype(np.float32)
    cfg = SolverConfig(error_tolerance=1e-6, max_num_iterations=300, error_check_frequency=1)
    p_pcg = solve_pressure(jnp.zeros((8, 8, 8), jnp.float32), jnp.asarray(b), marker, cfg, DT).pressure
    p_jac = jacobi_solve(jnp.asarray(b), marker, iterations=3000)
    np.testing.assert_allclose(np.asarray(p_pcg)[fluid], np.asarray(p_jac)[fluid], rtol=1e-2, atol=1e-2)


def test_empty_fluid_no_nans():
    marker = _make_marker((8, 8, 8), ((4, 4), (4, 4), (4, 4)))  # no fluid
    cfg = SolverConfig()
    res = solve_pressure(
        jnp.zeros((8, 8, 8), jnp.float32), jnp.zeros((8, 8, 8), jnp.float32), marker, cfg, DT
    )
    assert np.isfinite(np.asarray(res.pressure)).all()


def test_solve_history_records_per_iteration_error():
    """with_history=True records max|r|*dt at every iteration (the
    reference's per-iteration solver plots, pressure_solver.rs:655-723):
    finite and eventually-decreasing up to stats.iterations, +inf past the
    exit, final entry == stats.error, and the pressure/stats identical to a
    history-free solve."""
    marker = _make_marker((12, 12, 12), ((2, 10), (2, 7), (2, 10)))
    rng = np.random.default_rng(3)
    rhs = jnp.asarray(
        rng.standard_normal((12, 12, 12)).astype(np.float32)
    ) * (marker == CELL_FLUID)
    cfg = SolverConfig(error_tolerance=1e-4, max_num_iterations=32,
                       error_check_frequency=1)
    p0 = jnp.zeros((12, 12, 12), jnp.float32)
    res = solve_pressure(p0, rhs, marker, cfg, DT, with_history=True)
    ref = solve_pressure(p0, rhs, marker, cfg, DT)
    # same math, but the extra history carry may let XLA schedule float ops
    # differently — compare to tight tolerance, not bitwise
    np.testing.assert_allclose(
        np.asarray(res.pressure), np.asarray(ref.pressure), rtol=1e-5, atol=1e-7
    )
    assert int(res.stats.iterations) == int(ref.stats.iterations)

    hist = np.asarray(res.history)
    it = int(res.stats.iterations)
    assert hist.shape == (32,)
    assert np.isfinite(hist[:it]).all()
    assert np.isinf(hist[it:]).all()
    np.testing.assert_allclose(hist[it - 1], float(res.stats.error), rtol=1e-6)
    assert hist[it - 1] < hist[0]  # it converged, so the residual fell
