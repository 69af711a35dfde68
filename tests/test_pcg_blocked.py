"""Blocked (beyond-VMEM) Pallas PCG kernel (interpret mode) vs the XLA oracle."""

import numpy as np

from blub_tpu.core.config import SolverConfig
from blub_tpu.core.seeding import add_fluid_cube
import jax

from blub_tpu.ops.pallas_pcg_blocked import solve_pressure_blocked as _spb, supports


def solve_pressure_blocked(p0, rhs, marker, cfg, dt, interpret=True):
    """jit the whole solve (the production step does): eager interpret-mode
    while_loops dispatch each iteration separately and take minutes.
    PressureSolveResult is a plain dataclass (not a pytree), so the jitted
    body returns leaves and we rebuild the result outside."""

    def run(p0, rhs, marker):
        res = _spb(p0, rhs, marker, cfg, dt, interpret=interpret)
        return res.pressure, res.stats

    p, stats = jax.jit(run)(p0, rhs, marker)
    from blub_tpu.sim.pressure import PressureSolveResult

    return PressureSolveResult(pressure=p, stats=stats)
from blub_tpu.sim import table as T
from blub_tpu.sim.dense_transfer import marker_from_table
from blub_tpu.sim.pressure import solve_pressure

G = (16, 16, 16)


def _problem(seed=0, grid=G):
    pos = add_fluid_cube(grid, (1, 1, 1), (grid[0] // 2 + 1, grid[1] // 2, grid[2] - 1), 10**9)
    tab = T.from_positions(pos, grid, 8)
    marker = marker_from_table(tab, None)
    rng = np.random.default_rng(seed)
    rhs = np.where(
        np.asarray(marker) == 1, rng.standard_normal(grid).astype(np.float32) * 10, 0.0
    ).astype(np.float32)
    return marker, rhs


def test_supports():
    assert supports(G)
    assert supports((256, 128, 128))  # the north-star scale this kernel exists for
    assert not supports((16, 12, 16))  # y % 8


def test_blocked_pcg_matches_oracle():
    import jax.numpy as jnp

    marker, rhs = _problem()
    cfg = SolverConfig(error_tolerance=0.05, max_num_iterations=32, error_check_frequency=4)
    dt = 1.0 / 120.0
    p0 = jnp.zeros(G, jnp.float32)
    ref = solve_pressure(p0, jnp.asarray(rhs), marker, cfg, dt)
    got = solve_pressure_blocked(p0, jnp.asarray(rhs), marker, cfg, dt, interpret=True)
    # blocked dot products change summation order -> allow tiny drift, but the
    # convergence trajectory (iteration count) must match
    assert int(got.stats.iterations) == int(ref.stats.iterations)
    np.testing.assert_allclose(
        float(got.stats.error), float(ref.stats.error), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.pressure), np.asarray(ref.pressure), rtol=1e-3, atol=1e-3
    )


def test_blocked_pcg_non_cubic_multiblock():
    """Several x-blocks + z padding (Z=24 -> Zp=128) + x=40 (bx=8)."""
    import jax.numpy as jnp

    grid = (40, 16, 24)
    marker, rhs = _problem(seed=2, grid=grid)
    cfg = SolverConfig(error_tolerance=0.05, max_num_iterations=48, error_check_frequency=2)
    dt = 1.0 / 120.0
    p0 = jnp.zeros(grid, jnp.float32)
    ref = solve_pressure(p0, jnp.asarray(rhs), marker, cfg, dt)
    got = solve_pressure_blocked(p0, jnp.asarray(rhs), marker, cfg, dt, interpret=True)
    assert int(got.stats.iterations) == int(ref.stats.iterations)
    np.testing.assert_allclose(
        np.asarray(got.pressure), np.asarray(ref.pressure), rtol=1e-3, atol=1e-3
    )


def test_blocked_pcg_warm_start():
    import jax.numpy as jnp

    marker, rhs = _problem(seed=3)
    cfg = SolverConfig(error_tolerance=0.1, max_num_iterations=32, error_check_frequency=2)
    dt = 1.0 / 120.0
    p0 = jnp.zeros(G, jnp.float32)
    first = solve_pressure_blocked(p0, jnp.asarray(rhs), marker, cfg, dt, interpret=True)
    again = solve_pressure_blocked(
        first.pressure, jnp.asarray(rhs), marker, cfg, dt, interpret=True
    )
    ref = solve_pressure(first.pressure, jnp.asarray(rhs), marker, cfg, dt)
    assert int(again.stats.iterations) <= 3
    assert int(again.stats.iterations) == int(ref.stats.iterations)


def test_blocked_history_matches_stats():
    """with_history on the blocked beyond-VMEM solver (VERDICT r4 next #7)."""
    import jax.numpy as jnp

    marker, rhs = _problem(seed=4)
    cfg = SolverConfig(max_num_iterations=24, error_check_frequency=2)
    dt = 1.0 / 120.0
    p0 = jnp.zeros(marker.shape, jnp.float32)

    def run(p0, rhs, marker):
        res = _spb(p0, rhs, marker, cfg, dt, interpret=True, with_history=True)
        return res.stats.error, res.stats.iterations, res.history

    err, iters, hist = jax.jit(run)(p0, jnp.asarray(rhs), marker)
    hist = np.asarray(jax.device_get(hist))
    iters = int(iters)
    assert hist.shape == (cfg.max_num_iterations,)
    assert np.isfinite(hist[:iters]).all()
    assert np.isinf(hist[iters:]).all()
    np.testing.assert_allclose(hist[iters - 1], float(jax.device_get(err)), rtol=0, atol=0)
