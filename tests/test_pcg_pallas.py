"""Whole-solve Pallas PCG kernel (interpret mode) vs the XLA oracle."""

import numpy as np

from blub_tpu.core.config import SolverConfig
from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.core.types import SimParams
from blub_tpu.ops.pallas_pcg import solve_pressure_pallas, supports
from blub_tpu.sim import table as T
from blub_tpu.sim.dense_transfer import marker_from_table
from blub_tpu.sim.pressure import solve_pressure

G = (16, 16, 16)


def _problem(seed=0):
    pos = add_fluid_cube(G, (1, 1, 1), (9, 8, 15), 10**9)
    tab = T.from_positions(pos, G, 8)
    marker = marker_from_table(tab, None)
    rng = np.random.default_rng(seed)
    rhs = np.where(
        np.asarray(marker) == 1, rng.standard_normal(G).astype(np.float32) * 10, 0.0
    ).astype(np.float32)
    return marker, rhs


def test_supports():
    assert supports(G)
    assert not supports((512, 512, 128))


def test_pcg_kernel_matches_oracle():
    import jax.numpy as jnp

    marker, rhs = _problem()
    cfg = SolverConfig(error_tolerance=0.05, max_num_iterations=32, error_check_frequency=4)
    dt = 1.0 / 120.0
    p0 = jnp.zeros(G, jnp.float32)
    ref = solve_pressure(p0, jnp.asarray(rhs), marker, cfg, dt)
    got = solve_pressure_pallas(p0, jnp.asarray(rhs), marker, cfg, dt, interpret=True)
    assert int(got.stats.iterations) == int(ref.stats.iterations)
    np.testing.assert_allclose(
        float(got.stats.error), float(ref.stats.error), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.pressure), np.asarray(ref.pressure), rtol=1e-4, atol=1e-4
    )


def test_pcg_kernel_warm_start():
    """A warm start from the converged solution must converge immediately and
    identically to the oracle."""
    import jax.numpy as jnp

    marker, rhs = _problem(seed=3)
    cfg = SolverConfig(error_tolerance=0.1, max_num_iterations=32, error_check_frequency=2)
    dt = 1.0 / 120.0
    p0 = jnp.zeros(G, jnp.float32)
    first = solve_pressure_pallas(p0, jnp.asarray(rhs), marker, cfg, dt, interpret=True)
    again = solve_pressure_pallas(first.pressure, jnp.asarray(rhs), marker, cfg, dt, interpret=True)
    ref = solve_pressure(first.pressure, jnp.asarray(rhs), marker, cfg, dt)
    assert int(again.stats.iterations) <= 3
    assert int(again.stats.iterations) == int(ref.stats.iterations)


def test_pcg_kernel_history_matches_stats():
    """with_history (VERDICT r4 next #7): the whole-VMEM kernel's history
    tile records max|r| at every iteration; the entry at the exit iteration
    equals the stats error, the tail past exit stays +inf, and the values
    match the XLA solver's with_history run exactly (same arithmetic)."""
    import jax
    import jax.numpy as jnp

    marker, rhs = _problem(seed=5)
    cfg = SolverConfig(max_num_iterations=24, error_check_frequency=2)
    dt = 1.0 / 120.0
    p0 = jnp.zeros(G, jnp.float32)

    def run(p0, rhs, marker):
        res = solve_pressure_pallas(
            p0, rhs, marker, cfg, dt, interpret=True, with_history=True
        )
        return res.pressure, res.stats.error, res.stats.iterations, res.history

    _, err, iters, hist = jax.jit(run)(p0, jnp.asarray(rhs), marker)
    hist = np.asarray(jax.device_get(hist))
    iters = int(iters)
    assert hist.shape == (cfg.max_num_iterations,)
    assert 0 < iters <= cfg.max_num_iterations
    assert np.isfinite(hist[:iters]).all()
    assert np.isinf(hist[iters:]).all()
    np.testing.assert_allclose(hist[iters - 1], float(err), rtol=0, atol=0)

    ref = solve_pressure(p0, jnp.asarray(rhs), marker, cfg, dt, with_history=True)
    np.testing.assert_array_equal(hist[:iters], np.asarray(ref.history)[:iters])
