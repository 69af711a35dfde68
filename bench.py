"""Headline benchmark: sim steps/sec at 128^3-class grid / millions of
particles on one TPU chip (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N, ...,
   "highres": {...}}

vs_baseline compares against the reference's implied bar: its 120 steps/s
realtime design point (src/simulation_controller.rs:39) at dam_halfhalf scale
on a GTX 1070 Ti — the reference publishes no measured numbers (BASELINE.md).

This measures the HONEST path: scan-batched frames with on-device CFL
substepping, the same mass-conserving configuration the Scene runtime uses.
A "step" is one dt=1/120 frame of simulated time (apples-to-apples with the
reference bar); CFL substeps are internal cost and reported separately.

The `highres` sub-object is the same measurement at the 256x128x128 /
8M-particle north-star scale (BASELINE.md >60 steps/s target; VERDICT.md r2
weak #2 asked for this as a bench artifact, not PERF.md prose). cfl 1.5
there: the loss budget at that scale rules out 1.9 (PERF.md).

Env knobs: BLUB_BENCH_GRID=x,y,z  BLUB_BENCH_STEPS=N  BLUB_BENCH_CAPACITY=K
           BLUB_BENCH_BATCH=B (frames per dispatch)  BLUB_BENCH_RAW=1
           (legacy raw fixed-dt single-step loop, no substepping)
           BLUB_BENCH_NO_HIGHRES=1 (skip the highres sub-benchmark)
           BLUB_BENCH_MESH=N (run the mesh-sharded production path,
           parallel/sharded_sm.py, over the first N visible devices — real
           scaling numbers need a pod slice; N=1 measures the sharded code
           path's overhead on the single chip)
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def physics_quality(state, solver_tolerance: float):
    """Post-run physics-quality telemetry (VERDICT r4 next #5): attach
    machine-checkable physics numbers to the headline so accuracy/speed
    trades (capacity K, slack, CFL) are visible in every bench artifact.

    - max_divergence: the velocity pressure-solve's exit max|residual|
      (dt-scaled, same units as SolverConfig.error_tolerance). In the
      discretization, the post-projection divergence of a fluid cell IS the
      solve residual at that cell, so this is max |div u| after projection —
      the exact quantity the reference plots per solve
      (/root/reference/src/simulation/pressure_solver.rs:64-95).
    - solver_converged: that residual is within the configured tolerance
      (BASELINE.md "matching the reference within tolerance" clause).
    - density_drift_pct: mean signed (rho/rho0 - 1) over INTERIOR fluid
      cells (all 6 neighbors fluid) of the final state, in percent —
      positive = compression. Catches volume drift from particle loss that
      lost_pct alone can hide (the density projection re-packs survivors).
      Computed on-device with the oracle-equivalent XLA gather
      (sim/dense_transfer.py), one small extra compile at bench end.
    """
    import jax
    import jax.numpy as jnp

    from blub_tpu.core.types import CELL_FLUID
    from blub_tpu.sim.dense_transfer import marker_from_table, p2g_density_dense
    from blub_tpu.sim.density import DENSITY0
    from blub_tpu.sim.gridops import shift
    from blub_tpu.sim.slot_major import SlotMajorTable, to_table

    @jax.jit
    def _drift(tab):
        table = to_table(tab) if isinstance(tab, SlotMajorTable) else tab
        marker = marker_from_table(table, None)
        rho = p2g_density_dense(table)
        interior = marker == CELL_FLUID
        for ax in ((1, 0, 0), (0, 1, 0), (0, 0, 1)):
            for off in (ax, tuple(-a for a in ax)):
                interior = interior & (shift(marker, off) == CELL_FLUID)
        err = jnp.where(interior, rho / DENSITY0 - 1.0, 0.0)
        n = jnp.maximum(jnp.sum(interior.astype(jnp.int32)), 1)
        return jnp.sum(err) / n.astype(jnp.float32), jnp.max(jnp.abs(err))

    drift, drift_max = (float(jax.device_get(v)) for v in _drift(state.table))
    max_div = float(jax.device_get(state.stats_vel.error))
    return {
        "max_divergence": round(max_div, 5),
        "solver_converged": bool(max_div <= solver_tolerance),
        "density_drift_pct": round(100.0 * drift, 3),
        "density_err_max_pct": round(100.0 * drift_max, 2),
    }


def run_config(grid, n_steps, capacity, batch, cfl, raw, mesh_n=0):
    import jax

    from blub_tpu.core.seeding import add_fluid_cube
    from blub_tpu.core.types import SimParams
    from blub_tpu.sim.axis_layout import choose_perm, permute_params, permute_positions
    from blub_tpu.sim.step_dense import (
        make_dense_state,
        make_jitted_dense_step,
        multi_frame_dense,
    )

    # Dam filling the lower-left half: ~1/4 of cells -> grid(128^3) ~ 4M particles.
    x, y, z = grid
    pos = add_fluid_cube(grid, (1, 1, 1), (x // 2, y // 2, z - 1), 10**9)
    params = SimParams(
        grid_dim=grid, dt=1.0 / 120.0, gravity_grid=(0.0, -981.0, 0.0), num_particles=pos.shape[0]
    )
    # internal lane-friendly axis order (sim/axis_layout.py): same physics,
    # minimal 128-lane padding waste (e.g. 128x64x64 runs as 64x64x128)
    perm = choose_perm(grid)
    params = permute_params(params, perm)
    pos = permute_positions(pos, perm)
    state = make_dense_state(
        params, pos, capacity=capacity, layout="sm" if mesh_n else None
    )

    if mesh_n:
        import jax.numpy as jnp

        from blub_tpu.parallel import sharded_sm as ss

        devs = jax.devices()
        assert len(devs) >= mesh_n, (len(devs), mesh_n)
        ctx = ss.ShardCtx(jax.sharding.Mesh(np.asarray(devs[:mesh_n]), ("x",)))
        assert ss.sharded_sm_supports(params.grid_dim, capacity, mesh_n)
        state = ss.shard_sm_state(ctx, state)

        def _frames(s):
            def body(_, carry):
                st, acc = carry
                st, n = ss.frame_dense_sharded(
                    params, ctx, st, cfl_target=cfl, max_substeps=4
                )
                return st, acc + n

            return jax.lax.fori_loop(0, batch, body, (s, jnp.int32(0)))

        frames_fn = jax.jit(_frames, donate_argnums=(0,))
        n_batches = max(1, n_steps // batch)
        t0 = time.time()
        state, nsub = frames_fn(state)
        _sync(state)
        compile_s = time.time() - t0
        state, nsub = frames_fn(state)
        _sync(state)
        nsubs = []
        t0 = time.time()
        for _ in range(n_batches):
            state, nsub = frames_fn(state)
            nsubs.append(nsub)
        _sync(state)
        wall = time.time() - t0
        frames = n_batches * batch
        substeps = int(np.sum([np.asarray(jax.device_get(n)) for n in nsubs]))
    elif raw:
        step = make_jitted_dense_step(params, donate=True)
        t0 = time.time()
        state = step(state)
        _sync(state)
        compile_s = time.time() - t0
        for _ in range(4):
            state = step(state)
        _sync(state)
        t0 = time.time()
        for _ in range(n_steps):
            state = step(state)
        _sync(state)
        wall = time.time() - t0
        frames = n_steps
        substeps = n_steps
    else:
        frames_fn = jax.jit(
            lambda s: multi_frame_dense(params, s, batch, cfl_target=cfl, max_substeps=4),
            donate_argnums=(0,),
        )
        n_batches = max(1, n_steps // batch)
        t0 = time.time()
        state, nsub = frames_fn(state)
        _sync(state)
        compile_s = time.time() - t0
        state, nsub = frames_fn(state)  # settle into a typical regime
        _sync(state)
        nsubs = []
        t0 = time.time()
        for _ in range(n_batches):
            state, nsub = frames_fn(state)
            nsubs.append(nsub)
        _sync(state)
        wall = time.time() - t0
        frames = n_batches * batch
        substeps = int(np.sum([np.asarray(jax.device_get(n)) for n in nsubs]))

    steps_per_s = frames / wall
    n0 = pos.shape[0]
    lost = int(np.asarray(jax.device_get(state.table.lost)))
    # which implementation actually ran: "sm" = slot-major Pallas kernel path,
    # "pt" = XLA table fallback, ~3-13x slower (VERDICT.md r2 weak #8 asked
    # for the silent fallback to be visible in bench output)
    from blub_tpu.sim.slot_major import SlotMajorTable

    layout = "sm" if isinstance(state.table, SlotMajorTable) else "pt(slow fallback)"
    quality = physics_quality(state, params.solver_vel.error_tolerance)
    return {
        "layout": layout,
        "metric": f"sim steps/sec (dt=1/120 frames, CFL-substepped), {x}x{y}x{z} grid, {n0} particles, 1 chip",
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / 120.0, 3),
        "ms_per_step": round(1000.0 * wall / frames, 2),
        "compile_s": round(compile_s, 1),
        "particles": n0,
        "substeps_per_frame": round(substeps / frames, 2),
        "lost_particles": lost,
        "lost_pct": round(100.0 * lost / n0, 3),
        **quality,
    }


def main() -> None:
    # Default: dam_halfhalf scale (the reference's standard scene:
    # 128x64x64 grid, ~1M particles; scenes/dam_halfhalf.json).
    grid = tuple(int(v) for v in os.environ.get("BLUB_BENCH_GRID", "128,64,64").split(","))
    n_steps = int(os.environ.get("BLUB_BENCH_STEPS", "32"))
    # capacity 14 (was 16): every table sweep prices ~linearly in the slot
    # dim, and the round-4 capacity sweep measured 21.13 -> 23.65 steps/s at
    # dam scale with cumulative loss 0.317% — inside the <0.5% budget the
    # honest path is held to (PERF.md round 4). K=12 is past the knee
    # (30.2 steps/s but 5.8% loss). The reference's linked lists have no
    # per-cell bound, so K is this rebuild's own accuracy/speed knob.
    capacity = int(os.environ.get("BLUB_BENCH_CAPACITY", "14"))
    batch = int(os.environ.get("BLUB_BENCH_BATCH", "16"))
    cfl = float(os.environ.get("BLUB_BENCH_CFL", "1.9"))
    raw = bool(os.environ.get("BLUB_BENCH_RAW"))
    mesh_n = int(os.environ.get("BLUB_BENCH_MESH", "0"))

    result = run_config(grid, n_steps, capacity, batch, cfl, raw, mesh_n=mesh_n)
    if mesh_n:
        result["mesh_devices"] = mesh_n

    custom = "BLUB_BENCH_GRID" in os.environ or raw or mesh_n
    if not custom and not os.environ.get("BLUB_BENCH_NO_HIGHRES"):
        try:
            hr = run_config((256, 128, 128), 16, capacity, 16, min(cfl, 1.5), raw=False)
            hr["vs_baseline"] = round(hr["value"] / 60.0, 3)  # >60 steps/s north star
        except Exception as e:  # keep the headline line no matter what
            hr = {"error": f"{type(e).__name__}: {e}"[:300]}
        result["highres"] = hr

    print(json.dumps(result))


def _sync(state) -> None:
    # block_until_ready is unreliable on the tunneled platform; fetching a
    # scalar forces completion of the dependency chain.
    import jax

    float(jax.device_get(state.stats_vel.error))


if __name__ == "__main__":
    main()
