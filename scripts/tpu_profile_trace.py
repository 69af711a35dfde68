"""Per-phase device-time attribution of the REAL fused step via XLA profiler
traces (VERDICT.md r2 missing #2): no standalone re-dispatch, no ~ms per-phase
dispatch overhead — jax.named_scope tags in sim/step_dense.py ride the HLO op
metadata into the trace's device lanes and are aggregated by
runtime/profiler.py::profile_trace.

Run on the TPU box:  python scripts/tpu_profile_trace.py [x,y,z]
Prints a phase table (ms per raw fixed-dt step) and writes the raw trace dir.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.core.types import SimParams
from blub_tpu.runtime.profiler import profile_trace
from blub_tpu.sim.axis_layout import choose_perm, permute_params, permute_positions
from blub_tpu.sim.step_dense import make_dense_state, multi_step_dense


def main():
    grid = tuple(
        int(v) for v in (sys.argv[1] if len(sys.argv) > 1 else "128,64,64").split(",")
    )
    steps = int(os.environ.get("BLUB_PROFILE_STEPS", "8"))
    x, y, z = grid
    pos = add_fluid_cube(grid, (1, 1, 1), (x // 2, y // 2, z - 1), 10**9)
    params = SimParams(
        grid_dim=grid, dt=1.0 / 120.0, gravity_grid=(0.0, -981.0, 0.0),
        num_particles=pos.shape[0],
    )
    perm = choose_perm(grid)
    params = permute_params(params, perm)
    pos = permute_positions(pos, perm)
    capacity = int(os.environ.get("BLUB_PROFILE_CAPACITY", "14"))  # bench default
    state = make_dense_state(params, pos, capacity=capacity)

    fn = jax.jit(lambda s: multi_step_dense(params, s, steps))
    t0 = time.time()
    state = fn(state)
    float(jax.device_get(state.stats_vel.error))
    print(f"# compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    state = fn(state)  # settle
    float(jax.device_get(state.stats_vel.error))

    log_dir = os.environ.get("BLUB_TRACE_DIR", "/tmp/blub_trace")
    phases = profile_trace(fn, state, log_dir=log_dir)
    total = sum(phases.values())
    print(f"{'phase':<18}{'ms/step':>9}  {'%':>5}   ({steps} steps/dispatch, raw dt)")
    for k, v in phases.items():
        print(f"{k:<18}{v / steps:9.3f}  {100 * v / max(total, 1e-9):5.1f}")
    print(f"{'total device':<18}{total / steps:9.3f}")
    print(f"# trace dir: {log_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
