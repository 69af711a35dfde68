"""Calibrate the sharded-vs-single per-step position-drift envelope used by
tests/test_sharding.py::test_sharded_drift_bounded. Runs the same 30-step
dam-through-moving-solid flow on the virtual 8-device CPU mesh and prints the
per-step p50/p95/max sorted-position error (grid cells). The test's envelope
is pinned at ~10x these values.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      PYTHONPATH=. python scripts/calibrate_shard_drift.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from test_sharding import _setup, _solids  # noqa: E402


def main():
    from blub_tpu.parallel.sharding import make_mesh, shard_state, state_shardings
    from blub_tpu.sim.step_dense import step_dense
    from blub_tpu.sim.table import to_positions

    params, state = _setup()
    solids = _solids(params.grid_dim)
    mesh = make_mesh(8)
    shardings = state_shardings(mesh, state)
    step_sharded = jax.jit(
        lambda s: step_dense(params, s, solids),
        in_shardings=(shardings,), out_shardings=shardings,
    )
    step_single = jax.jit(lambda s: step_dense(params, s, solids))

    ref, out = state, shard_state(mesh, state)
    print(f"{'step':>4} {'p50':>12} {'p95':>12} {'max':>12}")
    for i in range(30):
        ref = step_single(ref)
        out = step_sharded(out)
        p_ref = np.sort(to_positions(ref.table), axis=0)
        p_out = np.sort(to_positions(jax.device_get(out).table), axis=0)
        err = np.abs(p_ref - p_out).max(axis=1)
        print(
            f"{i:>4} {np.percentile(err, 50):12.3e} "
            f"{np.percentile(err, 95):12.3e} {err.max():12.3e}"
        )


if __name__ == "__main__":
    main()
