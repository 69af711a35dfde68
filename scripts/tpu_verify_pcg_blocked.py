"""TPU verify drive: blocked beyond-VMEM PCG vs the XLA solver at north-star
internal dims (128, 128, 256) — the grid size that actually selects
solve_pressure_blocked in _step_slot_major. Prints per-solver stats and the
pressure agreement; exits nonzero on failure."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from blub_tpu.core.config import SolverConfig
from blub_tpu.core.types import CELL_AIR, CELL_FLUID, CELL_SOLID
from blub_tpu.ops import pallas_pcg, pallas_pcg_blocked
from blub_tpu.sim.pressure import solve_pressure

X, Y, Z = 128, 128, 256
DT = 1.0 / 120.0


def main():
    print("devices:", jax.devices(), flush=True)
    assert not pallas_pcg.supports((X, Y, Z)), "grid must be beyond whole-VMEM"
    assert pallas_pcg_blocked.supports((X, Y, Z)), "blocked must support grid"

    # dam-like marker: solid shell, fluid column in low-x half up to mid-y
    mk = np.full((X, Y, Z), CELL_AIR, np.int32)
    mk[0, :, :] = CELL_SOLID
    mk[-1, :, :] = CELL_SOLID
    mk[:, 0, :] = CELL_SOLID
    mk[:, -1, :] = CELL_SOLID
    mk[:, :, 0] = CELL_SOLID
    mk[:, :, -1] = CELL_SOLID
    mk[1 : X // 2, 1 : (2 * Y) // 3, 1:-1] = CELL_FLUID
    rng = np.random.default_rng(3)
    rhs = (rng.standard_normal((X, Y, Z)) * 10).astype(np.float32)
    mk_j = jnp.asarray(mk)
    rhs_j = jnp.asarray(rhs)
    p0 = jnp.zeros((X, Y, Z), jnp.float32)
    cfg = SolverConfig(error_tolerance=0.1, max_num_iterations=64, error_check_frequency=4)

    def run(tag, fn):
        def wrapped(p, r, m):
            res = fn(p, r, m, cfg, DT)
            return res.pressure, res.stats.error, res.stats.iterations

        f = jax.jit(wrapped)
        t0 = time.time()
        pr, err, iters = f(p0, rhs_j, mk_j)
        err0 = float(jax.device_get(err))
        t1 = time.time()
        n = 20
        for _ in range(n):
            pr, err, iters = f(p0, rhs_j, mk_j)
        _ = float(jax.device_get(err))
        t2 = time.time()
        it = int(jax.device_get(iters))
        print(
            f"{tag}: iters={it} err={err0:.6g} compile+first={t1-t0:.1f}s "
            f"solve={(t2-t1)/n*1000:.2f}ms",
            flush=True,
        )
        return pr, it, err0

    pr_o, it_o, err_o = run("xla_oracle", solve_pressure)
    pr_b, it_b, err_b = run(
        "blocked   ", pallas_pcg_blocked.solve_pressure_blocked
    )

    # agreement: same convergence behavior; pressure close on fluid cells
    po = jax.device_get(pr_o)
    pb = jax.device_get(pr_b)
    fl = mk == CELL_FLUID
    scale = max(np.abs(po[fl]).max(), 1e-6)
    mad = np.abs(po[fl] - pb[fl]).max() / scale
    print(f"pressure rel max-abs-diff on fluid: {mad:.3e} (scale {scale:.3g})")
    ok = (
        err_b <= 0.1 + 1e-6
        and abs(it_b - it_o) <= 8
        and mad < 5e-2
        and np.isfinite(pb).all()
    )
    print("OK" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
