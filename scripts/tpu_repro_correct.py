"""Tiny-scale TPU compile check for correct_pack_read.

Regression guard for the Mosaic sublane-replication crash: _rowok(axis=0)'s
y-constant mask used to be sliced inside _pack_core, which crashed the
compiler (`Check failed: limits[i] <= dim(i) (by/8 vs. 1)`) whenever the
kernel block had by > 8 (ops/pallas_packread.py carries the full story at
the x-pack call site). This repro picks by=16 at G=(16,16,16), so it
compiles the exact geometry that used to crash, in minutes not the ~25 min
a dam-scale compile takes.

Usage: python -u scripts/tpu_repro_correct.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import blub_tpu  # noqa: F401
    from blub_tpu.core.seeding import add_fluid_cube
    from blub_tpu.core.types import CELL_FLUID, CELL_SOLID
    from blub_tpu.ops import pallas_packread as PR
    from blub_tpu.ops.pallas_rebin import _BUDGET, _pick_blocks_x, _rebin_stage_x
    from blub_tpu.sim import table as T
    from blub_tpu.sim.slot_major import from_table

    G = (16, 16, 16)
    K = 12
    KM = 16
    pos = add_fluid_cube(G, (1, 1, 1), (9, 8, 15), 10**9)
    print(f"grid={G} K={K} KM={KM} particles={pos.shape[0]}", flush=True)
    tab = T.from_positions(pos, G, KM)
    rng = np.random.default_rng(0)
    import dataclasses

    tab = dataclasses.replace(
        tab,
        pos=jnp.asarray(
            np.clip(
                np.asarray(tab.pos)
                + (rng.random(np.asarray(tab.pos).shape).astype(np.float32) * 2 - 1)
                * 1.8
                * np.asarray(tab.valid)[..., None],
                1.001,
                np.asarray(G, np.float32) - 1.001,
            )
        ),
    )
    sm = from_table(tab)

    bxx, byx = _pick_blocks_x(KM, KM, G[0], G[1], 2, sm.zp, _BUDGET)
    pm, dm = _rebin_stage_x(sm.posq, sm.dyn, s=2, k_out=KM, dim_a=G[0], bx=bxx, by=byx)
    _ = float(jax.device_get(jnp.sum(pm[0, 3, :1, :1, :1])))
    print("x-stage done", flush=True)

    ch = [jnp.asarray(rng.standard_normal(G).astype(np.float32) * 0.2) for _ in range(3)]
    m = np.full(G, CELL_FLUID, np.int32)
    m[0], m[-1] = CELL_SOLID, CELL_SOLID
    m[:, 0], m[:, -1] = CELL_SOLID, CELL_SOLID
    m[:, :, 0], m[:, :, -1] = CELL_SOLID, CELL_SOLID
    mk = jnp.asarray(m)

    t0 = time.time()
    gp, gd, cnt = PR.correct_pack_read(pm, dm, ch, mk, G, s_in=2, k_pk=K, k_out=KM)
    s = float(jax.device_get(jnp.sum(cnt)))
    print(f"OK: cnt={s} compile+run {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
