"""TPU smoke + micro-bench for the pack-on-read fused kernels.

Builds a dam-scale mid stage (internal dims 64x64x128, K=16, k_mid=18),
runs each fused consumer against its unfused composition, checks outputs
bitwise on-device, and times both (batched lax.scan-free loop, sync by
device_get — block_until_ready does not block on axon).

Usage: python scripts/tpu_packread_smoke.py [--grid 64,64,128] [--k 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="64,64,128")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--kmid", type=int, default=18)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", default="", help="comma list: p2g,den,cor")
    args = ap.parse_args()
    grid = tuple(int(v) for v in args.grid.split(","))
    K, KM = args.k, args.kmid
    only = set(args.only.split(",")) if args.only else {"p2g", "den", "cor"}

    import jax
    import jax.numpy as jnp

    import blub_tpu  # noqa: F401  (persistent compile cache setup)
    from blub_tpu.core.seeding import add_fluid_cube
    from blub_tpu.core.types import CELL_FLUID, CELL_SOLID
    from blub_tpu.ops import pallas_packread as PR
    from blub_tpu.ops.pallas_advect import correct_pack_sm_pallas
    from blub_tpu.ops.pallas_p2g import p2g_density_pallas, p2g_raw_accumulators
    from blub_tpu.ops.pallas_rebin import _rebin_stage_x, rebin_yz_slot_major
    from blub_tpu.sim import table as T
    from blub_tpu.sim.slot_major import SlotMajorTable, from_table

    X, Y, Z = grid
    pos = add_fluid_cube(grid, (1, 1, 1), (X // 2, Y // 2, Z - 1), 10**9)
    print(f"grid={grid} K={K} k_mid={KM} particles={pos.shape[0]}")
    tab = T.from_positions(pos, grid, K)
    rng = np.random.default_rng(0)
    import dataclasses

    tab = dataclasses.replace(
        tab,
        vel=jnp.asarray(rng.standard_normal(np.asarray(tab.vel).shape).astype(np.float32) * 10),
        affine=jnp.asarray(rng.standard_normal(np.asarray(tab.affine).shape).astype(np.float32) * 0.1),
        pos=jnp.asarray(
            np.clip(
                np.asarray(tab.pos)
                + (rng.random(np.asarray(tab.pos).shape).astype(np.float32) * 2 - 1)
                * 0.9
                * np.asarray(tab.valid)[..., None],
                1.001,
                np.asarray(grid, np.float32) - 1.001,
            )
        ),
    )
    sm = from_table(tab)
    n0 = int(np.sum(np.asarray(tab.valid)))

    def sync(x):
        return float(jax.device_get(jnp.sum(x[:1, :1, :1])))

    def bench(fn, label, *a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        _ = float(jax.device_get(jnp.max(jnp.abs(leaves[0][..., :1]))))
        t0 = time.time()
        for _i in range(args.iters):
            out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        _ = float(jax.device_get(jnp.max(jnp.abs(leaves[0][..., :1]))))
        dt = (time.time() - t0) / args.iters * 1000
        print(f"  {label}: {dt:.2f} ms")
        return out, dt

    from blub_tpu.ops.pallas_rebin import _BUDGET, _pick_blocks_x

    for s in (1, 2):
        if s == 1 and "p2g" not in only:
            continue
        if s == 2 and not ({"den", "cor"} & only):
            continue
        t0 = time.time()
        bxx, byx = _pick_blocks_x(K, KM, X, Y, s, sm.zp, _BUDGET)
        posq_mid, dyn_mid = _rebin_stage_x(
            sm.posq, sm.dyn, s=s, k_out=KM, dim_a=X, bx=bxx, by=byx
        )
        _ = sync(posq_mid)
        print(f"x-stage s={s} built (compile+run {time.time()-t0:.1f}s)")

        def unfused_tab(pm=posq_mid, dm=dyn_mid, s=s):
            return rebin_yz_slot_major(
                pm, dm, grid, s, k_out=K, lost=jnp.int32(0),
                before_count=jnp.int32(n0),
            )

        ref_tab, t_yz = bench(unfused_tab, f"rebin_yz s={s}")

        if s == 1 and "p2g" in only:
            def unfused_p2g(t=ref_tab):
                return p2g_raw_accumulators(t, with_density=False)

            ref_acc, t_p2g = bench(unfused_p2g, "plain p2g")

            def fused(pm=posq_mid, dm=dyn_mid):
                return PR.p2g_pack_read(pm, dm, grid, s=1, k_out=K)

            (acc, pq, dy, cnt), t_f = bench(fused, "FUSED p2g_pack_read")
            print(f"  -> fused {t_f:.2f} vs unfused {t_yz + t_p2g:.2f} ms")
            eq_acc = bool(jax.device_get(jnp.all(acc == ref_acc)))
            eq_p = bool(jax.device_get(jnp.all(pq == ref_tab.posq)))
            eq_d = bool(jax.device_get(jnp.all(dy == ref_tab.dyn)))
            lost = int(jax.device_get(ref_tab.lost))
            ok_cnt = int(jax.device_get(jnp.sum(cnt))) == n0 - lost
            print(
                f"  bitexact acc={eq_acc} posq={eq_p} dyn={eq_d} "
                f"cnt={ok_cnt} (scenario lost={lost})"
            )

        if s == 2 and "den" in only:
            def unfused_den(t=ref_tab):
                return p2g_density_pallas(t, with_fluid=True)

            (ref_den, ref_fl), t_den = bench(unfused_den, "plain p2g_density")

            def fused_den(pm=posq_mid):
                return PR.density_pack_read(pm, grid, s=2, k_out=K)

            (den, fl), t_fd = bench(fused_den, "FUSED density_pack_read")
            print(f"  -> fused {t_fd:.2f} vs unfused {t_yz + t_den:.2f} ms")
            eq1 = bool(jax.device_get(jnp.all(den == ref_den)))
            eq2 = bool(jax.device_get(jnp.all(fl == ref_fl)))
            print(f"  bitexact den={eq1} fluid={eq2}")

        if s == 2 and "cor" in only:
            ch = [
                jnp.asarray(rng.standard_normal(grid).astype(np.float32) * 0.2)
                for _ in range(3)
            ]
            m = np.full(grid, CELL_FLUID, np.int32)
            m[0], m[-1] = CELL_SOLID, CELL_SOLID
            m[:, 0], m[:, -1] = CELL_SOLID, CELL_SOLID
            m[:, :, 0], m[:, :, -1] = CELL_SOLID, CELL_SOLID
            mk = jnp.asarray(m)

            def unfused_cor(t=ref_tab):
                return correct_pack_sm_pallas(t, ch, mk, KM)

            (ref_p, ref_d), t_cor = bench(unfused_cor, "correct+xpack")

            def fused_cor(pm=posq_mid, dm=dyn_mid):
                return PR.correct_pack_read(
                    pm, dm, ch, mk, grid, s_in=2, k_pk=K, k_out=KM
                )

            (gp, gd, cnt), t_fc = bench(fused_cor, "FUSED correct_pack_read")
            print(f"  -> fused {t_fc:.2f} vs unfused {t_yz + t_cor:.2f} ms")
            eq1 = bool(jax.device_get(jnp.all(gp == ref_p)))
            eq2 = bool(jax.device_get(jnp.all(gd == ref_d)))
            lost = int(jax.device_get(ref_tab.lost))
            print(
                f"  bitexact posq={eq1} dyn={eq2} "
                f"cnt={int(jax.device_get(jnp.sum(cnt)))}=={n0}-{lost}"
            )


if __name__ == "__main__":
    main()
