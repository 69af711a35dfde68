"""Pack-on-read fused consumer kernels vs their unfused compositions.

The contract (ops/pallas_packread.py): each fused kernel is BIT-IDENTICAL to
"standalone rebin_yz, then the consumer" —

  p2g_pack_read(mid)     == p2g_raw_accumulators(rebin_yz(mid))  (acc)
                            and its table by-product == rebin_yz(mid)
  density_pack_read(mid) == p2g_density_pallas(rebin_yz(mid), with_fluid)
  correct_pack_read(mid) == correct_pack_sm_pallas(rebin_yz(mid), ...)

including overflow drops (every pack re-derives the same per-cell victims).
All in interpret mode on CPU (tests/conftest.py forces the CPU backend).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.core.types import CELL_FLUID, CELL_SOLID
from blub_tpu.ops import pallas_packread as PR
from blub_tpu.ops.pallas_advect import correct_pack_sm_pallas
from blub_tpu.ops.pallas_p2g import p2g_density_pallas, p2g_raw_accumulators
from blub_tpu.ops.pallas_rebin import _rebin_stage_x, rebin_yz_slot_major
from blub_tpu.sim import table as T
from blub_tpu.sim.slot_major import SlotMajorTable, from_table

G = (16, 16, 16)


def _mid_stage(grid=G, k=10, k_mid=14, seed=0, scale=0.9, fill=(9, 8, 15), s=1):
    """Build an x-packed mid stage the way the producers do: seed a table
    (subsampled to ~1/3 so random moves don't overflow k), move positions by
    <= scale cells, then run the standalone x rebin stage.
    Returns (posq_mid, dyn_mid, before_count)."""
    pos = add_fluid_cube(grid, (1, 1, 1), fill, 10**9)
    pos = pos[np.random.default_rng(99).permutation(pos.shape[0])[: pos.shape[0] // 3]]
    tab = T.from_positions(pos, grid, k)
    rng = np.random.default_rng(seed)
    tab = dataclasses.replace(
        tab,
        vel=jnp.asarray(
            rng.standard_normal(np.asarray(tab.vel).shape).astype(np.float32) * 10
        ),
        affine=jnp.asarray(
            rng.standard_normal(np.asarray(tab.affine).shape).astype(np.float32)
        ),
    )
    move = (rng.random(np.asarray(tab.pos).shape) * 2 - 1).astype(np.float32) * scale
    newpos = np.clip(
        np.asarray(tab.pos) + move * np.asarray(tab.valid)[..., None],
        1.001,
        np.asarray(grid, np.float32) - 1.001,
    )
    tab = dataclasses.replace(tab, pos=jnp.asarray(newpos))
    sm = from_table(tab)
    posq, dyn = _rebin_stage_x(
        sm.posq, sm.dyn, s=s, k_out=k_mid, dim_a=grid[0], bx=8, by=8,
        interpret=True,
    )
    return posq, dyn, int(np.sum(np.asarray(tab.valid)))


def _reference_table(posq_mid, dyn_mid, grid, s, k_out, before):
    return rebin_yz_slot_major(
        posq_mid, dyn_mid, grid, s, k_out=k_out, lost=jnp.int32(0),
        before_count=jnp.int32(before), interpret=True,
    )


def test_p2g_pack_read_matches_unfused():
    k, k_mid, s = 10, 14, 1
    posq_mid, dyn_mid, n0 = _mid_stage(k=k, k_mid=k_mid, s=s)
    ref_tab = _reference_table(posq_mid, dyn_mid, G, s, k, n0)
    assert int(ref_tab.lost) == 0
    ref_acc = p2g_raw_accumulators(ref_tab, interpret=True, with_density=False)

    assert PR.supports_consume(G, k_mid, k, False)
    acc, posq, dyn, cnt = PR.p2g_pack_read(
        posq_mid, dyn_mid, G, s=s, k_out=k, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(ref_acc))
    np.testing.assert_array_equal(np.asarray(posq), np.asarray(ref_tab.posq))
    np.testing.assert_array_equal(np.asarray(dyn), np.asarray(ref_tab.dyn))
    assert int(np.sum(np.asarray(cnt))) == n0


def test_density_pack_read_matches_unfused():
    k, k_mid, s = 10, 14, 2
    posq_mid, dyn_mid, n0 = _mid_stage(k=k, k_mid=k_mid, s=s, scale=1.9, seed=1)
    ref_tab = _reference_table(posq_mid, dyn_mid, G, s, k, n0)
    assert int(ref_tab.lost) == 0
    ref_den, ref_fl = p2g_density_pallas(ref_tab, interpret=True, with_fluid=True)

    assert PR.supports_consume(G, k_mid, k, True)
    den, fl = PR.density_pack_read(posq_mid, G, s=s, k_out=k, interpret=True)
    np.testing.assert_array_equal(np.asarray(den), np.asarray(ref_den))
    np.testing.assert_array_equal(np.asarray(fl), np.asarray(ref_fl))


def _change_and_marker(grid, seed=7):
    rng = np.random.default_rng(seed)
    change = [
        jnp.asarray(rng.standard_normal(grid).astype(np.float32) * 0.3)
        for _ in range(3)
    ]
    m = np.full(grid, CELL_FLUID, np.int32)
    m[0, :, :] = m[-1, :, :] = CELL_SOLID
    m[:, 0, :] = m[:, -1, :] = CELL_SOLID
    m[:, :, 0] = m[:, :, -1] = CELL_SOLID
    m[5:8, 4:9, 6:9] = CELL_SOLID  # an interior obstacle the clamp must see
    return change, jnp.asarray(m)


def test_correct_pack_read_matches_unfused():
    k, k_mid, s = 10, 14, 2
    posq_mid, dyn_mid, n0 = _mid_stage(k=k, k_mid=k_mid, s=s, scale=1.9, seed=2)
    ref_tab = _reference_table(posq_mid, dyn_mid, G, s, k, n0)
    assert int(ref_tab.lost) == 0
    change, marker = _change_and_marker(G)
    ref_p, ref_d = correct_pack_sm_pallas(
        ref_tab, change, marker, k_mid, interpret=True
    )

    assert PR.supports_correct(G, k_mid, k, k_mid)
    got_p, got_d, cnt = PR.correct_pack_read(
        posq_mid, dyn_mid, change, marker, G, s_in=s, k_pk=k, k_out=k_mid,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))
    assert int(np.sum(np.asarray(cnt))) == n0


def test_pack_read_overflow_drops_match():
    """Cram particles so cells overflow: the fused packs must re-derive the
    standalone rebin's drops exactly (same victims — the pack is a pure
    per-cell function), so the table by-product stays bit-identical."""
    k, k_mid, s = 4, 8, 2
    grid = G
    pos = add_fluid_cube(grid, (1, 1, 1), (9, 8, 15), 10**9)
    tab = T.from_positions(pos, grid, k)
    p = np.asarray(tab.pos)
    target = np.asarray([4.3, 4.3, 4.3], np.float32)
    d = np.clip(target - p, -1.9, 1.9)
    newpos = np.clip(p + d * np.asarray(tab.valid)[..., None], 1.001, 14.999)
    tab = dataclasses.replace(tab, pos=jnp.asarray(newpos))
    sm = from_table(tab)
    posq_mid, dyn_mid = _rebin_stage_x(
        sm.posq, sm.dyn, s=s, k_out=k_mid, dim_a=grid[0], bx=8, by=8,
        interpret=True,
    )
    n0 = int(np.sum(np.asarray(tab.valid)))
    ref_tab = _reference_table(posq_mid, dyn_mid, grid, s, k, n0)
    assert int(ref_tab.lost) > 0  # the scenario really overflows

    acc, posq, dyn, cnt = PR.p2g_pack_read(
        posq_mid, dyn_mid, grid, s=s, k_out=k, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(posq), np.asarray(ref_tab.posq))
    np.testing.assert_array_equal(np.asarray(dyn), np.asarray(ref_tab.dyn))
    assert n0 - int(np.sum(np.asarray(cnt))) == int(ref_tab.lost)

    den, fl = PR.density_pack_read(posq_mid, grid, s=s, k_out=k, interpret=True)
    ref_den, ref_fl = p2g_density_pallas(ref_tab, interpret=True, with_fluid=True)
    np.testing.assert_array_equal(np.asarray(den), np.asarray(ref_den))
    np.testing.assert_array_equal(np.asarray(fl), np.asarray(ref_fl))
