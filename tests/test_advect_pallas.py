"""Pallas advect/correct kernels (interpret mode) vs the slot-major oracles."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.ops.pallas_advect import advect_sm_pallas, correct_sm_pallas
from blub_tpu.sim import table as T
from blub_tpu.sim.dense_transfer import marker_from_table
from blub_tpu.sim.slot_major import from_table, to_table
from blub_tpu.sim.sm_phases import advect_slot_major, correct_slot_major

G = (16, 16, 16)


def _table(k=8, seed=0):
    pos = add_fluid_cube(G, (1, 1, 1), (9, 8, 15), 10**9)
    tab = T.from_positions(pos, G, k)
    rng = np.random.default_rng(seed)
    return dataclasses.replace(
        tab,
        vel=jnp.asarray(rng.standard_normal(np.asarray(tab.vel).shape).astype(np.float32) * 5),
        affine=jnp.asarray(rng.standard_normal(np.asarray(tab.affine).shape).astype(np.float32)),
    )


def _grids(seed=1):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.standard_normal(G).astype(np.float32) * 20) for _ in range(3))


def _solids():
    occ = np.zeros(G, np.float32)
    occ[6:9, 2:5, 6:9] = 1.0
    sv = np.zeros(G + (3,), np.float32)
    sv[6:9, 2:5, 6:9] = (12.0, 4.0, -2.0)
    return jnp.asarray(occ), jnp.asarray(sv)


def _assert_tables_close(ref_sm, got_sm, pos_only=False):
    ref, got = to_table(ref_sm), to_table(got_sm)
    valid = np.asarray(ref.valid)
    np.testing.assert_array_equal(valid, np.asarray(got.valid))
    # one rel16 quantum (2^-13): the kernel and the XLA twin compute new_pos
    # with different op order (1 f32 ulp apart at worst, as before round 5);
    # when such a pair straddles a quantize_pos rounding boundary the stored
    # values differ by one quantum. The fused-path tests below remain
    # BIT-exact (same kernel on both sides).
    np.testing.assert_allclose(
        np.asarray(ref.pos)[valid], np.asarray(got.pos)[valid], atol=1.3e-4
    )
    if not pos_only:
        # vel/affine are bf16-quantized by both sides from f32 values that
        # differ by op order -> up to 1 bf16 ulp apart
        np.testing.assert_allclose(
            np.asarray(ref.vel)[valid], np.asarray(got.vel)[valid],
            rtol=1e-2, atol=1e-2,
        )
        np.testing.assert_allclose(
            np.asarray(ref.affine)[valid], np.asarray(got.affine)[valid],
            rtol=1e-2, atol=1e-2,
        )
    # invalid slots and z padding must stay exactly zero
    # integer views: a valid slot's rel16/bf16 bit patterns can alias NaN as
    # f32, and NaN * False = NaN would trip np.any on the float view
    inval = (np.asarray(got_sm.posq[:, 1:2]).view(np.int32) & 1) == 0
    assert not np.any(np.asarray(got_sm.posq).view(np.int32) * inval)
    assert not np.any(np.asarray(got_sm.dyn).view(np.int32) * inval)


def test_advect_kernel_matches_oracle():
    sm = from_table(_table())
    vel = _grids()
    dt = 1.0 / 120.0
    ref = advect_slot_major(sm, vel, None, None, dt)
    got = advect_sm_pallas(sm, vel, None, None, dt, interpret=True)
    _assert_tables_close(ref, got)


def test_advect_kernel_matches_oracle_solids():
    sm = from_table(_table(seed=4))
    vel = _grids(seed=5)
    occ, sv = _solids()
    dt = 1.0 / 120.0
    ref = advect_slot_major(sm, vel, occ, sv, dt)
    got = advect_sm_pallas(sm, vel, occ, sv, dt, interpret=True)
    _assert_tables_close(ref, got)


def test_advect_kernel_traced_dt():
    """dt rides in SMEM, so a traced dt (on-device CFL substepping) works."""
    import jax

    sm = from_table(_table(seed=6))
    vel = _grids(seed=7)

    def run(dt):
        return advect_sm_pallas(sm, vel, None, None, dt, interpret=True)

    dt = jnp.float32(1.0 / 120.0)
    ref = advect_slot_major(sm, vel, None, None, float(dt))
    got = jax.jit(run)(dt)
    _assert_tables_close(ref, got)


def test_correct_kernel_matches_oracle():
    tab = _table(seed=2)
    sm = from_table(tab)
    change = tuple(g * 0.002 for g in _grids(3))
    marker = marker_from_table(tab, None)
    ref = correct_slot_major(sm, change, marker)
    got = correct_sm_pallas(sm, change, marker, interpret=True)
    _assert_tables_close(ref, got, pos_only=True)


def test_advect_pack_fused_is_bit_exact():
    """Fused advect+x-pack (+ yz stage) must be BIT-identical to
    advect_sm_pallas -> rebin_slot_major: the pack is a per-output-cell
    function of identically computed candidates, so fusion may not change a
    single bit (positions drive the bin invariant)."""
    from blub_tpu.ops.pallas_advect import advect_pack_sm_pallas
    from blub_tpu.ops.pallas_rebin import (
        default_slack,
        rebin_slot_major,
        rebin_yz_slot_major,
    )

    for seed, with_solids in ((0, False), (4, True)):
        sm = from_table(_table(seed=seed))
        vel = _grids(seed=seed + 1)
        occ, sv = _solids() if with_solids else (None, None)
        dt = 1.0 / 60.0  # bigger dt -> more movers, both directions

        ref, ms_ref = advect_sm_pallas(
            sm, vel, occ, sv, dt, interpret=True, with_max_speed=True
        )
        n0 = sm.num_particles()
        ref = rebin_slot_major(ref, max_shift=2, interpret=True, before_count=n0)

        k = sm.capacity
        slack = default_slack((sm.posq.size + sm.dyn.size) * 4, k)
        posq, dyn, ms = advect_pack_sm_pallas(
            sm, vel, occ, sv, dt, k + slack, interpret=True
        )
        got = rebin_yz_slot_major(
            posq, dyn, sm.grid_dim, 2, k_out=k, lost=sm.lost,
            before_count=n0, interpret=True,
        )

        np.testing.assert_array_equal(np.asarray(ref.posq), np.asarray(got.posq))
        np.testing.assert_array_equal(np.asarray(ref.dyn), np.asarray(got.dyn))
        assert int(ref.lost) == int(got.lost)
        np.testing.assert_array_equal(np.asarray(ms_ref), np.asarray(ms))


def test_correct_pack_fused_is_bit_exact():
    """Same bit-exactness contract for the fused correct+x-pack (s=1)."""
    from blub_tpu.ops.pallas_advect import correct_pack_sm_pallas
    from blub_tpu.ops.pallas_rebin import (
        default_slack,
        rebin_slot_major,
        rebin_yz_slot_major,
    )

    sm = from_table(_table(seed=7))
    rng = np.random.default_rng(8)
    # position-change field big enough to push particles across bins
    change = tuple(
        jnp.asarray(rng.standard_normal(G).astype(np.float32) * 30) for _ in range(3)
    )
    marker = marker_from_table(to_table(sm), None)

    ref = correct_sm_pallas(sm, change, marker, interpret=True)
    n0 = sm.num_particles()
    ref = rebin_slot_major(ref, max_shift=1, interpret=True, before_count=n0)

    k = sm.capacity
    slack = default_slack((sm.posq.size + sm.dyn.size) * 4, k)
    posq, dyn = correct_pack_sm_pallas(sm, change, marker, k + slack, interpret=True)
    got = rebin_yz_slot_major(
        posq, dyn, sm.grid_dim, 1, k_out=k, lost=sm.lost,
        before_count=n0, interpret=True,
    )

    np.testing.assert_array_equal(np.asarray(ref.posq), np.asarray(got.posq))
    np.testing.assert_array_equal(np.asarray(ref.dyn), np.asarray(got.dyn))
    assert int(ref.lost) == int(got.lost)
