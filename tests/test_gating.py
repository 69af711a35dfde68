"""Occupancy-gated slot transport equivalence (ops/pallas_rebin.py round 3).

The gated kernels (capacity > _G0 = 8) skip window DMA and per-group compute
for slot groups with no valid particle in a block's window. These tests build
tables where the UPPER slot groups are genuinely occupied in SOME blocks and
empty in others — exercising both branches of every gate — and specifically
place upper-group particles in block HALO regions moving into blocks whose own
group is empty (the failure mode block_group_mask's window clamp must prevent:
a too-small mask window would zero-fill real arrivals and silently drop them).

No reference analog: the dense slot table and its gating are original TPU
design (the reference's binning is a compacted linked list,
shader/simulation/particle_binning*.comp).
"""

import collections
import dataclasses

import jax.numpy as jnp
import numpy as np

from blub_tpu.ops.pallas_advect import advect_sm_pallas, correct_sm_pallas
from blub_tpu.ops.pallas_p2g import p2g_density_pallas, p2g_velocity_density_pallas
from blub_tpu.ops.pallas_rebin import _G0, group_ranges, rebin_slot_major, supports
from blub_tpu.sim import table as T
from blub_tpu.sim.dense_transfer import (
    marker_from_table,
    p2g_density_dense,
    p2g_velocity_dense,
)
from blub_tpu.sim.slot_major import from_table, to_table
from blub_tpu.sim.sm_phases import advect_slot_major, correct_slot_major

G = (16, 16, 16)
K = 16
GRAV = (0.0, -981.0, 0.0)
DT = 1.0 / 120.0


def _crowded_table(seed=0, k=K):
    """Table whose upper slot groups are occupied only in chosen spots:

      * a 12-deep region straddling the x=7/8 and y=7/8 kernel-block
        boundaries (rebin/advect blocks are 8x8 at this grid) -> group 2
        (slots 8-11) ON for the four adjacent blocks, via their windows;
      * one 14-deep cell column at the far corner -> group 3 (slots 12-13)
        ON in exactly one block;
      * a sparse 3-deep region elsewhere -> all upper groups OFF there.
    """
    rng = np.random.default_rng(seed)
    chunks = []

    def cells(xr, yr, zr, per_cell):
        for x in xr:
            for y in yr:
                for z in zr:
                    base = np.array([x, y, z], np.float32)
                    chunks.append(
                        rng.uniform(base + 0.55, base + 1.45, size=(per_cell, 3))
                    )

    cells(range(6, 10), range(6, 10), range(4, 8), 12)  # straddles both splits
    cells(range(14, 15), range(14, 15), range(14, 15), 14)
    cells(range(2, 4), range(10, 13), range(2, 5), 3)
    pos = np.concatenate(chunks).astype(np.float32)
    tab = T.from_positions(pos, G, k)
    return dataclasses.replace(
        tab,
        vel=jnp.asarray(
            rng.standard_normal(np.asarray(tab.vel).shape).astype(np.float32) * 10
        ),
        affine=jnp.asarray(
            rng.standard_normal(np.asarray(tab.affine).shape).astype(np.float32)
        ),
    )


def _cell_multiset(tab):
    pos = np.asarray(tab.pos)
    vel = np.asarray(tab.vel)
    aff = np.asarray(tab.affine).reshape(pos.shape[:4] + (9,))
    valid = np.asarray(tab.valid)
    rows = np.concatenate([pos, vel, aff], axis=-1)
    out = collections.Counter()
    for x, y, z, q in np.argwhere(valid):
        out[(x, y, z, rows[x, y, z, q].tobytes())] += 1
    return out


def _quantized(tab):
    return to_table(from_table(tab))


def test_gating_scenario_really_gates():
    """The crowded table must occupy upper groups somewhere (else every test
    below silently degrades to the ungated branch)."""
    sm = from_table(_crowded_table())
    assert len(group_ranges(sm.capacity)) > 1
    validb = np.asarray(sm.posq[:, 1]).view(np.int32) & 1  # rel16 valid bit
    per_cell = validb.sum(axis=0)
    assert per_cell.max() >= 14  # group 3 occupied somewhere
    assert (per_cell == 12).any() and (per_cell == 3).any()
    upper = (np.asarray(sm.posq[_G0:, 1]).view(np.int32) & 1).any(axis=(0, 3)) > 0  # [X, Y]
    assert upper.any() and not upper.all()


def test_gated_rebin_matches_oracle():
    """Multiset equivalence with movers crossing the block splits both ways,
    including upper-slot particles leaving a crowded block for one whose own
    upper groups are empty (arrivals ride the halo window; a wrong gate mask
    drops them)."""
    assert supports(G, K, 2)
    tab = _crowded_table()
    rng = np.random.default_rng(3)
    move = (rng.random(np.asarray(tab.pos).shape) * 2 - 1).astype(np.float32) * 1.9
    # rel16 grid (sim/slot_major.quantize_pos)
    newpos = np.clip(
        np.asarray(tab.pos) + move * np.asarray(tab.valid)[..., None],
        1.001,
        np.asarray(G, np.float32) - 1.001,
    )
    newpos = (np.round(newpos * np.float32(8192.0)) * np.float32(2.0 ** -13)).astype(np.float32)
    tab = dataclasses.replace(tab, pos=jnp.asarray(newpos))
    ref = _quantized(T.rebin(tab, max_shift=2))
    got = to_table(rebin_slot_major(from_table(tab), 2, interpret=True))
    assert int(ref.lost) == 0, "scenario overflowed; equivalence would be vacuous"
    assert int(got.lost) == 0
    a, b = _cell_multiset(ref), _cell_multiset(got)
    assert a == b, f"multiset mismatch: only-ref={len(a - b)} only-kernel={len(b - a)}"


def _assert_tables_close(ref_sm, got_sm, pos_only=False):
    ref, got = to_table(ref_sm), to_table(got_sm)
    valid = np.asarray(ref.valid)
    np.testing.assert_array_equal(valid, np.asarray(got.valid))
    # one rel16 quantum — see test_advect_pallas._assert_tables_close
    np.testing.assert_allclose(
        np.asarray(ref.pos)[valid], np.asarray(got.pos)[valid], atol=1.3e-4
    )
    if not pos_only:
        np.testing.assert_allclose(
            np.asarray(ref.vel)[valid], np.asarray(got.vel)[valid],
            rtol=1e-2, atol=1e-2,
        )
        np.testing.assert_allclose(
            np.asarray(ref.affine)[valid], np.asarray(got.affine)[valid],
            rtol=1e-2, atol=1e-2,
        )
    # integer views: a valid slot's rel16/bf16 bit patterns can alias NaN as
    # f32, and NaN * False = NaN would trip np.any on the float view
    inval = (np.asarray(got_sm.posq[:, 1:2]).view(np.int32) & 1) == 0
    assert not np.any(np.asarray(got_sm.posq).view(np.int32) * inval)
    assert not np.any(np.asarray(got_sm.dyn).view(np.int32) * inval)


def test_gated_advect_matches_oracle():
    sm = from_table(_crowded_table(seed=4))
    rng = np.random.default_rng(5)
    vel = tuple(
        jnp.asarray(rng.standard_normal(G).astype(np.float32) * 20) for _ in range(3)
    )
    ref = advect_slot_major(sm, vel, None, None, 1.0 / 60.0)
    got = advect_sm_pallas(sm, vel, None, None, 1.0 / 60.0, interpret=True)
    _assert_tables_close(ref, got)


def test_gated_advect_max_speed_matches_oracle():
    """CFL substepping reads the advect kernel's max-speed by-product; a gate
    that skipped an OCCUPIED group would understate it and under-substep
    (mass loss downstream). The crowded table occupies gated groups, so the
    kernel's ms must match the oracle's max particle speed over ALL slots.
    (Advection is pure APIC — particle velocity is REGENERATED from the grid
    each step — so the oracle max is computed from the oracle's outputs, not
    from planted particle velocities.)"""
    sm = from_table(_crowded_table(seed=6))
    rng = np.random.default_rng(11)
    vel = tuple(
        jnp.asarray(rng.standard_normal(G).astype(np.float32) * 30) for _ in range(3)
    )
    ref = to_table(advect_slot_major(sm, vel, None, None, DT))
    valid = np.asarray(ref.valid)
    vref = np.asarray(ref.vel)[valid]
    expect = float(np.sqrt((vref * vref).sum(axis=1).max()))
    _, ms = advect_sm_pallas(
        sm, vel, None, None, DT, interpret=True, with_max_speed=True
    )
    # oracle velocities round-trip bf16 packing; the kernel ms is f32 exact
    assert expect > 10.0  # scenario sanity: something actually moves fast
    np.testing.assert_allclose(float(ms), expect, rtol=2e-2)


def test_gated_correct_matches_oracle():
    tab = _crowded_table(seed=7)
    sm = from_table(tab)
    rng = np.random.default_rng(8)
    change = tuple(
        jnp.asarray(rng.standard_normal(G).astype(np.float32) * 0.05)
        for _ in range(3)
    )
    marker = marker_from_table(tab, None)
    ref = correct_slot_major(sm, change, marker)
    got = correct_sm_pallas(sm, change, marker, interpret=True)
    _assert_tables_close(ref, got, pos_only=True)


def test_gated_p2g_matches_dense():
    tab = _crowded_table(seed=9)
    marker = marker_from_table(tab, None)
    vel_ref = p2g_velocity_dense(tab, marker, GRAV, DT)
    vel_p, _ = p2g_velocity_density_pallas(tab, marker, GRAV, DT, interpret=True)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(vel_ref[c]), np.asarray(vel_p[c]), rtol=1e-2, atol=5e-2
        )


def test_gated_density_matches_dense():
    tab = _crowded_table(seed=10)
    rho_ref = p2g_density_dense(tab)
    rho_p = p2g_density_pallas(tab, interpret=True)
    np.testing.assert_allclose(np.asarray(rho_ref), np.asarray(rho_p), atol=1e-5)
