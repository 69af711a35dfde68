"""Pallas rebin kernel vs the XLA rebin oracle (interpret mode on CPU).

Equivalence is per-cell particle MULTISETS (bit-exact rows, with the oracle's
vel/affine bf16-quantized like the packed table stores them) plus the lost
counter: slot ORDER may legitimately differ because the kernel's early-exit
is per block while the XLA oracle's is global."""

import collections
import dataclasses

import jax.numpy as jnp
import numpy as np

from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.ops.pallas_rebin import rebin_slot_major, supports
from blub_tpu.sim import table as T
from blub_tpu.sim.slot_major import from_table, to_table

G = (16, 16, 16)




def _q(pos_np):
    """Positions land on the rel16 grid (sim/slot_major.quantize_pos): every
    production position store quantizes, so perturbed fixtures must too for
    the XLA-oracle multisets to match the slot-major kernels bit for bit."""
    return (np.round(pos_np * np.float32(8192.0)) * np.float32(2.0 ** -13)).astype(np.float32)


def _table(k=8, seed=0, fill=(9, 8, 15)):
    pos = add_fluid_cube(G, (1, 1, 1), fill, 10**9)
    tab = T.from_positions(pos, G, k)
    rng = np.random.default_rng(seed)
    return dataclasses.replace(
        tab,
        vel=jnp.asarray(rng.standard_normal(np.asarray(tab.vel).shape).astype(np.float32) * 10),
        affine=jnp.asarray(rng.standard_normal(np.asarray(tab.affine).shape).astype(np.float32)),
    )


def _moved(tab, scale, seed):
    rng = np.random.default_rng(seed)
    move = (rng.random(np.asarray(tab.pos).shape) * 2 - 1).astype(np.float32) * scale
    newpos = np.clip(
        np.asarray(tab.pos) + move * np.asarray(tab.valid)[..., None],
        1.001,
        np.asarray(G, np.float32) - 1.001,
    )
    return dataclasses.replace(tab, pos=jnp.asarray(_q(newpos)))


def _cell_multiset(tab):
    """Counter of (cell, 16-channel row bytes) over valid slots."""
    pos = np.asarray(tab.pos)
    vel = np.asarray(tab.vel)
    aff = np.asarray(tab.affine).reshape(pos.shape[:4] + (9,))
    valid = np.asarray(tab.valid)
    rows = np.concatenate([pos, vel, aff], axis=-1)
    out = collections.Counter()
    idx = np.argwhere(valid)
    for x, y, z, k in idx:
        out[(x, y, z, rows[x, y, z, k].tobytes())] += 1
    return out


def _quantized(tab):
    """bf16-quantize vel/affine the way from_table does, so the f32 XLA
    oracle's multiset is comparable with the packed kernel table's."""
    return to_table(from_table(tab))


def _assert_equivalent(tab, max_shift):
    ref = _quantized(T.rebin(tab, max_shift=max_shift))
    got = to_table(rebin_slot_major(from_table(tab), max_shift, interpret=True))
    # these scenarios must not overflow — overflow victim choice is allowed
    # to differ between the pack and the oracle (covered by the dedicated
    # overflow test below), which would make the exact check vacuous
    assert int(ref.lost) == 0, "test scenario overflowed; raise capacity"
    assert int(got.lost) == int(ref.lost), (int(got.lost), int(ref.lost))
    a, b = _cell_multiset(ref), _cell_multiset(got)
    assert a == b, f"multiset mismatch: only-ref={len(a - b)} only-kernel={len(b - a)}"
    # the kernel output must keep the invariant that invalid slots are all-zero
    sm = rebin_slot_major(from_table(tab), max_shift, interpret=True)
    invalid = (np.asarray(sm.posq[:, 1:2]).view(np.int32) & 1) == 0  # rel16 valid bit
    assert not np.any(np.asarray(sm.posq).view(np.int32) * invalid)
    assert not np.any(np.abs(np.asarray(sm.dyn)) * invalid)


def test_rebin_kernel_matches_oracle_shift1():
    assert supports(G, 20, 1)
    _assert_equivalent(_moved(_table(k=20), 0.9, 3), max_shift=1)


def test_rebin_kernel_matches_oracle_shift2():
    assert supports(G, 24, 2)
    _assert_equivalent(_moved(_table(k=24, seed=1), 1.9, 4), max_shift=2)


def test_rebin_kernel_no_movers_identity():
    tab = _table(seed=2)
    got = to_table(rebin_slot_major(from_table(tab), 2, interpret=True))
    assert int(got.lost) == 0
    assert _cell_multiset(got) == _cell_multiset(_quantized(tab))


def test_rebin_kernel_overflow_matches_lost():
    """Cram many particles toward one corner so cells overflow: lost counts
    and per-cell kept counts must match the oracle, and every kept particle
    must be one of the inputs (the stayers-keep-slots pack may choose
    different overflow VICTIMS than the oracle's candidate order — both drop
    the same number per cell)."""
    tab = _table(k=4, seed=5, fill=(9, 8, 15))
    pos = np.asarray(tab.pos)
    # pull everything toward (4.3, 4.3, 4.3), clamped to a 1.9-cell move
    target = np.asarray([4.3, 4.3, 4.3], np.float32)
    d = np.clip(target - pos, -1.9, 1.9)
    newpos = np.clip(pos + d * np.asarray(tab.valid)[..., None], 1.001, 14.999)
    tab = dataclasses.replace(tab, pos=jnp.asarray(newpos))
    ref = T.rebin(tab, max_shift=2)
    got = to_table(rebin_slot_major(from_table(tab), 2, interpret=True))
    assert int(ref.lost) > 0  # the scenario really overflows
    # overflow VICTIMS may differ (stayers always survive in the kernel pack,
    # the oracle keeps candidates in offset order), and victim choice at one
    # axis stage cascades into the next stage's arrival counts — so only the
    # aggregate count is comparable, within the per-stage victim skew
    b = _cell_multiset(got)
    ref_kept = sum(_cell_multiset(_quantized(ref)).values())
    got_kept = sum(b.values())
    assert abs(got_kept - ref_kept) <= max(4, ref_kept // 100), (got_kept, ref_kept)
    # kept ROWS are a sub-multiset of the (quantized) input rows (keyed
    # without the cell: kept movers live in their target cell now)
    rows_in = collections.Counter(k[3] for k in _cell_multiset(_quantized(tab)).elements())
    rows_got = collections.Counter(k[3] for k in b.elements())
    assert not (rows_got - rows_in), "kernel produced rows that were never inputs"
