"""Overflow SEMANTICS of the Pallas rebin pack, asserted exactly (VERDICT.md
round-2 weak #5 / next #6).

The kernel's per-cell victim choice under overflow is deliberately different
from sim/table.py::rebin's (stayers always survive; the oracle keeps the
first k_out candidates in offset order). This file pins the kernel's choice
down as THE SPEC with an independent per-cell reference simulator:

  per axis stage (x: K->K+slack, y: K+slack->K+slack, z: K+slack->K), per cell:
    1. stayers (target bin == own cell) with slot q < k_out keep slot q;
    2. movers queue in deterministic order: first tail stayers being shrunk
       away (q in [k_out, k_in), ascending q), then window offsets
       -s..-1, +1..+s (ascending, skipping 0), slots ascending within each;
    3. queued movers fill the empty output slots in ascending-slot order;
       once empties run out the remainder of the queue is DROPPED (lost).

Anything the kernel produces — slot placement included — must match this
simulator bit for bit, overflow or not. If a kernel change alters pack order,
this file is the contract to update alongside ops/pallas_rebin.py's docstring.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.ops.pallas_rebin import rebin_slot_major
from blub_tpu.sim import table as T
from blub_tpu.sim.slot_major import from_table

G = (16, 16, 16)


def _decode(posq):
    """rel16 posq [K, 2, ...] -> (pos f32 [K, 3, ...] global, valid bool).
    Independent numpy decode of the layout in sim/slot_major.py."""
    b0 = posq[:, 0].view(np.int32)
    b1 = posq[:, 1].view(np.int32)
    rs = (b0 >> 16, (b0 << 16) >> 16, b1 >> 16)
    shape = b0.shape
    pos = np.stack(
        [
            np.arange(shape[1 + a], dtype=np.float32).reshape(
                (1,) + (1,) * a + (-1,) + (1,) * (2 - a)
            )
            + 1.0
            + rs[a].astype(np.float32) * np.float32(2.0 ** -13)
            for a in range(3)
        ],
        axis=1,
    )
    return pos, (b1 & 1) == 1


def _encode(pos, valid):
    """(pos, valid) -> rel16 posq channels; inverse of _decode."""
    shape = valid.shape
    rs = []
    for a in range(3):
        cell = np.arange(shape[1 + a], dtype=np.float32).reshape(
            (1,) + (1,) * a + (-1,) + (1,) * (2 - a)
        )
        r = np.round((pos[:, a] - cell - 1.0) * np.float32(8192.0)).astype(np.int32)
        rs.append(np.where(valid, r, 0))
    vbit = valid.astype(np.int32)
    ch0 = ((rs[0] << 16) | (rs[1] & 0xFFFF)).view(np.float32)
    ch1 = ((rs[2] << 16) | vbit).view(np.float32)
    return np.stack([ch0, ch1], axis=1)


def _target(p, dim):
    return np.clip(np.floor(p - 0.5), 0.0, float(dim - 1)).astype(np.float32)


def _pack_axis_spec(pos, valid, dyn, axis, s, k_out, dim_a):
    """Reference simulator of one _pack_core stage on decoded positions
    [K, 3, X, Y, Z] + valid [K, X, Y, Z] + opaque dyn payload. Returns
    (pos_out, valid_out, dyn_out, dropped_count). Positions are GLOBAL here;
    the caller re-encodes cell-relative — which exercises the kernel's
    payload rebasing independently."""
    k_in = pos.shape[0]
    shape = valid.shape[1:]
    out_pos = np.zeros((k_out,) + pos.shape[1:], pos.dtype)
    out_v = np.zeros((k_out,) + valid.shape[1:], bool)
    out_d = np.zeros((k_out,) + dyn.shape[1:], dyn.dtype)
    dropped = 0
    for cell in np.ndindex(shape):
        taken = np.zeros(k_out, bool)
        movers = []
        # stayers keep slots; tail stayers (q >= k_out) queue first
        for q in range(k_in):
            if not valid[(q,) + cell]:
                continue
            tgt = _target(pos[(q, axis) + cell], dim_a)
            if tgt == float(cell[axis]):
                if q < k_out:
                    out_pos[(q, slice(None)) + cell] = pos[(q, slice(None)) + cell]
                    out_v[(q,) + cell] = True
                    out_d[(q, slice(None)) + cell] = dyn[(q, slice(None)) + cell]
                    taken[q] = True
                else:
                    movers.append((q,) + cell)
        # window offsets in kernel order, slots ascending
        for off in [o for o in range(-s, s + 1) if o]:
            src = list(cell)
            src[axis] += off
            if not (0 <= src[axis] < shape[axis]):
                continue
            src = tuple(src)
            for q in range(k_in):
                if not valid[(q,) + src]:
                    continue
                if _target(pos[(q, axis) + src], dim_a) == float(cell[axis]):
                    movers.append((q,) + src)
        empties = [q for q in range(k_out) if not taken[q]]
        for rank, mv in enumerate(movers):
            if rank >= len(empties):
                dropped += len(movers) - rank
                break
            qo = empties[rank]
            q, src = mv[0], mv[1:]
            out_pos[(qo, slice(None)) + cell] = pos[(q, slice(None)) + src]
            out_v[(qo,) + cell] = True
            out_d[(qo, slice(None)) + cell] = dyn[(q, slice(None)) + src]
    return out_pos, out_v, out_d, dropped


def _rebin_spec(sm, max_shift, slack):
    """x, y, z stages exactly as rebin_slot_major composes them."""
    x, y, z = sm.grid_dim
    k = sm.capacity
    pos, valid = _decode(np.asarray(sm.posq)[:, :, :, :, :z])
    dyn = np.asarray(sm.dyn)[:, :, :, :, :z]
    k_mid = k + slack
    pos, valid, dyn, d0 = _pack_axis_spec(pos, valid, dyn, 0, max_shift, k_mid, x)
    pos, valid, dyn, d1 = _pack_axis_spec(pos, valid, dyn, 1, max_shift, k_mid, y)
    pos, valid, dyn, d2 = _pack_axis_spec(pos, valid, dyn, 2, max_shift, k, z)
    return _encode(pos, valid), dyn, d0 + d1 + d2


def _crammed_table(k, seed, amp):
    """Flow that genuinely overflows cells: pull everything toward one point."""
    pos = add_fluid_cube(G, (1, 1, 1), (9, 8, 15), 10**9)
    tab = T.from_positions(pos, G, k)
    rng = np.random.default_rng(seed)
    tab = dataclasses.replace(
        tab,
        vel=jnp.asarray(rng.standard_normal(np.asarray(tab.vel).shape).astype(np.float32) * 10),
        affine=jnp.asarray(rng.standard_normal(np.asarray(tab.affine).shape).astype(np.float32)),
    )
    target = np.asarray([4.3, 4.3, 4.3], np.float32)
    d = np.clip(target - np.asarray(tab.pos), -amp, amp)
    newpos = np.clip(
        np.asarray(tab.pos) + d * np.asarray(tab.valid)[..., None], 1.001, 14.999
    )
    # rel16 position grid (sim/slot_major.quantize_pos)
    newpos = (np.round(newpos * np.float32(8192.0)) * np.float32(2.0 ** -13)).astype(np.float32)
    return dataclasses.replace(tab, pos=jnp.asarray(newpos))


def _assert_kernel_matches_spec(sm, max_shift, slack):
    got = rebin_slot_major(sm, max_shift, slack=slack, interpret=True)
    exp_p, exp_d, exp_drop = _rebin_spec(sm, max_shift, slack)
    z = sm.grid_dim[2]
    np.testing.assert_array_equal(np.asarray(got.posq)[:, :, :, :, :z], exp_p)
    np.testing.assert_array_equal(np.asarray(got.dyn)[:, :, :, :, :z], exp_d)
    assert int(got.lost) - int(sm.lost) == exp_drop
    return exp_drop


def test_overflow_placement_matches_spec():
    sm = from_table(_crammed_table(k=4, seed=5, amp=1.9))
    dropped = _assert_kernel_matches_spec(sm, max_shift=2, slack=4)
    assert dropped > 0, "scenario must genuinely overflow"


def test_overflow_placement_matches_spec_slack2_shift1():
    sm = from_table(_crammed_table(k=4, seed=7, amp=0.9))
    dropped = _assert_kernel_matches_spec(sm, max_shift=1, slack=2)
    assert dropped > 0, "scenario must genuinely overflow"


def test_no_overflow_placement_matches_spec():
    """Without overflow the spec also pins exact slot PLACEMENT (the multiset
    tests in test_rebin_pallas.py deliberately ignore slot order)."""
    # 4 particles/cell (half the seeded slots invalidated) with capacity 12:
    # ±0.4-cell jiggle then needs a net +9 arrival spike to overflow any cell,
    # which the spec simulator confirms never happens for this seed (drop 0)
    pos = add_fluid_cube(G, (1, 1, 1), (9, 8, 15), 10**9)
    tab = T.from_positions(pos, G, 12)
    v = np.asarray(tab.valid).copy()
    v[..., 4:] = 0.0
    rng = np.random.default_rng(11)
    move = (rng.random(np.asarray(tab.pos).shape) * 2 - 1).astype(np.float32) * 0.4
    newpos = np.clip(np.asarray(tab.pos) + move * v[..., None], 1.001, 14.999)
    newpos = (np.round(newpos * np.float32(8192.0)) * np.float32(2.0 ** -13)).astype(np.float32)
    sm = from_table(
        dataclasses.replace(tab, pos=jnp.asarray(newpos), valid=jnp.asarray(v))
    )
    dropped = _assert_kernel_matches_spec(sm, max_shift=2, slack=4)
    assert dropped == 0
