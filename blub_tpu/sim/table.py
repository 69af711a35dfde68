"""Dense particle table: the TPU-native particle data structure.

Where the reference stores particles in flat SSBOs and rebuilds atomic
linked-list grids every step (transfer_build_linkedlist.comp), TPUs have no
efficient scatter — so particles here live *permanently* in a dense
``[X, Y, Z, K]`` slot table, binned by their dual cell ``floor(pos - 0.5)``.
Every simulation phase then becomes a dense shifted-window computation (the
VMEM-friendly analog of the reference's 9^3 workgroup shared-memory walks),
and "rebinning" is a local dense shuffle instead of a sort.

Key invariant between phases: a valid slot at cell ``b`` holds a particle with
``floor(pos - 0.5) == b``. After any position update the table must be
re-shuffled (``rebin``) before the next windowed phase. Movement per update is
clamped (CFL-style) so the shuffle window stays small.

Slot overflow: a cell can hold at most K particles; arrivals beyond K are
dropped and counted in ``lost`` (the reference similarly truncates its
linked-list walks at 12/32 particles per cell — it keeps the particles but
silently ignores them during transfer; we monitor instead).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _register(cls):
    return jax.tree_util.register_dataclass(cls)


@_register
@dataclasses.dataclass
class ParticleTable:
    """SoA particle storage in cell-slot layout.

    pos: f32[X,Y,Z,K,3] global grid-space positions
    vel: f32[X,Y,Z,K,3]
    affine: f32[X,Y,Z,K,3,3]  (APIC C matrix, rows = grad of each component)
    valid: bool[X,Y,Z,K]
    lost: i32 scalar — cumulative particles dropped to slot overflow
    """

    pos: jax.Array
    vel: jax.Array
    affine: jax.Array
    valid: jax.Array
    lost: jax.Array

    @property
    def grid_dim(self) -> Tuple[int, int, int]:
        return self.pos.shape[:3]

    @property
    def capacity(self) -> int:
        return self.pos.shape[3]

    def num_particles(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32))


def base_bin(pos: jax.Array) -> jax.Array:
    """Dual ("base") bin of a particle: floor(pos - 0.5). All windowed phases
    index relative to this bin (transfer_build_linkedlist.comp uses the same
    dual cell for the density pass)."""
    return jnp.floor(pos - 0.5).astype(jnp.int32)


def from_positions(pos_np: np.ndarray, grid_dim: Tuple[int, int, int], capacity: int) -> ParticleTable:
    """Host-side construction from seeded particle positions f32[N,3]."""
    x, y, z = grid_dim
    k = capacity
    pos_np = np.asarray(pos_np, np.float32)
    # rel16 position grid (sim/slot_major.quantize_pos; no-op on seeds)
    pos_np = (np.round(pos_np * np.float32(8192.0)) * np.float32(2.0 ** -13)).astype(np.float32)
    n = pos_np.shape[0]
    tpos = np.zeros((x, y, z, k, 3), np.float32)
    tvalid = np.zeros((x, y, z, k), bool)
    bins = np.floor(pos_np - 0.5).astype(np.int64)
    bins = np.clip(bins, 0, np.asarray(grid_dim) - 1)
    lin = (bins[:, 0] * y + bins[:, 1]) * z + bins[:, 2]
    order = np.argsort(lin, kind="stable")
    lin_sorted = lin[order]
    # rank within each bin
    ranks = np.arange(n) - np.maximum.accumulate(
        np.where(np.diff(lin_sorted, prepend=-1) != 0, np.arange(n), 0)
    )
    keep = ranks < k
    lost = int(n - keep.sum())
    flat_slot = lin_sorted[keep] * k + ranks[keep]
    tpos.reshape(-1, 3)[flat_slot] = pos_np[order[keep]]
    tvalid.reshape(-1)[flat_slot] = True
    return ParticleTable(
        pos=jnp.asarray(tpos),
        vel=jnp.zeros((x, y, z, k, 3), jnp.float32),
        affine=jnp.zeros((x, y, z, k, 3, 3), jnp.float32),
        valid=jnp.asarray(tvalid),
        lost=jnp.int32(lost),
    )


def to_positions(table: ParticleTable) -> np.ndarray:
    """Host-side extraction of active particle positions f32[N,3]."""
    valid = np.asarray(table.valid).reshape(-1)
    pos = np.asarray(table.pos).reshape(-1, 3)
    return pos[valid]


# ---------------------------------------------------------------------------
# Rebinning: axis-split dense shuffle


def _pack_axis(flags: jax.Array, cand: Tuple[jax.Array, ...], k_out: int):
    """Pack candidates (axis -2 = candidate axis) into the first k_out slots.

    flags: bool[..., C]; cand: arrays [..., C, D...] with matching leading dims.
    Returns (packed_valid bool[..., k_out], packed arrays [..., k_out, D...],
    overflow count).

    Packing runs on the MXU: destination slot of candidate c is its exclusive
    prefix count; selection matrix onehot[c, k] = (prefix[c] == k & flag[c])
    turns the pack into one batched matmul per payload.
    """
    c = flags.shape[-1]
    prefix = jnp.cumsum(flags.astype(jnp.int32), axis=-1) - flags.astype(jnp.int32)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, flags.shape + (k_out,), flags.ndim)
    hit = (prefix[..., None] == slot_ids) & flags[..., None]
    packed_valid = jnp.any(hit, axis=-2)
    out = []
    for a in cand:
        flat = a.reshape(a.shape[: flags.ndim] + (-1,))  # [..., C, D]
        # The pack is a 0/1 permutation and must move payload bits EXACTLY —
        # an MXU matmul does not (TPU f32 matmuls run as bf16 passes under
        # --xla_allow_excess_precision, quantizing particle positions every
        # rebin). A where/sum over the candidate axis stays on the VPU: the
        # sum adds exactly one non-zero term, so it is bit-exact.
        packed = jnp.sum(
            jnp.where(hit[..., None], flat[..., :, None, :], 0.0), axis=-3
        )
        out.append(packed.reshape(a.shape[: flags.ndim - 1] + (k_out,) + a.shape[flags.ndim :]))
    total = jnp.sum(flags.astype(jnp.int32))
    kept = jnp.sum(packed_valid.astype(jnp.int32))
    return packed_valid, tuple(out), total - kept


def rebin(table: ParticleTable, max_shift: int, slack: int = 4) -> ParticleTable:
    """Restore the bin invariant after positions moved by < max_shift cells.

    Axis-split: shuffle along x, then y, then z. Intermediate stages carry
    ``capacity + slack`` slots to absorb transient crowding. Dense everywhere:
    candidates for a cell are the slots of its (2*max_shift+1) neighbors along
    the active axis, flagged by whether their target bin lands here.

    Traffic-lean formulation: the flags come from rolling a small per-slot
    axis-delta code (i32[X,Y,Z,K]) rather than full position vectors, and all
    15 payload floats (pos, vel, affine) move through ONE onehot matmul per
    stage; the next stage recomputes its delta from the packed positions.

    Overflow semantics: per cell this keeps the FIRST k_out candidates in
    offset order (own cell first, then -s..+s neighbors, slots ascending).
    The Pallas kernel (ops/pallas_rebin.py) deliberately differs under
    overflow — stayers always survive there, and movers fill empty slots in
    a pinned queue order. The kernel's choice is asserted bit-for-bit as the
    production spec by tests/test_rebin_overflow_spec.py; the two agree on
    per-cell multisets whenever nothing overflows (tests/test_rebin_pallas.py).
    """
    k = table.capacity
    grid_dim = table.grid_dim
    dim_arr = jnp.asarray(grid_dim, jnp.int32)
    payload = jnp.concatenate(
        [table.pos, table.vel, table.affine.reshape(grid_dim + (k, 9))], axis=-1
    )  # [X,Y,Z,K,15]
    valid = table.valid
    lost = table.lost

    offsets = list(range(-max_shift, max_shift + 1))
    for axis in range(3):
        k_in = valid.shape[3]
        k_out = k + slack if axis < 2 else k
        coord = jax.lax.broadcasted_iota(jnp.int32, grid_dim + (k_in,), axis)
        target_ax = jnp.clip(
            jnp.floor(payload[..., axis] - 0.5).astype(jnp.int32), 0, dim_arr[axis] - 1
        )
        delta = target_ax - coord  # slot wants to move `delta` cells along axis

        def do_stage(payload, valid, delta=delta, axis=axis, k_out=k_out):
            flag_parts = []
            cand_parts = []
            for off in offsets:
                shift_vec = [0, 0, 0]
                shift_vec[axis] = -off  # cell g looks at neighbor g+off
                # neighbor's slot lands here iff its delta == -off; wrapped
                # cells can't match (positions are clamped inside [1, dim-1],
                # so |delta| <= max_shift while a wrap needs |delta| ~ dim).
                flag_parts.append(
                    jnp.roll(valid & (delta == -off), shift_vec, axis=(0, 1, 2))
                )
                cand_parts.append(jnp.roll(payload, shift_vec, axis=(0, 1, 2)))
            flags = jnp.concatenate(flag_parts, axis=-1)  # [X,Y,Z,C]
            cand = jnp.concatenate(cand_parts, axis=3)  # [X,Y,Z,C,15]
            new_valid, (new_payload,), over = _pack_axis(flags, (cand,), k_out)
            return new_payload, new_valid, over

        def skip_stage(payload, valid, k_out=k_out, k_in=k_in):
            # nothing moves along this axis: keep slots, just adjust capacity
            if k_out > k_in:
                pads = [(0, 0)] * 5
                pads[3] = (0, k_out - k_in)
                return jnp.pad(payload, pads), jnp.pad(valid, pads[:4]), jnp.int32(0)
            return payload[:, :, :, :k_out], valid[..., :k_out], jnp.int32(0)

        # Data-dependent stage skip: in gravity-aligned or settling flow whole
        # axes see no bin changes and the (expensive) pack can be bypassed.
        # A shrinking stage (k_out < k_in) additionally requires the tail
        # slots to be empty, else truncation would drop stationary particles.
        needs = jnp.any(valid & (delta != 0))
        if k_out < k_in:
            needs = needs | jnp.any(valid[..., k_out:])
        payload, valid, over = jax.lax.cond(
            needs, do_stage, skip_stage, payload, valid
        )
        lost = lost + over

    return ParticleTable(
        pos=payload[..., 0:3],
        vel=payload[..., 3:6],
        affine=payload[..., 6:15].reshape(grid_dim + (k, 3, 3)),
        valid=valid,
        lost=lost,
    )
