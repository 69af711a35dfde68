"""Pallas P2G kernel vs the XLA dense path (interpret mode on CPU; the
compiled kernel is additionally validated on real TPU hardware by bench runs
and was measured exact to ~2e-6 at 64x32x32/K=16)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.ops.pallas_p2g import p2g_density_pallas, p2g_velocity_density_pallas
from blub_tpu.sim import table as T
from blub_tpu.sim.dense_transfer import (
    marker_from_table,
    p2g_density_dense,
    p2g_velocity_dense,
)

G = (16, 16, 16)
GRAV = (0.0, -981.0, 0.0)
DT = 1.0 / 120.0


def _state(seed=0):
    pos = add_fluid_cube(G, (1, 1, 1), (9, 8, 15), 10**9)
    tab = T.from_positions(pos, G, 8)
    rng = np.random.default_rng(seed)
    return dataclasses.replace(
        tab,
        vel=jnp.asarray(rng.standard_normal(np.asarray(tab.vel).shape).astype(np.float32) * 10),
        affine=jnp.asarray(rng.standard_normal(np.asarray(tab.affine).shape).astype(np.float32)),
    )


def test_p2g_kernel_matches_dense():
    tab = _state()
    marker = marker_from_table(tab, None)
    vel_ref = p2g_velocity_dense(tab, marker, GRAV, DT)
    vel_p, _ = p2g_velocity_density_pallas(tab, marker, GRAV, DT, interpret=True)
    for c in range(3):
        # the kernel consumes the slot-major table, whose vel/affine are
        # stored bf16 (slot_major.py) — tolerance is bf16 rounding of the
        # ~|10| particle velocities, not kernel math error
        np.testing.assert_allclose(
            np.asarray(vel_ref[c]), np.asarray(vel_p[c]), rtol=1e-2, atol=5e-2
        )


def test_density_kernel_matches_dense():
    tab = _state(1)
    rho_ref = p2g_density_dense(tab)
    rho_p = p2g_density_pallas(tab, interpret=True)
    np.testing.assert_allclose(np.asarray(rho_ref), np.asarray(rho_p), atol=1e-5)


def test_rebin_is_bit_exact():
    """The rebin pack must move payload bits exactly (regression for the TPU
    MXU bf16-demotion trap: matmul-based packs quantize positions)."""
    pos = add_fluid_cube(G, (1, 1, 1), (9, 8, 15), 10**9)
    tab = T.from_positions(pos, G, 16)  # headroom so nothing overflows
    rng = np.random.default_rng(3)
    move = (rng.random(np.asarray(tab.pos).shape) * 1.8 - 0.9).astype(np.float32)
    newpos = np.clip(
        np.asarray(tab.pos) + move * np.asarray(tab.valid)[..., None], 1.001, np.array(G) - 1.001
    )
    # rel16 grid (sim/slot_major.quantize_pos) — see test_rebin_pallas._q
    newpos = (np.round(newpos * np.float32(8192.0)) * np.float32(2.0 ** -13)).astype(np.float32)
    tab = dataclasses.replace(tab, pos=jnp.asarray(newpos))
    out = T.rebin(tab, max_shift=1)
    # every surviving position must be bit-identical to an input one
    # dense random moves can transiently overcrowd a cell; a couple of
    # monitored drops are fine — the point is bit-exact payload transport.
    assert int(out.lost) <= 3
    import collections

    a = collections.Counter(
        r.tobytes() for r in np.asarray(tab.pos)[np.asarray(tab.valid)].reshape(-1, 3)
    )
    b = collections.Counter(
        r.tobytes() for r in np.asarray(out.pos)[np.asarray(out.valid)].reshape(-1, 3)
    )
    assert not (b - a), "rebin produced positions that were never inputs (bit drift)"
