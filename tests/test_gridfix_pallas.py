"""Fused grid-correction kernels (interpret mode) vs the XLA oracle pairs:
remove_divergence+extrapolate and position_change_field+extrapolate."""

import jax.numpy as jnp
import numpy as np

from blub_tpu.core.types import CELL_AIR, CELL_FLUID, CELL_SOLID
from blub_tpu.ops.pallas_gridfix import (
    change_extrapolate_pallas,
    remove_extrapolate_pallas,
    supports,
)
from blub_tpu.sim.density import position_change_field
from blub_tpu.sim.divergence import remove_divergence
from blub_tpu.sim.extrapolate import extrapolate_velocity

G = (16, 16, 16)
DT = 1.0 / 120.0


def _fields(seed=0, with_solids=True):
    rng = np.random.default_rng(seed)
    marker = rng.choice(
        [CELL_SOLID, CELL_FLUID, CELL_AIR], size=G, p=[0.2, 0.5, 0.3]
    ).astype(np.int8)
    marker[0], marker[-1] = CELL_SOLID, CELL_SOLID
    marker[:, 0], marker[:, -1] = CELL_SOLID, CELL_SOLID
    marker[:, :, 0], marker[:, :, -1] = CELL_SOLID, CELL_SOLID
    pressure = rng.standard_normal(G).astype(np.float32) * 3.0
    vel = tuple(
        jnp.asarray(rng.standard_normal(G).astype(np.float32) * 10) for _ in range(3)
    )
    sv = rng.standard_normal(G + (3,)).astype(np.float32) if with_solids else None
    return (
        jnp.asarray(marker),
        jnp.asarray(pressure),
        vel,
        jnp.asarray(sv) if sv is not None else None,
    )


def test_remove_extrapolate_matches_oracle():
    assert supports(G)
    for seed, with_solids in ((0, False), (1, True)):
        marker, p, vel, sv = _fields(seed, with_solids)
        ref = extrapolate_velocity(remove_divergence(vel, p, marker, sv), marker)
        got = remove_extrapolate_pallas(vel, p, marker, sv, interpret=True)
        for c in range(3):
            np.testing.assert_allclose(
                np.asarray(ref[c]), np.asarray(got[c]), atol=2e-6,
                err_msg=f"component {c} seed {seed}",
            )


def test_change_extrapolate_matches_oracle():
    marker, p, _, _ = _fields(2, False)
    ref = extrapolate_velocity(position_change_field(p, marker, DT), marker)
    got = change_extrapolate_pallas(p, marker, DT, interpret=True)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(ref[c]), np.asarray(got[c]), atol=2e-6, err_msg=f"c{c}"
        )


def test_change_extrapolate_traced_dt():
    import jax

    marker, p, _, _ = _fields(3, False)
    ref = extrapolate_velocity(position_change_field(p, marker, DT), marker)
    got = jax.jit(
        lambda d: change_extrapolate_pallas(p, marker, d, interpret=True)
    )(jnp.float32(DT))
    for c in range(3):
        np.testing.assert_allclose(np.asarray(ref[c]), np.asarray(got[c]), atol=2e-6)
