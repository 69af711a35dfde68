"""P2G transfer unit tests against analytic expectations.

The reference's commented-out naive gather paths
(transfer_gather_velocity.comp:99-115) are the spec these tests encode.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from blub_tpu.core.types import CELL_AIR, CELL_FLUID, CELL_SOLID
from blub_tpu.sim.transfer import build_marker, p2g_density, p2g_velocity

DIM = (16, 16, 16)


def _single_particle(pos, vel, affine=None):
    p = jnp.array([pos], jnp.float32)
    v = jnp.array([vel], jnp.float32)
    c = jnp.zeros((1, 3, 3), jnp.float32) if affine is None else jnp.array([affine], jnp.float32)
    return p, v, c


def test_marker_basics():
    pos = jnp.array([[5.5, 5.5, 5.5]], jnp.float32)
    marker = build_marker(pos, None, DIM)
    m = np.asarray(marker)
    assert m[5, 5, 5] == CELL_FLUID
    assert m[0, 0, 0] == CELL_SOLID
    assert m[15, 8, 8] == CELL_SOLID
    assert m[8, 8, 8] == CELL_AIR


def test_marker_solid_overrides_fluid():
    pos = jnp.array([[5.5, 5.5, 5.5]], jnp.float32)
    occ = jnp.zeros(DIM, jnp.float32).at[5, 5, 5].set(1.0)
    marker = build_marker(pos, occ, DIM)
    assert np.asarray(marker)[5, 5, 5] == CELL_SOLID


def test_p2g_constant_velocity_reproduced():
    """A particle cloud with constant velocity must produce exactly that
    velocity on all fluid-adjacent faces (Shepard normalization)."""
    rng = np.random.default_rng(0)
    pos = jnp.asarray(5.0 + 6.0 * rng.random((500, 3)), jnp.float32)
    vel = jnp.broadcast_to(jnp.float32([1.5, -2.0, 0.25]), (500, 3))
    affine = jnp.zeros((500, 3, 3), jnp.float32)
    marker = build_marker(pos, None, DIM)
    vx, vy, vz = p2g_velocity(pos, vel, affine, marker, None, (0.0, 0.0, 0.0), 1.0 / 120.0)

    m = np.asarray(marker)
    fluid = m == CELL_FLUID
    # check faces strictly interior to the fluid blob
    interior = fluid & np.roll(fluid, -1, 0) & np.roll(fluid, 1, 0)
    assert interior.sum() > 0
    np.testing.assert_allclose(np.asarray(vx)[interior], 1.5, atol=1e-4)


def test_p2g_apic_linear_field_reproduced():
    """APIC with affine rows = grad(v_c) reproduces a linear velocity field
    exactly on the grid (the defining property of APIC)."""
    rng = np.random.default_rng(1)
    pos_np = 4.0 + 8.0 * rng.random((2000, 3))
    A = np.array([[0.1, 0.3, -0.2], [0.0, -0.1, 0.4], [0.2, 0.0, 0.1]], np.float32)
    b = np.array([1.0, 2.0, -1.0], np.float32)
    vel_np = pos_np @ A.T + b
    pos = jnp.asarray(pos_np, jnp.float32)
    vel = jnp.asarray(vel_np, jnp.float32)
    affine = jnp.broadcast_to(jnp.asarray(A), (2000, 3, 3))

    marker = build_marker(pos, None, DIM)
    grids = p2g_velocity(pos, vel, affine, marker, None, (0.0, 0.0, 0.0), 1.0)

    m = np.asarray(marker)
    fluid = m == CELL_FLUID
    for c in range(3):
        # X-face c at (i,j,k) sits at position (i,j,k)+0.5+0.5*e_c
        g = np.asarray(grids[c])
        stag = np.full(3, 0.5)
        stag[c] = 1.0
        interior = fluid.copy()
        for ax in range(3):
            interior &= np.roll(fluid, -1, ax) & np.roll(fluid, 1, ax)
        idx = np.argwhere(interior)
        node_pos = idx + stag
        expect = node_pos @ A.T[:, c] + b[c]
        np.testing.assert_allclose(g[interior], expect, rtol=1e-3, atol=5e-3)


def test_p2g_no_flow_into_solid():
    pos = jnp.array([[2.5, 2.5, 2.5]], jnp.float32)
    vel = jnp.array([[10.0, 10.0, 10.0]], jnp.float32)
    affine = jnp.zeros((1, 3, 3), jnp.float32)
    occ = jnp.zeros(DIM, jnp.float32).at[3, 2, 2].set(1.0)
    marker = build_marker(pos, occ, DIM)
    vx, _, _ = p2g_velocity(pos, vel, affine, marker, None, (0.0, 0.0, 0.0), 1.0)
    # face between fluid (2,2,2) and solid (3,2,2) must be zero
    assert np.asarray(vx)[2, 2, 2] == 0.0


def test_p2g_gravity_applied():
    pos = jnp.array([[5.5, 5.5, 5.5]], jnp.float32)
    vel = jnp.zeros((1, 3), jnp.float32)
    affine = jnp.zeros((1, 3, 3), jnp.float32)
    marker = build_marker(pos, None, DIM)
    dt = 1.0 / 120.0
    _, vy, _ = p2g_velocity(pos, vel, affine, marker, None, (0.0, -981.0, 0.0), dt)
    # faces adjacent to the fluid cell receive gravity*dt
    np.testing.assert_allclose(np.asarray(vy)[5, 5, 5], -981.0 * dt, rtol=1e-5)


def test_density_uniform_8_per_cell():
    """8 regularly-placed particles per cell give density ~8 in the bulk
    (density_projection_gather_error.comp: Density0 = 8)."""
    cells = [(x, y, z) for x in range(4, 10) for y in range(4, 10) for z in range(4, 10)]
    offs = np.array(
        [[(s % 2) * 0.5 + 0.25, (s // 2 % 2) * 0.5 + 0.25, (s // 4 % 2) * 0.5 + 0.25] for s in range(8)]
    )
    pos_np = np.concatenate([np.asarray(c) + offs for c in cells])
    rho = np.asarray(p2g_density(jnp.asarray(pos_np, jnp.float32), DIM))
    np.testing.assert_allclose(rho[6:8, 6:8, 6:8], 8.0, rtol=1e-5)
