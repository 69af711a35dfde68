"""G2P sampling, APIC reconstruction, RK4 advection, wall clamping."""

import jax.numpy as jnp
import numpy as np

from blub_tpu.sim.advect import advect_particles, g2p_apic, gather_staggered_corners

DIM = (16, 16, 16)
DT = 1.0 / 120.0


def _uniform_grids(v):
    return tuple(jnp.full(DIM, jnp.float32(v[c])) for c in range(3))


def _linear_grids(A, b):
    """Staggered grids sampling the linear field v(x) = A x + b."""
    grids = []
    for c in range(3):
        stag = np.full(3, 0.5)
        stag[c] = 1.0
        idx = np.stack(np.meshgrid(*[np.arange(d) for d in DIM], indexing="ij"), axis=-1)
        node = idx + stag
        grids.append(jnp.asarray(node @ A[c] + b[c], jnp.float32))
    return tuple(grids)


def test_g2p_uniform_velocity():
    grids = _uniform_grids([1.0, -2.0, 0.5])
    pos = jnp.array([[7.3, 8.6, 5.9], [2.1, 3.5, 9.9]], jnp.float32)
    s = gather_staggered_corners(grids, pos)
    vel, affine = g2p_apic(s)
    np.testing.assert_allclose(np.asarray(vel), [[1.0, -2.0, 0.5]] * 2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(affine), 0.0, atol=1e-6)


def test_g2p_linear_field_affine_is_jacobian():
    A = np.array([[0.1, 0.3, -0.2], [0.0, -0.1, 0.4], [0.2, 0.0, 0.1]], np.float32)
    b = np.array([0.5, -0.5, 0.0], np.float32)
    grids = _linear_grids(A, b)
    pos = jnp.array([[7.25, 8.5, 5.75], [3.1, 4.9, 10.2]], jnp.float32)
    s = gather_staggered_corners(grids, pos)
    vel, affine = g2p_apic(s)
    np.testing.assert_allclose(np.asarray(vel), np.asarray(pos) @ A.T + b, rtol=1e-4, atol=1e-4)
    # affine[p, comp, axis] == dv_comp/daxis == A
    np.testing.assert_allclose(np.asarray(affine)[0], A, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(affine)[1], A, rtol=1e-3, atol=1e-3)


def test_advect_uniform_motion():
    grids = _uniform_grids([12.0, 0.0, 0.0])
    pos = jnp.array([[5.5, 5.5, 5.5]], jnp.float32)
    new_pos, new_vel, _ = advect_particles(pos, grids, None, None, DT)
    np.testing.assert_allclose(np.asarray(new_pos), [[5.5 + 12.0 * DT, 5.5, 5.5]], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_vel), [[12.0, 0.0, 0.0]], rtol=1e-5)


def test_advect_stays_in_domain():
    grids = _uniform_grids([0.0, -500.0, 0.0])  # strong downward flow
    rng = np.random.default_rng(0)
    pos = jnp.asarray(1.1 + 13.0 * rng.random((100, 3)), jnp.float32)
    p = pos
    for _ in range(20):
        p, v, _ = advect_particles(p, grids, None, None, DT)
    p = np.asarray(p)
    assert (p >= 1.0).all() and (p <= 15.0).all()


def test_advect_blocked_by_solid():
    """Particle heading into a solid cell is clamped inside its current cell."""
    grids = _uniform_grids([100.0, 0.0, 0.0])
    occ = jnp.zeros(DIM, jnp.float32).at[6, :, :].set(1.0)
    sv = jnp.zeros(DIM + (3,), jnp.float32)
    pos = jnp.array([[5.9, 5.5, 5.5]], jnp.float32)
    new_pos, new_vel, _ = advect_particles(pos, grids, occ, sv, DT)
    assert float(new_pos[0, 0]) < 6.0  # never enters the solid column
    assert float(new_vel[0, 0]) < 100.0


def test_escape_from_moving_solid():
    """Particle inside a moving solid is pushed out along the dominant axis."""
    grids = _uniform_grids([0.0, 0.0, 0.0])
    occ = jnp.zeros(DIM, jnp.float32).at[5, 5, 5].set(1.0)
    sv = jnp.zeros(DIM + (3,), jnp.float32).at[5, 5, 5, 0].set(30.0)
    pos = jnp.array([[5.5, 5.5, 5.5]], jnp.float32)
    new_pos, _, _ = advect_particles(pos, grids, occ, sv, DT)
    assert float(new_pos[0, 0]) >= 6.0  # escaped one cell along +x
