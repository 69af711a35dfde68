"""Internal axis-permutation layout (sim/axis_layout.py): perm selection,
round-trip conversions, and physics equivalence of a permuted simulation."""

import jax
import jax.numpy as jnp
import numpy as np

from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.core.types import SimParams, SolidState
from blub_tpu.sim.axis_layout import (
    IDENTITY,
    choose_perm,
    inv_perm,
    permute_params,
    permute_positions,
    permute_solids,
    unpermute_table,
)
from blub_tpu.sim.step_dense import make_dense_state, step_dense
from blub_tpu.sim.table import to_positions

DT = 1.0 / 120.0


def test_choose_perm_dam_scale():
    # 128x64x64 (dam_halfhalf): lane axis must become the 128 one
    p = choose_perm((128, 64, 64))
    assert p[2] == 0 and tuple(sorted(p)) == (0, 1, 2)
    dims = tuple((128, 64, 64)[i] for i in p)
    assert dims[2] == 128 and dims[1] % 8 == 0


def test_choose_perm_identity_when_already_optimal():
    assert choose_perm((64, 64, 128)) == IDENTITY
    assert choose_perm((256, 128, 128)) == IDENTITY


def test_choose_perm_respects_sublane_alignment():
    # internal y must stay a multiple of 8
    p = choose_perm((128, 12, 64))
    dims = (128, 12, 64)
    assert dims[p[1]] % 8 == 0


def test_inv_perm_roundtrip():
    for p in [(0, 1, 2), (1, 2, 0), (2, 0, 1), (0, 2, 1)]:
        inv = inv_perm(p)
        assert tuple(p[inv[i]] for i in range(3)) == (0, 1, 2)


def test_unpermute_table_roundtrip():
    """permute inputs -> build table -> unpermute == build table directly."""
    from blub_tpu.sim import table as T

    grid = (24, 8, 16)
    perm = choose_perm(grid)
    assert perm != IDENTITY
    rng = np.random.default_rng(3)
    pos = (1.01 + (np.array(grid) - 2.02) * rng.random((200, 3))).astype(np.float32)

    tab_ext = T.from_positions(pos, grid, 16)
    tab_int = T.from_positions(
        permute_positions(pos, perm), tuple(grid[i] for i in perm), 16
    )
    back = unpermute_table(tab_int, perm)
    assert np.asarray(back.valid).shape == np.asarray(tab_ext.valid).shape
    # same multiset of positions per cell
    a = sorted(map(tuple, to_positions(tab_ext)))
    b = sorted(map(tuple, to_positions(back)))
    assert np.allclose(np.asarray(a), np.asarray(b))


def _mini_state(grid, perm, with_solids):
    params = SimParams(
        grid_dim=grid,
        dt=DT,
        gravity_grid=(0.0, -981.0, 0.0),
        num_particles=0,
        has_solids=with_solids,
    )
    pos = add_fluid_cube(grid, (1, 1, 1), (grid[0] // 2, grid[1] - 2, grid[2] - 1), 10**9)
    params = SimParams(
        grid_dim=grid, dt=DT, gravity_grid=(0.0, -981.0, 0.0),
        num_particles=pos.shape[0], has_solids=with_solids,
    )
    solids = None
    if with_solids:
        occ = np.zeros(grid, np.float32)
        occ[grid[0] // 2 :, 2 : grid[1] // 2, :] = 1.0
        vel = np.zeros(grid + (3,), np.float32)
        vel[..., 0] = occ * 5.0
        solids = SolidState(occupancy=jnp.asarray(occ), velocity=jnp.asarray(vel))
    p_int = permute_params(params, perm)
    s_int = make_dense_state(p_int, permute_positions(pos, perm), capacity=16, layout="pt")
    return p_int, s_int, permute_solids(solids, perm)


def _com_after(grid, perm, steps, with_solids):
    p, s, solids = _mini_state(grid, perm, with_solids)
    fn = jax.jit(lambda st: step_dense(p, st, solids))
    for _ in range(steps):
        s = fn(s)
    table = unpermute_table(s.table, perm)
    pos = to_positions(table)
    return pos, int(jax.device_get(s.table.lost))


def test_permuted_sim_matches_identity():
    """Same scene stepped in permuted vs identity layout: identical physics up
    to float summation order. Compare aggregate statistics after a few steps
    (per-particle trajectories diverge at rounding level by design — the
    permutation changes addition association, not the math)."""
    grid = (24, 8, 16)
    perm = choose_perm(grid)
    assert perm != IDENTITY
    pos_id, lost_id = _com_after(grid, IDENTITY, 4, with_solids=True)
    pos_pm, lost_pm = _com_after(grid, perm, 4, with_solids=True)
    assert lost_id == lost_pm == 0
    assert pos_id.shape == pos_pm.shape
    com_id = pos_id.mean(axis=0)
    com_pm = pos_pm.mean(axis=0)
    np.testing.assert_allclose(com_id, com_pm, atol=2e-3)
    # distribution along each axis matches too (sorted coordinate profiles)
    for a in range(3):
        np.testing.assert_allclose(
            np.sort(pos_id[:, a]), np.sort(pos_pm[:, a]), atol=5e-2
        )


def test_scene_uses_permuted_layout_and_external_readback():
    """Scene picks the permutation automatically; readbacks are external."""
    from blub_tpu.core.config import load_scene, scenes_dir, SimSettings
    from blub_tpu.runtime.scene import Scene

    scene = Scene(load_scene(scenes_dir() / "mini_dam.json"), SimSettings())
    ext = scene.grid_dim_external
    assert ext == (32, 16, 16)
    assert scene.perm == choose_perm(ext)
    assert scene.params.grid_dim == tuple(ext[i] for i in scene.perm)
    scene.step()
    pos = scene.particle_positions()
    assert pos.shape[1] == 3
    # positions are in EXTERNAL grid space
    assert (pos[:, 0] < ext[0]).all() and (pos[:, 1] < ext[1]).all() and (
        pos[:, 2] < ext[2]
    ).all()
    fields = scene.debug_fields()
    assert fields["marker"].shape == ext
    assert fields["pressure_from_velocity"].shape == ext
