"""Solid obstacles: SDF baking, animated voxelization, fluid interaction."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from blub_tpu.core.config import (
    FluidConfig,
    FluidCube,
    RigidAnimation,
    SceneConfig,
    SimSettings,
    SolverConfig,
    StaticObjectConfig,
    TranslationAnimation,
)
from blub_tpu.core.models import box_sdf, build_solid_objects, load_obj, mesh_sdf
from blub_tpu.runtime.scene import Scene
from blub_tpu.sim.voxelize import solid_params_at, voxelize_step

import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]


def _scene(objects=(), dim=(24, 16, 16), cubes=((0.0, 0.0, 0.0, 0.08, 0.12, 0.16),)):
    scale = 0.01
    return SceneConfig(
        gravity=(0.0, -9.81, 0.0),
        fluid=FluidConfig(
            world_position=(0.0, 0.0, 0.0),
            grid_to_world_scale=scale,
            grid_dimension=dim,
            max_num_particles=10**7,
            fluid_cubes=tuple(
                FluidCube(min=(c[0], c[1], c[2]), max=(c[3], c[4], c[5])) for c in cubes
            ),
        ),
        static_objects=tuple(objects),
        name="test",
    )


def _piston(duration=0.2, x0=0.24, x1=0.12, scale=0.08):
    """Animated cube entering from +x like wavegenerator.json."""
    return StaticObjectConfig(
        model="cube.obj",
        world_position=(x0, 0.0, 0.0),
        scale=scale,
        rotation_angles=(0.0, 0.0, 0.0),
        animation=RigidAnimation(
            translation=TranslationAnimation(target=(x1, 0.0, 0.0), curve="Linear", duration=duration)
        ),
    )


def test_load_obj_cube():
    geom = load_obj(REPO / "models" / "cube.obj")
    assert geom is not None
    verts, tris = geom
    assert verts.shape == (8, 3)
    assert tris.shape == (12, 3)


def test_mesh_sdf_matches_box():
    geom = load_obj(REPO / "models" / "cube.obj")
    rng = np.random.default_rng(0)
    pts = (rng.random((500, 3)) * 3.0 - 1.0).astype(np.float32)
    d_mesh = mesh_sdf(geom[0], geom[1], pts)
    d_box = box_sdf(pts, (0, 0, 0), (1, 1, 1))
    np.testing.assert_allclose(d_mesh, d_box, atol=1e-3)


def test_bake_and_voxelize_static():
    cfg = _scene(objects=[_piston()])
    objs = build_solid_objects(cfg)
    assert len(objs) == 1
    sdfs = [jnp.asarray(o.sdf) for o in objs]
    pads = [o.pad_lo for o in objs]
    shifts, vts, oms, cts = solid_params_at(objs, 0.0, 1 / 120)
    solids = voxelize_step(sdfs, pads, jnp.asarray(shifts), jnp.asarray(vts),
                           jnp.asarray(oms), jnp.asarray(cts), cfg.fluid.grid_dimension)
    occ = np.asarray(solids.occupancy)
    # at t=0 the cube spans x in [24, 32) voxels -> outside the 24-wide domain
    assert occ[:23, :, :].sum() == 0


def test_voxelize_animated_entry_and_velocity():
    cfg = _scene(objects=[_piston(duration=0.2)])
    objs = build_solid_objects(cfg)
    sdfs = [jnp.asarray(o.sdf) for o in objs]
    pads = [o.pad_lo for o in objs]
    # mid-animation: piston has moved 6 voxels left (x0=24 -> 18)
    t = 0.1
    shifts, vts, oms, cts = solid_params_at(objs, t, 1 / 120)
    solids = voxelize_step(sdfs, pads, jnp.asarray(shifts), jnp.asarray(vts),
                           jnp.asarray(oms), jnp.asarray(cts), cfg.fluid.grid_dimension)
    occ = np.asarray(solids.occupancy)
    assert occ[19:23, 2:6, 2:6].all()  # interior of the entered piston
    assert occ[:17, :, :].sum() == 0  # not further than the motion
    vel = np.asarray(solids.velocity)
    # piston moves -x at 0.12 m/s over 0.2 s -> 60 voxels/s
    vx = vel[..., 0][occ > 0]
    np.testing.assert_allclose(vx, -60.0, rtol=1e-3)
    # ping-pong: at t = 1.5*duration it is halfway back, moving +x
    shifts2, vts2, _, _ = solid_params_at(objs, 0.3, 1 / 120)
    assert shifts2[0][0] > shifts[0][0] - 1e-5
    assert vts2[0][0] > 0


def test_scene_fluid_pushed_by_piston():
    """A piston sweeping through a pool must displace particles (wavegenerator
    behavior)."""
    # Piston face speed 0.53 voxels/step — comparable to the reference's
    # wavegenerator (0.29); the 1-cell/step escape mechanism cannot keep up
    # with much faster solids (true in the reference too).
    cfg = _scene(
        # full-height piston like wavegenerator.json (cube scale == domain height)
        objects=[_piston(duration=0.3, x0=0.24, x1=0.08, scale=0.16)],
        cubes=((0.0, 0.0, 0.0, 0.10, 0.06, 0.16),),
    )
    scene = Scene(cfg, SimSettings(), capacity=24)
    y_max0 = scene.particle_positions()[:, 1].max()
    # 34 steps = t~0.283s: piston near its deepest point (x~8.5 voxels).
    for _ in range(34):
        scene.step()
    p = scene.particle_positions()
    assert np.isfinite(p).all()
    stats = scene.solver_stats()
    assert stats["lost_particles"] <= scene.params.num_particles * 0.02
    x_face = scene.solid_objects[0].world_position_at(scene.total_simulated_time)[0] / 0.01
    # everything swept left of the piston's leading face (tolerance: the
    # 1-cell escape band)
    assert (p[:, 0] < x_face + 1.5).mean() > 0.98
    # incompressible water squeezed into a narrower box piles UP
    assert p[:, 1].max() > y_max0 + 2.0
    # no particle deep inside the solid (allow the 1-cell escape boundary band)
    solids = scene.current_solids()
    occ = np.asarray(solids.occupancy)
    cells = np.floor(p).astype(int)
    inside = occ[cells[:, 0], cells[:, 1], cells[:, 2]] > 0
    assert inside.mean() < 0.02


def test_scene_reset():
    cfg = _scene()
    scene = Scene(cfg, SimSettings())
    p0 = scene.particle_positions()
    for _ in range(3):
        scene.step()
    scene.reset()
    np.testing.assert_array_equal(scene.particle_positions(), p0)
    assert scene.total_simulated_time == 0.0
