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
    shifts, vts, oms, cts, _, _ = solid_params_at(objs, 0.0, 1 / 120)
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
    shifts, vts, oms, cts, _, _ = solid_params_at(objs, t, 1 / 120)
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
    shifts2, vts2 = solid_params_at(objs, 0.3, 1 / 120)[:2]
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


def test_runtime_rotation_voxelization():
    """A cube rotating 90 deg about +Y must reproduce the 90-deg STATIC bake
    (runtime-rotation resample, models.rs:172-181 semantics): compare
    occupancies of (a) animation rotation at t=quarter-turn and (b) the same
    cube baked with static rotation_angles=(0,90,0)."""
    import dataclasses as dc

    from blub_tpu.core.config import load_scene
    from blub_tpu.core.models import build_solid_objects
    from blub_tpu.sim.voxelize import rotating_flags, solid_params_at, voxelize_step

    G = (32, 16, 16)

    def scene_with(obj_json):
        import json, tempfile, pathlib

        cfg = {
            "gravity": {"x": 0, "y": -9.81, "z": 0},
            "fluid": {
                "world_position": {"x": 0, "y": 0, "z": 0},
                "max_num_particles": 8,
                "grid_to_world_scale": 0.01,
                "grid_dimension": {"x": G[0], "y": G[1], "z": G[2]},
                "fluid_cubes": [],
            },
            "static_objects": [obj_json],
        }
        p = pathlib.Path(tempfile.mkdtemp()) / "s.json"
        p.write_text(json.dumps(cfg))
        return load_scene(p)

    # an elongated box (cube model scaled) off-center about its origin, so the
    # rotation visibly moves voxels
    base = {
        "model": "cube.obj",
        "world_position": {"x": 0.12, "y": 0.06, "z": 0.08},
        "scale": 0.07,
        "rotation_angles": {"x": 0.0, "y": 0.0, "z": 0.0},
    }
    deg_per_sec = 90.0
    t = 1.0  # quarter turn
    rotating = dict(base)
    rotating["animation"] = {
        "rotation": {"axis": {"x": 0, "y": 1, "z": 0}, "deg_per_sec": deg_per_sec}
    }
    static_rotated = dict(base)
    static_rotated["rotation_angles"] = {"x": 0.0, "y": deg_per_sec * t, "z": 0.0}

    def occupancy(scene_cfg, t_query):
        objs = build_solid_objects(scene_cfg)
        sdfs = [jnp.asarray(o.sdf) for o in objs]
        pads = tuple(o.pad_lo for o in objs)
        shifts, vts, oms, cts, qs, o0s = solid_params_at(objs, t_query, 1 / 120)
        return np.asarray(
            voxelize_step(
                sdfs, pads, jnp.asarray(shifts), jnp.asarray(vts), jnp.asarray(oms),
                jnp.asarray(cts), G, rot_q=jnp.asarray(qs),
                origins0=jnp.asarray(o0s), rotating=rotating_flags(objs),
            ).occupancy
        )

    occ_anim = occupancy(scene_with(rotating), t)
    occ_static = occupancy(scene_with(static_rotated), 0.0)
    assert occ_anim.sum() > 50  # the solid exists
    # trilinear resample vs fresh bake: allow a 1-voxel shell of disagreement
    diff = np.abs(occ_anim - occ_static)
    assert diff.mean() < 0.02, (occ_anim.sum(), occ_static.sum(), diff.sum())
    # and WITHOUT the rotation flag the occupancy must differ materially
    # (proves the flag engages the rotated path)
    objs = build_solid_objects(scene_with(rotating))
    sdfs = [jnp.asarray(o.sdf) for o in objs]
    pads = tuple(o.pad_lo for o in objs)
    shifts, vts, oms, cts, qs, o0s = solid_params_at(objs, t, 1 / 120)
    occ_norot = np.asarray(
        voxelize_step(
            sdfs, pads, jnp.asarray(shifts), jnp.asarray(vts), jnp.asarray(oms),
            jnp.asarray(cts), G,
        ).occupancy
    )
    assert np.abs(occ_norot - occ_static).mean() > diff.mean()


def test_procedural_standins_engage_for_lfs_models():
    """dam_halfhalf_staticbunny ships a git-lfs pointer; the build must
    substitute the bunny-silhouette stand-in (NOT a plain sphere), record it
    on the object, and bake the SDF from the same mesh (VERDICT.md missing #6)."""
    from blub_tpu.core.config import load_scene
    from blub_tpu.core.models import build_solid_objects

    cfg = load_scene("scenes/dam_halfhalf_staticbunny.json")
    objs = build_solid_objects(cfg)
    assert len(objs) == 1
    o = objs[0]
    assert o.standin == "bunny"
    assert o.mesh_verts is not None and len(o.mesh_faces) > 100
    assert (o.sdf < 0).any()  # the bake has an interior
    # the bunny is taller than wide and has two separated ears near the top
    v = o.mesh_verts
    assert v[:, 1].max() - v[:, 1].min() > v[:, 0].max() - v[:, 0].min()


def test_load_obj_materials_kd():
    import pathlib
    import tempfile

    from blub_tpu.core.models import load_obj_materials

    d = pathlib.Path(tempfile.mkdtemp())
    (d / "m.mtl").write_text("newmtl red\nKd 1.0 0.0 0.0\nnewmtl blue\nKd 0.0 0.0 1.0\n")
    (d / "m.obj").write_text(
        "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
        "usemtl red\nf 1 2 3\nusemtl blue\nf 1 3 4\nf 1 4 2\n"
    )
    verts, tris, albedo, _uv, _tex = load_obj_materials(d / "m.obj")
    assert verts.shape == (4, 3) and tris.shape == (3, 3)
    np.testing.assert_allclose(albedo[0], [1, 0, 0])
    np.testing.assert_allclose(albedo[1], [0, 0, 1])
    np.testing.assert_allclose(albedo[2], [0, 0, 1])
