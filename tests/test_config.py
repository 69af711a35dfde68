"""Scene JSON loading: blub's scenes/*.json parse unchanged."""

import math

from blub_tpu.core.config import SimSettings, list_scenes, load_scene, scenes_dir


def test_all_scenes_load():
    scenes = list_scenes()
    assert len(scenes) >= 13
    for path in scenes:
        cfg = load_scene(path)
        assert cfg.fluid.max_num_particles > 0
        assert all(d > 0 for d in cfg.fluid.grid_dimension)


def test_dam_halfhalf_values():
    cfg = load_scene(scenes_dir() / "dam_halfhalf.json")
    assert cfg.fluid.grid_dimension == (128, 64, 64)
    assert cfg.fluid.max_num_particles == 1238328
    assert math.isclose(cfg.fluid.grid_to_world_scale, 0.01)
    assert cfg.gravity == (0.0, -9.81, 0.0)
    # gravity in grid space (scene/mod.rs:139)
    assert math.isclose(cfg.gravity_grid[1], -981.0)
    cubes = cfg.fluid_cubes_grid()
    assert len(cubes) == 1
    assert math.isclose(cubes[0][1][0], 64.0)


def test_wavegenerator_animation():
    cfg = load_scene(scenes_dir() / "wavegenerator.json")
    assert len(cfg.static_objects) == 1
    obj = cfg.static_objects[0]
    assert obj.model == "cube.obj"
    assert obj.animation is not None and obj.animation.translation is not None
    assert obj.animation.translation.curve == "Linear"
    assert math.isclose(obj.animation.translation.duration, 0.8)


def test_sim_settings_defaults():
    s = SimSettings()
    assert s.simulation_steps_per_second == 120  # simulation_controller.rs:39
    assert math.isclose(s.dt, 1.0 / 120.0)
    assert s.solver_velocity.error_tolerance == 0.1
    assert s.solver_velocity.max_num_iterations == 32
    assert s.solver_velocity.error_check_frequency == 4
