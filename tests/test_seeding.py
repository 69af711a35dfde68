"""Particle seeding parity with HybridFluid::add_fluid_cube."""

import numpy as np

from blub_tpu.core.config import load_scene, scenes_dir
from blub_tpu.core.seeding import PARTICLES_PER_GRID_CELL, add_fluid_cube, seed_scene


def test_particle_count_8_per_cell():
    pos = add_fluid_cube((32, 32, 32), (1, 1, 1), (5, 5, 5), 10**9)
    assert pos.shape == (4 * 4 * 4 * PARTICLES_PER_GRID_CELL, 3)


def test_positions_inside_cube():
    pos = add_fluid_cube((32, 32, 32), (2, 3, 4), (6, 7, 8), 10**9)
    assert (pos >= [2, 3, 4]).all()
    assert (pos < [6, 7, 8]).all()


def test_clamping_to_valid_interior():
    # clamp to [1, dim-1] (hybrid_fluid.rs:609-617)
    pos = add_fluid_cube((16, 16, 16), (-5, -5, -5), (100, 100, 100), 10**9)
    assert (pos >= 1.0).all()
    assert (pos < 15.0).all()


def test_stratified_jitter():
    pos = add_fluid_cube((8, 8, 8), (1, 1, 1), (2, 2, 2), 10**9)
    assert pos.shape[0] == 8
    # each particle confined to its 0.5-wide octant
    frac = pos - 1.0
    octant = np.floor(frac / 0.5).astype(int)
    octs = {tuple(o) for o in octant}
    assert len(octs) == 8


def test_max_particles_respected():
    pos = add_fluid_cube((32, 32, 32), (1, 1, 1), (9, 9, 9), max_num_particles=100)
    assert pos.shape[0] == 100


def test_seed_scene_deterministic():
    cfg = load_scene(scenes_dir() / "single_cell_debug.json")
    a = seed_scene(cfg)
    b = seed_scene(cfg)
    assert a.shape[0] == 8  # one cell at 8/cell
    np.testing.assert_array_equal(a, b)


def test_dam_scene_counts():
    cfg = load_scene(scenes_dir() / "dam_halfhalf.json")
    pos = seed_scene(cfg)
    # Cube 0..64 x 0..40 x 0..64 clamped to [1, dim-1] per axis (dims 128,64,64)
    # -> extents (63, 39, 62) * 8 particles/cell. max_num_particles is only a
    # buffer-size bound in the reference, not the seeded count.
    assert pos.shape[0] == 63 * 39 * 62 * 8
    assert pos.shape[0] <= cfg.fluid.max_num_particles
