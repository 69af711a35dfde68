"""Particle seeding: fluid cubes with stratified 2x2x2 jitter.

Replicates the behavior of the reference's ``HybridFluid::add_fluid_cube``
(src/simulation/hybrid_fluid.rs:609-678): cube bounds are clamped to whole
cells in ``[1, dim-1]`` (the outermost cell ring is reserved for solid
boundary), each cell receives 8 particles at stratified positions
``(s%2, s/2%2, s/4%2) * 0.5 + U[0,0.5)^3``. The RNG here is numpy's
(the reference uses rand::SmallRng — bit-exact replication of a foreign PRNG
is intentionally not a goal; determinism within this framework is).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from .config import SceneConfig

PARTICLES_PER_GRID_CELL = 8  # reference hybrid_fluid.rs:90


def clamp_to_grid(p, grid_dim) -> np.ndarray:
    """Reference hybrid_fluid.rs:609-617: clamp to [1, dim-1] integer cells."""
    p = np.asarray(p, np.float64)
    lo = np.ones(3)
    hi = np.asarray(grid_dim, np.float64) - 1.0
    return np.clip(p.astype(np.uint32), lo, hi).astype(np.int64)


def add_fluid_cube(
    grid_dim: Tuple[int, int, int],
    min_grid,
    max_grid,
    max_num_particles: int,
    existing: int = 0,
    seed: int | None = None,
) -> np.ndarray:
    """Generate particle positions for one fluid cube. Returns f32[n, 3]."""
    mn = clamp_to_grid(min_grid, grid_dim)
    mx = clamp_to_grid(max_grid, grid_dim)
    extent = np.maximum(mx - mn, 0)
    n = int(extent.prod()) * PARTICLES_PER_GRID_CELL
    n = min(n, max(max_num_particles - existing, 0))
    if n == 0:
        return np.zeros((0, 3), np.float32)

    i = np.arange(n, dtype=np.int64)
    cell_linear = i // PARTICLES_PER_GRID_CELL
    # Reference cell ordering: x fastest, then y, then z (hybrid_fluid.rs:648-652).
    cx = mn[0] + cell_linear % extent[0]
    cy = mn[1] + (cell_linear // extent[0]) % extent[1]
    cz = mn[2] + (cell_linear // (extent[0] * extent[1]))
    cell = np.stack([cx, cy, cz], axis=-1).astype(np.float32)

    s = (i % PARTICLES_PER_GRID_CELL).astype(np.float32)
    strat = np.stack([s % 2, (s // 2) % 2, (s // 4) % 2], axis=-1) * 0.5

    # Seed keyed on the running particle count like the reference (rs:639).
    rng = np.random.default_rng(existing + n if seed is None else seed)
    jitter = rng.random((n, 3), np.float32) * 0.5
    pos = (cell + strat + jitter).astype(np.float32)
    # seeds land on the rel16 position grid (sim/slot_major.quantize_pos):
    # every later position store quantizes, so starting quantized keeps the
    # flat/pt/slot-major paths bit-identical from step 0
    return (np.round(pos * np.float32(8192.0)) * np.float32(2.0 ** -13)).astype(np.float32)


def seed_scene(scene: SceneConfig, seed: int | None = None) -> np.ndarray:
    """Seed all fluid cubes of a scene. Returns f32[num_particles, 3]."""
    dim = scene.fluid.grid_dimension
    parts: list[np.ndarray] = []
    count = 0
    for mn, mx in scene.fluid_cubes_grid():
        p = add_fluid_cube(dim, mn, mx, scene.fluid.max_num_particles, existing=count, seed=seed)
        count += p.shape[0]
        parts.append(p)
    if not parts:
        return np.zeros((0, 3), np.float32)
    return np.concatenate(parts, axis=0)
