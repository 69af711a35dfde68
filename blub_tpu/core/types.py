"""Core state pytrees and static parameters of the simulation.

Design notes (TPU-first, not a port):
- The reference keeps particle state in GPU SSBOs (position + linked-list next,
  plus three vec4 APIC rows; reference src/simulation/hybrid_fluid.rs:104-119).
  Here particle state is a struct-of-arrays pytree with a *static* capacity so
  every jitted step has static shapes. Positions live in grid space exactly like
  the reference (shader/simulation/particles.glsl:5-8).
- Grid fields are dense ``f32[X, Y, Z]`` arrays. The marker grid keeps the
  reference's encoding SOLID=0 / FLUID=1 / AIR=-1 (hybrid_fluid.glsl:21-24) so
  ``|marker|`` counts non-solid cells, which the pressure operator exploits.
- Velocity grids are *transient* (rebuilt by P2G every step); only the two
  pressure fields persist across steps for warm starting, mirroring
  ``PressureField`` in the reference (pressure_solver.rs:84-210).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .config import SceneConfig, SimSettings, SolverConfig

# Marker cell types — same encoding as the reference (hybrid_fluid.glsl:21-24).
CELL_SOLID = 0
CELL_FLUID = 1
CELL_AIR = -1


def _register(cls):
    return jax.tree_util.register_dataclass(cls)


@_register
@dataclasses.dataclass
class SolverStats:
    """Per-solve statistics, the analog of the reference's 8-byte GPU stats
    readback (pressure_reduce.comp RESULTMODE_MAX_ERROR path)."""

    error: jax.Array  # f32 scalar: max |residual| at exit (scaled by dt: error*dt)
    iterations: jax.Array  # i32 scalar

    @staticmethod
    def zero() -> "SolverStats":
        return SolverStats(error=jnp.float32(0.0), iterations=jnp.int32(0))


@_register
@dataclasses.dataclass
class Particles:
    """SoA particle state, fixed capacity, grid-space positions.

    ``c`` stores the APIC affine velocity matrix with rows (cx, cy, cz) —
    the same data the reference splits into three vec4 buffers
    (ParticleBufferVelocityX/Y/Z, hybrid_fluid.rs:104-119), stored here as
    ``f32[N, 3, 3]`` where ``c[p, i]`` is the gradient row of velocity
    component i.
    """

    pos: jax.Array  # f32[N, 3]
    vel: jax.Array  # f32[N, 3]
    affine: jax.Array  # f32[N, 3, 3]

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]


@_register
@dataclasses.dataclass
class SolidState:
    """Voxelized solid boundary, the analog of the reference's
    SceneVoxelization rgba16f volume (src/scene/voxelization.rs): per-cell
    solid occupancy and solid velocity in grid space."""

    occupancy: jax.Array  # f32[X, Y, Z], >0 where solid
    velocity: jax.Array  # f32[X, Y, Z, 3] solid velocity (grid units / s)

    @staticmethod
    def empty(grid_dim: Tuple[int, int, int]) -> "SolidState":
        return SolidState(
            occupancy=jnp.zeros(grid_dim, jnp.float32),
            velocity=jnp.zeros(grid_dim + (3,), jnp.float32),
        )


@_register
@dataclasses.dataclass
class FluidState:
    """Full persistent simulation state (one step maps FluidState -> FluidState)."""

    particles: Particles
    pressure_vel: jax.Array  # f32[X,Y,Z] warm-start pressure (velocity solve)
    pressure_den: jax.Array  # f32[X,Y,Z] warm-start pressure (density solve)
    step_index: jax.Array  # i32 scalar
    stats_vel: SolverStats
    stats_den: SolverStats


@dataclasses.dataclass(frozen=True)
class SimParams:
    """Static (hashable) simulation parameters, closed over by jit.

    ``num_particles`` is static: the reference only ever adds particles at
    scene setup (add_fluid_cube, hybrid_fluid.rs:620-678), so the active count
    never changes during stepping.
    """

    grid_dim: Tuple[int, int, int]
    dt: float
    gravity_grid: Tuple[float, float, float]
    num_particles: int
    solver_vel: SolverConfig = dataclasses.field(default_factory=SolverConfig)
    solver_den: SolverConfig = dataclasses.field(default_factory=SolverConfig)
    has_solids: bool = False

    @property
    def num_cells(self) -> int:
        x, y, z = self.grid_dim
        return x * y * z

    @staticmethod
    def from_scene(scene: SceneConfig, settings: SimSettings | None = None, num_particles: int | None = None) -> "SimParams":
        settings = settings or SimSettings()
        return SimParams(
            grid_dim=scene.fluid.grid_dimension,
            dt=settings.dt,
            gravity_grid=scene.gravity_grid,
            num_particles=int(num_particles if num_particles is not None else 0),
            solver_vel=settings.solver_velocity,
            solver_den=settings.solver_density,
            has_solids=len(scene.static_objects) > 0,
        )


def make_state(params: SimParams, pos, vel=None) -> FluidState:
    """Build an initial FluidState from particle positions (f32[N,3] grid space)."""
    n = pos.shape[0]
    assert n == params.num_particles, (n, params.num_particles)
    pos = jnp.asarray(pos, jnp.float32)
    vel = jnp.zeros((n, 3), jnp.float32) if vel is None else jnp.asarray(vel, jnp.float32)
    particles = Particles(pos=pos, vel=vel, affine=jnp.zeros((n, 3, 3), jnp.float32))
    return FluidState(
        particles=particles,
        # separate buffers: donation must not see the same buffer twice
        pressure_vel=jnp.zeros(params.grid_dim, jnp.float32),
        pressure_den=jnp.zeros(params.grid_dim, jnp.float32),
        step_index=jnp.int32(0),
        stats_vel=SolverStats.zero(),
        stats_den=SolverStats.zero(),
    )
