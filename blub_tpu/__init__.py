"""blub-tpu: a TPU-native 3D hybrid (APIC) fluid simulation engine.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of Wumpf/blub
(see SURVEY.md). The simulation step is a single jit-compiled pure function
over a FluidState pytree; scenes use blub's JSON format unchanged.
"""

__version__ = "0.1.0"

from .core.config import SceneConfig, SimSettings, SolverConfig, load_scene, list_scenes
from .core.types import FluidState, Particles, SimParams, SolidState, make_state
from .core.seeding import seed_scene

__all__ = [
    "SceneConfig",
    "SimSettings",
    "SolverConfig",
    "load_scene",
    "list_scenes",
    "FluidState",
    "Particles",
    "SimParams",
    "SolidState",
    "make_state",
    "seed_scene",
]
