"""blub-tpu: a TPU-native 3D hybrid (APIC) fluid simulation engine.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of Wumpf/blub
(see SURVEY.md). The simulation step is a single jit-compiled pure function
over a FluidState pytree; scenes use blub's JSON format unchanged.
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (full-step compiles run 20-80 s on the
    tunneled TPU — VERDICT.md weak #7). Opt out with BLUB_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("BLUB_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "blub_tpu_xla"),
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

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
