"""Simulation checkpoint/resume.

The reference has none — recovery is "reset scene" (SURVEY.md §5.4); with the
state as one pytree this is trivial to add and needed for long benchmark runs:
a checkpoint is a single .npz of the DenseFluidState leaves plus metadata
(scene name, simulated time, step index, settings).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Tuple

import jax
import numpy as np

CHECKPOINT_VERSION = 1


def save_checkpoint(path, state, *, scene_name: str = "", total_simulated_time: float = 0.0, extra: dict | None = None) -> pathlib.Path:
    """Write the full simulation state to one .npz file."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(leaf)) for i, leaf in enumerate(leaves)}
    meta = {
        "version": CHECKPOINT_VERSION,
        "scene_name": scene_name,
        "total_simulated_time": total_simulated_time,
        "num_leaves": len(leaves),
        "extra": extra or {},
    }
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)
    return path


def load_checkpoint(path, state_like) -> Tuple[object, dict]:
    """Restore a state pytree (using ``state_like`` for the tree structure).
    Returns (state, metadata)."""
    with np.load(pathlib.Path(path), allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        if meta["version"] != CHECKPOINT_VERSION:
            raise ValueError(f"checkpoint version {meta['version']} != {CHECKPOINT_VERSION}")
        leaves_like, treedef = jax.tree_util.tree_flatten(state_like)
        if meta["num_leaves"] != len(leaves_like):
            raise ValueError(
                f"checkpoint has {meta['num_leaves']} leaves, state expects {len(leaves_like)}"
            )
        leaves = []
        for i, like in enumerate(leaves_like):
            arr = data[f"leaf_{i}"]
            if tuple(arr.shape) != tuple(np.shape(like)):
                raise ValueError(f"leaf {i}: shape {arr.shape} != expected {np.shape(like)}")
            leaves.append(jax.numpy.asarray(arr))
        return jax.tree_util.tree_unflatten(treedef, leaves), meta


def save_scene(scene, path) -> pathlib.Path:
    return save_checkpoint(
        path,
        scene.state,
        scene_name=scene.config.name,
        total_simulated_time=scene.total_simulated_time,
    )


def load_scene_checkpoint(scene, path) -> None:
    state, meta = load_checkpoint(path, scene.state)
    if meta["scene_name"] and meta["scene_name"] != scene.config.name:
        raise ValueError(f"checkpoint is for scene {meta['scene_name']!r}, not {scene.config.name!r}")
    scene.state = state
    scene.total_simulated_time = float(meta["total_simulated_time"])
