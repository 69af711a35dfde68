"""Perspective camera — the analog of src/camera.rs (view-projection build,
grid-space framing). The renderer is decoupled behind the state-readback
boundary (SURVEY.md §7.1), so the camera is plain numpy host code."""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np


@dataclasses.dataclass
class Camera:
    position: np.ndarray  # world/grid space
    target: np.ndarray
    up: np.ndarray = dataclasses.field(default_factory=lambda: np.array([0.0, 1.0, 0.0]))
    fov_y_deg: float = 45.0
    near: float = 0.1

    @staticmethod
    def framing(grid_dim: Tuple[int, int, int], azimuth_deg: float = 35.0, elevation_deg: float = 22.0) -> "Camera":
        """Default camera framing the whole fluid box (grid space)."""
        dim = np.asarray(grid_dim, np.float64)
        center = dim / 2.0
        radius = float(np.linalg.norm(dim)) * 0.9
        az = math.radians(azimuth_deg)
        el = math.radians(elevation_deg)
        offset = radius * np.array(
            [math.cos(el) * math.sin(az), math.sin(el), math.cos(el) * math.cos(az)]
        )
        return Camera(position=center + offset, target=center)

    def basis(self):
        fwd = self.target - self.position
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, self.up)
        right = right / np.linalg.norm(right)
        up = np.cross(right, fwd)
        return right, up, fwd

    def project(self, points: np.ndarray, width: int, height: int):
        """Project grid-space points f32[N,3] to (px f32[N], py f32[N],
        depth f32[N], valid bool[N])."""
        right, up, fwd = self.basis()
        rel = points - self.position
        x = rel @ right
        y = rel @ up
        z = rel @ fwd
        valid = z > self.near
        zs = np.where(valid, z, 1.0)
        f = (height / 2.0) / math.tan(math.radians(self.fov_y_deg) / 2.0)
        px = width / 2.0 + f * x / zs
        py = height / 2.0 - f * y / zs
        return px, py, z, valid

    def focal_px(self, height: int) -> float:
        return (height / 2.0) / math.tan(math.radians(self.fov_y_deg) / 2.0)
