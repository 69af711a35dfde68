"""Offline scene renderer: particle spheres, screen-space fluid, volume
visualization — the capability set of src/renderer/ (SceneRenderer,
ParticleRenderer, ScreenSpaceFluid, VolumeRenderer, Background) behind the
state-readback boundary: the simulation returns particle/grid arrays and this
module turns them into images on the host, entirely off the hot path.

Technique mapping:
- ParticleRenderer's ray-cast sphere impostors (sphere_particles.frag) ->
  z-buffered point splats with spherical depth offsets + screen-space normal
  reconstruction;
- ScreenSpaceFluid (depth min-splat, narrow-range filter, thickness,
  Beer-Lambert + Fresnel compose; shader/screenspace_fluid/*) -> the same
  passes as numpy image ops with a depth-clamped separable blur;
- VolumeRenderer's per-cell billboards -> value-scaled cell-center splats;
- Background's checkered ground plane (background.glsl:25-63) + sky gradient.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple

import numpy as np

from .camera import Camera


class FluidRenderingMode(enum.Enum):
    NONE = "none"
    SCREEN_SPACE_FLUID = "screen_space_fluid"
    PARTICLES_VELOCITY = "particles_velocity"
    PARTICLES_INDEX = "particles_index"


class VolumeVisualizationMode(enum.Enum):
    NONE = "none"
    VELOCITY = "velocity"
    DIVERGENCE_ERROR = "divergence_error"
    PRESSURE_FROM_VELOCITY = "pressure_from_velocity"
    PRESSURE_FROM_DENSITY = "pressure_from_density"
    MARKER = "marker"
    DEBUG = "debug"


_FAR = 1e9


@dataclasses.dataclass
class RenderSettings:
    width: int = 640
    height: int = 480
    fluid_mode: FluidRenderingMode = FluidRenderingMode.PARTICLES_VELOCITY
    volume_mode: VolumeVisualizationMode = VolumeVisualizationMode.NONE
    particle_radius_factor: float = 1.0  # GUI knob (scene_renderer.rs:173-176)
    velocity_viz_scale: float = 100.0  # |v| mapped to heatmap max (grid/s)
    fluid_color: Tuple[float, float, float] = (0.15, 0.45, 0.85)


class SceneRenderer:
    def __init__(self, grid_dim: Tuple[int, int, int], settings: RenderSettings | None = None, camera: Camera | None = None):
        self.grid_dim = grid_dim
        self.settings = settings or RenderSettings()
        self.camera = camera or Camera.framing(grid_dim)
        # 8 particles/cell at rest -> radius = 0.5 / cbrt(8) * 2 ~ half of the
        # inter-particle spacing (reference: scale / 8^(1/3) * factor, in
        # world units; here grid space).
        self.particle_radius = 0.5 * self.settings.particle_radius_factor

    # ------------------------------------------------------------------ core

    def _splat(self, pos: np.ndarray, radius: float, values: Optional[np.ndarray] = None):
        """Z-buffered sphere splatting.

        Returns (depth f32[H,W], winner i32[H,W] or None): depth buffer with
        spherical offsets, and per-pixel winning point index when ``values``
        colorization is needed (packed 64-bit min trick).
        """
        s = self.settings
        w, h = s.width, s.height
        px, py, z, valid = self.camera.project(pos, w, h)
        f = self.camera.focal_px(h)
        r_px = np.clip(f * radius / np.maximum(z, 1e-3), 0.6, 8.0)

        try:
            from ..ops.native import splat_native

            out = splat_native(px, py, z.astype(np.float32), r_px, valid, w, h, f)
        except Exception:
            out = None
        if out is not None:
            depth_n, winner_n = out
            if values is None:
                return depth_n, None
            winner_n = winner_n.astype(np.int64)
            winner_n[depth_n >= _FAR] = -1
            return depth_n, winner_n

        depth = np.full(h * w, _FAR, np.float32)
        keys = np.full(h * w, np.iinfo(np.int64).max, np.int64) if values is not None else None

        ix = np.round(px).astype(np.int64)
        iy = np.round(py).astype(np.int64)
        rmax = int(np.ceil(r_px.max())) if len(r_px) else 0
        idx_all = np.arange(pos.shape[0], dtype=np.int64)
        for dy in range(-rmax, rmax + 1):
            for dx in range(-rmax, rmax + 1):
                d2 = dx * dx + dy * dy
                m = valid & (d2 <= r_px * r_px)
                if not m.any():
                    continue
                x = ix[m] + dx
                y = iy[m] + dy
                inb = (x >= 0) & (x < w) & (y >= 0) & (y < h)
                if not inb.any():
                    continue
                x, y = x[inb], y[inb]
                sel = np.nonzero(m)[0][inb]
                # spherical depth offset (sphere impostor, sphere_particles.frag)
                rr = r_px[sel]
                zoff = np.sqrt(np.maximum(rr * rr - d2, 0.0)) * z[sel] / f
                zz = (z[sel] - zoff).astype(np.float32)
                lin = y * w + x
                np.minimum.at(depth, lin, zz)
                if keys is not None:
                    zbits = zz.view(np.uint32).astype(np.int64)  # z>0: bits monotone
                    np.minimum.at(keys, lin, (zbits << 24) | (idx_all[sel] & 0xFFFFFF))
        depth = depth.reshape(h, w)
        winner = None
        if keys is not None:
            winner = (keys & 0xFFFFFF).astype(np.int64).reshape(h, w)
            winner[depth >= _FAR] = -1
        return depth, winner

    def _thickness(self, pos: np.ndarray, radius: float) -> np.ndarray:
        s = self.settings
        w, h = s.width, s.height
        px, py, z, valid = self.camera.project(pos, w, h)
        f = self.camera.focal_px(h)
        r_px = np.clip(f * radius / np.maximum(z, 1e-3), 0.6, 6.0)
        buf = np.zeros(h * w, np.float32)
        ix = np.round(px).astype(np.int64)
        iy = np.round(py).astype(np.int64)
        rmax = int(np.ceil(r_px.max())) if len(r_px) else 0
        for dy in range(-rmax, rmax + 1):
            for dx in range(-rmax, rmax + 1):
                d2 = dx * dx + dy * dy
                m = valid & (d2 <= r_px * r_px)
                if not m.any():
                    continue
                x = np.clip(ix[m] + dx, 0, w - 1)
                y = np.clip(iy[m] + dy, 0, h - 1)
                np.add.at(buf, y * w + x, radius)
        return buf.reshape(h, w)

    # ------------------------------------------------------------ background

    def _background(self) -> Tuple[np.ndarray, np.ndarray]:
        """(rgb f32[H,W,3], depth f32[H,W]) — sky gradient + checkered ground
        plane at y=1 (domain floor), box-filtered-ish like background.glsl."""
        s = self.settings
        w, h = s.width, s.height
        right, up, fwd = self.camera.basis()
        f = self.camera.focal_px(h)
        xs = (np.arange(w) - w / 2.0 + 0.5) / f
        ys = -(np.arange(h) - h / 2.0 + 0.5) / f
        dirs = (
            fwd[None, None]
            + xs[None, :, None] * right[None, None]
            + ys[:, None, None] * up[None, None]
        )
        dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)

        t_sky = np.clip(dirs[..., 1] * 0.5 + 0.5, 0, 1)[..., None]
        sky = (1 - t_sky) * np.array([0.85, 0.88, 0.92]) + t_sky * np.array([0.35, 0.55, 0.85])

        floor_y = 1.0
        dy = dirs[..., 1]
        t = (floor_y - self.camera.position[1]) / np.where(np.abs(dy) < 1e-6, -1e-6, dy)
        hit = (t > 0) & (dy < 0)
        gx = self.camera.position[0] + t * dirs[..., 0]
        gz = self.camera.position[2] + t * dirs[..., 2]
        cell = 8.0
        checker = ((np.floor(gx / cell) + np.floor(gz / cell)) % 2).astype(np.float32)
        fade = np.exp(-np.maximum(t, 0) / 600.0)
        ground = (0.45 + 0.25 * checker)[..., None] * np.array([1.0, 1.0, 1.0]) * fade[..., None] + sky * (
            1 - fade[..., None]
        )
        rgb = np.where(hit[..., None], ground, sky).astype(np.float32)
        depth = np.where(hit, t, _FAR).astype(np.float32)
        return rgb, depth

    # --------------------------------------------------------------- shading

    @staticmethod
    def _normals_from_depth(depth: np.ndarray) -> np.ndarray:
        gx = np.gradient(depth, axis=1)
        gy = np.gradient(depth, axis=0)
        n = np.stack([-gx, -gy, np.full_like(depth, 0.6)], axis=-1)
        return n / np.linalg.norm(n, axis=-1, keepdims=True)

    @staticmethod
    def _heatmap(t: np.ndarray) -> np.ndarray:
        """Cool-warm-ish velocity colormap (utilities.glsl heatmap)."""
        t = np.clip(t, 0.0, 1.0)[..., None]
        c0 = np.array([0.1, 0.25, 0.8])
        c1 = np.array([0.3, 0.85, 0.4])
        c2 = np.array([0.95, 0.15, 0.1])
        return np.where(t < 0.5, c0 + (c1 - c0) * (t * 2), c1 + (c2 - c1) * (t * 2 - 1))

    def _depth_smooth(self, depth: np.ndarray, iterations: int = 3, clamp: float = 2.0) -> np.ndarray:
        """Narrow-range-style depth filter: separable blur that clamps
        neighbor depths to +-clamp around the center before averaging
        (narrow_range_filter.glsl's dynamic depth-range clamp)."""
        d = depth.copy()
        valid = depth < _FAR
        for _ in range(iterations):
            acc = np.zeros_like(d)
            wsum = np.zeros_like(d)
            for off, axis in (((0, 1), 1), ((0, -1), 1), ((1, 0), 0), ((-1, 0), 0), ((0, 0), 0)):
                shifted = np.roll(d, off, axis=(0, 1))
                v = np.roll(valid, off, axis=(0, 1))
                nb = np.clip(shifted, d - clamp, d + clamp)
                acc += np.where(v, nb, 0.0)
                wsum += v.astype(np.float32)
            d = np.where(valid, acc / np.maximum(wsum, 1.0), d)
        return d

    # ------------------------------------------------------------------ draw

    def draw(
        self,
        positions: np.ndarray,
        velocities: Optional[np.ndarray] = None,
        field: Optional[np.ndarray] = None,
        field_is_vector: bool = False,
    ) -> np.ndarray:
        """Render one frame. Returns uint8[H,W,3].

        ``field`` feeds the volume-visualization overlay (e.g. a pressure or
        divergence grid) when settings.volume_mode is not NONE.
        """
        s = self.settings
        rgb, depth_bg = self._background()
        depth = depth_bg.copy()

        mode = s.fluid_mode
        if positions is not None and len(positions) and mode != FluidRenderingMode.NONE:
            if mode == FluidRenderingMode.SCREEN_SPACE_FLUID:
                pdepth, _ = self._splat(positions, self.particle_radius * 1.6)
                pdepth = self._depth_smooth(pdepth)
                thick = self._thickness(positions, self.particle_radius)
                n = self._normals_from_depth(np.where(pdepth < _FAR, pdepth, 0.0))
                lit = np.clip(n @ np.array([0.3, 0.8, 0.52]), 0.0, 1.0)
                absorb = np.exp(-thick[..., None] * np.asarray([0.35, 0.14, 0.07]))
                fresnel = np.clip(1.0 - n[..., 2], 0.0, 1.0) ** 2
                fluid_rgb = (
                    rgb * absorb
                    + np.asarray(s.fluid_color) * (0.25 + 0.5 * lit[..., None]) * (1 - absorb)
                    + 0.25 * fresnel[..., None]
                )
                m = (pdepth < depth) & (pdepth < _FAR)
                rgb = np.where(m[..., None], fluid_rgb, rgb)
                depth = np.where(m, pdepth, depth)
            else:
                if mode == FluidRenderingMode.PARTICLES_VELOCITY and velocities is not None:
                    vmag = np.linalg.norm(velocities, axis=-1)
                    colors = self._heatmap(vmag / s.velocity_viz_scale)
                else:
                    idx = np.arange(len(positions))
                    colors = self._heatmap((idx % 4096) / 4096.0)
                pdepth, winner = self._splat(positions, self.particle_radius, values=colors)
                n = self._normals_from_depth(np.where(pdepth < _FAR, pdepth, 0.0))
                lit = 0.35 + 0.65 * np.clip(n @ np.array([0.3, 0.8, 0.52]), 0.0, 1.0)
                pcol = np.where(
                    (winner >= 0)[..., None], colors[np.maximum(winner, 0)] * lit[..., None], 0.0
                )
                m = (pdepth < depth) & (winner >= 0)
                rgb = np.where(m[..., None], pcol, rgb)
                depth = np.where(m, pdepth, depth)

        if field is not None and s.volume_mode != VolumeVisualizationMode.NONE:
            rgb = self._draw_volume(rgb, depth, field, field_is_vector)

        return (np.clip(rgb, 0.0, 1.0) * 255).astype(np.uint8)

    def _draw_volume(self, rgb, depth, field, is_vector) -> np.ndarray:
        """Value-scaled billboards at cell centers (volume_renderer.rs)."""
        mag = np.linalg.norm(field, axis=-1) if is_vector else np.abs(field)
        top = np.percentile(mag[mag > 0], 99.0) if (mag > 0).any() else 1.0
        sel = mag > max(top * 0.05, 1e-12)
        if not sel.any():
            return rgb
        cells = np.argwhere(sel).astype(np.float32) + 0.5
        vals = mag[sel] / max(top, 1e-12)
        colors = self._heatmap(vals)
        pdepth, winner = self._splat(cells, 0.4, values=colors)
        m = (pdepth < depth) & (winner >= 0)
        out = np.where(m[..., None], colors[np.maximum(winner, 0)], rgb)
        return out
