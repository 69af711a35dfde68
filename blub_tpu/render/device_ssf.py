"""Device-side screen-space-fluid pass: splat + filters + compose in ONE jit.

Round-3 moved the SSF depth/thickness FILTERS on device (render/ssf.py); the
splat stayed a host loop (numpy / native C++) and the compose pass whole-image
numpy, so recording large scenes was host-bound (VERDICT r3 weak #5). This
module runs the full fluid pass as one device program:

  project -> z-buffer sphere splat (scatter-min over the <=17x17 pixel
  footprint) -> narrow-range filter -> additive thickness splat (scatter-add)
  -> gaussian thickness filter -> refract/absorb/scatter/Fresnel compose

Reference analog: shader/screenspace_fluid/* (sphere_particles.vert/frag,
particles.frag, narrow_range_filter_*.comp, fluid_render.comp) — there the
splat is the rasterizer's job; here it is jnp scatter-min/add, which XLA runs
on-device (the footprint loop is 225 static offsets; each is one
scatter of N particles). The numpy path in render/renderer.py and render/ssf.py
is the ORACLE — this module must match it (tests/test_render.py); the compose
math is a jnp transliteration of ssf.compose with the same constants.

Deviation: the sky inside the jitted compose is always the SH-synthesized sky
(environment.sh_sky_color) — the optional RGBE cubemap gather stays a host
feature (renderer falls back to the numpy compose when a cubemap is
installed)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .environment import LIGHTING, Lighting
from .ssf import _nr_filter_jit, _thickness_filter_jit

_FAR = 1e9
_RMAX = 8  # r_px clip ceiling in renderer._splat


def _offsets():
    """Static footprint offsets within the splat radius circle."""
    out = []
    for dy in range(-_RMAX, _RMAX + 1):
        for dx in range(-_RMAX, _RMAX + 1):
            if dx * dx + dy * dy <= _RMAX * _RMAX:
                out.append((dy, dx))
    return tuple(out)


def _project(pos, cam_pos, right, up, fwd, f, near, w: int, h: int):
    """render/camera.Camera.project, traced: -> (px, py, z, valid)."""
    rel = pos - cam_pos[None]
    x = rel @ right
    y = rel @ up
    z = rel @ fwd
    valid = z > near
    zs = jnp.where(valid, z, 1.0)
    px = w / 2.0 + f * x / zs
    py = h / 2.0 - f * y / zs
    return px, py, z, valid


def _splat_depth(px, py, z, r_px, valid, w: int, h: int, f):
    """Z-buffered sphere splat: min over the footprint of z - sphere offset
    (renderer._splat's exact math; same clip/round semantics)."""
    ix = jnp.round(px).astype(jnp.int32)
    iy = jnp.round(py).astype(jnp.int32)
    depth = jnp.full((h * w,), _FAR, jnp.float32)
    r2 = r_px * r_px
    for dy, dx in _offsets():
        d2 = float(dx * dx + dy * dy)
        x = ix + dx
        y = iy + dy
        m = valid & (d2 <= r2) & (x >= 0) & (x < w) & (y >= 0) & (y < h)
        zoff = jnp.sqrt(jnp.maximum(r2 - d2, 0.0)) * z / f
        zz = jnp.where(m, z - zoff, _FAR)
        lin = jnp.clip(y, 0, h - 1) * w + jnp.clip(x, 0, w - 1)
        depth = depth.at[lin].min(zz, mode="drop")
    return depth.reshape(h, w)


def _splat_thickness(px, py, z, r_px, valid, w: int, h: int, f,
                     chord_scale, radius: float):
    """Additive thickness splat (renderer._thickness)."""
    ix = jnp.round(px).astype(jnp.int32)
    iy = jnp.round(py).astype(jnp.int32)
    buf = jnp.zeros((h * w,), jnp.float32)
    r2 = r_px * r_px
    for dy, dx in _offsets():
        d2 = float(dx * dx + dy * dy)
        x = ix + dx
        y = iy + dy
        m = valid & (d2 <= r2) & (x >= 0) & (x < w) & (y >= 0) & (y < h)
        chord = 2.0 * jnp.sqrt(jnp.maximum(r2 - d2, 0.0)) * z / f
        val = jnp.where(m, chord * chord_scale / max(radius, 1e-6), 0.0)
        lin = jnp.clip(y, 0, h - 1) * w + jnp.clip(x, 0, w - 1)
        buf = buf.at[lin].add(val, mode="drop")
    return buf.reshape(h, w)


# --- compose (jnp transliteration of ssf.compose + environment helpers) -------


def _sh3_evaluate(dirs, coeffs):
    from .environment import _B0, _B1, _B2N, _B2Z

    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    b = [
        jnp.full_like(x, _B0), -_B1 * y, _B1 * z, -_B1 * x,
        _B2N * x * y, -_B2N * y * z, _B2Z * (3.0 * z * z - 1.0),
        -_B2N * x * z, 0.5 * _B2N * (x * x - y * y),
    ]
    return sum(b[i][..., None] * coeffs[i] for i in range(9))


def _sh_sky(dirs, lt_sh3, lt_dir, lt_rad):
    from .environment import SKY_EXPOSURE

    base = _sh3_evaluate(dirs, lt_sh3) * SKY_EXPOSURE
    cos_sun = jnp.sum(dirs * -lt_dir, axis=-1, keepdims=True)
    disk = jnp.clip((cos_sun - 0.9995) / 0.0005, 0.0, 1.0) ** 2
    glow = jnp.clip(cos_sun, 0.0, 1.0) ** 64
    return base + lt_rad * (3.0 * disk + 0.15 * glow)


def _grid_box_filter(p, ddx, ddy, n: float):
    p = p + 0.5 / n
    wdt = jnp.maximum(jnp.abs(ddx), jnp.abs(ddy)) + 0.01
    a = p + 0.5 * wdt
    b = p - 0.5 * wdt
    i = (jnp.floor(a) + jnp.minimum((a - jnp.floor(a)) * n, 1.0)
         - jnp.floor(b) - jnp.minimum((b - jnp.floor(b)) * n, 1.0)) / (n * wdt)
    return (1.0 - i[..., 0]) * (1.0 - i[..., 1])


def _gradient(a, axis):
    """np.gradient transliteration (central differences, one-sided edges)."""
    lead = jnp.take(a, jnp.array([1]), axis=axis) - jnp.take(a, jnp.array([0]), axis=axis)
    n = a.shape[axis]
    mid = 0.5 * (
        jax.lax.slice_in_dim(a, 2, n, axis=axis)
        - jax.lax.slice_in_dim(a, 0, n - 2, axis=axis)
    )
    tail = jnp.take(a, jnp.array([n - 1]), axis=axis) - jnp.take(a, jnp.array([n - 2]), axis=axis)
    return jnp.concatenate([lead, mid, tail], axis=axis)


def _sample_background(position_w, dirs, lt_sh3, lt_dir, lt_rad):
    dy = dirs[..., 1]
    d = -(position_w[1] / jnp.where(jnp.abs(dy) < 1e-9, -1e-9, dy))
    plane_pos = position_w[None, None, :] + dirs * d[..., None]
    plane_size = 10.0
    on_plane = (
        (d > 0.0)
        & (jnp.abs(plane_pos[..., 0]) < plane_size)
        & (jnp.abs(plane_pos[..., 2]) < plane_size)
    )
    pxz = plane_pos[..., jnp.array([0, 2])]
    ddx = _gradient(pxz, 1)
    ddy = _gradient(pxz, 0)
    ddx = jnp.where(~jnp.isfinite(ddx) | (jnp.abs(ddx) > 1e3), 0.0, ddx)
    ddy = jnp.where(~jnp.isfinite(ddy) | (jnp.abs(ddy) > 1e3), 0.0, ddy)

    albedo = jnp.full(dirs.shape, 0.8, jnp.float32)
    g1 = _grid_box_filter(pxz * 10.0, ddx * 10.0, ddy * 10.0, 50.0)[..., None]
    albedo = 0.6 + (albedo - 0.6) * g1
    g2 = _grid_box_filter(pxz, ddx, ddy, 80.0)[..., None]
    albedo = 0.2 + (albedo - 0.2) * g2
    ground = albedo * lt_rad * (-lt_dir[1])
    sky = _sh_sky(dirs, lt_sh3, lt_dir, lt_rad)
    return jnp.where(on_plane[..., None], ground, sky)


def _reconstruct(depth, cam_pos, right, up, fwd, f, w: int, h: int):
    xs = (jnp.arange(w) - w / 2.0 + 0.5) / f
    ys = -(jnp.arange(h) - h / 2.0 + 0.5) / f
    ray = (
        fwd[None, None]
        + xs[None, :, None] * right[None, None]
        + ys[:, None, None] * up[None, None]
    )

    def shift(a, off, axis):
        # ssf._shift: roll + 99999-fill of the shifted-in edge rows
        out = jnp.roll(a, -off, axis=axis)
        n = a.shape[axis]
        idx = jnp.arange(n)
        mask = (idx >= n - off) if off > 0 else (idx < -off)
        shape = [1] * a.ndim
        shape[axis] = n
        return jnp.where(mask.reshape(shape), jnp.float32(99999.0), out)

    def pos_at(d, ray_d):
        return cam_pos[None, None] + ray_d * d[..., None]

    p = pos_at(depth, ray)
    d_up = shift(depth, -1, 0)
    d_down = shift(depth, 1, 0)
    d_left = shift(depth, -1, 1)
    d_right = shift(depth, 1, 1)
    use_right = jnp.abs(d_right - depth) < jnp.abs(d_left - depth)
    use_down = jnp.abs(d_down - depth) < jnp.abs(d_up - depth)

    p_r = pos_at(d_right, jnp.roll(ray, -1, axis=1)) - p
    p_l = pos_at(d_left, jnp.roll(ray, 1, axis=1)) - p
    p_u = pos_at(d_up, jnp.roll(ray, 1, axis=0)) - p
    p_d = pos_at(d_down, jnp.roll(ray, -1, axis=0)) - p
    ur = use_right[..., None]
    ud = use_down[..., None]
    p1 = jnp.where(ud, jnp.where(ur, p_d, p_l), jnp.where(ur, p_r, p_u))
    p2 = jnp.where(ud, jnp.where(ur, p_r, p_d), jnp.where(ur, p_u, p_l))
    n = jnp.cross(p2, p1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    to_cam = -ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-9)
    flip = jnp.sum(n * to_cam, axis=-1, keepdims=True) < 0.0
    n = jnp.where(flip, -n, n)
    return n, p


def _hg_phase(g, cos_theta):
    g2 = g * g
    return (1.0 - g2) * (1.0 + g2 - 2.0 * g * cos_theta) ** (-1.5) / (4.0 * np.pi)


def _fresnel_dielectric(cos_theta, eta: float):
    """environment.fresnel_dielectric transliterated (brdf.glsl:4-13)."""
    c = cos_theta
    temp = eta * eta + c * c - 1.0
    g = jnp.sqrt(jnp.maximum(temp, 0.0))
    num = 0.5 * ((g - c) / jnp.maximum(g + c, 1e-9)) ** 2
    den = (g - c) * c + 1.0
    frac = ((g + c) * c - 1.0) / jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
    out = num * (1.0 + frac**2)
    return jnp.where(temp < 0.0, 1.0, out)


def _compose(rgb, scene_depth, fluid_depth, thickness_w,
             cam_pos, right, up, fwd, f, near, grid_to_world: float,
             lt_sh3, lt_dir, lt_rad, w: int, h: int):
    from .ssf import ETA_WATER, EXTINCT, HG_G, SCATTER

    has_fluid = (
        (thickness_w > 0.0) & (fluid_depth < _FAR) & (fluid_depth < scene_depth)
    )
    normal, position = _reconstruct(fluid_depth, cam_pos, right, up, fwd, f, w, h)
    to_cam = cam_pos[None, None] - position
    to_cam = to_cam / jnp.maximum(jnp.linalg.norm(to_cam, axis=-1, keepdims=True), 1e-9)

    cos_i = jnp.clip(jnp.sum(to_cam * normal, axis=-1, keepdims=True), -1.0, 1.0)
    eta_inv = 1.0 / ETA_WATER
    sin2_t = eta_inv**2 * jnp.maximum(1.0 - cos_i**2, 0.0)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    refr = eta_inv * (-to_cam) + (eta_inv * cos_i - cos_t) * normal

    exit_est = position + (thickness_w / grid_to_world)[..., None] * refr
    px, py, _, _ = _project(
        exit_est.reshape(-1, 3), cam_pos, right, up, fwd, f, near, w, h
    )
    ix = jnp.clip(jnp.round(px).astype(jnp.int32), 0, w - 1).reshape(h, w)
    iy = jnp.clip(jnp.round(py).astype(jnp.int32), 0, h - 1).reshape(h, w)
    refr_rgb = rgb[iy, ix]
    refr_is_bg = scene_depth[iy, ix] >= _FAR
    world_cam = cam_pos * grid_to_world
    bg_refr = _sample_background(world_cam, refr, lt_sh3, lt_dir, lt_rad)
    refr_rgb = jnp.where(refr_is_bg[..., None], bg_refr, refr_rgb)

    wd = jnp.maximum(thickness_w, thickness_w[iy, ix]) * 3.0
    transmit = jnp.exp(-wd[..., None] * jnp.asarray(EXTINCT))
    refr_rgb = refr_rgb * transmit
    cos_cam_light = jnp.sum(to_cam * lt_dir[None, None], axis=-1, keepdims=True)
    scattered = jnp.asarray(SCATTER) * lt_rad * _hg_phase(HG_G, cos_cam_light)
    refraction_color = scattered + (refr_rgb - scattered) * transmit

    refl = -to_cam - 2.0 * jnp.sum(-to_cam * normal, axis=-1, keepdims=True) * normal
    refl_rgb = _sample_background(world_cam, refl, lt_sh3, lt_dir, lt_rad)
    fresnel = _fresnel_dielectric(jnp.clip(cos_i[..., 0], 0.0, 1.0), ETA_WATER)[..., None]
    color = refraction_color + (refl_rgb - refraction_color) * fresnel
    return jnp.where(has_fluid[..., None], color, rgb)


@functools.partial(
    jax.jit,
    static_argnames=("w", "h", "radius", "grid_to_world", "particle_radius_w"),
)
def _fluid_pass(
    positions, rgb, scene_depth,
    cam_pos, right, up, fwd, f, near,
    lt_sh3, lt_dir, lt_rad,
    *, w: int, h: int, radius: float, grid_to_world: float,
    particle_radius_w: float,
):
    px, py, z, valid = _project(positions, cam_pos, right, up, fwd, f, near, w, h)
    r_px = jnp.clip(f * radius / jnp.maximum(z, 1e-3), 0.6, 8.0)
    pdepth = _splat_depth(px, py, z, r_px, valid, w, h, f)
    pdepth = _nr_filter_jit(pdepth, particle_radius_w)
    r_px_t = jnp.clip(f * radius / jnp.maximum(z, 1e-3), 0.6, 6.0)
    thick = _splat_thickness(
        px, py, z, r_px_t, valid, w, h, f, 0.25 * grid_to_world, radius
    )
    thick = _thickness_filter_jit(thick)
    out = _compose(
        rgb, scene_depth, pdepth, thick, cam_pos, right, up, fwd, f, near,
        grid_to_world, lt_sh3, lt_dir, lt_rad, w, h,
    )
    m = (pdepth < scene_depth) & (thick > 0.0)
    depth_out = jnp.where(m, pdepth, scene_depth)
    return out, depth_out


def fluid_pass_device(
    positions: np.ndarray,
    rgb: np.ndarray,
    scene_depth: np.ndarray,
    camera,
    radius: float,
    grid_to_world: float,
    lighting: Lighting = None,
):
    """Full SSF fluid pass on device. Mirrors the renderer's numpy sequence
    (_splat -> narrow_range_filter -> _thickness -> thickness_filter ->
    ssf.compose) and returns (rgb f32[H,W,3], depth f32[H,W]) as numpy.

    The narrow-range filter here matches ssf.narrow_range_filter's jit path
    (2D pass + two 1D passes); the numpy oracle path is elementwise-identical
    (tests/test_render.py::test_ssf_filters_jax_match_numpy)."""
    lt = lighting or LIGHTING
    h, w = scene_depth.shape
    r, u, fw = camera.basis()
    f = camera.focal_px(h)
    # world-unit particle radius drives the narrow-range thresholds exactly
    # like renderer.draw's ssf.narrow_range_filter(pdepth, self.particle_radius)
    out_rgb, out_depth = _fluid_pass(
        jnp.asarray(positions, jnp.float32),
        jnp.asarray(rgb, jnp.float32),
        jnp.asarray(scene_depth, jnp.float32),
        jnp.asarray(camera.position, jnp.float32),
        jnp.asarray(r, jnp.float32),
        jnp.asarray(u, jnp.float32),
        jnp.asarray(fw, jnp.float32),
        jnp.float32(f),
        jnp.float32(camera.near),
        jnp.asarray(lt.sh3, jnp.float32),
        jnp.asarray(lt.dir_light_direction, jnp.float32),
        jnp.asarray(lt.dir_light_radiance, jnp.float32),
        w=w, h=h, radius=float(radius), grid_to_world=float(grid_to_world),
        particle_radius_w=float(radius),
    )
    # writable copies: np.asarray of a jax array is a READ-ONLY view, and the
    # renderer's later passes (velocity lines, bounds box) write in place
    return np.array(out_rgb), np.array(out_depth)
