"""Renderer component tests: environment lighting, SSF reconstruction,
line/mesh rasterizers, and full draw smoke across modes."""

import numpy as np
import pytest

from blub_tpu.render.camera import Camera
from blub_tpu.render.environment import (
    LIGHTING,
    fresnel_dielectric,
    sh3_evaluate,
    sh3_evaluate_cosine,
    tonemap,
)
from blub_tpu.render.lines import colormap_cool_to_warm, domain_bounds_lines, draw_lines, velocity_lines
from blub_tpu.render.mesh import cube_mesh, icosphere_mesh, rasterize_mesh, voxel_surface_mesh
from blub_tpu.render.renderer import (
    FluidRenderingMode,
    RenderSettings,
    SceneRenderer,
    VolumeVisualizationMode,
)

G = (32, 16, 16)


def _cloud(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.stack(
        [1 + 14 * rng.random(n), 1 + 7 * rng.random(n), 1 + 14 * rng.random(n)], -1
    ).astype(np.float32)
    vel = rng.standard_normal((n, 3)).astype(np.float32) * 50
    return pos, vel


def test_sh3_band0_isotropic():
    coeffs = np.zeros((9, 3), np.float32)
    coeffs[0] = 1.0
    dirs = np.array([[0, 1, 0], [1, 0, 0], [0, 0, -1]], np.float32)
    out = sh3_evaluate(dirs, coeffs)
    np.testing.assert_allclose(out, 0.282094792, rtol=1e-6)
    # cosine-convolved band0 is pi/(2 sqrt(pi))
    np.testing.assert_allclose(sh3_evaluate_cosine(dirs, coeffs), 0.886226925, rtol=1e-6)


def test_fresnel_dielectric_limits():
    eta = 1.333
    at_normal = float(fresnel_dielectric(np.asarray(1.0), eta))
    grazing = float(fresnel_dielectric(np.asarray(0.0), eta))
    assert 0.01 < at_normal < 0.05  # water R0 ~ 0.02
    assert grazing > 0.98


def test_tonemap_is_srgb():
    assert abs(float(tonemap(np.asarray(1.0))) - 1.0) < 1e-6
    assert abs(float(tonemap(np.asarray(0.0)))) < 1e-9
    assert float(tonemap(np.asarray(0.5))) > 0.5  # sRGB brightens midtones


def test_ssf_normal_reconstruction_ground_plane():
    """Regression: reconstructed normals must use each neighbor's own pixel
    ray (a center-ray reconstruction degenerates to zero normals)."""
    from blub_tpu.render.ssf import reconstruct_normals_positions

    r = SceneRenderer(G, RenderSettings(width=160, height=120))
    _, depth = r._background()
    n, p = reconstruct_normals_positions(depth, r.camera)
    ground = depth < 1e8
    assert ground.any()
    mean_n = n[ground].mean(axis=0)
    np.testing.assert_allclose(mean_n, [0.0, 1.0, 0.0], atol=1e-3)


def test_draw_lines_depth_test():
    cam = Camera.framing(G)
    h, w = 120, 160
    rgb = np.zeros((h, w, 3), np.float32)
    depth = np.full((h, w), 1e9, np.float32)
    center = np.asarray(G, np.float32) / 2
    p0 = np.array([[2, 2, 2]], np.float32)
    p1 = np.array([[30, 14, 14]], np.float32)
    col = np.array([[1.0, 0.0, 0.0]], np.float32)
    draw_lines(rgb, depth, cam, p0, p1, col)
    assert (rgb[..., 0] == 1.0).sum() > 20
    assert (depth < 1e8).any()
    # an occluder in front hides the line
    rgb2 = np.zeros((h, w, 3), np.float32)
    near = np.full((h, w), 0.01, np.float32)
    draw_lines(rgb2, near, cam, p0, p1, col)
    assert (rgb2 > 0).sum() == 0


def test_rasterize_cube_writes_depth():
    cam = Camera.framing(G)
    h, w = 120, 160
    rgb = np.zeros((h, w, 3), np.float32)
    depth = np.full((h, w), 1e9, np.float32)
    v, f = cube_mesh()
    verts = v * 8.0 + np.array([12, 4, 4], np.float32)
    rasterize_mesh(rgb, depth, cam, verts, f, albedo=1.0)
    covered = depth < 1e8
    assert covered.sum() > 100
    assert (rgb[covered] > 0).all()  # lit by sun + SH


def test_voxel_surface_mesh_counts():
    occ = np.zeros(G, np.float32)
    occ[4:8, 4:8, 4:8] = 1.0  # 4^3 cube: 6 sides * 16 cells * 2 tris
    verts, faces, cells = voxel_surface_mesh(occ)
    assert len(faces) == 6 * 16 * 2
    assert len(cells) == len(faces)
    assert (occ[cells[:, 0], cells[:, 1], cells[:, 2]] > 0).all()


def test_velocity_lines_marker_filter():
    vel = np.zeros(G + (3,), np.float32)
    vel[..., 1] = -40.0
    marker = np.zeros(G, np.int8)  # all AIR -> no lines
    from blub_tpu.core.types import CELL_FLUID

    p0, p1, col = velocity_lines(vel, marker, 0.01)
    assert len(p0) == 0
    marker[4:8, 4:8, 4:8] = CELL_FLUID
    p0, p1, col = velocity_lines(vel, marker, 0.01)
    assert len(p0) > 0
    # downward velocity -> blue-ish cool-to-warm
    assert (col[:, 2] >= col[:, 0]).all()


def test_colormap_cool_to_warm_signs():
    c = colormap_cool_to_warm(np.asarray([-1.0, 0.0, 1.0]))
    np.testing.assert_allclose(c[0], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(c[1], [1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(c[2], [1, 0, 0], atol=1e-6)


@pytest.mark.parametrize(
    "fluid_mode,volume_mode",
    [
        (FluidRenderingMode.PARTICLES_VELOCITY, VolumeVisualizationMode.NONE),
        (FluidRenderingMode.SCREEN_SPACE_FLUID, VolumeVisualizationMode.NONE),
        (FluidRenderingMode.NONE, VolumeVisualizationMode.PRESSURE_FROM_VELOCITY),
        (FluidRenderingMode.NONE, VolumeVisualizationMode.VELOCITY),
        (FluidRenderingMode.NONE, VolumeVisualizationMode.MARKER),
    ],
)
def test_draw_modes_smoke(fluid_mode, volume_mode):
    pos, vel = _cloud()
    rng = np.random.default_rng(1)
    field = rng.standard_normal(G).astype(np.float32)
    vgrid = np.zeros(G + (3,), np.float32)
    vgrid[..., 1] = -50.0
    from blub_tpu.core.types import CELL_FLUID

    marker = np.full(G, CELL_FLUID, np.int8)
    if volume_mode == VolumeVisualizationMode.MARKER:
        field = marker.astype(np.float32)
    v, f = cube_mesh()
    solid = (v * 4.0 + np.array([24, 1, 1], np.float32), f)
    occ = np.zeros(G, np.float32)
    occ[24:28, 1:5, 1:5] = 1.0

    r = SceneRenderer(
        G,
        RenderSettings(
            width=160, height=120, fluid_mode=fluid_mode, volume_mode=volume_mode,
            show_voxel_debug=True,
        ),
    )
    img = r.draw(
        pos, vel, field=field, solid_meshes=[solid], solid_occupancy=occ,
        velocity_grid=vgrid, marker=marker,
    )
    assert img.shape == (120, 160, 3) and img.dtype == np.uint8
    bg_only = SceneRenderer(
        G, RenderSettings(width=160, height=120, fluid_mode=FluidRenderingMode.NONE,
                          show_solid_meshes=False, show_bounds_box=False)
    ).draw(np.zeros((0, 3), np.float32))
    assert (img != bg_only).any()