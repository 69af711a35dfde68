"""Native C++ components vs their Python fallbacks."""

import numpy as np
import pytest

from blub_tpu.ops import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_mesh_sdf_matches_python(lib):
    from blub_tpu.core import models

    geom = models.load_obj(models.pathlib.Path(__file__).parents[1] / "models" / "cube.obj")
    rng = np.random.default_rng(0)
    pts = (rng.random((2000, 3)) * 3.0 - 1.0).astype(np.float32)
    d_native = native.mesh_sdf_native(geom[0], geom[1], pts)
    d_box = models.box_sdf(pts, (0, 0, 0), (1, 1, 1))
    np.testing.assert_allclose(d_native, d_box, atol=2e-3)


def test_png_native_valid(lib):
    rng = np.random.default_rng(1)
    rgb = (rng.random((37, 53, 3)) * 255).astype(np.uint8)
    data = native.encode_png_native(rgb)
    assert data is not None
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # decode via zlib to check pixel fidelity
    import struct
    import zlib

    idat = b""
    off = 8
    while off < len(data):
        (length,) = struct.unpack(">I", data[off : off + 4])
        tag = data[off + 4 : off + 8]
        if tag == b"IDAT":
            idat += data[off + 8 : off + 8 + length]
        off += 12 + length
    raw = zlib.decompress(idat)
    h, w = rgb.shape[:2]
    out = np.frombuffer(raw, np.uint8).reshape(h, w * 3 + 1)[:, 1:].reshape(h, w, 3)
    np.testing.assert_array_equal(out, rgb)


def test_splat_matches_python(lib):
    from blub_tpu.render.camera import Camera
    from blub_tpu.render.renderer import RenderSettings, SceneRenderer

    rng = np.random.default_rng(2)
    pos = (rng.random((500, 3)) * np.array([30, 14, 14]) + 1).astype(np.float32)
    r = SceneRenderer((32, 16, 16), RenderSettings(width=160, height=120))
    # native path
    d1, w1 = r._splat(pos, 0.5, values=np.zeros((500, 3)))
    # force python path
    import blub_tpu.ops.native as nat

    old = nat.get_lib
    nat.get_lib = lambda: None
    try:
        d2, w2 = r._splat(pos, 0.5, values=np.zeros((500, 3)))
    finally:
        nat.get_lib = old
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-5)
    # winners may differ on exact depth ties; compare coverage
    np.testing.assert_array_equal(w1 >= 0, w2 >= 0)
