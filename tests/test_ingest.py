"""Real-file ingest integration tests: crafted TIFF/PNG bytes pulled
through the REAL-file branches of the data loaders (round-3 verdict item
1 — these branches had never executed on real bytes).

The crafted elevation TIFF reproduces the LOLA LDEM storage convention
(reference data_loader.py:120-195): signed 16-bit values that image
readers hand back as uint16, 0.5 m per unit, radius 1,737,400 m.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from moonrtx_tpu import constants as C
from moonrtx_tpu.data.loader import (
    _load_elevation_file,
    load_color_data,
    load_elevation_data,
    load_starmap,
)


@pytest.fixture
def ldem_tiff(tmp_path):
    """A small LDEM-convention TIFF: int16 relief written as uint16 (the
    reinterpret trap at loader.py — cv2 reads 16-bit TIFFs as uint16)."""
    rng = np.random.default_rng(7)
    relief = rng.integers(-17000, 17001, size=(64, 128)).astype(np.int16)
    relief[3, 5] = 17500       # global max, position-checkable
    relief[60, 100] = -17800   # global min
    path = str(tmp_path / "ldem_test.tif")
    ok = cv2.imwrite(path, relief.view(np.uint16))
    assert ok, "cv2 must write the 16-bit TIFF"
    # paranoia: the reader must hand back uint16 (the reinterpret branch)
    back = cv2.imread(path, cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH)
    assert back.dtype == np.uint16
    return path, relief


def test_elevation_int16_reinterpret_and_scale(ldem_tiff):
    path, relief = ldem_tiff
    elevation, radius_scale = _load_elevation_file(path, downscale=1)

    # exact reference math: value * 0.5 m / 1,737,400 m + 1, then peak-
    # normalized so max == 1.0 (the bounding-sphere invariant,
    # reference data_loader.py:136-140,188-190)
    scale = C.LDEM_METERS_PER_UNIT / C.MOON_REFERENCE_RADIUS_M
    expected = relief.astype(np.float32) * scale + 1.0
    rs_expected = float(expected.max())

    assert elevation.dtype == np.float32
    assert elevation.shape == relief.shape
    assert elevation.max() == 1.0                       # exact invariant
    assert radius_scale == pytest.approx(rs_expected, rel=1e-6)
    np.testing.assert_allclose(elevation * radius_scale, expected,
                               rtol=1e-6)
    # the signed reinterpret really happened: the deepest point is the
    # -17800 texel, not the uint16 wraparound of it
    assert np.unravel_index(elevation.argmin(), elevation.shape) == (60, 100)
    assert np.unravel_index(elevation.argmax(), elevation.shape) == (3, 5)


def test_elevation_downscale_and_cache_roundtrip(ldem_tiff, capsys):
    path, relief = ldem_tiff
    e1, rs1 = _load_elevation_file(path, downscale=2)
    assert e1.shape == (32, 64)
    assert e1.max() == pytest.approx(1.0, abs=1e-6)
    out1 = capsys.readouterr().out
    assert "Relief range" in out1          # the reference's progress line

    # second load must hit the fingerprint cache (loader.py cache branch)
    e2, rs2 = _load_elevation_file(path, downscale=2)
    out2 = capsys.readouterr().out
    assert "Loaded from cache" in out2
    assert rs2 == pytest.approx(rs1)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    # block-mean correctness against a direct computation
    scale = C.LDEM_METERS_PER_UNIT / C.MOON_REFERENCE_RADIUS_M
    blocks = relief.astype(np.float64).reshape(32, 2, 64, 2).mean(axis=(1, 3))
    expected = blocks * scale + 1.0
    expected /= expected.max()
    np.testing.assert_allclose(np.asarray(e1), expected, rtol=1e-5)


def test_elevation_via_public_entry(ldem_tiff):
    """load_elevation_data routes an existing file to the real branch."""
    path, _ = ldem_tiff
    elevation, rs = load_elevation_data(path, downscale=1)
    assert elevation.max() == 1.0
    assert rs > 1.0


def test_color_real_branch_reflectance_affine(tmp_path):
    """Real color maps get the reference's reflectance mapping
    0.2 + 0.75/255 * value on RGB (BGR source reversed)."""
    bgr = np.zeros((8, 16, 3), np.uint8)
    bgr[..., 0] = 255   # blue channel full
    bgr[..., 2] = 51    # red channel 51
    path = str(tmp_path / "color_test.tif")
    assert cv2.imwrite(path, bgr)

    rgb = load_color_data(path)
    assert rgb.dtype == np.float32
    assert rgb.shape == (8, 16, 3)
    assert rgb[0, 0, 0] == pytest.approx(0.2 + 0.75 / 255.0 * 51)   # red
    assert rgb[0, 0, 1] == pytest.approx(0.2)                       # green
    assert rgb[0, 0, 2] == pytest.approx(0.2 + 0.75)                # blue

    rgb_ds = load_color_data(path, downscale=2)
    assert rgb_ds.shape == (4, 8, 3)
    assert rgb_ds[0, 0, 2] == pytest.approx(0.2 + 0.75)


def test_starmap_real_branch_resize_and_cache(tmp_path, capsys):
    src = np.zeros((32, 64, 3), np.uint8)
    src[::4, ::4] = 255
    path = str(tmp_path / "stars_test.png")
    assert cv2.imwrite(path, src)

    star = load_starmap(path, target_width=32)
    assert star is not None
    assert star.dtype == np.float32
    assert star.shape == (16, 32, 3)        # aspect-preserving resize
    assert 0.0 <= star.min() and star.max() <= 1.0
    capsys.readouterr()

    star2 = load_starmap(path, target_width=32)
    assert "Loaded from cache" in capsys.readouterr().out
    np.testing.assert_array_equal(np.asarray(star), np.asarray(star2))

    # a target wider than the source keeps the source resolution
    wide = load_starmap(path, target_width=256)
    assert wide.shape == (32, 64, 3)


def test_elevation_scene_end_to_end(ldem_tiff):
    """A frame renders from the crafted-TIFF elevation through the full
    scene pipeline (the closest this closed-network environment can get
    to the reference's real-data path, reference main.py:95-152)."""
    from datetime import datetime, timezone

    from moonrtx_tpu.config import RenderConfig
    from moonrtx_tpu.engine.scene import MoonScene
    from moonrtx_tpu.types import Observer

    path, _ = ldem_tiff
    elevation, rs = load_elevation_data(path, downscale=1)
    albedo = np.full(elevation.shape + (3,), 0.5, np.float32)
    cfg = RenderConfig(
        observer=Observer(50.06, 19.94, 219),
        dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
        width=128, height=128, shadow_accuracy=2,
    ).validate()
    scene = MoonScene(cfg, elevation, rs, albedo, None)
    scene.update_view()
    img = scene.render(1)
    assert img.shape == (128, 128, 3)
    assert img.max() > 0
