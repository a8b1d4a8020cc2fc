"""End-to-end headless render path: CLI args -> scene -> image file ->
init-view restore (the reference's screenshot round trip, SURVEY.md sec. 4)."""

import os

import numpy as np
import pytest

from moonrtx_tpu.app.cli import config_from_args, parse_args
from moonrtx_tpu.app.codec import parse_init_view
from moonrtx_tpu.app.headless import (
    default_screenshot_name,
    render_headless,
    save_image,
)
from moonrtx_tpu.data.loader import SYNTH_ELEVATION_SHAPE


@pytest.fixture(autouse=True)
def small_synth(monkeypatch, tmp_path):
    # tiny procedural maps + isolated cache so the test is fast
    monkeypatch.setattr("moonrtx_tpu.data.loader.SYNTH_ELEVATION_SHAPE",
                        (180, 360))
    monkeypatch.setattr("moonrtx_tpu.data.loader.SYNTH_CACHE_DIR",
                        str(tmp_path / "cache"))


def test_render_headless_and_restore(tmp_path):
    out = str(tmp_path / "moon.png")
    cfg = config_from_args(parse_args([
        "--lat", "50.0614", "--lon", "19.9365",
        "--time", "2024-04-15T21:00:00Z", "--no-download",
        "--width", "160", "--height", "120", "--shadow-accuracy", "2",
    ]))
    path = render_headless(cfg, save_path=out, n_frames=2)
    assert path == out and os.path.isfile(out)
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (120, 160, 3)
    assert img.mean() > 2.0  # a moon was rendered

    # screenshot-name round trip: default name must parse back
    from moonrtx_tpu.app.headless import build_scene

    scene = build_scene(cfg, with_starmap=False)
    scene.update_view()
    name = default_screenshot_name(scene)
    iv = parse_init_view(name)
    assert iv is not None
    assert iv.lat == pytest.approx(50.0614)

    # 16-bit TIFF save path (reference Bps16, renderer_dialogs.py:167-170)
    tiff = str(tmp_path / "moon.tiff")
    hdr = np.asarray(scene._accum if scene._accum is not None
                     else np.zeros((120, 160, 3), np.float32))
    save_image(img, tiff, linear_hdr=np.zeros((120, 160, 3), np.float32))
    assert os.path.isfile(tiff)
    import cv2

    t16 = cv2.imread(tiff, cv2.IMREAD_UNCHANGED)
    assert t16.dtype == np.uint16


def test_render_timelapse_sequence(tmp_path):
    """Timelapse export: N frames stepping --time-step-minutes apart; the
    terminator moves between frames (the Q/W hot path driven headlessly)."""
    from PIL import Image

    from moonrtx_tpu.app.headless import render_timelapse

    out = str(tmp_path / "moon.png")
    cfg = config_from_args(parse_args([
        "--lat", "50.0614", "--lon", "19.9365",
        "--time", "2024-04-15T21:00:00Z", "--no-download",
        "--width", "128", "--height", "96", "--shadow-accuracy", "2",
        "--time-step-minutes", "720",
    ]))
    paths = render_timelapse(cfg, out, timelapse_frames=3, n_frames=1)
    assert [os.path.basename(p) for p in paths] == [
        "moon_0000.png", "moon_0001.png", "moon_0002.png"]
    frames = [np.asarray(Image.open(p)).astype(np.int16) for p in paths]
    for f in frames:
        assert f.shape == (96, 128, 3) and f.mean() > 1.0
    # 12 h sun motion: successive frames differ substantially
    assert np.abs(frames[1] - frames[0]).mean() > 0.5
    assert np.abs(frames[2] - frames[1]).mean() > 0.5


def test_cli_timelapse_flag():
    args = parse_args(["--lat", "1", "--lon", "2", "--no-download",
                       "--timelapse-frames", "5"])
    assert args.timelapse_frames == 5
    assert parse_args(["--lat", "1", "--lon", "2",
                       "--no-download"]).timelapse_frames == 1


def test_build_scene_with_synth_shape(tmp_path, monkeypatch):
    """config.synth_shape (--synth-shape) upsizes the procedural working
    set through the product flow — the full-scale experience without the
    real ~8 GB downloads (reference main.py:25-29)."""
    from datetime import datetime, timezone

    from moonrtx_tpu.app.headless import build_scene
    from moonrtx_tpu.config import RenderConfig
    from moonrtx_tpu.data import loader
    from moonrtx_tpu.types import Observer

    monkeypatch.setattr(loader, "SYNTH_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(loader, "SYNTH_ELEVATION_SHAPE", (90, 180))
    monkeypatch.setenv("MOONRTX_TPU_CACHE", str(tmp_path))
    cfg = RenderConfig(
        observer=Observer(50.0, 19.9, 219),
        dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
        width=64, height=64, downscale=1, backend="blocked",
        synth_shape=(180, 360),
    ).validate()
    scene = build_scene(cfg, with_starmap=False)
    assert tuple(scene.mip_shapes[0])[:2][0] == 180
    scene.update_view()
    frame = np.asarray(scene.display())
    assert frame.shape == (64, 64, 3)
