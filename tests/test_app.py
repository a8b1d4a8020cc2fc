"""App layer: CLI parsing/validation, presets, sexagesimal coords,
status formatting, profiling utils."""

import json
import math

import pytest

from moonrtx_tpu.app import presets, status
from moonrtx_tpu.app.cli import config_from_args, parse_args
from moonrtx_tpu.utils.profiling import FrameStats
from moonrtx_tpu.types import MoonEphemeris

import numpy as np


def _args(*extra):
    return parse_args(["--lat", "50.0614", "--lon", "19.9365",
                       "--time", "2024-04-15T21:00:00Z", "--no-download",
                       *extra])


def test_cli_defaults_match_reference():
    a = _args()
    assert a.downscale == 3
    assert a.brightness == 80
    assert a.gamma == 2.2
    assert a.time_step_minutes == 15
    assert a.shadow_accuracy == 1
    assert a.init_view_orientation == "NSWE"


def test_cli_config_round_trip():
    cfg = config_from_args(_args("--shadow-accuracy", "10",
                                 "--parallactic-mode"))
    assert cfg.observer.lat == pytest.approx(50.0614)
    assert cfg.shadow_accuracy == 10
    assert cfg.parallactic_mode is True
    assert cfg.dt_local.tzinfo is not None


def test_cli_init_view_restores_state():
    from moonrtx_tpu.app.codec import format_view_state
    from moonrtx_tpu.engine.scene import default_camera
    from datetime import datetime, timezone

    name = format_view_state(datetime(2024, 1, 1, tzinfo=timezone.utc),
                             -34.6131, -58.3772, "SNEW", True,
                             default_camera())
    cfg = config_from_args(parse_args(["--init-view", name, "--no-download"]))
    assert cfg.observer.lat == pytest.approx(-34.6131)
    assert cfg.view_orientation == "SNEW"
    assert cfg.parallactic_mode is True
    assert cfg.initial_camera is not None


def test_cli_rejects_bad_values():
    with pytest.raises(SystemExit):
        config_from_args(parse_args(["--lat", "95", "--lon", "0",
                                     "--time", "2024-01-01T00:00:00Z",
                                     "--no-download"]))
    with pytest.raises(SystemExit):
        config_from_args(parse_args(["--lon", "0", "--no-download"]))  # no lat


# ---- presets / coordinates ----

def test_sexagesimal_round_trip():
    for value, is_lat in ((50.0614, True), (-33.8688, True),
                          (151.2093, False), (-58.3772, False)):
        d, m, s, h = presets.decimal_to_sexagesimal(value, is_lat)
        back = presets.sexagesimal_to_decimal(d, m, s, h)
        assert back == pytest.approx(value, abs=1e-5)


def test_utc_offsets_range():
    offs = presets.utc_offsets()
    assert offs[0] == "-12:00"
    assert offs[-1] == "+14:00"
    assert "+05:30" in offs  # 30-minute steps


def test_preset_save_load(tmp_path):
    values = {"lat": 1.5, "lon": 2.5, "brightness": 90, "junk": "dropped"}
    presets.save_preset("demo", values, str(tmp_path))
    assert presets.list_presets(str(tmp_path)) == ["demo"]
    loaded = presets.load_preset("demo", str(tmp_path))
    assert loaded == {"lat": 1.5, "lon": 2.5, "brightness": 90}
    assert presets.load_preset("missing", str(tmp_path)) is None


def test_preset_carries_data_files_and_init_view(tmp_path):
    """Launcher presets must persist file paths and the init-view string
    (reference launcher presets carry every form field,
    main_gui_launcher.py:370-416)."""
    values = {"elevation_file": "/d/ldem.tif", "color_file": "/d/color.tif",
              "starmap_file": "/d/stars.tif", "features_file": "/d/f.csv",
              "init_view": "2024-04-15_2100_50.06_19.94_viewNSWE_par0_camX"}
    presets.save_preset("files", values, str(tmp_path))
    assert presets.load_preset("files", str(tmp_path)) == values


# ---- status formatting ----

def test_dms_hms_formatting():
    assert status.fmt_dms(12.5084, signed=False).startswith("12°30'")
    assert status.fmt_dms(-0.5).startswith("-0°30'")
    assert status.fmt_hms(187.7) .startswith("12h30m")


def test_illumination_percent():
    assert status.illumination_percent(0.0) == pytest.approx(100.0)
    assert status.illumination_percent(90.0) == pytest.approx(50.0)
    assert status.illumination_percent(180.0) == pytest.approx(0.0, abs=1e-9)


def test_info_panel_rows():
    e = MoonEphemeris(az=120.0, alt=45.0, ra=187.7, dec=-5.0, distance=384400,
                      sun_distance=1.496e8, phase_angle=90.0,
                      bright_limb_angle=67.0, libr_long_geo=1.0,
                      libr_lat_geo=2.0, libr_long_topo=1.1, libr_lat_topo=2.1,
                      elongation=90.0, phase_name="First Quarter",
                      colongitude=0.5, rotation_matrix=np.eye(3))
    rows = status.info_panel_rows(e)
    assert len(rows) == 14
    d = dict(rows)
    assert d["Phase"] == "First Quarter"
    assert d["Illumination"] == "50.0%"


# ---- profiling ----

def test_frame_stats():
    fs = FrameStats(window=10)
    import time
    fs.tick()
    for _ in range(3):
        time.sleep(0.01)
        fs.tick()
    assert 30 < fs.fps < 200
    assert "FPS" in fs.status_text(1000)
    fs.reset()
    assert fs.fps == 0.0


def test_preset_carries_every_launcher_field(tmp_path):
    """Regression: PRESET_KEYS silently dropped the physics and mesh
    fields the launcher form exposes (photometric, eclipse/earthshine
    toggles, devices, HBM budget) — a saved preset lost them on reload."""
    values = {"photometric": "lunar", "eclipse_shading": False,
              "earthshine": False, "devices": 8, "hbm_budget_gb": 12.5}
    presets.save_preset("phys", values, str(tmp_path))
    assert presets.load_preset("phys", str(tmp_path)) == values


def test_synth_shape_flag_round_trip():
    """--synth-shape targets the procedural working set (full-scale
    experience without the real ~8 GB downloads)."""
    cfg = config_from_args(parse_args(
        ["--lat", "50", "--lon", "19", "--no-download",
         "--synth-shape", "23040x46080"]))
    assert cfg.synth_shape == (23040, 46080)
    cfg = config_from_args(parse_args(
        ["--lat", "50", "--lon", "19", "--no-download"]))
    assert cfg.synth_shape is None


def test_synth_shape_flag_malformed_exits():
    import pytest

    with pytest.raises(SystemExit):
        config_from_args(parse_args(
            ["--lat", "50", "--lon", "19", "--no-download",
             "--synth-shape", "banana"]))
