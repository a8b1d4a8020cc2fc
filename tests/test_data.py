"""Data layer: cache fingerprinting, feature parsing, synthesis invariants,
mips (reference data_loader.py semantics; SURVEY.md section 4)."""

import os

import numpy as np
import pytest

from moonrtx_tpu.data import (
    block_mean,
    build_mips,
    load_moon_features,
    pad_lon_wrap,
    parse_feature_line,
    select_level,
)
from moonrtx_tpu.data import cache
from moonrtx_tpu.data.loader import load_elevation_data
from moonrtx_tpu.data.synth import synthesize_moon, synthesize_starmap


# ---- cache ----

def test_cache_round_trip(tmp_path):
    src = tmp_path / "src.bin"
    src.write_bytes(b"x" * 100)
    fp = cache.fingerprint(str(src), downscale=3)
    base = str(tmp_path / "proc")
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    cache.save(base, arr, {**fp, "radius_scale": 1.25})
    out, meta = cache.load(base, fp)
    assert np.array_equal(out, arr)
    assert meta["radius_scale"] == 1.25


def test_cache_miss_on_changed_params(tmp_path):
    src = tmp_path / "src.bin"
    src.write_bytes(b"x" * 100)
    base = str(tmp_path / "proc")
    cache.save(base, np.zeros(3), cache.fingerprint(str(src), downscale=3))
    out, _ = cache.load(base, cache.fingerprint(str(src), downscale=4))
    assert out is None


def test_cache_corruption_falls_back(tmp_path):
    src = tmp_path / "src.bin"
    src.write_bytes(b"x")
    fp = cache.fingerprint(str(src))
    base = str(tmp_path / "proc")
    cache.save(base, np.zeros(3), fp)
    with open(base + ".json", "w") as f:
        f.write("{not json")
    out, _ = cache.load(base, fp)
    assert out is None  # silent fallback, never an exception


# ---- features ----

def test_parse_feature_line_full():
    f = parse_feature_line(
        "Mare Tranquillitatis:8.35:30.83:875.75:true:false:false:3691:en.wikipedia.org/x")
    assert f.name == "Mare Tranquillitatis"
    assert f.lat == pytest.approx(8.35)
    assert f.angular_radius == pytest.approx(875.75 / 60.647)
    assert f.standard_label and not f.spot_label and not f.status_bar
    assert f.feature_id == 3691
    assert f.www_address == "en.wikipedia.org/x"


def test_parse_feature_line_unicode_minus():
    f = parse_feature_line("Tycho:−43.31:−11.36:85:false:false:true")
    assert f.lat == pytest.approx(-43.31)
    assert f.lon == pytest.approx(-11.36)
    assert f.feature_id is None and f.www_address is None


def test_parse_feature_line_rejects_bad():
    assert parse_feature_line("# comment") is None
    assert parse_feature_line("") is None
    assert parse_feature_line("short:1:2") is None
    assert parse_feature_line("Bad:xx:2:3:true:true:true") is None


def test_builtin_catalog_loads_full_size():
    """Built-in catalog parity with the reference's (4,488 entries with
    36 standard-label / 22 spot-label / 4,442 status-bar flags,
    reference data/moon_features.csv)."""
    feats = load_moon_features(None)
    assert len(feats) >= 4400
    names = {f.name for f in feats}
    assert {"Tycho", "Copernicus", "Mare Imbrium", "Apollo 11 Landing",
            "Montes Apenninus", "Vallis Alpes", "Rima Hadley"} <= names
    assert sum(1 for f in feats if f.standard_label) == 36
    assert sum(1 for f in feats if f.spot_label) == 22
    assert sum(1 for f in feats if f.status_bar) > 4000
    assert all(-90 <= f.lat <= 90 and -180 <= f.lon <= 180 for f in feats)
    assert all(f.angular_radius > 0 for f in feats)


def test_missing_external_file_falls_back_to_builtin(tmp_path):
    feats = load_moon_features(str(tmp_path / "nope.csv"))
    assert len(feats) >= 4400


# ---- synthesis ----

def test_synthesis_invariants():
    elev, albedo = synthesize_moon(360, 720, seed=3, n_craters=200)
    assert elev.shape == (360, 720) and elev.dtype == np.float32
    # Moon-like relief amplitude: within ~[-12 km, +12 km] of reference radius
    assert 0.990 < elev.min() < 1.0 < elev.max() < 1.010
    assert albedo.shape == (360, 720, 3)
    assert 0.0 < albedo.min() and albedo.max() <= 0.95
    # deterministic
    elev2, _ = synthesize_moon(360, 720, seed=3, n_craters=200)
    assert np.array_equal(elev, elev2)


def test_starmap_synthesis():
    s = synthesize_starmap(128, 256, n_stars=200)
    assert s.shape == (128, 256, 3)
    assert 0.0 <= s.min() and s.max() <= 1.0
    assert s.max() > 0.3  # has actual stars


def test_loader_synth_normalization(tmp_path, monkeypatch):
    monkeypatch.setattr("moonrtx_tpu.data.loader.SYNTH_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr("moonrtx_tpu.data.loader.SYNTH_ELEVATION_SHAPE", (180, 360))
    elev, radius_scale = load_elevation_data(None, downscale=1)
    # Peak-normalization invariant: max exactly 1.0 (data_loader.py:188-190)
    assert elev.max() == pytest.approx(1.0, abs=1e-6)
    assert radius_scale > 1.0
    # cache hit second time
    elev2, rs2 = load_elevation_data(None, downscale=1)
    assert rs2 == pytest.approx(radius_scale)


# ---- mips ----

def test_block_mean_matches_reference_reshape():
    a = np.arange(24, dtype=np.float32).reshape(4, 6)
    out = block_mean(a, 2)
    ref = a.reshape(2, 2, 3, 2).mean(axis=(1, 3))
    assert np.allclose(out, ref)


def test_build_mips_chain():
    base = np.random.default_rng(0).random((512, 1024)).astype(np.float32)
    mips = build_mips(base, min_size=64)
    assert mips[0].shape == (512, 1024)
    assert mips[1].shape == (256, 512)
    assert mips[-1].shape[0] >= 64
    # energy preserved at each level
    for m in mips:
        assert abs(float(m.mean()) - float(base.mean())) < 1e-3


def test_pad_lon_wrap():
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = pad_lon_wrap(a, 2)
    assert p.shape == (3, 6)
    assert np.array_equal(p[:, 4:], a[:, :2])


def test_select_level():
    shapes = [(4096, 8192), (2048, 4096), (1024, 2048), (512, 1024)]
    assert select_level(shapes, 1.0) == 0
    assert select_level(shapes, 4.0) == 2
    assert select_level(shapes, 100.0) == 3  # clamped to last


def test_reference_catalog_loads_unchanged():
    """The upstream MoonRTX feature CSV (4,488 entries, same `:` format,
    reference data/moon_features.csv) must load through --features-file
    with no conversion. Runs only where a reference checkout is present."""
    import os

    path = "/root/reference/moonrtx/data/moon_features.csv"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference checkout not present")
    feats = load_moon_features(path)
    assert len(feats) > 4400
    names = {f.name for f in feats}
    assert "Tycho" in names and "Copernicus" in names
    n_std = sum(1 for f in feats if f.standard_label)
    n_spot = sum(1 for f in feats if f.spot_label)
    assert n_std > 20 and n_spot > 10
    # smallest-first lookup order must be constructible
    assert all(f.angular_radius > 0 for f in feats)
