"""Device-ready pyramid cache (data.pyramids): correctness + fallback."""

import os

import numpy as np
import pytest

from moonrtx_tpu.data import pyramids
from moonrtx_tpu.data.synth import synthesize_moon


@pytest.fixture(scope="module")
def maps():
    elev, albedo = synthesize_moon(128, 256, seed=5, n_craters=30)
    rs = float(elev.max())
    return (elev / rs).astype(np.float32), albedo


def _assert_equal(a: pyramids.PyramidSet, b: pyramids.PyramidSet):
    assert len(a.mips) == len(b.mips)
    for x, y in zip(a.mips, b.mips):
        assert x.dtype == y.dtype
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert len(a.albedo_kept) == len(b.albedo_kept)
    for x, y in zip(a.albedo_kept, b.albedo_kept):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    np.testing.assert_array_equal(a.maxmap, b.maxmap)
    np.testing.assert_array_equal(a.slope_maps, b.slope_maps)
    assert a.alb_min_level == b.alb_min_level
    assert a.quantized == b.quantized
    for f in ("h_scale", "h_offset", "h_min", "a_scale"):
        assert getattr(a, f) == getattr(b, f)


@pytest.mark.parametrize("quantized", [False, True])
def test_cache_round_trip(maps, quantized, tmp_path, monkeypatch):
    monkeypatch.setenv("MOONRTX_TPU_CACHE", str(tmp_path))
    elev, albedo = maps
    fresh = pyramids.build_pyramids(elev, albedo, quantized)
    first = pyramids.load_or_build(elev, albedo, quantized, use_cache=True)
    _assert_equal(fresh, first)
    assert any(p.startswith("pyr_") for p in os.listdir(tmp_path))
    # second call must load (delete would-be-rebuilt evidence: corrupt the
    # builder so a rebuild would be detected)
    monkeypatch.setattr(pyramids, "build_pyramids",
                        lambda *a, **k: pytest.fail("cache missed"))
    again = pyramids.load_or_build(elev, albedo, quantized, use_cache=True)
    _assert_equal(fresh, again)


def test_cache_corruption_falls_back(maps, tmp_path, monkeypatch):
    monkeypatch.setenv("MOONRTX_TPU_CACHE", str(tmp_path))
    elev, albedo = maps
    pyramids.load_or_build(elev, albedo, True, use_cache=True)
    (d,) = [p for p in os.listdir(tmp_path) if p.startswith("pyr_")]
    # truncate one level file: the load must fall back to a rebuild, not
    # crash and not return garbage
    with open(os.path.join(tmp_path, d, "mip00.npy"), "wb") as f:
        f.write(b"corrupt")
    ps = pyramids.load_or_build(elev, albedo, True, use_cache=True)
    fresh = pyramids.build_pyramids(elev, albedo, True)
    _assert_equal(fresh, ps)


def test_fingerprint_distinguishes_content(maps):
    elev, albedo = maps
    f1 = pyramids.array_fingerprint(elev)
    bumped = elev.copy()
    bumped[64, 128] += 1e-3  # on the probe grid (strides divide 64/128)
    assert pyramids.array_fingerprint(bumped) != f1
    assert pyramids.array_fingerprint(elev[:64]) != f1
    assert pyramids.array_fingerprint(elev.astype(np.float64)) != f1
    # memmap-safe: fingerprint of an mmap view equals the in-RAM one
    assert pyramids.array_fingerprint(np.asarray(elev)) == f1


def test_mmap_synth_elevation_cache(tmp_path, monkeypatch):
    monkeypatch.setattr("moonrtx_tpu.data.loader.SYNTH_CACHE_DIR",
                        str(tmp_path))
    from moonrtx_tpu.data import loader

    monkeypatch.setattr(loader, "SYNTH_ELEVATION_SHAPE", (90, 180))
    e1, rs1 = loader.load_elevation_data(None, downscale=1)
    assert float(np.max(e1)) == 1.0
    e2, rs2 = loader.load_elevation_data(None, downscale=1)
    assert rs1 == rs2
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    assert isinstance(e2, np.memmap)  # second load is memory-mapped


def test_banded_upload_round_trips_and_drops_pages(tmp_path):
    """_upload_rows_banded (round-5 verdict item 7: host RSS cap) must
    be bit-exact vs a whole-array transfer for every dtype/rank it
    uploads, and must madvise mmap-backed sources after upload."""
    import numpy as np

    from moonrtx_tpu.engine.scene import _upload_rows_banded

    rng = np.random.default_rng(0)
    for arr in (rng.integers(-500, 500, (37, 50)).astype(np.int16),
                rng.random((23, 40)).astype(np.float32),
                (rng.random((16, 12, 3)) * 255).astype(np.uint8)):
        out = _upload_rows_banded(arr, band_bytes=arr.nbytes // 5)
        np.testing.assert_array_equal(np.asarray(out), arr)

    # mmap-backed source: content survives; madvise ran (pages refault
    # transparently, so correctness is the observable)
    p = tmp_path / "lvl.npy"
    big = rng.random((64, 128)).astype(np.float32)
    np.save(p, big)
    m = np.load(p, mmap_mode="r")
    out = _upload_rows_banded(m, band_bytes=big.nbytes // 7)
    np.testing.assert_array_equal(np.asarray(out), big)
    np.testing.assert_array_equal(np.asarray(m), big)  # refaults fine
