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

# ---- round-5: streamed cold path (host-RSS cap) ----

def test_streamed_build_matches_in_memory_on_mmap_source(maps, tmp_path):
    """build_pyramids streams memory-mapped sources in row bands; the
    output must be bit-identical to building from the same data in RAM
    (cold starts hand it the mmap'd synth cache)."""
    elev, albedo = maps
    p = tmp_path / "elev.npy"
    np.save(p, elev)
    m = np.load(p, mmap_mode="r")
    for quantized in (False, True):
        _assert_equal(pyramids.build_pyramids(elev, albedo, quantized),
                      pyramids.build_pyramids(m, albedo, quantized))


def test_encode_i16_padded_matches_pad_of_encode(maps):
    """Fused encode+pad (streamed path) == pad_lon_wrap of the plain
    encode, including levels narrower than the pad."""
    from moonrtx_tpu.data.mips import pad_lon_wrap

    elev, _ = maps
    h_scale, h_offset = 2.4e-7, 1.0

    def plain(m):
        return np.clip(np.rint((m.astype(np.float64) - h_offset) / h_scale),
                       -32767, 32767).astype(np.int16)

    for m in (elev, elev[:64, :128]):  # 256-wide and narrower-than-pad
        np.testing.assert_array_equal(
            pyramids._encode_i16_padded(m, h_scale, h_offset,
                                        pyramids.PAD_COLS),
            pad_lon_wrap(plain(m), pyramids.PAD_COLS))


def test_streamed_synth_norm_matches_in_memory(tmp_path, monkeypatch):
    """The streamed synth-normalize cache (open_memmap + banded in-place
    divide) must produce the same bytes and radius_scale as maker() +
    divide, and still publish max == 1.0 through a memory-mapped load."""
    from moonrtx_tpu.data import loader, synth

    monkeypatch.setattr(loader, "SYNTH_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(loader, "SYNTH_ELEVATION_SHAPE", (90, 180))
    e, rs = loader.load_elevation_data(None, downscale=1,
                                       synth_shape=(180, 360))
    assert isinstance(e, np.memmap)
    assert float(np.max(e)) == 1.0
    base = loader._synth_moon_cached(90, 180, "elev")
    up = synth.upsample_elevation(base, 2)
    expect_rs = float(up.max())
    np.testing.assert_array_equal(
        np.asarray(e), (up / expect_rs).astype(np.float32))
    assert rs == expect_rs
    # second load is a pure cache hit with identical values
    e2, rs2 = loader.load_elevation_data(None, downscale=1,
                                         synth_shape=(180, 360))
    assert rs2 == rs
    np.testing.assert_array_equal(np.asarray(e2), np.asarray(e))


def test_upsample_elevation_out_param(tmp_path):
    """upsample_elevation(out=memmap) streams the same bytes as the
    allocate-and-return path."""
    from moonrtx_tpu.data import synth

    rng = np.random.default_rng(3)
    base = (1.0 + 1e-3 * rng.standard_normal((64, 128))).astype(np.float32)
    ref = synth.upsample_elevation(base, 4, chunk_rows=32)
    out = np.lib.format.open_memmap(tmp_path / "up.npy", mode="w+",
                                    dtype=np.float32, shape=(256, 512))
    got = synth.upsample_elevation(base, 4, chunk_rows=32, out=out)
    assert got is out
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_drop_row_range_preserves_mmap_content(tmp_path):
    """Releasing resident pages must never change what a reader sees —
    clean pages refault from the file (the streamed passes drop source
    rows behind themselves to cap cold-start RSS)."""
    from moonrtx_tpu.data.mips import drop_row_range

    rng = np.random.default_rng(9)
    a = rng.random((512, 256)).astype(np.float32)
    p = tmp_path / "a.npy"
    np.save(p, a)
    m = np.load(p, mmap_mode="r")
    np.testing.assert_array_equal(np.asarray(m[100:300]), a[100:300])
    drop_row_range(m, 0, 512)
    np.testing.assert_array_equal(np.asarray(m), a)  # refaults intact
    drop_row_range(m, 100, 100)   # empty range: no-op
    drop_row_range(a, 0, 512)     # plain ndarray: no-op
    # np.asarray strips the memmap subclass; the drop must still resolve
    # the mapping through .base (this is what the streamed passes hold)
    v = np.asarray(m)
    assert not isinstance(v, np.memmap)
    from moonrtx_tpu.data.mips import mmap_of
    mm, off = mmap_of(v)
    assert mm is not None
    drop_row_range(v, 0, 512)
    np.testing.assert_array_equal(np.asarray(m), a)
    # a row-sliced view resolves with the right offset
    mm2, off2 = mmap_of(m[100:])
    assert mm2 is mm and off2 == off + 100 * m.strides[0]
    drop_row_range(m[100:], 0, 50)
    np.testing.assert_array_equal(np.asarray(m), a)


def test_streamed_color_upsample_matches_whole_resize(tmp_path, monkeypatch):
    """The banded color upsample (open_memmap stream) must match the old
    whole-image cv2 resize + clip, and load memory-mapped."""
    import cv2

    from moonrtx_tpu.data import loader, synth

    monkeypatch.setattr(loader, "SYNTH_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(loader, "SYNTH_ELEVATION_SHAPE", (90, 180))
    got = loader.load_color_data(None, 1, synth_shape=(360, 720))
    assert isinstance(got, np.memmap)
    base = loader._synth_moon_cached(90, 180, "color")
    ref = np.clip(cv2.resize(np.asarray(base), (720, 360),
                             interpolation=cv2.INTER_CUBIC),
                  0.05, 0.95).astype(np.float32)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-6)
    # banded == whole for the direct function too, at a chunk size that
    # forces several bands
    up = synth.upsample_color(np.asarray(base), 4, chunk_rows=64)
    np.testing.assert_allclose(up, ref, atol=2e-6)


def test_cold_build_spills_levels_to_cache_dir(maps, tmp_path, monkeypatch):
    """A cold load_or_build must spill finished levels into the cache tmp
    dir and serve them memory-mapped (the whole device-ready set is never
    RAM-resident), while matching the in-RAM build bit for bit."""
    monkeypatch.setenv("MOONRTX_TPU_CACHE", str(tmp_path))
    elev, albedo = maps
    ps = pyramids.load_or_build(elev, albedo, True, use_cache=True)
    assert all(isinstance(m, np.memmap) for m in ps.mips)
    assert all(isinstance(a, np.memmap) for a in ps.albedo_kept)
    _assert_equal(pyramids.build_pyramids(elev, albedo, True), ps)
