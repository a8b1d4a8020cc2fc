"""Native C++ data-pipeline kernels vs numpy reference."""

import numpy as np
import pytest

from moonrtx_tpu.data.mips import block_mean

native = pytest.importorskip("moonrtx_tpu.native.bindings")

if not native.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def test_block_mean_int16_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.integers(-5000, 5000, (96, 128), dtype=np.int16)
    out = native.block_mean_int16(src, 4)
    ref = block_mean(src.astype(np.float32), 4)
    assert out.shape == (24, 32)
    assert np.allclose(out, ref, atol=1e-3)


def test_block_mean_f32_matches_numpy():
    rng = np.random.default_rng(1)
    src = rng.random((60, 90)).astype(np.float32)
    out = native.block_mean_f32(src, 3)
    ref = block_mean(src, 3)
    assert np.allclose(out, ref, atol=1e-5)


def test_resample_bilinear_identity():
    rng = np.random.default_rng(2)
    src = rng.random((32, 64)).astype(np.float32)
    out = native.resample_bilinear_f32(src, 32, 64)
    assert np.allclose(out, src, atol=1e-5)


def test_resample_bilinear_downscale_energy():
    src = np.ones((64, 128), np.float32) * 0.7
    out = native.resample_bilinear_f32(src, 16, 32)
    assert np.allclose(out, 0.7, atol=1e-6)


def test_native_speed_beats_numpy():
    """The point of the native path: large int16 downscales faster than the
    numpy reshape-mean (reference's ~1 minute step)."""
    import time

    rng = np.random.default_rng(3)
    src = rng.integers(-5000, 5000, (4096, 8192), dtype=np.int16)
    t0 = time.perf_counter()
    out_n = native.block_mean_int16(src, 4)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    ref = block_mean(src.astype(np.float32), 4)
    t_numpy = time.perf_counter() - t0
    assert np.allclose(out_n, ref, atol=1e-2)
    assert t_native < t_numpy * 1.5  # typically several times faster
