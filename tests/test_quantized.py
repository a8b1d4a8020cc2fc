"""Quantized HBM storage (int16 heights / uint8 albedo) vs f32 storage.

The full-resolution LOLA LDEM is 4.2 Gtexels — 17 GB as f32 level 0 and
2.1 GB as int16 (reference main.py:25-29, data_loader.py:120-195); the
engine stores large pyramids quantized with an affine decode at window-
extraction time. These tests force quantization on a small synthetic map
and require the rendered frames to match the f32 scene within the
quantization step (~1e-7 of radius for heights, 1/255 for albedo).
"""

from datetime import datetime, timezone

import numpy as np
import pytest

import jax.numpy as jnp

from moonrtx_tpu.config import RenderConfig
from moonrtx_tpu.data.synth import synthesize_moon
from moonrtx_tpu.engine.scene import MoonScene
from moonrtx_tpu.types import Observer

DT0 = datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc)


def _scene(quantize: str, shadows: bool = True):
    elev, albedo = synthesize_moon(360, 720, seed=5, n_craters=150)
    rs = float(elev.max())
    elev = (elev / rs).astype(np.float32)
    cfg = RenderConfig(
        observer=Observer(50.06, 19.94, 219), dt_local=DT0,
        width=192, height=144, shadow_accuracy=4, quantize=quantize,
    ).validate()
    s = MoonScene(cfg, elev, rs, albedo, None)
    s.shadows_on = shadows
    s.update_view()
    return s


@pytest.fixture(scope="module")
def scenes():
    return {"off": _scene("off"), "i16": _scene("i16")}


def test_quantized_storage_dtypes(scenes):
    s = scenes["i16"]
    assert s.quantized
    assert all(m.dtype == jnp.int16 for m in s.mips)
    assert all(a.dtype == jnp.uint8 for a in s.albedo_mips)
    assert s.h_scale > 0.0
    # decode round trip: level 0 must reproduce the f32 level 0 within one
    # quantization step (half a step of rounding + f32 decode arithmetic)
    f32_lvl0 = np.asarray(scenes["off"].mips[0])
    dec = (np.asarray(s.mips[0]).astype(np.float32) * s.h_scale
           + s.h_offset)
    assert np.abs(dec - f32_lvl0).max() <= 1.0 * s.h_scale


def test_quantized_frame_matches_f32(scenes):
    img_q = scenes["i16"].render(1).astype(int)
    img_f = scenes["off"].render(1).astype(int)
    diff = np.abs(img_q - img_f).max(axis=-1)
    # height quantization is ~1e-7 of radius; albedo 1/255 -> at most a
    # couple of 8-bit display counts except at marching-sensitive limb
    # pixels
    assert np.percentile(diff, 99) <= 3.0
    assert diff.mean() < 0.5


def test_quantized_hit_buffer_matches(scenes):
    hq = scenes["i16"].get_hit_at(96, 72)
    hf = scenes["off"].get_hit_at(96, 72)
    assert hq[3] > 0 and hf[3] > 0
    for a, b in zip(hq, hf):
        assert a == pytest.approx(b, abs=2e-3)


def test_quantized_elevation_host_decodes(scenes):
    eq = scenes["i16"].elevation_host()
    ef = scenes["off"].elevation_host()
    assert eq.dtype == np.float32
    assert eq.shape == ef.shape
    assert np.abs(eq - ef).max() <= 1.0 * scenes["i16"].h_scale


def test_auto_quantize_thresholds():
    # small maps stay f32 under "auto"
    s = _scene("auto", shadows=False)
    assert not s.quantized
    assert s.mips[0].dtype == jnp.float32


def test_quantized_forces_windowed_backend():
    elev, albedo = synthesize_moon(180, 360, seed=3, n_craters=40)
    rs = float(elev.max())
    cfg = RenderConfig(observer=Observer(0.0, 0.0, 0), dt_local=DT0,
                       width=64, height=48, backend="reference",
                       quantize="i16").validate()
    s = MoonScene(cfg, (elev / rs).astype(np.float32), rs, albedo, None)
    assert s.backend == "blocked"
