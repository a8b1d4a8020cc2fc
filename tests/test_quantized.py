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


def test_shadow_level_caps_map_size(monkeypatch):
    """The shadow scan must build from a scan-grid-sized level, not the
    (possibly multi-gigatexel) render level."""
    import moonrtx_tpu.engine.scene as scene_mod

    s = _scene("off", shadows=True)
    assert s.shadow_level() == max(s.mip_level(), 0)  # small map: uncapped
    monkeypatch.setattr(scene_mod, "SHADOW_MAX_TEXELS", 40_000)
    lvl = s.shadow_level()
    assert lvl > s.mip_level()
    h, w = s.mip_shapes[lvl]
    assert h * w <= 40_000 or lvl == len(s.mips) - 1


def test_albedo_level_floors_at_coarser_base():
    """A color source at half the elevation resolution aligns level-for-
    level with the height pyramid from its own base down."""
    elev, albedo = synthesize_moon(360, 720, seed=3, n_craters=40)
    alb_half = albedo[: 360 // 2 * 2, : 720 // 2 * 2].reshape(
        180, 2, 360, 2, 3).mean(axis=(1, 3)).astype(np.float32)
    rs = float(elev.max())
    cfg = RenderConfig(observer=Observer(0.0, 0.0, 0), dt_local=DT0,
                       width=64, height=48).validate()
    s = MoonScene(cfg, (elev / rs).astype(np.float32), rs, alb_half, None)
    assert s.alb_min_level == 1
    assert s.albedo_level(0) == 1
    assert s.albedo_mips[0] is s.albedo_mips[1]     # alias, zero HBM
    assert s.albedo_mips[1].shape[0] == s.mip_shapes[1][0]
    s.update_view()
    img = s.render(1)
    assert img.max() > 0


def test_quantized_forces_windowed_backend():
    elev, albedo = synthesize_moon(180, 360, seed=3, n_craters=40)
    rs = float(elev.max())
    cfg = RenderConfig(observer=Observer(0.0, 0.0, 0), dt_local=DT0,
                       width=64, height=48, backend="reference",
                       quantize="i16").validate()
    s = MoonScene(cfg, (elev / rs).astype(np.float32), rs, albedo, None)
    assert s.backend == "blocked"


def test_full_resolution_measurement_resolves_fine_feature(monkeypatch):
    """Δh measurement must sample the FINEST pyramid level, not the
    shadow-capped host copy (round-2 gap: at full LDEM the capped level
    is ~16x coarser than the data — a narrow crater rim averages away).

    A one-texel-wide ridge is planted in the fine map; the capped host
    level (forced 16x coarser here) smears it to ~1/16 amplitude, while
    elevation_m_at recovers it at full amplitude with zero device
    transfers."""
    monkeypatch.setattr("moonrtx_tpu.engine.scene.SHADOW_MAX_TEXELS", 2048)
    elev, albedo = synthesize_moon(512, 1024, seed=9, n_craters=0)
    rs0 = float(elev.max())
    elev = (elev / rs0).astype(np.float32)
    # narrow meridional ridge at lon=0 (one column), +0.0005 of radius
    ridge_col = 512  # lon 0 column on a 1024-wide equirect grid
    base = elev.copy()
    elev[:, ridge_col] += 5e-4
    rs = float(elev.max())
    elev = elev / rs
    cfg = RenderConfig(
        observer=Observer(50.06, 19.94, 219), dt_local=DT0,
        width=128, height=128, shadow_accuracy=1, quantize="i16",
    ).validate()
    s = MoonScene(cfg, elev, rs, albedo, None)
    assert s.quantized

    lat = 0.0
    lon_ridge = (ridge_col + 0.5) / 1024.0 * 360.0 - 180.0
    lon_off = lon_ridge + 8.0   # well clear of the ridge
    dh_full = s.elevation_m_at(lat, lon_ridge) - s.elevation_m_at(lat, lon_off)
    expected = 5e-4 * 1737.4e3  # ridge height in meters (~869 m)
    local_relief = abs(
        (base[256, ridge_col] - base[256, (ridge_col + 23) % 1024])
        * rs0) * 1737.4e3

    # the capped host level (what round 2 measured from) is too coarse
    capped_level = s._capped_level(0)
    assert capped_level >= 3  # forced at least 8x coarser
    from moonrtx_tpu.interact.measure import elevation_difference_m

    dh_capped = elevation_difference_m(
        s.elevation_host(), s.radius_scale, lat, lon_ridge, lat, lon_off)
    # full-res sees the ridge (within terrain relief + quantization)
    assert abs(dh_full - expected) < local_relief + 100.0
    assert dh_full > 0.6 * expected
    # the capped level smears it to a fraction of its height
    assert dh_capped < 0.4 * dh_full
