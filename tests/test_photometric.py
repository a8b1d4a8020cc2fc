"""Photometric function: McEwen lunar-Lambert blend (--photometric lunar).

The reference's OptiX engine shades pure diffuse (Lambert); the real lunar
regolith back-scatters (Lommel-Seeliger), which is why the full Moon looks
flat-bright instead of limb-darkened. `--photometric lunar` blends the two
with McEwen's phase-angle-dependent L (engine/light.py lunar_lambert_blend);
L = 0 degenerates to exact Lambert, so the default config is bit-identical
to the pre-feature engine.
"""

from datetime import datetime, timezone

import numpy as np
import pytest

from moonrtx_tpu.config import ConfigError, RenderConfig
from moonrtx_tpu.engine.light import lunar_lambert_blend
from moonrtx_tpu.engine.scene import MoonScene
from moonrtx_tpu.types import Observer

# full Moon (2024-04-23 23:49 UTC): minimal phase angle, whole disk lit
FULL_DT = datetime(2024, 4, 23, 23, 49, tzinfo=timezone.utc)
OBS = Observer(50.06, 19.94, 219)


def test_lunar_lambert_blend_values():
    assert lunar_lambert_blend(0.0) == 1.0
    samples = [lunar_lambert_blend(a) for a in range(0, 151, 5)]
    assert all(0.0 <= v <= 1.0 for v in samples)
    # monotone non-increasing over the physical range
    assert all(a >= b for a, b in zip(samples, samples[1:]))
    # roughly McEwen's Moon: ~0.6 at 30 deg, ~0.4 at 60, ~0 by 120
    assert 0.5 < lunar_lambert_blend(30.0) < 0.7
    assert 0.3 < lunar_lambert_blend(60.0) < 0.5
    assert lunar_lambert_blend(125.0) == 0.0


def test_photometric_config_validation():
    cfg = RenderConfig(observer=OBS, dt_local=FULL_DT, width=64, height=64,
                       photometric="lunar").validate()
    assert cfg.photometric == "lunar"
    with pytest.raises(ConfigError):
        RenderConfig(observer=OBS, dt_local=FULL_DT,
                     photometric="hapke").validate()


def _scene(photometric: str, backend: str, h=180, w=360,
           width=160, height=160, dt=FULL_DT):
    tex = np.ones((h, w), np.float32)
    albedo = np.full((h, w, 3), 0.35, np.float32)
    cfg = RenderConfig(observer=OBS, dt_local=dt, width=width, height=height,
                       shadow_accuracy=4, photometric=photometric).validate()
    s = MoonScene(cfg, tex, 1.0, albedo, None)
    s.backend = backend
    s.shadows_on = False
    s.update_view()
    return s


def _disk_profile(s):
    """(center mean, annulus mean) of the luminance over the moon disk."""
    s.render(1)
    img = np.asarray(s._accum).max(axis=-1)
    hit = np.asarray(s._hitbuf)[..., 3] > 0
    ys, xs = np.nonzero(hit)
    cy, cx = ys.mean(), xs.mean()
    r = np.sqrt((ys - cy) ** 2 + (xs - cx) ** 2)
    rmax = r.max()
    v = img[ys, xs]
    center = v[r < 0.2 * rmax].mean()
    annulus = v[(r > 0.55 * rmax) & (r < 0.70 * rmax)].mean()
    return float(center), float(annulus)


def test_lunar_blend_set_on_frame_params():
    s_lam = _scene("lambert", "blocked")
    assert s_lam._fp.lunar_blend is None
    s_lun = _scene("lunar", "blocked")
    alpha = s_lun.ephem.phase_angle
    assert alpha < 15.0  # it really is (nearly) full Moon
    assert float(s_lun._fp.lunar_blend) == pytest.approx(
        lunar_lambert_blend(alpha))


def test_lunar_flattens_full_moon_disk():
    """At full phase, Lambert limb-darkens (annulus/center ~ cos of the
    surface tilt) while lunar-Lambert is nearly flat — the real full-Moon
    look."""
    c_lam, a_lam = _disk_profile(_scene("lambert", "blocked"))
    c_lun, a_lun = _disk_profile(_scene("lunar", "blocked"))
    ratio_lam = a_lam / c_lam
    ratio_lun = a_lun / c_lun
    assert ratio_lam < 0.9          # clear Lambert limb darkening
    assert ratio_lun > ratio_lam + 0.1   # lunar is measurably flatter
    assert ratio_lun > 0.85         # and close to flat at full phase


def test_lunar_backends_agree():
    """The blend shades identically through the XLA blocked path and the
    gather reference path."""
    img = {}
    for backend in ("blocked", "reference"):
        s = _scene("lunar", backend)
        s.render(1)
        img[backend] = np.asarray(s._accum)
    d = np.abs(img["blocked"] - img["reference"])
    assert d.max() < 2e-2
    assert d.mean() < 2e-3


def test_lunar_pallas_kernel_matches_blocked():
    """The fused Pallas kernel (interpret mode on CPU) applies the same
    blend as the XLA blocked path, shadows on."""
    imgs = {}
    for backend in ("blocked", "pallas"):
        s = _scene("lunar", backend, width=128, height=128)
        s.shadows_on = True
        s.render(1)
        imgs[backend] = np.asarray(s._accum)
    d = np.abs(imgs["blocked"] - imgs["pallas"])
    assert d.max() < 3e-2
    assert d.mean() < 3e-3


def test_cli_photometric_flag():
    from moonrtx_tpu.app.cli import config_from_args, parse_args

    argv = ["--lat", "50.06", "--lon", "19.94", "--no-download"]
    assert config_from_args(parse_args(argv)).photometric == "lambert"
    cfg = config_from_args(parse_args(argv + ["--photometric", "lunar"]))
    assert cfg.photometric == "lunar"
