"""Lunar-eclipse shading: umbra/penumbra from visible-sun coverage.

The reference has no Earth in its scene, so it renders an ordinary full
Moon during a lunar eclipse; here every shaded point attenuates solar
irradiance by the visible-sun fraction against the (refraction-enlarged)
Earth disk, with display-calibrated red refracted light in the umbra
(constants.py "lunar eclipse shading"). Dates below are real eclipses,
checked against our own ephemeris.
"""

import math
from datetime import datetime, timezone

import numpy as np
import pytest

from moonrtx_tpu import constants as C
from moonrtx_tpu.config import RenderConfig
from moonrtx_tpu.engine.render import sun_coverage
from moonrtx_tpu.engine.scene import MoonScene, _earth_params
from moonrtx_tpu.types import Observer

OBS = Observer(50.06, 19.94, 219)
TOTALITY = datetime(2025, 3, 14, 6, 59, tzinfo=timezone.utc)
PARTIAL = datetime(2024, 9, 18, 2, 44, tzinfo=timezone.utc)
PLAIN_FULL = datetime(2024, 4, 23, 23, 49, tzinfo=timezone.utc)


def test_sun_coverage_properties():
    rs, re = 0.0047, 0.0165  # typical radians
    cov = np.asarray([float(sun_coverage(s, rs, re)) for s in
                      (0.0, re - rs, re, re + rs - 0.001, re + rs, 0.05)])
    assert cov[0] == 1.0 and cov[1] == 1.0       # totality
    assert 0.0 < cov[2] < 1.0 and 0.0 < cov[3] < 1.0
    assert cov[4] == 0.0 and cov[5] == 0.0       # outside contact
    assert all(a >= b for a, b in zip(cov, cov[1:]))  # monotone


def _center_coverage(dt):
    """Solar coverage at the lunar disk center for a date, from the same
    ephemeris + params the renderer uses."""
    from moonrtx_tpu.astro import calculate_ephemeris
    from moonrtx_tpu.engine import light as lm

    e = calculate_ephemeris(dt, OBS, False)
    p = _earth_params(e, eclipse=True, earthshine=False)
    sun_body = np.asarray(e.rotation_matrix).T @ np.asarray(
        lm.calculate_light_pos(e))
    sun_u = sun_body / np.linalg.norm(sun_body)
    sep = math.acos(float(np.clip(np.dot(p[:3], sun_u), -1, 1)))
    a_s = math.asin(C.SUN_RADIUS_KM / e.sun_distance)
    return float(sun_coverage(sep, a_s, float(p[4])))


def test_eclipse_geometry_at_known_dates():
    assert _center_coverage(TOTALITY) == 1.0
    assert 0.0 < _center_coverage(PARTIAL) < 1.0
    assert _center_coverage(PLAIN_FULL) == 0.0


def test_coverage_uses_moon_center_sun_direction():
    """Regression: the eclipse separation's sun side must come from the
    moon-center sun DIRECTION, not the per-point direction to the scene
    light. The light is parked at SUN_LIGHT_DISTANCE = 2146 R (the real
    sun is ~86,000 R), so a per-point direction exaggerates solar
    parallax ~40x and renders the umbra footprint ~11% too large.
    Moon-center direction => the output is exactly invariant to the
    scene light's DISTANCE along the same direction."""
    import jax.numpy as jnp
    from moonrtx_tpu.engine.render import FrameParams, earth_light_terms

    from moonrtx_tpu.astro import calculate_ephemeris
    from moonrtx_tpu.engine import light as lm

    e = calculate_ephemeris(PARTIAL, OBS, False)
    fp = FrameParams(
        rotation=jnp.asarray(e.rotation_matrix, jnp.float32),
        light_pos=jnp.asarray(lm.calculate_light_pos(e), jnp.float32),
        sun_disk_center=jnp.zeros(3, jnp.float32),
        sun_disk_radius=jnp.float32(0.0),
        irradiance=jnp.float32(1.0),
        sun_ang_radius=jnp.float32(
            math.asin(C.SUN_RADIUS_KM / e.sun_distance)),
        lunar_blend=None,
        earth=jnp.asarray(_earth_params(e, True, True), jnp.float32),
    )
    # surface points spanning the disk (body frame, |p| = MOON_RADIUS)
    th = np.linspace(0.2, math.pi - 0.2, 13)
    ph = np.linspace(-math.pi, math.pi, 17)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    p_body = C.MOON_RADIUS * np.stack(
        [np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp), np.cos(tt)],
        axis=-1).astype(np.float32)
    n_body = (p_body / C.MOON_RADIUS).astype(np.float32)

    ecl1, es1 = earth_light_terms(fp, jnp.asarray(p_body),
                                  jnp.asarray(n_body))
    fp_far = fp._replace(light_pos=fp.light_pos * 8.0)
    ecl2, es2 = earth_light_terms(fp_far, jnp.asarray(p_body),
                                  jnp.asarray(n_body))
    assert float(jnp.abs(ecl1 - ecl2).max()) < 1e-6
    assert float(jnp.abs(es1 - es2).max()) < 1e-6
    # and the eclipse actually bites somewhere on this partial-eclipse
    # date (the invariance isn't vacuous)
    assert float(jnp.min(ecl1[..., 0])) < 0.9


def _render(dt, eclipse: bool, width=160, height=160):
    h, w = 180, 360
    tex = np.ones((h, w), np.float32)
    albedo = np.full((h, w, 3), 0.35, np.float32)
    cfg = RenderConfig(observer=OBS, dt_local=dt, width=width, height=height,
                       shadow_accuracy=4,
                       eclipse_shading=eclipse).validate()
    s = MoonScene(cfg, tex, 1.0, albedo, None)
    s.backend = "blocked"
    s.shadows_on = False
    s.update_view()
    s.render(1)
    return np.asarray(s._accum), np.asarray(s._hitbuf)[..., 3] > 0


def test_totality_renders_dim_and_red():
    img_on, hit = _render(TOTALITY, True)
    img_off, _ = _render(TOTALITY, False)
    on, off = img_on[hit], img_off[hit]
    assert on.mean() < 0.12 * off.mean()      # deeply attenuated
    # red refracted light: R/B ratio far above the neutral no-eclipse disk
    assert on[:, 0].mean() / max(on[:, 2].mean(), 1e-9) > 3.0
    assert abs(off[:, 0].mean() / off[:, 2].mean() - 1.0) < 0.01


def test_partial_eclipse_shades_one_limb():
    img_on, hit = _render(PARTIAL, True)
    img_off, _ = _render(PARTIAL, False)
    ratio = img_on.max(axis=-1) / np.maximum(img_off.max(axis=-1), 1e-9)
    r_hit = ratio[hit]
    assert r_hit.min() < 0.25    # umbral side well attenuated
    assert r_hit.max() > 0.8     # opposite side only penumbral
    assert float(np.ptp(r_hit)) > 0.5   # a real gradient across the disk


def test_plain_full_moon_unchanged():
    img_on, _ = _render(PLAIN_FULL, True)
    img_off, _ = _render(PLAIN_FULL, False)
    assert float(np.abs(img_on - img_off).max()) < 1e-6


def test_eclipse_pallas_kernel_matches_blocked():
    h, w = 180, 360
    tex = np.ones((h, w), np.float32)
    albedo = np.full((h, w, 3), 0.35, np.float32)
    imgs = {}
    for backend in ("blocked", "pallas"):
        cfg = RenderConfig(observer=OBS, dt_local=PARTIAL, width=128,
                           height=128, shadow_accuracy=4,
                           eclipse_shading=True).validate()
        s = MoonScene(cfg, tex, 1.0, albedo, None)
        s.backend = backend
        s.shadows_on = True
        s.update_view()
        s.render(1)
        imgs[backend] = np.asarray(s._accum)
    d = np.abs(imgs["blocked"] - imgs["pallas"])
    assert d.max() < 3e-2
    assert d.mean() < 3e-3


def test_pallas_kernel_earth_terms_compiled_out():
    """With eclipse shading AND earthshine disabled, fp.earth is None and
    the pallas kernel statically drops the Earth block (use_earth=False)
    — the output must still match the blocked path exactly as before."""
    h, w = 180, 360
    tex = np.ones((h, w), np.float32)
    albedo = np.full((h, w, 3), 0.35, np.float32)
    imgs = {}
    for backend in ("blocked", "pallas"):
        cfg = RenderConfig(observer=OBS, dt_local=PARTIAL, width=128,
                           height=128, shadow_accuracy=4,
                           eclipse_shading=False,
                           earthshine=False).validate()
        s = MoonScene(cfg, tex, 1.0, albedo, None)
        s.backend = backend
        s.shadows_on = True
        s.update_view()
        assert s._fp.earth is None
        s.render(1)
        imgs[backend] = np.asarray(s._accum)
    d = np.abs(imgs["blocked"] - imgs["pallas"])
    assert d.max() < 3e-2
    assert d.mean() < 3e-3


def test_cli_eclipse_flag():
    from moonrtx_tpu.app.cli import config_from_args, parse_args

    argv = ["--lat", "50.06", "--lon", "19.94", "--no-download"]
    assert config_from_args(parse_args(argv)).eclipse_shading is True
    cfg = config_from_args(parse_args(argv + ["--no-eclipse-shading"]))
    assert cfg.eclipse_shading is False


# ---- earthshine (da Vinci glow) ---------------------------------------------

CRESCENT = datetime(2024, 4, 11, 19, 30, tzinfo=timezone.utc)


def _render_es(dt, earthshine: bool, width=160, height=160):
    h, w = 180, 360
    tex = np.ones((h, w), np.float32)
    albedo = np.full((h, w, 3), 0.35, np.float32)
    cfg = RenderConfig(observer=OBS, dt_local=dt, width=width, height=height,
                       shadow_accuracy=4,
                       earthshine=earthshine).validate()
    s = MoonScene(cfg, tex, 1.0, albedo, None)
    s.backend = "blocked"
    s.shadows_on = False
    s.update_view()
    s.render(1)
    return np.asarray(s._accum), np.asarray(s._hitbuf)[..., 3] > 0


def test_earthshine_fraction():
    from moonrtx_tpu.engine.light import earthshine_fraction

    assert earthshine_fraction(0.0) == 0.0      # full Moon: new Earth
    assert earthshine_fraction(180.0) == 1.0    # new Moon: full Earth
    assert abs(earthshine_fraction(90.0) - 0.5) < 1e-12


def test_earthshine_lights_crescent_night_side():
    img_on, hit = _render_es(CRESCENT, True)
    img_off, _ = _render_es(CRESCENT, False)
    lum_on = img_on.max(axis=-1)
    lum_off = img_off.max(axis=-1)
    # the dark side: hit pixels that are (near) black without earthshine
    dark = hit & (lum_off < 1e-5)
    assert dark.sum() > hit.sum() * 0.3   # a crescent has a big night side
    assert float(lum_on[dark].mean()) > 1e-4          # visibly lit now
    assert float(lum_on[dark].mean()) < 0.05 * float(
        lum_on[hit & ~dark].mean())                   # but much dimmer
    # nothing on the lit side got darker
    assert float((img_on - img_off).min()) > -1e-6


def test_earthshine_negligible_at_full_moon():
    img_on, hit = _render_es(PLAIN_FULL, True)
    img_off, _ = _render_es(PLAIN_FULL, False)
    # new Earth over the full Moon: fraction ~ 5e-4 of an already
    # display-calibrated 1.2% term
    assert float(np.abs(img_on - img_off).max()) < 1e-4
