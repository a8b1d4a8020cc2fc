"""Render engine: camera, geometry, intersection, lighting, shadow scan.

Golden checks run on CPU (identical XLA semantics to TPU, SURVEY.md sec. 4).
"""

import math
from datetime import datetime, timezone

import jax.numpy as jnp
import numpy as np
import pytest

from moonrtx_tpu import constants as C
from moonrtx_tpu.engine.camera import camera_basis, pixel_ray, ray_directions
from moonrtx_tpu.engine.geometry import (
    latlon_to_unit,
    mat3_apply,
    mat3t_apply,
    ray_sphere,
    unit_to_latlon,
)
from moonrtx_tpu.engine.light import calculate_light_pos, calculate_sun_disk
from moonrtx_tpu.engine.render import (
    intersect_heightfield,
    intersect_smooth_sphere,
    surface_normal,
    tonemap,
)
from moonrtx_tpu.engine.scene import default_camera
from moonrtx_tpu.data.mips import pad_lon_wrap
from moonrtx_tpu.ops import shadow_scan
from moonrtx_tpu.types import Camera, MoonEphemeris


def _flat_tex(h=180, w=360, value=0.99, pad=8):
    tex = np.full((h, w), value, np.float32)
    return tex, pad


# ---- geometry ----

def test_latlon_unit_convention():
    """lon 0 at -Y, +X at 90E, +Z north (reference renderer_navigation.py:34-40)."""
    v = np.asarray(latlon_to_unit(0.0, 0.0))
    assert np.allclose(v, [0, -1, 0], atol=1e-7)
    v = np.asarray(latlon_to_unit(0.0, 90.0))
    assert np.allclose(v, [1, 0, 0], atol=1e-7)
    v = np.asarray(latlon_to_unit(90.0, 0.0))
    assert np.allclose(v, [0, 0, 1], atol=1e-7)


def test_latlon_round_trip():
    lats = np.array([-80.0, -20.0, 0.0, 45.0, 89.0])
    lons = np.array([-179.0, -90.0, 0.0, 30.0, 170.0])
    la, lo = unit_to_latlon(latlon_to_unit(lats, lons))
    assert np.allclose(np.asarray(la), lats, atol=1e-4)
    assert np.allclose(np.asarray(lo), lons, atol=1e-4)


def test_mat3_apply_matches_matmul():
    rng = np.random.default_rng(0)
    M = np.linalg.qr(rng.standard_normal((3, 3)))[0].astype(np.float32)
    v = rng.standard_normal((5, 3)).astype(np.float32)
    assert np.allclose(np.asarray(mat3_apply(M, v)), v @ M.T, atol=1e-6)
    assert np.allclose(np.asarray(mat3t_apply(M, v)), v @ M, atol=1e-6)


def test_ray_sphere_values():
    o = jnp.asarray([0.0, -300.0, 0.0])
    d = jnp.asarray([0.0, 1.0, 0.0])
    hit, t0, t1 = ray_sphere(o, d, 10.0)
    assert bool(hit) and float(t0) == pytest.approx(290.0) and float(t1) == pytest.approx(310.0)
    hit, _, _ = ray_sphere(o, jnp.asarray([1.0, 0.0, 0.0]), 10.0)
    assert not bool(hit)


# ---- camera ----

def test_camera_center_ray_and_fov():
    cam = default_camera()
    b = camera_basis(cam)
    dirs = np.asarray(ray_directions(b, 64, 64))
    assert np.allclose(dirs[32, 32], [0, 1, 0], atol=2e-2)
    # vertical fov: angle between top and bottom edge rays
    top = dirs[0, 32] / np.linalg.norm(dirs[0, 32])
    bot = dirs[63, 32] / np.linalg.norm(dirs[63, 32])
    ang = math.degrees(math.acos(np.clip(top @ bot, -1, 1)))
    assert ang == pytest.approx(cam.fov, rel=0.05)


def test_orientation_flips_mirror_image():
    cam = default_camera()
    d0 = np.asarray(ray_directions(camera_basis(cam, "NSWE"), 16, 16))
    dh = np.asarray(ray_directions(camera_basis(cam, "NSEW"), 16, 16))
    dv = np.asarray(ray_directions(camera_basis(cam, "SNWE"), 16, 16))
    db = np.asarray(ray_directions(camera_basis(cam, "SNEW"), 16, 16))
    assert np.allclose(dh, d0[:, ::-1], atol=1e-6)   # horizontal mirror
    assert np.allclose(dv, d0[::-1, :], atol=1e-6)   # vertical mirror
    assert np.allclose(db, d0[::-1, ::-1], atol=1e-6)


def test_pixel_ray_matches_grid():
    cam = default_camera()
    b = camera_basis(cam)
    dirs = np.asarray(ray_directions(b, 32, 48))
    pr = np.asarray(pixel_ray(b, 7, 11, 32, 48))
    assert np.allclose(pr, dirs[7, 11], atol=1e-6)


# ---- intersection ----

def test_smooth_sphere_center_distance():
    ob = jnp.asarray([0.0, -300.0, 0.0])
    db = jnp.asarray([[0.0, 1.0, 0.0]])
    hit, t, lat, lon, p = intersect_smooth_sphere(9.9, ob, db)
    assert bool(hit[0])
    assert float(t[0]) == pytest.approx(290.1, abs=1e-3)
    assert float(lat[0]) == pytest.approx(0.0, abs=1e-4)
    assert float(lon[0]) == pytest.approx(0.0, abs=1e-4)


def test_heightfield_constant_matches_analytic():
    tex, pad = _flat_tex(value=0.99)
    texj = jnp.asarray(pad_lon_wrap(tex, pad))
    ob = jnp.asarray([0.0, -300.0, 0.0])
    db = np.zeros((5, 3), np.float32)
    # center + slightly off-axis rays
    for i, ang in enumerate([0.0, 0.005, -0.005, 0.01, -0.01]):
        db[i] = [math.sin(ang), math.cos(ang), 0.0]
    hit, t, lat, lon, p = intersect_heightfield(
        texj, 180, 360, 0.99, ob, jnp.asarray(db))
    assert bool(np.all(np.asarray(hit)))
    # analytic: sphere radius 9.9
    _, t_ref, _, _, _ = intersect_smooth_sphere(9.9, ob, jnp.asarray(db))
    assert np.allclose(np.asarray(t), np.asarray(t_ref), atol=2e-3)


def test_heightfield_miss_outside_disk():
    tex, pad = _flat_tex()
    texj = jnp.asarray(pad_lon_wrap(tex, pad))
    ob = jnp.asarray([0.0, -300.0, 0.0])
    db = jnp.asarray([[math.sin(0.1), math.cos(0.1), 0.0]])  # 0.1 rad off: misses
    hit, *_ = intersect_heightfield(texj, 180, 360, 0.99, ob, db)
    assert not bool(hit[0])


def test_surface_normal_radial_on_flat():
    tex, pad = _flat_tex()
    texj = jnp.asarray(pad_lon_wrap(tex, pad))
    lat = jnp.asarray([0.0, 30.0, -45.0])
    lon = jnp.asarray([0.0, 60.0, -120.0])
    hs = jnp.full(3, 0.99)
    n = np.asarray(surface_normal(texj, 180, 360, lat, lon, hs))
    r = np.asarray(latlon_to_unit(lat, lon))
    assert np.allclose(n, r, atol=1e-3)


# ---- light geometry (reference moon_renderer.py:505-579 axis cases) ----

def _ephem(phase_angle, bright_limb, elongation=90.0, distance=384400.0,
           sun_distance=1.496e8):
    return MoonEphemeris(
        az=0, alt=0, ra=0, dec=0, distance=distance, sun_distance=sun_distance,
        phase_angle=phase_angle, bright_limb_angle=bright_limb,
        libr_long_geo=0, libr_lat_geo=0, libr_long_topo=0, libr_lat_topo=0,
        elongation=elongation, phase_name="", colongitude=0,
        rotation_matrix=np.eye(3))


def test_light_pos_axis_cases():
    D = C.SUN_LIGHT_DISTANCE
    # full moon (phase 0): light behind camera (-Y)
    lp = calculate_light_pos(_ephem(0.0, 0.0))
    assert np.allclose(lp, [0, -D, 0], atol=1e-6)
    # new moon (phase 180): light behind the Moon (+Y)
    lp = calculate_light_pos(_ephem(180.0, 0.0))
    assert np.allclose(lp, [0, D, 0], atol=1e-3)
    # quarter with bright limb up (bla 0): light from +Z
    lp = calculate_light_pos(_ephem(90.0, 0.0))
    assert np.allclose(lp, [0, 0, D], atol=1e-3)
    # bright limb at +90 (east/left): light from -X
    lp = calculate_light_pos(_ephem(90.0, 90.0))
    assert np.allclose(lp, [-D, 0, 0], atol=1e-3)


def test_sun_disk_parking_beyond_90deg():
    c, r = calculate_sun_disk(_ephem(90.0, 0.0, elongation=170.0))
    assert r == pytest.approx(0.01)
    c2, r2 = calculate_sun_disk(_ephem(179.0, 0.0, elongation=0.5))
    assert r2 > 1.0  # near-eclipse: disk visible and sized
    # disk direction ~ +Y from camera (toward the Moon)
    cam = np.array([0.0, -C.CAMERA_DISTANCE, 0.0])
    d = (c2 - cam) / np.linalg.norm(c2 - cam)
    assert d[1] > 0.99


# ---- shadow scan ----

def test_shadow_scan_mountain_casts_correct_length():
    """A mountain on flat terrain under grazing sun: shadowed out to roughly
    height/tan(altitude) behind it, lit beyond the tip and on the sun side.

    This is the spec the reference documents for its shadow-accuracy modes
    (moon_renderer.py:62-76): grazing shadows must reach physical length.
    Note a slope only casts a shadow when steeper than the sun altitude —
    the scan reproduces that exactly (m = r sin(theta) monotonicity).
    """
    h, w = 720, 1440
    base = 0.99
    bump_h = 0.006           # 0.06 scene units ~ 10.4 km peak
    sigma = 0.75             # deg; max slope ~ 22 deg > 10 deg sun altitude
    tex = np.full((h, w), base, np.float32)
    la = np.linspace(90, -90, h, endpoint=False)[:, None] - 90 / h
    lo = np.linspace(-180, 180, w, endpoint=False)[None, :] + 180 / w
    d2 = (la - 0.0) ** 2 + (lo - 0.0) ** 2
    tex += (bump_h * np.exp(-d2 / sigma ** 2)).astype(np.float32)
    texj = jnp.asarray(pad_lon_wrap(tex, 8))

    # sun at lon -80 over the equator => 10 deg altitude at lon 0; shadows
    # extend toward +lon
    sun = np.asarray(latlon_to_unit(0.0, -80.0))
    smap, params = shadow_scan.build_shadow_map(
        texj, h, w, jnp.asarray(sun, jnp.float32), 0.00465, accuracy=10)

    R = C.MOON_RADIUS
    surf = lambda lon_deg: (R * base) * np.asarray(latlon_to_unit(0.0, lon_deg))
    # shadow tip ~ peak_height / tan(alt) of arc beyond the peak ~ 2.0 deg
    tip_deg = math.degrees((R * bump_h / math.tan(math.radians(10.0))) / (R * base))

    pts_in = np.stack([surf(1.2), surf(0.5 * tip_deg + 0.8)])
    vals_in = np.asarray(shadow_scan.shadow_lookup(
        smap, params, jnp.asarray(pts_in, jnp.float32)))
    assert np.all(vals_in < 0.45), (vals_in, tip_deg)

    pts_out = np.stack([surf(tip_deg * 2.0 + 1.5), surf(-5.0)])
    vals_out = np.asarray(shadow_scan.shadow_lookup(
        smap, params, jnp.asarray(pts_out, jnp.float32)))
    assert np.all(vals_out > 0.75), (vals_out, tip_deg)


def test_shadow_scan_subsolar_lit_antisolar_dark():
    tex, pad = _flat_tex(180, 360, 0.99)
    texj = jnp.asarray(pad_lon_wrap(tex, pad))
    sun = jnp.asarray([0.0, -1.0, 0.0], jnp.float32)  # sun over (lat 0, lon 0)
    smap, params = shadow_scan.build_shadow_map(texj, 180, 360, sun, 0.00465, 1)
    p_sub = 9.9 * np.asarray(latlon_to_unit(0.0, 0.0))
    p_anti = 9.9 * np.asarray(latlon_to_unit(0.0, 180.0))
    v = np.asarray(shadow_scan.shadow_lookup(
        smap, params, jnp.asarray(np.stack([p_sub, p_anti]), jnp.float32)))
    assert v[0] > 0.9
    assert v[1] < 0.1


# ---- tonemap ----

def test_tonemap_reference_curve():
    lin = jnp.asarray([[[0.0, 0.5, 2.0]]])
    out = np.asarray(tonemap(lin, 0.9, 2.2))
    assert out[0, 0, 0] == 0
    assert out[0, 0, 1] == int((0.45 ** (1 / 2.2)) * 255 + 0.5)
    assert out[0, 0, 2] == 255  # clipped


def test_shadow_tip_position_accuracy():
    """Quantitative spec (reference moon_renderer.py:62-76 / BASELINE.md):
    the shadow TIP must sit at its physical position. A wall of height H
    under sun altitude a casts a shadow of ground length ~H/tan(a); the
    scan must place the lit/shadow transition within a few percent."""
    h, w = 720, 1440
    base = 0.99
    wall_h = 0.004            # 0.04 scene units ~ 7 km
    tex = np.full((h, w), base, np.float32)
    la = np.linspace(90, -90, h, endpoint=False)[:, None] - 90 / h
    lo = np.linspace(-180, 180, w, endpoint=False)[None, :] + 180 / w
    # steep ridge along lon=0 (1 texel wide at lat in [-5, 5])
    ridge = (np.abs(lo) < 0.26) & (np.abs(la) < 5.0)
    tex[ridge] += wall_h
    texj = jnp.asarray(pad_lon_wrap(tex, 8))

    sun = np.asarray(latlon_to_unit(0.0, -80.0))  # altitude 10 deg at lon 0
    smap, params = shadow_scan.build_shadow_map(
        texj, h, w, jnp.asarray(sun, jnp.float32), 0.00465, accuracy=10)

    R = C.MOON_RADIUS
    # exact spherical shadow tip: the wall top (radius base+wall_h at
    # colatitude 80 deg from the subsolar point) shadows every point whose
    # cylindrical radius r*sin(theta) is below the wall top's:
    #   sin(theta_tip) = (base + wall_h)/base * sin(80 deg)
    theta_wall = 80.0
    s_tip = (base + wall_h) / base * math.sin(math.radians(theta_wall))
    expected_tip_deg = math.degrees(math.asin(min(s_tip, 1.0))) - theta_wall

    # sample the shadow factor along the equator behind the ridge
    dlons = np.linspace(0.3, expected_tip_deg * 1.8, 120)
    pts = (R * base) * np.stack([np.asarray(latlon_to_unit(0.0, d))
                                 for d in dlons])
    vals = np.asarray(shadow_scan.shadow_lookup(
        smap, params, jnp.asarray(pts, jnp.float32)))
    # measured tip = where the penumbra crosses 0.5
    crossing = np.where(vals > 0.5)[0]
    assert crossing.size, "no lit region found beyond the shadow"
    measured_tip = dlons[crossing[0]]
    # within ~1 texel (0.25 deg = 7.6 km) of smear for a 1-texel-wide wall;
    # the tip position itself is exact spherical geometry (the reference's
    # fast mode errs by 5-7 km systematically and its accurate mode ~0.5 km)
    assert abs(measured_tip - expected_tip_deg) < 0.27


# ---- one-bounce terrain interreflection ----

def _crater_tex(h=512, w=1024, lat0=0.0, lon0=-85.0, radius_km=10.0,
                depth_km=4.0):
    """Parabolic crater with a raised rim, centered at (lat0, lon0)."""
    la = np.linspace(90, -90, h, endpoint=False)[:, None] - 90 / h
    lo = np.linspace(-180, 180, w, endpoint=False)[None, :] + 180 / w
    km_per_deg = 2 * np.pi * 1737.4 / 360.0
    d_km = np.sqrt((la - lat0) ** 2 + (lo - lon0) ** 2) * km_per_deg
    rel = np.where(d_km < radius_km,
                   -(depth_km / 1737.4) * (1 - (d_km / radius_km) ** 2), 0.0)
    rel += np.where((d_km >= radius_km) & (d_km < 1.4 * radius_km),
                    (1.0 / 1737.4) * (1 - (d_km - radius_km)
                                      / (0.4 * radius_km)), 0.0)
    tex = (1.0 + rel).astype(np.float32)
    return tex / tex.max()


def test_bounce_zero_on_smooth_sphere():
    """No terrain variation -> no interreflection anywhere."""
    h, w = 256, 512
    tex = jnp.asarray(pad_lon_wrap(np.full((h, w), 0.998, np.float32), 192))
    alb = jnp.full_like(tex, 0.35)
    sun = jnp.asarray(latlon_to_unit(0.0, 0.0), jnp.float32)
    _, _, bmap = shadow_scan.build_shadow_and_bounce(
        tex, alb, h, w, sun, 0.00465, accuracy=2)
    assert float(jnp.max(bmap)) < 1e-6


def test_bounce_lights_shadowed_crater_floor():
    """A deep crater near the terminator: its shadowed floor must receive
    one-bounce light from the sunlit wall (the reference's path tracer
    produces this via its 2-4 indirect segments, moon_renderer.py:441-445);
    flat terrain far from the crater receives none."""
    h, w = 512, 1024
    tex = jnp.asarray(pad_lon_wrap(_crater_tex(h, w), 192))
    alb = jnp.full_like(tex, 0.35)
    sun = jnp.asarray(latlon_to_unit(0.0, 0.0), jnp.float32)
    smap, params, bmap = shadow_scan.build_shadow_and_bounce(
        tex, alb, h, w, sun, 0.00465, accuracy=4)
    smap_np = np.asarray(smap)[:, :-shadow_scan.PHI_PAD]
    bmap_np = np.asarray(bmap)[:, :-shadow_scan.PHI_PAD]
    nc, nf = int(params.n_coarse), int(params.n_fine)
    # crater sits at theta = 85 deg from the subsolar point
    r0 = nc + int((85 - 77) / 30 * nf)
    r1 = nc + int((85 - 73) / 30 * nf)
    in_shadow = smap_np[r0:r1] < 0.1
    assert in_shadow.sum() > 0
    bounce_shadowed = bmap_np[r0:r1][in_shadow]
    # visible after tonemap: ~2e-4 in irradiance-factor units is ~3
    # display quanta from black through the gamma curve. (Threshold
    # recalibrated in round 4: the sector model validated against Monte
    # Carlo — docs/GI.md — gives ~2.5x smaller, truthful values than the
    # isotropic model these tests were first written against.)
    assert bounce_shadowed.max() > 2e-4
    # flat terrain well away from the crater: nothing
    assert bmap_np[nc // 2, w // 2] < 1e-6
    # energy sanity: bounce can never exceed the cap or the emitter albedo
    assert bmap_np.max() <= shadow_scan.BOUNCE_MAX + 1e-6
    assert bmap_np.max() < 0.35


def test_bounce_brightens_rendered_shadows_only():
    """Scene-level: with indirect light ON, pixels inside cast shadows get
    brighter; fully lit pixels stay (almost) unchanged. Deep craters are
    placed at the date's actual terminator crossings (ephemeris-derived sun
    direction) so their floors are shadowed with sunlit rims."""
    from moonrtx_tpu.astro import calculate_ephemeris
    from moonrtx_tpu.config import RenderConfig
    from moonrtx_tpu.engine import light as light_mod
    from moonrtx_tpu.engine.scene import MoonScene
    from moonrtx_tpu.types import Observer

    obs = Observer(50.06, 19.94, 219)
    dt = datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc)
    e = calculate_ephemeris(dt, obs, False)
    sun_body = np.asarray(e.rotation_matrix).T @ np.asarray(
        light_mod.calculate_light_pos(e))
    sun_body /= np.linalg.norm(sun_body)
    _, lon_s = unit_to_latlon(jnp.asarray(sun_body))
    lon_s = float(lon_s)

    h, w = 360, 720
    tex = np.ones((h, w), np.float32)
    for dlon in (-85.0, 85.0):
        lon0 = (lon_s + dlon + 180.0) % 360.0 - 180.0
        tex = np.minimum(tex, _crater_tex(h, w, lon0=lon0, radius_km=80.0,
                                          depth_km=6.0))
    tex /= tex.max()
    albedo = np.full((h, w, 3), 0.35, np.float32)
    cfg = RenderConfig(
        observer=obs, dt_local=dt,
        width=384, height=216, shadow_accuracy=4).validate()

    def render(indirect):
        c = RenderConfig(**{**cfg.__dict__, "indirect_light": indirect})
        s = MoonScene(c, tex, 1.0, albedo, None)
        s.backend = "blocked"
        s.shadows_on = True
        s.update_view()
        s.render(1)
        return np.asarray(s._accum), s

    img_on, s_on = render(True)
    img_off, _ = render(False)
    d = (img_on - img_off).max(axis=-1)
    hit = np.asarray(s_on._hitbuf)[..., 3] > 0
    # nothing gets darker, something gets brighter, and the brightening is
    # confined to the moon disk
    assert d.min() > -1e-5
    # threshold recalibrated to the round-4 MC-validated sector model
    # (docs/GI.md): ~3e-5 linear is still >1 display quantum from black
    assert d[hit].max() > 1.5e-5
    assert np.abs(d[~hit]).max() < 1e-6


@pytest.mark.parametrize("width,height", [(160, 96), (480, 360), (200, 200)])
def test_disk_centered_at_padded_sizes(width, height):
    """The displayed Moon disk must be centered for ANY requested size,
    including widths that pad up to the 128-column block grid.

    Regression for the round-2 centering bug: ray NDC used the PADDED
    frame as reference while display() crops top-left, so at 480x360 the
    disk sat 16 px right of center (visible in the committed parity
    artifacts) and at 160x96 it was clipped off the right edge. Fixed by
    MoonScene.render_basis() compensating the basis so padded-frame ray
    gen emits requested-frame NDC rays."""
    from moonrtx_tpu.config import RenderConfig
    from moonrtx_tpu.engine.scene import MoonScene
    from moonrtx_tpu.types import Observer

    tex, _ = _flat_tex()
    albedo = np.full((180, 360, 3), 0.8, np.float32)
    cfg = RenderConfig(
        observer=Observer(50.0, 20.0, 200),
        dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
        width=width, height=height, shadow_accuracy=1).validate()
    s = MoonScene(cfg, tex, 1.0, albedo, None)
    s.update_view()
    s.ensure_accumulated(1)
    hit = s.hit_buffer_host()[: s.out_height, : s.out_width, 3] > 0
    ys, xs = np.nonzero(hit)
    assert ys.size > 100
    # disk centered in the DISPLAYED frame (sub-pixel: limb discretization)
    assert abs((xs.min() + xs.max()) / 2 - (width - 1) / 2) <= 1.0
    assert abs((ys.min() + ys.max()) / 2 - (height - 1) / 2) <= 1.0
    # and not clipped by the crop: the limb keeps a margin on every side
    assert xs.min() > 2 and xs.max() < width - 3
    assert ys.min() > 2 and ys.max() < height - 3
