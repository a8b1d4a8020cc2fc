"""The render pipeline: ray generation -> heightfield intersection ->
shading -> compositing, as pure jittable functions.

TPU-native replacement for the OptiX displaced-surface path tracer
(reference moon_renderer.py:432-502). The Moon is r(lat, lon) =
MOON_RADIUS * h(lat, lon) over an equirectangular heightfield with peak
normalized to 1.0 (the bounding sphere, reference data_loader.py:136-140);
primary rays bracket the surface between the bounding and inner spheres
with a fixed-step scan plus bisection refinement (divergence-free control
flow; the reference's OptiX intersector ray-marches with an
epsilon-proportional step, moon_renderer.py:62-76).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from moonrtx_tpu import constants as C
from moonrtx_tpu.engine.camera import CameraBasis, ray_directions
from moonrtx_tpu.engine.geometry import (
    latlon_to_unit,
    mat3_apply,
    mat3t_apply,
    normalize,
    ray_sphere,
    unit_to_latlon,
)
from moonrtx_tpu.ops import sampler


class FrameParams(NamedTuple):
    """Per-frame device scalars/small arrays (a pytree; changing values does
    not retrigger compilation)."""

    rotation: jnp.ndarray        # (3,3) body->scene
    light_pos: jnp.ndarray       # (3,) scene
    sun_disk_center: jnp.ndarray # (3,) scene
    sun_disk_radius: jnp.ndarray # scalar
    irradiance: jnp.ndarray      # scalar linear irradiance factor
    sun_ang_radius: jnp.ndarray  # scalar, radians (penumbra width)
    # lunar-Lambert blend L(alpha) for --photometric lunar (None = pure
    # Lambert, the reference's diffuse model): the Moon's regolith is not
    # Lambertian — Lommel-Seeliger scattering flattens the full-Moon disk.
    # L depends only on the phase angle (constant across the disk to
    # <0.5 deg), so it is one host scalar per frame (engine/light.py
    # lunar_lambert_blend).
    lunar_blend: Optional[jnp.ndarray] = None
    # Earth-dependent light terms: (6,) f32 [earth_dir_body xyz, earth
    # distance in scene units, earth angular radius in rad (0 disables
    # eclipse shading), earthshine irradiance relative to direct sunlight
    # (0 disables)]. Eclipse: coverage of the solar disk by the Earth's
    # disk per shaded point — umbra and penumbra emerge from the
    # circle-overlap geometry (constants.py "lunar eclipse shading").
    # Earthshine: Lambert term toward the Earth lighting the night side
    # (the da Vinci glow). None = reference behavior (no Earth at all).
    earth: Optional[jnp.ndarray] = None


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray     # (H, W, 3) linear HDR
    hitbuf: jnp.ndarray  # (H, W, 4) scene-frame hit position + distance (0 = miss)


def surface_point(tex, lat, lon, h, w):
    """Displaced surface position (body frame) at lat/lon."""
    hs = sampler.sample_latlon(tex, lat, lon, h, w)
    return C.MOON_RADIUS * hs[..., None] * latlon_to_unit(lat, lon), hs


def _field(tex, h, w, ob, db, t):
    """Signed radial distance f(t) = |p| - R*h(latlon(p)); negative inside."""
    p = ob + t[..., None] * db
    lat, lon = unit_to_latlon(p)
    hs = sampler.sample_latlon(tex, lat, lon, h, w)
    return jnp.linalg.norm(p, axis=-1) - C.MOON_RADIUS * hs, p, lat, lon


def intersect_heightfield(tex, h: int, w: int, h_min: float,
                          ob, db, n_coarse: int = 48, n_bisect: int = 10):
    """Bracket-and-bisect intersection against the displaced sphere.

    ob: (3,) body-frame ray origin; db: (..., 3) unit directions.
    Returns (hit, t_hit, lat, lon, p_hit).

    Fixed-iteration structure (no data-dependent shapes): n_coarse samples
    along each ray's in-shell chord find the first sign change; n_bisect
    bisection steps refine to ~chord/2^(n_coarse+log2 n_bisect) accuracy.
    """
    r_out = C.MOON_RADIUS
    r_in = C.MOON_RADIUS * h_min
    hit_out, t_enter, t_exit_out = ray_sphere(ob, db, r_out)
    hit_in, t_in, _ = ray_sphere(ob, db, r_in * 0.999)
    t_enter = jnp.maximum(t_enter, 0.0)
    t_end = jnp.where(hit_in & (t_in > 0), t_in, t_exit_out)

    def coarse_body(k, carry):
        found, t_lo, t_hi = carry
        frac = (k + 1.0) / n_coarse
        t_k = t_enter + (t_end - t_enter) * frac
        f_k, _, _, _ = _field(tex, h, w, ob, db, t_k)
        newly = (~found) & (f_k < 0.0) & hit_out
        t_prev = t_enter + (t_end - t_enter) * (k * 1.0 / n_coarse)
        t_lo = jnp.where(newly, t_prev, t_lo)
        t_hi = jnp.where(newly, t_k, t_hi)
        return found | newly, t_lo, t_hi

    shape = db.shape[:-1]
    found0 = jnp.zeros(shape, bool)
    found, t_lo, t_hi = jax.lax.fori_loop(
        0, n_coarse, coarse_body, (found0, t_enter, t_end))

    def bisect_body(_, carry):
        t_lo, t_hi = carry
        t_mid = 0.5 * (t_lo + t_hi)
        f_mid, _, _, _ = _field(tex, h, w, ob, db, t_mid)
        outside = f_mid > 0.0
        return jnp.where(outside, t_mid, t_lo), jnp.where(outside, t_hi, t_mid)

    t_lo, t_hi = jax.lax.fori_loop(0, n_bisect, bisect_body, (t_lo, t_hi))
    t_hit = 0.5 * (t_lo + t_hi)
    p = ob + t_hit[..., None] * db
    lat, lon = unit_to_latlon(p)
    return found, t_hit, lat, lon, p


def intersect_smooth_sphere(radius: float, ob, db):
    """Analytic intersection with the mean sphere (no displacement) — the
    minimum end-to-end slice (SURVEY.md section 7, BASELINE config 1)."""
    hit, t0, _ = ray_sphere(ob, db, radius)
    hit = hit & (t0 > 0)
    t_hit = jnp.where(hit, t0, 0.0)
    p = ob + t_hit[..., None] * db
    lat, lon = unit_to_latlon(p)
    return hit, t_hit, lat, lon, p


def surface_normal(tex, h: int, w: int, lat, lon, hs):
    """Geometric normal from central-ish differences of the displaced
    surface, half-texel spacing, pole-safe."""
    dlat = 0.5 * 180.0 / h
    coslat = jnp.maximum(jnp.cos(jnp.deg2rad(lat)), 0.05)
    dlon = dlat / coslat
    p_c = C.MOON_RADIUS * hs[..., None] * latlon_to_unit(lat, lon)
    # central differences: symmetric chords stay parallel to the tangent
    # plane on smooth terrain (one-sided differences tilt by ~dlat/2)
    p_n, _ = surface_point(tex, lat + dlat, lon, h, w)
    p_s, _ = surface_point(tex, lat - dlat, lon, h, w)
    p_e, _ = surface_point(tex, lat, lon + dlon, h, w)
    p_w, _ = surface_point(tex, lat, lon - dlon, h, w)
    n = jnp.cross(p_e - p_w, p_n - p_s)
    n = normalize(n)
    # orient outward
    outward = jnp.sum(n * p_c, axis=-1, keepdims=True)
    return jnp.where(outward < 0.0, -n, n)


def soft_ndotl(mu, sigma):
    """E[max(0, n.l)] under a Gaussian normal-tilt perturbation of stddev
    sigma: mu*CDF(mu/s) + s*pdf(mu/s) with s = sigma*sin(incidence).

    Used for roughness-compensated shading where a coarser mip level has
    smoothed away sub-texel slopes (per-block LOD strides near the limb) —
    restores the mean brightness the lost facets would have contributed,
    so LOD seams carry no brightness step. CDF via the logistic
    approximation (max err ~1e-2, well below the seam step it removes).
    Exactly max(mu, 0) as sigma -> 0."""
    s = sigma * jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0)) + 1e-6
    x = mu / s
    cdf = 1.0 / (1.0 + jnp.exp(jnp.clip(-1.702 * x, -60.0, 60.0)))
    pdf = 0.39894228 * jnp.exp(-0.5 * jnp.minimum(x * x, 120.0))
    return jnp.maximum(mu * cdf + s * pdf, 0.0)


def _acos_stable(x):
    return jnp.arctan2(jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)), x)


def sun_coverage(sep, r_sun, r_earth):
    """Fraction of the solar disk occulted by the Earth disk (flat-circle
    lens overlap; all args radians). Exactly 0 outside contact, exactly 1
    in totality, smooth lens area between."""
    d = jnp.clip(sep, jnp.abs(r_earth - r_sun) + 1e-7, r_sun + r_earth - 1e-7)
    c1 = jnp.clip((d * d + r_sun * r_sun - r_earth * r_earth)
                  / (2.0 * d * r_sun), -1.0, 1.0)
    c2 = jnp.clip((d * d + r_earth * r_earth - r_sun * r_sun)
                  / (2.0 * d * r_earth), -1.0, 1.0)
    tri = ((-d + r_sun + r_earth) * (d + r_sun - r_earth)
           * (d - r_sun + r_earth) * (d + r_sun + r_earth))
    lens = (r_sun * r_sun * _acos_stable(c1)
            + r_earth * r_earth * _acos_stable(c2)
            - 0.5 * jnp.sqrt(jnp.maximum(tri, 0.0)))
    cov = lens / (math.pi * r_sun * r_sun)
    cov = jnp.where(sep >= r_sun + r_earth, 0.0, cov)
    cov = jnp.where(sep <= r_earth - r_sun, 1.0, cov)
    return jnp.clip(cov, 0.0, 1.0)


def earth_light_terms(fp: FrameParams, p_body, n_body):
    """Earth-dependent light terms, or (None, None) when fp.earth is unset.

    Returns (eclipse_rgb, earthshine): eclipse_rgb is the (..., 3)
    multiplicative factor on DIRECT solar irradiance (visible-sun fraction
    against the Earth disk + red refracted umbral light); earthshine is the
    (...,) ADDITIVE term (relative to direct sunlight) lighting the night
    side from the Earth's direction — not attenuated by the eclipse factor
    (earthlight is not blocked by the Earth).

    The sun side of the angular separation uses the MOON-CENTER sun
    direction: the real sun's per-point parallax (~0.0007 deg per lunar
    radius) is genuinely negligible, while the per-point direction to the
    scene light — parked at SUN_LIGHT_DISTANCE = 2146 R, not the real
    ~86,000 R — would exaggerate solar parallax ~40x and render the
    umbra/penumbra footprint ~11% too large on the surface. The Earth
    term keeps its true per-point parallax (~0.25 deg/R): that IS the
    moving shadow edge."""
    if fp.earth is None:
        return None, None
    light_body = mat3t_apply(fp.rotation, fp.light_pos)
    s_dir = normalize(light_body)
    e_vec = fp.earth[:3] * fp.earth[3] - p_body
    e_dir = normalize(e_vec)
    cosd = jnp.sum(e_dir * s_dir, axis=-1)
    cross = jnp.cross(e_dir, jnp.broadcast_to(s_dir, e_dir.shape))
    sind = jnp.sqrt(jnp.maximum(jnp.sum(cross * cross, axis=-1), 0.0))
    sep = jnp.arctan2(sind, cosd)
    cov = sun_coverage(sep, fp.sun_ang_radius, fp.earth[4])
    f = 1.0 - cov
    tint = jnp.asarray(C.UMBRA_TINT, jnp.float32)
    eclipse_rgb = f[..., None] + cov[..., None] * tint
    earthshine = fp.earth[5] * jnp.maximum(
        jnp.sum(n_body * e_dir, axis=-1), 0.0)
    return eclipse_rgb, earthshine


def shade_lambert(albedo, n_body, p_body, fp: FrameParams, shadow,
                  sigma=None, bounce=None, view_db=None):
    """Diffuse shading with the area light's irradiance calibration.

    sigma: optional per-pixel normal-tilt stddev for roughness-compensated
    shading (see soft_ndotl). bounce: optional one-bounce terrain
    irradiance (ops.shadow_scan.bounce_from_parts units: adds to
    n.l * shadow before the irradiance scale — the stand-in for the
    reference's path-traced indirect segments, moon_renderer.py:441-445).
    view_db: per-pixel unit ray directions in the body frame; required for
    the lunar-Lambert blend (fp.lunar_blend), ignored otherwise."""
    light_body = mat3t_apply(fp.rotation, fp.light_pos)
    to_light = normalize(light_body - p_body)
    mu = jnp.sum(n_body * to_light, axis=-1)
    if sigma is None:
        ndotl = jnp.maximum(mu, 0.0)
    else:
        ndotl = jnp.where(sigma > 1e-6, soft_ndotl(mu, sigma),
                          jnp.maximum(mu, 0.0))
    if fp.lunar_blend is not None and view_db is not None:
        # lunar-Lambert (McEwen): L*2*mu0/(mu0+mu_e) + (1-L)*mu0, with
        # mu_e = cos(emission) = -n.view; L=0 degenerates to exact Lambert
        mu_e = jnp.maximum(-jnp.sum(n_body * view_db, axis=-1), 0.02)
        ls = 2.0 * ndotl / (ndotl + mu_e + 1e-6)
        ndotl = fp.lunar_blend * ls + (1.0 - fp.lunar_blend) * ndotl
    term = ndotl * shadow
    if bounce is not None:
        term = term + bounce
    rgb = albedo * (fp.irradiance * term)[..., None]
    ecl, earthshine = earth_light_terms(fp, p_body, n_body)
    if ecl is not None:
        rgb = rgb * ecl + albedo * (fp.irradiance * earthshine)[..., None]
    return rgb


def sun_disk_hit(eye, dirs_scene, fp: FrameParams):
    """Analytic visible-Sun-disk test in scene frame (flat white sphere,
    never shadow-casting; reference moon_renderer.py:499-502)."""
    oc = eye[None, None, :] - fp.sun_disk_center[None, None, :]
    b = jnp.sum(oc * dirs_scene, axis=-1)
    cc = jnp.sum(oc * oc, axis=-1) - fp.sun_disk_radius ** 2
    return (b * b - cc > 0.0) & (b < 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "h", "w", "displaced", "n_coarse"),
)
def render_frame(tex, albedo_tex, background, shadow_fn_args,
                 basis: CameraBasis, fp: FrameParams, jitter,
                 height: int, width: int, h: int, w: int,
                 h_min: float, h_mean: float = 1.0, displaced: bool = True,
                 n_coarse: int = 48, bounce_map=None) -> RenderOutput:
    """One full linear-HDR frame + hit buffer.

    background: (H, W, 3) pre-composited star background for this camera
    pose (host-resampled on camera change), or None for black.
    shadow_fn_args: optional (shadow_map, smap_params) from
    moonrtx_tpu.ops.shadow_scan; None disables cast shadows.
    bounce_map: optional one-bounce irradiance map on the same scan grid
    (shadow_scan.build_shadow_and_bounce); requires shadow_fn_args.
    """
    dirs_scene = ray_directions(basis, height, width, jitter)
    ob = mat3t_apply(fp.rotation, basis.eye)
    db = mat3t_apply(fp.rotation, dirs_scene)

    if displaced:
        hit, t_hit, lat, lon, p = intersect_heightfield(
            tex, h, w, h_min, ob, db, n_coarse=n_coarse)
    else:
        hit, t_hit, lat, lon, p = intersect_smooth_sphere(
            C.MOON_RADIUS * h_mean, ob, db)

    hs = sampler.sample_latlon(tex, lat, lon, h, w)
    if displaced:
        n_body = surface_normal(tex, h, w, lat, lon, hs)
    else:
        n_body = normalize(p)

    albedo = sampler.sample_latlon(albedo_tex, lat, lon, h, w)

    bounce = None
    if shadow_fn_args is not None:
        from moonrtx_tpu.ops.shadow_scan import shadow_lookup
        shadow_map, smap_params = shadow_fn_args
        shadow = shadow_lookup(shadow_map, smap_params, p)
        if bounce_map is not None:
            # same grid parametrization + night-side clamp as the shadow
            bounce = shadow_lookup(bounce_map, smap_params, p)
    else:
        shadow = jnp.ones_like(t_hit)

    rgb = shade_lambert(albedo, n_body, p, fp, shadow, bounce=bounce,
                        view_db=db)

    disk = sun_disk_hit(basis.eye, dirs_scene, fp)
    if background is None:
        miss_rgb = jnp.zeros((height, width, 3), jnp.float32)
    else:
        miss_rgb = background
    miss_rgb = jnp.where(disk[..., None], C.SUN_DISK_COLOR, miss_rgb)

    rgb = jnp.where(hit[..., None], rgb, miss_rgb)

    p_scene = mat3_apply(fp.rotation, p)
    hitbuf = jnp.concatenate(
        [jnp.where(hit[..., None], p_scene, 0.0),
         jnp.where(hit, t_hit, 0.0)[..., None]], axis=-1)
    return RenderOutput(rgb=rgb, hitbuf=hitbuf)


@jax.jit
def accumulate(accum, frame_rgb, n):
    """Running mean: accum + (frame - accum) / (n + 1)."""
    return accum + (frame_rgb - accum) / (n + 1.0)


@jax.jit
def tonemap(rgb_linear, exposure, gamma):
    """Exposure + gamma to display uint8 (reference moon_renderer.py:452-454)."""
    x = jnp.clip(rgb_linear * exposure, 0.0, 1.0)
    x = x ** (1.0 / gamma)
    return (x * 255.0 + 0.5).astype(jnp.uint8)
