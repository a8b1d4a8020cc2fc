"""Exact terminator shadows via a sun-aligned cylindrical-radius scan.

The TPU-native replacement for epsilon-tuned shadow-ray marching
(reference moon_renderer.py:62-76). For a distant sun along +z of a
sun-aligned frame, a surface point P is sunlit iff no point on its
sun-meridian (same azimuth phi, smaller colatitude theta) sticks out
further from the sun axis:

    lit(theta, phi)  <=>  m(theta, phi) > max_{theta' < theta} m(theta', phi)
    where m = r(theta, phi) * sin(theta)   (cylindrical radius)

— an exact shadow test with NO ray marching, NO self-intersection epsilon
and NO BVH, computed as one exclusive running max (associative scan) per
meridian: dense, vectorized, ideal for the TPU's VPU. Penumbra comes from
the horizon elevation angle of the tallest blocker relative to the solar
angular radius (annually varying, reference moon_renderer.py:659-663).

The scan grid is banded: coarse from the subsolar pole to 75 deg, fine
across the terminator band 75..105 deg where grazing shadows live; the
shadow-accuracy factor (1-20, reference main.py:88-92) scales the fine
band's resolution instead of slowing the whole render.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from moonrtx_tpu import constants as C
from moonrtx_tpu.engine.geometry import unit_to_latlon
from moonrtx_tpu.ops import sampler

BAND_SPLIT_DEG = 75.0
THETA_MAX_DEG = 105.0
PHI_PAD = 2  # wrapped azimuth columns


class ShadowMapParams(NamedTuple):
    axis_x: jnp.ndarray   # (3,) sun-frame x basis (body frame)
    axis_y: jnp.ndarray   # (3,)
    axis_z: jnp.ndarray   # (3,) unit sun direction (body frame)
    n_coarse: jnp.ndarray  # rows in [0, 75) deg
    n_fine: jnp.ndarray    # rows in [75, 105] deg
    n_phi: jnp.ndarray     # azimuth columns (unpadded)
    sun_ang_radius: jnp.ndarray  # radians


def _resolution(accuracy: int) -> tuple[int, int, int]:
    """(n_coarse, n_fine, n_phi) for a shadow-accuracy factor."""
    a = int(np.clip(accuracy, 1, 20))
    n_coarse = 256
    n_fine = int(np.clip(128 * a, 256, 2048))
    n_phi = 2048 if a < 5 else 4096
    return n_coarse, n_fine, n_phi


def _theta_grid(n_coarse: int, n_fine: int) -> np.ndarray:
    """Banded colatitude grid (degrees), coarse then fine, monotone."""
    coarse = np.linspace(0.0, BAND_SPLIT_DEG, n_coarse, endpoint=False)
    fine = np.linspace(BAND_SPLIT_DEG, THETA_MAX_DEG, n_fine)
    return np.concatenate([coarse, fine]).astype(np.float32)


def _theta_to_row(theta_deg, n_coarse, n_fine):
    """Fractional row index of a colatitude on the banded grid (jnp)."""
    in_coarse = theta_deg < BAND_SPLIT_DEG
    row_c = theta_deg / BAND_SPLIT_DEG * n_coarse
    row_f = (n_coarse
             + (theta_deg - BAND_SPLIT_DEG)
             / (THETA_MAX_DEG - BAND_SPLIT_DEG) * (n_fine - 1.0))
    return jnp.where(in_coarse, row_c, row_f)


def _argmax_combine(a, b):
    """Associative max-by-key on (m, z) pairs."""
    am, az = a
    bm, bz = b
    take_b = bm > am
    return jnp.where(take_b, bm, am), jnp.where(take_b, bz, az)


def _resample_heights_blocked(tex, h: int, w: int, row, col):
    """Resample heights at the scan-grid positions through per-block
    windows (one-hot MXU sampling) instead of an XLA gather: ~10x faster
    on TPU for the multi-megatexel fine band.

    row/col: (n_theta, n_phi) fractional source coordinates. Blocks of
    8x64 scan cells share one (40, 184) window; blocks whose footprint
    exceeds the window (near the subsolar pole, where azimuth circles
    collapse and the shadow factor is ~1 anyway) clamp."""
    BH, BW, WH_, WW_ = 8, 64, 40, 184
    n_theta, n_phi = row.shape
    nb = (n_theta // BH) * (n_phi // BW)

    def to_b(x):
        v = x.reshape(n_theta // BH, BH, n_phi // BW, BW)
        return jnp.moveaxis(v, 2, 1).reshape(nb, BH * BW)

    rb = to_b(row)
    cb = to_b(col)
    # seam-aware origins (cols may wrap through the padded region)
    c_min = jnp.min(cb, axis=1)
    c_max = jnp.max(cb, axis=1)
    spans = (c_max - c_min) > (w * 0.5)
    cb = jnp.where(spans[:, None] & (cb < w * 0.5), cb + w, cb)
    c_mid = 0.5 * (jnp.min(cb, axis=1) + jnp.max(cb, axis=1))
    r_mid = 0.5 * (jnp.min(rb, axis=1) + jnp.max(rb, axis=1))
    r0 = jnp.clip((r_mid - WH_ * 0.5).astype(jnp.int32), 0, h - WH_)
    c0 = jnp.clip((c_mid - WW_ * 0.5).astype(jnp.int32), 0,
                  tex.shape[1] - WW_)
    wins = sampler.extract_windows(tex, r0, c0, WH_, WW_)
    mean = jnp.mean(wins, axis=(1, 2))[:, None]
    vals = sampler.window_bilinear(wins - mean[..., None],
                                   rb - r0[:, None].astype(rb.dtype),
                                   cb - c0[:, None].astype(cb.dtype)) + mean
    v = vals.reshape(n_theta // BH, n_phi // BW, BH, BW)
    return jnp.moveaxis(v, 1, 2).reshape(n_theta, n_phi)


def scan_wedge(tex, sun_basis, sun_ang_radius, h: int, w: int,
               n_coarse: int, n_fine: int, n_phi_total: int,
               phi0, n_phi: int, blocked_resample: bool = False):
    """Scan an azimuth wedge [phi0, phi0 + n_phi) of the sun-frame grid.

    The running max along theta is local to each meridian, so wedges are
    embarrassingly parallel — this is the unit sharded over the device mesh
    (moonrtx_tpu.parallel.tiles.build_shadow_map_sharded)."""
    theta = jnp.asarray(np.deg2rad(_theta_grid(n_coarse, n_fine)))[:, None]
    phi = ((2 * np.pi) * (jnp.arange(n_phi, dtype=jnp.float32)[None, :]
                          + phi0 + 0.5) / n_phi_total)

    st, ct = jnp.sin(theta), jnp.cos(theta)
    dirs = (sun_basis[2][None, None, :] * ct[..., None]
            + sun_basis[0][None, None, :] * (st * jnp.cos(phi))[..., None]
            + sun_basis[1][None, None, :] * (st * jnp.sin(phi))[..., None])
    lat, lon = unit_to_latlon(dirs)
    row, col = sampler.latlon_to_rowcol(lat, lon, h, w)
    if blocked_resample:
        hs = _resample_heights_blocked(tex, h, w, row, col)
    else:
        hs = sampler.gather_bilinear(tex, row, col)   # (n_theta, n_phi)
    r = C.MOON_RADIUS * hs
    m = r * st
    z = r * ct

    # exclusive running max of (m, z) along theta (away from the sun pole)
    neg = jnp.full((1, n_phi), -1.0, m.dtype)
    m_pad = jnp.concatenate([neg, m[:-1]], axis=0)
    z_pad = jnp.concatenate([jnp.zeros((1, n_phi), z.dtype), z[:-1]], axis=0)
    m_max, z_at = jax.lax.associative_scan(_argmax_combine, (m_pad, z_pad), axis=0)

    # horizon elevation of the tallest blocker seen from each point
    dz = jnp.maximum(z_at - z, 1e-6)
    alpha = jnp.arctan2(m_max - m, dz)
    factor = jnp.clip(0.5 - alpha / (2.0 * sun_ang_radius), 0.0, 1.0)
    # subsolar cap: no blockers possible at theta ~ 0
    return jnp.where(m_max < 0.0, 1.0, factor)


@functools.partial(jax.jit, static_argnames=("h", "w", "n_coarse", "n_fine",
                                             "n_phi", "blocked_resample"))
def _build(tex, sun_basis, sun_ang_radius, h: int, w: int,
           n_coarse: int, n_fine: int, n_phi: int,
           blocked_resample: bool = True):
    factor = scan_wedge(tex, sun_basis, sun_ang_radius, h, w,
                        n_coarse, n_fine, n_phi, 0, n_phi,
                        blocked_resample=blocked_resample)
    # pad azimuth wrap columns for seam-free lookup
    return jnp.concatenate([factor, factor[:, :PHI_PAD]], axis=1)


def build_shadow_map(tex, h: int, w: int, sun_dir_body, sun_ang_radius: float,
                     accuracy: int = 10):
    """Build (shadow_map, ShadowMapParams) for the current sun direction.

    tex: padded heightfield mip; sun_dir_body: (3,) unit, body frame.
    Rebuilt on time change only; camera motion and accumulation reuse it.
    """
    n_coarse, n_fine, n_phi = _resolution(accuracy)
    z = sun_dir_body / jnp.linalg.norm(sun_dir_body)
    helper = jnp.where(jnp.abs(z[2]) < 0.9,
                       jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                       jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
    x = jnp.cross(helper, z)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(z, x)
    basis = jnp.stack([x, y, z])
    smap = _build(tex, basis, jnp.float32(sun_ang_radius), h, w,
                  n_coarse, n_fine, n_phi)
    params = ShadowMapParams(
        axis_x=x, axis_y=y, axis_z=z,
        n_coarse=jnp.float32(n_coarse), n_fine=jnp.float32(n_fine),
        n_phi=jnp.float32(n_phi), sun_ang_radius=jnp.float32(sun_ang_radius))
    return smap, params


def rowcol_of_points(params: ShadowMapParams, n_phi: int, p_body):
    """Fractional (row, col) scan-grid coordinates of body-frame points.

    Rows clamp to the grid; points past THETA_MAX land on the last row
    (whose scan value is deep-night 0 for any real terrain)."""
    zc = jnp.sum(p_body * params.axis_z, axis=-1)
    xc = jnp.sum(p_body * params.axis_x, axis=-1)
    yc = jnp.sum(p_body * params.axis_y, axis=-1)
    rho = jnp.sqrt(xc * xc + yc * yc)
    theta = jnp.rad2deg(jnp.arctan2(rho, zc))
    phi = jnp.arctan2(yc, xc) % (2 * np.pi)
    row = _theta_to_row(theta, params.n_coarse, params.n_fine)
    row = jnp.clip(row, 0.0, params.n_coarse + params.n_fine - 1.001)
    col = phi / (2 * np.pi) * n_phi - 0.5
    col = jnp.where(col < 0.0, col + n_phi, col)
    return row, col


def shadow_lookup(shadow_map, params: ShadowMapParams, p_body):
    """Sample the shadow factor at body-frame surface points (..., 3)
    (gather path; the blocked backend uses per-block shadow windows)."""
    n_phi = shadow_map.shape[1] - PHI_PAD
    row, col = rowcol_of_points(params, n_phi, p_body)
    zc = jnp.sum(p_body * params.axis_z, axis=-1)
    rho = jnp.sqrt(jnp.sum(p_body * p_body, axis=-1) - zc * zc)
    theta = jnp.rad2deg(jnp.arctan2(rho, zc))
    val = sampler.gather_bilinear(shadow_map, row, col)
    # beyond the scanned band it is deep night side
    return jnp.where(theta >= THETA_MAX_DEG, 0.0, val)
