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


def _decimate_tex(m):
    """Dtype-preserving 2x2 block mean. Quantized levels keep their
    affine encoding (the mean commutes with value = raw*scale+offset);
    the +-1 raw rounding step (~0.08 m) is far below the terrain scales
    that matter at decimated resolution."""
    m2 = m[: m.shape[0] // 2 * 2, : m.shape[1] // 2 * 2]
    if m2.dtype in (jnp.int16, jnp.uint8):
        acc = m2.astype(jnp.int32).reshape(
            m2.shape[0] // 2, 2, m2.shape[1] // 2, 2).sum(axis=(1, 3))
        return ((acc + 2) // 4).astype(m2.dtype)
    return m2.reshape(m2.shape[0] // 2, 2,
                      m2.shape[1] // 2, 2).mean(axis=(1, 3))


def _resample_heights_blocked(tex, h: int, w: int, row, col,
                              scale: float = 1.0, offset: float = 0.0,
                              group: int = 8):
    """Resample heights at the scan-grid positions through per-block
    windows (one-hot MXU sampling) instead of an XLA gather: ~10x faster
    on TPU for the multi-megatexel fine band. tex may be quantized
    (int16/uint8, value = raw*scale+offset); output is decoded f32.

    row/col: (n_theta, n_phi) fractional source coordinates. Blocks of
    8x64 scan cells share one (40, 184) window. A block's texture-column
    footprint grows as sin(theta)/cos(lat) on the equirect map — at
    production shadow levels (~2880x5760) it exceeds the window well
    before the poles — so blocks pick a 2x/4x-decimated source level
    exactly like the render windows (engine.blocked.window_origins); the
    penumbra is smooth, so decimated heights there cost ~nothing."""
    BH, BW, WH_, WW_ = 8, 64, 40, 184
    n_theta, n_phi = row.shape
    nb = (n_theta // BH) * (n_phi // BW)

    def to_b(x):
        v = x.reshape(n_theta // BH, BH, n_phi // BW, BW)
        return jnp.moveaxis(v, 2, 1).reshape(nb, BH * BW)

    rb = to_b(row)
    cb = to_b(col)

    # decimated levels are built from the unpadded circle, then given
    # fresh wrap columns (periodic, so decimate-then-wrap is exact);
    # levels smaller than the window are unusable (small test maps)
    def _wrapped(m):
        return jnp.concatenate(
            [m, m[:, : min(WW_ + 8, m.shape[1])]], axis=1)

    half = _decimate_tex(tex[:, :w])
    levels = [tex, _wrapped(half), _wrapped(_decimate_tex(half))]
    while len(levels) > 1 and (levels[-1].shape[0] < WH_
                               or levels[-1].shape[1] < WW_):
        levels.pop()
    levels = tuple(levels)
    max_qexp = len(levels) - 1.0

    _, _, r_span, c_span = sampler.block_footprint(rb, cb, w)
    ratio = jnp.maximum(jnp.maximum(r_span / (WH_ - 4.0),
                                    c_span / (WW_ - 4.0)), 1.0)
    qexp = jnp.clip(jnp.ceil(jnp.log2(ratio)),
                    0.0, max_qexp).astype(jnp.int32)
    q = jnp.exp2(qexp.astype(jnp.float32))
    rq = (rb + 0.5) / q[:, None] - 0.5
    cq = (cb + 0.5) / q[:, None] - 0.5
    hs_ = jnp.asarray([l.shape[0] for l in levels], jnp.int32)
    ws_ = jnp.asarray([l.shape[1] for l in levels], jnp.int32)
    r0, c0 = sampler.window_origin_from_footprint(
        rq, cq, w / q, WH_, WW_, jnp.take(hs_, qexp), jnp.take(ws_, qexp))
    # seam blocks: unwrap points left of the window origin (same
    # convention as the render/shadow window lookups)
    cq = jnp.where(cq < c0[:, None].astype(cq.dtype) - 0.5,
                   cq + (w / q)[:, None], cq)

    from moonrtx_tpu.ops import extract as extract_ops
    if (extract_ops._fast_ok() and nb % group == 0
            and tex.dtype in extract_ops._FAST_DTYPES):
        # fused extraction + bilinear in ONE kernel: aligned superwindow
        # DMA (grouped, overlapped) + in-VMEM bf16 one-hot MXU sampling,
        # writing only the (NBLK, B) values — the window+weight HBM
        # traffic of the split formulation dominated the whole scan
        # (55 of 77 ms at accuracy 10, docs/PERF.md)
        vals = extract_ops.resample_group_windows_tpu(
            levels, qexp, r0, c0,
            rq - r0[:, None].astype(rq.dtype),
            cq - c0[:, None].astype(cq.dtype),
            WH_, WW_, scale=scale, offset=offset, group=group)
    else:
        # per-level XLA extraction blended by level index (CPU path)
        per = [extract_ops.extract_windows(
            lvl, jnp.minimum(r0, lvl.shape[0] - WH_),
            jnp.minimum(c0, lvl.shape[1] - WW_), WH_, WW_,
            scale=scale, offset=offset) for lvl in levels]
        wins = per[-1]
        for li in range(len(per) - 2, -1, -1):
            wins = jnp.where((qexp == li)[:, None, None], per[li], wins)
        mean = jnp.mean(wins, axis=(1, 2))[:, None]
        # mean-centered residuals survive a bf16 row-mix (the call's
        # multi-GB intermediate at fine-band shapes) with ~4e-3 relative
        # error on values that are already ~1e-3 of the radius
        vals = sampler.window_bilinear(wins - mean[..., None],
                                       rq - r0[:, None].astype(rq.dtype),
                                       cq - c0[:, None].astype(cq.dtype),
                                       mix_dtype=jnp.bfloat16) + mean
    v = vals.reshape(n_theta // BH, n_phi // BW, BH, BW)
    return jnp.moveaxis(v, 1, 2).reshape(n_theta, n_phi)


def half_grid_ok(n_coarse: int, n_fine: int, n_phi: int) -> bool:
    """True when the half-resolution albedo-resample grid exists for this
    scan resolution (scan_wedge's fast alb path and bounce_refresh)."""
    return (n_coarse + n_fine) % 16 == 0 and n_phi % 128 == 0


def resample_alb_half(alb_lum, sun_basis, h: int, w: int,
                      n_coarse: int, n_fine: int,
                      n_phi_total: int, phi0, n_phi: int):
    """Albedo-luminance on the scan grid via a half-resolution resample +
    nearest upsample (the bounce emitter field is blurred over >= 2-cell
    scales, so half resolution is free accuracy-wise and halves the
    scan's second-largest memory pass)."""
    theta = jnp.asarray(np.deg2rad(_theta_grid(n_coarse, n_fine)))[:, None]
    th_h = 0.5 * (theta[0::2, 0] + theta[1::2, 0])[:, None]
    ph_h = ((2 * np.pi) * (2.0 * jnp.arange(n_phi // 2, dtype=jnp.float32)
                           [None, :] + phi0 + 1.0) / n_phi_total)
    st_h, ct_h = jnp.sin(th_h), jnp.cos(th_h)
    dirs_h = (sun_basis[2][None, None, :] * ct_h[..., None]
              + sun_basis[0][None, None, :] * (st_h * jnp.cos(ph_h))[..., None]
              + sun_basis[1][None, None, :] * (st_h * jnp.sin(ph_h))[..., None])
    lat_h, lon_h = unit_to_latlon(dirs_h)
    row_h, col_h = sampler.latlon_to_rowcol(lat_h, lon_h, h, w)
    alb_h = _resample_heights_blocked(alb_lum, h, w, row_h, col_h)
    # nearest upsample (no blur): keeps wedge-sharded scans seam-free
    return jnp.repeat(jnp.repeat(alb_h, 2, axis=0), 2, axis=1)


def scan_wedge(tex, sun_basis, sun_ang_radius, h: int, w: int,
               n_coarse: int, n_fine: int, n_phi_total: int,
               phi0, n_phi: int, blocked_resample: bool = False,
               alb_lum=None, h_scale: float = 1.0, h_offset: float = 0.0,
               return_heights: bool = False, resample_group: int = 8):
    """Scan an azimuth wedge [phi0, phi0 + n_phi) of the sun-frame grid.

    The running max along theta is local to each meridian, so wedges are
    embarrassingly parallel — this is the unit sharded over the device mesh
    (moonrtx_tpu.parallel.tiles.build_shadow_map_sharded).

    With alb_lum (an albedo-luminance map at the same (h, w) level, padded
    like tex), also returns the per-cell heights and resampled albedo for
    the one-bounce irradiance map (bounce_from_parts): returns
    (factor, heights, albedo_lum) instead of just factor. With
    return_heights (and no alb_lum), returns (factor, heights) — the
    heights feed an asynchronous bounce_refresh without a second scan."""
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
        hs = _resample_heights_blocked(tex, h, w, row, col,
                                       scale=h_scale, offset=h_offset,
                                       group=resample_group)
    else:
        from moonrtx_tpu.ops import extract as extract_ops
        # gather promotes raw int values per-fetch; decode commutes with
        # the bilinear because its weights sum to 1
        hs = extract_ops.decode_affine(
            sampler.gather_bilinear(tex, row, col), h_scale, h_offset)
    from moonrtx_tpu.ops import extract as extract_ops
    from moonrtx_tpu.ops import shadow_prefix
    if (blocked_resample and extract_ops._fast_ok()
            and shadow_prefix.prefix_ok(int(theta.shape[0]), n_phi)):
        # fused single-pass kernel: prefix max + penumbra factor, HBM
        # traffic = read heights + write factor (the XLA associative_scan
        # costs ~log2(n_theta) passes over (m, z) pairs)
        factor = shadow_prefix.shadow_factor_tpu(
            hs, st, ct, sun_ang_radius, C.MOON_RADIUS)
    else:
        r = C.MOON_RADIUS * hs
        m = r * st
        z = r * ct

        # exclusive running max of (m, z) along theta (away from the sun
        # pole)
        neg = jnp.full((1, n_phi), -1.0, m.dtype)
        m_pad = jnp.concatenate([neg, m[:-1]], axis=0)
        z_pad = jnp.concatenate([jnp.zeros((1, n_phi), z.dtype), z[:-1]],
                                axis=0)
        m_max, z_at = jax.lax.associative_scan(
            _argmax_combine, (m_pad, z_pad), axis=0)

        # horizon elevation of the tallest blocker seen from each point
        dz = jnp.maximum(z_at - z, 1e-6)
        alpha = jnp.arctan2(m_max - m, dz)
        factor = jnp.clip(0.5 - alpha / (2.0 * sun_ang_radius), 0.0, 1.0)
        # subsolar cap: no blockers possible at theta ~ 0
        factor = jnp.where(m_max < 0.0, 1.0, factor)
    if alb_lum is None:
        if return_heights:
            return factor, hs
        return factor
    n_theta = int(theta.shape[0])
    if blocked_resample and n_theta % 16 == 0 and n_phi % 128 == 0:
        alb_s = resample_alb_half(alb_lum, sun_basis, h, w, n_coarse,
                                  n_fine, n_phi_total, phi0, n_phi)
    elif blocked_resample:
        alb_s = _resample_heights_blocked(alb_lum, h, w, row, col)
    else:
        alb_s = sampler.gather_bilinear(alb_lum, row, col)
    return factor, hs, alb_s


def _box_blur(x, s: int):
    """(2s+1)-cell separable box mean; columns (phi) wrap, rows clamp.
    Shift-and-add (s is a small constant): columns via true rolls, rows
    via edge-clamped shifts — pure VPU traffic, no cumsum prefix passes
    (XLA's cumsum lowering measured ~10x slower here)."""
    inv = 1.0 / (2 * s + 1)
    acc = x
    for d in range(1, s + 1):
        acc = acc + jnp.roll(x, d, axis=1) + jnp.roll(x, -d, axis=1)
    x1 = acc * inv
    acc = x1
    for d in range(1, s + 1):
        up = jnp.concatenate([x1[d:], jnp.broadcast_to(
            x1[-1:], (d,) + x1.shape[1:])], axis=0)
        dn = jnp.concatenate([jnp.broadcast_to(
            x1[:1], (d,) + x1.shape[1:]), x1[:-d]], axis=0)
        acc = acc + up + dn
    return acc * inv


# one-bounce pyramid: per-level blur radius (cells), level count bound,
# smallest level size, and irradiance cap
BOUNCE_BLUR = 2
BOUNCE_MAX_LEVELS = 7
BOUNCE_MIN_SIZE = 16
BOUNCE_MAX = 0.5

# Mean radiosity of the sub-horizon band relative to the horizon
# blocker's: the sector estimate applies the radiosity AT the horizon
# (the lit wall top) to the whole band below it, but crater walls are
# lit from the rim down — their lower reaches are often shadowed —
# so the band average is about half the top. Calibrated against
# converged 2-bounce Monte Carlo on steep crafted-crater terrain
# (tools/gi_ground_truth.py, docs/GI.md): 0.5 centers the residual
# (rel err p95 0.59 vs 2.1 uncalibrated at the fast config).
BOUNCE_WALL_LIT_FRACTION = 0.5


def _decimate2(x):
    # reshape + reduce, NOT x[::2, ::2] sums: stride-2 lane slicing costs
    # ~6x more on TPU (measured 76 ms vs 13 ms on the full scan grid)
    r, c = x.shape
    return x.reshape(r // 2, 2, c // 2, 2).mean(axis=(1, 3))


def _decimate2_max(x):
    r, c = x.shape
    return x.reshape(r // 2, 2, c // 2, 2).max(axis=(1, 3))


def _shift_rows(x, d: int):
    """x shifted so cell i sees x[i - d] (edge rows clamp)."""
    if d == 0:
        return x
    if d > 0:
        return jnp.concatenate(
            [jnp.broadcast_to(x[:1], (d,) + x.shape[1:]), x[:-d]], axis=0)
    return jnp.concatenate(
        [x[-d:], jnp.broadcast_to(x[-1:], (-d,) + x.shape[1:])], axis=0)


def _sector_collapse(hs, rad, theta0, dphi, n_levels: int):
    """Directional-sector horizon machinery shared by every bounce pass.

    For each of EIGHT azimuthal sectors (+-theta, +-phi and the four
    diagonals — 45 deg each), estimate the horizon angle on a dyadic
    pyramid (run doubles per level) and carry the radiosity of the
    blocker that sets it; collapse coarse -> fine per sector by the
    largest horizon angle (sin^2 alpha). `rad` is the emitter radiosity
    field; returns (s2_acc (8, nt, np), j_acc (8, nt, np)) — the
    per-sector irradiance estimate is sum_d s2_d * J_d / n_sectors.

    Eight sectors (round-5 verdict item 2; was four at round 4): the
    90-deg sectors were one of the two named residual-error sources —
    a wall occupying half of a quadrant was either counted as the whole
    quadrant or missed by it. 45-deg sectors halve that discretization;
    measured corr vs Monte Carlo (docs/GI.md)."""
    s = BOUNCE_BLUR
    theta_k, h_k, hx_k, rad_k = theta0, hs, hs, rad
    contributions = []  # per level: (s2 (8,nt,np), J (8,nt,np))
    for k in range(n_levels):
        dth_k = jnp.asarray(np.maximum(np.gradient(theta_k), 1e-6)
                            .astype(np.float32))[:, None]
        st_k = jnp.asarray(np.sin(theta_k).astype(np.float32))[:, None]
        # blocker run per axis (radians of arc ~ length/R); phi extent
        # clamped near the subsolar pole where cells are pencil-thin
        dl_phi = jnp.clip(dphi * (2 ** k) * st_k, dth_k * 0.25, dth_k * 4.0)
        rad_b = _box_blur(rad_k, s)
        h_blk = 0.5 * (hx_k + h_k)
        # Per-level, per-sector estimates. Blocker height = the mean of
        # the max-decimated and mean-decimated pyramids: the block max
        # alone up-biases the rise (a sub-cell peak anywhere in the 2^k
        # block reads as a wall at the tap distance — ground truth
        # measured ~+40% from it), the mean alone dilutes crater rims to
        # nothing (measured ~10x under); the blend tracked Monte Carlo
        # best (docs/GI.md).
        run_diag = jnp.sqrt(dth_k * dth_k + dl_phi * dl_phi)
        sector_s2, sector_j = [], []
        for dth, dph, run in ((s, 0, dth_k), (-s, 0, dth_k),
                              (0, s, dl_phi), (0, -s, dl_phi),
                              (s, s, run_diag), (s, -s, run_diag),
                              (-s, s, run_diag), (-s, -s, run_diag)):
            def shift(x, mul, _dt=dth, _dp=dph):
                if _dp:
                    x = jnp.roll(x, mul * _dp, axis=1)
                return _shift_rows(x, mul * _dt) if _dt else x
            # two taps per level (s and 2s cells): the 2s tap sees the
            # mid-octave blocker distance at THIS level's resolution —
            # level k+1 covers the same distance but through another 2x
            # decimation blur. Per (level, sector), keep the tap with the
            # steeper horizon (the single-tap-per-level gap was the other
            # named residual-error source in docs/GI.md round 4).
            t1 = jnp.maximum(shift(h_blk, 1) - h_k, 0.0) / (s * run)
            t2 = jnp.maximum(shift(h_blk, 2) - h_k, 0.0) / (2 * s * run)
            s2_1 = t1 * t1 / (1.0 + t1 * t1)
            s2_2 = t2 * t2 / (1.0 + t2 * t2)
            far = s2_2 > s2_1
            sector_s2.append(jnp.where(far, s2_2, s2_1))
            sector_j.append(jnp.where(far, shift(rad_b, 2),
                                      shift(rad_b, 1)))
        contributions.append((jnp.stack(sector_s2), jnp.stack(sector_j)))
        if k + 1 < n_levels:
            theta_k = 0.5 * (theta_k[::2] + theta_k[1::2])
            h_k = _decimate2(h_k)
            hx_k = _decimate2_max(hx_k)
            rad_k = _decimate2(rad_k)

    # collapse coarse -> fine PER SECTOR by the largest horizon ANGLE
    # (sin^2 alpha), carrying THAT blocker's radiosity — the horizon is
    # the scale with the steepest rise, and the light comes from the wall
    # that sets it. Upsample 2x (nearest + 1-cell box smoothing); sectors
    # only combine at the end (a wall far to the east must not override
    # the open sky to the west).
    s2_acc, j_acc = contributions[-1]
    for k in range(n_levels - 2, -1, -1):
        def up(a):
            a = jnp.repeat(jnp.repeat(a, 2, axis=1), 2, axis=2)
            return jax.vmap(lambda x: _box_blur(x, 1))(a)
        s2_acc, j_acc = up(s2_acc), up(j_acc)
        s2_f, j_f = contributions[k]
        take_f = s2_f > s2_acc
        s2_acc = jnp.where(take_f, s2_f, s2_acc)
        j_acc = jnp.where(take_f, j_f, j_acc)
    return s2_acc, j_acc


def bounce_from_parts(hs, factor, alb_s, n_coarse: int, n_fine: int,
                      n_phi: int, n_bounces: int = 1):
    """Terrain interreflection map on the scan grid (1 or 2 bounces).

    The TPU-native stand-in for the reference's 2-4-segment path tracing
    (moon_renderer.py:441-445): instead of stochastic bounce rays per pixel,
    a dense radiosity estimate on the sun-frame grid, rebuilt with the
    shadow map once per time step and sampled per pixel like the shadow
    factor.

    Physics: E = (1/2pi) * integral_phi J(phi) sin^2(alpha(phi)) dphi —
    a Lambertian emitter band below elevation angle alpha(phi) delivers
    J sin^2(alpha) per azimuth (integrate L*cos over the sub-alpha band).
    The azimuth integral is split into EIGHT directional 45-deg sectors,
    each with its own horizon estimate and emitter radiosity:
    E = (1/8) sum_d J_d sin^2(alpha_d). An isotropic (full-azimuth)
    horizon was the round-4 ground-truth finding: it treats a one-sided
    crater wall as an enclosing ring and overestimated steep-terrain
    bounce ~10x vs converged Monte Carlo path tracing
    (tools/gi_ground_truth.py, docs/GI.md); the sector split measures the
    wall only in the sector it occupies. Per cell: J = albedo * n.l *
    lit, with n.l from scan-grid height slopes — sun-facing crater walls
    near the terminator are the dominant emitters. Units match the
    shading path: the renderer computes irradiance*(n.l*shadow + bounce).

    n_bounces=2 (reference parity: path_seg_range up to two terrain
    bounces, moon_renderer.py:445) adds the second-order term through a
    second sector/horizon collapse whose emitters re-radiate the first
    bounce they receive, J2 = albedo * E1. The horizon-geometry half
    (the sin^2 alpha pyramids) is a pure function of the heights, so the
    two passes' geometry subexpressions are structurally identical and
    XLA CSE shares them; the genuinely new work is the J2 radiosity
    pyramid + its collapse. Ground truth measures the term at ~5% of the
    indirect signal (docs/GI.md second-bounce row), which is why 1 is
    the default.
    """
    theta0 = np.deg2rad(_theta_grid(n_coarse, n_fine)).astype(np.float32)
    dphi = 2.0 * np.pi / n_phi
    st0 = np.sin(theta0).astype(np.float32)
    ct0 = jnp.asarray(np.cos(theta0))[:, None]
    dth0 = np.gradient(theta0).astype(np.float32)

    # terrain n.l toward the sun (+z of the sun frame) from grid slopes:
    # n ~ r_hat - s_th theta_hat - s_ph phi_hat, z.r_hat = cos(theta),
    # z.theta_hat = -sin(theta)  =>  n.z ~ cos + s_th*sin (normalized)
    s_th = jnp.gradient(hs, axis=0) / (jnp.asarray(dth0)[:, None] * hs)
    # phi is periodic: wrapped central differences (jnp.gradient would use
    # one-sided differences at the two seam columns, leaving a line of
    # wrong n.l — hence wrong bounce light — along the sun-frame phi=0
    # meridian; _box_blur already wraps via roll)
    dh_ph = 0.5 * (jnp.roll(hs, -1, axis=1) - jnp.roll(hs, 1, axis=1))
    s_ph = dh_ph / (
        dphi * jnp.asarray(np.maximum(st0, 0.05))[:, None] * hs)
    ndl = (ct0 + s_th * jnp.asarray(st0)[:, None]) * jax.lax.rsqrt(
        1.0 + s_th * s_th + s_ph * s_ph)
    rad = alb_s * jnp.clip(ndl, 0.0, 1.0) * factor

    n_theta = n_coarse + n_fine
    n_levels = 1
    while (n_levels < BOUNCE_MAX_LEVELS
           and n_theta % (2 ** n_levels) == 0
           and n_phi % (2 ** n_levels) == 0
           and min(n_theta, n_phi) // (2 ** n_levels) >= BOUNCE_MIN_SIZE):
        n_levels += 1

    scale = BOUNCE_WALL_LIT_FRACTION / 8.0
    s2_acc, j_acc = _sector_collapse(hs, rad, theta0, dphi, n_levels)
    e1 = scale * jnp.sum(s2_acc * j_acc, axis=0)
    if n_bounces < 2:
        return jnp.clip(e1, 0.0, BOUNCE_MAX)
    # second pass: emitters re-radiate the first bounce they receive
    # (J2 = albedo * E1); the horizon-geometry subexpressions are
    # identical to pass 1's and shared by XLA CSE.
    s2_acc2, j2_acc = _sector_collapse(hs, alb_s * e1, theta0, dphi,
                                       n_levels)
    e2 = scale * jnp.sum(s2_acc2 * j2_acc, axis=0)
    return jnp.clip(e1 + e2, 0.0, BOUNCE_MAX)


@functools.partial(jax.jit, static_argnames=("h", "w", "n_coarse", "n_fine",
                                             "n_phi", "blocked_resample",
                                             "h_scale", "h_offset"))
def _build(tex, sun_basis, sun_ang_radius, h: int, w: int,
           n_coarse: int, n_fine: int, n_phi: int,
           blocked_resample: bool = True,
           h_scale: float = 1.0, h_offset: float = 0.0):
    factor = scan_wedge(tex, sun_basis, sun_ang_radius, h, w,
                        n_coarse, n_fine, n_phi, 0, n_phi,
                        blocked_resample=blocked_resample,
                        h_scale=h_scale, h_offset=h_offset)
    # pad azimuth wrap columns for seam-free lookup
    return jnp.concatenate([factor, factor[:, :PHI_PAD]], axis=1)


@functools.partial(jax.jit, static_argnames=("h", "w", "n_coarse", "n_fine",
                                             "n_phi", "blocked_resample",
                                             "h_scale", "h_offset"))
def _build_aux(tex, alb_lum, sun_basis, sun_ang_radius,
               h: int, w: int, n_coarse: int, n_fine: int,
               n_phi: int, blocked_resample: bool = True,
               h_scale: float = 1.0, h_offset: float = 0.0):
    """Scan + the raw per-cell aux grids the bounce map needs.

    The bounce pyramid runs in a SEPARATE program (_bounce_jit): fusing it
    with the scan sends XLA into a minutes-long compile at full shapes
    (same class of blowup as engine/blocked.py::build_shadow_state_from_maps
    documents), while each side alone compiles in seconds."""
    factor, hs, alb_s = scan_wedge(tex, sun_basis, sun_ang_radius, h, w,
                                   n_coarse, n_fine, n_phi, 0, n_phi,
                                   blocked_resample=blocked_resample,
                                   alb_lum=alb_lum,
                                   h_scale=h_scale, h_offset=h_offset)
    return (jnp.concatenate([factor, factor[:, :PHI_PAD]], axis=1),
            hs, alb_s)


@functools.partial(jax.jit, static_argnames=("n_coarse", "n_fine", "n_phi",
                                             "n_bounces"))
def _bounce_jit(smap, hs, alb_s, n_coarse: int, n_fine: int, n_phi: int,
                n_bounces: int = 1):
    factor = smap[:, :n_phi]
    bounce = bounce_from_parts(hs, factor, alb_s, n_coarse, n_fine, n_phi,
                               n_bounces=n_bounces)
    return jnp.concatenate([bounce, bounce[:, :PHI_PAD]], axis=1)


@functools.partial(jax.jit, static_argnames=("h", "w", "n_coarse", "n_fine",
                                             "n_phi", "n_bounces"))
def bounce_refresh(smap, hs, alb_lum, sun_basis, h: int, w: int,
                   n_coarse: int, n_fine: int, n_phi: int,
                   n_bounces: int = 1):
    """Rebuild the one-bounce irradiance map from an already-scanned
    (smap, hs) pair: half-res albedo resample + the bounce pyramid in ONE
    program. Dispatched asynchronously BEHIND a rendered frame (the
    drift-reuse threshold crossing, engine/scene.py BOUNCE_REUSE_DEG), it
    reuses the frame's own scan instead of paying a second one — the
    held-key Q/W animation never waits on the bounce pyramid.

    Requires half_grid_ok(n_coarse, n_fine, n_phi)."""
    alb_s = resample_alb_half(alb_lum, sun_basis, h, w, n_coarse, n_fine,
                              n_phi, 0, n_phi)
    factor = smap[:, :n_phi]
    bounce = bounce_from_parts(hs, factor, alb_s, n_coarse, n_fine, n_phi,
                               n_bounces=n_bounces)
    return jnp.concatenate([bounce, bounce[:, :PHI_PAD]], axis=1)


def sun_frame_basis(sun_dir_body):
    """Orthonormal (x, y, z) with z = unit sun direction (body frame)."""
    z = sun_dir_body / jnp.linalg.norm(sun_dir_body)
    helper = jnp.where(jnp.abs(z[2]) < 0.9,
                       jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                       jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
    x = jnp.cross(helper, z)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(z, x)
    return x, y, z


def build_shadow_map(tex, h: int, w: int, sun_dir_body, sun_ang_radius: float,
                     accuracy: int = 10,
                     h_scale: float = 1.0, h_offset: float = 0.0):
    """Build (shadow_map, ShadowMapParams) for the current sun direction.

    tex: padded heightfield mip (f32 or quantized int16 with affine
    h_scale/h_offset); sun_dir_body: (3,) unit, body frame.
    Rebuilt on time change only; camera motion and accumulation reuse it.
    """
    n_coarse, n_fine, n_phi = _resolution(accuracy)
    x, y, z = sun_frame_basis(sun_dir_body)
    basis = jnp.stack([x, y, z])
    smap = _build(tex, basis, jnp.float32(sun_ang_radius), h, w,
                  n_coarse, n_fine, n_phi,
                  h_scale=h_scale, h_offset=h_offset)
    params = ShadowMapParams(
        axis_x=x, axis_y=y, axis_z=z,
        n_coarse=jnp.float32(n_coarse), n_fine=jnp.float32(n_fine),
        n_phi=jnp.float32(n_phi), sun_ang_radius=jnp.float32(sun_ang_radius))
    return smap, params


def build_shadow_and_bounce(tex, alb_lum, h: int, w: int, sun_dir_body,
                            sun_ang_radius: float, accuracy: int = 10,
                            h_scale: float = 1.0, h_offset: float = 0.0,
                            n_bounces: int = 1):
    """build_shadow_map plus the indirect-light irradiance map on the same
    grid: returns (shadow_map, ShadowMapParams, bounce_map). Two device
    programs (scan+aux, then the bounce pyramid) — see _build_aux."""
    n_coarse, n_fine, n_phi = _resolution(accuracy)
    x, y, z = sun_frame_basis(sun_dir_body)
    basis = jnp.stack([x, y, z])
    smap, hs, alb_s = _build_aux(tex, alb_lum, basis,
                                 jnp.float32(sun_ang_radius), h, w,
                                 n_coarse, n_fine, n_phi,
                                 h_scale=h_scale, h_offset=h_offset)
    bmap = _bounce_jit(smap, hs, alb_s, n_coarse, n_fine, n_phi,
                       n_bounces=n_bounces)
    params = ShadowMapParams(
        axis_x=x, axis_y=y, axis_z=z,
        n_coarse=jnp.float32(n_coarse), n_fine=jnp.float32(n_fine),
        n_phi=jnp.float32(n_phi), sun_ang_radius=jnp.float32(sun_ang_radius))
    return smap, params, bmap


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
