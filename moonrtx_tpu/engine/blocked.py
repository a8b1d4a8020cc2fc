"""Blocked (windowed-MXU) render backend.

The TPU fast path. The image is tiled into 8x16-pixel blocks of 128 rays;
each block samples the heightfield through a small private window so every
bilinear fetch becomes a one-hot MXU contraction (ops.sampler.window_bilinear)
instead of a gather (TPUs have no gather hardware; measured ~70 M scalar
gathers/s vs >1 G one-hot samples/s on v5e).

Cache structure (what changes when):
* WindowOrigins + WindowCache — depend on camera pose, Moon orientation and
  mip level; rebuilt on camera/time change, reused across accumulation.
* ShadowWindows — depend additionally on the sun direction; rebuilt with the
  shadow map on time change.
* Per-frame: jittered rays, march, shading — pure math on cached windows.

This module is also the scaffolding for the fused Pallas kernel (same block
layout, same window geometry): the Pallas path replaces march+shade with an
in-VMEM kernel.
"""

from __future__ import annotations

import functools
import os
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
from moonrtx_tpu.engine.render import (
    FrameParams,
    RenderOutput,
    shade_lambert,
    sun_disk_hit,
)
from moonrtx_tpu.ops import sampler
from moonrtx_tpu.ops.sampler import latlon_to_rowcol, window_bilinear

# Block layout: 8x16 pixels = 128 rays per block. Blocks are ordered
# row-major; the fused Pallas kernel groups 8 horizontally-adjacent blocks
# (an 8x128-pixel strip) into one program so per-ray tensors fill the VPU's
# native (8, 128) registers with one window per sublane (batched MXU dots).
BLOCK_H = 8
BLOCK_W = 16
BLOCK = BLOCK_H * BLOCK_W
GROUP = 8             # blocks per Pallas program

# Window geometry (texels). Width pad on mips must be >= WIN_W + slack.
WIN_H = 40
WIN_W = 64
ALB_DOWN = 0          # albedo windows sample the same mip level as heights
AWIN_H = 40
AWIN_W = 64
SWIN_H = 32           # shadow-map window (scan-grid texels)
SWIN_W = 48


def to_blocks(img):
    """(H, W, ...) -> (NBLK, 128, ...) in block-row-major order."""
    h, w = img.shape[0], img.shape[1]
    rest = img.shape[2:]
    x = img.reshape(h // BLOCK_H, BLOCK_H, w // BLOCK_W, BLOCK_W, *rest)
    x = jnp.moveaxis(x, 2, 1)
    return x.reshape(-1, BLOCK, *rest)


def from_blocks(blocks, height: int, width: int):
    """Inverse of to_blocks ((NBLK, 128, ...) -> (H, W, ...))."""
    rest = blocks.shape[2:]
    x = blocks.reshape(height // BLOCK_H, width // BLOCK_W, BLOCK_H, BLOCK_W,
                       *rest)
    x = jnp.moveaxis(x, 1, 2)
    return x.reshape(height, width, *rest)


def composite_blocks(rgb_b, hit_b, t_b, p_b, height, width, dirs_scene,
                     eye, fp, background=None):
    """Blocks -> (rgb image, hitbuf): the shared tail of every render path.

    Misses take the sun disk over the background (black when None);
    hitbuf packs scene-frame hit position + distance. Used by the XLA
    blocked path, the fused pallas single/burst programs, and the
    sharded strip variants (which pass strip-local height and no
    background).
    """
    rgb = from_blocks(rgb_b, height, width)
    hit_img = from_blocks(hit_b, height, width)
    disk = sun_disk_hit(eye, dirs_scene, fp)
    miss_rgb = (jnp.zeros((height, width, 3), jnp.float32)
                if background is None else background)
    miss_rgb = jnp.where(disk[..., None], C.SUN_DISK_COLOR, miss_rgb)
    rgb = jnp.where(hit_img[..., None], rgb, miss_rgb)
    p_scene = mat3_apply(fp.rotation, from_blocks(p_b, height, width))
    t_img = from_blocks(t_b, height, width)
    hitbuf = jnp.concatenate(
        [jnp.where(hit_img[..., None], p_scene, 0.0),
         jnp.where(hit_img, t_img, 0.0)[..., None]], axis=-1)
    return rgb, hitbuf


def composite_kernel_outputs(r, g, b, hitf, t_hit, px, py, pz, height,
                             width, dirs_scene, eye, fp, background=None):
    """composite_blocks over raw (ns, G, B) pallas kernel planes."""
    nblk = (height // BLOCK_H) * (width // BLOCK_W)
    rgb_b = jnp.stack([r, g, b], axis=-1).reshape(nblk, BLOCK, 3)
    hit_b = hitf.reshape(nblk, BLOCK) > 0.5
    t_b = t_hit.reshape(nblk, BLOCK)
    p_b = jnp.stack([px, py, pz], axis=-1).reshape(nblk, BLOCK, 3)
    return composite_blocks(rgb_b, hit_b, t_b, p_b, height, width,
                            dirs_scene, eye, fp, background=background)


class RayGeom(NamedTuple):
    """Per-frame (jittered) ray state."""

    db: jnp.ndarray        # (NBLK, B, 3) body-frame ray dirs
    ob: jnp.ndarray        # (3,) body-frame eye
    t_enter: jnp.ndarray   # (NBLK, B)
    t_end: jnp.ndarray     # (NBLK, B)
    hit_outer: jnp.ndarray # (NBLK, B) bool
    dirs_scene: jnp.ndarray  # (H, W, 3) for the background/sun-disk pass
    # per-block local max-height bound the chords were clipped against
    # (from the maxmap sampling, or passed in pre-computed). Nearly
    # pose-local: the maxmap's 3x3 dilation over ~4 deg cells keeps a
    # cached bound conservative across time-step rotations, which
    # invalidate the window caches (and this) after ~0.25 deg anyway —
    # reusing it removes a 1.5M-index gather from every time step.
    h_bound: Optional[jnp.ndarray] = None


class WindowOrigins(NamedTuple):
    r0: jnp.ndarray   # (NBLK,) int32 height-window row origin (strided coords)
    c0: jnp.ndarray
    ar0: jnp.ndarray  # albedo-window origins (coarser mip, strided coords)
    ac0: jnp.ndarray
    q: jnp.ndarray    # (NBLK,) f32 per-block stride (1/2/4): blocks whose
                      # limb-stretched footprint exceeds the window sample a
                      # 2^k-coarser mip level through the same machinery
    sigma: jnp.ndarray  # (NBLK,) f32 normal-tilt stddev LOST at the block's
                        # stride level vs the render level; drives softened
                        # Lambert so mip-stride (LOD) seams carry no
                        # brightness step (zero for q == 1 blocks)


class WindowCache(NamedTuple):
    hwin: jnp.ndarray      # (NBLK, WIN_H, WIN_W) mean-centered heights
    hmean: jnp.ndarray     # (NBLK, 1) per-window mean height
    awin: jnp.ndarray      # (NBLK, AWIN_H, AWIN_W, 3)


# Sentinel: the sun-side shadow state lives only inside PackedWindows
# (produced by the fused time-step program render_timestep_pallas) — no
# standalone ShadowWindows exists for the current sun direction.
FUSED_SHADOW_STATE = object()


class ShadowWindows(NamedTuple):
    swin: jnp.ndarray      # (NBLK, SWIN_H, SWIN_W) shadow factor only, or
                           # (NBLK, SWIN_H, 2*SWIN_W) with the one-bounce
                           # irradiance map in columns [SWIN_W, 2*SWIN_W) —
                           # same grid, origins and stride for both halves
    sr0: jnp.ndarray
    sc0: jnp.ndarray
    sq: jnp.ndarray        # per-block stride into the shadow grid (1/2/4)


def _block_ray_dirs(basis: CameraBasis, height: int, width: int, jitter,
                    row_offset, full_height):
    """Ray directions generated directly in block layout (NBLK, B, 3) —
    no (H, W, 3) image array and no relayout (saves ~75 MB of traffic per
    sample in the accumulation loop)."""
    fh = height if full_height is None else full_height
    nblk = (height // BLOCK_H) * (width // BLOCK_W)
    wbk = width // BLOCK_W
    blk = jax.lax.broadcasted_iota(jnp.int32, (nblk, BLOCK), 0)
    ray = jax.lax.broadcasted_iota(jnp.int32, (nblk, BLOCK), 1)
    ys = ((blk // wbk) * BLOCK_H + ray // BLOCK_W).astype(jnp.float32)
    xs = ((blk % wbk) * BLOCK_W + ray % BLOCK_W).astype(jnp.float32)
    v = 1.0 - 2.0 * (ys + row_offset + 0.5 + jitter[0]) / fh
    u = (2.0 * (xs + 0.5 + jitter[1]) / width - 1.0) * (width / fh)
    d = (basis.forward[None, None, :]
         + basis.tan_half_fov * (u[..., None] * basis.right[None, None, :]
                                 + v[..., None] * basis.up[None, None, :]))
    return normalize(d)


@functools.partial(jax.jit, static_argnames=("height", "width", "full_height",
                                             "image_dirs"))
def block_rays(basis: CameraBasis, rotation, jitter,
               height: int, width: int, h_min: float,
               maxmap=None, h_bound=None, row_offset=0,
               full_height: int = None, image_dirs: bool = True) -> RayGeom:
    """Jittered rays + tightened shell-chord ranges (cheap; every frame).

    maxmap: optional dilated coarse max-height map (data.mips.coarse_max_map).
    Chords are clipped against the per-block local maximum surface radius:
    grazing limb rays shrink from the full bounding-sphere chord to the short
    segment that can actually contain hits — this both keeps window
    footprints bounded and concentrates the fixed marching steps.

    row_offset/full_height select a horizontal strip of a larger frame for
    image-tile sharding over a device mesh."""
    if image_dirs:
        dirs_scene = ray_directions(basis, height, width, jitter,
                                    row_offset=row_offset,
                                    full_height=full_height)
        db = mat3t_apply(rotation, to_blocks(dirs_scene))
    else:
        dirs_scene = None
        db = mat3t_apply(rotation, _block_ray_dirs(
            basis, height, width, jitter, row_offset, full_height))
    ob = mat3t_apply(rotation, basis.eye)

    hit_out, t_enter, t_exit_out = ray_sphere(ob, db, C.MOON_RADIUS)
    hit_in, t_in, _ = ray_sphere(ob, db, C.MOON_RADIUS * h_min * 0.999)
    t_enter = jnp.maximum(t_enter, 0.0)
    t_end = jnp.where(hit_in & (t_in > 0), t_in, t_exit_out)

    if maxmap is not None and h_bound is None:
        # per-block local height bound from a sparse chord sampling (16 rays
        # x 6 chord fractions per block on the dilated coarse map)
        mh, mw = maxmap.shape
        step = max(db.shape[1] // 16, 1)
        db_s = db[:, ::step]
        te_s = t_enter[:, ::step]
        tn_s = t_end[:, ::step]
        fr = jnp.linspace(0.0, 1.0, 6, dtype=jnp.float32)
        t_s = te_s[..., None] + (tn_s - te_s)[..., None] * fr
        p_s = ob + t_s[..., None] * db_s[..., None, :]
        lat_s, lon_s = unit_to_latlon(p_s)
        rows = jnp.clip(((90.0 - lat_s) / 180.0 * mh).astype(jnp.int32),
                        0, mh - 1)
        cols = jnp.clip((((lon_s + 180.0) % 360.0) / 360.0 * mw).astype(jnp.int32),
                        0, mw - 1)
        hs = jnp.take(maxmap.reshape(-1), rows * mw + cols)
        h_bound = jnp.max(hs.reshape(hs.shape[0], -1), axis=-1) + 2e-4
    if h_bound is not None:
        r_bound = C.MOON_RADIUS * jnp.minimum(h_bound, 1.0)[:, None]
        # clip the chord to the segment inside the local-max sphere
        b = jnp.sum(ob * db, axis=-1)
        cc = jnp.sum(ob * ob) - r_bound * r_bound
        disc = b * b - cc
        crosses = disc > 0.0
        s = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_enter = jnp.maximum(t_enter, jnp.where(crosses, -b - s, t_enter))
        t_end = jnp.minimum(t_end, jnp.where(crosses, -b + s, t_end))
        hit_out = hit_out & crosses & (t_end > t_enter)

    # inactive rays collapse to the block's mean chord so windows stay tight
    t_enter_m = jnp.where(hit_out, t_enter, jnp.nan)
    mean_enter = jnp.nan_to_num(
        jnp.nanmean(t_enter_m, axis=1, keepdims=True), nan=0.0)
    t_enter = jnp.where(hit_out, t_enter, mean_enter)
    t_end = jnp.where(hit_out, t_end, mean_enter)
    return RayGeom(db=db, ob=ob, t_enter=t_enter, t_end=t_end,
                   hit_outer=hit_out, dirs_scene=dirs_scene,
                   h_bound=h_bound)


# Shared with the shadow scan's blocked resample (ops.sampler owns the
# seam-aware footprint/origin logic so the two window machineries cannot
# drift apart).
_footprint = sampler.block_footprint
_origin_from_footprint = sampler.window_origin_from_footprint


@functools.partial(jax.jit, static_argnames=("h", "w", "mip_pad_w",
                                             "ah", "aw", "a_pad_w",
                                             "max_qexp"))
def window_origins(geom: RayGeom, h: int, w: int, mip_pad_w: int,
                   ah: int, aw: int, a_pad_w: int,
                   max_qexp: int = 2,
                   slope_maps=None) -> WindowOrigins:
    # Footprint from chord endpoints PLUS midpoint: the lat/lon track of a
    # grazing (limb) ray is an arc, and its mid-chord point can swing well
    # outside the endpoints' bounding box — without it, limb windows clamp
    # and whole 8x16 blocks shade from repeated edge texels.
    #
    # KNOWN LIMITATION (polar blocks): a block whose footprint contains a
    # geographic pole spans the entire longitude ring; no q <= 2^max_qexp
    # stride fits that into a 64-col window, so its out-of-window cells
    # clamp to the window edge and the terrain in the few pole-touching
    # blocks smears (the gather backend samples those exactly). Visible
    # only when zoomed onto a pole; a polar-cap reparametrization is the
    # real fix.
    t_mid = 0.5 * (geom.t_enter + geom.t_end)
    rcs = []
    for t in (geom.t_enter, t_mid, geom.t_end):
        lat_t, lon_t = unit_to_latlon(geom.ob + t[..., None] * geom.db)
        rcs.append(latlon_to_rowcol(lat_t, lon_t, h, w))
    rows = jnp.concatenate([rc[0] for rc in rcs], axis=1)
    cols = jnp.concatenate([rc[1] for rc in rcs], axis=1)

    # per-block stride: footprints wider than the window (limb obliquity)
    # drop to the 2^k-coarser mip through the same window machinery; q is
    # the smallest power of two that fits the footprint (capped at
    # 2^max_qexp by pyramid depth)
    _, _, r_span, c_span = _footprint(rows, cols, w)
    ratio = jnp.maximum(jnp.maximum(r_span / (WIN_H - 6.0),
                                    c_span / (WIN_W - 6.0)), 1.0)
    q = jnp.exp2(jnp.clip(jnp.ceil(jnp.log2(ratio)), 0.0, float(max_qexp)))
    rq = (rows + 0.5) / q[:, None] - 0.5
    cq = (cols + 0.5) / q[:, None] - 0.5
    r0, c0 = _origin_from_footprint(rq, cq, w / q, WIN_H, WIN_W,
                                    h / q, mip_pad_w / q)
    scale = (h / ah) * q
    ar0, ac0 = _origin_from_footprint(
        (rows + 0.5) / scale[:, None] - 0.5,
        (cols + 0.5) / scale[:, None] - 0.5,
        aw / q, AWIN_H, AWIN_W, ah / q, a_pad_w / q)

    if slope_maps is not None:
        # roughness lost by sampling level+qexp instead of the render level:
        # slope_maps (K, ch, cw) mean-squared-slope per level on a coarse
        # cell grid (data.mips.slope_sq_maps), K >= max_qexp + 1
        r_mid, c_mid, _, _ = _footprint(rows, cols, w)
        ch, cw = slope_maps.shape[1], slope_maps.shape[2]
        cr = jnp.clip((r_mid / h * ch).astype(jnp.int32), 0, ch - 1)
        cc = jnp.clip(((c_mid % w) / w * cw).astype(jnp.int32), 0, cw - 1)
        qexp = jnp.round(jnp.log2(q)).astype(jnp.int32)
        lost = slope_maps[0, cr, cc] - slope_maps[qexp, cr, cc]
        sigma = jnp.sqrt(jnp.maximum(lost, 0.0))
    else:
        sigma = jnp.zeros_like(q)
    return WindowOrigins(r0=r0, c0=c0, ar0=ar0, ac0=ac0, q=q, sigma=sigma)


def _pick_level_windows(levels, qexp, r0, c0, wh: int, ww: int,
                        scale: float = 1.0, offset: float = 0.0):
    """Extract a window per block from levels[qexp[blk]] (q = 2^qexp);
    origins are already in the block's own stride-level coordinates.
    Levels may be stored quantized (int16/uint8, value = raw*scale+offset);
    windows always come back decoded f32.

    TPU: one DMA pass over the block list, each block fetched from its
    own level in-kernel (ops.extract.extract_level_windows_tpu); 3-D maps
    go plane by plane. Elsewhere: per-level XLA extraction blended by
    level index."""
    from moonrtx_tpu.ops import extract as extract_ops

    if extract_ops._fast_ok() and levels[0].dtype in extract_ops._FAST_DTYPES:
        qi = jnp.clip(qexp, 0, len(levels) - 1)
        hs_ = jnp.asarray([lvl.shape[0] for lvl in levels], jnp.int32)
        ws_ = jnp.asarray([lvl.shape[1] for lvl in levels], jnp.int32)
        # lower clamp guarantees the Pallas kernel's non-negative-origin
        # precondition locally (levels smaller than the window would
        # otherwise DMA from a negative aligned origin — silent garbage)
        rk = jnp.maximum(jnp.minimum(r0, jnp.take(hs_, qi) - wh), 0)
        ck = jnp.maximum(jnp.minimum(c0, jnp.take(ws_, qi) - ww), 0)
        if levels[0].ndim == 3:
            nch = levels[0].shape[2]
            return jnp.stack(
                [extract_ops.extract_level_windows_tpu(
                    tuple(lvl[:, :, ch] for lvl in levels), qi, rk, ck,
                    wh, ww, scale=scale, offset=offset)
                 for ch in range(nch)], axis=-1)
        return extract_ops.extract_level_windows_tpu(
            tuple(levels), qi, rk, ck, wh, ww, scale=scale, offset=offset)

    out = None
    for k, lvl in enumerate(levels):
        rk = jnp.maximum(jnp.minimum(r0, lvl.shape[0] - wh), 0)
        ck = jnp.maximum(jnp.minimum(c0, lvl.shape[1] - ww), 0)
        wink = extract_ops.decode_affine(
            sampler.extract_windows(lvl, rk, ck, wh, ww), scale, offset)
        if out is None:
            out = wink
        else:
            sel = (qexp >= k).reshape((-1,) + (1,) * (wink.ndim - 1))
            out = jnp.where(sel, wink, out)
    return out


@functools.partial(jax.jit,
                   static_argnames=("h_scale", "h_offset", "a_scale"))
def extract_window_cache(mips, albedo_mips, org: WindowOrigins,
                         h_scale: float = 1.0, h_offset: float = 0.0,
                         a_scale: float = 1.0) -> WindowCache:
    """Extract per-block windows from the block's stride level.

    mips/albedo_mips: tuples of successively-coarser pyramid levels starting
    at the render level; a block with stride q = 2^k reads level index k.
    Quantized pyramids (int16 heights, uint8 albedo) decode through the
    affine h_scale/h_offset and a_scale — windows are always f32.

    On TPU, albedo windows come back in the fused kernel's channel-blocked
    packed layout (ns, GROUP*AWIN_H, 3*AWIN_W) — pack_pose_windows then
    has zero work to do; elsewhere the (nblk, AWIN_H, AWIN_W, 3) XLA
    layout is kept (shade_blocks handles both)."""
    from moonrtx_tpu.ops import extract as extract_ops

    qexp = jnp.round(jnp.log2(org.q)).astype(jnp.int32)
    if (extract_ops._fast_ok() and mips[0].dtype in extract_ops._FAST_DTYPES
            and albedo_mips[0].ndim == 3
            and albedo_mips[0].dtype in extract_ops._FAST_DTYPES):
        def _clamped(levels, r0, c0, wh, ww, qi):
            hs_ = jnp.asarray([l.shape[0] for l in levels], jnp.int32)
            ws_ = jnp.asarray([l.shape[1] for l in levels], jnp.int32)
            return (jnp.maximum(jnp.minimum(r0, jnp.take(hs_, qi) - wh), 0),
                    jnp.maximum(jnp.minimum(c0, jnp.take(ws_, qi) - ww), 0))

        qi = jnp.clip(qexp, 0, len(mips) - 1)
        rk, ck = _clamped(mips, org.r0, org.c0, WIN_H, WIN_W, qi)
        hwin = extract_ops.extract_group_windows_tpu(
            (tuple(mips),), qi, rk, ck, WIN_H, WIN_W,
            scales=(h_scale,), offsets=(h_offset,), group=GROUP)
        hwin = hwin.reshape(-1, GROUP, WIN_H, WIN_W).reshape(
            -1, WIN_H, WIN_W)
        aqi = jnp.clip(qexp, 0, len(albedo_mips) - 1)
        ark, ack = _clamped(albedo_mips, org.ar0, org.ac0,
                            AWIN_H, AWIN_W, aqi)
        planes = tuple(tuple(lvl[:, :, ch] for lvl in albedo_mips)
                       for ch in range(3))
        awin = extract_ops.extract_group_windows_tpu(
            planes, aqi, ark, ack, AWIN_H, AWIN_W,
            scales=(a_scale,) * 3, group=GROUP)
        hmean = jnp.mean(hwin, axis=(1, 2), keepdims=False)[:, None]
        return WindowCache(hwin=hwin - hmean[..., None], hmean=hmean,
                           awin=awin)

    hwin = _pick_level_windows(mips, qexp, org.r0, org.c0, WIN_H, WIN_W,
                               scale=h_scale, offset=h_offset)
    awin = _pick_level_windows(albedo_mips, qexp, org.ar0, org.ac0,
                               AWIN_H, AWIN_W, scale=a_scale)
    # Mean-center each height window: bilinear one-hot weights sum to 1, so
    # sample(win) == sample(win - mean) + mean EXACTLY, and the centered
    # residuals (~1e-3 of radius) survive the MXU's bf16 operand precision
    # with ~1e-5 relative error instead of quantizing absolute heights ~1.0
    # to 2**-8. This keeps the sampler on the fast single-pass MXU path.
    hmean = jnp.mean(hwin, axis=(1, 2), keepdims=False)[:, None]
    return WindowCache(hwin=hwin - hmean[..., None], hmean=hmean, awin=awin)


def _local_coords(lat, lon, h: int, w: int, r0, c0, q):
    """Window-local fractional coords in the block's stride level;
    seam-aware via padded columns."""
    row, col = latlon_to_rowcol(lat, lon, h, w)
    qb = q[:, None]
    row = (row + 0.5) / qb - 0.5
    col = (col + 0.5) / qb - 0.5
    col = jnp.where(col < c0[:, None].astype(col.dtype) - 0.5,
                    col + w / qb, col)
    return row - r0[:, None], col - c0[:, None]


def _sample_height(cache: WindowCache, lat, lon, h, w, org):
    wy, wx = _local_coords(lat, lon, h, w, org.r0, org.c0, org.q)
    return window_bilinear(cache.hwin, wy, wx) + cache.hmean


def march_blocks(cache: WindowCache, org: WindowOrigins, geom: RayGeom,
                 h: int, w: int, jitter_t, n_coarse: int = 24,
                 n_bisect: int = 8):
    """Bracket+bisect against cached windows; jitter_t dithers the coarse
    sample phase per accumulation frame."""
    ob = geom.ob
    db = geom.db
    span = geom.t_end - geom.t_enter

    def field(t):
        p = ob + t[..., None] * db
        lat, lon = unit_to_latlon(p)
        hs = _sample_height(cache, lat, lon, h, w, org)
        return jnp.linalg.norm(p, axis=-1) - C.MOON_RADIUS * hs

    def coarse(k, carry):
        found, t_lo, t_hi = carry
        frac = (k + jitter_t) / n_coarse
        t_k = geom.t_enter + span * frac
        f_k = field(t_k)
        newly = (~found) & (f_k < 0.0) & geom.hit_outer
        t_prev = geom.t_enter + span * jnp.maximum(frac - 1.0 / n_coarse, 0.0)
        return (found | newly,
                jnp.where(newly, t_prev, t_lo),
                jnp.where(newly, t_k, t_hi))

    found0 = jnp.zeros(db.shape[:2], bool)
    found, t_lo, t_hi = jax.lax.fori_loop(
        0, n_coarse + 1, coarse, (found0, geom.t_enter, geom.t_end))

    def bisect(_, carry):
        t_lo, t_hi = carry
        t_mid = 0.5 * (t_lo + t_hi)
        outside = field(t_mid) > 0.0
        return jnp.where(outside, t_mid, t_lo), jnp.where(outside, t_hi, t_mid)

    t_lo, t_hi = jax.lax.fori_loop(0, n_bisect, bisect, (t_lo, t_hi))
    t_hit = 0.5 * (t_lo + t_hi)
    p = ob + t_hit[..., None] * db
    lat, lon = unit_to_latlon(p)
    return found, t_hit, lat, lon, p


def normal_step_texels(p, db, t_hit, pix_ang, q, h: int):
    """Per-ray central-difference step in the block's stride-level texels.

    The step follows the ray's actual ground footprint (anisotropic
    filtering): step = half the arc one pixel spans on the surface. This is
    CONTINUOUS across per-block stride (q) boundaries — a fixed half-texel
    step at each block's own level produced a visible ~3% brightness seam
    between q levels at oblique view, because the stencil width (and with
    it the normal smoothing) jumped discretely."""
    p_unit = normalize(p)
    cosv = jnp.maximum(jnp.abs(jnp.sum(p_unit * db, axis=-1)), 0.05)
    arc = t_hit * pix_ang / (C.MOON_RADIUS * cosv)   # radians per pixel
    ft = arc * (h / jnp.pi)                          # level-0 lat texels
    return jnp.clip(0.5 * ft / q, 0.5, 3.0)


def shade_blocks(cache: WindowCache, org: WindowOrigins,
                 h: int, w: int, ah: int, aw: int,
                 lat, lon, p, fp: FrameParams, shadow,
                 geom: Optional[RayGeom] = None, t_hit=None,
                 pix_ang=None, bounce=None):
    """Normals from height windows, albedo from coarse windows, Lambert."""
    hs = _sample_height(cache, lat, lon, h, w, org)
    if pix_ang is not None and geom is not None and t_hit is not None:
        step = normal_step_texels(p, geom.db, t_hit, pix_ang,
                                  org.q[:, None], h)
    else:
        step = 0.5
    dlat = (180.0 / h) * org.q[:, None] * step
    coslat = jnp.maximum(jnp.cos(jnp.deg2rad(lat)), 0.05)
    dlon = dlat / coslat

    def spoint(la, lo):
        hv = _sample_height(cache, la, lo, h, w, org)
        return C.MOON_RADIUS * hv[..., None] * latlon_to_unit(la, lo)

    p_c = C.MOON_RADIUS * hs[..., None] * latlon_to_unit(lat, lon)
    n = jnp.cross(spoint(lat, lon + dlon) - spoint(lat, lon - dlon),
                  spoint(lat + dlat, lon) - spoint(lat - dlat, lon))
    n = normalize(n)
    n = jnp.where(jnp.sum(n * p_c, axis=-1, keepdims=True) < 0.0, -n, n)

    awy, awx = _local_coords(lat, lon, ah, aw, org.ar0, org.ac0, org.q)
    if cache.awin.ndim == 3:
        # packed channel-blocked layout (ns, GROUP*AWIN_H, 3*AWIN_W)
        aw3 = cache.awin.reshape(-1, GROUP, AWIN_H, 3 * AWIN_W).reshape(
            -1, AWIN_H, 3 * AWIN_W)
        albedo = jnp.stack(
            [window_bilinear(aw3[:, :, m * AWIN_W:(m + 1) * AWIN_W],
                             awy, awx) for m in range(3)], axis=-1)
    else:
        albedo = window_bilinear(cache.awin, awy, awx)
    return shade_lambert(albedo, n, p, fp, shadow,
                         sigma=org.sigma[:, None], bounce=bounce,
                         view_db=None if geom is None else geom.db)


# ---- shadow windows ---------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("out_dtype", "group"))
def build_shadow_windows(shadow_map, smap_params, geom: RayGeom,
                         bounce_map=None,
                         out_dtype=jnp.bfloat16,
                         group: int = GROUP) -> ShadowWindows:
    """Per-block windows into the sun-frame shadow map (rebuilt on time or
    camera change). Footprints from the chord endpoints + midpoint; blocks spanning
    more than a window sample a 2x-decimated copy of the map (the penumbra
    is smooth, so decimation is benign). bounce_map (same grid) shares the
    origins/stride; its windows sit in columns [SWIN_W, 2*SWIN_W).

    out_dtype (fast path only): the packed window dtype. bf16 is the
    shipped choice — the kernel samples swin as bf16 regardless, and the
    amortized A/B (tools/ab_amortized.py, docs/PERF.md round-5) measures
    the f32 variant's extra HBM traffic; the knob exists so that A/B
    stays runnable."""
    from moonrtx_tpu.ops import shadow_scan

    n_phi = shadow_map.shape[1] - shadow_scan.PHI_PAD
    t_mid = 0.5 * (geom.t_enter + geom.t_end)
    rcs = []
    for t in (geom.t_enter, t_mid, geom.t_end):
        p_t = geom.ob + t[..., None] * geom.db
        rcs.append(shadow_scan.rowcol_of_points(smap_params, n_phi, p_t))
    rows = jnp.concatenate([rc[0] for rc in rcs], axis=1)
    cols = jnp.concatenate([rc[1] for rc in rcs], axis=1)

    _, _, r_span, c_span = _footprint(rows, cols, n_phi)
    ratio = jnp.maximum(jnp.maximum(r_span / (SWIN_H - 4.0),
                                    c_span / (SWIN_W - 4.0)), 1.0)
    sq = jnp.exp2(jnp.clip(jnp.ceil(jnp.log2(ratio)), 0.0, 2.0))
    rq = (rows + 0.5) / sq[:, None] - 0.5
    cq = (cols + 0.5) / sq[:, None] - 0.5

    def _decimate(m):
        # reshape+reduce (stride-2 lane slicing is ~6x slower on TPU)
        m = m[: m.shape[0] // 2 * 2, : m.shape[1] // 2 * 2]
        return m.reshape(m.shape[0] // 2, 2, m.shape[1] // 2, 2).mean(
            axis=(1, 3))

    # The scan pads only PHI_PAD=2 wrap columns — not enough for a
    # 48-wide window at stride up to 4 (a seam-straddling block needs up
    # to (SWIN_W-4)*4 columns past phi=0, else its origin clamps and the
    # whole wrapped side samples the window edge: a band of wrong
    # penumbra/bounce along the sun-frame phi=0 meridian). Extend the
    # wrap to 4*SWIN_W base columns before cutting windows; +(~5-9)% map
    # copy once per rebuild.
    ext = min(4 * SWIN_W, n_phi)

    def _extend(m):
        return jnp.concatenate(
            [m, m[:, shadow_scan.PHI_PAD:ext]], axis=1)

    shadow_map = _extend(shadow_map)
    if bounce_map is not None:
        bounce_map = _extend(bounce_map)

    sr0, sc0 = _origin_from_footprint(
        rq, cq, n_phi / sq, SWIN_H, SWIN_W,
        shadow_map.shape[0] / sq, (n_phi + ext) / sq)
    sqexp = jnp.round(jnp.log2(sq)).astype(jnp.int32)

    from moonrtx_tpu.ops import extract as extract_ops
    if extract_ops._fast_ok():
        # grouped paired extraction straight to the fused kernel's bf16
        # shadow|bounce layout: GROUP blocks per program, all DMAs issued
        # before the first wait, both maps sharing origins — replaces two
        # per-block extraction passes plus a concat plus the pack-time
        # bf16 cast (the kernel samples swin as bf16 regardless)
        smap16 = shadow_map.astype(out_dtype)
        shalf = _decimate(smap16)
        slv = (smap16, shalf, _decimate(shalf))
        qi = jnp.clip(sqexp, 0, 2)
        hs_ = jnp.asarray([l.shape[0] for l in slv], jnp.int32)
        ws_ = jnp.asarray([l.shape[1] for l in slv], jnp.int32)
        rk = jnp.maximum(jnp.minimum(sr0, jnp.take(hs_, qi) - SWIN_H), 0)
        ck = jnp.maximum(jnp.minimum(sc0, jnp.take(ws_, qi) - SWIN_W), 0)
        if bounce_map is None:
            maps = (slv,)
        else:
            bmap16 = bounce_map.astype(out_dtype)
            bhalf = _decimate(bmap16)
            maps = (slv, (bmap16, bhalf, _decimate(bhalf)))
        packed = extract_ops.extract_group_windows_tpu(
            maps, qi, rk, ck, SWIN_H, SWIN_W, group=group,
            out_dtype=out_dtype)
        swin = packed.reshape(-1, group, SWIN_H,
                              len(maps) * SWIN_W).reshape(
            -1, SWIN_H, len(maps) * SWIN_W)
        return ShadowWindows(swin=swin, sr0=sr0, sc0=sc0, sq=sq)

    half = _decimate(shadow_map)
    quarter = _decimate(half)
    swin = _pick_level_windows((shadow_map, half, quarter), sqexp,
                               sr0, sc0, SWIN_H, SWIN_W)
    if bounce_map is None:
        # no bounce: keep swin at SWIN_W (half the memory); the uniform
        # 2*SWIN_W layout is restored at pack time for the pallas kernel
        return ShadowWindows(swin=swin, sr0=sr0, sc0=sc0, sq=sq)
    bhalf = _decimate(bounce_map)
    bwin = _pick_level_windows((bounce_map, bhalf, _decimate(bhalf)),
                               sqexp, sr0, sc0, SWIN_H, SWIN_W)
    return ShadowWindows(swin=jnp.concatenate([swin, bwin], axis=2),
                         sr0=sr0, sc0=sc0, sq=sq)


def lookup_shadow_windows(sw: ShadowWindows, smap_params, n_phi: int, p):
    """Sample (shadow, bounce) at body-frame points through the per-block
    windows (bounce is zeros when disabled)."""
    from moonrtx_tpu.ops import shadow_scan

    rows, cols = shadow_scan.rowcol_of_points(smap_params, n_phi, p)
    qb = sw.sq[:, None]
    rows = (rows + 0.5) / qb - 0.5
    cols = (cols + 0.5) / qb - 0.5
    cols = jnp.where(cols < sw.sc0[:, None].astype(cols.dtype) - 0.5,
                     cols + n_phi / qb, cols)
    # rows are stride coords: true row = (rows + 0.5) * qb - 0.5 (plain
    # rows * qb is off by 0.5*(qb-1), which for qb >= 2 kept the night
    # gate from ever firing — rowcol_of_points pre-clamps to total-1.001
    # — leaking last-row bounce light into the deep night side where the
    # pallas kernel and gather path correctly return 0)
    true_rows = (rows + 0.5) * qb - 0.5
    theta_ok = true_rows < shadow_scan_total_rows(smap_params) - 1.001
    wy = rows - sw.sr0[:, None]
    wx = cols - sw.sc0[:, None]
    val = window_bilinear(sw.swin[:, :, :SWIN_W], wy, wx)
    if sw.swin.shape[2] > SWIN_W:
        bval = jnp.where(theta_ok,
                         window_bilinear(sw.swin[:, :, SWIN_W:], wy, wx), 0.0)
    else:
        bval = jnp.zeros_like(val)
    return jnp.where(theta_ok, val, 0.0), bval


def shadow_scan_total_rows(smap_params):
    return smap_params.n_coarse + smap_params.n_fine


# ---- full frame -------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "height", "width", "h", "w", "ah", "aw", "n_phi", "n_coarse"))
def render_frame_blocked(cache: WindowCache, org: WindowOrigins,
                         geom: RayGeom,
                         shadow_windows: Optional[ShadowWindows],
                         smap_params,
                         background, basis: CameraBasis, fp: FrameParams,
                         jitter_t,
                         height: int, width: int, h: int, w: int,
                         ah: int, aw: int, n_phi: int = 0,
                         n_coarse: int = 24) -> RenderOutput:
    """Full frame from cached windows (the per-frame hot path)."""
    hit, t_hit, lat, lon, p = march_blocks(
        cache, org, geom, h, w, jitter_t, n_coarse=n_coarse)

    if shadow_windows is not None:
        shadow, bounce = lookup_shadow_windows(shadow_windows, smap_params,
                                               n_phi, p)
    else:
        shadow = jnp.ones_like(t_hit)
        bounce = None

    pix_ang = 2.0 * basis.tan_half_fov / height
    rgb_b = shade_blocks(cache, org, h, w, ah, aw, lat, lon, p, fp, shadow,
                         geom=geom, t_hit=t_hit, pix_ang=pix_ang,
                         bounce=bounce)
    rgb, hitbuf = composite_blocks(rgb_b, hit, t_hit, p, height, width,
                                   geom.dirs_scene, basis.eye, fp,
                                   background=background)
    return RenderOutput(rgb=rgb, hitbuf=hitbuf)


# ---- fused Pallas path ------------------------------------------------------

class PackedWindows(NamedTuple):
    """Kernel-layout window tensors (cached per pose alongside WindowCache)."""

    hwin: jnp.ndarray     # (NS, G*WIN_H, WIN_W)
    awin: jnp.ndarray     # (NS, G*AWIN_H, 3*AWIN_W) channel-major
    swin: jnp.ndarray     # (NS, G*SWIN_H, 2*SWIN_W) shadow | bounce halves
    scal: jnp.ndarray     # (NS, N_SCAL, G, B) lane-broadcast per-block scalars


def _pack_sun_parts(cache: WindowCache, org: WindowOrigins,
                    shadow_windows: Optional[ShadowWindows]):
    """(swin_packed, scal) — the sun-dependent (per time step) kernel
    tensors. Cheap relative to the pose pack (~1/7 of the bytes)."""
    nblk = cache.hwin.shape[0]
    ns = nblk // GROUP
    if shadow_windows is not None:
        sr0 = shadow_windows.sr0
        sc0 = shadow_windows.sc0
        sq = shadow_windows.sq
        swin = shadow_windows.swin
    else:
        sr0 = jnp.zeros((nblk,), jnp.int32)
        sc0 = jnp.zeros((nblk,), jnp.int32)
        sq = jnp.ones((nblk,), jnp.float32)
        swin = jnp.zeros((nblk, SWIN_H, 2 * SWIN_W), jnp.float32)
    if swin.shape[2] < 2 * SWIN_W:
        # bounce disabled: restore the kernel's uniform shadow|bounce layout
        swin = jnp.pad(swin, ((0, 0), (0, 0), (0, 2 * SWIN_W - swin.shape[2])))
    # the kernel samples swin as bf16 anyway; packing at bf16 halves the
    # dominant per-time-step HBM traffic (~200 MB at 1080p)
    swin = swin.astype(jnp.bfloat16)
    scal = jnp.stack([
        org.r0.astype(jnp.float32), org.c0.astype(jnp.float32),
        cache.hmean[:, 0], org.q,
        org.ar0.astype(jnp.float32), org.ac0.astype(jnp.float32),
        sr0.astype(jnp.float32), sc0.astype(jnp.float32),
        sq.astype(jnp.float32), org.sigma,
    ])
    n_scal = scal.shape[0]
    scal = scal.reshape(n_scal, ns, GROUP).transpose(1, 0, 2)
    scal = jnp.broadcast_to(scal[..., None], (ns, n_scal, GROUP, BLOCK))
    swin = swin.reshape(ns, GROUP * SWIN_H, 2 * SWIN_W)
    return swin, scal + 0.0


@jax.jit
def pack_pose_windows(cache: WindowCache):
    """(hwin_packed, awin_packed) — the pose-dependent (camera/level) kernel
    tensors; the heavy part of the repack (~0.7 GB at 1080p). Reused across
    time steps (a time step only moves the sun)."""
    nblk = cache.hwin.shape[0]
    ns = nblk // GROUP
    hwin = cache.hwin.reshape(ns, GROUP * WIN_H, WIN_W)
    if cache.awin.ndim == 3:
        # TPU extraction already emitted the packed channel-blocked layout
        return hwin + 0.0, cache.awin
    awin = jnp.moveaxis(cache.awin, 3, 2).reshape(nblk, AWIN_H, 3 * AWIN_W)
    awin = awin.reshape(ns, GROUP * AWIN_H, 3 * AWIN_W)
    return hwin + 0.0, awin + 0.0


@jax.jit
def pack_windows(cache: WindowCache, org: WindowOrigins,
                 shadow_windows: Optional[ShadowWindows]) -> PackedWindows:
    """Repack the blocked-backend caches into the fused kernel's layout.

    Run once per pose change; the per-frame path must not repack, and a
    time-only change should rebuild just the sun parts (_pack_sun_parts via
    build_shadow_state_from_maps) and reuse the pose tensors."""
    hwin, awin = pack_pose_windows(cache)
    swin, scal = _pack_sun_parts(cache, org, shadow_windows)
    return PackedWindows(hwin=hwin, awin=awin, swin=swin, scal=scal)


def _kernel_params(ob, fp: FrameParams, smap_params, use_shadow: bool,
                   pix_ang, ah: int, aw: int):
    from moonrtx_tpu.ops import pallas_march as pk

    light_body = mat3t_apply(fp.rotation, fp.light_pos)
    ahf, awf = jnp.float32(ah), jnp.float32(aw)
    lblend = (jnp.float32(0.0) if fp.lunar_blend is None
              else jnp.asarray(fp.lunar_blend, jnp.float32))
    if fp.earth is not None:
        ecl = [fp.earth[0], fp.earth[1], fp.earth[2], fp.earth[3],
               fp.earth[4], fp.sun_ang_radius, fp.earth[5]]
    else:
        ecl = [jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1.0),
               jnp.float32(1.0), jnp.float32(0.0), fp.sun_ang_radius,
               jnp.float32(0.0)]
    if use_shadow and smap_params is not None:
        params_list = [ob[0], ob[1], ob[2],
                       light_body[0], light_body[1], light_body[2],
                       fp.irradiance,
                       smap_params.n_coarse, smap_params.n_fine,
                       smap_params.n_phi,
                       smap_params.axis_z[0], smap_params.axis_z[1],
                       smap_params.axis_z[2],
                       smap_params.axis_x[0], smap_params.axis_x[1],
                       smap_params.axis_x[2], pix_ang, ahf, awf,
                       lblend] + ecl
    else:
        z = jnp.float32(0.0)
        params_list = [ob[0], ob[1], ob[2],
                       light_body[0], light_body[1], light_body[2],
                       fp.irradiance, z, z, jnp.float32(1.0),
                       z, z, jnp.float32(1.0), jnp.float32(1.0), z, z,
                       pix_ang, ahf, awf, lblend] + ecl
    return jnp.broadcast_to(
        jnp.stack([jnp.asarray(v, jnp.float32)
                   for v in params_list])[:, None, None],
        (pk.N_PARAMS, GROUP, BLOCK))


def _pallas_frame(packed: PackedWindows, geom: RayGeom, params,
                  background, basis: CameraBasis, fp: FrameParams,
                  height: int, width: int, h: int, w: int,
                  n_coarse: int, use_shadow: bool,
                  interpret: bool = False, n_bisect: int = 3
                  ) -> RenderOutput:
    from moonrtx_tpu.ops import pallas_march as pk

    nblk = geom.db.shape[0]
    ns = nblk // GROUP
    dbx = geom.db[..., 0].reshape(ns, GROUP, BLOCK)
    dby = geom.db[..., 1].reshape(ns, GROUP, BLOCK)
    dbz = geom.db[..., 2].reshape(ns, GROUP, BLOCK)
    t0 = geom.t_enter.reshape(ns, GROUP, BLOCK)
    t1 = geom.t_end.reshape(ns, GROUP, BLOCK)
    act = geom.hit_outer.astype(jnp.float32).reshape(ns, GROUP, BLOCK)

    r, g, b, hitf, t_hit, px, py, pz = pk.march_shade_pallas(
        params, dbx, dby, dbz, t0, t1, act, packed.scal,
        packed.hwin, packed.awin, packed.swin,
        h=h, w=w, n_coarse=n_coarse, n_bisect=n_bisect,
        use_shadow=use_shadow,
        use_earth=fp.earth is not None, interpret=interpret)

    rgb, hitbuf = composite_kernel_outputs(
        r, g, b, hitf, t_hit, px, py, pz, height, width,
        geom.dirs_scene, basis.eye, fp, background=background)
    return RenderOutput(rgb=rgb, hitbuf=hitbuf)


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "h", "w", "ah", "aw", "n_coarse", "use_shadow",
    "interpret"))
def render_frame_pallas(cache: WindowCache, org: WindowOrigins,
                        geom: RayGeom,
                        shadow_windows: Optional[ShadowWindows],
                        smap_params, background,
                        basis: CameraBasis, fp: FrameParams,
                        height: int, width: int, h: int, w: int,
                        ah: Optional[int] = None, aw: Optional[int] = None,
                        n_coarse: int = 16, use_shadow: bool = True,
                        interpret: bool = False) -> RenderOutput:
    """Single frame through the fused kernel (packs windows; for repeated
    samples use render_accumulate_pallas which packs once). ah/aw: the
    albedo level's shape when coarser than the height level."""
    packed = pack_windows(cache, org,
                          shadow_windows if use_shadow else None)
    params = _kernel_params(geom.ob, fp, smap_params, use_shadow,
                            2.0 * basis.tan_half_fov / height,
                            ah if ah is not None else h,
                            aw if aw is not None else w)
    return _pallas_frame(packed, geom, params, background, basis, fp,
                         height, width, h, w, n_coarse, use_shadow,
                         interpret)


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "h", "w", "ah", "aw", "n_coarse",
    "use_shadow", "interpret", "warm_start", "wide"))
def render_accumulate_pallas(packed: PackedWindows,
                             smap_params, background, maxmap,
                             basis: CameraBasis, fp: FrameParams,
                             jitters, height: int, width: int,
                             h: int, w: int, h_min: float,
                             ah: Optional[int] = None,
                             aw: Optional[int] = None,
                             n_samples: int = 8, n_coarse: int = 12,
                             use_shadow: bool = True,
                             interpret: bool = False, hbound=None,
                             warm_start: Optional[bool] = None,
                             wide: bool = True):
    """N jittered accumulation samples in ONE device program: per sample,
    jittered ray generation -> fused Pallas march+shade -> running mean.
    Returns (rgb_mean, hitbuf of sample 0).

    One dispatch per accumulation burst (one dispatch costs ~30 ms over the
    axon tunnel). Per-sample work is pared to ray generation + the fused
    kernel: the chord height bound is computed once (sub-pixel jitter moves
    chords far less than the bound's dilation margin), samples accumulate in
    block layout, and background/sun-disk/hit-buffer compositing runs once
    at the end."""
    return _burst_core(packed, smap_params, background, maxmap, basis, fp,
                       jitters, height, width, h, w, h_min,
                       ah if ah is not None else h,
                       aw if aw is not None else w,
                       n_samples, n_coarse, use_shadow, interpret,
                       hbound=hbound, warm_start=warm_start, wide=wide)


def _burst_core(packed: PackedWindows, smap_params, background, maxmap,
                basis: CameraBasis, fp: FrameParams, jitters,
                height: int, width: int, h: int, w: int, h_min: float,
                ah: int, aw: int, n_samples: int, n_coarse: int,
                use_shadow: bool, interpret: bool = False, hbound=None,
                warm_start: Optional[bool] = None, wide: bool = True):
    from moonrtx_tpu.ops import pallas_march as pk

    ob = mat3t_apply(fp.rotation, basis.eye)
    params = _kernel_params(ob, fp, smap_params, use_shadow,
                            2.0 * basis.tan_half_fov / height, ah, aw)

    geom0 = block_rays(basis, fp.rotation, jitters[0], height, width,
                       h_min, maxmap=maxmap, h_bound=hbound)
    nblk = geom0.db.shape[0]
    ns = nblk // GROUP
    # per-block bound for the jittered samples: block_rays keeps the one
    # it clipped geom0 against (computed from the maxmap, or the cached
    # pose-local bound passed in — see RayGeom.h_bound)
    h_bound = geom0.h_bound

    def run_kernel(geom, t_prev=None, f_prev=None):
        dbx = geom.db[..., 0].reshape(ns, GROUP, BLOCK)
        dby = geom.db[..., 1].reshape(ns, GROUP, BLOCK)
        dbz = geom.db[..., 2].reshape(ns, GROUP, BLOCK)
        t0 = geom.t_enter.reshape(ns, GROUP, BLOCK)
        t1 = geom.t_end.reshape(ns, GROUP, BLOCK)
        act = geom.hit_outer.astype(jnp.float32).reshape(ns, GROUP, BLOCK)
        return pk.march_shade_pallas(
            params, dbx, dby, dbz, t0, t1, act, packed.scal,
            packed.hwin, packed.awin, packed.swin,
            h=h, w=w, n_coarse=n_coarse, use_shadow=use_shadow,
            use_earth=fp.earth is not None, interpret=interpret,
            t_prev=t_prev, f_prev=f_prev, wide=wide)

    out0 = run_kernel(geom0)
    r0, g0, b0, hit0, t0_, px0, py0, pz0 = out0

    # warm-start default: on, unless the kill switch is set (trace-time
    # read; pass warm_start explicitly to A/B within one process)
    warm = (warm_start if warm_start is not None
            else os.environ.get("MOONRTX_NO_WARM_START") is None)

    def sample(i, carry):
        # samples >= 2 warm-start the march from the previous sample's
        # per-ray hit distance (pallas_march warm variant): strips whose
        # rays all re-bracket skip the 13-eval coarse loop
        ar, ag, ab, tp, fpv = carry
        geom = block_rays(basis, fp.rotation, jitters[i], height, width,
                          h_min, h_bound=h_bound, image_dirs=False)
        r, g, b, hitf, t_hit, *_ = run_kernel(
            geom, t_prev=tp if warm else None,
            f_prev=fpv if warm else None)
        k = i + 1.0
        return (ar + (r - ar) / k, ag + (g - ag) / k, ab + (b - ab) / k,
                t_hit, hitf)

    ar, ag, ab, _, _ = jax.lax.fori_loop(
        1, n_samples, sample, (r0, g0, b0, t0_, hit0))

    # composite once
    return composite_kernel_outputs(
        ar, ag, ab, hit0, t0_, px0, py0, pz0, height, width,
        geom0.dirs_scene, basis.eye, fp, background=background)


@jax.jit
def build_shadow_state_from_maps(smap, smap_params, geom: RayGeom,
                                 cache: WindowCache, org: WindowOrigins,
                                 bmap=None):
    """Shadow/bounce windows + sun-part repack from already-built maps:
    one device program for the geometry-dependent half of the shadow state.

    The maps themselves (shadow_scan.build_shadow_map /
    build_shadow_and_bounce) depend only on the sun direction and are a
    separate program, for two reasons: (1) a camera pose change at a fixed
    time rebuilds ONLY this half and reuses the cached maps (the scan +
    bounce pyramid is the expensive part of a rebuild); (2) a fused
    program that returns the scan output while ~16k per-block window
    slices consume it sends XLA's buffer analysis into a ~10-minute
    compile (measured CPU and TPU; split, each side compiles in seconds).

    Returns (ShadowWindows, swin_packed, scal); the caller combines
    swin/scal with its cached pose-packed hwin/awin (pack_pose_windows) —
    a time step never re-moves those ~0.7 GB."""
    sw = build_shadow_windows(smap, smap_params, geom, bounce_map=bmap)
    swin_packed, scal = _pack_sun_parts(cache, org, sw)
    return sw, swin_packed, scal


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "h", "w", "ah", "aw", "max_qexp",
    "n_coarse", "use_shadow", "interpret", "h_scale", "h_offset",
    "a_scale"))
def render_pose_pallas(mips, albedo_mips, slope_maps, smap, smap_params,
                       bmap, background, maxmap,
                       basis: CameraBasis, fp: FrameParams, jitters,
                       height: int, width: int, h: int, w: int,
                       ah: int, aw: int, h_min: float,
                       max_qexp: int = 2, n_samples: int = 8,
                       n_coarse: int = 12, use_shadow: bool = True,
                       interpret: bool = False, h_scale: float = 1.0,
                       h_offset: float = 0.0, a_scale: float = 1.0):
    """The pose-change hot path in ONE device program: window origins +
    cache extraction + pose/sun packing + shadow windows + the full
    accumulation burst (the same fusion the sharded strip uses,
    parallel/tiles.py). A camera move previously chained ~5 separate
    dispatches; everything after the (sun-cached) shadow maps is now one.

    Returns (rgb, hitbuf, org, cache, hwin_p, awin_p, swin_p, scal) so
    the caller can keep the caches for subsequent frames and time steps.
    """
    geom0 = block_rays(basis, fp.rotation, jitters[0], height, width,
                       h_min, maxmap=maxmap)
    org = window_origins(geom0, h, w, mips[0].shape[1], ah, aw,
                         albedo_mips[0].shape[1], max_qexp=max_qexp,
                         slope_maps=slope_maps)
    cache = extract_window_cache(mips, albedo_mips, org, h_scale=h_scale,
                                 h_offset=h_offset, a_scale=a_scale)
    sw = (build_shadow_windows(smap, smap_params, geom0, bounce_map=bmap)
          if use_shadow else None)
    hwin_p, awin_p = pack_pose_windows(cache)
    swin_p, scal = _pack_sun_parts(cache, org, sw)
    packed = PackedWindows(hwin=hwin_p, awin=awin_p, swin=swin_p, scal=scal)
    rgb, hitbuf = _burst_core(packed, smap_params, background, maxmap,
                              basis, fp, jitters, height, width, h, w,
                              h_min, ah, aw, n_samples, n_coarse,
                              use_shadow, interpret,
                              hbound=geom0.h_bound)
    return (rgb, hitbuf, org, cache, hwin_p, awin_p, swin_p, scal,
            geom0.h_bound)


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "h", "w", "ah", "aw", "n_coarse",
    "interpret"))
def render_timestep_pallas(smap, smap_params, bmap,
                           cache: WindowCache, org: WindowOrigins,
                           hwin_p, awin_p, background, maxmap,
                           basis: CameraBasis, fp: FrameParams, jitters,
                           height: int, width: int, h: int, w: int,
                           h_min: float, ah: int, aw: int,
                           n_samples: int = 8, n_coarse: int = 12,
                           interpret: bool = False, hbound=None):
    """The time-step (Q/W) hot path in ONE device program: shadow/bounce
    windows from the freshly-scanned maps + sun-side repack + the full
    accumulation burst. The maps (shadow_scan) stay separate programs —
    fusing a scan whose output feeds ~16k window slices blows up XLA's
    buffer analysis (docs/PERF.md) — but everything downstream of them is
    a single dispatch instead of three, which matters at ~30 ms of tunnel
    latency per dispatch.

    Returns (rgb_mean, hitbuf, swin_packed, scal) so the caller can cache
    the sun-side pack for subsequent pose-stable frames.

    hbound: cached pose-local per-block chord bound (RayGeom.h_bound) —
    skips the maxmap gather inside ray setup when supplied.
    """
    geom0 = block_rays(basis, fp.rotation, jitters[0], height, width,
                       h_min, maxmap=maxmap, h_bound=hbound)
    sw = build_shadow_windows(smap, smap_params, geom0, bounce_map=bmap)
    swin_p, scal = _pack_sun_parts(cache, org, sw)
    packed = PackedWindows(hwin=hwin_p, awin=awin_p, swin=swin_p, scal=scal)
    rgb, hitbuf = _burst_core(packed, smap_params, background, maxmap,
                              basis, fp, jitters, height, width, h, w,
                              h_min, ah, aw, n_samples, n_coarse, True,
                              interpret, hbound=geom0.h_bound)
    return rgb, hitbuf, swin_p, scal


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "h", "w", "ah", "aw", "sh", "sw",
    "n_coarse_scan", "n_fine", "n_phi", "n_coarse",
    "h_scale", "h_offset", "interpret"))
def render_timestep_scan_pallas(stex, bmap, sun_basis, sun_ang_radius,
                                cache: WindowCache, org: WindowOrigins,
                                hwin_p, awin_p, background, maxmap,
                                basis: CameraBasis, fp: FrameParams, jitters,
                                height: int, width: int, h: int, w: int,
                                h_min: float, ah: int, aw: int,
                                sh: int, sw: int,
                                n_coarse_scan: int, n_fine: int, n_phi: int,
                                n_samples: int = 1, n_coarse: int = 12,
                                h_scale: float = 1.0, h_offset: float = 0.0,
                                interpret: bool = False, hbound=None):
    """The drift-reuse time step (the common held-key Q/W step) in ONE
    device program: sun-frame shadow scan (factor only — the bounce map is
    the drift-reused cache, engine/scene.py BOUNCE_REUSE_DEG) + shadow/
    bounce windows + sun-side repack + the burst. One dispatch instead of
    two, which matters at ~20 ms of launch latency per program through the
    tunnel.

    The scan output feeds the GROUPED Pallas window extraction — a single
    opaque operand — so this fusion avoids the XLA buffer-analysis blowup
    that forbids fusing the scan with the ~16k-slice XLA window path or
    with the bounce pyramid (docs/PERF.md). Bounce-rebuild steps take the
    split-program path (shadow_scan.build_shadow_and_bounce +
    render_timestep_pallas).

    stex: the shadow-level heightfield mip; (sh, sw) its unpadded shape.
    Returns (rgb_mean, hitbuf, swin_packed, scal, smap, hs) — smap so the
    caller can cache it for pose-change reuse, hs (scan-grid heights) so a
    drift-threshold crossing can dispatch shadow_scan.bounce_refresh
    behind the frame without a second scan.
    """
    from moonrtx_tpu.ops import shadow_scan

    factor, hs = shadow_scan.scan_wedge(
        stex, sun_basis, sun_ang_radius, sh, sw,
        n_coarse_scan, n_fine, n_phi, 0, n_phi, blocked_resample=True,
        h_scale=h_scale, h_offset=h_offset, return_heights=True)
    smap = jnp.concatenate([factor, factor[:, :shadow_scan.PHI_PAD]],
                           axis=1)
    smap_params = shadow_scan.ShadowMapParams(
        axis_x=sun_basis[0], axis_y=sun_basis[1], axis_z=sun_basis[2],
        n_coarse=jnp.float32(n_coarse_scan), n_fine=jnp.float32(n_fine),
        n_phi=jnp.float32(n_phi),
        sun_ang_radius=jnp.asarray(sun_ang_radius, jnp.float32))
    rgb, hitbuf, swin_p, scal = render_timestep_pallas.__wrapped__(
        smap, smap_params, bmap, cache, org, hwin_p, awin_p, background,
        maxmap, basis, fp, jitters, height, width, h, w, h_min, ah, aw,
        n_samples=n_samples, n_coarse=n_coarse, interpret=interpret,
        hbound=hbound)
    return rgb, hitbuf, swin_p, scal, smap, hs
