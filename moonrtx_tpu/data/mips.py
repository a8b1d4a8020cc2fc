"""Mip pyramids for the HBM-resident heightfield.

TPU-first replacement for the reference's destructive --downscale
preprocessing (reference data_loader.py:169-175, SURVEY.md section 5
"long context" note): instead of throwing resolution away up front, the
full map is kept with a chain of 2x block-mean levels; the renderer picks
the level whose texel footprint matches the screen-pixel footprint, so the
sampled working set is always ~O(pixels) regardless of zoom.
"""

from __future__ import annotations

import numpy as np


def block_mean(a: np.ndarray, factor: int) -> np.ndarray:
    """Block-mean downscale by an integer factor (trailing remainder cropped).

    Same operation as the reference's downscale (data_loader.py:169-175).
    Works on (H, W) or (H, W, C).
    """
    if factor == 1:
        return a
    h = a.shape[0] // factor
    w = a.shape[1] // factor
    a = a[: h * factor, : w * factor]
    if a.ndim == 2:
        return a.reshape(h, factor, w, factor).mean(axis=(1, 3), dtype=np.float32)
    c = a.shape[2]
    return a.reshape(h, factor, w, factor, c).mean(axis=(1, 3), dtype=np.float32)


def build_mips(base: np.ndarray, min_size: int = 64) -> list[np.ndarray]:
    """[level0=base, level1=half, ...] until min dimension < min_size."""
    mips = [np.ascontiguousarray(base, dtype=np.float32)]
    while min(mips[-1].shape[0], mips[-1].shape[1]) // 2 >= min_size:
        mips.append(block_mean(mips[-1], 2))
    return mips


def coarse_max_map(base: np.ndarray, cells_h: int = 46,
                   cells_w: int = 92) -> np.ndarray:
    """Dilated coarse max-pool of the heightfield.

    Used to tighten per-block march chords: a ray segment above
    R * maxmap(region) cannot contain a surface hit. The 3x3 dilation makes
    lookups conservative for positions up to one cell away.
    """
    h, w = base.shape
    fh = max(h // cells_h, 1)
    fw = max(w // cells_w, 1)
    ch = h // fh
    cw = w // fw
    m = base[: ch * fh, : cw * fw].reshape(ch, fh, cw, fw).max(axis=(1, 3))
    # 3x3 max dilation with longitude wrap, latitude clamp
    mp = np.concatenate([m[:, -1:], m, m[:, :1]], axis=1)
    mp = np.concatenate([mp[:1], mp, mp[-1:]], axis=0)
    out = m.copy()
    for dy in range(3):
        for dx in range(3):
            np.maximum(out, mp[dy:dy + ch, dx:dx + cw], out)
    return out.astype(np.float32)


def slope_sq_maps(mips: list[np.ndarray], cells_h: int = 46,
                  cells_w: int = 92) -> np.ndarray:
    """(K, cells_h, cells_w) mean squared surface slope per mip level.

    Entry k holds the per-cell mean of the per-axis squared slope
    (d height / d arc, dimensionless tilt) measured ON level k. The slope
    power LOST by rendering a block at level L+j instead of L is
    map[L] - map[L+j]; the renderer turns that into the normal-tilt
    standard deviation for roughness-compensated (softened) Lambert
    shading, which removes the brightness seam at per-block mip-stride
    (LOD) transitions near the limb.
    """
    out = []
    for m in mips:
        hk, wk = m.shape
        dth = np.pi / hk
        s_lat = np.gradient(m, dth, axis=0)
        lat = np.cos(np.linspace(np.pi / 2, -np.pi / 2, hk,
                                 endpoint=False) - np.pi / (2 * hk))
        coslat = np.maximum(np.abs(lat), 0.2)[:, None]
        s_lon = np.gradient(m, 2 * np.pi / wk, axis=1) / coslat
        s2 = 0.5 * (s_lat ** 2 + s_lon ** 2)
        fh = max(hk // cells_h, 1)
        fw = max(wk // cells_w, 1)
        cell = s2[: cells_h * fh, : cells_w * fw].reshape(
            cells_h, fh, cells_w, fw).mean(axis=(1, 3))
        out.append(cell)
    return np.stack(out).astype(np.float32)


def pad_lon_wrap(a: np.ndarray, pad: int) -> np.ndarray:
    """Append `pad` wrapped columns on the right so sampling windows crossing
    the +/-180 deg longitude seam need no modular indexing."""
    return np.concatenate([a, a[:, :pad]], axis=1)


def select_level(mips_shapes: list[tuple[int, int]],
                 texels_per_pixel: float, threshold: float = 1.4) -> int:
    """Pick the mip level whose texel footprint best matches one screen pixel.

    texels_per_pixel: how many level-0 texels one screen pixel spans at the
    image center. Level L halves that by 2^L; choose the last level with
    >= ~1 texel per pixel. The threshold (default 1.4) also bounds a render
    superblock's ground footprint so it fits its sampling window
    (engine.blocked: 64 px * 1.4 + margins <= WIN_W).
    """
    level = 0
    t = texels_per_pixel
    while t >= threshold and level + 1 < len(mips_shapes):
        t /= 2.0
        level += 1
    return level
