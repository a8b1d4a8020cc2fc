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


# Row-band size for the streamed host passes below. Each output row
# depends only on its own factor/fh-row input group, so banding on group
# boundaries is bit-identical to the whole-array computation while the
# transient host allocation stays O(band) — multi-gigatexel cold starts
# (the 46080x92160 LOLA LDEM, reference main.py:25-29) never materialize
# a full-map temporary.  1024 rows keeps a band of the full-width LDEM
# grid (92160 cols f32) at ~360 MB, so even np.gradient's ~3x working
# set stays ~1 GB.
BAND_ROWS = 1024


def mmap_of(a) -> tuple:
    """(mmap object, byte offset of a's first element within it), or
    (None, 0) for in-RAM arrays.  Walks the .base chain: np.asarray on a
    np.memmap returns a plain ndarray VIEW without ._mmap, and views are
    what the streamed passes usually hold."""
    obj = a
    root = None
    while isinstance(obj, np.ndarray):
        if getattr(obj, "_mmap", None) is not None:
            # keep walking: a SLICE of a memmap is itself a memmap whose
            # copied .offset attribute describes the original mapping,
            # not the slice — only the deepest memmap's offset is valid
            root = obj
        obj = getattr(obj, "base", None)
    if root is None:
        return None, 0
    try:
        import mmap as _mmap

        # numpy maps the file from the allocation-granularity floor of
        # `offset`; the root's data therefore starts at
        # offset % granularity within the mmap object
        data0 = int(root.offset) % _mmap.ALLOCATIONGRANULARITY
        delta = (a.__array_interface__["data"][0]
                 - root.__array_interface__["data"][0])
        if delta < 0:
            return None, 0
        return root._mmap, data0 + delta
    except (AttributeError, TypeError, KeyError, ValueError):
        return None, 0


def drop_row_range(a: np.ndarray, row0: int, row1: int) -> None:
    """Release the resident pages backing rows [row0, row1) of a
    memory-mapped array or a view of one (no-op otherwise).  The streamed
    passes call this behind themselves so one pass over a multi-GB source
    file keeps O(band) resident instead of faulting the whole file into
    RSS (clean pages refault transparently if re-read).  Page-aligned
    inward, so a halo row shared with the next band at worst refaults."""
    if a.ndim < 2 or row1 <= row0:
        return
    mm, off = mmap_of(a)
    if mm is None:
        return
    try:
        import mmap as _mmap

        ps = _mmap.PAGESIZE
        start = ((off + row0 * a.strides[0]) + ps - 1) // ps * ps
        end = (off + row1 * a.strides[0]) // ps * ps
        if end > start:
            mm.madvise(_mmap.MADV_DONTNEED, start, end - start)
    except (AttributeError, ValueError, OSError, OverflowError):
        pass


def block_mean(a: np.ndarray, factor: int) -> np.ndarray:
    """Block-mean downscale by an integer factor (trailing remainder cropped).

    Same operation as the reference's downscale (data_loader.py:169-175).
    Works on (H, W) or (H, W, C); runs in row bands (bit-identical — each
    output row reduces over only its own `factor` input rows) so
    memory-mapped sources stream instead of materializing.
    """
    if factor == 1:
        return a
    h = a.shape[0] // factor
    w = a.shape[1] // factor
    out = np.empty((h, w) + a.shape[2:], np.float32)
    step = max(BAND_ROWS // factor, 1)
    for r0 in range(0, h, step):
        r1 = min(r0 + step, h)
        sl = np.asarray(a[r0 * factor: r1 * factor, : w * factor])
        if sl.ndim == 2:
            out[r0:r1] = sl.reshape(r1 - r0, factor, w, factor).mean(
                axis=(1, 3), dtype=np.float32)
        else:
            c = sl.shape[2]
            out[r0:r1] = sl.reshape(r1 - r0, factor, w, factor, c).mean(
                axis=(1, 3), dtype=np.float32)
        drop_row_range(a, r0 * factor, r1 * factor)
    return out


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
    # block max in row bands (bit-identical; a reshape of a memory-mapped
    # slice would materialize the whole map as one host copy)
    m = np.empty((ch, cw), np.float32)
    step = max(BAND_ROWS // fh, 1)
    for c0 in range(0, ch, step):
        c1 = min(c0 + step, ch)
        sl = np.asarray(base[c0 * fh: c1 * fh, : cw * fw])
        m[c0:c1] = sl.reshape(c1 - c0, fh, cw, fw).max(axis=(1, 3))
        drop_row_range(base, c0 * fh, c1 * fh)
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
    return np.stack([slope_sq_level(m, cells_h, cells_w)
                     for m in mips]).astype(np.float32)


def slope_sq_level(m: np.ndarray, cells_h: int = 46,
                   cells_w: int = 92) -> np.ndarray:
    """One level's (cells_h, cells_w) mean-squared-slope cell map.

    Row-banded with a one-row halo so the central/one-sided difference at
    every row matches np.gradient on the whole array exactly, and the
    transient stays O(band) — the streamed pyramid build calls this on
    memory-mapped multi-gigatexel level 0, where three full-size gradient
    temporaries (~13 GB at the LOLA LDEM grid) used to dominate the
    cold-start host peak."""
    hk, wk = m.shape
    dth = np.pi / hk
    dph = 2.0 * np.pi / wk
    lat = np.cos(np.linspace(np.pi / 2, -np.pi / 2, hk,
                             endpoint=False) - np.pi / (2 * hk))
    coslat = np.maximum(np.abs(lat), 0.2)
    fh = max(hk // cells_h, 1)
    fw = max(wk // cells_w, 1)
    cell = np.empty((cells_h, cells_w), np.float32)
    step = max(BAND_ROWS // fh, 1)
    for c0 in range(0, cells_h, step):
        c1 = min(c0 + step, cells_h)
        r0, r1 = c0 * fh, c1 * fh
        lo = max(r0 - 1, 0)
        hi = min(r1 + 1, hk)
        sl = np.asarray(m[lo:hi])
        # rows r0:r1 are interior rows of the haloed slice except at the
        # global edges, where np.gradient's one-sided difference is the
        # wanted answer anyway — so the band rows match the whole-array
        # gradient bit for bit
        s_lat = np.gradient(sl, dth, axis=0)[r0 - lo: r1 - lo]
        s_lon = np.gradient(sl[r0 - lo: r1 - lo], dph,
                            axis=1) / coslat[r0:r1, None]
        s2 = 0.5 * (s_lat ** 2 + s_lon ** 2)
        cell[c0:c1] = s2[:, : cells_w * fw].reshape(
            c1 - c0, fh, cells_w, fw).mean(axis=(1, 3))
        drop_row_range(m, lo, r1)
    return cell


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
