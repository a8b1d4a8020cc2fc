"""Procedural lunar data synthesis.

The reference downloads ~9 GB of NASA/USGS source data on first run
(reference main.py:95-152). In environments without those files (or network
access) this module synthesizes a statistically Moon-like elevation and
albedo map — cratered highlands, dark maria, realistic relief amplitude —
so every part of the framework (rendering, shadows, picking, measurement,
benchmarks) runs end-to-end out of the box. Real LOLA/LROC files take
precedence whenever present (see moonrtx_tpu.data.loader).

Deterministic for a given seed; generation is cached to .npy by the loader.
"""

from __future__ import annotations

import numpy as np

# Moon-like relief: LOLA global range is about -9.1 km .. +10.8 km around the
# 1737.4 km reference radius, i.e. displacement factors in ~[0.9948, 1.0062].
RELIEF_SCALE = 1.0 / 1737.4  # km -> radius factor


def _value_noise(h: int, w: int, rng: np.random.Generator,
                 octaves: int = 6, base_cells: int = 8) -> np.ndarray:
    """Multi-octave bilinear value noise in [-1, 1], longitude-periodic."""
    import cv2

    out = np.zeros((h, w), np.float32)
    amp = 1.0
    total = 0.0
    for o in range(octaves):
        cells_w = base_cells * (2 ** o)
        cells_h = max(2, cells_w // 2)
        if cells_w >= w:
            break
        grid = rng.standard_normal((cells_h, cells_w)).astype(np.float32)
        # periodic in longitude: wrap one column before resize
        grid = np.concatenate([grid, grid[:, :1]], axis=1)
        up = cv2.resize(grid, (w + w // cells_w, h), interpolation=cv2.INTER_CUBIC)
        out += amp * up[:, :w]
        total += amp
        amp *= 0.55
    return out / total


def _crater_field(h: int, w: int, rng: np.random.Generator,
                  n_craters: int) -> np.ndarray:
    """Sum of crater bowls + rims stamped into an equirectangular grid (km)."""
    elev = np.zeros((h, w), np.float32)
    # power-law radii (km): many small, few large. The minimum is held a
    # few texels above the default grid scale (~1.9 km/texel at 2880x5760)
    # so craters stay resolvable rather than vanishing into bilinear blur.
    u = rng.random(n_craters)
    radii_km = 6.0 * (1.0 - u) ** (-0.7)          # 6 .. ~250 km
    radii_km = np.clip(radii_km, 5.0, 250.0)
    order = np.argsort(-radii_km)                  # large first (small overprint)
    # uniform positions on the sphere
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n_craters)))
    lon = rng.uniform(-180.0, 180.0, n_craters)

    deg_per_row = 180.0 / h
    km_per_deg = 30.3236  # 2*pi*1737.4/360

    for i in order:
        R_km = float(radii_km[i])
        # depth/diameter ~ 0.1 for small (simple) craters; complex craters
        # saturate near 4 km depth like the real Moon
        depth_km = min(0.18 * R_km ** 0.8, 4.0)
        rim_km = 0.5 * depth_km
        R_deg = R_km / km_per_deg
        la, lo = float(lat[i]), float(lon[i])
        cos_la = max(np.cos(np.radians(la)), 0.05)
        # stamp window: 2.2 R in every direction
        half_deg = 2.2 * R_deg
        r0 = max(int((90.0 - la - half_deg) / deg_per_row), 0)
        r1 = min(int((90.0 - la + half_deg) / deg_per_row) + 1, h)
        if r1 <= r0:
            continue
        half_cols = min(int(half_deg / cos_la / (360.0 / w)) + 1, w // 2 - 1)
        c_center = int((lo + 180.0) / 360.0 * w)
        cols = (np.arange(c_center - half_cols, c_center + half_cols + 1)) % w
        lat_px = 90.0 - (np.arange(r0, r1) + 0.5) * deg_per_row
        lon_px = (cols + 0.5) * (360.0 / w) - 180.0
        dlat = (lat_px - la)[:, None]
        dlon = (lon_px - lo + 180.0) % 360.0 - 180.0
        d_deg = np.sqrt(dlat**2 + (dlon[None, :] * cos_la) ** 2)
        d = d_deg / R_deg
        bowl = np.where(d < 1.0, depth_km * (d * d - 1.0), 0.0)
        rim = rim_km * np.exp(-((d - 1.0) / 0.35) ** 2)
        # NB: scatter-add through a row view; a combined slice+2-D-index
        # write would collapse every window row to the patch's last row.
        elev[r0:r1][:, cols] += (bowl + rim).astype(np.float32)
    return elev


def _maria(h: int, w: int, rng: np.random.Generator,
           n_basins: int = 9) -> tuple[np.ndarray, np.ndarray]:
    """(basin depression km, mare mask 0..1) — large shallow dark basins,
    biased to the northern near side like the real maria."""
    depress = np.zeros((h, w), np.float32)
    mask = np.zeros((h, w), np.float32)
    lat_px = np.linspace(90.0, -90.0, h, endpoint=False)[:, None] - 90.0 / h
    lon_px = np.linspace(-180.0, 180.0, w, endpoint=False)[None, :] + 180.0 / w
    for _ in range(n_basins):
        la = float(rng.normal(15.0, 20.0))
        lo = float(rng.normal(0.0, 45.0))
        R_deg = float(rng.uniform(8.0, 22.0))
        cos_la = max(np.cos(np.radians(la)), 0.05)
        dlon = (lon_px - lo + 180.0) % 360.0 - 180.0
        d = np.sqrt((lat_px - la) ** 2 + (dlon * cos_la) ** 2) / R_deg
        m = np.clip(1.0 - d, 0.0, 1.0) ** 0.7
        depress -= 1.8 * m
        mask = np.maximum(mask, np.clip(1.2 - d, 0.0, 1.0))
    return depress, np.clip(mask, 0.0, 1.0)


def synthesize_moon(height: int = 2880, width: int = 5760, seed: int = 7,
                    n_craters: int = 4000) -> tuple[np.ndarray, np.ndarray]:
    """Synthesize (elevation_factor, albedo_rgb).

    elevation_factor: float32 (H, W), surface radius as a factor of the
    reference radius (mean ~1.0, range ~[0.994, 1.007]) — same physical
    scale as the reference's LDEM processing before peak normalization
    (reference data_loader.py:162-180).
    albedo_rgb: float32 (H, W, 3) linear reflectance in [0.05, 0.95].
    """
    rng = np.random.default_rng(seed)
    noise = _value_noise(height, width, rng)
    craters = _crater_field(height, width, rng, n_craters)
    basins, mare_mask = _maria(height, width, rng)

    elev_km = 2.6 * noise + craters + basins
    # soften relief where maria flooded the terrain
    elev_km = elev_km * (1.0 - 0.75 * mare_mask) + basins * 0.75 * mare_mask
    elevation = (1.0 + elev_km * RELIEF_SCALE).astype(np.float32)

    highlands = 0.52 + 0.10 * _value_noise(height, width, rng, octaves=4)
    mare_albedo = 0.24 + 0.05 * noise
    gray = np.clip(highlands * (1.0 - mare_mask) + mare_albedo * mare_mask, 0.05, 0.95)
    # slight warm tint like real regolith
    albedo = np.stack([gray * 1.02, gray, gray * 0.95], axis=-1).astype(np.float32)
    return elevation, np.clip(albedo, 0.05, 0.95)


def upsample_elevation(base: np.ndarray, factor: int, seed: int = 13,
                       detail_m: float = 60.0,
                       chunk_rows: int = 2048,
                       out: np.ndarray | None = None) -> np.ndarray:
    """Upsample a synthetic elevation-factor map to real-LDEM working-set
    sizes (the LOLA grid is 46080x92160, reference main.py:25-29), adding
    periodic sub-texel relief so the fine levels carry real detail.

    Runs in row chunks (cubic resize + tiled smooth noise) so host memory
    stays ~O(output) even for multi-gigatexel outputs — this environment
    has one CPU core, so direct synthesis at full size is impractical
    while an upsample streams at memory bandwidth.

    out: optional preallocated (H, W) float32 destination. Pass a
    memory-mapped array to stream the result to disk: dirty pages are
    flushed and released every couple of chunks, so the host peak stays
    O(chunk) instead of O(output) — the cold-synthesis RSS cap.
    """
    import cv2

    h, w = base.shape
    H, W = h * factor, w * factor
    rng = np.random.default_rng(seed)
    # periodic smooth detail tile (bilinear upsample of coarse noise)
    tile = 1536
    cells = 96
    g = rng.standard_normal((cells + 1, cells + 1)).astype(np.float32)
    g[-1, :] = g[0, :]
    g[:, -1] = g[:, 0]
    patch = cv2.resize(g, (tile + tile // cells, tile + tile // cells),
                       interpolation=cv2.INTER_CUBIC)[:tile, :tile]
    patch *= np.float32(detail_m * RELIEF_SCALE / 1000.0)

    if out is None:
        out = np.empty((H, W), np.float32)
    elif out.shape != (H, W):
        raise ValueError(f"out shape {out.shape} != target {(H, W)}")
    pad = 2  # cubic support rows on each side of a chunk
    for i, r in enumerate(range(0, H, chunk_rows)):
        rows = min(chunk_rows, H - r)
        b0 = max(r // factor - pad, 0)
        b1 = min((r + rows - 1) // factor + 1 + pad, h)
        sl = cv2.resize(base[b0:b1], (W, (b1 - b0) * factor),
                        interpolation=cv2.INTER_CUBIC)
        off = r - b0 * factor
        chunk = sl[off:off + rows]
        # tiled periodic detail (phase-shifted per tile row block)
        ty = (r + np.arange(rows)) % tile
        reps = -(-W // tile)
        det = np.tile(patch[ty], (1, reps))[:, :W]
        out[r:r + rows] = chunk + det
        if i % 2 == 1:
            flush_drop_pages(out)
    flush_drop_pages(out)
    return out


def flush_drop_pages(arr) -> None:
    """If arr is memory-mapped (or a view of one): write dirty pages back
    and release the resident ones (they refault from the file
    transparently). No-op for in-RAM arrays — callers stream large
    outputs through this to keep the cold-start host peak at O(band)."""
    from moonrtx_tpu.data.mips import mmap_of

    mm, _ = mmap_of(arr)
    if mm is None:
        return
    try:
        import mmap as _mmap

        mm.flush()
        mm.madvise(_mmap.MADV_DONTNEED)
    except (AttributeError, ValueError, OSError):
        pass


def upsample_color(base: np.ndarray, factor: int,
                   chunk_rows: int = 2048,
                   out: np.ndarray | None = None) -> np.ndarray:
    """Cubic-upsample an (H, W, 3) albedo map by an integer factor in row
    chunks (same streaming pattern as upsample_elevation: 2 support rows
    of halo cover INTER_CUBIC's 4-tap vertical filter, so chunking is
    exact), clipped to the synth albedo range [0.05, 0.95].  Pass a
    memory-mapped `out` to keep the cold-start host peak at O(chunk) —
    the full-LDEM color target is (11520, 23040, 3) f32 = 3.2 GB."""
    import cv2

    h, w = base.shape[:2]
    H, W = h * factor, w * factor
    if out is None:
        out = np.empty((H, W, 3), np.float32)
    elif out.shape != (H, W, 3):
        raise ValueError(f"out shape {out.shape} != target {(H, W, 3)}")
    pad = 2
    for i, r in enumerate(range(0, H, chunk_rows)):
        rows = min(chunk_rows, H - r)
        b0 = max(r // factor - pad, 0)
        b1 = min((r + rows - 1) // factor + 1 + pad, h)
        sl = cv2.resize(base[b0:b1], (W, (b1 - b0) * factor),
                        interpolation=cv2.INTER_CUBIC)
        off = r - b0 * factor
        out[r:r + rows] = np.clip(sl[off:off + rows], 0.05, 0.95)
        if i % 2 == 1:
            flush_drop_pages(out)
    flush_drop_pages(out)
    return out


def synthesize_starmap(height: int = 1024, width: int = 2048,
                       seed: int = 11, n_stars: int = 4000) -> np.ndarray:
    """Equirectangular star background, float32 (H, W, 3) in [0, 1]."""
    rng = np.random.default_rng(seed)
    img = np.zeros((height, width, 3), np.float32)
    ys = (np.arccos(rng.uniform(-1, 1, n_stars)) / np.pi * height).astype(int) % height
    xs = rng.integers(0, width, n_stars)
    mag = rng.random(n_stars) ** 4.0
    tint = 0.85 + 0.3 * rng.random((n_stars, 3))
    for y, x, m, t in zip(ys, xs, mag, tint):
        img[y, x] = np.minimum(img[y, x] + m * t, 1.0)
    # faint milky-way style band along a tilted great circle
    lon = np.linspace(-np.pi, np.pi, width)[None, :]
    lat = np.linspace(np.pi / 2, -np.pi / 2, height)[:, None]
    band = np.exp(-((lat - 0.35 * np.sin(lon + 1.0)) / 0.12) ** 2).astype(np.float32)
    img += 0.035 * band[..., None]
    return np.clip(img, 0.0, 1.0)
