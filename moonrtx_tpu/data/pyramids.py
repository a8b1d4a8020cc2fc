"""Device-ready map pyramids: build once, cache on disk, upload fast.

The expensive, host-side part of scene construction — mip pyramids,
int16/uint8 quantization, the dilated coarse max map and per-level slope
statistics — is a pure function of (elevation, albedo, quantize mode).
At the real-LDEM working set (23040x46080, reference main.py:25-29) those
passes cost ~10 minutes on one host core, every process start.  This
module extracts them into `build_pyramids` and adds a content-fingerprinted
disk cache of the finished, device-ready arrays (the same design as the
reference's downscale cache, data_loader.py:19-49: a cache can only cost
time, never correctness — any read problem silently falls back to a
rebuild).

Fingerprint: shape + dtype + a strided sample of the array contents
(~256x256 probes), hashed.  Content-addressed, so there is no staleness;
CACHE_VERSION guards against processing-semantics changes.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

import numpy as np

from moonrtx_tpu.data.mips import (
    block_mean,
    coarse_max_map,
    drop_row_range,
    pad_lon_wrap,
    slope_sq_level,
)

CACHE_VERSION = 1

# Height mip chain stops when the next level's min dimension would fall
# below this (must match mips.build_mips's min_size default — the
# streamed build reproduces its chain level-at-a-time).
MIP_MIN_SIZE = 64


def _drop_mmap_pages(m) -> None:
    """Release a memory-mapped source's resident pages after the last
    streamed pass over it (clean file-backed pages, but they count
    against the cold-start peak and refault transparently if touched).
    Works through views (mips.mmap_of walks the .base chain)."""
    from moonrtx_tpu.data.mips import mmap_of

    mm, _ = mmap_of(m)
    if mm is not None:
        try:
            import mmap as _mmap

            mm.madvise(_mmap.MADV_DONTNEED)
        except (AttributeError, ValueError, OSError):
            pass

# Wrapped longitude columns appended to every mip: must cover the widest
# sampling window of the blocked backend plus slack.
PAD_COLS = 192

# "auto" quantization threshold: maps whose level-0 texel count exceeds
# this are stored int16/uint8 in HBM (the full LOLA LDEM is 4.2 Gtexels —
# 17 GB as f32, 2.1 GB as int16; reference main.py:25-29).
QUANTIZE_TEXELS = 128 * 1024 * 1024

# Albedo pyramids may start coarser than the heightfield (the reference
# color map is ~4x coarser than the LDEM): widest albedo level kept when
# quantizing; finer entries alias it (zero extra HBM).
ALB_MAX_W = 16384


@dataclass
class PyramidSet:
    """Everything MoonScene needs on device, as host numpy arrays.

    mips: padded heightfield levels (int16 when quantized, else f32).
    albedo_kept: the UNIQUE albedo levels from alb_min_level on (padded,
    uint8 when quantized, else f32 HxWx3); entries finer than
    alb_min_level alias albedo_kept[0] at upload time (zero extra HBM).
    """

    mips: list
    maxmap: np.ndarray
    slope_maps: np.ndarray
    albedo_kept: list
    alb_min_level: int
    quantized: bool
    h_scale: float
    h_offset: float
    h_min: float
    a_scale: float


def array_fingerprint(a: np.ndarray) -> str:
    """Cheap content fingerprint: shape + dtype + a strided probe grid.

    Works on memory-mapped arrays without a full read (~64k probes). Two
    different maps colliding requires them to agree on every probe —
    not a realistic failure mode for heightfields; CACHE_VERSION and the
    quantize mode are hashed separately by the cache key."""
    h = hashlib.blake2b(digest_size=16)
    h.update(repr((a.shape, str(a.dtype))).encode())
    if a.size:
        sr = max(1, a.shape[0] // 256)
        sc = max(1, a.shape[1] // 256)
        h.update(np.ascontiguousarray(a[::sr, ::sc]).tobytes())
    return h.hexdigest()


def _encode_i16_padded(m: np.ndarray, h_scale: float, h_offset: float,
                       pad: int, chunk: int = 512,
                       out_path: str | None = None) -> np.ndarray:
    """int16 heights with `pad` wrapped longitude columns appended: value =
    raw * h_scale + h_offset, exact affine shared by every level (block
    means stay inside [min, max]).  f64 in row chunks: an f32 subtraction
    (m - offset) near 1.0 would itself cost ~1 quantization step.  Encoding
    straight into the padded buffer (instead of pad_lon_wrap on a finished
    int16 array) avoids a second full-level copy on the cold path.

    out_path: encode straight into a w+ open_memmap at this path and
    serve it back read-only — the level is never RAM-resident (the spill
    path; level 0 of the full LOLA LDEM is 8.5 GB as padded int16)."""
    from moonrtx_tpu.data.synth import flush_drop_pages

    h, w = m.shape
    pad = min(pad, w)  # pad_lon_wrap semantics: one wrapped copy at most
    if out_path is None:
        out = np.empty((h, w + pad), np.int16)
    else:
        out = np.lib.format.open_memmap(out_path, mode="w+",
                                        dtype=np.int16,
                                        shape=(h, w + pad))
    for i, r in enumerate(range(0, h, chunk)):
        sl = np.asarray(m[r:r + chunk]).astype(np.float64)
        out[r:r + chunk, :w] = np.clip(
            np.rint((sl - h_offset) / h_scale), -32767, 32767
        ).astype(np.int16)
        drop_row_range(m, r, min(r + chunk, h))
        if out_path is not None and i % 8 == 7:
            flush_drop_pages(out)
    if out_path is not None:
        flush_drop_pages(out)  # pad reads refault clean from the file
    out[:, w:] = out[:, :pad]
    if out_path is not None:
        out.flush()
        del out
        return np.load(out_path, mmap_mode="r")
    return out


def _encode_u8_padded(m: np.ndarray, pad: int, chunk: int = 512,
                      out_path: str | None = None) -> np.ndarray:
    """uint8 albedo with `pad` wrapped longitude columns, row-chunked
    (value = raw / 255; same rint/clip as the unstreamed conversion).
    out_path: as in _encode_i16_padded — spill-encode to disk."""
    from moonrtx_tpu.data.synth import flush_drop_pages

    h, w = m.shape[:2]
    pad = min(pad, w)
    if out_path is None:
        out = np.empty((h, w + pad) + m.shape[2:], np.uint8)
    else:
        out = np.lib.format.open_memmap(out_path, mode="w+",
                                        dtype=np.uint8,
                                        shape=(h, w + pad) + m.shape[2:])
    for i, r in enumerate(range(0, h, chunk)):
        sl = np.asarray(m[r:r + chunk])
        out[r:r + chunk, :w] = np.clip(np.rint(sl * 255.0), 0, 255
                                       ).astype(np.uint8)
        drop_row_range(m, r, min(r + chunk, h))
        if out_path is not None and i % 8 == 7:
            flush_drop_pages(out)
    if out_path is not None:
        flush_drop_pages(out)
    out[:, w:] = out[:, :pad]
    if out_path is not None:
        out.flush()
        del out
        return np.load(out_path, mmap_mode="r")
    return out


def _minmax_banded(a: np.ndarray) -> tuple[float, float]:
    """(min, max) in one row-banded pass, releasing mmap pages behind it
    (a whole-array np.min faults the entire file into RSS first thing)."""
    from moonrtx_tpu.data.mips import BAND_ROWS

    lo, hi = np.inf, -np.inf
    for r in range(0, a.shape[0], BAND_ROWS):
        sl = np.asarray(a[r:r + BAND_ROWS])
        lo = min(lo, float(sl.min()))
        hi = max(hi, float(sl.max()))
        drop_row_range(a, r, min(r + BAND_ROWS, a.shape[0]))
    return lo, hi


def _spill(spill_dir: str, name: str, arr: np.ndarray) -> np.ndarray:
    """Write a finished level to `spill_dir` and serve it back
    memory-mapped, freeing the in-RAM copy — with a spill dir the build
    never holds more than ~one level in RAM."""
    fp = os.path.join(spill_dir, name)
    np.save(fp, arr)
    return np.load(fp, mmap_mode="r")


def build_pyramids(elevation: np.ndarray, albedo: np.ndarray,
                   quantized: bool,
                   spill_dir: str | None = None) -> PyramidSet:
    """The full host-side scene preprocessing (pure; numpy in/out).

    The height chain runs level-at-a-time in row bands (mips.BAND_ROWS):
    each iteration computes the level's slope statistics, encodes the
    device-ready (padded, quantized) level, then block-means the next
    level and DROPS the f32 parent — so the cold-start transient is one
    encoded level + one child instead of the whole f32 chain plus three
    full-size gradient temporaries (~18 GB at the 46080x92160 LOLA LDEM,
    reference main.py:25-29; the round-5 cold-synthesis host-RSS fix).
    Memory-mapped sources stream band by band and their resident pages
    are released after the last pass.

    spill_dir: when given (load_or_build passes its cache tmp dir),
    every finished level is written there immediately and served back
    memory-mapped, so not even the finished set is RAM-resident — the
    cache save then only adds the small arrays and metadata."""
    h_min, h_hi = _minmax_banded(elevation)
    if quantized:
        h_scale = max((h_hi - h_min) / 65000.0, 1e-12)
        h_offset = 0.5 * (h_min + h_hi)
        # Resolution (max-min)/65000 ~ 0.08 m for real lunar relief —
        # finer than the source LDEM's 0.5 m quantization.
    else:
        h_scale, h_offset = 1.0, 0.0

    base = elevation if elevation.dtype == np.float32 \
        else np.ascontiguousarray(elevation, dtype=np.float32)
    mips = []
    level_shapes = []
    slope_cells = []  # mean squared slope per level (coarse cells) for
    # LOD roughness compensation at per-block mip-stride seams
    cur = base
    while True:
        level_shapes.append(cur.shape)
        slope_cells.append(slope_sq_level(cur))
        name = f"mip{len(mips):02d}.npy"
        if quantized:
            enc = _encode_i16_padded(
                cur, h_scale, h_offset, PAD_COLS,
                out_path=(None if spill_dir is None
                          else os.path.join(spill_dir, name)))
        else:
            enc = pad_lon_wrap(
                np.ascontiguousarray(cur, dtype=np.float32), PAD_COLS)
            if spill_dir is not None:
                enc = _spill(spill_dir, name, enc)
        mips.append(enc)
        del enc
        if min(cur.shape[0], cur.shape[1]) // 2 < MIP_MIN_SIZE:
            break
        nxt = block_mean(cur, 2)
        if cur is not base:
            del cur
        cur = nxt

    maxmap = coarse_max_map(elevation)
    slope = np.stack(slope_cells).astype(np.float32)
    _drop_mmap_pages(elevation)

    # The albedo (color) source may be coarser than the heightfield by a
    # power of two (the real LROC color map is ~4x coarser than the LDEM,
    # reference main.py:33-38): its pyramid is aligned so entry L has the
    # height level L's dimensions, with entries finer than the albedo base
    # aliasing it (same device buffer — zero extra HBM).
    base_lvl = 0
    while (base_lvl + 1 < len(level_shapes)
           and albedo.shape[:2] != level_shapes[base_lvl]):
        base_lvl += 1
    if albedo.shape[:2] != level_shapes[base_lvl]:
        raise ValueError(
            f"albedo shape {albedo.shape[:2]} must equal the elevation "
            f"shape divided by a power of two (elevation {elevation.shape})")
    # chain shapes first (cheap), to resolve the kept range before any
    # full-size albedo array is materialized
    a_shapes = [tuple(albedo.shape[:2])]
    while min(a_shapes[-1]) // 2 >= MIP_MIN_SIZE:
        a_shapes.append((a_shapes[-1][0] // 2, a_shapes[-1][1] // 2))
    # aligned list: entry L has height level L's dimensions; entries
    # finer than the albedo base alias chain entry 0, entries coarser
    # than the chain's tail alias its last entry
    def _chain_idx(level: int) -> int:
        return min(max(level - base_lvl, 0), len(a_shapes) - 1)

    alb_min_level = base_lvl
    if quantized:
        # uint8 albedo; additionally cap the widest stored level (finer
        # gains nothing at display sampling rates, ALB_MAX_W)
        a_scale = 1.0 / 255.0
        while (alb_min_level + 1 < len(mips)
               and a_shapes[_chain_idx(alb_min_level)][1] > ALB_MAX_W):
            alb_min_level += 1
    else:
        a_scale = 1.0

    # walk the chain level-at-a-time (same streaming pattern as the
    # height chain): convert a level the moment the kept range needs it,
    # drop the f32 parent as soon as its child exists
    need = [_chain_idx(L) for L in range(alb_min_level, len(mips))]
    kept: list = [None] * len(need)
    cur_a = albedo if albedo.dtype == np.float32 \
        else np.ascontiguousarray(albedo, dtype=np.float32)
    for idx in range(max(need) + 1):
        if idx in need:
            j0 = need.index(idx)
            if quantized:
                arr = _encode_u8_padded(
                    cur_a, PAD_COLS,
                    out_path=(None if spill_dir is None else
                              os.path.join(spill_dir, f"alb{j0:02d}.npy")))
            else:
                arr = pad_lon_wrap(
                    np.ascontiguousarray(cur_a, dtype=np.float32),
                    PAD_COLS)
                if spill_dir is not None:
                    arr = _spill(spill_dir, f"alb{j0:02d}.npy", arr)
            for j, i in enumerate(need):
                if i == idx:
                    kept[j] = (arr if j == j0 or spill_dir is None
                               else _spill(spill_dir, f"alb{j:02d}.npy",
                                           np.asarray(arr)))
            del arr
        if idx < max(need):
            nxt_a = block_mean(cur_a, 2)
            if cur_a is not albedo:
                del cur_a
            cur_a = nxt_a
    _drop_mmap_pages(albedo)

    return PyramidSet(mips=mips, maxmap=maxmap.astype(np.float32),
                      slope_maps=slope, albedo_kept=kept,
                      alb_min_level=alb_min_level, quantized=quantized,
                      h_scale=h_scale, h_offset=h_offset, h_min=h_min,
                      a_scale=a_scale)


def default_cache_dir() -> str:
    return os.environ.get(
        "MOONRTX_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "moonrtx_tpu"))


def _cache_path(elevation, albedo, quantized: bool, cache_dir: str) -> str:
    key = (f"pyr_{array_fingerprint(elevation)}_{array_fingerprint(albedo)}"
           f"_{'i16' if quantized else 'f32'}_v{CACHE_VERSION}")
    return os.path.join(cache_dir, key)


def _load_cached(path: str):
    with open(os.path.join(path, "meta.json"), "r", encoding="utf-8") as f:
        meta = json.load(f)
    if meta.get("version") != CACHE_VERSION:
        return None
    # memory-mapped: every consumer is read-only (device upload reads
    # through; measurement bilinear-taps a few texels; band sharding
    # slices rows) and most levels of a banded or single-device scene are
    # never touched on the host at all — at the full 46080x92160 LDEM the
    # eager load would pin ~8.5 GiB of host RSS per process for nothing
    mips = [np.load(os.path.join(path, f"mip{i:02d}.npy"), mmap_mode="r")
            for i in range(meta["n_mips"])]
    kept = [np.load(os.path.join(path, f"alb{i:02d}.npy"), mmap_mode="r")
            for i in range(meta["n_alb"])]
    return PyramidSet(
        mips=mips, maxmap=np.load(os.path.join(path, "maxmap.npy")),
        slope_maps=np.load(os.path.join(path, "slope.npy")),
        albedo_kept=kept, alb_min_level=int(meta["alb_min_level"]),
        quantized=bool(meta["quantized"]), h_scale=float(meta["h_scale"]),
        h_offset=float(meta["h_offset"]), h_min=float(meta["h_min"]),
        a_scale=float(meta["a_scale"]))


def _save_cached(path: str, ps: PyramidSet, tmp: str | None = None,
                 spilled: bool = False) -> None:
    """Publish a PyramidSet atomically (tmp dir + rename).  With
    spilled=True the level files were already written into `tmp` by
    build_pyramids' spill_dir — only the small arrays and metadata are
    added here.  The tmp dir is pid-unique so two concurrent cold starts
    cannot interleave truncating writes to the same files."""
    tmp = tmp or f"{path}.{os.getpid()}.tmp"
    os.makedirs(tmp, exist_ok=True)
    if not spilled:
        for i, m in enumerate(ps.mips):
            np.save(os.path.join(tmp, f"mip{i:02d}.npy"), m)
        for i, a in enumerate(ps.albedo_kept):
            np.save(os.path.join(tmp, f"alb{i:02d}.npy"), a)
    np.save(os.path.join(tmp, "maxmap.npy"), ps.maxmap)
    np.save(os.path.join(tmp, "slope.npy"), ps.slope_maps)
    with open(os.path.join(tmp, "meta.json"), "w", encoding="utf-8") as f:
        json.dump({"version": CACHE_VERSION, "n_mips": len(ps.mips),
                   "n_alb": len(ps.albedo_kept),
                   "alb_min_level": ps.alb_min_level,
                   "quantized": ps.quantized, "h_scale": ps.h_scale,
                   "h_offset": ps.h_offset, "h_min": ps.h_min,
                   "a_scale": ps.a_scale}, f)
    os.replace(tmp, path)  # atomic publish: readers never see a partial dir


def load_or_build(elevation: np.ndarray, albedo: np.ndarray,
                  quantized: bool, use_cache: bool) -> PyramidSet:
    """build_pyramids behind the device-ready disk cache.

    use_cache gates the disk round trip (the caller enables it for maps
    big enough that rebuilding dominates start-up).  Cache errors of any
    kind fall back to a rebuild; writes are atomic (tmp dir + rename)."""
    if not use_cache:
        return build_pyramids(elevation, albedo, quantized)
    try:
        path = _cache_path(elevation, albedo, quantized, default_cache_dir())
    except Exception:
        return build_pyramids(elevation, albedo, quantized)
    try:
        if os.path.isdir(path):
            ps = _load_cached(path)
            if ps is not None:
                print(f"  Loaded device-ready pyramids from cache: {path}")
                return ps
    except Exception as e:
        print(f"Warning: pyramid cache read failed ({e}); rebuilding")
    # build with the cache tmp dir as the spill target: finished levels
    # go straight to disk and come back memory-mapped, so a cold build's
    # peak is ~one level of transients, not the whole device-ready set
    tmp = f"{path}.{os.getpid()}.tmp"
    ps = None
    spilled = False
    try:
        os.makedirs(tmp, exist_ok=True)
        ps = build_pyramids(elevation, albedo, quantized, spill_dir=tmp)
        spilled = True
    except OSError as e:
        print(f"Warning: pyramid spill to {tmp} failed ({e}); "
              "building in RAM")
        try:
            import shutil

            shutil.rmtree(tmp)
        except OSError:
            pass
    if ps is None:
        ps = build_pyramids(elevation, albedo, quantized)
    try:
        _save_cached(path, ps, tmp=tmp if spilled else None,
                     spilled=spilled)
        print(f"  Cached device-ready pyramids to {path}")
    except Exception as e:
        print(f"Warning: could not write pyramid cache {path}: {e}")
        return ps
    try:
        # serve the freshly built set memory-mapped from the cache just
        # written: the in-RAM level arrays (~2.9 GB at the bench working
        # set) are freed, and the first run's residency profile matches
        # every later run's
        mapped = _load_cached(path)
        if mapped is not None:
            return mapped
    except Exception:
        pass
    return ps
