"""Cross-chip heightfield band sharding with halo overlap.

HBM scaling for maps bigger than one chip (SURVEY §5's "long-context"
analog; reference equivalent: the destructive ``--downscale`` that fits
the 7.91 GB LDEM onto one GPU, ``/root/reference`` ``main.py:25-29``,
``data_loader.py:169-175``). Instead of downscaling, each device stores a
latitude BAND of the big pyramid levels — rows
``[d*H/N, (d+1)*H/N + HALO)`` — so per-device HBM falls ~N-fold (the
59 m LDEM's ~17 GiB of int16 levels fit 8 v5e chips with room to spare).

Why band sharding is cheap here: rays never read the map directly — the
march/shade kernels only see per-block VMEM windows (``ops/extract.py``),
and a window is ≤ 40 rows tall. With a halo of ``BAND_HALO`` ≥ window
height, every window whose ORIGIN row lies in band ``d`` is fully covered
by ``d``'s band+halo, so each window has exactly one owner. Each device
extracts its owned windows for ALL image blocks (non-owned lanes zeroed)
and one ``psum_scatter`` along the block axis both sums the disjoint
contributions and leaves device ``d`` holding exactly its image strip's
windows — the halo exchange of a classic stencil decomposition collapses
into the static band overlap plus one reduce-scatter over ICI.

The shadow scan stays on its coarse level (≤ 20 Mtexels, replicated;
phi-wedge-sharded separately in ``parallel/tiles.py``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moonrtx_tpu import constants as C
from moonrtx_tpu.engine import blocked
from moonrtx_tpu.engine.camera import CameraBasis
from moonrtx_tpu.engine.render import FrameParams
from moonrtx_tpu.parallel.mesh import TILE_AXIS

# Halo rows appended below each band. Must cover the tallest window
# (WIN_H == AWIN_H == 40); the extraction kernel pads its own aligned
# superwindow slabs internally, so no extra alignment margin is needed.
BAND_HALO = 48


def band_heights(h: int, n_dev: int) -> tuple[int, int]:
    """(rows owned per device, rows stored per device) for an h-row level."""
    if h % n_dev:
        raise ValueError(f"level height {h} not divisible by {n_dev} devices")
    band_h = h // n_dev
    # band_h < BAND_HALO is allowed (bands overlap heavily — no HBM
    # savings, but correct; the parity tests shard small maps this way)
    return band_h, band_h + BAND_HALO


def shard_bands(mesh: Mesh, level: np.ndarray):
    """Stack a level into per-device bands: (n_dev, band_h+HALO, W[, ch]),
    sharded along axis 0 so each device materializes only its own band
    (built through make_array_from_callback — the full level never needs
    to fit a single device).

    The last band's halo rows (past the south edge) are zero-filled;
    window origins never exceed H - WIN_H, so they are never read.
    """
    n_dev = mesh.shape[TILE_AXIS]
    h = level.shape[0]
    band_h, bh = band_heights(h, n_dev)
    shape = (n_dev, bh) + level.shape[1:]
    sharding = NamedSharding(mesh, P(TILE_AXIS))

    def cb(index):
        d = index[0].start or 0
        r0 = d * band_h
        band = np.asarray(level[r0:min(r0 + bh, h)])
        if band.shape[0] < bh:
            band = np.concatenate(
                [band, np.zeros((bh - band.shape[0],) + band.shape[1:],
                                band.dtype)], axis=0)
        return band[None]

    return jax.make_array_from_callback(shape, sharding, cb)


def _mask_blocks(x, own, packed_group: Optional[int]):
    """Zero non-owned windows. x is either (nblk, ...) per-block layout or
    the kernel-packed (ns, GROUP*rows, cols) layout (packed_group)."""
    if packed_group is None:
        return x * own.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    ns, gr, cols = x.shape
    rows = gr // packed_group
    xg = x.reshape(ns, packed_group, rows, cols)
    m = own.reshape(ns, packed_group, 1, 1).astype(x.dtype)
    return (xg * m).reshape(ns, gr, cols)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "height", "width", "h", "w", "ah", "aw",
                     "n_coarse", "use_shadow", "interpret",
                     "h_scale", "h_offset", "a_scale", "return_caches",
                     "use_bg", "max_qexp"),
)
def render_burst_pallas_hfshard(mesh: Mesh, banded_mips, banded_albedo,
                                maxmap, basis: CameraBasis, fp: FrameParams,
                                jitters, height: int, width: int,
                                h: int, w: int, ah: int, aw: int,
                                h_min: float, shadow_map=None,
                                smap_params=None, bounce_map=None,
                                n_samples: int = 8, n_coarse: int = 12,
                                use_shadow: bool = True,
                                interpret: bool = False,
                                h_scale: float = 1.0, h_offset: float = 0.0,
                                a_scale: float = 1.0, slope_maps=None,
                                return_caches: bool = False,
                                background=None, use_bg: bool = False,
                                max_qexp: int = 1):
    """The flagship Pallas burst with the HEIGHTFIELD sharded, not just the
    image: banded_mips/banded_albedo are (n_dev, band_h_k+HALO, W_k[, 3])
    stacks (shard_bands) for the render level and the next-coarser level.
    Returns (rgb_mean, hitbuf) sharded by image rows — plus, with
    return_caches, the per-strip (origins, cache, packed) LEFT SHARDED on
    the devices: once assembled, the strip caches are map-layout-agnostic,
    so the ordinary cached time-step/accumulate programs
    (parallel/tiles.py render_timestep_sharded / render_accumulate_sharded)
    drive interactive stepping on banded scenes with no further touch of
    the banded maps.

    Per device: full-frame ray geometry (replicated math), extraction of
    the windows whose origin row falls in its band, one psum_scatter to
    assemble per-strip window caches, then the fused march/shade burst on
    its own image strip. The small shadow map stays replicated.
    """
    n_dev = mesh.shape[TILE_AXIS]
    strip_h = height // n_dev
    assert strip_h % blocked.BLOCK_H == 0
    nblk_full = (height // blocked.BLOCK_H) * (width // blocked.BLOCK_W)
    assert (nblk_full // n_dev) % blocked.GROUP == 0, (
        "strip block count must fill pallas groups")
    # banded stacks: (n_dev, bh_k, W_k) per level
    band_hs = tuple(int(bm.shape[1]) - BAND_HALO for bm in banded_mips)
    a_band_hs = tuple(int(bm.shape[1]) - BAND_HALO for bm in banded_albedo)
    mip_pad_w = banded_mips[0].shape[2]
    a_pad_w = banded_albedo[0].shape[2]
    use_sh = use_shadow and shadow_map is not None
    use_bounce = bounce_map is not None
    # shard_map operands cannot be None — substitute (never-read) dummies
    dummy = jnp.zeros((1, 1), jnp.float32)
    smap_in = shadow_map if use_sh else dummy
    bmap_in = bounce_map if use_bounce else dummy
    if slope_maps is None:
        # zeros -> sigma == 0, the explicit "no compensation" fallback
        # (same convention as tiles.render_burst_pallas_sharded: without
        # real slope maps, LOD-dropped blocks lose soft_ndotl)
        slope_maps = jnp.zeros((2, 1, 1), jnp.float32)

    def strip(bmips, balb, maxmap, basis, fp, jitters, smap, bmap,
              slope_maps, bg):
        idx = jax.lax.axis_index(TILE_AXIS)
        mips_loc = tuple(bm[0] for bm in bmips)      # (bh_k, W_k)
        alb_loc = tuple(bm[0] for bm in balb)        # (bh_k, W_k, 3)

        # full-frame geometry (every device runs the same cheap math)
        geom = blocked.block_rays(basis, fp.rotation, jitters[0],
                                  height, width, h_min, maxmap=maxmap,
                                  image_dirs=False)
        org = blocked.window_origins(geom, h, w, mip_pad_w, ah, aw,
                                     a_pad_w, max_qexp=max_qexp,
                                     slope_maps=slope_maps)
        qexp = jnp.round(jnp.log2(org.q)).astype(jnp.int32)
        qi = jnp.clip(qexp, 0, len(mips_loc) - 1)
        aqi = jnp.clip(qexp, 0, len(alb_loc) - 1)

        # band-local origins + ownership (one owner per window: the
        # device whose band contains the origin row)
        bh_arr = jnp.asarray(band_hs, jnp.int32)
        abh_arr = jnp.asarray(a_band_hs, jnp.int32)
        r_loc = org.r0 - idx * jnp.take(bh_arr, qi)
        ar_loc = org.ar0 - idx * jnp.take(abh_arr, aqi)
        own_h = (r_loc >= 0) & (r_loc < jnp.take(bh_arr, qi))
        own_a = (ar_loc >= 0) & (ar_loc < jnp.take(abh_arr, aqi))
        org_loc = org._replace(
            r0=jnp.clip(r_loc, 0, jnp.take(bh_arr, qi)),
            ar0=jnp.clip(ar_loc, 0, jnp.take(abh_arr, aqi)))

        cache = blocked.extract_window_cache(
            mips_loc, alb_loc, org_loc,
            h_scale=h_scale, h_offset=h_offset, a_scale=a_scale)
        # zero non-owned lanes, then ONE reduce-scatter assembles the
        # per-strip caches: contributions are disjoint (sum == select)
        # and device d receives exactly its image strip's blocks (blocks
        # are row-major, so strips are contiguous block ranges)
        hwin = _mask_blocks(cache.hwin, own_h, None)
        hmean = cache.hmean * own_h[:, None].astype(cache.hmean.dtype)
        a_packed = cache.awin.ndim == 3
        awin = _mask_blocks(cache.awin, own_a,
                            blocked.GROUP if a_packed else None)
        scat = functools.partial(jax.lax.psum_scatter, axis_name=TILE_AXIS,
                                 scatter_dimension=0, tiled=True)
        cache_s = blocked.WindowCache(hwin=scat(hwin), hmean=scat(hmean),
                                      awin=scat(awin))

        # strip-local slices of the full-frame geometry/origins
        s0 = idx * (nblk_full // n_dev)
        nblk_s = nblk_full // n_dev

        def blk_slice(x):
            return jax.lax.dynamic_slice_in_dim(x, s0, nblk_s, axis=0)

        org_s = blocked.WindowOrigins(*[blk_slice(x) for x in org])
        geom_s = blocked.RayGeom(
            db=blk_slice(geom.db), ob=geom.ob,
            t_enter=blk_slice(geom.t_enter), t_end=blk_slice(geom.t_end),
            hit_outer=blk_slice(geom.hit_outer), dirs_scene=None,
            h_bound=(None if geom.h_bound is None
                     else blk_slice(geom.h_bound)))
        sw = (blocked.build_shadow_windows(
                  smap, smap_params, geom_s,
                  bounce_map=bmap if use_bounce else None)
              if use_sh else None)
        packed = blocked.pack_windows(cache_s, org_s, sw)

        # the burst itself is the shared strip burst (warm-started
        # samples, background compositing) — one implementation for the
        # replicated and banded mesh paths (parallel/tiles.py)
        from moonrtx_tpu.parallel.tiles import _strip_burst
        rgb, hitbuf = _strip_burst(
            packed, smap_params, bg if use_bg else None, maxmap, basis,
            fp, jitters, strip_h, width, height, idx * strip_h, h, w,
            ah, aw, h_min, n_samples, n_coarse, use_sh, interpret)
        if return_caches:
            return rgb, hitbuf, org_s, cache_s, packed
        return rgb, hitbuf

    n_mips = len(banded_mips)
    n_alb = len(banded_albedo)

    def wrap(*flat):
        bmips = flat[:n_mips]
        balb = flat[n_mips:n_mips + n_alb]
        (maxmap, basis, fp, jitters, smap, bmap,
         slope_maps, bg) = flat[n_mips + n_alb:]
        return strip(bmips, balb, maxmap, basis, fp, jitters, smap, bmap,
                     slope_maps, bg)

    bg_in = (background if background is not None
             else jnp.zeros((height, width, 3), jnp.float32))
    in_specs = ((P(TILE_AXIS),) * (n_mips + n_alb)
                + (P(), P(), P(), P(), P(), P(), P(), P(TILE_AXIS)))
    out_specs = ((P(TILE_AXIS),) * 5 if return_caches
                 else (P(TILE_AXIS), P(TILE_AXIS)))
    return shard_map(
        wrap, mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )(*banded_mips, *banded_albedo, maxmap, basis, fp, jitters,
      smap_in, bmap_in, slope_maps, bg_in)
