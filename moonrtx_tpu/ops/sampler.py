"""Bilinear texture sampling kernels.

The renderer's core memory primitive. TPUs have no hardware texture/gather
unit, so arbitrary per-ray fetches are reformulated for the hardware
(SURVEY.md section 7 "hard parts"):

* ``gather_bilinear`` — plain XLA gather. Correct everywhere (CPU tests,
  any backend); slow on TPU (~70 M fetches/s measured on v5e) — the
  correctness-reference path.
* ``window_bilinear`` — blocks of 128 rays share one small VMEM-resident
  window; the bilinear weights become a one-hot row matrix multiplied on
  the MXU, then a masked column reduction on the VPU. Measured ~2.7 G
  samples/s for (32,160) windows on v5e. This is the TPU-native
  "gather = one-hot matmul" formulation.
* ``extract_windows`` — per-block window slices from the mip.

Textures are equirectangular with texel-center convention matching the
reference (renderer_navigation.py:574-590): row = (90-lat)/180*H - 0.5,
col = (lon+180)/360*W - 0.5, longitude wrapping via padded columns
(data.mips.pad_lon_wrap), latitude rows clamped at the poles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BLOCK = 128  # rays per window block (one 8x16 pixel tile)


def latlon_to_rowcol(lat_deg, lon_deg, h: int, w: int):
    """Fractional texel coordinates (row, col) on an (h, w) equirect map.

    ``w`` is the UNPADDED width; callers sample a map padded with wrapped
    columns so col may validly reach w + pad - 1.
    """
    row = (90.0 - lat_deg) / 180.0 * h - 0.5
    col = ((lon_deg + 180.0) % 360.0) / 360.0 * w - 0.5
    # col in [-0.5, w-0.5); shift the seam texel into the padded region
    col = jnp.where(col < 0.0, col + w, col)
    return row, col


def gather_bilinear(tex, row, col):
    """XLA-gather bilinear sampling.

    tex: (H, Wp) or (H, Wp, C) (Wp = padded width); row/col: any shape.
    Rows clamp at the poles; columns assume the padded layout (no wrap here).
    """
    h = tex.shape[0]
    wp = tex.shape[1]
    r0 = jnp.clip(jnp.floor(row).astype(jnp.int32), 0, h - 2)
    c0 = jnp.clip(jnp.floor(col).astype(jnp.int32), 0, wp - 2)
    fr = jnp.clip(row - r0, 0.0, 1.0)
    fc = jnp.clip(col - c0, 0.0, 1.0)
    if tex.ndim == 2:
        flat = tex.reshape(-1)
        def g(r, c):
            return jnp.take(flat, r * wp + c)
        fr_ = fr
        fc_ = fc
    else:
        c = tex.shape[2]
        flat = tex.reshape(-1, c)
        def g(r, cc):
            return jnp.take(flat, r * wp + cc, axis=0)
        fr_ = fr[..., None]
        fc_ = fc[..., None]
    return (g(r0, c0) * (1 - fr_) * (1 - fc_)
            + g(r0 + 1, c0) * fr_ * (1 - fc_)
            + g(r0, c0 + 1) * (1 - fr_) * fc_
            + g(r0 + 1, c0 + 1) * fr_ * fc_)


def extract_windows(tex, r0, c0, wh: int, ww: int):
    """Per-block windows tex[r0[b]:r0[b]+wh, c0[b]:c0[b]+ww] via vmapped
    dynamic_slice. r0/c0: (NBLK,) int32, pre-clamped to valid range."""
    if tex.ndim == 2:
        def ex(r, c):
            return jax.lax.dynamic_slice(tex, (r, c), (wh, ww))
    else:
        ch = tex.shape[2]
        def ex(r, c):
            return jax.lax.dynamic_slice(tex, (r, c, 0), (wh, ww, ch))
    return jax.vmap(ex)(r0, c0)


def window_bilinear(windows, wy, wx, mix_dtype=None):
    """MXU one-hot bilinear sampling from per-block windows.

    windows: (NBLK, WH, WW) or (NBLK, WH, WW, C)
    wy, wx:  (NBLK, B) window-local fractional coords (clamped to the window)
    returns  (NBLK, B) or (NBLK, B, C)

    mix_dtype: dtype of the (NBLK, B, WW) row-mix intermediate — the
    call's dominant memory traffic (gigabytes at shadow-scan shapes).
    bf16 is safe whenever the window values are small residuals
    (mean-centered), costing ~4e-3 relative on values ~1e-3.
    """
    wh = windows.shape[1]
    ww = windows.shape[2]
    wy = jnp.clip(wy, 0.0, wh - 1.001)
    wx = jnp.clip(wx, 0.0, ww - 1.001)
    y0 = jnp.floor(wy)
    x0 = jnp.floor(wx)
    fy = wy - y0
    fx = wx - x0

    rows = jax.lax.broadcasted_iota(jnp.float32, (1, 1, wh), 2)
    wr = (jnp.where(rows == y0[..., None], 1.0 - fy[..., None], 0.0)
          + jnp.where(rows == y0[..., None] + 1.0, fy[..., None], 0.0))  # (NBLK,B,WH)
    cols = jax.lax.broadcasted_iota(jnp.float32, (1, 1, ww), 2)
    wc = (jnp.where(cols == x0[..., None], 1.0 - fx[..., None], 0.0)
          + jnp.where(cols == x0[..., None] + 1.0, fx[..., None], 0.0))  # (NBLK,B,WW)

    if windows.ndim == 3:
        rowmix = jnp.einsum("nbh,nhw->nbw", wr, windows,
                            preferred_element_type=(mix_dtype
                                                    or jnp.float32))
        return jnp.sum(rowmix.astype(jnp.float32) * wc, axis=-1)
    ch = windows.shape[3]
    flatw = windows.reshape(windows.shape[0], wh, ww * ch)
    rowmix = jnp.einsum("nbh,nhw->nbw", wr, flatw,
                        preferred_element_type=jnp.float32)
    rowmix = rowmix.reshape(wr.shape[0], wr.shape[1], ww, ch)
    return jnp.sum(rowmix * wc[..., None], axis=-2)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def sample_latlon(tex, lat_deg, lon_deg, h: int, w: int):
    """Convenience: gather-backend sample at lat/lon on a padded map."""
    row, col = latlon_to_rowcol(lat_deg, lon_deg, h, w)
    return gather_bilinear(tex, row, col)


def block_footprint(rows, cols, wrap_w):
    """(r_mid, c_mid, r_span, c_span) of per-block footprints; seam-aware.

    wrap_w may be a scalar or a per-block (NBLK,) array (strided blocks).
    Blocks whose column range exceeds half the wrap width are treated as
    straddling the longitude (or scan phi=0) seam: their low columns are
    unwrapped by +wrap_w before the midpoint/span are taken."""
    ax = tuple(range(1, rows.ndim))
    wrap_w = jnp.asarray(wrap_w, cols.dtype)
    wrap_b = (wrap_w.reshape(wrap_w.shape + (1,) * (cols.ndim - 1))
              if wrap_w.ndim else wrap_w)
    c_min = jnp.min(cols, axis=ax)
    c_max = jnp.max(cols, axis=ax)
    spans_seam = (c_max - c_min) > (jnp.min(wrap_w) * 0.5)
    exp = spans_seam.reshape(spans_seam.shape + (1,) * (cols.ndim - 1))
    cols_adj = jnp.where(exp & (cols < wrap_b * 0.5), cols + wrap_b, cols)
    c_min = jnp.min(cols_adj, axis=ax)
    c_max = jnp.max(cols_adj, axis=ax)
    r_min = jnp.min(rows, axis=ax)
    r_max = jnp.max(rows, axis=ax)
    return (0.5 * (r_min + r_max), 0.5 * (c_min + c_max),
            r_max - r_min, c_max - c_min)


def window_origin_from_footprint(rows, cols, wrap_w, win_h: int, win_w: int,
                                 map_h, map_pad_w):
    """Window origins covering per-ray (row, col) footprints; seam-aware.
    rows/cols: (NBLK, ...) any trailing shape; map_h/map_pad_w may be
    per-block arrays (strided blocks clamp against the coarser level)."""
    r_mid, c_mid, _, _ = block_footprint(rows, cols, wrap_w)
    r0 = jnp.clip((r_mid - win_h * 0.5).astype(jnp.int32),
                  0, (map_h - win_h).astype(jnp.int32)
                  if hasattr(map_h, "astype") else map_h - win_h)
    c0 = jnp.clip((c_mid - win_w * 0.5).astype(jnp.int32),
                  0, (map_pad_w - win_w).astype(jnp.int32)
                  if hasattr(map_pad_w, "astype") else map_pad_w - win_w)
    return r0, c0
