"""Fused Pallas march+shade kernel — the production render path.

One program per GROUP of 8 horizontally-adjacent 8x16-pixel blocks
(an 8x128-pixel strip): every per-ray tensor is a native (8, 128) VPU
register tile, with one sampling window per sublane-block contracted by a
batched MXU dot. The entire intersection march, bisection, normal
estimation, albedo lookup, shadow lookup and Lambert shading run in VMEM
with zero HBM intermediates — the XLA blocked backend materializes the
one-hot weight and row-mix tensors in HBM every field evaluation.

Bilinear sampling = hat-function weights relu(1 - |iota - x|) (exactly the
bilinear kernel) against mean-centered windows in bfloat16 (see
engine.blocked.extract_window_cache for the exactness argument).

Mosaic notes (this environment's compiler, determined empirically):
* iota must be integer dtype, cast after;
* dynamic ref slicing with computed scalars crashes the compiler — all
  per-block values stream in as lane-broadcast (8, 128) vectors instead;
* batched dot_general (8,128,K)@(8,K,N) and 3D elementwise are supported.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moonrtx_tpu import constants as C
from moonrtx_tpu.engine import blocked

G = blocked.GROUP            # 8 blocks per program
B = blocked.BLOCK            # 128 rays per block
WH = blocked.WIN_H
WW = blocked.WIN_W
AH = blocked.AWIN_H
AW = blocked.AWIN_W
SH = blocked.SWIN_H
SW = blocked.SWIN_W

RAD2DEG = 180.0 / math.pi
DEG2RAD = math.pi / 180.0

# Max march points per wide field evaluation (field_multi): each point
# adds ~330 KB of VMEM transients (bf16 hat + f32 mix/product tiles at
# m*128 lanes), so 7 keeps the whole wide pass ~4 MB — comfortably inside
# one core's ~16 MB VMEM next to the window tiles and the pipeline's
# double buffers. The 14-point cold march runs as two wide passes.
_WIDE_CHUNK = max(1, int(os.environ.get("MOONRTX_WIDE_CHUNK", "7")))

# params vector layout (27, 128) broadcast rows:
#  0-2 ob xyz | 3-5 light xyz (body) | 6 irradiance | 7 n_smap_coarse
#  8 n_smap_fine | 9 n_phi | 10-12 sun axis z | 13-15 sun axis x
#  16 pixel angular size (for the footprint-matched normal stencil)
#  17-18 albedo level rows/cols (the albedo pyramid may start coarser
#  than the heightfield — engine.scene alb_min_level)
#  19 lunar-Lambert blend L(alpha) (0 = pure Lambert; engine/light.py
#  lunar_lambert_blend, engine/render.py shade_lambert)
#  20-22 earth dir (body) | 23 earth distance (scene units) | 24 earth
#  angular radius rad (0 = eclipse shading off) | 25 sun angular radius
#  rad | 26 earthshine irradiance relative to direct sunlight (0 = off)
#  — Earth-dependent light terms (engine/render.py earth_light_terms)
N_PARAMS = 27


def _atan2(y, x):
    """Vector atan2 (Mosaic has no atan2 lowering): octant reduction plus a
    degree-11 odd minimax polynomial, ~1e-6 rad max error — far below a
    texel (~1e-3 rad) at any supported mip level."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    a = lo / jnp.maximum(hi, 1e-30)
    s = a * a
    r = a * (0.99997726 + s * (-0.33262347 + s * (0.19354346 + s * (
        -0.11643287 + s * (0.05265332 + s * (-0.01172120))))))
    r = jnp.where(ay > ax, 0.5 * math.pi - r, r)
    r = jnp.where(x < 0.0, math.pi - r, r)
    return jnp.where(y < 0.0, -r, r)


def _hat_t(x, n: int):
    """(G, n, L) bilinear hat weights from (G, L) coords (L = B, or m*B
    for a wide multi-point evaluation).

    The window dimension sits on SUBLANES and rays on LANES so every
    elementwise op runs at full 128-lane width (putting the window dim on
    lanes measured ~4x slower on v5e)."""
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (x.shape[0], n, x.shape[-1]), 1).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(rows - x[:, None, :]))


def _bsample(win8, wy, wx, n_h: int, n_w: int):
    """Batched bilinear: win8 (G, n_h, n_w) bf16, coords (G, B) -> (G, B).

    Columns contract on the MXU first (K = n_w = 64 fills the systolic
    array better than n_h = 40), rows reduce on the VPU (over 40 instead
    of 64 terms); rays stay on lanes throughout."""
    wy = jnp.clip(wy, 0.0, n_h - 1.001)
    wx = jnp.clip(wx, 0.0, n_w - 1.001)
    wc = _hat_t(wx, n_w).astype(jnp.bfloat16)          # (G, n_w, B)
    mixt = jax.lax.dot_general(win8, wc, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)  # (G,n_h,B)
    wr = _hat_t(wy, n_h)                                # (G, n_h, B)
    return jnp.sum(mixt * wr, axis=1)


def _make_kernel(h: int, w: int, n_coarse: int, n_bisect: int,
                 use_shadow: bool, use_earth: bool = True,
                 warm: bool = False, wide: bool = True):
    def kernel(params_ref, dbx_ref, dby_ref, dbz_ref, t0_ref, t1_ref,
               act_ref, *rest):
        if warm:
            (tprev_ref, fprev_ref, scal_ref, hwin_ref, awin_ref, swin_ref,
             r_ref, g_ref, b_ref, hit_ref, thit_ref,
             px_ref, py_ref, pz_ref,
             found_s, tlo_s, thi_s, flo_s, fhi_s) = rest
        else:
            (scal_ref, hwin_ref, awin_ref, swin_ref,
             r_ref, g_ref, b_ref, hit_ref, thit_ref,
             px_ref, py_ref, pz_ref) = rest
        def P(i):
            # params arrive as lane/sublane-broadcast (8, 128) planes:
            # scalar VMEM reads lower to slow gather+broadcast chains
            return params_ref[i]

        obx, oby, obz = P(0), P(1), P(2)
        lxp, lyp, lzp = P(3), P(4), P(5)
        irradiance = P(6)

        # per-block lane-broadcast scalars (G, B): 0 r0 | 1 c0 | 2 hmean
        # | 3 q | 4 ar0 | 5 ac0 | 6 sr0 | 7 sc0 | 8 sq | 9 sigma (LOD
        # roughness compensation, engine.render.soft_ndotl)
        r0 = scal_ref[0, 0]
        c0 = scal_ref[0, 1]
        hmean = scal_ref[0, 2]
        q = scal_ref[0, 3]
        ar0 = scal_ref[0, 4]
        ac0 = scal_ref[0, 5]
        sr0 = scal_ref[0, 6]
        sc0 = scal_ref[0, 7]
        sq = scal_ref[0, 8]
        sigma = scal_ref[0, 9]

        dbx = dbx_ref[0]
        dby = dby_ref[0]
        dbz = dbz_ref[0]
        t_enter = t0_ref[0]
        t_end = t1_ref[0]
        active = act_ref[0] > 0.5
        span = t_end - t_enter

        hwin = hwin_ref[0].reshape(G, WH, WW).astype(jnp.bfloat16)

        def latlon(px, py, pz):
            lat = _atan2(pz, jnp.sqrt(jnp.maximum(px * px + py * py, 1e-20)))
            lon = _atan2(px, -py)
            return lat, lon

        def hcoords(lat, lon):
            row = (90.0 - lat * RAD2DEG) * (h / 180.0) - 0.5
            lon_w = lon * RAD2DEG + 180.0
            lon_w = lon_w - 360.0 * jnp.floor(lon_w / 360.0)
            col = lon_w * (w / 360.0) - 0.5
            col = jnp.where(col < 0.0, col + w, col)
            row = (row + 0.5) / q - 0.5
            col = (col + 0.5) / q - 0.5
            col = jnp.where(col < c0 - 0.5, col + w / q, col)
            return row - r0, col - c0

        def height_at(lat, lon):
            wy, wx = hcoords(lat, lon)
            return _bsample(hwin, wy, wx, WH, WW) + hmean

        def field(t):
            px = obx + t * dbx
            py = oby + t * dby
            pz = obz + t * dbz
            lat, lon = latlon(px, py, pz)
            r = jnp.sqrt(px * px + py * py + pz * pz)
            return r - C.MOON_RADIUS * height_at(lat, lon)

        def field_multi(ts):
            """Field at several march points in ONE wide bilinear pass.

            The march's serial bottleneck is not FLOPs (docs/PERF.md
            roofline: ~8% MXU) but the dependence chain of consecutive
            field evaluations. Coarse-march points depend only on k —
            never on each other — so their window coordinates concatenate
            on LANES (m*B wide) and one hat construction + one MXU
            contraction evaluates all of them in parallel. Per-column
            math is exactly `field`'s (concat/slice round-trip; dot and
            row-reduce treat columns independently), so results are
            bit-identical to the serial loop. Chunked to _WIDE_CHUNK
            points to bound VMEM transients (~330 KB/point at bf16 hats)."""
            out = []
            for i in range(0, len(ts), _WIDE_CHUNK):
                grp = ts[i:i + _WIDE_CHUNK]
                if len(grp) == 1:
                    out.append(field(grp[0]))
                    continue
                pts = [(obx + t * dbx, oby + t * dby, obz + t * dbz)
                       for t in grp]
                lls = [latlon(px, py, pz) for px, py, pz in pts]
                wcs = [hcoords(la, lo) for la, lo in lls]
                wy = jnp.concatenate([c[0] for c in wcs], axis=1)
                wx = jnp.concatenate([c[1] for c in wcs], axis=1)
                hcat = _bsample(hwin, wy, wx, WH, WW)      # (G, m*B)
                for k, (px, py, pz) in enumerate(pts):
                    r = jnp.sqrt(px * px + py * py + pz * pz)
                    out.append(r - C.MOON_RADIUS
                               * (hcat[:, k * B:(k + 1) * B] + hmean))
            return out

        activef = jnp.where(active, 1.0, 0.0)

        def coarse_serial():
            # wide=False reference: the original one-field-eval-per-
            # fori_loop-iteration march, kept for in-process perf A/Bs
            # (tools/bench_widemarch.py) — the serialization it imposes
            # is exactly what the wide march removes.
            def coarse(k, carry):
                found, t_lo, t_hi, f_lo, f_hi, f_back = carry
                frac = (k + 0.5) / n_coarse
                t_k = t_enter + span * frac
                f_k = field(t_k)
                newly = ((1.0 - found) * jnp.where(f_k < 0.0, 1.0, 0.0)
                         * activef)
                t_prev = t_enter + span * jnp.maximum(
                    frac - 1.0 / n_coarse, 0.0)
                new = newly > 0.5
                return (jnp.maximum(found, newly),
                        jnp.where(new, t_prev, t_lo),
                        jnp.where(new, t_k, t_hi),
                        jnp.where(new, f_back, f_lo),
                        jnp.where(new, f_k, f_hi),
                        f_k)

            return jax.lax.fori_loop(
                0, n_coarse + 1, coarse,
                (found0, t_enter, t_end, jnp.ones_like(t_enter),
                 -jnp.ones_like(t_enter), field(t_enter)))

        def coarse_march():
            # All n_coarse+2 points (the t_enter seed + the march samples)
            # evaluate in wide parallel passes — the points depend only on
            # k, so nothing forces the old one-eval-per-loop-iteration
            # serialization. The first-crossing bookkeeping then runs as
            # an unrolled chain of cheap (G, B) selects over the
            # precomputed field values. f at t_enter seeds f_back for a
            # k=0 hit (the chord bound often starts just above the
            # surface, so first-cell hits are common at grazing framings).
            if not wide:
                return coarse_serial()
            fracs = [(k + 0.5) / n_coarse for k in range(n_coarse + 1)]
            fs = field_multi([t_enter] + [t_enter + span * fr
                                          for fr in fracs])
            found, t_lo, t_hi = found0, t_enter, t_end
            f_lo = jnp.ones_like(t_enter)
            f_hi = -jnp.ones_like(t_enter)
            f_back = fs[0]
            for k in range(n_coarse + 1):
                # found is a f32 mask (bool vector loop carriers fail to
                # legalize in this Mosaic build); f_lo/f_hi track the
                # field at the bracket ends for the false-position
                # refinement, f_back is the previous step's field value
                frac = fracs[k]
                t_k = t_enter + span * frac
                f_k = fs[k + 1]
                newly = ((1.0 - found) * jnp.where(f_k < 0.0, 1.0, 0.0)
                         * activef)
                t_prev = t_enter + span * max(frac - 1.0 / n_coarse, 0.0)
                new = newly > 0.5
                found = jnp.maximum(found, newly)
                t_lo = jnp.where(new, t_prev, t_lo)
                t_hi = jnp.where(new, t_k, t_hi)
                f_lo = jnp.where(new, f_back, f_lo)
                f_hi = jnp.where(new, f_k, f_hi)
                f_back = f_k
            return found, t_lo, t_hi, f_lo, f_hi, f_back

        found0 = jnp.zeros((G, B), jnp.float32)
        if warm:
            # Warm start from the previous accumulation sample: the jitter
            # moves each ray by <= ~1.5 px, so its hit distance moves far
            # less than one coarse step except across silhouettes. Bracket
            # [t_prev - d, t_prev + d] (d = one coarse step) and verify it
            # straddles the surface; if EVERY active ray of the strip
            # brackets, the 13-eval coarse loop is skipped for the whole
            # strip (one extra refinement iteration compensates the 2x
            # wider warm bracket). Strips containing a
            # previously-missed active ray or a failed bracket (limb,
            # silhouette, terminator-grazing geometry) run the full cold
            # march — bitwise the same result as a cold sample there.
            # Known approximation: a NEARER surface crossing that enters
            # the chord entirely before t_prev - d (a thin occluder more
            # than one coarse step in front of the old hit, newly clipped
            # by the sub-pixel jitter) leaves f(t_a) > 0 and is not
            # detected — the strip refines to the old, farther root.
            # Bounded by the accumulation restart on any scene change
            # (sample 1 is always cold); measured p99 relative pixel
            # delta vs cold is 6.7e-4 on real terrain (docs/PERF.md).
            t_prev = tprev_ref[0]
            f_prev = fprev_ref[0]
            delta = span * (1.0 / n_coarse)
            t_a = jnp.maximum(t_prev - delta, t_enter)
            t_b = jnp.minimum(t_prev + delta, t_end)
            if wide:
                f_a, f_b = field_multi([t_a, t_b])
            else:
                f_a = field(t_a)
                f_b = field(t_b)
            good = (jnp.where(f_a > 0.0, 1.0, 0.0)
                    * jnp.where(f_b < 0.0, 1.0, 0.0) * f_prev)
            n_bad = jnp.sum(activef * (1.0 - good))

            @pl.when(n_bad < 0.5)
            def _():
                found_s[...] = activef
                tlo_s[...] = t_a
                thi_s[...] = t_b
                flo_s[...] = f_a
                fhi_s[...] = f_b

            @pl.when(n_bad >= 0.5)
            def _():
                fnd, lo, hi, flo, fhi, _fb = coarse_march()
                found_s[...] = fnd
                tlo_s[...] = lo
                thi_s[...] = hi
                flo_s[...] = flo
                fhi_s[...] = fhi

            foundf = found_s[...]
            t_lo = tlo_s[...]
            t_hi = thi_s[...]
            f_lo = flo_s[...]
            f_hi = fhi_s[...]
        else:
            foundf, t_lo, t_hi, f_lo, f_hi, _fb = coarse_march()
        found = foundf > 0.5

        # Strips with no surviving hit (sky, or active rays that all
        # miss past the limb) write zeros directly and skip bisection,
        # the normal stencil, texture lookups and lighting — at typical
        # framings a large share of the frame. Bit-identical: every
        # output below is where(hitf, ., 0) and hitf is all-false here.
        nf = jnp.sum(foundf)

        @pl.when(nf < 0.5)
        def _():
            zero = jnp.zeros((G, B), jnp.float32)
            for ref in (r_ref, g_ref, b_ref, hit_ref, thit_ref,
                        px_ref, py_ref, pz_ref):
                ref[0] = zero

        @pl.when(nf >= 0.5)
        def _():

            # Root refinement: Illinois false position (secant with
            # unconditional endpoint halving; the bracket invariant
            # f_lo > 0 > f_hi holds by construction). The field along a
            # ray is piecewise-smooth, so the secant converges fast where
            # bisection is fixed-rate; the final estimate is the secant of
            # the last bracket, not its midpoint. Measured vs a converged
            # root at 3 iterations: median error 0 (exact to f32), p99
            # bracket/20 (~60 m), worst case ~1 bracket (~1 km, grazing
            # cliff rays where the secant stalls) — every consumer
            # tolerates that (the reference calls 0.5 km shadow error
            # "below perception", moon_renderer.py:72-75) and the image
            # delta vs converged stays under half an 8-bit pixel quantum,
            # at half the field evaluations of 6 bisections.
            # Measured alternative, for the record (2026-08-20): TWO wide
            # 6-point subdivision rounds via field_multi (2 serial rounds,
            # error bound bracket/49) are ~10% SLOWER than these 3-4
            # serial single-point iterations — refinement evals are
            # VPU-throughput-bound, not latency-bound, so tripling the
            # evaluated points loses more than the shorter chain gains
            # (the wide coarse march above wins precisely because it
            # batches the SAME evaluation count).
            def illinois(_, carry):
                t_lo, t_hi, f_lo, f_hi = carry
                denom = jnp.minimum(f_hi - f_lo, -1e-30)
                t_m = jnp.clip(t_lo - f_lo * (t_hi - t_lo) / denom,
                               t_lo, t_hi)
                f_m = field(t_m)
                out = f_m > 0.0
                return (jnp.where(out, t_m, t_lo),
                        jnp.where(out, t_hi, t_m),
                        jnp.where(out, f_m, 0.5 * f_lo),
                        jnp.where(out, 0.5 * f_hi, f_m))

            t_lo2, t_hi2, f_lo2, f_hi2 = jax.lax.fori_loop(
                0, n_bisect + (1 if warm else 0), illinois,
                (t_lo, t_hi, f_lo, f_hi))
            den2 = jnp.minimum(f_hi2 - f_lo2, -1e-30)
            t_hit = jnp.clip(t_lo2 - f_lo2 * (t_hi2 - t_lo2) / den2,
                             t_lo2, t_hi2)

            px = obx + t_hit * dbx
            py = oby + t_hit * dby
            pz = obz + t_hit * dbz
            lat, lon = latlon(px, py, pz)

            # normal: central differences with a footprint-matched per-ray step
            # (engine.blocked.normal_step_texels) — continuous across per-block
            # stride (q) seams, unlike a fixed half-texel at each block's level
            pix_ang = P(16)
            inv_p = jax.lax.rsqrt(jnp.maximum(px * px + py * py + pz * pz, 1e-20))
            cosv = jnp.maximum(jnp.abs((px * dbx + py * dby + pz * dbz) * inv_p),
                               0.05)
            arc = t_hit * pix_ang / (C.MOON_RADIUS * cosv)
            step = jnp.clip(0.5 * arc * (h / math.pi) / q, 0.5, 3.0)
            dlat = (math.pi / h) * q * step
            coslat = jnp.maximum(jnp.cos(lat), 0.05)
            dlon = dlat / coslat

            def sxyz(la, lo, hv):
                rr = C.MOON_RADIUS * hv
                cl = jnp.cos(la)
                return rr * cl * jnp.sin(lo), -rr * cl * jnp.cos(lo), rr * jnp.sin(la)

            # Stencil heights with shared MXU mixes: east/west share one row
            # mix (same latitude), north/south share one transposed column mix
            # (same longitude) — 2 contractions + 6 hat tensors instead of the
            # naive 4 + 8.
            wy_c, wx_e = hcoords(lat, lon + dlon)
            _, wx_w = hcoords(lat, lon - dlon)
            wy_n, wx_c = hcoords(lat + dlat, lon)
            wy_s, _ = hcoords(lat - dlat, lon)
            wr_c = _hat_t(jnp.clip(wy_c, 0.0, WH - 1.001), WH).astype(jnp.bfloat16)
            mix_ew = jax.lax.dot_general(hwin, wr_c, (((1,), (1,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)
            h_e = jnp.sum(mix_ew * _hat_t(jnp.clip(wx_e, 0.0, WW - 1.001), WW),
                          axis=1) + hmean
            h_w = jnp.sum(mix_ew * _hat_t(jnp.clip(wx_w, 0.0, WW - 1.001), WW),
                          axis=1) + hmean
            wc_c = _hat_t(jnp.clip(wx_c, 0.0, WW - 1.001), WW).astype(jnp.bfloat16)
            mix_ns = jax.lax.dot_general(hwin, wc_c, (((2,), (1,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)
            h_n = jnp.sum(mix_ns * _hat_t(jnp.clip(wy_n, 0.0, WH - 1.001), WH),
                          axis=1) + hmean
            h_s = jnp.sum(mix_ns * _hat_t(jnp.clip(wy_s, 0.0, WH - 1.001), WH),
                          axis=1) + hmean
            e = sxyz(lat, lon + dlon, h_e)
            w_ = sxyz(lat, lon - dlon, h_w)
            n_ = sxyz(lat + dlat, lon, h_n)
            s_ = sxyz(lat - dlat, lon, h_s)
            ax, ay, az = e[0] - w_[0], e[1] - w_[1], e[2] - w_[2]
            bx, by, bz = n_[0] - s_[0], n_[1] - s_[1], n_[2] - s_[2]
            nX = ay * bz - az * by
            nY = az * bx - ax * bz
            nZ = ax * by - ay * bx
            inv = jax.lax.rsqrt(jnp.maximum(nX * nX + nY * nY + nZ * nZ, 1e-20))
            nX, nY, nZ = nX * inv, nY * inv, nZ * inv
            sgn = jnp.where(nX * px + nY * py + nZ * pz < 0.0, -1.0, 1.0)
            nX, nY, nZ = nX * sgn, nY * sgn, nZ * sgn

            # albedo (channel-major window columns R|G|B); the albedo level may
            # be coarser than the height level (params 17/18)
            ah2 = P(17)
            aw2 = P(18)
            arow = (90.0 - lat * RAD2DEG) * (ah2 / 180.0) - 0.5
            lon_w = lon * RAD2DEG + 180.0
            lon_w = lon_w - 360.0 * jnp.floor(lon_w / 360.0)
            acol = lon_w * (aw2 / 360.0) - 0.5
            acol = jnp.where(acol < 0.0, acol + aw2, acol)
            arow = (arow + 0.5) / q - 0.5
            acol = (acol + 0.5) / q - 0.5
            acol = jnp.where(acol < ac0 - 0.5, acol + aw2 / q, acol)
            awy = jnp.clip(arow - ar0, 0.0, AH - 1.001)
            awx = jnp.clip(acol - ac0, 0.0, AW - 1.001)
            awin = awin_ref[0].reshape(G, AH, 3 * AW).astype(jnp.bfloat16)
            awr = _hat_t(awy, AH).astype(jnp.bfloat16)     # (G, AH, B)
            amix = jax.lax.dot_general(awin, awr, (((1,), (1,)), ((0,), (0,))),
                                       preferred_element_type=jnp.float32)
            # amix: (G, 3*AW, B); channel-major column groups R|G|B
            awc = _hat_t(awx, AW)                           # (G, AW, B)
            alb_r = jnp.sum(amix[:, 0 * AW:1 * AW] * awc, axis=1)
            alb_g = jnp.sum(amix[:, 1 * AW:2 * AW] * awc, axis=1)
            alb_b = jnp.sum(amix[:, 2 * AW:3 * AW] * awc, axis=1)

            # shadow factor + one-bounce irradiance (the swin window holds both
            # maps side by side: columns [0, SW) shadow, [SW, 2*SW) bounce; one
            # MXU row-mix samples both, exactly like the channel-major albedo)
            if use_shadow:
                rows_c, rows_f, n_phi = P(7), P(8), P(9)
                szx, szy, szz = P(10), P(11), P(12)
                sxx, sxy, sxz = P(13), P(14), P(15)
                syx = szy * sxz - szz * sxy
                syy = szz * sxx - szx * sxz
                syz = szx * sxy - szy * sxx
                zc = px * szx + py * szy + pz * szz
                xc = px * sxx + py * sxy + pz * sxz
                yc = px * syx + py * syy + pz * syz
                rho = jnp.sqrt(jnp.maximum(xc * xc + yc * yc, 1e-20))
                theta = _atan2(rho, zc) * RAD2DEG
                phi = _atan2(yc, xc)
                phi = jnp.where(phi < 0.0, phi + 2.0 * math.pi, phi)
                srow = jnp.where(theta < 75.0,
                                 theta * (rows_c / 75.0),
                                 rows_c + (theta - 75.0) * ((rows_f - 1.0) / 30.0))
                srow = jnp.minimum(srow, rows_c + rows_f - 1.001)
                scol = phi * (n_phi / (2.0 * math.pi)) - 0.5
                scol = jnp.where(scol < 0.0, scol + n_phi, scol)
                srow = (srow + 0.5) / sq - 0.5
                scol = (scol + 0.5) / sq - 0.5
                scol = jnp.where(scol < sc0 - 0.5, scol + n_phi / sq, scol)
                swin = swin_ref[0].reshape(G, SH, 2 * SW).astype(jnp.bfloat16)
                sy = jnp.clip(srow - sr0, 0.0, SH - 1.001)
                sx = jnp.clip(scol - sc0, 0.0, SW - 1.001)
                swr = _hat_t(sy, SH).astype(jnp.bfloat16)          # (G, SH, B)
                smix = jax.lax.dot_general(
                    swin, swr, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)            # (G, 2*SW, B)
                swc = _hat_t(sx, SW)                               # (G, SW, B)
                shadow = jnp.sum(smix[:, :SW] * swc, axis=1)
                bounce = jnp.sum(smix[:, SW:] * swc, axis=1)
                night = theta * 1.0 >= 105.0
                shadow = jnp.where(night, 0.0, jnp.clip(shadow, 0.0, 1.0))
                bounce = jnp.where(night, 0.0, jnp.maximum(bounce, 0.0))
            else:
                shadow = jnp.ones((G, B), jnp.float32)
                bounce = jnp.zeros((G, B), jnp.float32)

            # Lambert with the area-light irradiance calibration, softened by
            # the block's lost-roughness sigma (engine.render.soft_ndotl): a
            # coarser-LOD block shades as E[max(0, mu + tilt)] so per-block
            # mip-stride transitions carry no brightness seam
            tlx = lxp - px
            tly = lyp - py
            tlz = lzp - pz
            inv_l = jax.lax.rsqrt(jnp.maximum(tlx * tlx + tly * tly + tlz * tlz,
                                              1e-20))
            mu = (nX * tlx + nY * tly + nZ * tlz) * inv_l
            s_eff = sigma * jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0)) + 1e-6
            xs = mu / s_eff
            cdf = 1.0 / (1.0 + jnp.exp(jnp.clip(-1.702 * xs, -60.0, 60.0)))
            pdf = 0.39894228 * jnp.exp(-0.5 * jnp.minimum(xs * xs, 120.0))
            soft = jnp.maximum(mu * cdf + s_eff * pdf, 0.0)
            ndotl = jnp.where(sigma > 1e-6, soft, jnp.maximum(mu, 0.0))
            # lunar-Lambert blend (engine.render.shade_lambert): mu_e from the
            # ray direction already in registers; L=0 is exact Lambert
            lblend = P(19)
            mu_e = jnp.maximum(-(nX * dbx + nY * dby + nZ * dbz), 0.02)
            ls = 2.0 * ndotl / (ndotl + mu_e + 1e-6)
            ndotl = lblend * ls + (1.0 - lblend) * ndotl
            hitf = jnp.logical_and(found, active)
            lum = jnp.where(hitf, irradiance * (ndotl * shadow + bounce), 0.0)

            # Earth-dependent light terms (engine.render.earth_light_terms):
            # lunar-eclipse attenuation (visible-sun fraction against the
            # Earth's disk per shaded point; exactly 1 outside eclipses —
            # coverage self-gates on separation) + earthshine on the night
            # side. Statically compiled out when fp.earth is None (both
            # features off) — ~35 vector ops per pixel per sample saved.
            if use_earth:
                eux, euy, euz = P(20), P(21), P(22)
                edist, e_ang, s_ang = P(23), P(24), P(25)
                evx = eux * edist - px
                evy = euy * edist - py
                evz = euz * edist - pz
                inv_e = jax.lax.rsqrt(jnp.maximum(
                    evx * evx + evy * evy + evz * evz, 1e-20))
                ex_, ey_, ez_ = evx * inv_e, evy * inv_e, evz * inv_e
                # the sun side of the separation uses the MOON-CENTER sun
                # direction: the real sun's ~0.0007 deg/R parallax is
                # negligible, while the per-point direction to the scene
                # light (parked at 2146 R, not 86,000 R) would exaggerate
                # solar parallax ~40x and render the umbra footprint ~11%
                # too large on the surface (the Earth term keeps its true
                # per-point parallax — that IS the moving shadow edge)
                inv_lc = jax.lax.rsqrt(jnp.maximum(
                    lxp * lxp + lyp * lyp + lzp * lzp, 1e-20))
                lx_, ly_, lz_ = lxp * inv_lc, lyp * inv_lc, lzp * inv_lc
                cosd = ex_ * lx_ + ey_ * ly_ + ez_ * lz_
                crx = ey_ * lz_ - ez_ * ly_
                cry = ez_ * lx_ - ex_ * lz_
                crz = ex_ * ly_ - ey_ * lx_
                sind = jnp.sqrt(jnp.maximum(
                    crx * crx + cry * cry + crz * crz, 0.0))
                sep = _atan2(sind, cosd)

                def acos_(x):
                    return _atan2(jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)), x)

                d = jnp.clip(sep, jnp.abs(e_ang - s_ang) + 1e-7,
                             s_ang + e_ang - 1e-7)
                c1 = jnp.clip((d * d + s_ang * s_ang - e_ang * e_ang)
                              / (2.0 * d * s_ang), -1.0, 1.0)
                c2 = jnp.clip((d * d + e_ang * e_ang - s_ang * s_ang)
                              / (2.0 * d * e_ang), -1.0, 1.0)
                tri = ((-d + s_ang + e_ang) * (d + s_ang - e_ang)
                       * (d - s_ang + e_ang) * (d + s_ang + e_ang))
                lens = (s_ang * s_ang * acos_(c1) + e_ang * e_ang * acos_(c2)
                        - 0.5 * jnp.sqrt(jnp.maximum(tri, 0.0)))
                cov = lens / (math.pi * s_ang * s_ang)
                cov = jnp.where(sep >= s_ang + e_ang, 0.0, cov)
                cov = jnp.where(sep <= e_ang - s_ang, 1.0, cov)
                cov = jnp.clip(cov, 0.0, 1.0)
                fvis = 1.0 - cov

                # earthshine (da Vinci glow): Lambert toward the Earth,
                # additive, not attenuated by the eclipse factor (earthlight
                # is not blocked by the Earth); e_dir is already in registers
                mu_e_dir = jnp.maximum(nX * ex_ + nY * ey_ + nZ * ez_, 0.0)
                lum_es = jnp.where(hitf, irradiance * P(26) * mu_e_dir, 0.0)
            else:
                fvis, cov = 1.0, 0.0
                lum_es = 0.0

            r_ref[0] = alb_r * (lum * (fvis + cov * C.UMBRA_TINT[0]) + lum_es)
            g_ref[0] = alb_g * (lum * (fvis + cov * C.UMBRA_TINT[1]) + lum_es)
            b_ref[0] = alb_b * (lum * (fvis + cov * C.UMBRA_TINT[2]) + lum_es)
            hit_ref[0] = hitf.astype(jnp.float32)
            thit_ref[0] = jnp.where(hitf, t_hit, 0.0)
            px_ref[0] = jnp.where(hitf, px, 0.0)
            py_ref[0] = jnp.where(hitf, py, 0.0)
            pz_ref[0] = jnp.where(hitf, pz, 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("h", "w", "n_coarse", "n_bisect",
                                             "use_shadow", "use_earth",
                                             "interpret", "wide"))
def march_shade_pallas(params, dbx, dby, dbz, t_enter, t_end, active, scal,
                       hwin, awin_cm, swin,
                       h: int, w: int, n_coarse: int = 12,
                       n_bisect: int = 3, use_shadow: bool = True,
                       use_earth: bool = True,
                       interpret: bool = False,
                       t_prev=None, f_prev=None, wide: bool = True):
    """Fused march+shade over all block groups.

    params: (N_PARAMS, G, B) f32, planes broadcast (see layout above)
    dbx/dby/dbz, t_enter, t_end, active: (NSUPER, G, B)
    scal: (NSUPER, N_SCAL=10, G, B) lane-broadcast per-block scalars
    hwin: (NSUPER, G*WH, WW); awin_cm: (NSUPER, G*AH, 3*AW) channel-major;
    swin: (NSUPER, G*SH, 2*SW) shadow | bounce column halves
    t_prev/f_prev (optional, both or neither): the previous accumulation
    sample's hit distance / hit mask, (NSUPER, G, B) — enables the
    warm-start march (strips whose rays all bracket their previous hit
    skip the coarse loop; see _make_kernel).
    n_bisect counts Illinois false-position refinement iterations (the
    name is historical); 3 of them + the final secant land tighter than
    the previous 6 bisections + midpoint at half the field evaluations.
    Returns (r, g, b, hit, t_hit, px, py, pz) each (NSUPER, G, B).
    """
    nsuper = dbx.shape[0]
    warm = t_prev is not None
    kernel = _make_kernel(h, w, n_coarse, n_bisect, use_shadow, use_earth,
                          warm=warm, wide=wide)

    ray_spec = pl.BlockSpec((1, G, B), lambda i: (i, 0, 0))
    out_shapes = [jax.ShapeDtypeStruct((nsuper, G, B), jnp.float32)] * 8
    in_specs = [
        pl.BlockSpec((N_PARAMS, G, B), lambda i: (0, 0, 0)),
        ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
    ]
    inputs = [params, dbx, dby, dbz, t_enter, t_end, active]
    if warm:
        in_specs += [ray_spec, ray_spec]
        inputs += [t_prev, f_prev]
    in_specs += [
        pl.BlockSpec((1, scal.shape[1], G, B), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, G * WH, WW), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, G * AH, 3 * AW), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, G * SH, 2 * SW), lambda i: (i, 0, 0)),
    ]
    inputs += [scal, hwin, awin_cm, swin]
    scratch = ([pltpu.VMEM((G, B), jnp.float32)] * 5) if warm else []
    return pl.pallas_call(
        kernel,
        grid=(nsuper,),
        in_specs=in_specs,
        out_specs=[ray_spec] * 8,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)
