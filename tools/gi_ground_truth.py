"""Indirect-light error bound: deterministic one-bounce field vs a
converged Monte-Carlo path-traced ground truth.

The reference path-traces 2-4 stochastic segments per ray
(moon_renderer.py:445); this rebuild substitutes a deterministic
radiosity-style field on the sun-frame scan grid
(ops/shadow_scan.bounce_from_parts). This tool measures that
substitution against ground truth (round-3 verdict item 4):

* Ground truth: cosine-weighted hemisphere Monte Carlo at surface
  points of the SAME terrain — rays marched against the true
  heightfield, emitters shaded ndl*lit with the scan's own (exact)
  shadow factor, plus a second bounce from a coarse first-bounce field
  (the reference's 2-4 segments = up to two indirect bounces).
* Model: the bounce map the renderer actually samples
  (shadow_scan.build_shadow_and_bounce), read at the same cells.

Both are in the shading path's units: the fraction added to
irradiance*(n.l*shadow) — so deltas convert directly to display quanta
through the tone map. With the sun at +z of the body frame the scan grid
IS the spherical grid, and colatitude theta IS (90 deg - solar
elevation): one run sweeps every sun elevation; results are binned by
it. Output: a JSON artifact + a markdown table for docs/GI.md.

Usage:  MOONRTX_PLATFORM=cpu python tools/gi_ground_truth.py [--fast]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

SUN = np.array([0.0, 0.0, 1.0], np.float32)


# ---- numpy mirrors of the repo sampling conventions ---------------------

def sample_bilinear(tex: np.ndarray, lat, lon):
    """Bilinear on an UNPADDED equirect map, wrapped columns — the numpy
    mirror of ops.sampler.latlon_to_rowcol + gather_bilinear."""
    h, w = tex.shape[:2]
    row = (90.0 - lat) / 180.0 * h - 0.5
    col = (np.asarray(lon) + 180.0) % 360.0 / 360.0 * w - 0.5
    r0 = np.floor(row)
    c0 = np.floor(col)
    fr = (row - r0)[..., None] if tex.ndim == 3 else row - r0
    fc = (col - c0)[..., None] if tex.ndim == 3 else col - c0
    r0 = np.clip(r0.astype(np.int64), 0, h - 1)
    r1 = np.clip(r0 + 1, 0, h - 1)
    c0 = c0.astype(np.int64) % w
    c1 = (c0 + 1) % w
    return ((tex[r0, c0] * (1 - fc) + tex[r0, c1] * fc) * (1 - fr)
            + (tex[r1, c0] * (1 - fc) + tex[r1, c1] * fc) * fr)


def latlon_of(p):
    """Body-frame (lat, lon) degrees of points (..., 3) — the numpy
    mirror of engine.geometry.unit_to_latlon."""
    r = np.linalg.norm(p, axis=-1)
    lat = np.degrees(np.arcsin(np.clip(p[..., 2] / r, -1.0, 1.0)))
    lon = np.degrees(np.arctan2(p[..., 0], -p[..., 1]))
    return lat, lon


def surface_point(elev, lat, lon):
    """S(lat, lon) = r * u, radius units (max elevation == 1.0)."""
    la, lo = np.radians(lat), np.radians(lon)
    u = np.stack([np.cos(la) * np.sin(lo), -np.cos(la) * np.cos(lo),
                  np.sin(la)], axis=-1)
    return sample_bilinear(elev, lat, lon)[..., None] * u


def surface_normal(elev, lat, lon, dstep=0.15):
    """Outward normal by finite differences of the true surface."""
    p0 = surface_point(elev, lat, lon)
    dlon = dstep / np.maximum(np.cos(np.radians(lat)), 0.05)
    p_lat = surface_point(elev, lat + dstep, lon)
    p_lon = surface_point(elev, lat, lon + dlon)
    n = np.cross(p_lon - p0, p_lat - p0)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    u = p0 / np.linalg.norm(p0, axis=-1, keepdims=True)
    flip = np.sum(n * u, axis=-1, keepdims=True) < 0
    return np.where(flip, -n, n), p0


def lit_at(smap_np, lat, lon, basis, ncs, nf, nphi):
    """Sample the scan shadow-factor map at body points (numpy mirror of
    the scan-grid mapping with sun basis rows = x, y, z)."""
    from moonrtx_tpu.ops.shadow_scan import (
        BAND_SPLIT_DEG,
        THETA_MAX_DEG,
    )

    la, lo = np.radians(lat), np.radians(lon)
    d = np.stack([np.cos(la) * np.sin(lo), -np.cos(la) * np.cos(lo),
                  np.sin(la)], axis=-1)
    z = np.clip(d @ basis[2], -1.0, 1.0)
    theta = np.degrees(np.arccos(z))
    phi = np.arctan2(d @ basis[1], d @ basis[0]) % (2 * np.pi)
    in_coarse = theta < BAND_SPLIT_DEG
    row = np.where(
        in_coarse, theta / BAND_SPLIT_DEG * ncs,
        ncs + (theta - BAND_SPLIT_DEG) / (THETA_MAX_DEG - BAND_SPLIT_DEG)
        * (nf - 1.0))
    col = phi / (2 * np.pi) * nphi - 0.5
    col = np.where(col < 0, col + nphi, col)
    r0 = np.clip(np.floor(row).astype(np.int64), 0, smap_np.shape[0] - 1)
    r1 = np.clip(r0 + 1, 0, smap_np.shape[0] - 1)
    fr = np.clip(row - r0, 0.0, 1.0)
    c0 = np.floor(col).astype(np.int64) % nphi
    c1 = (c0 + 1) % nphi
    fc = col - np.floor(col)
    beyond = theta > THETA_MAX_DEG  # past the scan band: fully dark
    v = ((smap_np[r0, c0] * (1 - fc) + smap_np[r0, c1] * fc) * (1 - fr)
         + (smap_np[r1, c0] * (1 - fc) + smap_np[r1, c1] * fc) * fr)
    return np.where(beyond, 0.0, v)


# ---- steep test terrain --------------------------------------------------

def add_craters(elev, rng, n=40, lat_range=(-25.0, 55.0)):
    """Superpose parabolic bowl craters with raised rims (depth/radius up
    to 0.3 → wall slopes ~25-30 deg, the real regime of fresh lunar
    craters — the procedurally-synthesized base is far too smooth for
    indirect light to matter: measured p95 slope < 1 deg). Returns the
    re-normalized (max == 1.0) terrain and the crater list
    (lat, lon, radius_rad, depth)."""
    h, w = elev.shape
    LA = np.radians(90 - (np.arange(h) + 0.5) / h * 180)[:, None]
    LO = np.radians((np.arange(w) + 0.5) / w * 360 - 180)[None, :]
    out = elev.copy()
    craters = []
    for _ in range(n):
        lc = np.radians(rng.uniform(*lat_range))
        pc = np.radians(rng.uniform(-180, 180))
        rad = rng.uniform(0.04, 0.10)
        dd = rng.uniform(0.15, 0.30) * rad
        cosd = (np.sin(LA) * np.sin(lc)
                + np.cos(LA) * np.cos(lc) * np.cos(LO - pc))
        x = np.arccos(np.clip(cosd, -1.0, 1.0)) / rad
        out += np.where(x < 1.0, -dd * (1 - x ** 2), 0.0)
        out += np.where(x < 1.6,
                        0.35 * dd * np.exp(-((x - 1.15) / 0.25) ** 2), 0.0)
        craters.append((float(np.degrees(lc)), float(np.degrees(pc)),
                        float(rad), float(dd)))
    return (out / out.max()).astype(np.float64), craters


# ---- Monte-Carlo tracer -------------------------------------------------

def _march(elev, p_start, dirs, t_max, n_steps, refine=5):
    """First terrain hit of straight rays (vectorized over rays).

    p_start/dirs: (N, 3). Returns (hit_mask, hit_points (N, 3))."""
    n = p_start.shape[0]
    dt = t_max / n_steps
    t = np.full(n, 1e-4, np.float64)
    active = np.ones(n, bool)
    hit = np.zeros(n, bool)
    t_hit = np.zeros(n)
    for _ in range(n_steps):
        t = t + dt * active
        p = p_start + t[:, None] * dirs
        r = np.linalg.norm(p, axis=-1)
        lat, lon = latlon_of(p)
        hs = sample_bilinear(elev, lat, lon)
        new = active & (r < hs)
        hit |= new
        t_hit = np.where(new, t, t_hit)
        # escape: above the bounding sphere and moving outward
        outward = np.sum(p * dirs, axis=-1) > 0
        active &= ~new & ~((r > 1.0005) & outward)
        if not active.any():
            break
    # bisection refine between t-dt and t on the hit rays
    lo_t = np.where(hit, t_hit - dt, 0.0)
    hi_t = np.where(hit, t_hit, 0.0)
    for _ in range(refine):
        mid = 0.5 * (lo_t + hi_t)
        p = p_start + mid[:, None] * dirs
        lat, lon = latlon_of(p)
        below = np.linalg.norm(p, axis=-1) < sample_bilinear(elev, lat, lon)
        hi_t = np.where(hit & below, mid, hi_t)
        lo_t = np.where(hit & ~below, mid, lo_t)
    return hit, p_start + hi_t[:, None] * dirs


def mc_indirect(elev, alb_lum, smap_np, basis, ncs, nf, nphi,
                lats, lons, n_dirs, t_max, n_steps, rng,
                e1_field=None):
    """Cosine-weighted hemisphere MC of the indirect term at surface
    points, in bounce units (fraction added to n.l*lit). e1_field:
    optional coarse first-bounce field on an equirect texel-center grid
    (sampled with sample_bilinear) for the second bounce."""
    n_pts = len(lats)
    normals, p0 = surface_normal(elev, lats, lons)
    p_start = p0 + 2e-5 * normals

    # tangent frame per point
    helper = np.where(np.abs(normals[:, 2:3]) < 0.9,
                      np.tile([0.0, 0.0, 1.0], (n_pts, 1)),
                      np.tile([1.0, 0.0, 0.0], (n_pts, 1)))
    tx = np.cross(helper, normals)
    tx /= np.linalg.norm(tx, axis=-1, keepdims=True)
    ty = np.cross(normals, tx)

    # stratified cosine-weighted directions (shared strata, per-point jitter)
    est = np.zeros(n_pts)
    k = n_dirs
    u1 = (np.arange(k)[None, :] + rng.random((n_pts, k))) / k
    u2 = rng.random((n_pts, k))
    r_ = np.sqrt(u1)
    ph = 2 * np.pi * u2
    for j in range(k):
        w_loc = (r_[:, j, None] * np.cos(ph[:, j, None]) * tx
                 + r_[:, j, None] * np.sin(ph[:, j, None]) * ty
                 + np.sqrt(np.maximum(1 - u1[:, j, None], 0.0)) * normals)
        hit, p_hit = _march(elev, p_start, w_loc, t_max, n_steps)
        if not hit.any():
            continue
        lat_h, lon_h = latlon_of(p_hit[hit])
        n_h, _ = surface_normal(elev, lat_h, lon_h)
        ndl_h = np.maximum(n_h @ SUN, 0.0)
        lit_h = lit_at(smap_np, lat_h, lon_h, basis, ncs, nf, nphi)
        alb_h = sample_bilinear(alb_lum, lat_h, lon_h)
        e_in = ndl_h * lit_h
        if e1_field is not None:
            e_in = e_in + sample_bilinear(e1_field, lat_h, lon_h)
        contrib = np.zeros(n_pts)
        contrib[hit] = alb_h * e_in
        est += contrib
    return est / k


def run(fast: bool = False, accuracy: int = 4, seed: int = 0):
    import jax

    jax.config.update("jax_platforms",
                      os.environ.get("MOONRTX_PLATFORM", "cpu"))
    import jax.numpy as jnp

    from moonrtx_tpu.data.mips import pad_lon_wrap
    from moonrtx_tpu.data.synth import synthesize_moon
    from moonrtx_tpu.ops import shadow_scan

    t0 = time.time()
    rng = np.random.default_rng(seed)
    if fast:
        th, tw, n_craters = 120, 240, 60
        n_pts, n_dirs, n_steps = 160, 96, 110
    else:
        th, tw, n_craters = 360, 720, 220
        n_pts, n_dirs, n_steps = 1400, 384, 170
    t_max = 0.35

    # the seed varies EVERYTHING: base terrain, crafted craters, sample
    # cells and MC rays — so held-out seeds validate the calibration on
    # terrain it never saw (docs/GI.md held-out table)
    elev, albedo = synthesize_moon(th, tw, seed=11 + seed,
                                   n_craters=n_craters)
    rs = float(elev.max())
    elev, craters = add_craters((elev / rs).astype(np.float64), rng,
                                n=20 if fast else 48)
    alb_lum = albedo.mean(axis=2).astype(np.float64)

    # ---- the model: exactly what the renderer samples -------------------
    ncs, nf, nphi = shadow_scan._resolution(accuracy)
    basis = np.stack([np.array([0.0, -1.0, 0.0]),
                      np.array([1.0, 0.0, 0.0]), SUN]).astype(np.float64)
    tex = jnp.asarray(pad_lon_wrap(elev.astype(np.float32), 8))
    # one scan feeds BOTH bounce depths (the scan is the expensive half;
    # build_shadow_and_bounce is the same _build_aux + _bounce_jit pair)
    bx, by, bz = shadow_scan.sun_frame_basis(jnp.asarray(SUN, jnp.float32))
    basis_j = jnp.stack([bx, by, bz])
    smap, hs_j, alb_s_j = shadow_scan._build_aux(
        tex, jnp.asarray(alb_lum.astype(np.float32)), basis_j,
        jnp.float32(0.00465), th, tw, ncs, nf, nphi)
    bmap = shadow_scan._bounce_jit(smap, hs_j, alb_s_j, ncs, nf, nphi)
    bmap2 = shadow_scan._bounce_jit(smap, hs_j, alb_s_j, ncs, nf, nphi,
                                    n_bounces=2)
    smap_np = np.asarray(smap)[:, :nphi].astype(np.float64)
    bmap_np = np.asarray(bmap)[:, :nphi].astype(np.float64)
    bmap2_np = np.asarray(bmap2)[:, :nphi].astype(np.float64)
    print(f"# model maps built ({time.time()-t0:.0f}s) "
          f"grid {smap_np.shape}", flush=True)

    # ---- sample cells in the elevation sweep ----------------------------
    from moonrtx_tpu.ops.shadow_scan import _theta_grid

    theta_deg = _theta_grid(ncs, nf)
    rows = np.arange(len(theta_deg))
    band = (theta_deg > 40.0) & (theta_deg < 104.0)
    # Importance-mixed cells: half where the MODEL'S bounce is largest
    # (the regime the feature exists for — shadowed floors lit by walls),
    # half uniform over the band (catches places the model wrongly says
    # zero). The model cannot hide errors from the uniform half.
    n_top = n_pts // 2
    masked = np.where(band[:, None], bmap_np, -1.0)
    order = np.argsort(masked.ravel())[::-1]
    pick = rng.choice(order[: max(4 * n_top, 256)], size=n_top,
                      replace=False)
    ri_top, ci_top = np.unravel_index(pick, bmap_np.shape)
    ri_u = rng.choice(rows[band], size=n_pts - n_top)
    ci_u = rng.integers(0, nphi, size=n_pts - n_top)
    ri = np.concatenate([ri_top, ri_u])
    ci = np.concatenate([ci_top, ci_u])
    th_i = theta_deg[ri]
    phi_i = (ci + 0.5) * 2 * np.pi / nphi
    st, ct = np.sin(np.radians(th_i)), np.cos(np.radians(th_i))
    d = (basis[2][None, :] * ct[:, None]
         + basis[0][None, :] * (st * np.cos(phi_i))[:, None]
         + basis[1][None, :] * (st * np.sin(phi_i))[:, None])
    lats, lons = latlon_of(d)

    # ---- coarse first-bounce field for the second segment ---------------
    e1_grid_h = 45 if fast else 90
    # texel-center convention, matching sample_bilinear's mapping (the
    # second-bounce lookup then has zero grid misregistration)
    g_lat = 90.0 - (np.arange(e1_grid_h) + 0.5) / e1_grid_h * 180.0
    g_lon = (np.arange(2 * e1_grid_h) + 0.5) / (2 * e1_grid_h) * 360.0 - 180.0
    gl, gn = np.meshgrid(g_lat, g_lon, indexing="ij")
    e1 = mc_indirect(elev, alb_lum, smap_np, basis, ncs, nf, nphi,
                     gl.ravel(), gn.ravel(), 24 if fast else 48,
                     t_max, max(n_steps // 2, 60), rng).reshape(gl.shape)
    print(f"# coarse E1 field done ({time.time()-t0:.0f}s) "
          f"mean {e1.mean():.4f}", flush=True)

    # ---- ground truth at the sample cells: 1 and 2 bounces --------------
    chunks = []
    for s in range(0, n_pts, 200):
        sl = slice(s, min(s + 200, n_pts))
        chunks.append(mc_indirect(elev, alb_lum, smap_np, basis, ncs, nf,
                                  nphi, lats[sl], lons[sl], n_dirs,
                                  t_max, n_steps, rng,
                                  e1_field=e1))
        print(f"# MC {sl.stop}/{n_pts} ({time.time()-t0:.0f}s)", flush=True)
    mc2 = np.concatenate(chunks)

    model = bmap_np[ri, ci]
    delta = model - mc2
    model2 = bmap2_np[ri, ci]
    delta2 = model2 - mc2

    # direct term + display-quanta conversion at the sample points
    normals, _ = surface_normal(elev, lats, lons)
    ndl = np.maximum(normals @ SUN, 0.0)
    lit = smap_np[ri, ci]
    alb_pt = sample_bilinear(alb_lum, lats, lons)
    exposure, gamma, irr = 0.9, 2.2, 1.0

    def disp(term):
        return 255.0 * np.clip(alb_pt * irr * term * exposure,
                               0.0, 1.0) ** (1.0 / gamma)

    dq = np.abs(disp(ndl * lit + model) - disp(ndl * lit + mc2))
    dq2 = np.abs(disp(ndl * lit + model2) - disp(ndl * lit + mc2))
    # display effect of the second deterministic bounce itself (the
    # round-5 "kill it with numbers" measurement: how much the picture
    # changes when --indirect-bounces 2 is enabled)
    dq_12 = np.abs(disp(ndl * lit + model2) - disp(ndl * lit + model))
    shadowed = ndl * lit < 0.01

    def stats(mask, arr):
        a = np.abs(arr[mask])
        if not len(a):
            return None
        return dict(n=int(mask.sum()), mean=float(a.mean()),
                    p95=float(np.percentile(a, 95)), max=float(a.max()))

    bins = [(-90, -5), (-5, 5), (5, 20), (20, 50)]
    by_elev = {}
    sun_elev = 90.0 - th_i
    for lo, hi in bins:
        m = (sun_elev >= lo) & (sun_elev < hi)
        by_elev[f"{lo}..{hi}"] = dict(
            bounce_abs_err=stats(m, delta),
            display_quanta=stats(m, dq))

    everything = np.ones_like(shadowed)
    imp = np.zeros_like(shadowed)
    imp[: n_pts // 2] = True                   # model-importance half
    significant = mc2 > 0.005                  # truth says bounce matters
    rel = np.where(significant, delta / np.maximum(mc2, 1e-9), 0.0)
    out = dict(
        config=dict(fast=fast, accuracy=accuracy, terrain=[th, tw],
                    craters=len(craters), n_pts=n_pts, n_dirs=n_dirs,
                    n_steps=n_steps, t_max=t_max, seed=seed,
                    mc="cosine-weighted, 2 bounces (coarse E1 second segment)"),
        overall=dict(
            bounce_abs_err=stats(everything, delta),
            bounce_abs_err_shadowed=stats(shadowed, delta),
            bounce_abs_err_model_top=stats(imp, delta),
            bounce_abs_err_uniform=stats(~imp, delta),
            bounce_rel_err_significant=stats(significant, rel),
            display_quanta=stats(everything, dq),
            display_quanta_shadowed=stats(shadowed, dq),
            model_mean=float(model.mean()), mc_mean=float(mc2.mean()),
            mc_mean_significant=(float(mc2[significant].mean())
                                 if significant.any() else None),
            corr=float(np.corrcoef(model, mc2)[0, 1]),
            # least-squares amplitude fit of the model against truth:
            # the model is linear in BOUNCE_WALL_LIT_FRACTION, so the
            # optimal constant = current * amplitude_fit (the tuning
            # procedure used on seed 0; held-out seeds only REPORT it)
            amplitude_fit=float(np.sum(mc2 * model)
                                / max(np.sum(model * model), 1e-12))),
        second_bounce=dict(
            model2_mean=float(model2.mean()),
            bounce_abs_err=stats(everything, delta2),
            display_quanta=stats(everything, dq2),
            display_quanta_shadowed=stats(shadowed, dq2),
            corr=float(np.corrcoef(model2, mc2)[0, 1]),
            # the visible effect of enabling the second bounce, binned
            # like the headline (worst bin decides the default)
            effect_display_quanta=stats(everything, dq_12),
            effect_display_quanta_shadowed=stats(shadowed, dq_12)),
        by_sun_elevation=by_elev,
        runtime_s=round(time.time() - t0, 1))
    return out


if __name__ == "__main__":
    fast = "--fast" in sys.argv
    seed = 0
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])
    out = run(fast=fast, seed=seed)
    print(json.dumps(out, indent=1))
    name = "gi_bound.json" if seed == 0 else f"gi_bound_seed{seed}.json"
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                        "docs", name)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}")
