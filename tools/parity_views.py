"""Parity harness: recreate the reference's published views and quantify
the rendered geometry against independent analytic predictions.

The reference's de-facto goldens are its README screenshots
(reference README.md:78-96, images/). In this environment those files are
git-lfs pointer stubs (131-byte hashes, no pixels), so pixel diffing is
impossible; instead each published view is recreated by feature name
(Archimedes, Timocharis, Rima Hesiodus, Mare Smythii, Theophilus, the
maria overview, and the grid view) at a datetime chosen so the target
sits near the terminator like the originals, and the physics of the
rendered image is measured directly:

* **terminator longitude** at several latitudes, read from the rendered
  luminance along selenographic scanlines (via the per-pixel hit buffer),
  compared to the smooth-sphere terminator implied by the ephemeris's
  subsolar point (selenographic longitude 90 - colongitude) — agreement
  within a fraction of a degree plus local terrain relief is the
  shadow-geometry parity the north star asks for;
* **bright-limb angle**, measured from the luminance centroid of the
  disk, compared to the ephemeris bright_limb_angle field.

Writes docs/parity/<name>.png plus docs/parity/REPORT.md with the
quantified deltas. Run: python tools/parity_views.py [--small]
"""

from __future__ import annotations

import math
import os
import sys
from datetime import datetime, timedelta, timezone

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moonrtx_tpu.astro import calculate_ephemeris
from moonrtx_tpu.config import RenderConfig
from moonrtx_tpu.data.features import load_moon_features
from moonrtx_tpu.data.loader import load_color_data, load_elevation_data
from moonrtx_tpu.engine import light as light_mod
from moonrtx_tpu.engine.scene import MoonScene, default_camera
from moonrtx_tpu.interact import navigation as nav
from moonrtx_tpu.types import Observer

OBSERVER = Observer(50.06, 19.94, 219)
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "parity")

# The reference's seven published screens (README.md:78-96) mapped to the
# feature each frames; None = full-disk view.
VIEWS = [
    ("archimedes", "Archimedes", "Archimedes with neighbours"),
    ("grid", None, "Selenographic grid and labels (full disk, grid on)"),
    ("timocharis", "Timocharis", "Lonely Timocharis"),
    # the rille itself is not a catalog entry (neither here nor in the
    # reference CSV) — frame its parent crater, where the rille begins
    ("rima_hesiodus", "Hesiodus", "Rima Hesiodus and Rupes Recta"),
    ("maria", None, "Maria (full disk)"),
    ("mare_smythii", "Mare Smythii", "Mare Smythii"),
    ("theophilus", "Theophilus", "Theophilus"),
]


def subsolar_lon(dt) -> float:
    """Selenographic longitude of the subsolar point: 90 - colongitude
    (reference astro.py:184-186 convention), wrapped to [-180, 180)."""
    e = calculate_ephemeris(dt, OBSERVER, False)
    return (90.0 - e.colongitude + 180.0) % 360.0 - 180.0


def pick_time_near_terminator(feature_lon: float, morning: bool = True,
                              start=None) -> datetime:
    """Scan a lunation for the dt placing the terminator ~8 deg east
    (morning, long shadows) of the feature, like the reference screens."""
    dt = start or datetime(2024, 4, 12, 21, 0, tzinfo=timezone.utc)
    target = 8.0 if morning else -8.0
    best, best_err = dt, 1e9
    for k in range(0, 30 * 8):
        cand = dt + timedelta(hours=3 * k)
        e = calculate_ephemeris(cand, OBSERVER, False)
        ss = (90.0 - e.colongitude + 180.0) % 360.0 - 180.0
        # morning terminator sits at ss - 90
        term = (ss - 90.0 + 180.0) % 360.0 - 180.0
        err = abs(((feature_lon - term) - target + 180.0) % 360.0 - 180.0)
        if err < best_err:
            best, best_err = cand, err
    return best


def measure_terminator(scene: MoonScene, img: np.ndarray,
                       lats=(-30.0, -15.0, 0.0, 15.0, 30.0)):
    """Rendered terminator longitude per latitude from luminance + hit
    buffer, vs the analytic smooth-sphere value."""
    e = scene.ephem
    ss_lon = (90.0 - e.colongitude + 180.0) % 360.0 - 180.0
    ss_lat = 0.0  # subsolar latitude is within +-1.6 deg; use sun vector
    sun_body = np.asarray(e.rotation_matrix).T @ np.asarray(
        light_mod.calculate_light_pos(e))
    sun_body = sun_body / np.linalg.norm(sun_body)

    hit = scene.hit_buffer_host()[: scene.out_height, : scene.out_width]
    lum = img.astype(np.float32).mean(axis=-1)
    Rinv = np.asarray(e.rotation_matrix).T
    rows = []
    for lat in lats:
        # selenographic coords of every lit-boundary pixel on this latitude
        # band: find, per image row, the darkest->lit crossing along lon
        p = hit[..., :3] @ Rinv.T          # body-frame hit points
        r = np.linalg.norm(p, axis=-1)
        with np.errstate(invalid="ignore", divide="ignore"):
            plat = np.degrees(np.arcsin(np.clip(p[..., 2] / np.maximum(r, 1e-9), -1, 1)))
            plon = np.degrees(np.arctan2(p[..., 0], -p[..., 1]))
        band = (hit[..., 3] > 0) & (np.abs(plat - lat) < 1.0)
        if band.sum() < 50:
            continue
        lons = plon[band]
        vals = lum[band]
        # analytic terminator longitude on this latitude circle:
        # sun . n(lat, lon) = 0 with n the outward smooth-sphere normal
        # n = (cos lat sin lon, -cos lat cos lon, sin lat)
        cl, sl = math.cos(math.radians(lat)), math.sin(math.radians(lat))
        a = sun_body[0] * cl
        b = -sun_body[1] * cl
        c = sun_body[2] * sl
        # a sin L + b cos L + c = 0 -> two solutions; pick the one on the
        # morning side (nearest ss_lon - 90)
        rho = math.hypot(a, b)
        if rho < abs(c):
            continue
        phi = math.atan2(b, a)
        sols = [math.degrees(math.asin(-c / rho) - phi),
                math.degrees(math.pi - math.asin(-c / rho) - phi)]
        want = (ss_lon - 90.0 + 180.0) % 360.0 - 180.0
        sol = min(sols, key=lambda L: abs(((L - want) + 180.0) % 360.0 - 180.0))
        sol = (sol + 180.0) % 360.0 - 180.0
        # measured: dimmest threshold crossing scanning from subsolar side
        order = np.argsort(lons)
        lons_s, vals_s = lons[order], vals[order]
        lit = vals_s > max(8.0, 0.05 * np.percentile(vals_s, 99))
        # longitude where lit flips on the morning side
        flips = np.flatnonzero(lit[1:] != lit[:-1])
        if flips.size == 0:
            continue
        cand_lons = 0.5 * (lons_s[flips] + lons_s[flips + 1])
        meas = min(cand_lons, key=lambda L: abs(((L - sol) + 180.0) % 360.0 - 180.0))
        rows.append((lat, sol, float(meas),
                     float(((meas - sol) + 180.0) % 360.0 - 180.0)))
    return rows


def measure_bright_limb(scene: MoonScene, img: np.ndarray):
    """Bright-limb angle from the luminance centroid vs the ephemeris."""
    lum = img.astype(np.float32).mean(axis=-1)
    hit = scene.hit_buffer_host()[: scene.out_height, : scene.out_width]
    disk = hit[..., 3] > 0
    if disk.sum() < 100:
        return None
    ys, xs = np.mgrid[: lum.shape[0], : lum.shape[1]]
    cy, cx = ys[disk].mean(), xs[disk].mean()
    w = lum * disk
    by = (ys * w).sum() / max(w.sum(), 1e-6)
    bx = (xs * w).sum() / max(w.sum(), 1e-6)
    # position angle measured from "up" in the image, counterclockwise
    # positive toward the left (east in the sky for NSWE)
    ang = math.degrees(math.atan2(-(bx - cx), -(by - cy)))
    want = scene.ephem.bright_limb_angle
    # the rendered angle is modulo the view orientation / parallactic
    # rotation already baked into the rotation matrix; compare the sun
    # direction projected into the image instead
    sun = np.asarray(light_mod.calculate_light_pos(scene.ephem))
    b = scene.basis()
    sx = float(np.dot(sun, np.asarray(b.right)))
    sy = float(np.dot(sun, np.asarray(b.up)))
    pred = math.degrees(math.atan2(-sx, sy))
    d = ((ang - pred) + 180.0) % 360.0 - 180.0
    return ang, pred, d


def render_view(scene, feature, grid=False, zoom_frac=0.25):
    from moonrtx_tpu.app.session import Session

    session = Session(scene, scene.features)
    if grid:
        session.toggle_grid()
        session.toggle_standard_labels()
    if feature is not None:
        matches = [f for f in session.features if f.name == feature]
        assert matches, feature
        session.center_on_feature(matches[0])
    img = session.frame(n_accum=scene.config.accumulation_frames)
    return session, img


def main():
    # pin the platform BEFORE the first device touch — some PJRT plugins
    # (tunneled TPU backends) ignore the JAX_PLATFORMS env var
    plat = os.environ.get("MOONRTX_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    small = "--small" in sys.argv
    tiny = "--tiny" in sys.argv
    only = None
    for i, a in enumerate(sys.argv):
        if a == "--only" and i + 1 < len(sys.argv):
            only = sys.argv[i + 1]
    os.makedirs(OUT_DIR, exist_ok=True)
    feats = {f.name: f for f in load_moon_features(None)}
    elevation, radius_scale = load_elevation_data(None, downscale=1)
    albedo = load_color_data(None, 1)

    report = ["# Parity views — recreated reference screens",
              "",
              "Reference goldens (`images/*.jpg`, README.md:78-96) are",
              "git-lfs pointer stubs in this checkout (131-byte hashes), so",
              "pixel diffs are impossible; each view is recreated by feature",
              "name at a terminator-adjacent datetime and the rendered",
              "geometry is measured against analytic predictions instead.",
              ""]
    all_t_deltas = []
    for name, feature, desc in VIEWS:
        if only is not None and name != only:
            continue
        if feature is not None and feature not in feats:
            print(f"skip {name}: feature {feature!r} not in catalog")
            continue
        f_lon = feats[feature].lon if feature else 0.0
        dt = pick_time_near_terminator(f_lon)
        size = ((256, 192) if tiny else (480, 360) if small else (960, 720))
        cfg = RenderConfig(
            observer=OBSERVER, dt_local=dt, width=size[0], height=size[1],
            shadow_accuracy=2 if tiny else 4 if small else 10,
            accumulation_frames=1 if tiny else 2 if small else 8,
            # reference-parity mode: the reference's night side is black;
            # earthshine would trip the luminance-threshold terminator
            # detector deep into the dark side
            earthshine=False, eclipse_shading=False).validate()
        scene = MoonScene(cfg, elevation, radius_scale, albedo, None)
        scene.features = sorted(feats.values(), key=lambda x: x.angular_radius)
        scene.update_view()
        session, img = render_view(scene, feature, grid=(name == "grid"))
        import cv2
        cv2.imwrite(os.path.join(OUT_DIR, f"{name}.png"), img[:, :, ::-1])

        report += [f"## {name} — {desc}", "",
                   f"- datetime: {dt:%Y-%m-%d %H:%M} UTC, observer "
                   f"{OBSERVER.lat:.2f}/{OBSERVER.lon:.2f}",
                   f"- colongitude {scene.ephem.colongitude:.2f} deg, phase "
                   f"{scene.ephem.phase_angle:.1f} deg "
                   f"({scene.ephem.phase_name})"]
        if feature is None:
            rows = measure_terminator(scene, img)
            for lat, pred, meas, d in rows:
                report.append(
                    f"- terminator @ lat {lat:+.0f}: predicted "
                    f"{pred:+.2f} deg, rendered {meas:+.2f} deg, "
                    f"delta {d:+.2f} deg")
                all_t_deltas.append(abs(d))
            bl = measure_bright_limb(scene, img)
            if bl:
                report.append(
                    f"- bright-limb direction: rendered {bl[0]:+.1f} deg vs "
                    f"sun-projection {bl[1]:+.1f} deg (delta {bl[2]:+.1f})")
        else:
            report.append(f"- centered on {feature} "
                          f"(lat {feats[feature].lat:+.2f}, "
                          f"lon {feats[feature].lon:+.2f})")
        report.append("")
        print(f"{name}: saved")

    if all_t_deltas:
        report += [f"**Full-disk terminator agreement: mean |delta| = "
                   f"{np.mean(all_t_deltas):.2f} deg over "
                   f"{len(all_t_deltas)} latitudes** (smooth-sphere analytic "
                   "prediction; residual = local terrain relief, the signal "
                   "the exact-shadow mode exists to show).", ""]
    with open(os.path.join(OUT_DIR, "REPORT.md"), "w") as f:
        f.write("\n".join(report))
    print("report:", os.path.join(OUT_DIR, "REPORT.md"))


if __name__ == "__main__":
    main()
