"""Navigation, picking, measurement (reference renderer_navigation.py)."""

import math

import numpy as np
import pytest

from moonrtx_tpu import constants as C
from moonrtx_tpu.engine.scene import default_camera
from moonrtx_tpu.interact.measure import (
    elevation_difference_m,
    elevation_m,
    great_circle_distance_km,
)
from moonrtx_tpu.interact.navigation import (
    center_on_point,
    navigate_view,
    pan_tilt_view,
    roll_view,
    rotate_around_moon_axis,
    zoom_fov,
)
from moonrtx_tpu.interact.picking import FeatureLookup, hit_to_selenographic
from moonrtx_tpu.types import MoonFeature


def _feat(name, lat, lon, diam, status=True):
    return MoonFeature(name=name, lat=lat, lon=lon,
                       angular_radius=diam / C.FEATURE_KM_PER_DEG,
                       diameter_km=diam, standard_label=False,
                       spot_label=False, status_bar=status,
                       feature_id=None, www_address=None)


def test_navigate_preserves_distance():
    cam = default_camera()
    d0 = np.linalg.norm(np.asarray(cam.eye) - np.asarray(cam.target))
    for direction in ("Left", "Right", "Up", "Down"):
        cam2 = navigate_view(cam, direction)
        d = np.linalg.norm(np.asarray(cam2.eye) - np.asarray(cam2.target))
        assert d == pytest.approx(d0, rel=1e-9)
        assert not np.allclose(cam2.eye, cam.eye)


def test_navigate_angle_is_fov_fraction():
    cam = default_camera()
    cam2 = navigate_view(cam, "Left", step_factor=0.05)
    e0 = np.asarray(cam.eye)
    e1 = np.asarray(cam2.eye)
    ang = math.degrees(math.acos(
        np.clip(e0 @ e1 / (np.linalg.norm(e0) * np.linalg.norm(e1)), -1, 1)))
    assert ang == pytest.approx(cam.fov * 0.05, rel=1e-6)


def test_pan_tilt_moves_content_one_px_per_px():
    cam = default_camera()
    h = 1080
    cam2 = pan_tilt_view(cam, dx_px=100.0, dy_px=0.0, height_px=h)
    v0 = np.asarray(cam.target) - np.asarray(cam.eye)
    v1 = np.asarray(cam2.target) - np.asarray(cam2.eye)
    ang = math.degrees(math.acos(np.clip(
        v0 @ v1 / (np.linalg.norm(v0) * np.linalg.norm(v1)), -1, 1)))
    assert ang == pytest.approx(cam.fov / h * 100, rel=1e-4)


def test_roll_only_changes_up():
    cam = default_camera()
    cam2 = roll_view(cam, "cw", 10.0)
    assert np.allclose(cam2.eye, cam.eye)
    assert np.allclose(cam2.target, cam.target)
    ang = math.degrees(math.acos(np.clip(
        np.asarray(cam.up) @ np.asarray(cam2.up), -1, 1)))
    assert ang == pytest.approx(10.0, rel=1e-6)


def test_moon_axis_rotation_about_pole():
    cam = default_camera()
    R = np.eye(3)
    cam2 = rotate_around_moon_axis(cam, R, "Left", 5.0)
    e0, e1 = np.asarray(cam.eye), np.asarray(cam2.eye)
    # rotation about +Z: z-components unchanged
    assert e1[2] == pytest.approx(e0[2], abs=1e-9)
    assert np.linalg.norm(e1[:2]) == pytest.approx(np.linalg.norm(e0[:2]), rel=1e-9)


def test_zoom_clamps():
    cam = default_camera()._replace(fov=0.31)
    cam2 = zoom_fov(cam, wheel_delta=+1200)
    assert cam2.fov == pytest.approx(C.FOV_RANGE[0])
    cam3 = zoom_fov(default_camera()._replace(fov=89.0), wheel_delta=-1200)
    assert cam3.fov == pytest.approx(C.FOV_RANGE[1])


def test_center_on_point_keeps_distance():
    cam = default_camera()
    cam2 = center_on_point(cam, np.array([1.0, -9.0, 2.0]))
    assert np.allclose(cam2.target, [1.0, -9.0, 2.0])
    d0 = np.linalg.norm(np.asarray(cam.eye) - np.asarray(cam.target))
    d1 = np.linalg.norm(np.asarray(cam2.eye) - np.asarray(cam2.target))
    assert d1 == pytest.approx(d0, rel=1e-9)


def test_hit_to_selenographic_identity_rotation():
    lat, lon = hit_to_selenographic(np.eye(3), 0.0, -9.9, 0.0)
    assert lat == pytest.approx(0.0, abs=1e-6)
    assert lon == pytest.approx(0.0, abs=1e-6)
    lat, lon = hit_to_selenographic(np.eye(3), 9.9, 0.0, 0.0)
    assert lon == pytest.approx(90.0, abs=1e-6)
    # out-of-band hits rejected
    assert hit_to_selenographic(np.eye(3), 0.0, -20.0, 0.0) == (None, None)
    assert hit_to_selenographic(np.eye(3), 0.0, -1.0, 0.0) == (None, None)


def test_feature_lookup_smallest_first():
    feats = sorted([
        _feat("Big Mare", 10.0, 20.0, 500.0),
        _feat("Small Crater", 10.0, 20.0, 30.0),
        _feat("Elsewhere", -40.0, 100.0, 50.0),
    ], key=lambda f: f.angular_radius)
    lk = FeatureLookup(feats)
    assert lk.find(10.0, 20.0).name == "Small Crater"
    assert lk.find(10.0, 23.0).name == "Big Mare"  # outside the small one
    assert lk.find(0.0, -100.0) is None


def test_great_circle_quarter():
    d = great_circle_distance_km(0.0, 0.0, 0.0, 90.0)
    assert d == pytest.approx(C.MOON_RADIUS_KM * math.pi / 2, rel=1e-9)


def test_elevation_sampling_wrap_and_scale():
    h, w = 4, 8
    elev = np.full((h, w), 0.5, np.float32)
    elev[:, 0] = 1.0  # column at lon -180+22.5 edge
    rs = 2.0
    # displacement 0.5*2=1.0 -> exactly the reference radius -> 0 m
    v = elevation_m(elev, rs, 0.0, 100.0)
    assert v == pytest.approx(0.0, abs=1e-3)
    # near the +/-180 seam interpolation must wrap, not clamp
    v_seam = elevation_m(elev, rs, 0.0, 180.0)
    v_seam2 = elevation_m(elev, rs, 0.0, -180.0)
    assert v_seam == pytest.approx(v_seam2, abs=1e-3)
    assert elevation_difference_m(elev, rs, 0.0, 100.0, 0.0, 100.0) == 0.0


def test_zoom_drag_and_dolly():
    """Shift-drag camera controls (reference README: PlotOptiX built-in
    gestures): drag-zoom scales FOV continuously within the clamp; dolly
    moves the eye along the view direction within [1.2 R, 220 R]."""
    from moonrtx_tpu import constants as C
    from moonrtx_tpu.engine.scene import default_camera
    from moonrtx_tpu.interact import navigation as nav

    cam = default_camera()
    # drag down = zoom in (smaller fov), up = out
    zin = nav.zoom_drag(cam, -200.0, 1080)
    zout = nav.zoom_drag(cam, 200.0, 1080)
    assert zin.fov < cam.fov < zout.fov
    assert np.allclose(zin.eye, cam.eye)
    # huge drags respect the clamp
    assert nav.zoom_drag(cam, -1e6, 1080).fov == C.FOV_RANGE[0]
    assert nav.zoom_drag(cam, 1e6, 1080).fov == C.FOV_RANGE[1]

    d_in = nav.dolly_view(cam, -200.0, 1080)
    d_out = nav.dolly_view(cam, 200.0, 1080)
    r0 = np.linalg.norm(np.asarray(cam.eye))
    assert np.linalg.norm(np.asarray(d_in.eye)) < r0
    assert np.linalg.norm(np.asarray(d_out.eye)) > r0
    assert d_in.fov == cam.fov
    # view direction preserved
    v0 = np.asarray(cam.target) - np.asarray(cam.eye)
    v1 = np.asarray(d_in.target) - np.asarray(d_in.eye)
    assert np.allclose(np.cross(v0 / np.linalg.norm(v0),
                                v1 / np.linalg.norm(v1)), 0.0, atol=1e-12)
    # clamps: never through the surface, never past the precision range
    near = nav.dolly_view(cam, -1e7, 1080)
    far = nav.dolly_view(cam, 1e7, 1080)
    assert np.linalg.norm(np.asarray(near.eye)) >= C.MOON_RADIUS * 1.2 - 1e-9
    assert np.linalg.norm(np.asarray(far.eye)) <= C.MOON_RADIUS * 220.0 + 1e-9


def test_random_navigation_sequence_keeps_invariants():
    """400 random interaction events (orbit, drag, pan-tilt, axis
    rotation, roll, wheel/drag zoom, dolly, recenter) never break the
    camera: finite state, FOV inside the reference clamp, eye-target
    distance inside the dolly clamp, unit up vector. Guards the whole
    event-handler surface against cumulative drift/NaN regressions."""
    from moonrtx_tpu.interact.navigation import (
        dolly_view,
        orbit_drag,
        zoom_drag,
    )

    rng = np.random.default_rng(7)
    rotation = np.eye(3)
    cam = default_camera()
    directions = ("Left", "Right", "Up", "Down")
    for i in range(400):
        op = rng.integers(0, 9)
        if op == 0:
            cam = navigate_view(cam, directions[rng.integers(0, 4)])
        elif op == 1:
            cam = orbit_drag(cam, float(rng.normal(0, 40)),
                             float(rng.normal(0, 40)), 1080)
        elif op == 2:
            cam = pan_tilt_view(cam, float(rng.normal(0, 40)),
                                float(rng.normal(0, 40)), 1080)
        elif op == 3:
            cam = rotate_around_moon_axis(cam, rotation,
                                          directions[rng.integers(0, 4)])
        elif op == 4:
            cam = roll_view(cam, "cw" if rng.integers(0, 2) else "ccw",
                            float(rng.uniform(0.1, 5.0)))
        elif op == 5:
            cam = zoom_fov(cam, float(rng.choice([-120, 120])))
        elif op == 6:
            cam = zoom_drag(cam, float(rng.normal(0, 200)), 1080)
        elif op == 7:
            cam = dolly_view(cam, float(rng.normal(0, 300)), 1080)
        else:
            pt = rng.normal(0, 1, 3)
            pt = pt / np.linalg.norm(pt) * C.MOON_RADIUS
            cam = center_on_point(cam, pt)

        eye = np.asarray(cam.eye)
        target = np.asarray(cam.target)
        up = np.asarray(cam.up)
        assert np.isfinite(eye).all() and np.isfinite(target).all()
        assert np.isfinite(up).all() and np.isfinite(cam.fov)
        assert C.FOV_RANGE[0] - 1e-9 <= cam.fov <= C.FOV_RANGE[1] + 1e-9
        dist = np.linalg.norm(eye - target)
        assert C.MOON_RADIUS * 1.2 - 1e-6 <= dist <= C.MOON_RADIUS * 220 + 1e-6
        assert abs(np.linalg.norm(up) - 1.0) < 1e-6, f"up drifted at step {i}"
        # up never collapses onto the view direction (basis stays usable)
        vd = (target - eye) / dist
        assert abs(float(vd @ up)) < 0.999
