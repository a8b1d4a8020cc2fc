"""Overlay geometry, font, graphs, projection, lit-mask hiding."""

import numpy as np
import pytest

from moonrtx_tpu import constants as C
from moonrtx_tpu.engine.camera import camera_basis
from moonrtx_tpu.engine.scene import default_camera
from moonrtx_tpu.overlays import (
    build_grid_graphs,
    build_pin,
    build_spot_labels,
    build_standard_labels,
    draw_overlays,
    merge_segments,
    project_to_screen,
)
from moonrtx_tpu.overlays.font import glyph_segments, text_segments
from moonrtx_tpu.types import MoonFeature


def _feat(name, lat, lon, diam, std=True, spot=False):
    return MoonFeature(name=name, lat=lat, lon=lon,
                       angular_radius=diam / C.FEATURE_KM_PER_DEG,
                       diameter_km=diam, standard_label=std, spot_label=spot,
                       status_bar=True, feature_id=None, www_address=None)


def test_font_has_all_needed_glyphs():
    for ch in "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-'<>.":
        assert glyph_segments(ch), f"missing glyph {ch}"
    assert glyph_segments(" ") == []


def test_font_flips_mirror():
    seg = glyph_segments("L")[0]
    seg_h = glyph_segments("L", flip_horizontal=True)[0]
    seg_v = glyph_segments("L", flip_vertical=True)[0]
    assert np.allclose(seg_h[:, 0], -seg[:, 0])
    assert np.allclose(seg_v[:, 1], -seg[:, 1])


def test_text_reverses_order_when_hflipped():
    ab = text_segments("AB", centered=True)
    ab_flip = text_segments("AB", centered=True, flip_horizontal=True)
    # flipped text has the A strokes on the right (positive x)
    a_x = np.mean([s[:, 0].mean() for s in ab[:2]])
    a_x_flip = np.mean([s[:, 0].mean() for s in ab_flip[-2:]])
    assert a_x < 0 < a_x_flip


def test_merge_segments_indices():
    a = np.zeros((3, 3))
    b = np.ones((2, 3))
    pos, edges = merge_segments([a, b])
    assert pos.shape == (5, 3)
    assert edges.tolist() == [[0, 1], [1, 2], [3, 4]]


def test_grid_graph_counts():
    lines, labels = build_grid_graphs()
    # 9 latitude circles + 24 longitude circles, 100 points each
    assert lines.pos.shape[0] == (9 + 24) * 100
    assert lines.edges.shape[0] == (9 + 24) * 99
    assert labels.pos.shape[0] > 500
    # all grid geometry sits just above the sphere
    r = np.linalg.norm(lines.pos, axis=1)
    assert np.all(r > C.MOON_RADIUS) and np.all(r < C.MOON_RADIUS * 1.06)


def test_standard_labels_lit_mask():
    g = build_standard_labels([_feat("Alpha", 0.0, 0.0, 500),
                               _feat("Beta", 0.0, 180.0, 500)])
    # light from -Y (over lon 0): Alpha lit, Beta dark
    light = np.array([0.0, -1.0, 0.0])
    mask = g.vertex_visible_mask(light)
    n_alpha = g.counts[0]
    assert mask[:n_alpha].all()
    assert not mask[n_alpha:].any()


def test_spot_labels_arrow_side():
    f = _feat("Tiny", 0.0, 10.0, 20, std=False, spot=True)
    g = build_spot_labels([f])
    g_flip = build_spot_labels([f], flip_horizontal=True)
    assert g.pos.shape[0] > 0 and g_flip.pos.shape[0] > 0


def test_pin_graph():
    g = build_pin(7, -10.0, 25.0)
    assert g.pos.shape[0] >= 3
    r = np.linalg.norm(g.pos, axis=1)
    assert np.all(r > C.MOON_RADIUS)


def test_projection_center_and_occlusion():
    basis = camera_basis(default_camera())
    front = np.array([[0.0, -C.MOON_RADIUS, 0.0]])   # facing the camera
    back = np.array([[0.0, C.MOON_RADIUS, 0.0]])     # behind the Moon
    pts, ok = project_to_screen(np.vstack([front, back]), basis, 480, 640)
    assert ok[0] and not ok[1]
    assert pts[0, 0] == pytest.approx(319.5, abs=1.0)
    assert pts[0, 1] == pytest.approx(239.5, abs=1.0)


def test_draw_overlays_renders_pixels():
    frame = np.zeros((240, 320, 3), np.uint8)
    lines, labels = build_grid_graphs()
    basis = camera_basis(default_camera())
    out = draw_overlays(frame, [lines, labels], np.eye(3), basis)
    assert out.sum() > 0  # something was drawn
