"""Headless rendering: config -> frame(s) -> image file.

The natural end-to-end driver (SURVEY.md section 4): fixed time/location ->
PNG, plus the screenshot-name round trip for view persistence. Also the
path used by golden-image tests and the benchmark.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from moonrtx_tpu.app import codec
from moonrtx_tpu.config import RenderConfig
from moonrtx_tpu.data.features import load_moon_features
from moonrtx_tpu.data.loader import load_color_data, load_elevation_data, load_starmap
from moonrtx_tpu.engine.scene import MoonScene


def build_scene(config: RenderConfig, with_starmap: bool = True) -> MoonScene:
    """Load data (real files or procedural fallback) and build the scene."""
    from moonrtx_tpu.data import loader as _loader

    ss = config.synth_shape
    elevation, radius_scale = load_elevation_data(
        config.elevation_file, config.downscale,
        synth_shape=tuple(ss) if ss else None)
    # the procedural color map rides 4x coarser than the heightfield,
    # like the real LROC mosaic vs the LDEM (reference main.py:33-38),
    # but never coarser than its own base synthesis grid
    bh, bw = _loader.SYNTH_ELEVATION_SHAPE
    alb_ss = (max(ss[0] // 4, bh), max(ss[1] // 4, bw)) if ss else None
    albedo = load_color_data(config.color_file, config.downscale,
                             synth_shape=alb_ss)
    starmap = (load_starmap(config.starmap_file, config.width * 2)
               if with_starmap else None)
    scene = MoonScene(config, elevation, radius_scale, albedo, starmap)
    scene.features = sorted(load_moon_features(config.features_file),
                            key=lambda f: f.angular_radius)
    return scene


def default_screenshot_name(scene: MoonScene) -> str:
    """Filename encoding the full view state (reference
    renderer_dialogs.py:173-223), restorable via --init-view."""
    return codec.format_view_state(
        scene.dt_local, scene.config.observer.lat, scene.config.observer.lon,
        scene.view_orientation, scene.parallactic_mode, scene.camera)


def save_image(img: np.ndarray, path: str,
               linear_hdr: Optional[np.ndarray] = None,
               exposure: float = 0.9, gamma: float = 2.2) -> None:
    """Save a frame: 8 bits/sample for .jpg/.png/.tif, 16 bits/sample for
    .tiff, re-tonemapped from the linear accumulation when available
    (reference renderer_dialogs.py:167-170 Bps8/Bps16 split)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".tiff" and linear_hdr is not None:
        import cv2

        x = np.clip(linear_hdr * exposure, 0.0, 1.0) ** (1.0 / gamma)
        img16 = (x * 65535.0 + 0.5).astype(np.uint16)
        cv2.imwrite(path, img16[..., ::-1])  # BGR order for cv2
    else:
        from PIL import Image

        Image.fromarray(img).save(path)
    print(f"Saved: {path}")


def render_headless(config: RenderConfig, save_path: Optional[str] = None,
                    n_frames: Optional[int] = None) -> str:
    """Render one accumulated view and save it. Returns the saved path."""
    scene = build_scene(config, with_starmap=True)
    scene.update_view()
    img = scene.render(n_frames)
    if save_path is None:
        save_path = default_screenshot_name(scene) + ".png"
    save_image(img, save_path,
               linear_hdr=np.asarray(scene._accum)[: scene.out_height,
                                                   : scene.out_width],
               gamma=scene.gamma)
    return save_path


def render_timelapse(config: RenderConfig, save_path: Optional[str],
                     timelapse_frames: int,
                     n_frames: Optional[int] = None) -> list[str]:
    """Render a frame sequence stepping time by config.time_step_minutes
    between frames (the Q/W hot path, reference moon_renderer.py:638-664,
    driven headlessly) and save <stem>_NNNN<ext>. Returns the paths.

    No reference equivalent — the reference can auto-advance on screen but
    cannot export a sequence; assemble with e.g.
    `ffmpeg -i moon_%04d.png timelapse.mp4`."""
    from datetime import timedelta

    from moonrtx_tpu import constants as C
    from moonrtx_tpu.engine import render as render_mod

    scene = build_scene(config, with_starmap=True)
    scene.update_view()
    if save_path is None:
        save_path = default_screenshot_name(scene) + ".png"
    stem, ext = os.path.splitext(save_path)
    paths = []
    pending = None  # (accum device array, frame index): transfer+save of
    # frame i happens AFTER frame i+1's programs are dispatched, so host
    # PNG encoding and the framebuffer transfer overlap device rendering
    # (JAX async dispatch)

    def flush(p):
        accum, i = p
        img = np.asarray(render_mod.tonemap(
            accum, np.float32(C.TONEMAP_EXPOSURE), np.float32(scene.gamma))
        )[: scene.out_height, : scene.out_width]
        path = f"{stem}_{i:04d}{ext or '.png'}"
        save_image(img, path,
                   linear_hdr=np.asarray(accum)[: scene.out_height,
                                                : scene.out_width],
                   gamma=scene.gamma)
        paths.append(path)

    for i in range(timelapse_frames):
        if i:
            scene.update_view(scene.dt_local + timedelta(
                minutes=config.time_step_minutes))
        scene.ensure_accumulated(n_frames)
        prev, pending = pending, (scene._accum, i)
        if prev is not None:
            flush(prev)
    flush(pending)
    return paths
