"""Render engine: camera, geometry, lighting, pipeline, scene state."""

from moonrtx_tpu.engine.camera import CameraBasis, camera_basis, pixel_ray, ray_directions
from moonrtx_tpu.engine.render import FrameParams, RenderOutput, render_frame, tonemap
from moonrtx_tpu.engine.scene import MoonScene, default_camera

__all__ = [
    "CameraBasis", "camera_basis", "pixel_ray", "ray_directions",
    "FrameParams", "RenderOutput", "render_frame", "tonemap",
    "MoonScene", "default_camera",
]
