"""Multi-device scaling: mesh construction and image-tile sharding."""

from moonrtx_tpu.parallel.mesh import TILE_AXIS, make_mesh, replicated, row_sharded
from moonrtx_tpu.parallel.tiles import (
    build_shadow_map_sharded,
    render_burst_pallas_sharded,
    render_frame_sharded,
)

__all__ = [
    "TILE_AXIS", "make_mesh", "replicated", "row_sharded",
    "render_frame_sharded", "build_shadow_map_sharded",
    "render_burst_pallas_sharded",
]
