"""Multi-device scaling: mesh construction, image-tile sharding, and
heightfield band sharding (HBM scaling for maps bigger than one chip)."""

from moonrtx_tpu.parallel.mesh import TILE_AXIS, make_mesh, replicated, row_sharded
from moonrtx_tpu.parallel.hfshard import (
    BAND_HALO,
    band_heights,
    render_burst_pallas_hfshard,
    shard_bands,
)
from moonrtx_tpu.parallel.tiles import (
    build_shadow_map_sharded,
    render_accumulate_sharded,
    render_burst_pallas_sharded,
    render_frame_sharded,
    render_pose_sharded,
    render_timestep_sharded,
)

__all__ = [
    "TILE_AXIS", "make_mesh", "replicated", "row_sharded",
    "render_frame_sharded", "build_shadow_map_sharded",
    "render_burst_pallas_sharded",
    "render_pose_sharded", "render_timestep_sharded",
    "render_accumulate_sharded",
    "BAND_HALO", "band_heights", "shard_bands",
    "render_burst_pallas_hfshard",
]
