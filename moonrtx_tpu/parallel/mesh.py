"""Device mesh construction.

The framework scales by image-tile data parallelism: each device renders a
horizontal strip of the frame against replicated (or later sharded) maps,
with the framebuffer gathered over ICI (SURVEY.md section 2 parallelism
design; the reference is single-GPU with no distributed backend).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tiles"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the first n devices (default: all).

    Raises when fewer than n_devices exist — a silent smaller mesh would
    make every "multi-chip" validation vacuously single-device."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"make_mesh({n_devices}): only {len(devs)} device(s) "
                f"available on backend '{jax.default_backend()}' — for a "
                "virtual mesh force the CPU platform with "
                "jax.config.update('jax_platforms', 'cpu') and "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (TILE_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (row) dimension across the tile axis."""
    return NamedSharding(mesh, P(TILE_AXIS))
