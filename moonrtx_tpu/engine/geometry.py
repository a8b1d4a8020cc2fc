"""Body-frame spherical geometry (device, jnp).

Conventions match the reference scene (renderer_navigation.py:34-40,
moon_grid.py:713-714): body frame has +Z at the north pole, longitude 0 on
the -Y axis, +X at longitude 90E:

    x = cos(lat) sin(lon),  y = -cos(lat) cos(lon),  z = sin(lat)

Scene coordinates: ``scene = M @ body`` with M the ephemeris rotation
matrix; the default camera sits at (0, -CAMERA_DISTANCE, 0) looking +Y
with +Z up (reference moon_renderer.py:505-514).
"""

from __future__ import annotations

import jax.numpy as jnp


def latlon_to_unit(lat_deg, lon_deg):
    """Unit vectors (..., 3) from degrees."""
    lat = jnp.deg2rad(lat_deg)
    lon = jnp.deg2rad(lon_deg)
    cl = jnp.cos(lat)
    return jnp.stack([cl * jnp.sin(lon), -cl * jnp.cos(lon), jnp.sin(lat)], axis=-1)


def unit_to_latlon(v):
    """(lat_deg, lon_deg) from unit (or any) vectors (..., 3)."""
    r = jnp.linalg.norm(v, axis=-1)
    lat = jnp.rad2deg(jnp.arcsin(jnp.clip(v[..., 2] / r, -1.0, 1.0)))
    lon = jnp.rad2deg(jnp.arctan2(v[..., 0], -v[..., 1]))
    return lat, lon


def ray_sphere(o, d, radius):
    """Intersect rays (o + t d) with a centered sphere.

    o: (..., 3) origins, d: (..., 3) unit directions.
    Returns (hit, t_near, t_far); t values valid only where hit.
    """
    b = jnp.sum(o * d, axis=-1)
    c = jnp.sum(o * o, axis=-1) - radius * radius
    disc = b * b - c
    hit = disc > 0.0
    s = jnp.sqrt(jnp.maximum(disc, 0.0))
    return hit, -b - s, -b + s


def mat3_apply(M, v):
    """(3,3) matrix times vectors (..., 3), as elementwise VPU ops.

    NEVER use ``@``/dot for small transforms in the render path: on TPU,
    XLA routes dots to the MXU whose default precision is bfloat16 — an
    8-bit mantissa on 300-unit camera coordinates breaks the ray-sphere
    discriminant entirely (observed on v5e: every ray missed).
    """
    return jnp.stack([
        v[..., 0] * M[0, 0] + v[..., 1] * M[0, 1] + v[..., 2] * M[0, 2],
        v[..., 0] * M[1, 0] + v[..., 1] * M[1, 1] + v[..., 2] * M[1, 2],
        v[..., 0] * M[2, 0] + v[..., 1] * M[2, 1] + v[..., 2] * M[2, 2],
    ], axis=-1)


def mat3t_apply(M, v):
    """Transpose(M) times vectors (..., 3), elementwise (see mat3_apply)."""
    return jnp.stack([
        v[..., 0] * M[0, 0] + v[..., 1] * M[1, 0] + v[..., 2] * M[2, 0],
        v[..., 0] * M[0, 1] + v[..., 1] * M[1, 1] + v[..., 2] * M[2, 1],
        v[..., 0] * M[0, 2] + v[..., 1] * M[1, 2] + v[..., 2] * M[2, 2],
    ], axis=-1)


def normalize(v, axis=-1, eps=1e-20):
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=axis, keepdims=True), eps))
