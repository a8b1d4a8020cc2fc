"""Pinhole camera ray generation (device, jnp).

Reproduces the reference camera semantics (PlotOptiX pinhole with vertical
FOV, reference moon_renderer.py:479-487) and the four telescope view
orientations as image-space mirrors (reference view_orientation.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from moonrtx_tpu.engine.geometry import normalize
from moonrtx_tpu.orientation import flips
from moonrtx_tpu.types import Camera


class CameraBasis(NamedTuple):
    """Device-ready camera state (all float32)."""

    eye: jnp.ndarray       # (3,)
    forward: jnp.ndarray   # (3,) unit
    right: jnp.ndarray     # (3,) unit
    up: jnp.ndarray        # (3,) unit
    tan_half_fov: jnp.ndarray  # scalar


def camera_basis_np(cam: Camera, orientation: str = "NSWE"):
    """(eye, forward, right, up, tan_half_fov) as host numpy float64 —
    for host-side geometry (probe rays, drift measures) that must not
    touch the device."""
    eye = np.asarray(cam.eye, np.float64)
    target = np.asarray(cam.target, np.float64)
    up_hint = np.asarray(cam.up, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up_hint)
    right = right / np.linalg.norm(right)
    up = np.cross(right, fwd)
    flip_h, flip_v = flips(orientation)
    if flip_h:
        right = -right
    if flip_v:
        up = -up
    return eye, fwd, right, up, float(np.tan(np.radians(cam.fov) / 2.0))


def camera_basis(cam: Camera, orientation: str = "NSWE") -> CameraBasis:
    """Orthonormal view basis from eye/target/up + fov.

    View-orientation flips mirror the image by negating the right/up basis
    vectors: horizontal flip => E appears left (negate right), vertical
    flip => S appears up (negate up). Mirrors, not rotations — matching the
    reference's telescope orientations.
    """
    eye, fwd, right, up, _ = camera_basis_np(cam, orientation)
    return CameraBasis(
        eye=jnp.asarray(eye, jnp.float32),
        forward=jnp.asarray(fwd, jnp.float32),
        right=jnp.asarray(right, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        tan_half_fov=jnp.float32(np.tan(np.radians(cam.fov) / 2.0)),
    )


def probe_hit_dirs(cam: Camera, orientation: str, height: int, width: int,
                   radius: float) -> np.ndarray:
    """Unit directions (from the body center) of where a 3x3 grid of probe
    pixels lands on the sphere of the given radius — host numpy. Rays that
    miss use the closest-approach point, so limb/background probes still
    track how the view sweeps past the body. Used to bound how far
    body-frame ray footprints move under a camera change."""
    eye, fwd, right, up, thf = camera_basis_np(cam, orientation)
    ys = np.array([0.0, (height - 1) / 2.0, height - 1.0])
    xs = np.array([0.0, (width - 1) / 2.0, width - 1.0])
    v = 1.0 - 2.0 * (ys[:, None] + 0.5) / height
    u = (2.0 * (xs[None, :] + 0.5) / width - 1.0) * (width / height)
    d = (fwd[None, None] + thf * (u[..., None] * right[None, None]
                                  + v[..., None] * up[None, None]))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # |eye + t d|^2 = r^2; fall back to closest approach (t = -eye.d)
    b = d @ eye
    disc = b * b - (eye @ eye - radius * radius)
    t = np.where(disc > 0.0, -b - np.sqrt(np.maximum(disc, 0.0)), -b)
    p = eye[None, None] + t[..., None] * d
    return p / np.linalg.norm(p, axis=-1, keepdims=True)


def ray_directions(basis: CameraBasis, height: int, width: int,
                   jitter=None, row_offset=0, full_height: int = None,
                   full_width: int = None) -> jnp.ndarray:
    """Unit ray directions (H, W, 3) in scene coordinates.

    Vertical FOV; square pixels; pixel centers at +0.5. ``jitter`` is an
    optional (2,) or (H, W, 2) sub-pixel offset in [-0.5, 0.5) used by
    progressive accumulation for antialiasing. ``row_offset``/``full_height``
    render a horizontal strip of a larger image (image-tile sharding over a
    device mesh).
    """
    fh = height if full_height is None else full_height
    fw = width if full_width is None else full_width
    ys = jnp.arange(height, dtype=jnp.float32)[:, None] + row_offset
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    jy = 0.0 if jitter is None else jitter[..., 0]
    jx = 0.0 if jitter is None else jitter[..., 1]
    # NDC in [-1, 1], y up
    v = 1.0 - 2.0 * (ys + 0.5 + jy) / fh
    u = (2.0 * (xs + 0.5 + jx) / fw - 1.0) * (fw / fh)
    u = jnp.broadcast_to(u, (height, width))
    v = jnp.broadcast_to(v, (height, width))
    d = (basis.forward[None, None, :]
         + basis.tan_half_fov * (u[..., None] * basis.right[None, None, :]
                                 + v[..., None] * basis.up[None, None, :]))
    return normalize(d)


def pixel_ray(basis: CameraBasis, y: float, x: float,
              height: int, width: int) -> jnp.ndarray:
    """Single ray direction for picking (image pixel coords, y down)."""
    v = 1.0 - 2.0 * (y + 0.5) / height
    u = (2.0 * (x + 0.5) / width - 1.0) * (width / height)
    d = (basis.forward + basis.tan_half_fov
         * (u * basis.right + v * basis.up))
    return normalize(d)
