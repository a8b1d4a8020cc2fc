"""Shared value types.

Functional counterparts of the reference's NamedTuples
(reference shared_types.py) plus engine-side pytrees.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np


class MoonEphemeris(NamedTuple):
    """Full topocentric Moon ephemeris (reference shared_types.py:5-21).

    Angles in degrees, distances in km. ``rotation_matrix`` maps body-frame
    (renderer selenographic) vectors to scene coordinates:
    ``scene = R @ body`` (reference astro.py:87-110).
    """

    az: float
    alt: float
    ra: float
    dec: float
    distance: float
    sun_distance: float
    phase_angle: float
    bright_limb_angle: float
    libr_long_geo: float
    libr_lat_geo: float
    libr_long_topo: float
    libr_lat_topo: float
    elongation: float
    phase_name: str
    colongitude: float
    rotation_matrix: np.ndarray


class MoonFeature(NamedTuple):
    """One entry of the lunar feature database (reference shared_types.py:23-33)."""

    name: str
    lat: float
    lon: float
    angular_radius: float
    diameter_km: float
    standard_label: bool
    spot_label: bool
    status_bar: bool
    feature_id: Optional[int]
    www_address: Optional[str]


class Camera(NamedTuple):
    """Pinhole camera (reference shared_types.py:35-43)."""

    eye: list
    target: list
    up: list
    fov: float
    type: str = "Pinhole"
    aperture_radius: float = 0.01
    aperture_fract: float = 0.2
    focal_scale: float = 0.7


class Observer(NamedTuple):
    """Earth-surface observer (reference shared_types.py:45-48)."""

    lat: float
    lon: float
    elevation_m: int


class MoonLabel(NamedTuple):
    """A text label placed on the sphere (reference shared_types.py:50-52)."""

    segments: list
    anchor_point: tuple


@dataclasses.dataclass(frozen=True)
class InitView:
    """Parsed init-view data restoring a screenshot view (reference main.py:43-50)."""

    dt_local: "object"  # datetime
    lat: float
    lon: float
    view_orientation: str
    parallactic_mode: bool
    camera: Camera


def camera_as_arrays(cam: Camera) -> tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """eye, target, up as float64 arrays plus fov."""
    return (
        np.asarray(cam.eye, dtype=np.float64),
        np.asarray(cam.target, dtype=np.float64),
        np.asarray(cam.up, dtype=np.float64),
        float(cam.fov),
    )
