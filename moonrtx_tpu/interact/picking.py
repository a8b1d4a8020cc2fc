"""Picking: hit position -> selenographic coordinates, and vectorized
feature lookup (reference renderer_navigation.py:76-117, 449-489)."""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from moonrtx_tpu import constants as C
from moonrtx_tpu.types import MoonFeature


def hit_to_selenographic(rotation_inv: np.ndarray, hx: float, hy: float,
                         hz: float) -> tuple[Optional[float], Optional[float]]:
    """Scene-frame hit -> (lat, lon) degrees, or (None, None) off the Moon.

    Sanity band 0.9..1.15 R rejects hits on non-Moon geometry
    (reference renderer_navigation.py:449-489)."""
    hit = np.array([hx, hy, hz], float)
    r = np.linalg.norm(hit)
    if r < C.MOON_RADIUS * 0.9 or r > C.MOON_RADIUS * 1.15:
        return None, None
    u = rotation_inv @ (hit / r)
    lat = math.degrees(math.asin(float(np.clip(u[2], -1.0, 1.0))))
    lon = math.degrees(math.atan2(u[0], -u[1]))
    return lat, lon


class FeatureLookup:
    """Vectorized smallest-first feature lookup under the cursor.

    Features must be pre-sorted by angular_radius ascending; the first match
    is then the most specific feature (reference renderer_navigation.py:90-117;
    the vectorization replaces a ~1.8 ms Python scan with ~0.02 ms)."""

    def __init__(self, features_sorted: list[MoonFeature],
                 all_features: Optional[list[MoonFeature]] = None):
        """all_features: the unfiltered catalog for name search() (the
        reference searches every feature, renderer_dialogs.py:272-285);
        defaults to the status_bar-filtered cursor-lookup set."""
        self.features = [f for f in features_sorted if f.status_bar]
        self.features_all = (all_features if all_features is not None
                             else self.features)
        self._lat = np.array([f.lat for f in self.features])
        self._lon = np.array([f.lon for f in self.features])
        self._cos_lat = np.cos(np.radians(self._lat))
        self._radius2 = np.array([f.angular_radius for f in self.features]) ** 2

    def find(self, lat: float, lon: float) -> Optional[MoonFeature]:
        if not self.features:
            return None
        dist2 = ((lat - self._lat) ** 2
                 + ((lon - self._lon) * self._cos_lat) ** 2)
        hits = np.flatnonzero(dist2 <= self._radius2)
        return self.features[hits[0]] if hits.size else None

    def search(self, query: str) -> list[MoonFeature]:
        """Case-insensitive substring search over ALL features
        (reference renderer_dialogs.py:272-285)."""
        q = query.lower().strip()
        if not q:
            return []
        return [f for f in self.features_all if q in f.name.lower()]
