"""Ephemeris engine (host, numpy).

Analytic replacement for the reference's Skyfield + JPL-kernel stack
(reference astro.py, skyfield_utils.py). Public API mirrors the reference:

    from moonrtx_tpu import astro
    astro.init(observer)
    ephem = astro.calculate_moon_ephemeris(dt_local, parallactic_mode)
"""

from moonrtx_tpu.astro.ephemeris import (
    calculate_moon_ephemeris as _calc_full,
    init,
    moon_ephemeris,
)
from moonrtx_tpu.astro.timebase import validate_supported_datetime

calculate_ephemeris = _calc_full  # explicit-observer form


def calculate_moon_ephemeris(dt_local, parallactic_mode: bool = False):
    """Reference-compatible signature using the module observer
    (reference astro.py:137)."""
    return moon_ephemeris(dt_local, parallactic_mode)


__all__ = [
    "init",
    "calculate_moon_ephemeris",
    "calculate_ephemeris",
    "moon_ephemeris",
    "validate_supported_datetime",
]
