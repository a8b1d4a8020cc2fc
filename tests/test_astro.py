"""Ephemeris engine validation.

Cross-checks against published worked examples (Meeus, *Astronomical
Algorithms* examples 47.a / 53.a), historical eclipse geometry, and
internal consistency invariants (SURVEY.md section 4 test strategy).
"""

import math
from datetime import datetime, timezone, timedelta

import numpy as np
import pytest

from moonrtx_tpu.astro import calculate_ephemeris, init, moon_ephemeris
from moonrtx_tpu.astro.frames import mean_obliquity_deg, nutation_deg, refraction_deg
from moonrtx_tpu.astro.libration import (
    body_from_ecliptic_matrix,
    optical_libration_check,
)
from moonrtx_tpu.astro.moon import moon_arguments, moon_geometric
from moonrtx_tpu.astro.sun import sun_geometric
from moonrtx_tpu.astro.timebase import julian_day_utc, timescales
from moonrtx_tpu.types import Observer

T_47A = -0.077221081451  # 1992 April 12.0 TT


def test_julian_day():
    assert julian_day_utc(datetime(2000, 1, 1, 12, tzinfo=timezone.utc)) == 2451545.0
    assert julian_day_utc(datetime(1987, 4, 10, 0, tzinfo=timezone.utc)) == pytest.approx(2446895.5)


def test_moon_position_meeus_47a():
    lam, beta, dist = moon_geometric(T_47A)
    assert lam == pytest.approx(133.162655, abs=2e-5)
    assert beta == pytest.approx(-3.229126, abs=5e-5)
    assert dist == pytest.approx(368409.7, abs=1.0)


def test_nutation_and_obliquity_meeus_47a():
    dpsi, deps = nutation_deg(T_47A)
    assert dpsi * 3600 == pytest.approx(16.595, abs=0.05)
    assert mean_obliquity_deg(T_47A) + deps == pytest.approx(23.440636, abs=2e-5)


def test_sun_position_meeus_25a():
    # Meeus example 25.a: 1992 October 13.0 TD: true lon 199.90988, R=0.99766 AU
    T = -0.072183436
    lon, dist = sun_geometric(T)
    assert lon == pytest.approx(199.90988, abs=2e-4)
    assert dist / 149597870.7 == pytest.approx(0.99766, abs=1e-4)


def test_total_libration_meeus_53a():
    """Matrix-based libration must match the published totals l=-1.23, b=+4.20."""
    lam, beta, dist = moon_geometric(T_47A)
    dpsi, _ = nutation_deg(T_47A)
    a = moon_arguments(T_47A)
    lam_app = lam + dpsi
    lp, bp = optical_libration_check(lam_app, beta, a, dpsi)
    assert lp == pytest.approx(-1.206, abs=0.005)
    assert bp == pytest.approx(4.194, abs=0.005)

    e = -np.array([
        math.cos(math.radians(beta)) * math.cos(math.radians(lam_app)),
        math.cos(math.radians(beta)) * math.sin(math.radians(lam_app)),
        math.sin(math.radians(beta)),
    ])
    v = body_from_ecliptic_matrix(a, T_47A, dpsi) @ e
    l_tot = math.degrees(math.atan2(v[1], v[0]))
    b_tot = math.degrees(math.asin(v[2]))
    assert l_tot == pytest.approx(-1.231, abs=0.01)
    assert b_tot == pytest.approx(4.200, abs=0.01)


MAZATLAN = Observer(23.2, -106.4, 0)


def test_total_solar_eclipse_2024():
    """2024-04-08 18:18 UTC totality over Mazatlan: Sun and Moon coincide."""
    e = calculate_ephemeris(datetime(2024, 4, 8, 18, 18, tzinfo=timezone.utc), MAZATLAN)
    assert e.elongation < 0.3
    assert e.phase_angle > 179.0
    assert e.phase_name == "New Moon"
    assert 65.0 < e.alt < 75.0  # reported mid-eclipse altitude ~ 69-70 deg
    assert abs(e.colongitude - 270.0) < 5.0


def test_total_lunar_eclipse_2019():
    """2019-01-21 05:12 UTC maximum: Moon opposite the Sun."""
    e = calculate_ephemeris(datetime(2019, 1, 21, 5, 12, tzinfo=timezone.utc),
                            Observer(40.7, -74.0, 10))
    assert e.elongation > 179.4
    assert e.phase_angle < 0.6
    assert e.phase_name == "Full Moon"
    assert abs(e.colongitude - 90.0) < 5.0


def test_first_quarter_2024():
    e = calculate_ephemeris(datetime(2024, 4, 15, 19, 13, tzinfo=timezone.utc),
                            Observer(0.0, 0.0, 0))
    assert e.phase_name == "First Quarter"
    assert e.phase_angle == pytest.approx(90.0, abs=1.5)
    # waxing: the bright limb faces celestial west (sun trails the moon)
    assert e.elongation == pytest.approx(90.0, abs=2.0)


def test_rotation_matrix_orthonormal():
    e = calculate_ephemeris(datetime(2026, 8, 16, 3, 0, tzinfo=timezone.utc), MAZATLAN)
    R = e.rotation_matrix
    assert np.abs(R @ R.T - np.eye(3)).max() < 1e-12
    assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-12)


def test_distance_and_libration_ranges():
    """Scan a lunation: distance within perigee/apogee, librations < 10 deg."""
    t0 = datetime(2025, 3, 1, tzinfo=timezone.utc)
    for d in range(0, 30, 2):
        e = calculate_ephemeris(t0 + timedelta(days=d), Observer(52.0, 21.0, 100))
        assert 354000 < e.distance < 407500
        assert abs(e.libr_long_geo) < 10 and abs(e.libr_lat_geo) < 10
        assert abs(e.libr_long_topo) < 11 and abs(e.libr_lat_topo) < 11
        assert 0.0 <= e.colongitude < 360.0
        assert 1_460_000_00 < e.sun_distance < 1_530_000_00  # 146-153 M km


def test_phase_cycle_names():
    """Phase names progress through the cycle over one synodic month."""
    t0 = datetime(2024, 4, 8, 18, 18, tzinfo=timezone.utc)  # new moon
    names = []
    for d in np.arange(0.5, 29.5, 1.0):
        e = calculate_ephemeris(t0 + timedelta(days=float(d)), Observer(0, 0, 0))
        if not names or names[-1] != e.phase_name:
            names.append(e.phase_name)
    assert names[0] == "Waxing Crescent"
    assert "Waxing Gibbous" in names
    assert "Full Moon" in names or "Waning Gibbous" in names
    assert names.index("Waning Crescent") > names.index("Waxing Crescent")


def test_parallactic_mode_zeroes_q():
    dt = datetime(2025, 1, 10, 22, 0, tzinfo=timezone.utc)
    obs = Observer(50.0, 20.0, 200)
    e_par = calculate_ephemeris(dt, obs, parallactic_mode=True)
    e_std = calculate_ephemeris(dt, obs, parallactic_mode=False)
    # bright_limb_angle = PA - q: with q=0 they differ by exactly q
    diff = (e_std.bright_limb_angle - e_par.bright_limb_angle) % 360.0
    assert diff != pytest.approx(0.0, abs=1e-6)  # q nonzero away from meridian
    # rotation matrices differ only by a roll about the sight axis
    R = e_std.rotation_matrix @ e_par.rotation_matrix.T
    assert R[1, 1] == pytest.approx(1.0, abs=1e-9)


def test_date_range_validation():
    with pytest.raises(ValueError):
        calculate_ephemeris(datetime(1899, 12, 31, tzinfo=timezone.utc), MAZATLAN)
    with pytest.raises(ValueError):
        calculate_ephemeris(datetime(2051, 1, 2, tzinfo=timezone.utc), MAZATLAN)
    with pytest.raises(ValueError):
        calculate_ephemeris(datetime(2024, 1, 1), MAZATLAN)  # naive


def test_module_level_observer_api():
    init(MAZATLAN)
    e = moon_ephemeris(datetime(2024, 4, 8, 18, 18, tzinfo=timezone.utc))
    assert e.phase_name == "New Moon"


def test_refraction_profile():
    assert refraction_deg(90.0) < 0.001
    assert 0.05 < refraction_deg(10.0) < 0.12
    assert 0.3 < refraction_deg(0.0) < 0.65
    assert refraction_deg(-5.0) == 0.0


def test_timescales_delta_t_modern():
    ts = timescales(datetime(2020, 1, 1, tzinfo=timezone.utc))
    assert 68.0 < ts.delta_t < 71.0
    ts = timescales(datetime(1950, 6, 1, tzinfo=timezone.utc))
    assert 27.0 < ts.delta_t < 32.0


def test_perigee_2016_supermoon():
    """2016-11-14 11:23 UTC: closest perigee 1948-2034, geocentric
    356,509 km (widely published). The truncated series should land within
    ~100 km; MoonEphemeris.distance itself is TOPOCENTRIC (differs by up
    to an Earth radius, like the reference's Skyfield observer)."""
    ts = timescales(datetime(2016, 11, 14, 11, 23, tzinfo=timezone.utc))
    _, _, dist = moon_geometric(ts.T)
    assert dist == pytest.approx(356509.0, abs=100.0)
    # and it is a minimum
    for dh in (-6.0, 6.0):
        ts2 = timescales(datetime(2016, 11, 14, 11, 23, tzinfo=timezone.utc)
                         + timedelta(hours=dh))
        assert moon_geometric(ts2.T)[2] > dist
    # topocentric distance exceeds geocentric by up to one Earth radius
    e = calculate_ephemeris(datetime(2016, 11, 14, 11, 23, tzinfo=timezone.utc),
                            Observer(0.0, 0.0, 0))
    assert 0.0 < e.distance - dist < 6500.0


def test_partial_lunar_eclipse_2024sep():
    """2024-09-18 02:44 UTC partial lunar eclipse maximum (partial -> the
    Moon passes OFF the shadow axis; topocentric elongation ~178.4)."""
    e = calculate_ephemeris(datetime(2024, 9, 18, 2, 44, tzinfo=timezone.utc),
                            Observer(40.4, -3.7, 650))
    assert e.elongation > 178.0
    assert e.phase_name == "Full Moon"


def test_major_lunar_standstill_2025():
    """2024-2025 is a major lunar standstill: monthly declination extremes
    reach ~ +/-28.5 deg (obliquity + inclination)."""
    obs = Observer(0.0, 0.0, 0)
    decs = [calculate_ephemeris(
        datetime(2025, 3, 1, tzinfo=timezone.utc) + timedelta(hours=13 * i),
        obs).dec for i in range(60)]
    assert max(decs) > 28.0
    assert min(decs) < -28.0


def test_range_sweep_invariants():
    """Physical invariants at 120 samples across the FULL supported range
    (1900-2051) — a series blow-up anywhere in the range cannot pass.
    Backs the error budget in docs/EPHEMERIS.md: point checks pin
    accuracy at known dates; this pins sanity everywhere else."""
    obs = Observer(50.06, 19.94, 219)
    start = datetime(1900, 1, 15, 12, tzinfo=timezone.utc)
    end = datetime(2050, 12, 15, 12, tzinfo=timezone.utc)
    n = 120
    step = (end - start) / (n - 1)
    prev_col, prev_dt = None, None
    for i in range(n):
        dt = start + step * i
        e = calculate_ephemeris(dt, obs, False)
        # geometry stays inside hard physical bounds (topocentric
        # distance: geocentric extremes widened by the Earth radius)
        assert 350000 < e.distance < 413500, (dt, e.distance)
        assert abs(e.libr_lat_geo) < 8.0 and abs(e.libr_long_geo) < 9.0
        assert abs(e.libr_lat_topo) < 9.0 and abs(e.libr_long_topo) < 10.0
        assert 0.0 <= e.phase_angle <= 180.0
        assert 0.0 <= e.colongitude < 360.0
        R = np.asarray(e.rotation_matrix)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-9)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-9)
        prev_col, prev_dt = e.colongitude, dt

    # colongitude advances ~12.19 deg/day: check the mean rate over a
    # fortnight at three widely separated epochs (sun-theory drift at any
    # epoch would show up directly here)
    for year in (1905, 1977, 2049):
        d0 = datetime(year, 3, 1, tzinfo=timezone.utc)
        c0 = calculate_ephemeris(d0, obs, False).colongitude
        c1 = calculate_ephemeris(d0 + timedelta(days=14), obs,
                                 False).colongitude
        rate = (((c1 - c0) % 360.0) + 360.0) % 360.0 / 14.0
        assert rate == pytest.approx(12.19, abs=0.1), (year, rate)


def test_colongitude_consistent_with_rotation_matrix():
    """docs/EPHEMERIS.md cross-path pin: the subsolar longitude derived
    from `colongitude` (the pure ephemeris scalar) must match the sun
    direction obtained INDEPENDENTLY by rotating the renderer's light
    position into the body frame (rotation_matrix chain + light-geometry
    code, the path the parity harness measures the terminator with).
    Agreement here bounds frame/sign errors between the two paths well
    below the 0.012-deg series budget, at epochs across the range."""
    from moonrtx_tpu.engine.light import calculate_light_pos

    obs = Observer(50.06, 19.94, 219)
    for year, month in ((1902, 3), (1968, 7), (2024, 4), (2049, 11)):
        dt = datetime(year, month, 15, 21, tzinfo=timezone.utc)
        e = calculate_ephemeris(dt, obs, False)
        sun_body = np.asarray(e.rotation_matrix).T @ np.asarray(
            calculate_light_pos(e))
        sun_body /= np.linalg.norm(sun_body)
        # renderer body frame: lon 0 at -Y, +X at 90E
        lon_from_matrix = math.degrees(
            math.atan2(sun_body[0], -sun_body[1]))
        lon_from_colong = (90.0 - e.colongitude + 180.0) % 360.0 - 180.0
        d = abs((lon_from_matrix - lon_from_colong + 180.0) % 360.0 - 180.0)
        # the light-position path bakes in the reference's documented
        # 21,460-unit parallax (~0.027 deg, moon_renderer.py:44-48);
        # anything beyond parallax + budget is a frame bug
        assert d < 0.05, (year, d)
