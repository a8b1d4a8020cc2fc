"""Camera / init-view codec round trips (reference renderer_dialogs.py:14-38,
main.py:173-263)."""

import struct
import base64
from datetime import datetime, timezone, timedelta

import pytest

from moonrtx_tpu.app import codec
from moonrtx_tpu.types import Camera


def _cam(fov=4.2):
    return Camera(
        eye=[0.0, -300.0, 0.0],
        target=[0.0, 0.0, 0.0],
        up=[0.0, 0.0, 1.0],
        fov=fov,
    )


def test_camera_round_trip():
    cam = Camera(eye=[1.5, -2.25, 3.0], target=[0.1, 0.2, -0.3],
                 up=[0.0, 0.7071, 0.7071], fov=12.5)
    out = codec.decode_camera(codec.encode_camera(cam))
    assert out is not None
    for a, b in zip(out.eye + out.target + out.up + [out.fov],
                    cam.eye + cam.target + cam.up + [cam.fov]):
        assert a == pytest.approx(b, rel=1e-6)


def test_camera_encoding_is_packed_le_floats():
    cam = _cam()
    enc = codec.encode_camera(cam)
    assert "=" not in enc and "+" not in enc and "/" not in enc
    raw = base64.urlsafe_b64decode(enc + "=" * (-len(enc) % 4))
    vals = struct.unpack("<10f", raw)
    assert vals[1] == pytest.approx(-300.0)
    assert vals[9] == pytest.approx(4.2, rel=1e-6)


def test_decode_camera_malformed():
    assert codec.decode_camera("!!!") is None
    assert codec.decode_camera("AAAA") is None  # too short


def test_init_view_round_trip():
    dt = datetime(2025, 12, 26, 16, 30, 0, tzinfo=timezone(timedelta(hours=1)))
    name = codec.format_view_state(dt, 50.0614, 19.9365, "SNEW", True, _cam())
    iv = codec.parse_init_view(name)
    assert iv is not None
    assert iv.dt_local == dt
    assert iv.lat == pytest.approx(50.0614)
    assert iv.lon == pytest.approx(19.9365)
    assert iv.view_orientation == "SNEW"
    assert iv.parallactic_mode is True
    assert iv.camera.fov == pytest.approx(4.2, rel=1e-6)


def test_init_view_backward_compat_without_par():
    """Pre-parallactic filenames lack _par and default to OFF
    (reference main.py:211-214)."""
    dt = datetime(2024, 1, 1, 12, 0, 0, tzinfo=timezone.utc)
    name = codec.format_view_state(dt, -34.6131, -58.3772, "NSWE", False, _cam())
    legacy = name.replace("_par0", "")
    iv = codec.parse_init_view(legacy)
    assert iv is not None
    assert iv.parallactic_mode is False
    assert iv.lat == pytest.approx(-34.6131)


def test_init_view_rejects_bad_orientation():
    dt = datetime(2024, 1, 1, 12, 0, 0, tzinfo=timezone.utc)
    name = codec.format_view_state(dt, 0.0, 0.0, "NSWE", False, _cam())
    assert codec.parse_init_view(name.replace("viewNSWE", "viewXYZW")) is None


def test_parse_iso_datetime_z_suffix():
    dt, err = codec.parse_iso_datetime("2024-01-01T12:00:00Z")
    assert err is None
    assert dt.tzinfo is not None
    dt, err = codec.parse_iso_datetime("2024-01-01T12:00:00")
    assert dt is None and err is not None
