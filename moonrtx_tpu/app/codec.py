"""View-state persistence codecs.

A screenshot's default filename encodes the complete view state and can be
fed back through ``--init-view`` to restore the exact view. The wire formats
are kept byte-compatible with the reference so that filenames saved by either
application restore in the other:

* camera: 10 little-endian float32 packed then URL-safe base64 without
  padding (reference renderer_dialogs.py:14-38, main.py:173-204),
* filename: ``<isotime : -> .>_lat±DD.DDDDDD_lon±DDD.DDDDDD_view<ORI>``
  ``[_par<0|1>]_cam<base64>`` with the ``_par`` group optional for
  backward compatibility (reference renderer_dialogs.py:173-223,
  main.py:206-263).
"""

from __future__ import annotations

import base64
import re
import struct
from datetime import datetime
from typing import Optional

from moonrtx_tpu.orientation import VIEW_ORIENTATIONS
from moonrtx_tpu.types import Camera, InitView

_INIT_VIEW_RE = re.compile(
    r"^(.+?)_lat([+-]?\d+\.\d+)_lon([+-]?\d+\.\d+)"
    r"_view([A-Z]+)(?:_par([01]))?_cam([A-Za-z0-9_-]+)$"
)


def encode_camera(camera: Camera) -> str:
    """Pack eye(3)+target(3)+up(3)+fov into unpadded URL-safe base64."""
    packed = struct.pack(
        "<10f",
        *camera.eye[:3],
        *camera.target[:3],
        *camera.up[:3],
        camera.fov,
    )
    return base64.urlsafe_b64encode(packed).decode("ascii").rstrip("=")


def decode_camera(encoded: str) -> Optional[Camera]:
    """Inverse of :func:`encode_camera`; returns None on malformed input."""
    try:
        pad = -len(encoded) % 4
        raw = base64.urlsafe_b64decode(encoded + "=" * pad)
        v = struct.unpack("<10f", raw)
    except Exception:
        return None
    return Camera(eye=list(v[0:3]), target=list(v[3:6]), up=list(v[6:9]), fov=v[9])


def parse_iso_datetime(time_iso: str) -> tuple[Optional[datetime], Optional[Exception]]:
    """ISO datetime with mandatory timezone; trailing Z accepted
    (reference main.py:162-171)."""
    if time_iso.endswith("Z"):
        time_iso = time_iso[:-1] + "+00:00"
    try:
        dt = datetime.fromisoformat(time_iso)
    except ValueError as e:
        return None, e
    if dt.tzinfo is None:
        return None, ValueError("Time without timezone information.")
    return dt, None


def format_view_state(
    dt_local: datetime,
    lat: float,
    lon: float,
    view_orientation: str,
    parallactic_mode: bool,
    camera: Optional[Camera],
) -> str:
    """Default screenshot filename, without extension
    (reference renderer_dialogs.py:173-223)."""
    parts = [dt_local.isoformat().replace(":", ".")]
    parts.append(f"lat{lat:+.6f}")
    parts.append(f"lon{lon:+.6f}")
    parts.append(f"view{view_orientation}")
    parts.append(f"par{1 if parallactic_mode else 0}")
    parts.append(f"cam{encode_camera(camera)}" if camera is not None else "nocam")
    return "_".join(parts)


def parse_init_view(init_view_str: str) -> Optional[InitView]:
    """Parse a screenshot filename (no extension) back into view state."""
    m = _INIT_VIEW_RE.match(init_view_str)
    if not m:
        return None
    dt_str, lat_s, lon_s, view_orientation, par_flag, cam_s = m.groups()
    if view_orientation not in VIEW_ORIENTATIONS:
        return None
    camera = decode_camera(cam_s)
    if camera is None:
        return None
    dt_local, err = parse_iso_datetime(dt_str.replace(".", ":"))
    if err is not None:
        return None
    return InitView(
        dt_local=dt_local,
        lat=float(lat_s),
        lon=float(lon_s),
        view_orientation=view_orientation,
        parallactic_mode=par_flag == "1",
        camera=camera,
    )
