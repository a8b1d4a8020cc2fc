"""Single configuration object consumed by the CLI, the GUI launcher and the
init-view codec.

The reference spreads the same parameters over argparse flags
(reference main.py:52-93), a Tk form (main_gui_launcher.py:137-347) and the
init-view string (main.py:206-263); here they share one validated dataclass.
"""

from __future__ import annotations

import dataclasses
from datetime import datetime
from typing import Optional

from moonrtx_tpu import constants as C
from moonrtx_tpu import orientation
from moonrtx_tpu.types import Camera, Observer


class ConfigError(ValueError):
    """Raised when a configuration value is out of its supported range."""


@dataclasses.dataclass
class RenderConfig:
    """Validated render configuration (defaults match reference main.py:52-93)."""

    observer: Observer = Observer(0.0, 0.0, 0)
    dt_local: Optional[datetime] = None
    elevation_file: Optional[str] = None
    color_file: Optional[str] = None
    starmap_file: Optional[str] = None
    features_file: Optional[str] = None
    downscale: int = C.DEFAULT_DOWNSCALE
    brightness: int = C.DEFAULT_BRIGHTNESS
    gamma: float = C.DEFAULT_GAMMA
    time_step_minutes: int = C.DEFAULT_TIME_STEP_MINUTES
    view_orientation: str = orientation.NSWE
    parallactic_mode: bool = False
    shadow_accuracy: int = C.DEFAULT_SHADOW_ACCURACY
    initial_camera: Optional[Camera] = None
    # Engine extensions (no reference equivalent):
    width: int = 1920
    height: int = 1080
    backend: str = "auto"          # auto | blocked | reference | pallas (mxu = alias for blocked)
    accumulation_frames: int = C.MAX_ACCUMULATION_FRAMES
    # HBM storage for the map pyramids: "auto" quantizes large maps
    # (int16 heights / uint8 albedo, ~0.08 m height resolution — finer
    # than the source LDEM's 0.5 m) so the full-resolution LOLA grid fits
    # one chip; "off" keeps f32; "i16" forces quantization.
    quantize: str = "auto"
    # one-bounce terrain interreflection (the stand-in for the reference's
    # path-traced indirect segments, moon_renderer.py:441-445)
    indirect_light: bool = True
    # deterministic terrain bounces: 1 (default) or 2. The reference's
    # path_seg_range admits up to two; ground truth measures the second
    # bounce at ~5% of the indirect term (docs/GI.md), so 1 is the
    # default and 2 is exact-parity mode (one extra radiosity pyramid in
    # the bounce program).
    indirect_bounces: int = 1
    # target grid for the PROCEDURAL elevation fallback (real data files
    # absent): None = the base synthesis grid; (H, W) = upsample to the
    # given size (an integer multiple of the base grid — e.g. the real
    # LOLA LDEM working sets 23040x46080 / 46080x92160, reference
    # main.py:25-29), streamed and disk-cached so the full-scale
    # experience needs no downloads. The bench exercises the same path.
    synth_shape: Optional[tuple] = None
    # device-mesh width for multi-chip rendering: 1 = single device,
    # 0 = auto (all local devices), N = exactly N (image rows + shadow-scan
    # phi wedges shard over the mesh; ICI gathers the frame)
    devices: int = 1
    # Per-chip HBM budget (GiB) for the map pyramids in mesh mode. When
    # devices > 1 and the device-ready pyramids exceed this budget, the
    # render-level mips are band-sharded across the mesh
    # (parallel/hfshard.py) instead of replicated — the non-destructive
    # replacement for the reference's --downscale memory trade
    # (main.py:25-29, data_loader.py:169-175). 0 = auto: read the
    # device's memory limit when the backend reports one, otherwise
    # replicate (today's behavior). Ignored with devices <= 1.
    hbm_budget_gb: float = 0.0
    # surface photometric function: "lambert" = pure diffuse (matches the
    # reference's OptiX shading); "lunar" = McEwen lunar-Lambert blend
    # (Lommel-Seeliger back-scattering — the real regolith's flat-bright
    # full-Moon look; engine/light.py lunar_lambert_blend)
    photometric: str = "lambert"
    # lunar-eclipse shading: attenuate solar irradiance per shaded point by
    # the visible-sun fraction against the Earth's disk (umbra/penumbra +
    # red refracted light; the reference has no Earth in its scene and
    # renders an ordinary full Moon during eclipses). Zero effect outside
    # real eclipses — the coverage term self-gates on angular separation.
    eclipse_shading: bool = True
    # earthshine: Lambert term toward the Earth lighting the night side
    # (the da Vinci glow on the crescent Moon's dark limb), scaled by the
    # Earth's illuminated fraction; display-calibrated
    # (constants.EARTHSHINE_RELATIVE). The reference's night side is black.
    earthshine: bool = True

    def validate(self) -> "RenderConfig":
        """Range-check every field (reference main.py:298-332)."""
        if not (-90.0 <= self.observer.lat <= 90.0):
            raise ConfigError("Invalid latitude. Must be between -90 and 90 degrees.")
        if not (-180.0 <= self.observer.lon <= 180.0):
            raise ConfigError("Invalid longitude. Must be between -180 and 180 degrees.")
        lo, hi = C.ELEVATION_RANGE_M
        if not (lo <= self.observer.elevation_m <= hi):
            raise ConfigError(f"Invalid elevation. Must be between {lo} and {hi} meters.")
        if self.downscale < 1 or int(self.downscale) != self.downscale:
            raise ConfigError("Invalid downscale factor. Must be a positive integer.")
        lo, hi = C.BRIGHTNESS_RANGE
        if not (lo <= self.brightness <= hi):
            raise ConfigError(f"Invalid brightness. Must be between {lo} and {hi}.")
        lo, hi = C.GAMMA_RANGE
        if not (lo <= self.gamma <= hi):
            raise ConfigError(f"Invalid gamma. Must be between {lo} and {hi}.")
        lo, hi = C.TIME_STEP_RANGE
        if not (lo <= self.time_step_minutes <= hi):
            raise ConfigError(f"Invalid time step. Must be between {lo} and {hi} minutes.")
        lo, hi = C.SHADOW_ACCURACY_RANGE
        if not (lo <= self.shadow_accuracy <= hi):
            raise ConfigError(f"Invalid shadow accuracy. Must be between {lo} and {hi}.")
        if self.view_orientation not in orientation.VIEW_ORIENTATIONS:
            raise ConfigError(
                f"Invalid view orientation '{self.view_orientation}'. Must be one of: "
                + ", ".join(orientation.VIEW_ORIENTATIONS)
            )
        if self.dt_local is not None and self.dt_local.tzinfo is None:
            raise ConfigError("Time without timezone information.")
        if self.width <= 0 or self.height <= 0:
            raise ConfigError("Invalid render size.")
        if self.backend not in ("auto", "blocked", "reference", "mxu", "pallas"):
            raise ConfigError(f"Invalid backend '{self.backend}'.")
        if self.photometric not in ("lambert", "lunar"):
            raise ConfigError(
                f"Invalid photometric function '{self.photometric}'. "
                "Must be 'lambert' or 'lunar'.")
        if self.quantize not in ("auto", "off", "i16"):
            raise ConfigError(f"Invalid quantize mode '{self.quantize}'.")
        if self.devices < 0 or int(self.devices) != self.devices:
            raise ConfigError("Invalid devices count. Must be 0 (auto) or a "
                              "positive integer.")
        if self.hbm_budget_gb < 0:
            raise ConfigError("Invalid HBM budget. Must be 0 (auto) or a "
                              "positive number of GiB.")
        if self.indirect_bounces not in (1, 2):
            raise ConfigError("Invalid indirect bounces. Must be 1 or 2.")
        if self.synth_shape is not None:
            ss = tuple(self.synth_shape)
            if (len(ss) != 2 or any(int(v) != v or v <= 0 for v in ss)
                    or ss[1] != 2 * ss[0]):
                raise ConfigError(
                    "Invalid synth shape. Must be HxW with positive "
                    "integers and W = 2*H (equirectangular).")
        return self
