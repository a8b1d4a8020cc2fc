"""MoonScene: functional scene state + device resource management.

The host-side owner of everything the render pipeline needs: device-resident
mip pyramids, the current ephemeris-driven FrameParams, camera state,
progressive accumulation, and the rebuild triggers (background on camera
change, shadow map on time change) — the functional counterpart of the
reference's MoonRenderer scene management (moon_renderer.py:432-683), with
no mutable engine underneath: every frame is a pure function of state.
"""

from __future__ import annotations

import functools
import math
import time as _time
from datetime import datetime
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from moonrtx_tpu import constants as C
from moonrtx_tpu.astro import calculate_ephemeris
from moonrtx_tpu.config import RenderConfig
from moonrtx_tpu.data.mips import pad_lon_wrap, select_level
from moonrtx_tpu.data.pyramids import (
    PAD_COLS,
    QUANTIZE_TEXELS,
    load_or_build,
)
from moonrtx_tpu.engine import blocked
from moonrtx_tpu.engine import light as light_mod
from moonrtx_tpu.engine import render as render_mod
from moonrtx_tpu.engine import camera as camera_mod
from moonrtx_tpu.engine import geometry
from moonrtx_tpu.engine.camera import CameraBasis, camera_basis
from moonrtx_tpu.engine.render import FrameParams
from moonrtx_tpu.ops import sampler
from moonrtx_tpu.types import Camera, MoonEphemeris

# PAD_COLS / QUANTIZE_TEXELS / ALB_MAX_W live in data.pyramids with the
# pyramid builder (imported above).

# Shadow scans sample the heightfield at the scan grid's own resolution
# (<= 2304x4096 cells); building from a mip much finer than that wastes
# bandwidth and makes the bounce alb_lum map explode at full LDEM sizes.
SHADOW_MAX_TEXELS = 20 * 1024 * 1024

# One-bounce irradiance maps are reused across time steps while the
# sun-frame rotation since their build stays under this angle. The field's
# own blur scale is >= 2 scan cells (~0.1-0.2 deg of arc), so drifts below
# the threshold are inside its intrinsic resolution; a 15-min Q/W step
# moves the sun ~0.13 deg, so held-key animation rebuilds the bounce about
# every 4th step and the shadow factor map (the exact-terminator feature)
# every step.
BOUNCE_REUSE_DEG = 0.5

# Crossing BOUNCE_REUSE_DEG during held-key animation does NOT stall the
# frame on a bounce rebuild: the step renders with the cached map and a
# shadow_scan.bounce_refresh is dispatched BEHIND it (reusing the frame's
# own scan), so the next step picks up the fresh map. The stale map is
# used up to threshold + one step (~0.63 deg); beyond this cap (a time
# JUMP — date dialog, "now") the rebuild is synchronous for correctness.
BOUNCE_ASYNC_MAX_DEG = 4 * BOUNCE_REUSE_DEG


def _drop_mmap_pages(m) -> None:
    """Release an mmap-backed level's resident pages after upload (the
    pyramid cache is mmap'd; reading a level for the device transfer
    faults the whole file into RSS, and the pages are dead weight once
    the device copy exists — they refault from disk if measurement
    touches the level again)."""
    from moonrtx_tpu.data.mips import mmap_of

    mm, _ = mmap_of(m)
    if mm is not None:
        try:
            import mmap as _mmap

            mm.madvise(_mmap.MADV_DONTNEED)
        except (AttributeError, ValueError, OSError):
            pass


# Host->device transfers stage in row bands of this many bytes: a whole-
# level jnp.asarray stages a full-size host copy, which at the bench
# working set peaked host RSS at ~8 GB (2.9 GiB pyramids staged beside
# their mmap'd sources — round-5 verdict item 7) and would double at the
# full 46080x92160 LDEM.
UPLOAD_BAND_BYTES = 256 << 20


@functools.partial(jax.jit, donate_argnums=0)
def _band_update(o, b, r):
    # module-level (not a per-call closure): repeated band shapes across
    # levels hit the jit cache instead of re-tracing per upload call
    return jax.lax.dynamic_update_slice(o, b, (r,) + (0,) * (o.ndim - 1))


def _upload_rows_banded(m, band_bytes: int = UPLOAD_BAND_BYTES):
    """Upload a host array in row bands, capping host staging at one
    band. The device array is assembled with donated dynamic updates
    (in-place on TPU), so device transient stays out + one band.

    Every 4th band SYNCS (a 4-byte readback) and the mmap-backed source
    drops its resident pages: fully-async dispatch keeps EVERY band's
    host copy pinned in flight (measured — the async version peaked
    within ~0.7 GB of the unbanded upload), while a sync on every band
    serializes the tunnel's transfer pipelining. The 4-band window caps
    in-flight staging at ~1 GB and costs a handful of round trips per
    gigabyte."""
    rows = int(m.shape[0])
    row_bytes = max(m.nbytes // max(rows, 1), 1)
    rb = max(int(band_bytes // row_bytes), 1)
    if rows <= rb:
        out = jnp.asarray(m)
        _drop_mmap_pages(m)
        return out
    out = jnp.zeros(m.shape, dtype=m.dtype)
    probe = (0,) * m.ndim
    starts = list(range(0, rows, rb))
    for i, r0 in enumerate(starts):
        band = jnp.asarray(np.ascontiguousarray(m[r0:r0 + rb]))
        out = _band_update(out, band, jnp.int32(r0))
        if i % 4 == 3 or i == len(starts) - 1:
            np.asarray(jax.lax.dynamic_slice(out, probe, (1,) * m.ndim))
            _drop_mmap_pages(m)
    return out


def _earth_params(e, eclipse: bool, earthshine: bool) -> np.ndarray:
    """(6,) Earth-light params for FrameParams.earth: Earth direction in
    the body frame (= the sub-Earth point, i.e. geocentric libration),
    Earth distance in scene units, the refraction-enlarged Earth angular
    radius (0 disables eclipse shading — otherwise coverage self-gates on
    angular separation and only bites during an actual eclipse), and the
    earthshine irradiance relative to direct sunlight (0 disables)."""
    lat = math.radians(e.libr_lat_geo)
    lon = math.radians(e.libr_long_geo)
    cl = math.cos(lat)
    d_units = e.distance / C.MOON_RADIUS_KM * C.MOON_RADIUS
    if eclipse:
        # Chauvenet's ~2% rule enlarges the UMBRA (aE - aS), not the
        # Earth disk; widening the disk by 2% of the umbral radius makes
        # the occlusion model's umbra land exactly 2% large (the
        # penumbra's outer edge picks up a ~0.4% overshoot the
        # single-disk model cannot avoid — well under perception)
        e_geo = math.asin(C.EARTH_RADIUS_KM / e.distance)
        s_ang = math.asin(C.SUN_RADIUS_KM / e.sun_distance)
        e_ang = e_geo + ((C.UMBRA_ENLARGEMENT - 1.0)
                         * max(e_geo - s_ang, 0.0))
    else:
        e_ang = 0.0
    es = (C.EARTHSHINE_RELATIVE
          * light_mod.earthshine_fraction(e.phase_angle)
          if earthshine else 0.0)
    return np.array([cl * math.sin(lon), -cl * math.cos(lon),
                     math.sin(lat), d_units, e_ang, es], np.float32)


def _sun_frame_basis_np(sun_unit: np.ndarray) -> np.ndarray:
    """Host mirror of ops.shadow_scan.sun_frame_basis (rows = x, y, z)."""
    z = sun_unit / np.linalg.norm(sun_unit)
    helper = (np.array([0.0, 0.0, 1.0]) if abs(z[2]) < 0.9
              else np.array([1.0, 0.0, 0.0]))
    x = np.cross(helper, z)
    x = x / np.linalg.norm(x)
    return np.stack([x, np.cross(z, x), z])


def _rotation_angle_deg(a: np.ndarray, b: np.ndarray) -> float:
    """Angle of the relative rotation between two orthonormal bases."""
    cosang = (np.trace(a @ b.T) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(cosang, -1.0, 1.0))))


def default_camera() -> Camera:
    """Ephemeris-independent default view (reference moon_renderer.py:190-198)."""
    visible_height = 2 * C.MOON_RADIUS / C.MOON_FILL_FRACTION
    fov = math.degrees(2 * math.atan(visible_height / (2 * C.CAMERA_DISTANCE)))
    return Camera(eye=[0.0, -C.CAMERA_DISTANCE, 0.0], target=[0.0, 0.0, 0.0],
                  up=[0.0, 0.0, 1.0], fov=max(1.0, min(90.0, fov)))


@jax.jit
def _render_background(starmap, forward, right, up, tan_half_fov, shape2):
    """Star background for one camera pose (device; rebuilt on camera change).

    The star map is fixed to scene coordinates exactly like the reference's
    environment texture (moon_renderer.py:458-463)."""
    height, width = shape2.shape
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    v = 1.0 - 2.0 * (ys + 0.5) / height
    u = (2.0 * (xs + 0.5) / width - 1.0) * (width / height)
    d = (forward[None, None, :]
         + tan_half_fov * (u[..., None] * right[None, None, :]
                           + v[..., None] * up[None, None, :]))
    lat, lon = geometry.unit_to_latlon(d)
    h, w = starmap.shape[0], starmap.shape[1] - PAD_COLS
    row, col = sampler.latlon_to_rowcol(lat, lon, h, w)
    return sampler.gather_bilinear(starmap, row, col)


class MoonScene:
    """Owns device textures + scene state; renders progressive frames."""

    def __init__(self, config: RenderConfig, elevation: np.ndarray,
                 radius_scale: float, albedo: np.ndarray,
                 starmap: Optional[np.ndarray]):
        self.config = config
        self.radius_scale = float(radius_scale)

        quant = config.quantize
        if quant == "auto":
            quant = ("i16" if elevation.shape[0] * elevation.shape[1]
                     > QUANTIZE_TEXELS else "off")
        self.quantized = quant == "i16"

        # Mips, quantization, max map, slope stats: built by
        # data.pyramids (pure numpy) behind a device-ready disk cache —
        # at full-LDEM scale the rebuild costs ~10 min of host time per
        # process, the cache load seconds (reference data_loader.py:13-18
        # makes the same trade for its downscale products). Caching only
        # engages for quantized (i.e. big) maps.
        ps = load_or_build(elevation, albedo, self.quantized,
                           use_cache=self.quantized)
        self.h_min = ps.h_min
        self.h_scale = ps.h_scale
        self.h_offset = ps.h_offset
        self.a_scale = ps.a_scale
        self.alb_min_level = ps.alb_min_level

        # device mesh: image rows + shadow-scan phi wedges shard over it,
        # the frame comes back over ICI (parallel/tiles.py). devices=N is
        # a hard request — make_mesh fails loudly on a degraded mesh.
        n_req = int(getattr(config, "devices", 1))
        if n_req == 0:
            n_req = len(jax.devices())
        self.mesh = None
        if n_req > 1:
            from moonrtx_tpu.parallel import make_mesh
            self.mesh = make_mesh(n_req)

        # Host pyramids stay referenced: band-sharding builds per-device
        # bands from them lazily, and full-resolution measurement samples
        # the finest level without device transfers. Without a mesh only
        # the measurement reader exists, so everything but level 0 is
        # dropped after upload (host-RAM hygiene; the reference likewise
        # keeps its one elevation array for measurement,
        # renderer_navigation.py:555-596).
        self._host_mips = list(ps.mips)
        host_alb = [ps.albedo_kept[0]] * self.alb_min_level + list(
            ps.albedo_kept)
        self._host_albedo = host_alb
        self.mip_shapes = [(m.shape[0], m.shape[1] - PAD_COLS)
                           for m in ps.mips]

        # set by _plan_bands when even the fully-banded placement exceeds
        # the per-chip budget; surfaced in the status bar ("memory")
        self.hbm_over_budget: Optional[dict] = None
        # Placement policy (mesh mode): levels too big for the per-chip
        # HBM budget are band-sharded across the mesh (parallel/hfshard.py)
        # instead of replicated — the non-destructive replacement for the
        # reference's --downscale memory trade (main.py:25-29). Banded
        # levels are never materialized whole on any single device; their
        # self.mips/albedo_mips slots hold None and every render goes
        # through the banded burst.
        self._band_levels, self._band_alb_levels = self._plan_bands()
        if self.alb_min_level in self._band_alb_levels:
            # head slots alias the alb_min_level array; keep them banded
            # too or the alias upload would re-materialize the big array
            self._band_alb_levels.update(range(self.alb_min_level))
        self._banded_mips = {}
        self._banded_albedo = {}
        # Wall time spent moving the pyramids host->device. The banded
        # upload syncs in-flight bands as it goes, so the transfer cost
        # lands HERE (construction), not on the first program that reads
        # the arrays — consumers reporting an upload split (bench.py's
        # pyramid_upload_s) must add this to whatever residual sync they
        # measure after construction.
        t_upload = _time.time()
        self.mips = [None if k in self._band_levels
                     else _upload_rows_banded(m)
                     for k, m in enumerate(ps.mips)]
        uploaded = {}
        self.albedo_mips = []
        for k, a in enumerate(host_alb):
            if k in self._band_alb_levels:
                self.albedo_mips.append(None)
            elif id(a) in uploaded:  # aliased head slots upload once
                self.albedo_mips.append(uploaded[id(a)])
            else:
                uploaded[id(a)] = _upload_rows_banded(a)
                self.albedo_mips.append(uploaded[id(a)])
        self.maxmap = jnp.asarray(ps.maxmap)
        self.slope_maps = jnp.asarray(ps.slope_maps)
        self.upload_wall_s = _time.time() - t_upload
        if self.mesh is None:
            self._host_mips = [ps.mips[0]] + [None] * (len(ps.mips) - 1)
            self._host_albedo = None
        self.starmap = (jnp.asarray(pad_lon_wrap(starmap, PAD_COLS))
                        if starmap is not None else None)

        # scene state; internal render size padded to the block grid
        # (display crops back to the requested size). With a device mesh
        # the height additionally pads to equal row strips per device.
        self.out_width = config.width
        self.out_height = config.height
        w_mult = blocked.BLOCK_W * blocked.GROUP  # pallas groups 8 blocks
        self.width = -(-config.width // w_mult) * w_mult
        h_mult = blocked.BLOCK_H * max(n_req, 1)
        self.height = -(-config.height // h_mult) * h_mult
        self.dt_local: Optional[datetime] = config.dt_local
        self.brightness = config.brightness
        self.gamma = config.gamma
        self.view_orientation = config.view_orientation
        self.parallactic_mode = config.parallactic_mode
        self.shadow_accuracy = config.shadow_accuracy
        self.shadows_on = config.shadow_accuracy > 1
        self.camera: Camera = config.initial_camera or default_camera()
        self.displaced = True

        self.backend = config.backend
        if self.backend in ("auto", "mxu"):
            self.backend = "blocked"
        if self.backend == "pallas" and jax.default_backend() not in ("tpu",):
            # the fused kernel requires the Mosaic TPU compiler; CPU runs
            # fall back to the XLA blocked path (same math)
            self.backend = "blocked"
        if self.quantized and self.backend == "reference":
            # the gather reference path has no decode plumbing; quantized
            # (large-map) scenes always render through the windowed paths
            self.backend = "blocked"

        self.ephem: Optional[MoonEphemeris] = None
        self._fp: Optional[FrameParams] = None
        self._basis: Optional[CameraBasis] = None
        self._background = None
        self._shadow = None          # (shadow_map, params) or None
        self._bounce = None          # one-bounce irradiance map or None
        self._bounce_basis = None    # sun-frame basis the bounce was built in
        self._bounce_key = None      # (level, accuracy) of the cached bounce
        self._shadow_dirty = True
        self.indirect_light = bool(getattr(config, "indirect_light", True))
        # 1 (default) or 2 deterministic terrain bounces (reference
        # path_seg_range admits up to two, moon_renderer.py:445; the
        # second-order term measures ~5% of the indirect signal —
        # docs/GI.md second-bounce row)
        self.indirect_bounces = int(getattr(config, "indirect_bounces", 1))
        self._alb_lum = {}           # level -> albedo-luminance map (cached)
        # blocked-backend caches
        self._origins = None         # WindowOrigins (per pose+level+rotation)
        self._hbound = None          # per-block chord bound (pose-local)
        self._wincache = None        # WindowCache
        self._shadowwin = None       # ShadowWindows
        self._packed = None          # PackedWindows (pallas kernel layout)
        self._cache_level = None
        self._accum = None
        self._accum_n = 0
        self._hitbuf = None
        self._hitbuf_host = None     # once-per-frame host pick cache
        self._hitbuf_src = None
        self._elev_host = None       # host elevation cache for measurement
        self._elev_host_src = None
        self._prefetch = None        # speculative next-time-step results
        # one-deep flip cache: the previous time step's fully-rendered
        # state, restorable when a Q/W direction flip targets it (t-1 is
        # a state the device just computed — re-rendering it synchronously
        # was the round-3 flip penalty, bench time_step_mixed_mean_ms)
        self._flip_cache = None
        self._flip_ready = False     # consumable: next burst may no-op
        self.last_flip_hit = False   # observability (bench/tests)
        self._rng = np.random.default_rng(42)

    # ---- heightfield band sharding (HBM placement policy) ---------------

    def _hbm_budget_bytes(self) -> Optional[int]:
        """Per-chip HBM budget: the config knob, or the backend-reported
        memory limit (with headroom for framebuffers/windows/compile
        scratch), or None when neither is known (=> replicate)."""
        gb = float(getattr(self.config, "hbm_budget_gb", 0.0))
        if gb > 0:
            return int(gb * 2**30)
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit")
            if limit:
                return int(0.75 * limit)
        except Exception:
            pass
        return None

    def _plan_bands(self) -> tuple[set, set]:
        """(mip levels, albedo levels) to band-shard across the mesh.

        Bands engage only when a mesh exists and the device-ready pyramid
        bytes exceed the per-chip budget. Only levels above the shadow-scan
        working-set cap are candidates (the scan, the bounce alb_lum and
        the host measurement copy read the <= SHADOW_MAX_TEXELS levels and
        need them replicated), and a mip level k is banded only when the
        row counts of k, k+1 and its albedo levels all divide the mesh —
        the hf burst samples (level, level+1) pairs, so partial banding of
        a pair is unrenderable. Biggest-first until the projected
        per-device footprint fits the budget."""
        if self.mesh is None:
            return set(), set()
        from moonrtx_tpu.parallel import BAND_HALO, TILE_AXIS
        from moonrtx_tpu.utils.log import log_event

        n_dev = self.mesh.shape[TILE_AXIS]
        mips, albs = self._host_mips, self._host_albedo
        total = (sum(m.nbytes for m in mips)
                 + sum(a.nbytes for a in albs[self.alb_min_level:]))
        budget = self._hbm_budget_bytes()
        if budget is None or total <= budget:
            if budget is None and total > 8 * 2**30:
                log_event("hfshard_skipped", reason="unknown HBM budget",
                          pyramid_bytes=total)
            return set(), set()

        def divides(arr):
            return arr.shape[0] % n_dev == 0

        def big(arr):
            return (arr.shape[0] * (arr.shape[1] - PAD_COLS)
                    > SHADOW_MAX_TEXELS)

        def band_bytes(arr):
            band_h = arr.shape[0] // n_dev
            return arr.nbytes * (band_h + BAND_HALO) // arr.shape[0]

        def alb_index(k):
            return min(max(k + blocked.ALB_DOWN, self.alb_min_level),
                       len(albs) - 1)

        def level_set(r):
            """The exact (mip, mip+1, albedo, albedo+1) indices the hf
            burst samples for render level r — MUST mirror
            _pose_program_sharded/hf_sharded (nalevel is
            albedo_level(r)+1, not albedo_level(r+1))."""
            nr = min(r + 1, len(mips) - 1)
            ar = alb_index(r)
            nar = min(ar + 1, len(albs) - 1)
            return r, nr, ar, nar

        def hf_routed(r, band_mips, band_albs):
            rr, nr, ar, nar = level_set(r)
            return (rr in band_mips or nr in band_mips
                    or ar in band_albs or nar in band_albs)

        # Candidates are RENDER levels: banding level k bands mips[k] and
        # its albedo together, and requires (k, k+1, albedo(k),
        # albedo(k)+1) all divisible so the (level, level+1) sampling pair
        # the hf burst reads is always bandable.
        cand = []
        for k, m in enumerate(mips):
            _, nk, ak, nak = level_set(k)
            if not (big(m) and divides(m) and divides(mips[nk])
                    and divides(albs[ak]) and divides(albs[nak])):
                continue
            cand.append((k, ak if big(albs[ak]) else None,
                         m.nbytes + (albs[ak].nbytes if big(albs[ak])
                                     else 0)))
        cand.sort(key=lambda c: -c[2])

        def projected_bytes(band_mips, band_albs):
            """Worst-case per-device footprint of a placement: replicated
            levels in full, banded levels as band+halo — including every
            lazily-banded copy the hf burst can create at render time.
            The hf route engages for ANY render level whose (level,
            level+1, albedo, albedo+1) set touches a banded entry (a
            replicated level adjacent to a banded one, or sharing a
            banded albedo, still renders banded), and each such level
            lazily bands its whole set; those copies coexist with their
            replicated originals (round-3 review findings)."""
            lazy_m, lazy_a = set(), set()
            for r in range(len(mips)):
                if not hf_routed(r, band_mips, band_albs):
                    continue
                rr, nr, ar, nar = level_set(r)
                for k in (rr, nr):
                    if k not in band_mips:
                        lazy_m.add(k)
                for a in (ar, nar):
                    if a not in band_albs:
                        lazy_a.add(a)
            tot = 0
            for k, m in enumerate(mips):
                tot += band_bytes(m) if k in band_mips else m.nbytes
                if k in lazy_m:
                    tot += band_bytes(m)
            seen = set()
            for k, a in enumerate(albs):
                if k < self.alb_min_level or id(a) in seen:
                    continue
                seen.add(id(a))
                tot += band_bytes(a) if k in band_albs else a.nbytes
                if k in lazy_a:
                    tot += band_bytes(a)
            return tot

        def closure_bandable(band_mips, band_albs):
            """Every level the hf route would lazily band under this plan
            must divide the mesh, or rendering would raise at runtime."""
            for r in range(len(mips)):
                if not hf_routed(r, band_mips, band_albs):
                    continue
                rr, nr, ar, nar = level_set(r)
                if not (divides(mips[rr]) and divides(mips[nr])
                        and divides(albs[ar]) and divides(albs[nar])):
                    return False
            return True

        band_mips, band_albs = set(), set()
        projected = total
        for k, ak, _ in cand:
            if projected <= budget:
                break
            trial_m = band_mips | {k}
            trial_a = band_albs | ({ak} if ak is not None else set())
            if not closure_bandable(trial_m, trial_a):
                continue
            band_mips, band_albs = trial_m, trial_a
            projected = projected_bytes(band_mips, band_albs)
        if band_mips or band_albs:
            log_event("hfshard_engaged", devices=n_dev,
                      pyramid_bytes=total, budget_bytes=budget,
                      projected_bytes=projected,
                      banded_mip_levels=sorted(band_mips),
                      banded_albedo_levels=sorted(band_albs))
        if projected > budget:
            # NOT nested under the bands-chosen branch: a scene where no
            # level is bandable at all (replicated-only levels already
            # exceed the budget, or nothing divides the mesh) is over
            # budget with EMPTY band sets and must warn the same way
            # (round-5 review finding). User-visible, not just
            # log-mined: the status bar mirrors this
            # (session.status_panels "memory" panel, observability
            # parity with the reference's status surface
            # renderer_status.py:235-246), and startup says it loudly
            # once — rendering proceeds (the allocator may still cope),
            # but OOMs here are now diagnosed, not mysterious
            log_event("hfshard_over_budget",
                      projected_bytes=projected, budget_bytes=budget)
            self.hbm_over_budget = {"projected_bytes": projected,
                                    "budget_bytes": budget}
            import sys
            banded = "fully-banded" if (band_mips or band_albs) \
                else "(unbandable) replicated"
            print(f"WARNING: even the {banded} heightfield plan "
                  f"needs {projected / 2**30:.2f} GiB/chip against a "
                  f"{budget / 2**30:.2f} GiB HBM budget "
                  f"({n_dev} devices). Expect allocator pressure; "
                  "add devices, raise --hbm-budget-gb, or downscale.",
                  file=sys.stderr)
        return band_mips, band_albs

    def _banded_mip(self, k: int):
        """Per-device band stack of mip level k (built lazily, cached)."""
        if k not in self._banded_mips:
            from moonrtx_tpu.parallel import shard_bands
            self._banded_mips[k] = shard_bands(self.mesh,
                                               self._host_mips[k])
        return self._banded_mips[k]

    def _banded_alb(self, k: int):
        if k not in self._banded_albedo:
            from moonrtx_tpu.parallel import shard_bands
            self._banded_albedo[k] = shard_bands(self.mesh,
                                                 self._host_albedo[k])
        return self._banded_albedo[k]

    def hf_sharded(self) -> bool:
        """True when the current render level renders through the banded
        heightfield path."""
        if self.mesh is None:
            return False
        level = self.mip_level()
        nlevel = min(level + 1, len(self.mips) - 1)
        alevel = self.albedo_level(level)
        nalevel = min(alevel + 1, len(self.albedo_mips) - 1)
        return any(k in self._band_levels for k in (level, nlevel)) or any(
            k in self._band_alb_levels for k in (alevel, nalevel))

    # ---- state updates -------------------------------------------------

    def _flip_token(self):
        """Everything a flip-cache entry's validity depends on besides its
        datetime: any of these changing means the snapshot's frame/caches
        no longer describe the scene the user sees. The camera is carried
        by identity and pinned inside the entry (same aliasing discipline
        as the prefetch token pins)."""
        return (self.brightness, self.shadows_on, self.shadow_accuracy,
                self.indirect_light, self.view_orientation,
                id(self.camera), self.parallactic_mode, self.backend,
                self.displaced)

    def _snapshot_step(self) -> Optional[dict]:
        """Capture the CURRENT fully-rendered time step as a flip-cache
        entry (references only — all fields are immutable device arrays or
        host values, so a snapshot costs no copies; the HBM it retains is
        one accum + hit buffer + the sun-dependent packed windows)."""
        if (self.ephem is None or self._accum is None or self._accum_n < 1
                or not self.displaced
                # _shadow_dirty is only meaningful while shadows render;
                # with them off nothing ever clears it after a step
                or (self._shadow_dirty and self.shadows_on)):
            return None
        return dict(
            dt=self.dt_local, token=self._flip_token(), ephem=self.ephem,
            shadow_dirty=self._shadow_dirty,
            fp=self._fp, shadow=self._shadow, bounce=self._bounce,
            bounce_basis=self._bounce_basis, bounce_key=self._bounce_key,
            origins=self._origins, wincache=self._wincache,
            cache_level=self._cache_level,
            window_drift=getattr(self, "_window_drift", 0.0),
            hbound=self._hbound, packed=self._packed,
            shadowwin=self._shadowwin, accum=self._accum,
            hitbuf=self._hitbuf, accum_n=self._accum_n,
            pins=(self.camera,))

    def _restore_step(self, fc: dict) -> None:
        """Install a flip-cache entry as the current scene state — the
        exact inverse of _snapshot_step. The restored accumulation is
        already materialized on device, so the following
        render_accumulation_burst is a no-op (_flip_ready) and the step
        costs only the display readback."""
        self.dt_local = fc["dt"]
        self.ephem = fc["ephem"]
        self._fp = fc["fp"]
        self._shadow = fc["shadow"]
        self._shadow_dirty = fc["shadow_dirty"]
        self._bounce = fc["bounce"]
        self._bounce_basis = fc["bounce_basis"]
        self._bounce_key = fc["bounce_key"]
        self._origins = fc["origins"]
        self._wincache = fc["wincache"]
        self._cache_level = fc["cache_level"]
        self._window_drift = fc["window_drift"]
        self._hbound = fc["hbound"]
        self._packed = fc["packed"]
        self._shadowwin = fc["shadowwin"]
        self._accum = fc["accum"]
        self._hitbuf = fc["hitbuf"]
        self._accum_n = fc["accum_n"]
        self._flip_ready = True
        if self._prefetch is not None \
                and self._prefetch["dt"] != self.dt_local:
            self._prefetch = None  # speculation missed: free its buffers

    def update_view(self, dt_local: Optional[datetime] = None) -> MoonEphemeris:
        """Recompute ephemeris-driven state (reference moon_renderer.py:638-664)."""
        self.last_flip_hit = False
        if (dt_local is not None and self.dt_local is not None
                and dt_local != self.dt_local):
            # Direction flips target a datetime the device may have JUST
            # rendered (t-1). Snapshot the outgoing step and, when the
            # cache holds the target, swap: the flip costs zero device
            # work and W<->Q toggling ping-pongs between two resident
            # steps (round-3 verdict item 2).
            snap = self._snapshot_step()
            fc = self._flip_cache
            if fc is not None and fc["token"] != self._flip_token():
                fc = self._flip_cache = None  # stale entry: free its HBM
            if fc is not None and fc["dt"] == dt_local:
                self._flip_cache = snap
                self._restore_step(fc)
                self.last_flip_hit = True
                return self.ephem
            if snap is not None:
                self._flip_cache = snap
        if dt_local is not None:
            self.dt_local = dt_local
        prev_rotation = (None if self.ephem is None
                         else np.asarray(self.ephem.rotation_matrix))
        self.ephem = calculate_ephemeris(
            self.dt_local, self.config.observer, self.parallactic_mode)
        e = self.ephem
        self._fp = self._frame_params(e)
        self._shadow_dirty = True
        if (self._prefetch is not None
                and self._prefetch["dt"] != self.dt_local):
            self._prefetch = None  # speculation missed: free its buffers
        # Body-frame footprints move with the rotation; sampling windows
        # carry a margin of several texels, so small drifts (successive
        # time steps rotate the Moon ~0.14 deg / 15 min) reuse the cached
        # windows and only the shadow map/windows rebuild.
        if prev_rotation is None or self._origins is None:
            self._origins = None
        else:
            cosang = (np.trace(np.asarray(e.rotation_matrix)
                               @ prev_rotation.T) - 1.0) / 2.0
            drift_deg = np.degrees(np.arccos(np.clip(cosang, -1.0, 1.0)))
            self._window_drift = getattr(self, "_window_drift", 0.0) + drift_deg
            h_lvl = self.mip_shapes[self._cache_level or 0][0]
            if self._window_drift > 4.0 * (180.0 / h_lvl):
                self._origins = None
        if self._origins is None:
            self._window_drift = 0.0
            self._hbound = None  # chord bound drifts with the rotation too
        self._shadowwin = None  # sun-frame coordinates always move
        self.reset_accumulation()
        return e

    def _frame_params(self, e: MoonEphemeris) -> FrameParams:
        """Device-side per-frame light/photometric parameters for an
        ephemeris (reference moon_renderer.py:505-624 outputs)."""
        light_pos = light_mod.calculate_light_pos(e)
        disk_c, disk_r = light_mod.calculate_sun_disk(e)
        return FrameParams(
            rotation=jnp.asarray(e.rotation_matrix, jnp.float32),
            light_pos=jnp.asarray(light_pos, jnp.float32),
            sun_disk_center=jnp.asarray(disk_c, jnp.float32),
            sun_disk_radius=jnp.float32(disk_r),
            irradiance=jnp.float32(
                light_mod.sun_irradiance_factor(self.brightness, e)),
            sun_ang_radius=jnp.float32(
                math.asin(C.SUN_RADIUS_KM / e.sun_distance)),
            lunar_blend=(
                jnp.float32(light_mod.lunar_lambert_blend(e.phase_angle))
                if self.config.photometric == "lunar" else None),
            earth=(jnp.asarray(_earth_params(
                       e, self.config.eclipse_shading,
                       self.config.earthshine), jnp.float32)
                   if (self.config.eclipse_shading
                       or self.config.earthshine) else None),
        )

    def set_brightness(self, brightness: int) -> None:
        self.brightness = int(np.clip(brightness, *C.BRIGHTNESS_RANGE))
        if self.ephem is not None:
            self._fp = self._fp._replace(irradiance=jnp.float32(
                light_mod.sun_irradiance_factor(self.brightness, self.ephem)))
        self.reset_accumulation()

    def set_camera(self, camera: Camera) -> None:
        """Install a new camera pose. Small moves (per-pixel orbit/roll
        drag steps) REUSE the cached sampling windows: body-frame ray
        footprints shift by at most the probe-measured drift angle, and
        the windows carry the same several-texel margin that absorbs
        small time-step rotations (update_view's drift policy) — so a
        drag step renders with ONE burst program instead of the full
        window re-extraction + repack pose program."""
        drift = self._camera_drift_deg(self.camera, camera)
        self.camera = camera
        self._basis = None
        self._background = None
        self.reset_accumulation()
        if drift is not None and self._origins is not None:
            self._window_drift = getattr(self, "_window_drift", 0.0) + drift
            h_lvl = self.mip_shapes[self._cache_level or 0][0]
            if self._window_drift <= 4.0 * (180.0 / h_lvl):
                return
        self._origins = None
        self._hbound = None

    def _camera_drift_deg(self, old: Optional[Camera],
                          new: Camera) -> Optional[float]:
        """Worst-case body-frame footprint drift (degrees) of a camera
        change, from a 3x3 probe-ray grid hitting the bounding sphere;
        None when unmeasurable (no old camera, fov change — a zoom also
        rescales per-block footprint SPANS, which window sizes cannot
        absorb)."""
        if old is new:
            return 0.0
        if old is None:
            return None
        # tolerance, not exact equality: an fov that round-trips through
        # float32 (codec, presets) must not silently kill the drag fast
        # path; a real zoom changes fov by far more than 1e-6 relative
        if abs(old.fov - new.fov) > 1e-5 * max(abs(new.fov), 1.0):
            return None
        r_old = float(np.linalg.norm(np.asarray(old.eye, np.float64)))
        r_new = float(np.linalg.norm(np.asarray(new.eye, np.float64)))
        if abs(r_old - r_new) > 1e-9 * max(r_old, 1.0):
            return None  # dolly rescales footprint spans, like a zoom
        d0 = camera_mod.probe_hit_dirs(old, self.view_orientation,
                                       self.height, self.width,
                                       C.MOON_RADIUS)
        d1 = camera_mod.probe_hit_dirs(new, self.view_orientation,
                                       self.height, self.width,
                                       C.MOON_RADIUS)
        cos = np.clip(np.sum(d0 * d1, axis=-1), -1.0, 1.0)
        return float(np.degrees(np.arccos(cos).max()))

    def set_view_orientation(self, orientation: str) -> None:
        self.view_orientation = orientation
        self._basis = None
        self._background = None
        self._origins = None
        self._hbound = None
        self.reset_accumulation()

    def set_shadows(self, on: bool) -> None:
        """Toggle cast shadows (the engine half of the X key, reference
        moon_renderer.py:320-334). Shadow state is always stale across a
        toggle — the map/windows/packed state rebuild lazily next frame.
        This owns the cache-invalidation invariants; UI layers must not
        touch _shadow_dirty/_shadowwin directly."""
        self.shadows_on = bool(on)
        self._shadow_dirty = True
        self._shadowwin = None
        self.reset_accumulation()

    def reset_accumulation(self) -> None:
        self._accum_n = 0

    # ---- derived device state -------------------------------------------

    def basis(self) -> CameraBasis:
        if self._basis is None:
            self._basis = camera_basis(self.camera, self.view_orientation)
        return self._basis

    def render_basis(self) -> CameraBasis:
        """Camera basis compensated for the block-grid frame padding.

        The internal render frame pads (width, height) up to the block
        grid (and to equal row strips per device), but the image the user
        asked for is the top-left (out_height, out_width) crop. Ray
        generation maps pixels to NDC against the frame it is given, so
        feeding it the padded sizes with the raw basis would center the
        Moon in the PADDED frame — off-center and right-edge-clipped in
        the crop whenever width isn't a multiple of 128 (the round-2 bug:
        at 480x360 the disk sat 16 px right of center).

        Instead of threading out-sizes through every kernel signature,
        exploit that both mappings are affine in the pixel index: with
        u_p, v_p the padded-frame NDC (camera.py:109-110) and u_o, v_o
        the requested-frame NDC,
            u_o = (pH/oH) u_p + (pW - oW)/oH
            v_o = (pH/oH) v_p - (pH - oH)/oH
        so a basis with
            forward' = forward + thf ((pW-oW)/oH right - (pH-oH)/oH up)
            thf'     = thf pH/oH
        makes padded-frame ray gen emit exactly the requested-frame rays
        (directions are normalized after the linear combination, so the
        non-unit forward' is benign). Host-side math (picking, overlay
        projection, probe rays) keeps the raw basis() with out-sizes —
        the two are now the same mapping on the visible pixels."""
        b = self.basis()
        pw, ph = self.width, self.height
        ow, oh = self.out_width, self.out_height
        if pw == ow and ph == oh:
            return b
        du = (pw - ow) / oh
        dv = (ph - oh) / oh
        fwd = (b.forward + b.tan_half_fov
               * (du * b.right - dv * b.up))
        return CameraBasis(eye=b.eye, forward=fwd, right=b.right, up=b.up,
                           tan_half_fov=b.tan_half_fov * (ph / oh))

    @staticmethod
    def _interp() -> bool:
        """Pallas interpret mode: Mosaic compiles only on real TPU
        backends; anywhere else (CPU tests of the pallas scene path) the
        kernels run interpreted with identical semantics."""
        return jax.default_backend() not in ("tpu", "axon")

    def mip_level(self) -> int:
        """Footprint-matched mip level for the current view."""
        eye = np.asarray(self.camera.eye)
        dist = max(float(np.linalg.norm(eye)) - C.MOON_RADIUS, 1.0)
        px_ang = math.radians(self.camera.fov) / self.out_height
        ground_per_px = dist * px_ang
        h0, w0 = self.mip_shapes[0]
        texel_ground = 2 * math.pi * C.MOON_RADIUS / w0
        return select_level(self.mip_shapes, ground_per_px / texel_ground)

    def albedo_level(self, level: int) -> int:
        """Albedo mip for a height render level; floored at alb_min_level
        (the albedo pyramid may start coarser than the heightfield)."""
        return min(max(level + blocked.ALB_DOWN, self.alb_min_level),
                   len(self.albedo_mips) - 1)

    def _capped_level(self, lvl: int) -> int:
        """Walk down the pyramid until a level fits the SHADOW_MAX_TEXELS
        working-set cap — the single policy shared by the shadow scan and
        the host elevation copy (they must read the same grid or
        measurement drags would disagree with what shadows sampled)."""
        while (lvl + 1 < len(self.mips)
               and self.mip_shapes[lvl][0] * self.mip_shapes[lvl][1]
               > SHADOW_MAX_TEXELS):
            lvl += 1
        return lvl

    def shadow_level(self) -> int:
        """Mip level the shadow scan (and bounce alb_lum) builds from: the
        render level, floored so the source map stays scan-grid-sized
        (SHADOW_MAX_TEXELS) — the scan resamples onto <= 2304x4096 cells,
        so feeding it a multi-gigatexel level 0 wastes bandwidth and HBM."""
        lvl = self._capped_level(max(self.mip_level(), 0))
        if self.indirect_light:
            # the bounce scan samples alb_lum on the same grid as tex
            lvl = max(lvl, self.alb_min_level)
        return lvl

    def background(self):
        if self.starmap is None:
            return None
        if self._background is None:
            b = self.render_basis()
            self._background = _render_background(
                self.starmap, b.forward, b.right, b.up, b.tan_half_fov,
                jnp.zeros((self.height, self.width), jnp.uint8))
        return self._background

    def alb_lum(self, level: int):
        """Albedo-luminance map for a mip level (bounce emitter strength),
        computed lazily on device and cached. Decodes quantized (uint8)
        albedo to f32 0..1."""
        level = max(level, self.alb_min_level)
        if level not in self._alb_lum:
            m = jnp.mean(self.albedo_mips[level].astype(jnp.float32), axis=2)
            if self.a_scale != 1.0:
                m = m * jnp.float32(self.a_scale)
            self._alb_lum[level] = m
        return self._alb_lum[level]

    def _sun_state(self) -> tuple[np.ndarray, float]:
        """(unit sun direction in the body frame, solar angular radius),
        computed on host — reading _fp fields back from the device would
        stall the async dispatch pipeline mid-step."""
        return self._sun_state_of(self.ephem)

    @staticmethod
    def _sun_state_of(e: MoonEphemeris) -> tuple[np.ndarray, float]:
        sun_body = np.asarray(e.rotation_matrix).T @ np.asarray(
            light_mod.calculate_light_pos(e))
        ang = math.asin(C.SUN_RADIUS_KM / e.sun_distance)
        return sun_body / np.linalg.norm(sun_body), ang

    def _dispatch_shadow_maps_mesh(self, sun_unit, ang, acc):
        """Dispatch the phi-wedge-sharded scan (parallel/tiles.py) for an
        arbitrary sun state with NO scene mutation (speculative prefetch
        shares it with shadow_args). The one-bounce irradiance map drift-
        reuses exactly like the single-device path: inside
        BOUNCE_REUSE_DEG of its build frame the scan runs factor-only and
        the cached map is reused. Returns None when ineligible (no mesh,
        or a phi grid that does not divide it)."""
        if self.mesh is None:
            return None
        from moonrtx_tpu.ops import shadow_scan
        from moonrtx_tpu.parallel import TILE_AXIS, build_shadow_map_sharded

        ncs, nf, nph = shadow_scan._resolution(acc)
        if nph % self.mesh.shape[TILE_AXIS]:
            from moonrtx_tpu.utils.log import log_event
            log_event("mesh_shadow_scan_fallback_single_device",
                      n_phi=nph, devices=self.mesh.shape[TILE_AXIS],
                      reason="phi grid does not divide the mesh")
            return None
        slevel = self.shadow_level()
        tex = self.mips[slevel]
        h, w = self.mip_shapes[slevel]
        basis_np = _sun_frame_basis_np(np.asarray(sun_unit))
        reuse = (
            self.indirect_light
            and self._bounce is not None
            and self._bounce_basis is not None
            and self._bounce_key == (slevel, acc)
            and _rotation_angle_deg(basis_np, self._bounce_basis)
            <= BOUNCE_REUSE_DEG)
        smap, bmap = build_shadow_map_sharded(
            self.mesh, tex, jnp.asarray(basis_np, jnp.float32),
            jnp.float32(ang), h, w, ncs, nf, nph,
            alb_lum=(self.alb_lum(slevel)
                     if self.indirect_light and not reuse else None),
            h_scale=self.h_scale, h_offset=self.h_offset,
            n_bounces=self.indirect_bounces)
        params = shadow_scan.ShadowMapParams(
            axis_x=jnp.asarray(basis_np[0], jnp.float32),
            axis_y=jnp.asarray(basis_np[1], jnp.float32),
            axis_z=jnp.asarray(basis_np[2], jnp.float32),
            n_coarse=jnp.float32(ncs), n_fine=jnp.float32(nf),
            n_phi=jnp.float32(nph), sun_ang_radius=jnp.float32(ang))
        if reuse:
            return dict(shadow=(smap, params), bounce_render=self._bounce,
                        bounce=None, bounce_basis=None, bounce_key=None)
        return dict(shadow=(smap, params), bounce_render=bmap, bounce=bmap,
                    bounce_basis=basis_np, bounce_key=(slevel, acc))

    def _shadow_args_mesh(self, sun_unit, ang, acc):
        """Mesh-mode shadow rebuild: dispatch + install. Returns True when
        handled, None to fall through to the single-device programs."""
        r = self._dispatch_shadow_maps_mesh(sun_unit, ang, acc)
        if r is None:
            return None
        self._shadow = r["shadow"]
        if r["bounce"] is not None:
            self._bounce = r["bounce"]
            self._bounce_basis = r["bounce_basis"]
            self._bounce_key = r["bounce_key"]
        return True

    def shadow_args(self):
        """Current (shadow_map, params), rebuilt lazily on time change
        (with the one-bounce irradiance map into self._bounce)."""
        if not self.shadows_on or not self.displaced:
            return None
        if self._shadow is None or self._shadow_dirty:
            sun_unit, ang = self._sun_state()
            acc = self.shadow_accuracy if self.shadows_on else 1
            mesh_scan = self._shadow_args_mesh(sun_unit, ang, acc)
            if mesh_scan is not None:
                self._shadow_dirty = False
                return self._shadow
            sm = self._dispatch_shadow_maps(sun_unit, ang)
            self._shadow = sm["shadow"]
            if self.indirect_light:
                if sm["bounce"] is not None:
                    self._bounce = sm["bounce"]
                    self._bounce_basis = sm["bounce_basis"]
                    self._bounce_key = sm["bounce_key"]
            else:
                self._bounce = None
                self._bounce_basis = None
                self._bounce_key = None
            self._shadow_dirty = False
        return self._shadow

    # ---- rendering -------------------------------------------------------

    def _ensure_blocked_caches(self, level: int, geom):
        """(Re)build window caches for the blocked backend when invalid."""
        h, w = self.mip_shapes[level]
        alevel = self.albedo_level(level)
        ah, aw = self.mip_shapes[alevel]
        if self._origins is None or self._cache_level != level:
            # fresh windows: restart the drift budget, like the pallas
            # burst rebuild does — otherwise one over-budget camera move
            # leaves the accumulated drift poisoned and every later
            # small drag re-extracts the cache
            self._window_drift = 0.0
            # stride levels available above the render level (q up to 4)
            max_qexp = min(2, len(self.mips) - 1 - level,
                           len(self.albedo_mips) - 1 - alevel)
            self._origins = blocked.window_origins(
                geom, h, w, self.mips[level].shape[1], ah, aw,
                self.albedo_mips[alevel].shape[1], max_qexp=max_qexp,
                slope_maps=self.slope_maps[level:level + max_qexp + 1])
            self._wincache = blocked.extract_window_cache(
                tuple(self.mips[level:level + max_qexp + 1]),
                tuple(self.albedo_mips[alevel:alevel + max_qexp + 1]),
                self._origins, h_scale=self.h_scale, h_offset=self.h_offset,
                a_scale=self.a_scale)
            self._cache_level = level
            self._shadowwin = None
            self._packed = None
        if geom.h_bound is not None:
            # pose-local chord bound: reused by every burst/time step until
            # the window-drift policy invalidates the origins (blocked.
            # RayGeom.h_bound)
            self._hbound = geom.h_bound
        if (self._shadowwin is blocked.FUSED_SHADOW_STATE
                and self.backend != "pallas"):
            self._shadowwin = None  # sentinel is meaningless off-pallas
        if self.shadows_on and self._shadowwin is None:
            if self.backend == "pallas":
                # maps depend only on the sun -> cached across pose changes
                # (shadow_args rebuilds them on time change only); the
                # geometry half (windows + sun-part repack) is one program
                smap, sparams = self.shadow_args()
                sw, swin_p, scal = blocked.build_shadow_state_from_maps(
                    smap, sparams, geom, self._wincache, self._origins,
                    bmap=self._bounce)
                self._shadowwin = sw
                if self._packed is None:
                    # pose changed too: repack the heavy pose tensors
                    hwin_p, awin_p = blocked.pack_pose_windows(self._wincache)
                else:
                    hwin_p, awin_p = self._packed.hwin, self._packed.awin
                self._packed = blocked.PackedWindows(
                    hwin=hwin_p, awin=awin_p, swin=swin_p, scal=scal)
            else:
                smap, sparams = self.shadow_args()
                self._shadowwin = blocked.build_shadow_windows(
                    smap, sparams, geom, bounce_map=self._bounce)
                self._packed = None
        if self.backend == "pallas" and self._packed is None:
            assert self._shadowwin is not blocked.FUSED_SHADOW_STATE, (
                "fused shadow state requires the packed windows it lives in")
            self._packed = blocked.pack_windows(
                self._wincache, self._origins,
                self._shadowwin if self.shadows_on else None)
        return alevel

    def _dispatch_timestep_scan(self, fp, sun_unit, ang, jitters,
                                n_samples: int, h: int, w: int,
                                ah: int, aw: int):
        """Dispatch the one-program drift-reuse time step for an arbitrary
        frame-params/sun state, with NO scene mutation: eligibility is
        indirect light on, cached bounce map within BOUNCE_ASYNC_MAX_DEG
        of the given sun frame. Past BOUNCE_REUSE_DEG a bounce_refresh is
        dispatched BEHIND the frame (reusing its scan). Returns None when
        ineligible, else a dict of result futures + the cache metadata the
        caller installs via _install_timestep."""
        from moonrtx_tpu.ops import shadow_scan

        if not (self.shadows_on and self.displaced
                and self.indirect_light and self._bounce is not None
                and self._bounce_basis is not None):
            return None
        slevel = self.shadow_level()
        acc = self.shadow_accuracy
        if self._bounce_key != (slevel, acc):
            return None
        basis_np = _sun_frame_basis_np(sun_unit)
        drift = _rotation_angle_deg(basis_np, self._bounce_basis)
        if drift > BOUNCE_ASYNC_MAX_DEG:
            return None
        ncs, nf, nph = shadow_scan._resolution(acc)
        if drift > BOUNCE_REUSE_DEG \
                and not shadow_scan.half_grid_ok(ncs, nf, nph):
            return None  # refresh program needs the half-res alb grid
        sh_, sw_ = self.mip_shapes[slevel]
        sun_basis = jnp.asarray(basis_np, jnp.float32)
        (accum, hitbuf, swin_p, scal, smap,
         hs) = blocked.render_timestep_scan_pallas(
            self.mips[slevel], self._bounce,
            sun_basis, jnp.float32(ang),
            self._wincache, self._origins, self._packed.hwin,
            self._packed.awin, self.background(), self.maxmap,
            self.render_basis(), fp, jitters, self.height, self.width,
            h, w, self.h_min, ah, aw, sh_, sw_, ncs, nf, nph,
            n_samples=n_samples, h_scale=self.h_scale,
            h_offset=self.h_offset, hbound=self._hbound,
            interpret=self._interp())
        params = shadow_scan.ShadowMapParams(
            axis_x=sun_basis[0], axis_y=sun_basis[1], axis_z=sun_basis[2],
            n_coarse=jnp.float32(ncs), n_fine=jnp.float32(nf),
            n_phi=jnp.float32(nph), sun_ang_radius=jnp.float32(ang))
        bounce = bounce_basis = None
        if drift > BOUNCE_REUSE_DEG:
            # refresh the bounce map asynchronously behind the frame: the
            # device renders the frame first (program order), the rebuild
            # fills the gap before the next step, and the Python-side
            # cache swaps to the new (not-yet-materialized) array on
            # install so the next merged step consumes it directly
            bounce = shadow_scan.bounce_refresh(
                smap, hs, self.alb_lum(slevel), sun_basis,
                sh_, sw_, ncs, nf, nph, n_bounces=self.indirect_bounces)
            bounce_basis = basis_np
        return dict(kind="timestep", accum=accum, hitbuf=hitbuf,
                    swin=swin_p, scal=scal,
                    shadow=(smap, params), bounce=bounce,
                    bounce_basis=bounce_basis, bounce_key=(slevel, acc))

    def _install_timestep(self, r: dict) -> None:
        """Install a _dispatch_timestep_scan result as the scene's shadow/
        bounce cache state (the mutation half, split out so a speculative
        prefetch can defer it to consume time)."""
        self._shadow = r["shadow"]
        self._shadow_dirty = False
        if r["bounce"] is not None:
            self._bounce = r["bounce"]
            self._bounce_basis = r["bounce_basis"]
            self._bounce_key = r["bounce_key"]

    def _dispatch_shadow_maps(self, sun_unit: np.ndarray, ang: float) -> dict:
        """Dispatch the shadow (and, as needed, bounce) map programs for
        an arbitrary sun state WITHOUT mutating scene state — the shared
        scan half of shadow_args and the speculative pose step.

        Returns shadow=(smap, params); bounce_render (the map the frame
        should shade with: cached when reused, fresh otherwise, None with
        indirect light off); and bounce/bounce_basis/bounce_key set only
        when a fresh pyramid was built (the caller installs them)."""
        from moonrtx_tpu.ops import shadow_scan

        slevel = self.shadow_level()
        stex = self.mips[slevel]
        sh_, sw_ = self.mip_shapes[slevel]
        acc = self.shadow_accuracy if self.shadows_on else 1
        sun = jnp.asarray(sun_unit, jnp.float32)
        bounce_render = bounce = bounce_basis = bounce_key = None
        if self.indirect_light:
            # The bounce (indirect-light) field is blurred over >= 2 scan
            # cells, so sun drifts inside that scale cannot change it
            # perceptibly: reuse the cached map across small time steps
            # and rebuild once the accumulated sun-frame rotation since
            # its build exceeds the threshold. The shadow factor map
            # always rebuilds — the terminator's motion IS the feature
            # (reference moon_renderer.py:62-76).
            basis_np = _sun_frame_basis_np(sun_unit)
            reuse = (
                self._bounce is not None
                and self._bounce_basis is not None
                and self._bounce_key == (slevel, acc)
                and _rotation_angle_deg(basis_np, self._bounce_basis)
                <= BOUNCE_REUSE_DEG)
            if reuse:
                shadow = shadow_scan.build_shadow_map(
                    stex, sh_, sw_, sun, ang, accuracy=acc,
                    h_scale=self.h_scale, h_offset=self.h_offset)
                bounce_render = self._bounce
            else:
                smap, params, bmap = shadow_scan.build_shadow_and_bounce(
                    stex, self.alb_lum(slevel), sh_, sw_, sun, ang,
                    accuracy=acc,
                    h_scale=self.h_scale, h_offset=self.h_offset,
                    n_bounces=self.indirect_bounces)
                shadow = (smap, params)
                bounce_render = bounce = bmap
                bounce_basis = basis_np
                bounce_key = (slevel, acc)
        else:
            shadow = shadow_scan.build_shadow_map(
                stex, sh_, sw_, sun, ang, accuracy=acc,
                h_scale=self.h_scale, h_offset=self.h_offset)
        return dict(shadow=shadow, bounce_render=bounce_render,
                    bounce=bounce, bounce_basis=bounce_basis,
                    bounce_key=bounce_key)

    def _dispatch_pose_scan(self, fp, sun_unit, ang, jitters,
                            n_samples: int, level: int):
        """Dispatch the full pose-rebuild step (shadow scan + window
        origins/extraction/repack + burst) for an arbitrary frame state,
        with NO scene mutation. This is the speculation used when the
        predicted window drift says the pose caches will NOT survive the
        next time step (the common case at full-LDEM working levels,
        where one 15-min step moves footprints ~9 texels)."""
        from moonrtx_tpu.ops import shadow_scan

        h, w = self.mip_shapes[level]
        alevel = self.albedo_level(level)
        ah, aw = self.mip_shapes[alevel]
        if self.shadows_on:
            sm = self._dispatch_shadow_maps(sun_unit, ang)
            smap, sparams = sm["shadow"]
            bounce_render = sm["bounce_render"]
            bounce, bounce_basis, bounce_key = (
                sm["bounce"], sm["bounce_basis"], sm["bounce_key"])
        else:
            smap = sparams = None
            bounce_render = bounce = bounce_basis = bounce_key = None
        max_qexp = min(2, len(self.mips) - 1 - level,
                       len(self.albedo_mips) - 1 - alevel)
        (accum, hitbuf, org, cache, hwin_p, awin_p, swin_p,
         scal, hbound) = blocked.render_pose_pallas(
            tuple(self.mips[level:level + max_qexp + 1]),
            tuple(self.albedo_mips[alevel:alevel + max_qexp + 1]),
            self.slope_maps[level:level + max_qexp + 1],
            smap, sparams, bounce_render, self.background(),
            self.maxmap, self.render_basis(), fp, jitters,
            self.height, self.width, h, w, ah, aw, self.h_min,
            max_qexp=max_qexp, n_samples=n_samples,
            use_shadow=self.shadows_on,
            h_scale=self.h_scale, h_offset=self.h_offset,
            a_scale=self.a_scale, interpret=self._interp())
        return dict(kind="pose", accum=accum, hitbuf=hitbuf,
                    origins=org, wincache=cache, cache_level=level,
                    hbound=hbound,
                    packed=blocked.PackedWindows(hwin=hwin_p, awin=awin_p,
                                                 swin=swin_p, scal=scal),
                    shadow=(smap, sparams) if self.shadows_on else None,
                    bounce=bounce, bounce_basis=bounce_basis,
                    bounce_key=bounce_key)

    def _install_pose_step(self, r: dict) -> None:
        """Install a _dispatch_pose_scan result (mirrors the mutations of
        the non-speculative pose branch in render_accumulation_burst +
        shadow_args)."""
        if r["shadow"] is not None:
            self._shadow = r["shadow"]
        self._shadow_dirty = False
        if r["bounce"] is not None:
            self._bounce = r["bounce"]
            self._bounce_basis = r["bounce_basis"]
            self._bounce_key = r["bounce_key"]
        self._origins = r["origins"]
        self._wincache = r["wincache"]
        self._cache_level = r["cache_level"]
        self._window_drift = 0.0
        self._hbound = r["hbound"]
        self._packed = r["packed"]
        self._shadowwin = (blocked.FUSED_SHADOW_STATE
                           if self.shadows_on else None)

    def _merged_timestep(self, jitters, n_samples: int, h: int, w: int,
                         ah: int, aw: int):
        """Run the one-program drift-reuse time step if eligible (shadows
        dirty + _dispatch_timestep_scan conditions) so held-key animation
        never waits on the bounce pyramid. Returns (accum, hitbuf, swin_p,
        scal) or None (caller falls back to the synchronous split-program
        path)."""
        if not self._shadow_dirty:
            return None
        sun_unit, ang = self._sun_state()
        r = self._dispatch_timestep_scan(self._fp, sun_unit, ang, jitters,
                                         n_samples, h, w, ah, aw)
        if r is None:
            return None
        self._install_timestep(r)
        return r["accum"], r["hitbuf"], r["swin"], r["scal"]

    # ---- speculative held-key prefetch ------------------------------------

    def _prefetch_token(self, kind: str):
        """Everything a prefetched time step's validity depends on besides
        the datetime. A "timestep" speculation additionally depends on the
        pose/window cache identities it renders through; a "pose"
        speculation rebuilds those from scratch, so it survives
        update_view invalidating them (that is its purpose) and depends
        only on the camera/settings baked into its programs."""
        base = (self.brightness, self.shadows_on, self.shadow_accuracy,
                self.indirect_light, self.view_orientation,
                id(self.camera), self.parallactic_mode, self.backend,
                id(self._bounce))
        if kind in ("pose", "mesh_pose"):
            return base
        packed = self._packed
        return base + (id(self._origins), id(self._wincache),
                       None if packed is None else id(packed.hwin),
                       self._cache_level)

    def prefetch_time(self, dt_next: datetime) -> bool:
        """Speculatively dispatch the NEXT time step's fused scan+render
        program behind the current frame (JAX async dispatch): when the
        held key delivers update_view(dt_next), the frame is already
        computed on device and the step costs only the readback. The
        reference's design point is that held-key steps must be cheap
        (moon_renderer.py:648-663); here the device computes step t+1
        while the host displays step t. Returns True when a speculation
        was dispatched. Mis-speculation is safe: results install only if
        the next update_view matches the datetime and _prefetch_token."""
        self._prefetch = None
        if self.ephem is None or not self.displaced:
            return False
        if self.mesh is None and self.backend != "pallas":
            return False
        level = self.mip_level()
        e = calculate_ephemeris(dt_next, self.config.observer,
                                self.parallactic_mode)
        h, w = self.mip_shapes[level]
        alevel = self.albedo_level(level)
        ah, aw = self.mip_shapes[alevel]
        fp = self._frame_params(e)
        sun_unit, ang = self._sun_state_of(e)
        # n_samples=1 (what the app renders first after a step); its jitter
        # is deterministically zero, so a consumed prefetch is bit-exact
        # with the non-speculative burst and consumes no RNG state
        jit1 = self._padded_jitters(1)
        if self.mesh is not None:
            r = self._dispatch_mesh_step(fp, sun_unit, ang, jit1, 1, level)
            if r is None:
                return False
            r["dt"] = dt_next
            r["token"] = self._prefetch_token(r["kind"])
            r["pins"] = (self.camera, self._bounce, self._origins,
                         self._wincache, self._packed)
            self._prefetch = r
            return True
        r = None
        if (self._origins is not None and self._packed is not None
                and self._wincache is not None
                and self._cache_level == level):
            # would update_view(dt_next) keep the pose windows? (window
            # drift policy in update_view — predict it; a mispredict is
            # only wasted work, never wrong output)
            prev = np.asarray(self.ephem.rotation_matrix)
            cosang = (np.trace(np.asarray(e.rotation_matrix) @ prev.T)
                      - 1.0) / 2.0
            drift_deg = float(np.degrees(
                np.arccos(np.clip(cosang, -1.0, 1.0))))
            if (getattr(self, "_window_drift", 0.0) + drift_deg
                    <= 4.0 * (180.0 / h)):
                r = self._dispatch_timestep_scan(fp, sun_unit, ang, jit1,
                                                 1, h, w, ah, aw)
        if r is None:
            # windows will not survive the step (or no merged-step
            # eligibility): speculate the FULL pose rebuild — scan +
            # origins + extraction + repack + burst — behind the frame
            r = self._dispatch_pose_scan(fp, sun_unit, ang, jit1, 1, level)
        if r is None:
            return False
        r["dt"] = dt_next
        r["token"] = self._prefetch_token(r["kind"])
        # pin the objects whose id()s the token carries: CPython reuses
        # freed addresses eagerly, so without a live reference a cache
        # replaced between dispatch and consume could alias a stale token
        # and install a speculation computed from the old caches
        r["pins"] = (self.camera, self._bounce, self._origins,
                     self._wincache, self._packed)
        self._prefetch = r
        return True

    def _consume_prefetch(self, n_samples: int):
        """Install the speculative step's results if they match the
        scene's current datetime + state token and return (accum, hitbuf);
        None otherwise."""
        pf, self._prefetch = self._prefetch, None
        if (pf is None or n_samples != 1 or not self._shadow_dirty
                or pf["dt"] != self.dt_local
                or pf["token"] != self._prefetch_token(pf["kind"])):
            return None
        if pf["kind"] in ("pose", "mesh_pose"):
            self._install_pose_step(pf)
        elif pf["kind"] == "mesh_timestep":
            if pf["shadow"] is not None:
                self._shadow = pf["shadow"]
            self._shadow_dirty = False
            if pf["bounce"] is not None:
                self._bounce = pf["bounce"]
                self._bounce_basis = pf["bounce_basis"]
                self._bounce_key = pf["bounce_key"]
            self._packed = self._packed._replace(swin=pf["swin"],
                                                 scal=pf["scal"])
            self._shadowwin = blocked.FUSED_SHADOW_STATE
        else:
            self._install_timestep(pf)
            self._packed = self._packed._replace(swin=pf["swin"],
                                                 scal=pf["scal"])
            self._shadowwin = blocked.FUSED_SHADOW_STATE
        return pf["accum"], pf["hitbuf"]

    def render_accumulation_frame(self):
        """Render one accumulation sample and fold it into the running mean."""
        if self.ephem is None:
            self.update_view(self.dt_local)
        level = self.mip_level()
        if not (self.mesh is not None and self.displaced):
            # banded (mesh-HBM-sharded) level reached from a replicated
            # path (e.g. smooth-sphere preview): use the finest coarser
            # replicated level. The mesh path must NOT take this bump —
            # it handles banded levels itself (hf_sharded routing), and
            # bumping here would mix two mip levels in one accumulation
            # and thrash the pose cache (round-3 review finding).
            while (self.mips[level] is None
                   or self.albedo_mips[level] is None):
                level += 1
        tex = self.mips[level]
        alb = self.albedo_mips[level]
        h, w = self.mip_shapes[level]
        if self._accum_n == 0:
            jitter = jnp.zeros(2, jnp.float32)
        else:
            jitter = jnp.asarray(self._rng.random(2) - 0.5, jnp.float32)

        if self.mesh is not None and self.displaced:
            rgb, hitbuf = self._mesh_step(
                self._jitter_rows(jitter), 1, level)
            out = render_mod.RenderOutput(rgb=rgb, hitbuf=hitbuf)
        elif self.backend in ("blocked", "pallas") and self.displaced:
            geom = blocked.block_rays(self.render_basis(), self._fp.rotation, jitter,
                                      self.height, self.width, self.h_min,
                                      maxmap=self.maxmap)
            alevel = self._ensure_blocked_caches(level, geom)
            ah, aw = self.mip_shapes[alevel]
            if self.shadows_on:
                smap, sparams = self.shadow_args()
                n_phi = smap.shape[1] - 2
                shadow_windows = self._shadowwin
            else:
                sparams, n_phi, shadow_windows = None, 0, None
            jitter_t = (jnp.float32(0.5) if self._accum_n == 0
                        else jnp.asarray(self._rng.random(), jnp.float32))
            if self.backend == "pallas":
                # single jittered sample through the packed burst program
                # (also covers the fused-time-step state, where the sun
                # windows exist only inside _packed)
                rgb1, hitbuf1 = blocked.render_accumulate_pallas(
                    self._packed, sparams, self.background(), self.maxmap,
                    self.render_basis(), self._fp,
                    self._jitter_rows(jitter),
                    self.height, self.width, h, w, self.h_min,
                    ah=ah, aw=aw, n_samples=1, use_shadow=self.shadows_on,
                    hbound=self._hbound, interpret=self._interp())
                out = render_mod.RenderOutput(rgb=rgb1, hitbuf=hitbuf1)
            else:
                out = blocked.render_frame_blocked(
                    self._wincache, self._origins, geom, shadow_windows,
                    sparams, self.background(), self.render_basis(), self._fp,
                    jitter_t, self.height, self.width, h, w, ah, aw,
                    n_phi=n_phi)
        else:
            shadow_fn_args = self.shadow_args()
            out = render_mod.render_frame(
                tex, alb, self.background(), shadow_fn_args,
                self.render_basis(), self._fp, jitter,
                self.height, self.width, h, w, self.h_min,
                h_mean=1.0 / self.radius_scale, displaced=self.displaced,
                bounce_map=(self._bounce if shadow_fn_args is not None
                            else None))

        if self._accum_n == 0 or self._accum is None:
            self._accum = out.rgb
            self._hitbuf = out.hitbuf
        else:
            self._accum = render_mod.accumulate(
                self._accum, out.rgb, jnp.float32(self._accum_n))
        self._accum_n += 1
        return self._accum

    def ensure_accumulated(self, n_frames: Optional[int] = None) -> None:
        """Dispatch accumulation up to n_frames samples WITHOUT the display
        transfer — callers that want to overlap more device work behind the
        frame readback (session.frame's held-key speculation) dispatch it
        between this and display()."""
        n = n_frames if n_frames is not None else self.config.accumulation_frames
        if ((self.backend == "pallas" or self.mesh is not None)
                and self.displaced and self._accum_n == 0 and n > 0):
            self.render_accumulation_burst(n)
            return
        while self._accum_n < n:
            self.render_accumulation_frame()

    def render(self, n_frames: Optional[int] = None) -> np.ndarray:
        """Accumulate up to n_frames samples and return the display image
        (uint8 RGB)."""
        self.ensure_accumulated(n_frames)
        return self.display()

    def _padded_jitters(self, n_samples: int) -> jnp.ndarray:
        """Accumulation jitters padded to a FIXED row count (sample 0 is
        always the deterministic center). n_samples is a traced argument
        of every burst program and the jitter shape no longer varies with
        it, so the n=1 interactive step, the speculative prefetch and the
        n=32 cold burst all share ONE compiled program per pipeline —
        cold-start compile work is proportional to the variant count
        through a remote-compile service (docs/PERF.md)."""
        rows = max(C.MAX_ACCUMULATION_FRAMES, n_samples)
        j = np.zeros((rows, 2), np.float32)
        if n_samples > 1:
            j[1:n_samples] = self._rng.random((n_samples - 1, 2)) - 0.5
        return jnp.asarray(j)

    def _jitter_rows(self, jitter) -> jnp.ndarray:
        """One per-frame jitter as row 0 of the fixed-shape jitter block
        (same program variant as _padded_jitters bursts)."""
        rows = jnp.zeros((C.MAX_ACCUMULATION_FRAMES, 2), jnp.float32)
        return rows.at[0].set(jitter)

    def _mesh_step(self, jitters, n_samples: int, level: int):
        """Interactive mesh-mode render with the same cached-pose split as
        the single-device hot paths (round-2 gap: mesh mode re-extracted
        everything per burst). A Q/W time step dispatches the phi-sharded
        scan + ONE sharded program; a pose-stable re-accumulation is one
        burst from the resident per-strip windows; only a pose/level
        change pays extraction. Caches live SHARDED on the devices
        (parallel/tiles.py render_pose_sharded) in the same scene fields
        the single-device paths use, so update_view's drift-invalidation
        policy applies unchanged."""
        from moonrtx_tpu.parallel import (
            render_accumulate_sharded,
            render_pose_sharded,
            render_timestep_sharded,
        )

        h, w = self.mip_shapes[level]
        alevel = self.albedo_level(level)
        ah, aw = self.mip_shapes[alevel]
        use_bg = self.starmap is not None
        bg = self.background()
        pose_valid = (self._origins is not None
                      and self._cache_level == level
                      and self._packed is not None)
        sun_valid = (not self.shadows_on) or (
            self._shadowwin is not None and not self._shadow_dirty)

        if pose_valid and sun_valid:
            sparams = (self.shadow_args()[1] if self.shadows_on else None)
            return render_accumulate_sharded(
                self.mesh, self._packed, sparams, bg, self.maxmap,
                self.render_basis(), self._fp, jitters,
                self.height, self.width, h, w, ah, aw, self.h_min,
                n_samples=n_samples, use_shadow=self.shadows_on,
                use_bg=use_bg, interpret=self._interp())
        if pose_valid:
            smap, sparams = self.shadow_args()
            rgb, hitbuf, swin_p, scal = render_timestep_sharded(
                self.mesh, smap, sparams, self._bounce,
                self._wincache, self._origins,
                self._packed.hwin, self._packed.awin, bg, self.maxmap,
                self.render_basis(), self._fp, jitters,
                self.height, self.width, h, w, ah, aw, self.h_min,
                n_samples=n_samples, use_shadow=True, use_bg=use_bg,
                interpret=self._interp())
            self._packed = self._packed._replace(swin=swin_p, scal=scal)
            self._shadowwin = blocked.FUSED_SHADOW_STATE
            return rgb, hitbuf

        smap = sparams = None
        if self.shadows_on:
            smap, sparams = self.shadow_args()
        rgb, hitbuf, org, cache, packed = self._pose_program_sharded(
            jitters, n_samples, level, smap, sparams, bg, use_bg, self._fp,
            bounce=self._bounce)
        self._origins = org
        self._wincache = cache
        self._cache_level = level
        self._window_drift = 0.0
        self._hbound = None  # mesh strips re-derive chord bounds per program
        self._packed = packed
        self._shadowwin = (blocked.FUSED_SHADOW_STATE
                           if self.shadows_on else None)
        return rgb, hitbuf

    def _pose_program_sharded(self, jitters, n_samples: int, level: int,
                              smap, sparams, bg, use_bg: bool, fp,
                              bounce=None):
        """The mesh pose program, routed by map placement: replicated maps
        go through render_pose_sharded; a banded render level goes through
        the hf burst with return_caches — once the strip caches are
        assembled (one psum_scatter), they are map-layout-agnostic, so
        time steps and re-accumulations on BANDED scenes use the same
        cached programs as replicated ones."""
        from moonrtx_tpu.parallel import (
            render_burst_pallas_hfshard,
            render_pose_sharded,
        )

        h, w = self.mip_shapes[level]
        alevel = self.albedo_level(level)
        ah, aw = self.mip_shapes[alevel]
        nlevel = min(level + 1, len(self.mips) - 1)
        nalevel = min(alevel + 1, len(self.albedo_mips) - 1)
        # at the coarsest level the "next" map aliases the render map:
        # q=2 origins would be computed in half-res coordinates against
        # the full-res array (round-3 review finding) — disable striding
        # exactly like the single-device max_qexp guard (scene.py pose
        # path)
        max_qexp = max(0, min(1, len(self.mips) - 1 - level,
                              len(self.albedo_mips) - 1 - alevel))
        if self.hf_sharded():
            bmips = (self._banded_mip(level), self._banded_mip(nlevel))
            balb = (self._banded_alb(alevel), self._banded_alb(nalevel))
            return render_burst_pallas_hfshard(
                self.mesh, bmips, balb, self.maxmap, self.render_basis(),
                fp, jitters, self.height, self.width, h, w, ah, aw,
                self.h_min, shadow_map=smap, smap_params=sparams,
                bounce_map=bounce, n_samples=n_samples,
                use_shadow=self.shadows_on, interpret=self._interp(),
                h_scale=self.h_scale, h_offset=self.h_offset,
                a_scale=self.a_scale,
                slope_maps=self.slope_maps[level:level + 2],
                return_caches=True, background=bg, use_bg=use_bg,
                max_qexp=max_qexp)
        return render_pose_sharded(
            self.mesh, self.mips[level], self.mips[nlevel],
            self.albedo_mips[alevel], self.albedo_mips[nalevel],
            self.slope_maps[level:level + 2], smap, sparams, bounce,
            bg, self.maxmap, self.render_basis(), fp, jitters,
            self.height, self.width, h, w, ah, aw, self.h_min,
            n_samples=n_samples, use_shadow=self.shadows_on,
            use_bg=use_bg, interpret=self._interp(),
            h_scale=self.h_scale, h_offset=self.h_offset,
            a_scale=self.a_scale, max_qexp=max_qexp)

    def _dispatch_mesh_step(self, fp, sun_unit, ang, jitters,
                            n_samples: int, level: int):
        """Dispatch the NEXT mesh step's programs for an arbitrary frame
        state with NO scene mutation (the speculative half of _mesh_step).
        Returns a prefetch dict or None."""
        from moonrtx_tpu.parallel import (
            render_pose_sharded,
            render_timestep_sharded,
        )

        h, w = self.mip_shapes[level]
        alevel = self.albedo_level(level)
        ah, aw = self.mip_shapes[alevel]
        use_bg = self.starmap is not None
        bg = self.background()
        acc = self.shadow_accuracy if self.shadows_on else 1
        sm = None
        if self.shadows_on:
            sm = self._dispatch_shadow_maps_mesh(sun_unit, ang, acc)
            if sm is None:  # phi grid does not divide: unsharded scan
                sm = self._dispatch_shadow_maps(np.asarray(sun_unit), ang)
            smap, sparams = sm["shadow"]
            bounce_render = sm["bounce_render"]
        else:
            smap = sparams = bounce_render = None

        pose_valid = (self._origins is not None
                      and self._cache_level == level
                      and self._packed is not None)
        if pose_valid:
            rgb, hitbuf, swin_p, scal = render_timestep_sharded(
                self.mesh, smap, sparams, bounce_render,
                self._wincache, self._origins,
                self._packed.hwin, self._packed.awin, bg, self.maxmap,
                self.render_basis(), fp, jitters,
                self.height, self.width, h, w, ah, aw, self.h_min,
                n_samples=n_samples, use_shadow=self.shadows_on,
                use_bg=use_bg, interpret=self._interp())
            return dict(
                kind="mesh_timestep", accum=rgb, hitbuf=hitbuf,
                swin=swin_p, scal=scal,
                shadow=(smap, sparams) if self.shadows_on else None,
                bounce=None if sm is None else sm["bounce"],
                bounce_basis=None if sm is None else sm["bounce_basis"],
                bounce_key=None if sm is None else sm["bounce_key"])
        rgb, hitbuf, org, cache, packed = self._pose_program_sharded(
            jitters, n_samples, level, smap, sparams, bg, use_bg, fp,
            bounce=bounce_render)
        return dict(
            kind="mesh_pose", accum=rgb, hitbuf=hitbuf,
            origins=org, wincache=cache, cache_level=level, hbound=None,
            packed=packed,
            shadow=(smap, sparams) if self.shadows_on else None,
            bounce=None if sm is None else sm["bounce"],
            bounce_basis=None if sm is None else sm["bounce_basis"],
            bounce_key=None if sm is None else sm["bounce_key"])

    def render_accumulation_burst(self, n_samples: int) -> None:
        """All accumulation samples in one device program (pallas backend)."""
        if self.ephem is None:
            self.update_view(self.dt_local)
        if self._flip_ready:
            # a flip-cache restore just installed a fully-rendered step:
            # its accumulation is already materialized on device, so the
            # burst is a no-op. Consumable flag — explicit re-render
            # requests against unchanged state (bench timing loops) still
            # dispatch.
            self._flip_ready = False
            if self._accum is not None and self._accum_n >= n_samples:
                return
        level = self.mip_level()
        h, w = self.mip_shapes[level]
        jitters = self._padded_jitters(n_samples)
        if self.mesh is not None and self.displaced:
            pf = self._consume_prefetch(n_samples)
            if pf is not None:
                self._accum, self._hitbuf = pf
            else:
                self._accum, self._hitbuf = self._mesh_step(
                    jitters, n_samples, level)
            self._accum_n = n_samples
            return

        # speculative held-key hit: the step's programs were dispatched
        # behind the previous frame (prefetch_time); install + take the
        # results. A pose-kind hit covers the cache-invalid branch too.
        pf = self._consume_prefetch(n_samples)
        if pf is not None:
            self._accum, self._hitbuf = pf
            self._accum_n = n_samples
            return

        alevel = self.albedo_level(level)
        ah, aw = self.mip_shapes[alevel]
        pose_valid = (self._origins is not None
                      and self._cache_level == level
                      and self._packed is not None)
        sun_valid = (not self.shadows_on) or (self._shadowwin is not None)

        if pose_valid and sun_valid:
            # nothing structural changed (e.g. brightness/gamma reset):
            # just the burst
            sparams = (self.shadow_args()[1] if self.shadows_on else None)
            accum, hitbuf = blocked.render_accumulate_pallas(
                self._packed, sparams,
                self.background(), self.maxmap, self.render_basis(), self._fp,
                jitters, self.height, self.width, h, w, self.h_min,
                ah=ah, aw=aw, n_samples=n_samples,
                use_shadow=self.shadows_on, hbound=self._hbound,
                interpret=self._interp())
        elif pose_valid:
            # time-step (Q/W) hot path: pose caches valid, only the sun
            # moved. Drift-reuse steps (bounce map still fresh enough —
            # the common held-key case) run scan + windows + repack +
            # burst in ONE program; bounce-rebuild steps run the shadow
            # map programs then the fused windows+repack+burst program
            # (docs/PERF.md: dispatch economy, ~20 ms launch latency per
            # program through the tunnel).
            merged = self._merged_timestep(jitters, n_samples, h, w, ah, aw)
            if merged is not None:
                accum, hitbuf, swin_p, scal = merged
            else:
                smap, sparams = self.shadow_args()
                accum, hitbuf, swin_p, scal = blocked.render_timestep_pallas(
                    smap, sparams, self._bounce, self._wincache,
                    self._origins, self._packed.hwin, self._packed.awin,
                    self.background(), self.maxmap, self.render_basis(), self._fp,
                    jitters, self.height, self.width, h, w, self.h_min,
                    ah, aw, n_samples=n_samples, hbound=self._hbound,
                    interpret=self._interp())
            self._packed = self._packed._replace(swin=swin_p, scal=scal)
            self._shadowwin = blocked.FUSED_SHADOW_STATE
        else:
            # pose (or level) changed: origins + extraction + packing +
            # shadow windows + burst, all in ONE fused program
            max_qexp = min(2, len(self.mips) - 1 - level,
                           len(self.albedo_mips) - 1 - alevel)
            if self.shadows_on:
                smap, sparams = self.shadow_args()
            else:
                smap, sparams = None, None
            (accum, hitbuf, org, cache, hwin_p, awin_p, swin_p,
             scal, hbound) = blocked.render_pose_pallas(
                tuple(self.mips[level:level + max_qexp + 1]),
                tuple(self.albedo_mips[alevel:alevel + max_qexp + 1]),
                self.slope_maps[level:level + max_qexp + 1],
                smap, sparams, self._bounce, self.background(),
                self.maxmap, self.render_basis(), self._fp, jitters,
                self.height, self.width, h, w, ah, aw, self.h_min,
                max_qexp=max_qexp, n_samples=n_samples,
                use_shadow=self.shadows_on,
                h_scale=self.h_scale, h_offset=self.h_offset,
                a_scale=self.a_scale, interpret=self._interp())
            self._origins = org
            self._wincache = cache
            self._cache_level = level
            self._window_drift = 0.0
            self._hbound = hbound
            self._packed = blocked.PackedWindows(
                hwin=hwin_p, awin=awin_p, swin=swin_p, scal=scal)
            self._shadowwin = (blocked.FUSED_SHADOW_STATE
                               if self.shadows_on else None)
        self._accum = accum
        self._hitbuf = hitbuf
        self._accum_n = n_samples

    def display(self) -> np.ndarray:
        if self._accum_n == 0:
            self.render_accumulation_frame()
        img = render_mod.tonemap(self._accum, jnp.float32(C.TONEMAP_EXPOSURE),
                                 jnp.float32(self.gamma))
        return np.asarray(img)[: self.out_height, : self.out_width]

    # ---- picking ----------------------------------------------------------

    def hit_buffer_host(self) -> np.ndarray:
        """Host copy of the per-frame hit buffer, transferred ONCE per
        rendered frame — mouse-motion picking then runs entirely in numpy
        with zero device dispatches (the reference treats picking as
        latency-critical, renderer_navigation.py:189-192)."""
        if self._hitbuf is None:
            self.render_accumulation_frame()
        if self._hitbuf_host is None or self._hitbuf_src is not self._hitbuf:
            self._hitbuf_host = np.asarray(self._hitbuf)
            self._hitbuf_src = self._hitbuf
        return self._hitbuf_host

    # cursor pick window: transferred instead of the whole hit buffer
    # (33 MB at 1080p — a multi-hundred-ms hitch per fresh frame through
    # a slow link). 128px covers mouse motion between frames; re-centers
    # when the cursor leaves the inner half.
    PICK_WIN = 128

    def get_hit_at(self, x: int, y: int) -> tuple[float, float, float, float]:
        """Scene-frame hit position + distance at an image pixel (0 distance
        = miss) — the replacement for the reference's device hit-buffer
        readback (renderer_navigation.py:189-192). Reads the full host
        copy when one is already resident (tests, parity tools); mouse
        picking on a fresh frame transfers only a PICK_WIN^2 window
        around the cursor (~256 KB, re-used while the cursor stays near
        its center) instead of the whole buffer."""
        if self._hitbuf is None:
            self.render_accumulation_frame()
        y = int(np.clip(y, 0, self.height - 1))
        x = int(np.clip(x, 0, self.width - 1))
        if self._hitbuf_host is not None and \
                self._hitbuf_src is self._hitbuf:
            v = self._hitbuf_host[y, x]
            return float(v[0]), float(v[1]), float(v[2]), float(v[3])
        W = min(self.PICK_WIN, self.height, self.width)
        win = getattr(self, "_pickwin", None)
        if (win is not None and self._pickwin_src is self._hitbuf):
            r0, c0 = self._pickwin_origin
            ry, cx = y - r0, x - c0
            q = W // 4
            # inner-half reuse; a margin that is flush against the image
            # edge counts as satisfied (a window pinned at the border
            # cannot re-center any further — without this, every pick in
            # a 32 px edge band re-transferred the window per event)
            row_ok = ((ry >= q or r0 == 0)
                      and (ry < W - q or r0 == self.height - W)
                      and 0 <= ry < W)
            col_ok = ((cx >= q or c0 == 0)
                      and (cx < W - q or c0 == self.width - W)
                      and 0 <= cx < W)
            if row_ok and col_ok:
                v = win[ry, cx]
                return float(v[0]), float(v[1]), float(v[2]), float(v[3])
        r0 = int(np.clip(y - W // 2, 0, self.height - W))
        c0 = int(np.clip(x - W // 2, 0, self.width - W))
        self._pickwin = np.asarray(jax.lax.dynamic_slice(
            self._hitbuf, (r0, c0, 0), (W, W, 4)))
        self._pickwin_origin = (r0, c0)
        self._pickwin_src = self._hitbuf
        v = self._pickwin[y - r0, x - c0]
        return float(v[0]), float(v[1]), float(v[2]), float(v[3])

    def elevation_host(self) -> np.ndarray:
        """Host copy of an elevation level (unpadded columns, decoded f32),
        cached once — measurement drags must not re-transfer device mips
        per mouse event. Uses the shadow-capped level for quantized
        (multi-gigatexel) maps so the host copy stays small."""
        lvl = self._capped_level(0) if self.quantized else 0
        src = self.mips[lvl] if self.mips[lvl] is not None \
            else self._host_mips[lvl]
        if self._elev_host is None or self._elev_host_src is not src:
            m = np.asarray(src)[:, : self.mip_shapes[lvl][1]]
            if self.quantized:
                m = m.astype(np.float32) * self.h_scale + self.h_offset
            self._elev_host = m
            self._elev_host_src = src
        return self._elev_host

    def elevation_m_at(self, lat: float, lon: float) -> float:
        """FULL-RESOLUTION elevation (meters vs the reference radius) at a
        selenographic point: bilinear on the finest host pyramid level.

        Measurement drags sample two endpoints per mouse event — a pure
        host read of the retained finest level costs microseconds and no
        device transfer, at the source data's full resolution. (Round-2
        gap: Δh came from the ≤20-Mtexel elevation_host() level, ~16x
        coarser than the 118 m LDEM — too coarse for a crater rim.
        Reference: full-res bilinear sampling,
        renderer_navigation.py:555-596.) Shares the bilinear/wrap math
        with interact.measure.elevation_m; only the storage decode
        differs."""
        from moonrtx_tpu.interact.measure import elevation_m

        w = self.mip_shapes[0][1]
        return elevation_m(
            self._host_mips[0][:, :w], self.radius_scale, lat, lon,
            scale=self.h_scale if self.quantized else 1.0,
            offset=self.h_offset if self.quantized else 0.0)
