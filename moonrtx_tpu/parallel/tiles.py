"""Image-tile sharded rendering over a device mesh.

Each device renders a horizontal strip of the frame (shard_map over a 1-D
mesh): ray generation, window extraction, marching and shading are local to
the strip; the texture mips and frame parameters are replicated; the
assembled frame comes back sharded by rows (XLA inserts the ICI all-gather
only if the caller requests a replicated layout).

The shadow scan is also sharded: its azimuth (phi) axis is embarrassingly
parallel, so each device scans a phi wedge of the sun-frame grid and the
wedges are concatenated (all-gather over ICI) into the replicated shadow
map used by shading.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from moonrtx_tpu.engine import blocked
from moonrtx_tpu.engine.camera import CameraBasis
from moonrtx_tpu.engine.render import FrameParams
from moonrtx_tpu.parallel.mesh import TILE_AXIS


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "height", "width", "h", "w", "ah", "aw",
                     "n_coarse", "h_scale", "h_offset", "a_scale",
                     "max_qexp"),
)
def render_frame_sharded(mesh: Mesh, mip, mip_next, albedo_mip,
                         albedo_next, maxmap,
                         basis: CameraBasis, fp: FrameParams, jitter,
                         height: int, width: int, h: int, w: int,
                         ah: int, aw: int, h_min: float,
                         shadow_map=None, smap_params=None,
                         bounce_map=None, n_coarse: int = 24,
                         h_scale: float = 1.0, h_offset: float = 0.0,
                         a_scale: float = 1.0, max_qexp: int = 1):
    """One frame with rows sharded over the mesh. Returns (rgb, hitbuf)
    sharded by rows; mips replicated.

    The full blocked pipeline (geometry, window extraction, march, shade)
    runs per-strip inside shard_map — one jit, no host round trips.
    """
    n_dev = mesh.shape[TILE_AXIS]
    strip_h = height // n_dev
    assert strip_h % blocked.BLOCK_H == 0, (
        f"strip height {strip_h} must be a multiple of {blocked.BLOCK_H}")
    mip_pad_w = mip.shape[1]
    a_pad_w = albedo_mip.shape[1]

    def strip(mip, mip_next, albedo_mip, albedo_next, maxmap, basis,
              fp, jitter):
        idx = jax.lax.axis_index(TILE_AXIS)
        row_offset = idx * strip_h
        geom = blocked.block_rays(basis, fp.rotation, jitter,
                                  strip_h, width, h_min, maxmap=maxmap,
                                  row_offset=row_offset, full_height=height)
        org = blocked.window_origins(geom, h, w, mip_pad_w, ah, aw, a_pad_w,
                                     max_qexp=max_qexp)
        cache = blocked.extract_window_cache(
            (mip, mip_next), (albedo_mip, albedo_next), org,
            h_scale=h_scale, h_offset=h_offset, a_scale=a_scale)
        hit, t_hit, lat, lon, p = blocked.march_blocks(
            cache, org, geom, h, w, jnp.float32(0.5), n_coarse=n_coarse)
        if shadow_map is not None:
            sw = blocked.build_shadow_windows(shadow_map, smap_params, geom,
                                              bounce_map=bounce_map)
            shadow, bounce = blocked.lookup_shadow_windows(
                sw, smap_params, shadow_map.shape[1] - 2, p)
        else:
            shadow = jnp.ones_like(t_hit)
            bounce = None
        rgb_b = blocked.shade_blocks(cache, org, h, w, ah, aw,
                                     lat, lon, p, fp, shadow,
                                     geom=geom, t_hit=t_hit,
                                     pix_ang=2.0 * basis.tan_half_fov / height,
                                     bounce=bounce)
        return blocked.composite_blocks(rgb_b, hit, t_hit, p, strip_h,
                                        width, geom.dirs_scene, basis.eye,
                                        fp)

    return shard_map(
        strip, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(TILE_AXIS), P(TILE_AXIS)),
        check_vma=False,  # loop carries are device-varying by construction
    )(mip, mip_next, albedo_mip, albedo_next, maxmap, basis, fp, jitter)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "height", "width", "h", "w", "ah", "aw",
                     "n_coarse", "use_shadow", "interpret",
                     "h_scale", "h_offset", "a_scale", "max_qexp"),
)
def render_burst_pallas_sharded(mesh: Mesh, mip, mip_next, albedo_mip,
                                albedo_next, maxmap,
                                basis: CameraBasis, fp: FrameParams, jitters,
                                height: int, width: int, h: int, w: int,
                                ah: int, aw: int, h_min: float,
                                shadow_map=None, smap_params=None,
                                bounce_map=None, n_samples: int = 8,
                                n_coarse: int = 12, use_shadow: bool = True,
                                interpret: bool = False,
                                h_scale: float = 1.0, h_offset: float = 0.0,
                                a_scale: float = 1.0, slope_maps=None,
                                max_qexp: int = 1):
    """The FLAGSHIP path sharded: per row strip, window extraction + kernel
    pack + the fused Pallas march/shade accumulation burst all run inside
    shard_map — the whole pose-change-to-accumulated-frame pipeline is one
    sharded program, not just the XLA blocked fallback. Returns
    (rgb_mean, hitbuf) sharded by rows.

    slope_maps: (>=2, ch, cw) per-level mean-squared-slope maps for the
    render level and level+1 (engine.scene passes
    ``self.slope_maps[level:level+2]``) so per-block LOD drops keep the
    roughness-compensated shading the single-device paths apply; without
    them sigma=0 and mesh frames lose soft_ndotl at mip-stride seams.

    On the virtual CPU mesh the kernel runs in Pallas interpret mode
    (interpret=True) with identical semantics — how the parity tests and
    the driver dryrun execute it without TPU hardware.
    """
    n_dev = mesh.shape[TILE_AXIS]
    strip_h = height // n_dev
    assert strip_h % (blocked.BLOCK_H) == 0
    assert (strip_h // blocked.BLOCK_H) * (width // blocked.BLOCK_W) \
        % blocked.GROUP == 0, "strip block count must fill pallas groups"
    mip_pad_w = mip.shape[1]
    a_pad_w = albedo_mip.shape[1]
    use_sh = use_shadow and shadow_map is not None
    if slope_maps is None:
        # zeros -> sigma == 0, the explicit "no compensation" fallback
        slope_maps = jnp.zeros((2, 1, 1), jnp.float32)

    def strip(mip, mip_next, albedo_mip, albedo_next, maxmap, basis, fp,
              jitters, slope_maps):
        idx = jax.lax.axis_index(TILE_AXIS)
        row_offset = idx * strip_h

        def rays(jitter):
            return blocked.block_rays(basis, fp.rotation, jitter,
                                      strip_h, width, h_min, maxmap=maxmap,
                                      row_offset=row_offset,
                                      full_height=height)

        geom0 = rays(jitters[0])
        org = blocked.window_origins(geom0, h, w, mip_pad_w, ah, aw,
                                     a_pad_w, max_qexp=max_qexp,
                                     slope_maps=slope_maps)
        cache = blocked.extract_window_cache(
            (mip, mip_next), (albedo_mip, albedo_next), org,
            h_scale=h_scale, h_offset=h_offset, a_scale=a_scale)
        sw = (blocked.build_shadow_windows(shadow_map, smap_params, geom0,
                                           bounce_map=bounce_map)
              if use_sh else None)
        packed = blocked.pack_windows(cache, org, sw)
        ob = geom0.ob
        params = blocked._kernel_params(
            ob, fp, smap_params, use_sh,
            2.0 * basis.tan_half_fov / height, ah, aw)
        nblk = geom0.db.shape[0]
        ns = nblk // blocked.GROUP

        from moonrtx_tpu.ops import pallas_march as pk

        def run_kernel(geom):
            G, B = blocked.GROUP, blocked.BLOCK
            return pk.march_shade_pallas(
                params,
                geom.db[..., 0].reshape(ns, G, B),
                geom.db[..., 1].reshape(ns, G, B),
                geom.db[..., 2].reshape(ns, G, B),
                geom.t_enter.reshape(ns, G, B),
                geom.t_end.reshape(ns, G, B),
                geom.hit_outer.astype(jnp.float32).reshape(ns, G, B),
                packed.scal, packed.hwin, packed.awin, packed.swin,
                h=h, w=w, n_coarse=n_coarse, use_shadow=use_sh,
                use_earth=fp.earth is not None, interpret=interpret)

        r0_, g0_, b0_, hit0, t0_, px0, py0, pz0 = run_kernel(geom0)

        def sample(i, acc):
            r, g, b, *_ = run_kernel(rays(jitters[i]))
            k = i + 1.0
            return tuple(a + (v - a) / k
                         for a, v in zip(acc, (r, g, b)))

        ar, ag, ab = jax.lax.fori_loop(1, n_samples, sample,
                                       (r0_, g0_, b0_))

        return blocked.composite_kernel_outputs(
            ar, ag, ab, hit0, t0_, px0, py0, pz0, strip_h, width,
            geom0.dirs_scene, basis.eye, fp)

    return shard_map(
        strip, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(TILE_AXIS), P(TILE_AXIS)),
        check_vma=False,
    )(mip, mip_next, albedo_mip, albedo_next, maxmap, basis, fp, jitters,
      slope_maps)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "h", "w", "n_coarse_rows", "n_fine", "n_phi",
                     "h_scale", "h_offset", "n_bounces"),
)
def build_shadow_map_sharded(mesh: Mesh, tex, sun_basis, sun_ang_radius,
                             h: int, w: int, n_coarse_rows: int,
                             n_fine: int, n_phi: int, alb_lum=None,
                             h_scale: float = 1.0, h_offset: float = 0.0,
                             n_bounces: int = 1):
    """Sun-frame shadow scan with the phi axis sharded over the mesh.

    Each device scans its azimuth wedge (the running max along theta is
    local to a meridian) and the replicated map is assembled with an ICI
    all-gather. With alb_lum, the per-wedge heights/albedo are gathered
    too and the one-bounce irradiance map is computed on the replicated
    grid (its neighborhood blurs cross wedge seams, so it runs after the
    gather).

    Always returns ``(shadow_map, bounce_map_or_None)``, both PHI_PAD-
    padded with azimuth wrap columns — the same convention as the
    single-device shadow_scan.build_shadow_map/build_shadow_and_bounce.
    """
    from moonrtx_tpu.ops import shadow_scan

    n_dev = mesh.shape[TILE_AXIS]
    assert n_phi % n_dev == 0

    def _wrap(m):
        return jnp.concatenate([m, m[:, :shadow_scan.PHI_PAD]], axis=1)

    if alb_lum is None:
        def wedge(tex, sun_basis, sun_ang_radius):
            idx = jax.lax.axis_index(TILE_AXIS)
            phi0 = idx * (n_phi // n_dev)
            smap = shadow_scan.scan_wedge(
                tex, sun_basis, sun_ang_radius, h, w,
                n_coarse_rows, n_fine, n_phi, phi0, n_phi // n_dev,
                blocked_resample=True, h_scale=h_scale, h_offset=h_offset)
            return jax.lax.all_gather(smap, TILE_AXIS, axis=1, tiled=True)

        factor = shard_map(
            wedge, mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )(tex, sun_basis, sun_ang_radius)
        return _wrap(factor), None

    def wedge_aux(tex, sun_basis, sun_ang_radius, alb_lum):
        idx = jax.lax.axis_index(TILE_AXIS)
        phi0 = idx * (n_phi // n_dev)
        out = shadow_scan.scan_wedge(
            tex, sun_basis, sun_ang_radius, h, w,
            n_coarse_rows, n_fine, n_phi, phi0, n_phi // n_dev,
            blocked_resample=True, alb_lum=alb_lum,
            h_scale=h_scale, h_offset=h_offset)
        return tuple(jax.lax.all_gather(o, TILE_AXIS, axis=1, tiled=True)
                     for o in out)

    factor, hs, alb_s = shard_map(
        wedge_aux, mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(tex, sun_basis, sun_ang_radius, alb_lum)
    bounce = shadow_scan.bounce_from_parts(hs, factor, alb_s,
                                           n_coarse_rows, n_fine, n_phi,
                                           n_bounces=n_bounces)
    return _wrap(factor), _wrap(bounce)


# ---- interactive mesh mode: cached pose/window state ----------------------
#
# The burst above re-extracts windows every call — fine for a one-shot
# frame, wasteful for interaction. These three programs mirror the
# single-device hot-path split (engine/blocked.py render_pose_pallas /
# render_timestep_pallas / render_accumulate_pallas) with every per-block
# tensor sharded along the block axis: blocks are row-major, so an image
# strip is a contiguous block range and P(TILE_AXIS) on the leading axis
# keeps each device's cache resident next to the strip it renders. A Q/W
# time step on N chips then dispatches the phi-wedge-sharded scan plus ONE
# of these programs (<= 2 dispatches), instead of re-extracting the caches
# per burst (the round-2 gap; reference design point: the Moon mesh is
# never re-uploaded on time change, moon_renderer.py:648-663).


def _strip_burst(packed, smap_params, background, maxmap, basis, fp,
                 jitters, strip_h, width, height, row_offset, h, w,
                 ah, aw, h_min, n_samples, n_coarse, use_sh, interpret,
                 geom0=None):
    """Accumulation burst for one strip from kernel-packed windows.
    Returns (rgb, hitbuf) for the strip; runs INSIDE shard_map."""
    from moonrtx_tpu.ops import pallas_march as pk

    def rays(jitter):
        return blocked.block_rays(basis, fp.rotation, jitter, strip_h,
                                  width, h_min, maxmap=maxmap,
                                  row_offset=row_offset,
                                  full_height=height)

    if geom0 is None:
        geom0 = rays(jitters[0])
    params = blocked._kernel_params(
        geom0.ob, fp, smap_params, use_sh,
        2.0 * basis.tan_half_fov / height, ah, aw)
    ns = geom0.db.shape[0] // blocked.GROUP

    def run_kernel(geom, t_prev=None, f_prev=None):
        G, B = blocked.GROUP, blocked.BLOCK
        return pk.march_shade_pallas(
            params,
            geom.db[..., 0].reshape(ns, G, B),
            geom.db[..., 1].reshape(ns, G, B),
            geom.db[..., 2].reshape(ns, G, B),
            geom.t_enter.reshape(ns, G, B),
            geom.t_end.reshape(ns, G, B),
            geom.hit_outer.astype(jnp.float32).reshape(ns, G, B),
            packed.scal, packed.hwin, packed.awin, packed.swin,
            h=h, w=w, n_coarse=n_coarse, use_shadow=use_sh,
            use_earth=fp.earth is not None, interpret=interpret,
            t_prev=t_prev, f_prev=f_prev)

    r0_, g0_, b0_, hit0, t0_, px0, py0, pz0 = run_kernel(geom0)

    # samples >= 2 warm-start from the previous sample's hit state, same
    # as the single-device burst (blocked._burst_core): re-bracketing
    # strips skip the full coarse march
    warm = os.environ.get("MOONRTX_NO_WARM_START") is None

    def sample(i, carry):
        acc, tp, fpv = carry
        r, g, b, hitf, t_hit, *_ = run_kernel(
            rays(jitters[i]),
            t_prev=tp if warm else None,
            f_prev=fpv if warm else None)
        k = i + 1.0
        acc = tuple(a + (v - a) / k for a, v in zip(acc, (r, g, b)))
        return acc, t_hit, hitf

    (ar, ag, ab), _, _ = jax.lax.fori_loop(
        1, n_samples, sample, ((r0_, g0_, b0_), t0_, hit0))
    return blocked.composite_kernel_outputs(
        ar, ag, ab, hit0, t0_, px0, py0, pz0, strip_h, width,
        geom0.dirs_scene, basis.eye, fp, background=background)


def _dummy(x):
    return x if x is not None else jnp.zeros((1, 1), jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "height", "width", "h", "w", "ah", "aw",
                     "n_coarse", "use_shadow", "use_bg",
                     "interpret", "h_scale", "h_offset", "a_scale",
                     "max_qexp"),
)
def render_pose_sharded(mesh: Mesh, mip, mip_next, albedo_mip, albedo_next,
                        slope_maps, smap, smap_params, bmap, background,
                        maxmap, basis: CameraBasis, fp: FrameParams,
                        jitters, height: int, width: int, h: int, w: int,
                        ah: int, aw: int, h_min: float,
                        n_samples: int = 1, n_coarse: int = 12,
                        use_shadow: bool = True, use_bg: bool = False,
                        interpret: bool = False, h_scale: float = 1.0,
                        h_offset: float = 0.0, a_scale: float = 1.0,
                        max_qexp: int = 1):
    """Mesh pose-change hot path: per strip, rays + window origins +
    extraction + kernel pack + shadow windows + burst in ONE sharded
    program. Returns (rgb, hitbuf, org, cache, packed) with org/cache/
    packed LEFT SHARDED on the devices (leading axis = blocks/groups of
    this device's strip) for the time-step/accumulate programs to reuse.
    """
    n_dev = mesh.shape[TILE_AXIS]
    strip_h = height // n_dev
    assert strip_h % blocked.BLOCK_H == 0
    mip_pad_w = mip.shape[1]
    a_pad_w = albedo_mip.shape[1]
    use_sh = use_shadow and smap is not None
    use_bounce = bmap is not None

    def strip(mip, mip_next, albedo_mip, albedo_next, slope_maps, smap,
              bmap, bg, maxmap, basis, fp, jitters):
        idx = jax.lax.axis_index(TILE_AXIS)
        row_offset = idx * strip_h
        geom0 = blocked.block_rays(basis, fp.rotation, jitters[0],
                                   strip_h, width, h_min, maxmap=maxmap,
                                   row_offset=row_offset,
                                   full_height=height)
        org = blocked.window_origins(geom0, h, w, mip_pad_w, ah, aw,
                                     a_pad_w, max_qexp=max_qexp,
                                     slope_maps=slope_maps)
        cache = blocked.extract_window_cache(
            (mip, mip_next), (albedo_mip, albedo_next), org,
            h_scale=h_scale, h_offset=h_offset, a_scale=a_scale)
        sw = (blocked.build_shadow_windows(
                  smap, smap_params, geom0,
                  bounce_map=bmap if use_bounce else None)
              if use_sh else None)
        packed = blocked.pack_windows(cache, org, sw)
        rgb, hitbuf = _strip_burst(
            packed, smap_params, bg if use_bg else None, maxmap, basis,
            fp, jitters, strip_h, width, height, row_offset, h, w, ah, aw,
            h_min, n_samples, n_coarse, use_sh, interpret, geom0=geom0)
        return rgb, hitbuf, org, cache, packed

    out = shard_map(
        strip, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(TILE_AXIS), P(),
                  P(), P(), P()),
        out_specs=(P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS),
                   P(TILE_AXIS)),
        check_vma=False,
    )(mip, mip_next, albedo_mip, albedo_next, slope_maps, _dummy(smap),
      _dummy(bmap),
      background if background is not None
      else jnp.zeros((height, width, 3), jnp.float32),
      maxmap, basis, fp, jitters)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "height", "width", "h", "w", "ah", "aw",
                     "n_coarse", "use_shadow", "use_bg",
                     "interpret"),
)
def render_timestep_sharded(mesh: Mesh, smap, smap_params, bmap,
                            cache, org, hwin_p, awin_p, background,
                            maxmap, basis: CameraBasis, fp: FrameParams,
                            jitters, height: int, width: int,
                            h: int, w: int, ah: int, aw: int,
                            h_min: float, n_samples: int = 1,
                            n_coarse: int = 12, use_shadow: bool = True,
                            use_bg: bool = False,
                            interpret: bool = False):
    """Mesh time-step (Q/W) hot path: shadow windows from the freshly
    scanned maps + sun-side repack + burst, reusing the POSE-CACHED
    sharded windows (hwin/awin stay resident per device; a time step
    never re-moves them). Returns (rgb, hitbuf, swin_p, scal) with the
    sun pack sharded for the accumulate program to reuse."""
    n_dev = mesh.shape[TILE_AXIS]
    strip_h = height // n_dev
    use_sh = use_shadow and smap is not None
    use_bounce = bmap is not None

    def strip(smap, bmap, cache, org, hwin_p, awin_p, bg, maxmap, basis,
              fp, jitters):
        idx = jax.lax.axis_index(TILE_AXIS)
        row_offset = idx * strip_h
        geom0 = blocked.block_rays(basis, fp.rotation, jitters[0],
                                   strip_h, width, h_min, maxmap=maxmap,
                                   row_offset=row_offset,
                                   full_height=height)
        sw = (blocked.build_shadow_windows(
                  smap, smap_params, geom0,
                  bounce_map=bmap if use_bounce else None)
              if use_sh else None)
        swin_p, scal = blocked._pack_sun_parts(cache, org, sw)
        packed = blocked.PackedWindows(hwin=hwin_p, awin=awin_p,
                                       swin=swin_p, scal=scal)
        rgb, hitbuf = _strip_burst(
            packed, smap_params, bg if use_bg else None, maxmap, basis,
            fp, jitters, strip_h, width, height, row_offset, h, w, ah, aw,
            h_min, n_samples, n_coarse, use_sh, interpret, geom0=geom0)
        return rgb, hitbuf, swin_p, scal

    return shard_map(
        strip, mesh=mesh,
        in_specs=(P(), P(), P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS),
                  P(TILE_AXIS), P(TILE_AXIS), P(), P(), P(), P()),
        out_specs=(P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS)),
        check_vma=False,
    )(_dummy(smap), _dummy(bmap), cache, org, hwin_p, awin_p,
      background if background is not None
      else jnp.zeros((height, width, 3), jnp.float32),
      maxmap, basis, fp, jitters)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "height", "width", "h", "w", "ah", "aw",
                     "n_coarse", "use_shadow", "use_bg",
                     "interpret"),
)
def render_accumulate_sharded(mesh: Mesh, packed, smap_params, background,
                              maxmap, basis: CameraBasis, fp: FrameParams,
                              jitters, height: int, width: int,
                              h: int, w: int, ah: int, aw: int,
                              h_min: float, n_samples: int = 1,
                              n_coarse: int = 12, use_shadow: bool = True,
                              use_bg: bool = False,
                              interpret: bool = False):
    """Mesh steady-state burst: pose AND sun packs valid (brightness
    reset, extra accumulation) — just jittered samples through the fused
    kernel from the cached sharded windows."""
    n_dev = mesh.shape[TILE_AXIS]
    strip_h = height // n_dev

    def strip(packed, bg, maxmap, basis, fp, jitters):
        idx = jax.lax.axis_index(TILE_AXIS)
        return _strip_burst(
            packed, smap_params, bg if use_bg else None, maxmap, basis,
            fp, jitters, strip_h, width, height, idx * strip_h, h, w,
            ah, aw, h_min, n_samples, n_coarse, use_shadow, interpret)

    return shard_map(
        strip, mesh=mesh,
        in_specs=(P(TILE_AXIS), P(TILE_AXIS), P(), P(), P(), P()),
        out_specs=(P(TILE_AXIS), P(TILE_AXIS)),
        check_vma=False,
    )(packed,
      background if background is not None
      else jnp.zeros((height, width, 3), jnp.float32),
      maxmap, basis, fp, jitters)
