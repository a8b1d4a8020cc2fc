"""Profile the interactive time-step path component by component on the
real TPU at bench shapes.

Prints a breakdown: tunnel dispatch tax, shadow scan, fused
windows+repack+burst, merged one-program step — each median-of-3 with a
16-byte sync readback (axon block_until_ready does not sync through the
tunnel).

Usage:  python tools/profile_timestep.py [HxW-map-shape | base]
"""

import json
import os
import sys
import time
from datetime import datetime, timedelta, timezone

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def _sync_probe(x):
    import jax
    import jax.numpy as jnp

    v = jax.lax.dynamic_slice(
        x.reshape(-1)[:16].astype(jnp.float32), (0,), (4,))
    return np.asarray(v)


def _timed(label, fn, out_pick=lambda r: r, reps=3):
    # warm (compile + cache)
    r = fn()
    _sync_probe(out_pick(r))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        r = fn()
        _sync_probe(out_pick(r))
        ts.append(time.time() - t0)
    ms = sorted(ts)[len(ts) // 2] * 1000.0
    print(f"{label:44s} {ms:8.1f} ms")
    return ms


def main():
    import jax

    cache_dir = os.path.join(
        os.environ.get("MOONRTX_TPU_CACHE",
                       os.path.expanduser("~/.cache/moonrtx_tpu")), "jaxcache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from moonrtx_tpu.config import RenderConfig
    from moonrtx_tpu.data.loader import load_color_data, load_elevation_data
    from moonrtx_tpu.engine import blocked
    from moonrtx_tpu.engine.scene import MoonScene, _sun_frame_basis_np
    from moonrtx_tpu.ops import shadow_scan
    from moonrtx_tpu.types import Observer

    shape_env = sys.argv[1] if len(sys.argv) > 1 else "23040x46080"
    if shape_env == "base":
        synth_shape = alb_shape = None
    else:
        th, tw = (int(v) for v in shape_env.split("x"))
        synth_shape = (th, tw)
        alb_shape = (max(th // 4, 2880), max(tw // 4, 5760))
    t0 = time.time()
    elevation, radius_scale = load_elevation_data(None, downscale=1,
                                                  synth_shape=synth_shape)
    albedo = load_color_data(None, 1, synth_shape=alb_shape)
    cfg = RenderConfig(
        observer=Observer(50.06, 19.94, 219),
        dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
        width=1920, height=1080, shadow_accuracy=10, backend="pallas",
    ).validate()
    scene = MoonScene(cfg, elevation, radius_scale, albedo, None)
    del elevation, albedo
    scene.shadows_on = True
    scene.update_view()
    print(f"# setup {time.time()-t0:.0f}s   device {jax.devices()[0]}")

    # stand the full pipeline up once (pose program + caches)
    scene.render_accumulation_burst(1)
    _sync_probe(scene._hitbuf)
    print(f"# pipeline up {time.time()-t0:.0f}s")

    # tunnel tax: trivial program end to end
    tiny = jax.jit(lambda x: x * 2.0 + 1.0)
    xs = jnp.arange(16, dtype=jnp.float32)
    _timed("null dispatch + sync (tunnel tax)", lambda: tiny(xs))

    slevel = scene.shadow_level()
    stex = scene.mips[slevel]
    sh, sw = scene.mip_shapes[slevel]
    acc = scene.shadow_accuracy
    ncs, nf, nph = shadow_scan._resolution(acc)
    sun_unit, ang = scene._sun_state()
    basis_np = _sun_frame_basis_np(sun_unit)
    sun_basis = jnp.asarray(basis_np, jnp.float32)
    print(f"# shadow level {slevel} map {sh}x{sw} {stex.dtype}; "
          f"scan grid ({ncs}+{nf})x{nph}")

    scan_fn = jax.jit(lambda tex, sb, sar: shadow_scan.scan_wedge(
        tex, sb, sar, sh, sw, ncs, nf, nph, 0, nph, blocked_resample=True,
        h_scale=scene.h_scale, h_offset=scene.h_offset))
    _timed("scan_wedge alone (factor map)",
           lambda: scan_fn(stex, sun_basis, jnp.float32(ang)))

    # resample-only: heights on the scan grid (the scan minus the prefix
    # max + factor math)
    theta = jnp.asarray(
        np.deg2rad(shadow_scan._theta_grid(ncs, nf)))[:, None]
    phi = ((2 * np.pi) * (jnp.arange(nph, dtype=jnp.float32)[None, :] + 0.5)
           / nph)

    def _resample(tex, sb):
        from moonrtx_tpu.engine.geometry import unit_to_latlon
        from moonrtx_tpu.ops import sampler
        st, ct = jnp.sin(theta), jnp.cos(theta)
        dirs = (sb[2][None, None, :] * ct[..., None]
                + sb[0][None, None, :] * (st * jnp.cos(phi))[..., None]
                + sb[1][None, None, :] * (st * jnp.sin(phi))[..., None])
        lat, lon = unit_to_latlon(dirs)
        row, col = sampler.latlon_to_rowcol(lat, lon, sh, sw)
        return shadow_scan._resample_heights_blocked(
            tex, sh, sw, row, col, scale=scene.h_scale,
            offset=scene.h_offset)

    _timed("  resample heights only",
           lambda: jax.jit(_resample)(stex, sun_basis))

    jitters = jnp.zeros((1, 2), jnp.float32)
    h, w = scene.mip_shapes[scene.mip_level()]
    alevel = scene.albedo_level(scene.mip_level())
    ah, aw = scene.mip_shapes[alevel]

    smap, sparams = scene.shadow_args()
    _timed("render_timestep_pallas (win+repack+burst)",
           lambda: blocked.render_timestep_pallas(
               smap, sparams, scene._bounce, scene._wincache,
               scene._origins, scene._packed.hwin, scene._packed.awin,
               scene.background(), scene.maxmap, scene.basis(), scene._fp,
               jitters, scene.height, scene.width, h, w, scene.h_min,
               ah, aw, n_samples=1, hbound=scene._hbound),
           out_pick=lambda r: r[1])

    _timed("render_timestep_scan_pallas (merged step)",
           lambda: blocked.render_timestep_scan_pallas(
               stex, scene._bounce, sun_basis, jnp.float32(ang),
               scene._wincache, scene._origins, scene._packed.hwin,
               scene._packed.awin, scene.background(), scene.maxmap,
               scene.basis(), scene._fp, jitters, scene.height, scene.width,
               h, w, scene.h_min, ah, aw, sh, sw, ncs, nf, nph,
               n_samples=1, h_scale=scene.h_scale,
               h_offset=scene.h_offset, hbound=scene._hbound),
           out_pick=lambda r: r[1])

    _timed("render_accumulate_pallas (1 sample)",
           lambda: blocked.render_accumulate_pallas(
               scene._packed, sparams, scene.background(), scene.maxmap,
               scene.basis(), scene._fp, jitters, scene.height, scene.width,
               h, w, scene.h_min, ah=ah, aw=aw, n_samples=1,
               use_shadow=True, hbound=scene._hbound),
           out_pick=lambda r: r[1])

    # async bounce refresh program alone (dispatched behind a
    # threshold-crossing held-key frame; engine/scene.py
    # BOUNCE_ASYNC_MAX_DEG)
    if shadow_scan.half_grid_ok(ncs, nf, nph):
        factor, hs = shadow_scan.scan_wedge(
            stex, sun_basis, jnp.float32(ang), sh, sw, ncs, nf, nph, 0,
            nph, blocked_resample=True, h_scale=scene.h_scale,
            h_offset=scene.h_offset, return_heights=True)
        smap_pad = jnp.concatenate(
            [factor, factor[:, :shadow_scan.PHI_PAD]], axis=1)
        alb_lum = scene.alb_lum(slevel)
        _timed("bounce_refresh (async, behind frame)",
               lambda: shadow_scan.bounce_refresh(
                   smap_pad, hs, alb_lum, sun_basis, sh, sw, ncs, nf, nph))

    # full end-to-end step as the bench measures it
    def step():
        scene.update_view(scene.dt_local + timedelta(minutes=15))
        scene.render_accumulation_burst(1)
        return scene._hitbuf

    scene.render_accumulation_burst(1)
    _timed("scene time step end-to-end (drift-reuse)", step)

    # threshold-crossing step: renders from the merged program, bounce
    # refresh dispatched behind the frame
    def step_crossing():
        a = np.deg2rad(0.8)
        ca, sa = np.cos(a), np.sin(a)
        rot = np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]], np.float64)
        if scene._bounce_basis is not None:
            scene._bounce_basis = (rot @ scene._bounce_basis.T).T
        return step()

    _timed("scene time step end-to-end (async refresh)", step_crossing)

    # synchronous rebuild (time jump past BOUNCE_ASYNC_MAX_DEG)
    def step_jump():
        scene._bounce_basis = None
        return step()

    _timed("scene time step end-to-end (sync rebuild)", step_jump)

    # camera pose change end-to-end (window re-extraction + repack + frame)
    from moonrtx_tpu.interact.navigation import navigate_view

    def pose_change():
        scene.set_camera(navigate_view(scene.camera, "Right", 0.02))
        scene.render_accumulation_burst(1)
        return scene._hitbuf

    pose_change()  # warm
    _timed("scene pose change end-to-end", pose_change)


if __name__ == "__main__":
    main()
