"""Pre-compile the render program set for a target configuration.

First-run UX tool: a cold process pays every XLA/Mosaic compile once
(through a remote compile service on tunneled deployments —
docs/PERF.md "Compile-time engineering"). Running this once after
install (or after an upgrade that changes program signatures) walks the
scene through every interactive pipeline — cold pose, accumulation
burst, drift-reuse time step, bounce-rebuild step, speculative prefetch,
pose change — so the persistent compilation cache
(~/.cache/moonrtx_tpu/jaxcache) absorbs them and the app starts
rendering in seconds.

Usage: python tools/warm_compile.py [--width W --height H
         --shadow-accuracy N --devices N ...]   (any CLI render flag)

The programs are shape-specialized: warm with the SAME size/accuracy/
devices you will run with. Progress lines show per-stage wall time.
"""

from __future__ import annotations

import os
import sys
import time
from datetime import timedelta

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    plat = os.environ.get("MOONRTX_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    t00 = time.time()

    from moonrtx_tpu.app.cli import config_from_args, parse_args
    from moonrtx_tpu.app.headless import build_scene

    # Defaults FIRST so any user flag wins (argparse last-wins, and this
    # also covers --lat=VALUE forms). No --no-download injection: the
    # tool must warm against the SAME data files the app will use —
    # programs are shape-specialized to the map pyramids, so warming
    # against the procedural fallback while the app later downloads the
    # real LDEM would waste the entire warm (round-3 review finding).
    argv = ["--lat", "50.06", "--lon", "19.94",
            "--time", "2024-04-15T21:00:00Z"] + sys.argv[1:]
    cfg = config_from_args(parse_args(argv))

    import jax

    from moonrtx_tpu.utils import compilecache

    # MOONRTX_NO_SEED (set by pack_compile_cache) suppresses archive
    # seeding so a capture run's staging dir holds exactly the
    # freshly-compiled program set
    compilecache.enable()
    cache_dir = compilecache.cache_dir()

    def stage(label, fn):
        t0 = time.time()
        fn()
        print(f"  {label:44s} {time.time()-t0:7.1f}s", flush=True)

    print(f"warming {cfg.width}x{cfg.height} shadow-accuracy "
          f"{cfg.shadow_accuracy} devices {cfg.devices} on "
          f"{jax.devices()[0]}", flush=True)
    scene = build_scene(cfg, with_starmap=True)
    scene.update_view()
    print(f"  scene + data ready {time.time()-t00:37.1f}s", flush=True)

    step = timedelta(minutes=cfg.time_step_minutes)
    stage("cold frame (pose + scan + burst)", lambda: scene.render(1))
    stage("accumulation burst (n samples)",
          lambda: (scene.reset_accumulation(),
                   scene.render(cfg.accumulation_frames)))
    stage("drift-reuse time step",
          lambda: (scene.update_view(scene.dt_local + step),
                   scene.render(1)))
    # bounce-rebuild step variant (threshold tripped)
    def rebuild():
        scene._bounce_basis = None
        scene.update_view(scene.dt_local + step)
        scene.render(1)
    stage("bounce-rebuild time step", rebuild)

    def speculate():
        if scene.prefetch_time(scene.dt_local + step):
            scene.update_view(scene.dt_local + step)
            scene.render(1)
    stage("speculative prefetch + consume", speculate)

    from moonrtx_tpu.interact.navigation import orbit_drag

    def pose():
        scene.set_camera(orbit_drag(scene.camera, 120.0, 0.0,
                                    scene.out_height))
        scene.render(1)
    stage("pose change (re-extraction program)", pose)

    # incremental refinement: the window's idle loop adds one sample at a
    # time through render_accumulation_frame, which uses the SPLIT
    # programs (extract_window_cache, build_shadow_state_from_maps,
    # single-sample accumulate) rather than the fused burst
    stage("incremental accumulation sample",
          lambda: scene.render_accumulation_frame())
    print(f"done: program set compiled + persisted in {cache_dir} "
          f"({time.time()-t00:.0f}s total)", flush=True)


if __name__ == "__main__":
    main()
