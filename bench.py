"""Benchmark: 1080p frame time with exact terminator shadows on real TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "ms", "vs_baseline": N, ...}

Baseline (BASELINE.json north star): 1920x1080 with exact terminator
shadows at >30 FPS on one TPU v5e chip, i.e. 33.33 ms/frame.
vs_baseline > 1.0 means faster than the target.
"""

import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    # the product flow: persistent cache + packaged precompiled seeds
    # (utils/compilecache) — the bench exercises exactly what a first
    # run gets, no manual warm-compile invocation
    from moonrtx_tpu.utils.compilecache import enable
    enable()


def _probe_device(
        timeout_s: float = float(os.environ.get("MOONRTX_PROBE_TIMEOUT",
                                                600.0))) -> None:
    """Fail fast (with a diagnostic JSON line) if the accelerator is
    unreachable, instead of hanging forever on PJRT init. The tunneled TPU
    backend has been observed to block jax.devices() indefinitely when the
    tunnel is down; a subprocess probe with a generous timeout (cold
    handshake is ~130 s) converts that hang into an actionable record."""
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, check=True, capture_output=True)
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
        print(json.dumps({
            "metric": "1080p_frame_time_exact_shadows",
            "value": None, "unit": "ms", "vs_baseline": None,
            "error": f"accelerator unreachable: {type(e).__name__} "
                     f"(device init did not complete in {timeout_s:.0f}s)",
        }))
        sys.exit(1)


def main():
    from datetime import datetime, timezone

    import jax
    # MOONRTX_PLATFORM pins the backend before first device touch (some
    # PJRT plugins ignore the JAX_PLATFORMS env var) — CPU smoke tests
    plat = os.environ.get("MOONRTX_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    else:
        _probe_device()
    _enable_compile_cache()
    import jax.numpy as jnp

    from moonrtx_tpu.config import RenderConfig
    from moonrtx_tpu.data.loader import load_color_data, load_elevation_data
    from moonrtx_tpu.engine.scene import MoonScene
    from moonrtx_tpu.types import Observer

    t_cold_start = time.time()  # everything a cold user waits through
    t_setup = time.time()
    # Default working set: the real LOLA LDEM grid at --downscale 2
    # (23040x46080 = 1.06 Gtexels; reference main.py:25-29 ships
    # 46080x92160). Stored int16 on device (scene quantize="auto") with
    # the color map at 1/4 resolution like the real LROC color mosaic.
    # MOONRTX_BENCH_SHAPE=base restores the small 2880x5760 f32 set.
    shape_env = os.environ.get("MOONRTX_BENCH_SHAPE", "23040x46080")
    if shape_env == "base":
        synth_shape = alb_shape = None
    else:
        th, tw = (int(v) for v in shape_env.split("x"))
        synth_shape = (th, tw)
        alb_shape = (max(th // 4, 2880), max(tw // 4, 5760))
    elevation, radius_scale = load_elevation_data(None, downscale=1,
                                                  synth_shape=synth_shape)
    albedo = load_color_data(None, 1, synth_shape=alb_shape)
    # MOONRTX_BENCH_SIZE=WxH overrides the 1080p frame (CPU smoke tests)
    bw, bh = (int(v) for v in
              os.environ.get("MOONRTX_BENCH_SIZE", "1920x1080").split("x"))
    cfg = RenderConfig(
        observer=Observer(50.06, 19.94, 219),
        dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
        width=bw, height=bh, shadow_accuracy=10, backend="pallas",
    ).validate()
    scene = MoonScene(cfg, elevation, radius_scale, albedo, None)
    map_texels = elevation.shape[0] * elevation.shape[1]
    map_bytes = (sum(int(np.prod(m.shape)) * m.dtype.itemsize
                     for m in scene.mips)
                 + sum(int(np.prod(a.shape)) * a.dtype.itemsize
                       for a in {id(a): a for a in scene.albedo_mips}.values()))
    del elevation, albedo
    scene.shadows_on = True
    scene.update_view()
    print(f"# setup {time.time()-t_setup:.0f}s on {jax.devices()}; "
          f"map {scene.mip_shapes[0]} {scene.mips[0].dtype} "
          f"pyramids {map_bytes/2**30:.2f} GiB", file=sys.stderr)

    def sync():
        # force completion with a 16-byte readback (axon block_until_ready
        # does not synchronize reliably through the tunnel). NOT
        # scene.get_hit_at: even with the round-4 cursor-window picking
        # (~256 KB per re-center) a direct single-texel slice is the
        # cheapest possible sync through the tunnel.
        v = jax.lax.dynamic_slice(
            scene._hitbuf, (scene.height // 2, scene.width // 2, 0),
            (1, 1, 4))
        np.asarray(v)

    # Methodology: the metric is device rendering time per accumulation
    # sample at the reference's own accumulation budget (32 frames,
    # reference moon_renderer.py:440), measured with a 16-byte sync
    # readback. Host display transfer is excluded: through this bench
    # environment's network tunnel a 6 MB frame readback costs ~260 ms,
    # which no local deployment pays (the reference likewise renders to an
    # on-GPU buffer and never reads frames back per sample).
    n = 32
    # Pyramid upload, measured apart: host->device transfers ride this
    # environment's tunnel (2.9 GiB = minutes), which would otherwise be
    # booked against the first program execution that waits on them. A
    # local host moves the same bytes over PCIe in <1 s, so the split
    # keeps first_burst_s a statement about PROGRAMS (compiles or their
    # packaged-seed loads), not about tunnel bandwidth. Since the
    # round-5 banded upload, most of the transfer is synced INSIDE scene
    # construction (scene.upload_wall_s); the phase below only settles
    # the small async remainders (maxmap, slope maps), so the reported
    # figure is construction upload + this residual.
    t_up = time.time()
    for m in (scene.mips + scene.albedo_mips
              + [scene.maxmap, scene.slope_maps]):
        if m is None:
            continue
        idx = (0,) * m.ndim
        np.asarray(jax.lax.dynamic_slice(m, idx, (1,) * m.ndim))
    upload_s = (time.time() - t_up
                + float(getattr(scene, "upload_wall_s", 0.0)))
    print(f"# pyramid upload {upload_s:.0f}s "
          f"({map_bytes / 2**20 / max(upload_s, 1e-9):.1f} MB/s tunnel)",
          file=sys.stderr)

    t0 = time.time()
    # stage the first burst through the PRODUCT's own fused pipeline
    # (cold frame = pose + scan programs — the big remote compiles, or
    # their packaged-seed deserializations; utils/compilecache), so the
    # bench compiles exactly the program set a first app run pays and
    # nothing bench-only
    scene.render_accumulation_burst(1)
    sync()
    # the number a user actually experiences cold, end-to-end: data
    # setup + compile-cache seeding + pyramid upload + the first frame's
    # programs (round-5 verdict item 9). Includes this environment's
    # tunnel-bandwidth upload (pyramid_upload_s, reported apart).
    time_to_first_frame_s = time.time() - t_cold_start
    print(f"# cold frame (pose + scan programs) {time.time()-t0:.0f}s; "
          f"time to first frame {time_to_first_frame_s:.0f}s end-to-end",
          file=sys.stderr)
    scene.reset_accumulation()
    scene.render_accumulation_burst(n)
    sync()
    first_burst_s = time.time() - t0
    print(f"# first burst (programs; upload excluded) {first_burst_s:.0f}s",
          file=sys.stderr)

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        scene.render_accumulation_burst(n)
    sync()
    dt_shadows = (time.time() - t0) / (n * reps)

    # single-burst latency (fresh frame after a scene change: 1 dispatch +
    # 1 sample; the number interactive navigation feels)
    scene.render_accumulation_burst(1)
    sync()  # warm the n=1 compilation
    t0 = time.time()
    for _ in range(reps):
        scene.render_accumulation_burst(1)
        sync()
    latency_ms = (time.time() - t0) / reps * 1000.0

    # interactive time step (Q/W): ephemeris + shadow map rebuild +
    # window/pack rebuild + one-sample frame, synced. The bounce
    # (indirect-light) map drift-reuses across small steps
    # (engine/scene.py BOUNCE_REUSE_DEG), so a held-key animation step
    # and the periodic full rebuild are reported separately.
    from datetime import timedelta
    # warm both step paths first: each compiles its own program variant,
    # and a cold compile (even a cache load) pollutes a 2-3 rep median
    scene.update_view(scene.dt_local + timedelta(minutes=15))
    scene.render_accumulation_burst(1)
    scene._bounce_basis = None
    scene.update_view(scene.dt_local + timedelta(minutes=15))
    scene.render_accumulation_burst(1)
    sync()
    # min of 8: a rep that crosses the bounce-drift threshold pays the
    # async-refresh dispatch, which the rebuild/held metrics below measure
    # on purpose — this metric is the pure drift-reuse step; the min also
    # filters the tunnel's 20-70 ms dispatch jitter (docs/PERF.md), which
    # is environment cost, not framework cost
    steps = []
    for _ in range(8):
        t0 = time.time()
        scene.update_view(scene.dt_local + timedelta(minutes=15))
        scene.render_accumulation_burst(1)
        sync()
        steps.append(time.time() - t0)
    time_step_ms = min(steps) * 1000.0

    # periodic full-rebuild step (every ~4th held-key step): same 15-min
    # step but with the bounce drift threshold tripped, so the bounce
    # pyramid program runs too
    rebuilds = []
    for _ in range(3):
        scene._bounce_basis = None  # trip the drift threshold
        t0 = time.time()
        scene.update_view(scene.dt_local + timedelta(minutes=15))
        scene.render_accumulation_burst(1)
        sync()
        rebuilds.append(time.time() - t0)
    time_step_rebuild_ms = sorted(rebuilds)[1] * 1000.0

    # held-key steady state: consecutive 15-min steps including the
    # periodic drift-threshold crossings, which now refresh the bounce
    # map asynchronously BEHIND the frame (engine/scene.py
    # BOUNCE_ASYNC_MAX_DEG) instead of stalling it. Per-step sync: the
    # app reads each frame back to display it. Warm the refresh program
    # variant with a forced crossing first.
    a = np.deg2rad(0.8)
    ca, sa = np.cos(a), np.sin(a)
    rot = np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]], np.float64)
    if scene._bounce_basis is not None:
        scene._bounce_basis = (rot @ scene._bounce_basis.T).T
    scene.update_view(scene.dt_local + timedelta(minutes=15))
    scene.render_accumulation_burst(1)
    sync()
    n_held = 8
    held = []
    for _ in range(n_held):
        t0 = time.time()
        scene.update_view(scene.dt_local + timedelta(minutes=15))
        scene.render_accumulation_burst(1)
        sync()
        held.append(time.time() - t0)
    time_step_held_mean_ms = sum(held) / n_held * 1000.0

    # speculative held-key (the app's actual held-key pipeline,
    # app/session.py frame(): after displaying step t the session
    # dispatches step t+1's fused program behind the display transfer, so
    # the observed latency of the next key event is ephemeris + consume +
    # sync — the device work already happened during the present
    # interval). Untimed filler per step mirrors the app: prefetch
    # dispatch, then the uint8 display readback.
    step15 = timedelta(minutes=15)
    scene.update_view(scene.dt_local + step15)
    scene.render_accumulation_burst(1)
    sync()
    scene.prefetch_time(scene.dt_local + step15)
    scene.display()
    pf_times, pf_hits = [], 0
    for _ in range(n_held):
        dt_next = scene.dt_local + step15
        t0 = time.time()
        scene.update_view(dt_next)
        pf_hits += scene._prefetch is not None
        scene.render_accumulation_burst(1)
        sync()
        pf_times.append(time.time() - t0)
        scene.prefetch_time(scene.dt_local + step15)
        scene.display()
    time_step_prefetch_ms = sum(pf_times) / len(pf_times) * 1000.0

    # mixed-pattern speculation: direction flips are the worst case for
    # the speculative pipeline — a mis-speculated step's device work is
    # already queued and the real step waits behind it. The app therefore
    # gates speculation adaptively (session.change_time: speculate only
    # when the last two steps agree in direction), which this loop
    # mirrors. W W W Q W Q Q W — 5 flips in 8 steps, far denser than real
    # interaction; report hit rate AND the worst observed step so the
    # happy-path hit rate above cannot hide flip cost.
    pattern = [+1, +1, +1, -1, +1, -1, -1, +1]
    scene.prefetch_time(scene.dt_local + step15)
    scene.display()
    prev_sgn = +1
    mixed_hits, hit_times, miss_times = 0, [], []
    for sgn in pattern:
        dt_next = scene.dt_local + sgn * step15
        t0 = time.time()
        scene.update_view(dt_next)
        # a step is covered either by speculation (same-direction run) or
        # by the one-deep flip cache (direction flip to a resident step)
        hit = scene._prefetch is not None or scene.last_flip_hit
        mixed_hits += hit
        scene.render_accumulation_burst(1)
        sync()
        (hit_times if hit else miss_times).append(time.time() - t0)
        # the session's speculation gate (app/session.py change_time +
        # frame): same-direction run, OR a flip hit just left the device
        # idle with the new direction's next target known (round-5 item
        # 3). On a flip hit the session dispatches the speculation AFTER
        # the display transfer (the readback must not queue behind a
        # possibly-doomed program); mirror that order here.
        flip = scene.last_flip_hit
        if prev_sgn == sgn and not flip:
            scene.prefetch_time(scene.dt_local + sgn * step15)
        prev_sgn = sgn
        scene.display()
        if flip:
            scene.prefetch_time(scene.dt_local + sgn * step15)
    time_step_miss_ms = (max(miss_times) * 1000.0 if miss_times else None)
    mixed_hit_rate = mixed_hits / len(pattern)
    time_step_mixed_mean_ms = (sum(hit_times) + sum(miss_times)) \
        / len(pattern) * 1000.0

    # backward scrub (round-5 item 3): Q Q W Q Q — a direction flip into
    # a backward RUN. The flip cache covers step 1 (t-1 resident), and
    # the flip hit arms speculation for step 2 (t-2) immediately, so the
    # whole scrub runs at hit cost: ephemeris + consume + sync, like the
    # forward held-key pipeline. Misses here would mean the flip-aware
    # gate regressed.
    scene.prefetch_time(scene.dt_local + step15)  # moving forward...
    scene.display()
    back_hits, back_times = 0, []
    prev_sgn = +1
    for sgn in [-1, -1, +1, -1, -1]:
        dt_next = scene.dt_local + sgn * step15
        t0 = time.time()
        scene.update_view(dt_next)
        hit = scene._prefetch is not None or scene.last_flip_hit
        back_hits += hit
        scene.render_accumulation_burst(1)
        sync()
        back_times.append(time.time() - t0)
        flip = scene.last_flip_hit
        if prev_sgn == sgn and not flip:
            scene.prefetch_time(scene.dt_local + sgn * step15)
        prev_sgn = sgn
        scene.display()
        if flip:
            scene.prefetch_time(scene.dt_local + sgn * step15)
    time_step_backward_mean_ms = sum(back_times) / len(back_times) * 1000.0
    backward_hit_rate = back_hits / 5.0

    # display path: tonemap + uint8 frame readback to the host. Reported
    # separately from the headline (which is per accumulation sample on
    # device, like the reference's progressive on-GPU accumulation):
    # through this environment's network tunnel the transfer is
    # ~100x a local PCIe/DMA readback, so the measured number is an
    # environment artifact, labeled as such.
    scene.display()
    disp = []
    for _ in range(3):
        t0 = time.time()
        frame = scene.display()
        disp.append(time.time() - t0)
    display_ms_tunnel = min(disp) * 1000.0
    display_bytes = int(frame.nbytes)

    # without exact shadows
    scene.shadows_on = False
    scene.reset_accumulation()
    scene.render_accumulation_burst(n)
    sync()
    t0 = time.time()
    for _ in range(reps):
        scene.render_accumulation_burst(n)
    sync()
    dt_fast = (time.time() - t0) / (n * reps)

    import resource
    maxrss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # ru_maxrss is KiB on Linux but BYTES on macOS (CPU smoke runs)
    rss_gb = maxrss / (1024**3 if sys.platform == "darwin" else 1024**2)

    rays = scene.width * scene.height
    baseline_ms = 1000.0 / 30.0
    value_ms = dt_shadows * 1000.0
    print(json.dumps({
        "metric": "1080p_frame_time_exact_shadows",
        "value": round(value_ms, 2),
        "unit": "ms",
        # the headline is DEVICE time per accumulation sample at the
        # reference's 32-sample budget (progressive on-GPU accumulation,
        # moon_renderer.py:440); "fps" below is accumulation samples per
        # second, not display frames — the display path is reported
        # separately (display_readback_ms_tunnel).
        "per": "accumulation_sample",
        "vs_baseline": round(baseline_ms / value_ms, 3),
        "fps": round(1000.0 / value_ms, 2),
        "frame_time_no_shadows_ms": round(dt_fast * 1000.0, 2),
        "fresh_frame_latency_ms": round(latency_ms, 1),
        "time_step_latency_ms": round(time_step_ms, 1),
        "time_step_rebuild_ms": round(time_step_rebuild_ms, 1),
        "time_step_held_mean_ms": round(time_step_held_mean_ms, 1),
        "time_step_prefetch_ms": round(time_step_prefetch_ms, 1),
        "prefetch_hit_rate": round(pf_hits / n_held, 2),
        "prefetch_hit_rate_mixed": round(mixed_hit_rate, 2),
        "time_step_mixed_mean_ms": round(time_step_mixed_mean_ms, 1),
        "time_step_miss_ms": (None if time_step_miss_ms is None
                              else round(time_step_miss_ms, 1)),
        "time_step_backward_mean_ms": round(time_step_backward_mean_ms, 1),
        "backward_hit_rate": round(backward_hit_rate, 2),
        "mrays_per_s": round(rays / dt_shadows / 1e6, 1),
        "display_readback_ms_tunnel": round(display_ms_tunnel, 1),
        "display_bytes": display_bytes,
        "host_rss_gb": round(rss_gb, 2),
        "pyramid_upload_s": round(upload_s, 1),
        "first_burst_s": round(first_burst_s, 1),
        "time_to_first_frame_s": round(time_to_first_frame_s, 1),
        "backend": scene.backend,
        "device": str(jax.devices()[0]),
        "map_shape": list(scene.mip_shapes[0]),
        "map_texels_g": round(map_texels / 1e9, 3),
        "storage": str(scene.mips[0].dtype),
        "pyramids_gib": round(map_bytes / 2**30, 2),
    }))


if __name__ == "__main__":
    main()
