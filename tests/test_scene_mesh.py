"""Scene-level device-mesh mode (config.devices > 1): accumulation bursts
run through the sharded pipeline (parallel/tiles.py) and shadow maps
through the phi-wedge-sharded scan — end-to-end through MoonScene on the
virtual 8-device CPU mesh."""

from datetime import datetime, timedelta, timezone

import jax
import numpy as np
import pytest

from moonrtx_tpu.config import ConfigError, RenderConfig
from moonrtx_tpu.data.synth import synthesize_moon
from moonrtx_tpu.engine.scene import MoonScene
from moonrtx_tpu.types import Observer


def _cfg(**kw):
    base = dict(
        observer=Observer(50.06, 19.94, 219),
        dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
        width=128, height=128, shadow_accuracy=2,
    )
    base.update(kw)
    return RenderConfig(**base).validate()


@pytest.fixture(scope="module")
def maps():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    elev, albedo = synthesize_moon(360, 720, seed=11, n_craters=100)
    rs = float(elev.max())
    return (elev / rs).astype(np.float32), rs, albedo


def test_mesh_scene_matches_single_device(maps):
    elev, rs, albedo = maps
    single = MoonScene(_cfg(), elev, rs, albedo, None)
    single.shadows_on = True
    single.update_view()
    img_single = single.render(2)

    meshed = MoonScene(_cfg(devices=8), elev, rs, albedo, None)
    assert meshed.mesh is not None
    meshed.shadows_on = True
    meshed.update_view()
    img_mesh = meshed.render(2)

    assert img_mesh.shape == img_single.shape
    d = np.abs(img_mesh.astype(np.float32) - img_single.astype(np.float32))
    # strip-local ray origins differ at fp rounding; display is uint8
    assert np.percentile(d, 99) < 6.0
    assert d.mean() < 1.0

    # time change: the phi-wedge-sharded scan rebuilds the shadow/bounce
    # maps and the next frame renders
    meshed.update_view(meshed.dt_local + timedelta(minutes=15))
    img2 = meshed.render(1)
    assert img2.max() > 0
    assert meshed._bounce is not None  # sharded scan returned the bounce map

    # picking runs off the sharded hit buffer
    hit = meshed.get_hit_at(64, 64)
    assert hit is not None


def test_mesh_scene_quantized_shadow_decode(maps):
    """Regression: the phi-wedge-sharded scan must receive the int16
    affine decode params (h_scale/h_offset) — without them mesh-mode
    shadow/bounce maps were computed from raw +/-32767 heights and were
    garbage on every quantized (i.e. every large-map multi-chip) scene."""
    elev, rs, albedo = maps

    f32 = MoonScene(_cfg(devices=8), elev, rs, albedo, None)
    f32.shadows_on = True
    f32.update_view()
    smap_f32, _ = f32.shadow_args()

    quant = MoonScene(_cfg(devices=8, quantize="i16"), elev, rs, albedo,
                      None)
    assert quant.quantized and quant.mesh is not None
    quant.shadows_on = True
    quant.update_view()
    smap_q, _ = quant.shadow_args()

    d = np.abs(np.asarray(smap_q) - np.asarray(smap_f32))
    # ~0.08 m height quantization cannot move the shadow factor map
    # perceptibly; raw int16 heights moved its mean by ~0.6
    assert d.mean() < 0.01, d.mean()
    assert quant._bounce is not None
    db = np.abs(np.asarray(quant._bounce) - np.asarray(f32._bounce))
    assert db.mean() < 0.01, db.mean()


def test_mesh_devices_auto_and_validation(maps):
    elev, rs, albedo = maps
    # devices=0 resolves to all local devices
    sc = MoonScene(_cfg(devices=0), elev, rs, albedo, None)
    assert sc.mesh is not None and sc.mesh.devices.size == len(jax.devices())
    with pytest.raises(ConfigError):
        _cfg(devices=-2)
    # an unavailable explicit mesh fails loudly (make_mesh raises)
    with pytest.raises(Exception):
        MoonScene(_cfg(devices=64), elev, rs, albedo, None)


class TestMeshInteractive:
    """Round-2 gap: mesh mode had no pose/window caches — every burst
    re-extracted windows. These tests pin the cached split: a Q/W time
    step dispatches the phi-sharded scan + ONE sharded program, reusing
    the resident pose windows; speculation covers mesh steps too."""

    def _counted(self, monkeypatch):
        import moonrtx_tpu.parallel as par

        counts = {"pose": 0, "timestep": 0, "accum": 0, "scan": 0,
                  "burst": 0}
        reals = (par.render_pose_sharded, par.render_timestep_sharded,
                 par.render_accumulate_sharded, par.build_shadow_map_sharded,
                 par.render_burst_pallas_sharded)

        def wrap(name, fn):
            def w(*a, **k):
                counts[name] += 1
                return fn(*a, **k)
            return w

        monkeypatch.setattr(par, "render_pose_sharded",
                            wrap("pose", reals[0]))
        monkeypatch.setattr(par, "render_timestep_sharded",
                            wrap("timestep", reals[1]))
        monkeypatch.setattr(par, "render_accumulate_sharded",
                            wrap("accum", reals[2]))
        monkeypatch.setattr(par, "build_shadow_map_sharded",
                            wrap("scan", reals[3]))
        monkeypatch.setattr(par, "render_burst_pallas_sharded",
                            wrap("burst", reals[4]))
        return counts

    def test_time_step_dispatches_at_most_two_programs(self, maps,
                                                       monkeypatch):
        elev, rs, albedo = maps
        counts = self._counted(monkeypatch)
        s = MoonScene(_cfg(devices=8), elev, rs, albedo, None)
        s.shadows_on = True
        s.update_view()
        s.render(1)
        assert counts["pose"] == 1      # cold frame pays extraction once
        assert counts["burst"] == 0     # cache-less burst path not used

        for c in counts:
            counts[c] = 0
        s.update_view(s.dt_local + timedelta(minutes=15))
        img_step = s.render(1)
        # the Q/W step: scan + ONE cached-pose program, nothing else
        assert counts == {"pose": 0, "timestep": 1, "accum": 0,
                          "scan": 1, "burst": 0}, counts

        # parity: the cached step must match a cold scene at that time
        fresh = MoonScene(_cfg(devices=8), elev, rs, albedo, None)
        fresh.shadows_on = True
        fresh.update_view(s.dt_local)
        img_fresh = fresh.render(1)
        d = np.abs(img_step.astype(np.float32)
                   - img_fresh.astype(np.float32))
        assert d.max() <= 1.0, d.max()  # uint8 rounding of float noise

    def test_brightness_reset_is_one_cached_burst(self, maps, monkeypatch):
        elev, rs, albedo = maps
        counts = self._counted(monkeypatch)
        s = MoonScene(_cfg(devices=8), elev, rs, albedo, None)
        s.shadows_on = True
        s.update_view()
        s.render(1)
        for c in counts:
            counts[c] = 0
        s.set_brightness(s.brightness + 20)
        s.render(1)
        assert counts == {"pose": 0, "timestep": 0, "accum": 1,
                          "scan": 0, "burst": 0}, counts

    def test_mesh_prefetch_hit_consumes_speculation(self, maps,
                                                    monkeypatch):
        elev, rs, albedo = maps
        counts = self._counted(monkeypatch)
        s = MoonScene(_cfg(devices=8), elev, rs, albedo, None)
        s.shadows_on = True
        s.update_view()
        s.render(1)

        dt2 = s.dt_local + timedelta(minutes=15)
        assert s.prefetch_time(dt2)     # speculation dispatched
        for c in counts:
            counts[c] = 0
        s.update_view(dt2)
        img = s.render(1)
        # the step consumed the speculation: ZERO new programs
        assert counts == {"pose": 0, "timestep": 0, "accum": 0,
                          "scan": 0, "burst": 0}, counts

        fresh = MoonScene(_cfg(devices=8), elev, rs, albedo, None)
        fresh.shadows_on = True
        fresh.update_view(dt2)
        img_fresh = fresh.render(1)
        d = np.abs(img.astype(np.float32) - img_fresh.astype(np.float32))
        assert d.max() <= 1.0, d.max()

    def test_mesh_prefetch_miss_is_safe(self, maps, monkeypatch):
        elev, rs, albedo = maps
        s = MoonScene(_cfg(devices=8), elev, rs, albedo, None)
        s.shadows_on = True
        s.update_view()
        s.render(1)
        assert s.prefetch_time(s.dt_local + timedelta(minutes=15))
        # the user went the OTHER way: speculation must not install
        s.update_view(s.dt_local - timedelta(minutes=15))
        img = s.render(1)
        fresh = MoonScene(_cfg(devices=8), elev, rs, albedo, None)
        fresh.shadows_on = True
        fresh.update_view(s.dt_local)
        d = np.abs(img.astype(np.float32)
                   - fresh.render(1).astype(np.float32))
        assert d.max() <= 1.0, d.max()


def test_mesh_interactive_randomized_stress(maps):
    """Cache-invalidation soundness of the mesh-interactive split under a
    random mix of events (time steps both directions, prefetches, small
    drags, brightness, shadow toggles): after the storm, the rendered
    frame must match a COLD scene configured with the same final state.
    Any stale pose/sun/speculation cache shows up as a pixel diff."""
    from moonrtx_tpu.interact.navigation import orbit_drag

    elev, rs, albedo = maps
    s = MoonScene(_cfg(devices=8), elev, rs, albedo, None)
    s.shadows_on = True
    s.update_view()
    s.render(1)

    rng = np.random.default_rng(1234)
    for i in range(24):
        ev = rng.integers(0, 5)
        if ev == 0:
            sgn = int(rng.choice([-1, 1]))
            s.update_view(s.dt_local + timedelta(minutes=15 * sgn))
        elif ev == 1:
            # speculate (sometimes the wrong way) then step
            sgn = int(rng.choice([-1, 1]))
            s.prefetch_time(s.dt_local + timedelta(minutes=15))
            s.update_view(s.dt_local + timedelta(minutes=15 * sgn))
        elif ev == 2:
            s.set_camera(orbit_drag(s.camera, float(rng.normal(0, 3)),
                                    float(rng.normal(0, 3)), s.out_height))
        elif ev == 3:
            s.set_brightness(int(rng.integers(60, 100)))
        else:
            s.set_shadows(not s.shadows_on)
        if i % 6 == 5:
            s.render(1)  # render mid-storm so caches actually engage

    s.set_shadows(True)  # resets accumulation + marks shadow state stale
    img = s.render(1)

    cold = MoonScene(_cfg(devices=8), elev, rs, albedo, None)
    cold.shadows_on = True
    cold.brightness = s.brightness
    cold.camera = s.camera
    cold.update_view(s.dt_local)
    cold.set_brightness(s.brightness)
    img_cold = cold.render(1)
    d = np.abs(img.astype(np.float32) - img_cold.astype(np.float32))
    assert d.max() <= 1.0, (d.max(), (d > 1).mean())


def test_mesh_mode_composites_star_background(maps):
    """Mesh-mode frames must include the star background on miss pixels
    (round-3 fix: the sharded strips previously composited without it) —
    on the cached replicated path AND after a cached time step."""
    elev, rs, albedo = maps
    star = np.zeros((128, 256, 3), np.float32)
    star[::4, ::4] = 1.0  # bright star lattice
    s = MoonScene(_cfg(devices=8), elev, rs, albedo, star)
    s.shadows_on = True
    s.update_view()
    img = s.render(1)
    hit = s.hit_buffer_host()[: s.out_height, : s.out_width, 3] > 0
    sky = img[~hit]
    assert sky.max() > 60, "stars missing from mesh-mode sky"
    # after a cached step the background must survive the timestep program
    s.update_view(s.dt_local + timedelta(minutes=15))
    img2 = s.render(1)
    sky2 = img2[~(s.hit_buffer_host()[: s.out_height, : s.out_width, 3] > 0)]
    assert sky2.max() > 60


def test_mesh_mode_no_indirect_light(maps):
    """Regression (round-3 review): the cached mesh programs passed the
    (1,1) shard_map dummy as a REAL bounce map when indirect light is
    off, crashing window slicing on the first frame. Shadows on +
    indirect off must render, step, and prefetch."""
    elev, rs, albedo = maps
    s = MoonScene(_cfg(devices=8, indirect_light=False), elev, rs, albedo,
                  None)
    s.shadows_on = True
    s.update_view()
    img = s.render(1)
    assert img.max() > 0
    assert s._bounce is None
    s.update_view(s.dt_local + timedelta(minutes=15))
    assert s.render(1).max() > 0           # cached timestep, no bounce
    assert s.prefetch_time(s.dt_local + timedelta(minutes=15))
    s.update_view(s.dt_local + timedelta(minutes=15))
    assert s.render(1).max() > 0           # consumed speculation


def test_mesh_coarsest_level_matches_single_device(maps):
    """Regression (round-3 review): the sharded programs hardcoded
    max_qexp=1, so at the COARSEST pyramid level (where scene passes
    mip_next aliased to the same array) limb blocks with stride q=2
    computed half-resolution window origins against the full-resolution
    map and shaded from unrelated terrain. The scene now disables
    striding at the boundary exactly like the single-device guard."""
    from moonrtx_tpu.types import Camera

    elev, rs, albedo = maps
    single = MoonScene(_cfg(), elev, rs, albedo, None)
    single.update_view()
    meshed = MoonScene(_cfg(devices=8), elev, rs, albedo, None)
    meshed.update_view()

    # zoom far out until the render level is the last pyramid level
    cam = single.camera
    zoom = 1.0
    while (single.mip_level() < len(single.mips) - 1 and zoom < 64):
        zoom *= 2
        far = Camera(eye=[c * zoom for c in cam.eye], target=cam.target,
                     up=cam.up, fov=cam.fov)
        single.set_camera(far)
        meshed.set_camera(far)
    assert single.mip_level() == len(single.mips) - 1

    img_s = single.render(1).astype(np.float32)
    img_m = meshed.render(1).astype(np.float32)
    d = np.abs(img_m - img_s)
    assert np.percentile(d, 99) < 6.0, np.percentile(d, 99)
    assert d.mean() < 1.0, d.mean()
