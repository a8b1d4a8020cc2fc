"""Fused Pallas kernel vs the XLA blocked backend (interpret mode on CPU:
same kernel semantics as the Mosaic-compiled TPU path)."""

from datetime import datetime, timezone

import jax.numpy as jnp
import numpy as np
import pytest

from moonrtx_tpu.config import RenderConfig
from moonrtx_tpu.data.synth import synthesize_moon
from moonrtx_tpu.engine import blocked
from moonrtx_tpu.engine.render import tonemap
from moonrtx_tpu.engine.scene import MoonScene
from moonrtx_tpu.types import Observer


@pytest.fixture(scope="module")
def scene():
    elev, albedo = synthesize_moon(360, 720, seed=5, n_craters=150)
    rs = float(elev.max())
    cfg = RenderConfig(
        observer=Observer(50.06, 19.94, 219),
        dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
        width=256, height=144, shadow_accuracy=4,
    ).validate()
    s = MoonScene(cfg, (elev / rs).astype(np.float32), rs, albedo, None)
    s.backend = "blocked"
    s.shadows_on = True
    s.update_view()
    return s


def test_pallas_kernel_matches_blocked(scene):
    img_b = scene.render(1).astype(int)
    geom = blocked.block_rays(scene.basis(), scene._fp.rotation,
                              jnp.zeros(2, jnp.float32),
                              scene.height, scene.width, scene.h_min,
                              maxmap=scene.maxmap)
    level = scene.mip_level()
    h, w = scene.mip_shapes[level]
    _, sparams = scene.shadow_args()
    out = blocked.render_frame_pallas(
        scene._wincache, scene._origins, geom, scene._shadowwin, sparams,
        None, scene.basis(), scene._fp, scene.height, scene.width, h, w,
        n_coarse=24, use_shadow=True, interpret=True)
    img_p = np.asarray(tonemap(out.rgb, 0.9, scene.gamma))[
        :scene.out_height, :scene.out_width].astype(int)
    d = np.abs(img_p - img_b).max(axis=-1)
    assert np.percentile(d, 99) <= 2.0
    assert d.mean() < 0.2
    hit_p = np.asarray(out.hitbuf)[..., 3] > 0
    hit_b = np.asarray(scene._hitbuf)[..., 3] > 0
    assert (hit_p == hit_b).mean() > 0.999


def test_wide_march_matches_serial(scene):
    """The wide coarse march (field_multi: all march points in batched
    lane-concatenated bilinear passes) against the serial fori_loop
    reference (wide=False, kept for tools/bench_widemarch.py): identical
    hit topology and bit-level-near images — per point the wide pass runs
    the same arithmetic, concat/slice round-trips aside."""
    scene.render(1)  # materialize the lazy window/shadow caches
    geom = blocked.block_rays(scene.basis(), scene._fp.rotation,
                              jnp.zeros(2, jnp.float32),
                              scene.height, scene.width, scene.h_min,
                              maxmap=scene.maxmap)
    level = scene.mip_level()
    h, w = scene.mip_shapes[level]
    _, sparams = scene.shadow_args()
    packed = blocked.pack_windows(scene._wincache, scene._origins,
                                  scene._shadowwin)
    jitters = jnp.zeros((2, 2), jnp.float32)
    outs = {}
    for wd in (True, False):
        outs[wd] = blocked.render_accumulate_pallas(
            packed, sparams, None, scene.maxmap, scene.basis(), scene._fp,
            jitters, scene.height, scene.width, h, w, scene.h_min,
            ah=h, aw=w, n_samples=2, use_shadow=True,
            hbound=scene._hbound, interpret=True, wide=wd)
    rgb_w, hit_w = np.asarray(outs[True][0]), np.asarray(outs[True][1])
    rgb_s, hit_s = np.asarray(outs[False][0]), np.asarray(outs[False][1])
    assert ((hit_w[..., 3] > 0) == (hit_s[..., 3] > 0)).all()
    # only float-associativity-level drift allowed (t_prev constant
    # folding differs: Python double vs traced f32 rounding)
    assert np.abs(rgb_w - rgb_s).max() < 2e-3


def test_pallas_atan2_accuracy():
    from moonrtx_tpu.ops.pallas_march import _atan2

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((64,)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((64,)).astype(np.float32))
    got = np.asarray(_atan2(y, x))
    want = np.arctan2(np.asarray(y), np.asarray(x))
    assert np.abs(got - want).max() < 3e-6


def test_warm_start_burst_matches_cold_samples(scene):
    """Accumulation samples >= 2 warm-start the march from the previous
    sample's hit distances (pallas_march warm variant). The warm burst
    must reproduce the mean of independent cold single-sample renders:
    bit-identical on strips that fall back (silhouettes, misses), within
    the bisect-interval epsilon elsewhere."""
    import jax.numpy as jnp

    level = scene.mip_level()
    h, w = scene.mip_shapes[level]
    alevel = scene.albedo_level(level)
    ah, aw = scene.mip_shapes[alevel]
    geom = blocked.block_rays(scene.basis(), scene._fp.rotation,
                              jnp.zeros(2, jnp.float32),
                              scene.height, scene.width, scene.h_min,
                              maxmap=scene.maxmap)
    scene._ensure_blocked_caches(level, geom)
    smap, sparams = scene.shadow_args()
    _, swin_p, scal = blocked.build_shadow_state_from_maps(
        smap, sparams, geom, scene._wincache, scene._origins,
        bmap=scene._bounce)
    hwin_p, awin_p = blocked.pack_pose_windows(scene._wincache)
    packed = blocked.PackedWindows(hwin=hwin_p, awin=awin_p,
                                   swin=swin_p, scal=scal)

    rng = np.random.default_rng(3)
    jit4 = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 2)).astype(np.float32))

    rgb_warm, _ = blocked.render_accumulate_pallas(
        packed, sparams, None, scene.maxmap, scene.basis(), scene._fp,
        jit4, scene.height, scene.width, h, w, scene.h_min,
        ah=ah, aw=aw, n_samples=4, use_shadow=True, interpret=True)

    cold = []
    hits = []
    for i in range(4):
        rgb_i, hit_i = blocked.render_accumulate_pallas(
            packed, sparams, None, scene.maxmap, scene.basis(), scene._fp,
            jit4[i:i + 1], scene.height, scene.width, h, w, scene.h_min,
            ah=ah, aw=aw, n_samples=1, use_shadow=True, interpret=True)
        cold.append(np.asarray(rgb_i))
        hits.append(np.asarray(hit_i)[..., 3] > 0)
    rgb_cold = np.mean(cold, axis=0)

    # compare where hit status is stable across all jitters (where it
    # flips, the burst composites sample 0's hit mask by design)
    stable = np.logical_and.reduce(hits)
    dw = np.asarray(rgb_warm)[stable]
    dc = rgb_cold[stable]
    denom = np.maximum(np.abs(dc), 1e-3)
    rel = np.abs(dw - dc) / denom
    assert np.percentile(rel, 99) < 2e-2
    assert rel.mean() < 2e-3
    """render_timestep_pallas (shadow windows + sun repack + burst in ONE
    program, the Q/W hot path) must reproduce the split-program pipeline
    (build_shadow_state_from_maps + render_accumulate_pallas) exactly."""
    import jax.numpy as jnp

    level = scene.mip_level()
    h, w = scene.mip_shapes[level]
    alevel = scene.albedo_level(level)
    ah, aw = scene.mip_shapes[alevel]
    geom = blocked.block_rays(scene.basis(), scene._fp.rotation,
                              jnp.zeros(2, jnp.float32),
                              scene.height, scene.width, scene.h_min,
                              maxmap=scene.maxmap)
    scene._ensure_blocked_caches(level, geom)
    smap, sparams = scene.shadow_args()
    jitters = jnp.zeros((1, 2), jnp.float32)

    # split pipeline
    _, swin_p, scal = blocked.build_shadow_state_from_maps(
        smap, sparams, geom, scene._wincache, scene._origins,
        bmap=scene._bounce)
    hwin_p, awin_p = blocked.pack_pose_windows(scene._wincache)
    packed = blocked.PackedWindows(hwin=hwin_p, awin=awin_p,
                                   swin=swin_p, scal=scal)
    rgb_split, hit_split = blocked.render_accumulate_pallas(
        packed, sparams, None, scene.maxmap, scene.basis(), scene._fp,
        jitters, scene.height, scene.width, h, w, scene.h_min,
        ah=ah, aw=aw, n_samples=1, use_shadow=True, interpret=True)

    # fused single program
    rgb_f, hit_f, swin_f, scal_f = blocked.render_timestep_pallas(
        smap, sparams, scene._bounce, scene._wincache, scene._origins,
        hwin_p, awin_p, None, scene.maxmap, scene.basis(), scene._fp,
        jitters, scene.height, scene.width, h, w, scene.h_min, ah, aw,
        n_samples=1, interpret=True)

    assert np.allclose(np.asarray(rgb_f), np.asarray(rgb_split))
    assert np.allclose(np.asarray(hit_f), np.asarray(hit_split))
    assert np.allclose(np.asarray(swin_f), np.asarray(swin_p))
    assert np.allclose(np.asarray(scal_f), np.asarray(scal))


def test_fused_pose_program_matches_split(scene):
    """render_pose_pallas (origins + extraction + packing + shadow windows
    + burst in ONE program, the camera-move hot path) must reproduce the
    split pipeline."""
    import jax.numpy as jnp

    level = scene.mip_level()
    h, w = scene.mip_shapes[level]
    alevel = scene.albedo_level(level)
    ah, aw = scene.mip_shapes[alevel]
    max_qexp = min(2, len(scene.mips) - 1 - level,
                   len(scene.albedo_mips) - 1 - alevel)
    smap, sparams = scene.shadow_args()
    jitters = jnp.zeros((1, 2), jnp.float32)

    rgb_f, hit_f, org_f, cache_f, hwin_f, awin_f, swin_f, scal_f, _hb = \
        blocked.render_pose_pallas(
            tuple(scene.mips[level:level + max_qexp + 1]),
            tuple(scene.albedo_mips[alevel:alevel + max_qexp + 1]),
            scene.slope_maps[level:level + max_qexp + 1],
            smap, sparams, scene._bounce, None, scene.maxmap,
            scene.basis(), scene._fp, jitters,
            scene.height, scene.width, h, w, ah, aw, scene.h_min,
            max_qexp=max_qexp, n_samples=1, use_shadow=True,
            interpret=True)

    # split pipeline on the same state
    geom = blocked.block_rays(scene.basis(), scene._fp.rotation,
                              jnp.zeros(2, jnp.float32),
                              scene.height, scene.width, scene.h_min,
                              maxmap=scene.maxmap)
    scene._origins = None  # force the split rebuild
    scene._ensure_blocked_caches(level, geom)
    _, swin_s, scal_s = blocked.build_shadow_state_from_maps(
        smap, sparams, geom, scene._wincache, scene._origins,
        bmap=scene._bounce)
    hwin_s, awin_s = blocked.pack_pose_windows(scene._wincache)
    packed = blocked.PackedWindows(hwin=hwin_s, awin=awin_s,
                                   swin=swin_s, scal=scal_s)
    rgb_s, hit_s = blocked.render_accumulate_pallas(
        packed, sparams, None, scene.maxmap, scene.basis(), scene._fp,
        jitters, scene.height, scene.width, h, w, scene.h_min,
        ah=ah, aw=aw, n_samples=1, use_shadow=True, interpret=True)

    assert np.array_equal(np.asarray(org_f.r0), np.asarray(scene._origins.r0))
    assert np.allclose(np.asarray(hwin_f), np.asarray(hwin_s))
    assert np.allclose(np.asarray(swin_f), np.asarray(swin_s))
    assert np.allclose(np.asarray(rgb_f), np.asarray(rgb_s))
    assert np.allclose(np.asarray(hit_f), np.asarray(hit_s))


def test_grouped_fastpath_matches_xla_caches(scene, monkeypatch):
    """The TPU grouped-extraction fast path (packed channel-blocked awin,
    bf16 paired shadow|bounce windows) must reproduce the XLA cache path.
    Forced on here with the kernels in interpret mode."""
    from moonrtx_tpu.ops import extract as extract_ops

    orig_group = extract_ops.extract_group_windows_tpu
    monkeypatch.setattr(
        extract_ops, "extract_group_windows_tpu",
        lambda *a, **k: orig_group(*a, **{**k, "interpret": True}))

    def _set_fast(v):
        # _fast_ok is a trace-time branch inside jitted cache builders;
        # drop their traces so the flip is actually observed
        monkeypatch.setattr(extract_ops, "_fast_ok", lambda: v)
        blocked.extract_window_cache.clear_cache()
        blocked.build_shadow_windows.clear_cache()

    _set_fast(True)

    level = scene.mip_level()
    h, w = scene.mip_shapes[level]
    alevel = scene.albedo_level(level)
    ah, aw = scene.mip_shapes[alevel]
    geom = blocked.block_rays(scene.basis(), scene._fp.rotation,
                              jnp.zeros(2, jnp.float32),
                              scene.height, scene.width, scene.h_min,
                              maxmap=scene.maxmap)
    max_qexp = min(2, len(scene.mips) - 1 - level,
                   len(scene.albedo_mips) - 1 - alevel)
    mips = tuple(scene.mips[level:level + max_qexp + 1])
    amips = tuple(scene.albedo_mips[alevel:alevel + max_qexp + 1])
    org = blocked.window_origins(geom, h, w, mips[0].shape[1], ah, aw,
                                 amips[0].shape[1], max_qexp=max_qexp,
                                 slope_maps=scene.slope_maps[
                                     level:level + max_qexp + 1])
    cache_fast = blocked.extract_window_cache(
        mips, amips, org, h_scale=scene.h_scale, h_offset=scene.h_offset,
        a_scale=scene.a_scale)
    _set_fast(False)
    cache_ref = blocked.extract_window_cache(
        mips, amips, org, h_scale=scene.h_scale, h_offset=scene.h_offset,
        a_scale=scene.a_scale)
    _set_fast(True)

    assert np.allclose(np.asarray(cache_fast.hwin),
                       np.asarray(cache_ref.hwin), atol=1e-6)
    assert np.allclose(np.asarray(cache_fast.hmean),
                       np.asarray(cache_ref.hmean), atol=1e-6)
    # packed channel-blocked awin == moveaxis-packed XLA awin
    assert cache_fast.awin.ndim == 3
    hp_f, ap_f = blocked.pack_pose_windows(cache_fast)
    hp_r, ap_r = blocked.pack_pose_windows(cache_ref)
    assert np.allclose(np.asarray(ap_f), np.asarray(ap_r), atol=1e-6)
    assert np.allclose(np.asarray(hp_f), np.asarray(hp_r), atol=1e-6)

    # paired bf16 shadow|bounce windows == XLA f32 windows (bf16 quantum)
    smap, sparams = scene.shadow_args()
    sw_fast = blocked.build_shadow_windows(smap, sparams, geom,
                                           bounce_map=scene._bounce)
    _set_fast(False)
    sw_ref = blocked.build_shadow_windows(smap, sparams, geom,
                                          bounce_map=scene._bounce)
    _set_fast(True)
    assert sw_fast.swin.dtype == jnp.bfloat16
    assert np.array_equal(np.asarray(sw_fast.sr0), np.asarray(sw_ref.sr0))
    assert np.allclose(np.asarray(sw_fast.swin).astype(np.float32),
                       np.asarray(sw_ref.swin), atol=5e-3)

    # the packed tensors drive the fused kernel to the same image
    swp_f, scal_f = blocked._pack_sun_parts(cache_fast, org, sw_fast)
    packed_f = blocked.PackedWindows(hwin=hp_f, awin=ap_f, swin=swp_f,
                                     scal=scal_f)
    swp_r, scal_r = blocked._pack_sun_parts(cache_ref, org, sw_ref)
    packed_r = blocked.PackedWindows(hwin=hp_r, awin=ap_r, swin=swp_r,
                                     scal=scal_r)
    jitters = jnp.zeros((1, 2), jnp.float32)
    rgb_f, hit_f = blocked.render_accumulate_pallas(
        packed_f, sparams, None, scene.maxmap, scene.basis(), scene._fp,
        jitters, scene.height, scene.width, h, w, scene.h_min,
        ah=ah, aw=aw, n_samples=1, use_shadow=True, interpret=True)
    rgb_r, hit_r = blocked.render_accumulate_pallas(
        packed_r, sparams, None, scene.maxmap, scene.basis(), scene._fp,
        jitters, scene.height, scene.width, h, w, scene.h_min,
        ah=ah, aw=aw, n_samples=1, use_shadow=True, interpret=True)
    assert np.allclose(np.asarray(hit_f), np.asarray(hit_r), atol=1e-5)
    assert np.abs(np.asarray(rgb_f) - np.asarray(rgb_r)).max() < 2e-2

    # shade_blocks handles the packed awin layout (blocked-XLA on TPU)
    hit, t_hit, lat, lon, p = blocked.march_blocks(
        cache_fast, org, geom, h, w, jnp.float32(0.0))
    shadow = jnp.ones_like(t_hit)
    rgb_b_f = blocked.shade_blocks(cache_fast, org, h, w, ah, aw, lat, lon,
                                   p, scene._fp, shadow)
    rgb_b_r = blocked.shade_blocks(cache_ref, org, h, w, ah, aw, lat, lon,
                                   p, scene._fp, shadow)
    assert np.allclose(np.asarray(rgb_b_f), np.asarray(rgb_b_r), atol=1e-4)


def test_merged_scan_timestep_matches_split(scene, monkeypatch):
    """The one-program drift-reuse time step (scan fused with windows +
    repack + burst) must reproduce the split-program path. Forced fast
    paths, kernels in interpret mode."""
    from moonrtx_tpu.ops import extract as extract_ops
    from moonrtx_tpu.ops import shadow_scan

    orig_group = extract_ops.extract_group_windows_tpu
    monkeypatch.setattr(
        extract_ops, "extract_group_windows_tpu",
        lambda *a, **k: orig_group(*a, **{**k, "interpret": True}))
    orig_resample = extract_ops.resample_group_windows_tpu
    monkeypatch.setattr(
        extract_ops, "resample_group_windows_tpu",
        lambda *a, **k: orig_resample(*a, **{**k, "interpret": True}))
    # forcing _fast_ok also routes the scan's prefix max + factor into
    # the fused kernel (shadow_scan.scan_wedge) — interpret that too
    from moonrtx_tpu.ops import shadow_prefix
    orig_factor = shadow_prefix.shadow_factor_tpu
    monkeypatch.setattr(
        shadow_prefix, "shadow_factor_tpu",
        lambda *a, **k: orig_factor(*a, **{**k, "interpret": True}))

    def _set_fast(v):
        monkeypatch.setattr(extract_ops, "_fast_ok", lambda: v)
        blocked.extract_window_cache.clear_cache()
        blocked.build_shadow_windows.clear_cache()
        shadow_scan._build.clear_cache()
        blocked.render_timestep_pallas.clear_cache()
        blocked.render_timestep_scan_pallas.clear_cache()

    level = scene.mip_level()
    h, w = scene.mip_shapes[level]
    alevel = scene.albedo_level(level)
    ah, aw = scene.mip_shapes[alevel]
    geom = blocked.block_rays(scene.basis(), scene._fp.rotation,
                              jnp.zeros(2, jnp.float32),
                              scene.height, scene.width, scene.h_min,
                              maxmap=scene.maxmap)
    scene._ensure_blocked_caches(level, geom)
    scene.shadow_args()
    slevel = scene.shadow_level()
    stex = scene.mips[slevel]
    sh_, sw_ = scene.mip_shapes[slevel]
    sun_unit, ang = scene._sun_state()
    from moonrtx_tpu.engine.scene import _sun_frame_basis_np
    basis_np = _sun_frame_basis_np(sun_unit)
    ncs, nf, nph = shadow_scan._resolution(scene.shadow_accuracy)
    jitters = jnp.zeros((1, 2), jnp.float32)
    hwin_p, awin_p = blocked.pack_pose_windows(scene._wincache)

    _set_fast(True)
    (rgb_m, hit_m, swin_m, scal_m, smap_m,
     hs_m) = blocked.render_timestep_scan_pallas(
        stex, scene._bounce, jnp.asarray(basis_np, jnp.float32),
        jnp.float32(ang), scene._wincache, scene._origins, hwin_p, awin_p,
        scene.background(), scene.maxmap, scene.basis(), scene._fp,
        jitters, scene.height, scene.width, h, w, scene.h_min, ah, aw,
        sh_, sw_, ncs, nf, nph, n_samples=1,
        h_scale=scene.h_scale, h_offset=scene.h_offset, interpret=True)

    # split path: separately-built map (same basis as the merged program —
    # the host/device basis computations differ in the last ulp, which
    # moves scan samples at steep shadow boundaries), then the fused
    # windows+repack+burst. Fast paths stay ON: that is what the TPU
    # split pipeline runs, and the XLA-vs-fused resample numerics are
    # covered by test_extract.test_scan_resample_grouped_matches_fallback
    # (bf16 residual noise here would flip boundary cells of the binary
    # shadow factor).
    smap_s = shadow_scan._build(
        stex, jnp.asarray(basis_np, jnp.float32), jnp.float32(ang),
        sh_, sw_, ncs, nf, nph, h_scale=scene.h_scale,
        h_offset=scene.h_offset)
    sparams = shadow_scan.ShadowMapParams(
        axis_x=jnp.asarray(basis_np[0], jnp.float32),
        axis_y=jnp.asarray(basis_np[1], jnp.float32),
        axis_z=jnp.asarray(basis_np[2], jnp.float32),
        n_coarse=jnp.float32(ncs), n_fine=jnp.float32(nf),
        n_phi=jnp.float32(nph), sun_ang_radius=jnp.float32(ang))
    rgb_s, hit_s, swin_s, scal_s = blocked.render_timestep_pallas(
        smap_s, sparams, scene._bounce, scene._wincache, scene._origins,
        hwin_p, awin_p, scene.background(), scene.maxmap, scene.basis(),
        scene._fp, jitters, scene.height, scene.width, h, w, scene.h_min,
        ah, aw, n_samples=1, interpret=True)
    _set_fast(True)

    # identical scan math either side; only window extraction differs
    assert np.allclose(np.asarray(smap_m), np.asarray(smap_s), atol=1e-5)
    assert np.allclose(np.asarray(scal_m), np.asarray(scal_s), atol=1e-5)
    assert np.allclose(np.asarray(swin_m).astype(np.float32),
                       np.asarray(swin_s).astype(np.float32), atol=5e-3)
    assert np.allclose(np.asarray(hit_m), np.asarray(hit_s), atol=1e-5)
    assert np.abs(np.asarray(rgb_m) - np.asarray(rgb_s)).max() < 2e-2

    # async bounce refresh from the merged program's own scan outputs must
    # reproduce the synchronous build_shadow_and_bounce pyramid
    alb_lum = scene.alb_lum(slevel)
    smap_a, hs_a, alb_s = shadow_scan._build_aux(
        stex, alb_lum, jnp.asarray(basis_np, jnp.float32), jnp.float32(ang),
        sh_, sw_, ncs, nf, nph, h_scale=scene.h_scale,
        h_offset=scene.h_offset)
    bmap_sync = shadow_scan._bounce_jit(smap_a, hs_a, alb_s, ncs, nf, nph)
    bmap_async = shadow_scan.bounce_refresh(
        smap_m, hs_m, alb_lum, jnp.asarray(basis_np, jnp.float32),
        sh_, sw_, ncs, nf, nph)
    assert np.allclose(np.asarray(bmap_async), np.asarray(bmap_sync),
                       atol=2e-3)


def _rot_x(deg: float) -> np.ndarray:
    a = np.deg2rad(deg)
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)


def test_scene_pallas_async_bounce_refresh(monkeypatch):
    """Scene-level pallas path on CPU (interpret mode): a held-key time
    step that crosses BOUNCE_REUSE_DEG renders with the cached bounce map
    and dispatches bounce_refresh behind the frame (no synchronous
    rebuild); a time jump past BOUNCE_ASYNC_MAX_DEG takes the synchronous
    split path."""
    from datetime import timedelta, timezone as tz

    from moonrtx_tpu.engine import scene as scene_mod
    from moonrtx_tpu.ops import shadow_scan

    elev, albedo = synthesize_moon(360, 720, seed=5, n_craters=150)
    rs = float(elev.max())
    cfg = RenderConfig(
        observer=Observer(50.06, 19.94, 219),
        dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
        width=128, height=128, shadow_accuracy=4,
    ).validate()
    s = MoonScene(cfg, (elev / rs).astype(np.float32), rs, albedo, None)
    s.backend = "pallas"
    s.shadows_on = True
    s.update_view()
    s.render(1)  # stands the packed-window pipeline up (pose program)
    assert s._packed is not None and s._bounce is not None

    calls = {"refresh": 0, "sync": 0}
    orig_refresh = shadow_scan.bounce_refresh
    orig_sync = shadow_scan.build_shadow_and_bounce

    def spy_refresh(*a, **k):
        calls["refresh"] += 1
        return orig_refresh(*a, **k)

    def spy_sync(*a, **k):
        calls["sync"] += 1
        return orig_sync(*a, **k)

    monkeypatch.setattr(shadow_scan, "bounce_refresh", spy_refresh)
    monkeypatch.setattr(shadow_scan, "build_shadow_and_bounce", spy_sync)

    # drift under the reuse threshold: merged step, no rebuild of any kind
    s.update_view(s.dt_local + timedelta(minutes=15))
    img = s.render(1)
    assert img.max() > 0
    assert calls == {"refresh": 0, "sync": 0}

    # drift just past the reuse threshold: the frame still renders from
    # the merged program; the bounce refresh is dispatched behind it
    s._bounce_basis = (_rot_x(0.8) @ s._bounce_basis.T).T
    old_bounce = s._bounce
    s.update_view(s.dt_local + timedelta(minutes=15))
    img = s.render(1)
    assert img.max() > 0
    assert calls["refresh"] == 1 and calls["sync"] == 0
    assert s._bounce is not old_bounce
    cur_basis = scene_mod._sun_frame_basis_np(s._sun_state()[0])
    assert scene_mod._rotation_angle_deg(s._bounce_basis, cur_basis) < 1e-6
    assert np.asarray(s._bounce).shape == np.asarray(old_bounce).shape

    # a jump past the async cap: synchronous rebuild for correctness
    s._bounce_basis = (_rot_x(5.0) @ s._bounce_basis.T).T
    s.update_view(s.dt_local + timedelta(minutes=15))
    img = s.render(1)
    assert img.max() > 0
    assert calls["refresh"] == 1 and calls["sync"] == 1


def test_scene_prefetch_timestep_bit_exact(monkeypatch):
    """Speculative held-key prefetch (scene.prefetch_time): a hit consumes
    the pre-dispatched fused step with NO new scan/burst dispatch and is
    bit-exact with the non-speculative path; a mis-speculation (different
    datetime) is dropped and the normal merged step runs."""
    from datetime import timedelta

    from moonrtx_tpu.engine import scene as scene_mod

    def build():
        elev, albedo = synthesize_moon(360, 720, seed=5, n_craters=150)
        rs = float(elev.max())
        cfg = RenderConfig(
            observer=Observer(50.06, 19.94, 219),
            dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
            width=128, height=128, shadow_accuracy=4,
        ).validate()
        s = MoonScene(cfg, (elev / rs).astype(np.float32), rs, albedo, None)
        s.backend = "pallas"
        s.shadows_on = True
        s.update_view()
        s.render(1)  # stand up the packed-window pipeline (pose program)
        return s

    from datetime import timezone  # noqa: F811 (shadow for clarity)

    s1 = build()
    dt1 = s1.dt_local + timedelta(minutes=15)
    s1.update_view(dt1)
    img_ref = s1.render(1)

    s2 = build()
    assert s2.prefetch_time(dt1) is True
    assert s2._prefetch is not None

    calls = {"dispatch": 0}
    orig = scene_mod.MoonScene._dispatch_timestep_scan

    def spy(self, *a, **k):
        calls["dispatch"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(scene_mod.MoonScene, "_dispatch_timestep_scan", spy)

    s2.update_view(dt1)
    assert s2._prefetch is not None  # speculation survives matching dt
    img_hit = s2.render(1)
    assert calls["dispatch"] == 0  # consumed, nothing re-dispatched
    assert s2._prefetch is None
    assert not s2._shadow_dirty
    np.testing.assert_array_equal(img_hit, img_ref)

    # mis-speculation BACKWARD: prefetch forward, step back to t-1. The
    # speculation is dropped on the datetime mismatch — and since round
    # 4 the flip cache covers the backward step itself: the previous
    # step's state restores with ZERO further dispatches
    # (tests/test_flip_cache.py pins the cache in isolation).
    assert s2.prefetch_time(dt1 + timedelta(minutes=15))
    dt_back = dt1 - timedelta(minutes=15)
    s2.update_view(dt_back)
    assert s2._prefetch is None  # cleared on datetime mismatch
    assert s2.last_flip_hit     # t-1 was resident
    img_miss = s2.render(1)
    # 1 = the speculation's own dispatch; the flip restore costs none
    assert calls["dispatch"] == 1
    assert img_miss.max() > 0

    # state-token mismatch: speculate, then change brightness before the
    # step lands -> consume refuses (and the flip cache, which also holds
    # this datetime, refuses on ITS token too), merged step runs with the
    # new state
    assert s2.prefetch_time(dt_back + timedelta(minutes=15))
    s2.set_brightness(s2.brightness + 2)
    s2.update_view(dt_back + timedelta(minutes=15))
    assert not s2.last_flip_hit  # stale flip entry dropped, not restored
    img2 = s2.render(1)
    assert calls["dispatch"] == 3
    assert img2.max() > 0

    # the speculation pins the exact objects whose id()s its validity
    # token carries — without live references, CPython address reuse
    # could alias a stale token after a cache rebuild
    assert s2.prefetch_time(s2.dt_local + timedelta(minutes=15))
    pins = s2._prefetch["pins"]
    assert pins[0] is s2.camera
    assert pins[1] is s2._bounce
    assert pins[2] is s2._origins
    assert pins[3] is s2._wincache
    assert pins[4] is s2._packed


def test_orbit_drag_reuses_windows():
    """Small per-pixel orbit drags keep the cached sampling windows (the
    probe-ray drift stays inside the window margin) and render the same
    image a cold cache renders at that pose; accumulated drift past the
    threshold — or a zoom — rebuilds them (scene.set_camera drift policy)."""
    from moonrtx_tpu.interact import navigation as nav

    elev, albedo = synthesize_moon(360, 720, seed=5, n_craters=150)
    rs = float(elev.max())

    def build():
        cfg = RenderConfig(
            observer=Observer(50.06, 19.94, 219),
            dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
            width=192, height=108, shadow_accuracy=4,
        ).validate()
        s = MoonScene(cfg, (elev / rs).astype(np.float32), rs, albedo, None)
        s.backend = "pallas"
        s.shadows_on = True
        s.update_view()
        return s

    s = build()
    s.render(1)
    origins = s._origins
    assert origins is not None

    # a few one-pixel drag steps: windows survive, burst-only frames
    cam = s.camera
    for _ in range(3):
        cam = nav.orbit_drag(cam, 1.0, 0.0, s.height)
        s.set_camera(cam)
    assert s._origins is origins
    img_reused = s.render(1)

    cold = build()
    cold.set_camera(cam)
    img_cold = cold.render(1)
    d = np.abs(img_reused.astype(int) - img_cold.astype(int)).max(axis=-1)
    assert np.percentile(d, 99) <= 2.0
    assert d.mean() < 0.3

    # drift accumulates across steps: enough drags cross the 4-texel
    # threshold and re-extract
    thresh_deg = 4.0 * 180.0 / s.mip_shapes[s._cache_level][0]
    n = int(thresh_deg / 0.004) + 8  # ~0.004 deg per 1080p-pixel drag
    for _ in range(n):
        cam = nav.orbit_drag(cam, 4.0, 0.0, s.height)
        s.set_camera(cam)
    assert s._origins is None

    # zoom: footprint spans rescale -> always a rebuild
    s.render(1)
    assert s._origins is not None
    s.set_camera(nav.zoom_fov(s.camera, 1))
    assert s._origins is None


def test_scene_prefetch_pose_kind_bit_exact(monkeypatch):
    """When the drift prediction says the pose windows will NOT survive
    the next step (full-LDEM working levels), prefetch_time speculates the
    FULL pose rebuild; a hit installs fresh origins/windows/shadow state
    and is bit-exact with the non-speculative pose-program step."""
    from datetime import timedelta

    def build():
        elev, albedo = synthesize_moon(360, 720, seed=5, n_craters=150)
        rs = float(elev.max())
        cfg = RenderConfig(
            observer=Observer(50.06, 19.94, 219),
            dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
            width=128, height=128, shadow_accuracy=4,
        ).validate()
        s = MoonScene(cfg, (elev / rs).astype(np.float32), rs, albedo, None)
        s.backend = "pallas"
        s.shadows_on = True
        s.update_view()
        s.render(1)
        # make the windows look one step from invalidation, as at
        # full-LDEM levels where each 15-min step drifts ~9 texels
        s._window_drift = 1e9
        return s

    dt1 = (datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc)
           + timedelta(minutes=15))
    s1 = build()
    s1.update_view(dt1)
    assert s1._origins is None  # drift policy dropped the windows
    img_ref = s1.render(1)

    s2 = build()
    assert s2.prefetch_time(dt1) is True
    assert s2._prefetch is not None and s2._prefetch["kind"] == "pose"
    s2.update_view(dt1)
    assert s2._origins is None  # invalidated — pose speculation covers it
    assert s2._prefetch is not None

    calls = {"pose": 0}
    from moonrtx_tpu.engine import blocked as blocked_mod
    orig = blocked_mod.render_pose_pallas

    def spy(*a, **k):
        calls["pose"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(blocked_mod, "render_pose_pallas", spy)
    img_hit = s2.render(1)
    assert calls["pose"] == 0  # consumed the speculation, no re-dispatch
    assert not s2._shadow_dirty
    assert s2._origins is not None and s2._packed is not None
    np.testing.assert_array_equal(img_hit, img_ref)

    # and the installed caches are live: the NEXT frame accumulates
    # through the burst-only path off them
    img2 = s2.render(2)
    assert calls["pose"] == 0
    assert img2.max() > 0


def test_illinois_refinement_accuracy(scene):
    """Refinement A/B: the production 3-iteration Illinois root vs a
    converged (12-iteration) root. Hit topology must be identical, the
    image must agree below the 8-bit pixel quantum, and the t_hit error
    tail must stay small relative to the coarse bracket."""
    scene.render(1)  # materialize the lazy window/shadow caches
    geom = blocked.block_rays(scene.basis(), scene._fp.rotation,
                              jnp.zeros(2, jnp.float32), scene.height,
                              scene.width, scene.h_min, maxmap=scene.maxmap)
    level = scene.mip_level()
    h, w = scene.mip_shapes[level]
    _, sparams = scene.shadow_args()
    packed = blocked.pack_windows(scene._wincache, scene._origins,
                                  scene._shadowwin)
    params = blocked._kernel_params(
        geom.ob, scene._fp, sparams, True,
        2.0 * scene.basis().tan_half_fov / scene.height, h, w)

    def run(nb):
        return blocked._pallas_frame(packed, geom, params, None,
                                     scene.basis(), scene._fp,
                                     scene.height, scene.width, h, w,
                                     12, True, True, n_bisect=nb)

    o3 = run(3)
    o12 = run(12)
    hit3 = np.asarray(o3.hitbuf[..., 3])
    hit12 = np.asarray(o12.hitbuf[..., 3])
    assert ((hit3 > 0) == (hit12 > 0)).all()
    m = hit3 > 0
    err = np.abs(hit3[m] - hit12[m])
    span = np.asarray(geom.t_end - geom.t_enter)
    bracket = float(np.median(span[np.asarray(geom.hit_outer)])) / 12
    # the p50 floor is the f32 ULP of t (~3e-5 at camera distance 300)
    assert np.percentile(err, 50) <= max(1e-3 * bracket, 6e-5)
    assert np.percentile(err, 99) <= 0.15 * bracket
    assert err.max() <= 3.5 * bracket  # grazing rays have longer chords
    rgb_d = np.abs(np.asarray(o3.rgb) - np.asarray(o12.rgb)).max()
    assert rgb_d < 3.0 / 255.0
