"""Blocked (windowed-MXU) backend vs the gather reference backend.

The two backends implement identical math through different memory
primitives; their frames must agree except at a handful of limb/terminator
edge pixels where window clamping differs.
"""

from datetime import datetime, timezone

import numpy as np
import pytest

from moonrtx_tpu.config import RenderConfig
from moonrtx_tpu.data.synth import synthesize_moon
from moonrtx_tpu.engine import blocked
from moonrtx_tpu.engine.scene import MoonScene
from moonrtx_tpu.types import Observer

import jax.numpy as jnp


@pytest.fixture(scope="module")
def scenes():
    elev, albedo = synthesize_moon(360, 720, seed=5, n_craters=150)
    rs = float(elev.max())
    elev = (elev / rs).astype(np.float32)
    cfg = RenderConfig(
        observer=Observer(50.06, 19.94, 219),
        dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
        width=192, height=144, shadow_accuracy=4,
    ).validate()
    out = {}
    for backend in ("blocked", "reference"):
        s = MoonScene(cfg, elev, rs, albedo, None)
        s.backend = backend
        s.shadows_on = True
        s.update_view()
        out[backend] = s
    return out


def test_blocked_matches_reference(scenes):
    img_b = scenes["blocked"].render(1).astype(int)
    img_r = scenes["reference"].render(1).astype(int)
    diff = np.abs(img_b - img_r).max(axis=-1)

    # strided (limb-oblique) blocks legitimately sample the next-coarser mip
    # (anisotropic footprint); compare only over unstrided blocks
    s = scenes["blocked"]
    q = np.asarray(s._origins.q)
    qmask_blocks = (q < 1.5).astype(np.float32)[:, None] * np.ones(
        (1, blocked.BLOCK), np.float32)
    qmask = np.asarray(blocked.from_blocks(
        jnp.asarray(qmask_blocks), s.height, s.width)) > 0.5
    qmask = qmask[: img_b.shape[0], : img_b.shape[1]]
    # the 1-2 px limb silhouette ring is marching-step sensitive in any ray
    # marcher; erode both hit masks so only interior pixels are compared
    hit_b = np.asarray(s._hitbuf)[..., 3] > 0
    hit_r = np.asarray(scenes["reference"]._hitbuf)[..., 3] > 0
    interior = hit_b & hit_r
    for sh in (1, -1):
        interior &= np.roll(interior, sh, axis=0) & np.roll(interior, sh, axis=1)
        interior &= np.roll(interior, 2 * sh, axis=0) & np.roll(interior, 2 * sh, axis=1)
    interior = interior[: img_b.shape[0], : img_b.shape[1]]
    m = qmask & interior
    assert np.percentile(diff[m], 98.0) <= 2.0
    assert diff[m].mean() < 0.5
    # known corner case: a small pixel cluster at the limb/terminator
    # junction shades darker via clamped shadow windows; bound its size
    assert (diff[m] > 8).mean() < 0.02
    # strided regions must still be broadly consistent (same scene content)
    assert diff.mean() < 3.0


def test_hitbuffers_match(scenes):
    hb = scenes["blocked"].get_hit_at(96, 72)
    hr = scenes["reference"].get_hit_at(96, 72)
    assert hb[3] > 0 and hr[3] > 0
    for a, b in zip(hb, hr):
        assert a == pytest.approx(b, abs=2e-3)


def test_block_layout_round_trip():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((32, 128, 3)).astype(np.float32))
    back = blocked.from_blocks(blocked.to_blocks(img), 32, 128)
    assert np.array_equal(np.asarray(back), np.asarray(img))
    assert blocked.to_blocks(img).shape == (32, blocked.BLOCK, 3)


def test_no_bounce_shadow_windows_are_half_width(scenes):
    """With bounce disabled the shadow windows skip the zero bounce half
    (half the memory, one bilinear instead of two — ADVICE r1); the pallas
    pack restores the uniform 2*SWIN_W layout."""
    s = scenes["blocked"]
    if s._cache_level is None:   # test isolation: the module-shared
        s.render(1)              # scene may not have rendered yet
    smap, sparams = s.shadow_args()
    geom = blocked.block_rays(s.basis(), s._fp.rotation,
                              jnp.zeros(2, jnp.float32),
                              s.height, s.width, s.h_min, maxmap=s.maxmap)
    sw = blocked.build_shadow_windows(smap, sparams, geom, bounce_map=None)
    assert sw.swin.shape[2] == blocked.SWIN_W
    _, _, _, _, p = blocked.march_blocks(
        s._wincache, s._origins, geom, *s.mip_shapes[s._cache_level],
        jnp.float32(0.5))
    shadow, bounce = blocked.lookup_shadow_windows(
        sw, sparams, smap.shape[1] - 2, p)
    assert float(jnp.max(bounce)) == 0.0
    # with a bounce map the layout is the full two-half one, and the
    # shadow half must be identical either way
    sw2 = blocked.build_shadow_windows(smap, sparams, geom,
                                       bounce_map=jnp.ones_like(smap))
    assert sw2.swin.shape[2] == 2 * blocked.SWIN_W
    shadow2, _ = blocked.lookup_shadow_windows(
        sw2, sparams, smap.shape[1] - 2, p)
    assert np.allclose(np.asarray(shadow), np.asarray(shadow2))
    # pallas pack pads back to the kernel's uniform layout
    swin_p, _ = blocked._pack_sun_parts(s._wincache, s._origins, sw)
    assert swin_p.shape[2] == 2 * blocked.SWIN_W


def test_window_centering_is_exact(scenes):
    """sample(win) == sample(win - mean) + mean must hold to fp32 eps."""
    s = scenes["blocked"]
    cache = s._wincache
    # reconstruct raw window values at integer coords and compare
    hw = np.asarray(cache.hwin) + np.asarray(cache.hmean)[..., None]
    level = s._cache_level
    r0 = np.asarray(s._origins.r0)
    c0 = np.asarray(s._origins.c0)
    q = np.asarray(s._origins.q)
    # pick an unstrided block
    bs = np.flatnonzero(q < 1.5)
    assert bs.size, "no unstrided blocks in test scene"
    b = int(bs[len(bs) // 2])
    mip = np.asarray(s.mips[level])
    win_direct = mip[r0[b]:r0[b] + blocked.WIN_H, c0[b]:c0[b] + blocked.WIN_W]
    assert np.allclose(hw[b], win_direct, atol=1e-6)
    # strided blocks exist at the limb and carry q == 2
    assert set(np.unique(q)) <= {1.0, 2.0}


def test_bounce_map_drift_reuse():
    """The bounce map is reused across small time steps and rebuilt once
    the accumulated sun drift exceeds BOUNCE_REUSE_DEG (the shadow factor
    map rebuilds every step regardless)."""
    from datetime import timedelta

    from moonrtx_tpu.engine import scene as scene_mod

    elev, albedo = synthesize_moon(180, 360, seed=3, n_craters=40)
    rs = float(elev.max())
    cfg = RenderConfig(
        observer=Observer(50.06, 19.94, 219),
        dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
        width=96, height=72, shadow_accuracy=2,
    ).validate()
    s = MoonScene(cfg, (elev / rs).astype(np.float32), rs, albedo, None)
    assert s.indirect_light
    s.shadows_on = True
    s.update_view()
    smap0, _ = s.shadow_args()
    b0 = s._bounce
    assert b0 is not None

    # one 15-min step: sun drifts ~0.13 deg — bounce reused, shadow fresh
    s.update_view(s.dt_local + timedelta(minutes=15))
    smap1, _ = s.shadow_args()
    assert s._bounce is b0
    assert smap1 is not smap0

    # keep stepping: accumulated drift passes the threshold within ~5 steps
    steps = 0
    while s._bounce is b0 and steps < 10:
        s.update_view(s.dt_local + timedelta(minutes=15))
        s.shadow_args()
        steps += 1
    assert 1 <= steps <= 6, steps

    # a jump far exceeding the threshold rebuilds immediately
    b1 = s._bounce
    s.update_view(s.dt_local + timedelta(days=2))
    s.shadow_args()
    assert s._bounce is not b1

    # disabling indirect light drops the cache
    s.indirect_light = False
    s._shadow_dirty = True
    s.shadow_args()
    assert s._bounce is None


def test_shadow_windows_cover_seam_blocks(scenes):
    """Regression: blocks straddling the sun-frame phi=0 meridian must get
    windows that cover their wrapped side. The scan map carries only
    PHI_PAD=2 wrap columns, so build_shadow_windows must extend the wrap
    before cutting 48-wide windows (else seam-block origins clamp and the
    wrapped side samples the window edge — a band of wrong penumbra along
    one meridian). Coverage is purely geometric, so a zero map suffices;
    sweep the sun-frame x-axis so the seam crosses the visible disk."""
    import math

    from moonrtx_tpu.ops import sampler, shadow_scan

    s = scenes["blocked"]
    if s._cache_level is None:
        s.render(1)  # build the pose caches when this test runs first
    geom = blocked.block_rays(s.basis(), s._fp.rotation,
                              jnp.zeros(2, jnp.float32),
                              s.height, s.width, s.h_min, maxmap=s.maxmap)
    _, _, _, _, p = blocked.march_blocks(
        s._wincache, s._origins, geom, *s.mip_shapes[s._cache_level],
        jnp.float32(0.5))
    sun_u, ang = s._sun_state()
    z = sun_u / np.linalg.norm(sun_u)
    helper = (np.array([0.0, 0.0, 1.0]) if abs(z[2]) < 0.9
              else np.array([1.0, 0.0, 0.0]))
    x0 = np.cross(helper, z)
    x0 /= np.linalg.norm(x0)
    y0 = np.cross(z, x0)
    n_coarse, n_fine, n_phi = 256, 256, 2048
    smap = jnp.zeros((n_coarse + n_fine, n_phi + shadow_scan.PHI_PAD),
                     jnp.float32)
    worst = 0.0
    for a_deg in range(0, 360, 30):
        a = math.radians(a_deg)
        x = math.cos(a) * x0 + math.sin(a) * y0
        y = np.cross(z, x)
        params = shadow_scan.ShadowMapParams(
            axis_x=jnp.asarray(x, jnp.float32),
            axis_y=jnp.asarray(y, jnp.float32),
            axis_z=jnp.asarray(z, jnp.float32),
            n_coarse=jnp.float32(n_coarse), n_fine=jnp.float32(n_fine),
            n_phi=jnp.float32(n_phi), sun_ang_radius=jnp.float32(ang))
        sw = blocked.build_shadow_windows(smap, params, geom)
        rows, cols = shadow_scan.rowcol_of_points(params, n_phi, p)
        # "fits" must use the builder's own chord footprint (enter, mid,
        # end) — blocks whose chord exceeds the stride cap clamp by
        # design (subsolar pole, factor ~1 there)
        t_mid = 0.5 * (geom.t_enter + geom.t_end)
        rcs = [shadow_scan.rowcol_of_points(
                   params, n_phi, geom.ob + t[..., None] * geom.db)
               for t in (geom.t_enter, t_mid, geom.t_end)]
        rows_c = jnp.concatenate([rc[0] for rc in rcs], axis=1)
        cols_c = jnp.concatenate([rc[1] for rc in rcs], axis=1)
        _, _, r_span, c_span = sampler.block_footprint(rows_c, cols_c,
                                                       n_phi)
        qb = np.asarray(sw.sq)
        fits = ((np.asarray(c_span) / qb <= blocked.SWIN_W - 4)
                & (np.asarray(r_span) / qb <= blocked.SWIN_H - 4))
        rows_t = (np.asarray(rows) + 0.5) / qb[:, None] - 0.5
        cols_t = (np.asarray(cols) + 0.5) / qb[:, None] - 0.5
        sc0 = np.asarray(sw.sc0)
        sr0 = np.asarray(sw.sr0)
        cols_t = np.where(cols_t < sc0[:, None] - 0.5,
                          cols_t + n_phi / qb[:, None], cols_t)
        wx = cols_t - sc0[:, None]
        wy = rows_t - sr0[:, None]
        bad = fits[:, None] & ((wx < -0.75)
                               | (wx > blocked.SWIN_W - 0.25)
                               | (wy < -0.75)
                               | (wy > blocked.SWIN_H - 0.25))
        worst = max(worst, float(wx.max(initial=0.0)))
        assert not bad.any(), (a_deg, int(bad.sum()), worst)


def test_camera_drift_fast_path_survives_float32_fov(scenes):
    """A camera whose fov round-tripped through float32 (the init-view
    codec packs 10 floats as '<10f', app/codec.py) must keep the drag
    fast path: _camera_drift_deg uses a tolerance, not exact equality.
    A real zoom still invalidates."""
    import numpy as np

    from moonrtx_tpu.types import Camera

    s = scenes["blocked"]
    cam = s.camera
    f32_cam = Camera(eye=cam.eye, target=cam.target, up=cam.up,
                     fov=float(np.float32(cam.fov)))
    d = s._camera_drift_deg(cam, f32_cam)
    assert d is not None and d < 1e-6, d
    zoomed = Camera(eye=cam.eye, target=cam.target, up=cam.up,
                    fov=cam.fov * 1.1)
    assert s._camera_drift_deg(cam, zoomed) is None
