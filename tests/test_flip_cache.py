"""One-deep flip cache: a Q/W direction flip targets the time step the
device JUST rendered (t-1); the scene snapshots each outgoing step and
restores it on a flip instead of re-rendering (round-3 verdict item 2 —
the flip penalty was ~3x the held-key step latency).

Reference design point: held/scrubbed time steps must be cheap
(moon_renderer.py:648-663)."""

from datetime import datetime, timedelta, timezone

import numpy as np
import pytest

from moonrtx_tpu.config import RenderConfig
from moonrtx_tpu.data.synth import synthesize_moon
from moonrtx_tpu.engine.scene import MoonScene
from moonrtx_tpu.types import Observer

T0 = datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc)
STEP = timedelta(minutes=15)


def _cfg(**kw):
    base = dict(
        observer=Observer(50.06, 19.94, 219),
        dt_local=T0,
        width=128, height=128, shadow_accuracy=2,
    )
    base.update(kw)
    return RenderConfig(**base).validate()


@pytest.fixture(scope="module")
def maps():
    elev, albedo = synthesize_moon(360, 720, seed=11, n_craters=100)
    rs = float(elev.max())
    return (elev / rs).astype(np.float32), rs, albedo


def _scene(maps, **kw):
    elev, rs, albedo = maps
    s = MoonScene(_cfg(**kw), elev, rs, albedo, None)
    s.shadows_on = True
    s.update_view()
    return s


def _counted(monkeypatch):
    """Count every device-program entry point of the single-device paths."""
    from moonrtx_tpu.engine import blocked
    from moonrtx_tpu.ops import shadow_scan

    counts = {"rays": 0, "scan": 0, "scan_bounce": 0}

    def wrap(mod, attr, key):
        real = getattr(mod, attr)

        def w(*a, **k):
            counts[key] += 1
            return real(*a, **k)
        monkeypatch.setattr(mod, attr, w)

    wrap(blocked, "block_rays", "rays")
    wrap(shadow_scan, "build_shadow_map", "scan")
    wrap(shadow_scan, "build_shadow_and_bounce", "scan_bounce")
    return counts


def test_flip_restores_previous_step_bit_exact(maps):
    s = _scene(maps)
    img_t0 = s.render(1).copy()
    s.update_view(T0 + STEP)
    img_t1 = s.render(1).copy()
    assert not s.last_flip_hit

    # flip back: must be a cache hit and reproduce the t0 frame bit-exact
    s.update_view(T0)
    assert s.last_flip_hit
    assert s.dt_local == T0
    np.testing.assert_array_equal(s.render(1), img_t0)

    # and forward again: ping-pong — the outgoing step was re-cached
    s.update_view(T0 + STEP)
    assert s.last_flip_hit
    np.testing.assert_array_equal(s.render(1), img_t1)


def test_flip_step_dispatches_nothing(maps, monkeypatch):
    s = _scene(maps)
    s.render(1)
    s.update_view(T0 + STEP)
    s.render(1)

    counts = _counted(monkeypatch)
    s.update_view(T0)
    assert s.last_flip_hit
    s.render(1)
    assert counts == {"rays": 0, "scan": 0, "scan_bounce": 0}, counts


def test_flip_miss_beyond_depth_renders_correctly(maps):
    """The cache is one deep: Q Q (two steps back) misses on the second
    step, which must render the correct frame from scratch."""
    s = _scene(maps)
    s.render(1)
    for k in (1, 2, 3):
        s.update_view(T0 + k * STEP)
        s.render(1)
    s.update_view(T0 + 2 * STEP)           # flip: hit (t2 resident)
    assert s.last_flip_hit
    s.render(1)
    s.update_view(T0 + 1 * STEP)           # second step back: miss
    assert not s.last_flip_hit
    img = s.render(1)

    fresh = _scene(maps)
    fresh.update_view(T0 + 1 * STEP)
    d = np.abs(img.astype(np.float32)
               - fresh.render(1).astype(np.float32))
    assert d.max() <= 1.0, d.max()


def test_flip_cache_invalidated_by_state_change(maps):
    """Brightness (or any _flip_token field) changing between the
    snapshot and the flip must MISS — restoring would show the old
    brightness — and the miss must render the new state correctly."""
    s = _scene(maps)
    s.render(1)
    s.update_view(T0 + STEP)
    s.render(1)
    s.set_brightness(s.brightness + 20)
    s.render(1)
    s.update_view(T0)                       # flip target resident but stale
    assert not s.last_flip_hit
    img = s.render(1)

    fresh = _scene(maps)
    fresh.set_brightness(s.brightness)
    fresh.update_view(T0)
    d = np.abs(img.astype(np.float32)
               - fresh.render(1).astype(np.float32))
    assert d.max() <= 1.0, d.max()


def test_flip_hit_then_continue_same_direction(maps):
    """After a flip hit the scene must keep stepping correctly in the new
    direction (the restored caches drive the next real step)."""
    s = _scene(maps)
    s.render(1)
    s.update_view(T0 + STEP)
    s.render(1)
    s.update_view(T0)                       # hit
    assert s.last_flip_hit
    s.render(1)
    s.update_view(T0 - STEP)                # continue backward: real step
    assert not s.last_flip_hit
    img = s.render(1)

    fresh = _scene(maps)
    fresh.update_view(T0 - STEP)
    d = np.abs(img.astype(np.float32)
               - fresh.render(1).astype(np.float32))
    assert d.max() <= 1.0, d.max()


def test_flip_cache_with_shadows_off(maps):
    """Shadows-off scenes never clear _shadow_dirty; the snapshot
    eligibility must not require it (round-4 implementation note)."""
    s = _scene(maps)
    s.set_shadows(False)
    img_t0 = s.render(1).copy()
    s.update_view(T0 + STEP)
    s.render(1)
    s.update_view(T0)
    assert s.last_flip_hit
    np.testing.assert_array_equal(s.render(1), img_t0)


def test_mesh_flip_hit_zero_programs(maps, monkeypatch):
    """Mesh mode shares the machinery: a flip dispatches no sharded
    programs and reproduces the resident frame."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    import moonrtx_tpu.parallel as par

    s = _scene(maps, devices=8)
    img_t0 = s.render(1).copy()
    s.update_view(T0 + STEP)
    s.render(1)

    counts = {"pose": 0, "timestep": 0, "accum": 0, "scan": 0}
    for key, attr in (("pose", "render_pose_sharded"),
                      ("timestep", "render_timestep_sharded"),
                      ("accum", "render_accumulate_sharded"),
                      ("scan", "build_shadow_map_sharded")):
        real = getattr(par, attr)

        def w(*a, _r=real, _k=key, **kw):
            counts[_k] += 1
            return _r(*a, **kw)
        monkeypatch.setattr(par, attr, w)

    s.update_view(T0)
    assert s.last_flip_hit
    img = s.render(1)
    assert counts == {"pose": 0, "timestep": 0, "accum": 0, "scan": 0}, counts
    np.testing.assert_array_equal(img, img_t0)


def test_session_mixed_pattern_hits(maps):
    """The bench's W W W Q W Q Q W scrub through the Session key path:
    flip cache + adaptive speculation together must cover >= 75% of the
    steps (round-3 verdict acceptance: mixed hit rate >= 0.75). Runs on
    the virtual mesh — speculation needs the burst pipeline (pallas or
    mesh), which single-device CPU scenes fall back from."""
    import jax

    from moonrtx_tpu.app.session import Session

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    s = _scene(maps, devices=8)
    sess = Session(s, [])
    sess.frame()
    hits = 0
    pattern = "WWWQWQQW"
    for key in pattern:
        sess.handle_key(key.lower())
        hits += s.last_flip_hit or s._prefetch is not None
        sess.frame()
    assert hits >= 6, (hits, len(pattern))


def test_session_backward_scrub_covered(maps):
    """Flip-aware speculation (round-5 verdict item 3): a direction flip
    lands as a flip-cache hit (device idle), which arms speculation in
    the NEW direction immediately — so a backward run (Q Q ...) after
    forward stepping is covered from its FIRST backward step (flip hit)
    and its second onward (prefetch hits), not from the third as under
    the two-same-direction gate alone. QQWQQ must be fully covered."""
    import jax

    from moonrtx_tpu.app.session import Session

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    s = _scene(maps, devices=8)
    sess = Session(s, [])
    sess.frame()
    for key in "WWW":                     # warm forward; arms speculation
        sess.handle_key(key.lower())
        sess.frame()
    hits = []
    for key in "QQWQQ":
        sess.handle_key(key.lower())
        hits.append(bool(s.last_flip_hit or s._prefetch is not None))
        sess.frame()
    assert all(hits), hits


def test_session_mixed_pattern_full_coverage(maps):
    """With the flip cache AND flip-aware speculation, the bench's dense
    W W W Q W Q Q W scrub has no uncovered steps at all."""
    import jax

    from moonrtx_tpu.app.session import Session

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    s = _scene(maps, devices=8)
    sess = Session(s, [])
    sess.frame()
    for key in "WW":                # warm-up: arms + dispatches speculation
        sess.handle_key(key.lower())
        sess.frame()
    hits = 0
    pattern = "WWWQWQQW"
    for key in pattern:
        sess.handle_key(key.lower())
        hits += s.last_flip_hit or s._prefetch is not None
        sess.frame()
    assert hits == len(pattern), (hits, len(pattern))
