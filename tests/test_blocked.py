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
    diff = np.abs(img_b - img_r)
    assert np.percentile(diff, 99) <= 1.0
    assert diff.mean() < 0.5


def test_hitbuffers_match(scenes):
    hb = scenes["blocked"].get_hit_at(96, 72)
    hr = scenes["reference"].get_hit_at(96, 72)
    assert hb[3] > 0 and hr[3] > 0
    for a, b in zip(hb, hr):
        assert a == pytest.approx(b, abs=2e-3)


def test_block_layout_round_trip():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((24, 48, 3)).astype(np.float32))
    back = blocked.from_blocks(blocked.to_blocks(img), 24, 48)
    assert np.array_equal(np.asarray(back), np.asarray(img))


def test_window_centering_is_exact(scenes):
    """sample(win) == sample(win - mean) + mean must hold to fp32 eps."""
    s = scenes["blocked"]
    cache = s._wincache
    # reconstruct raw window values at integer coords and compare
    hw = np.asarray(cache.hwin) + np.asarray(cache.hmean)[..., None]
    level = s._cache_level
    mip = np.asarray(s.mips[level])
    r0 = np.asarray(s._origins.r0)
    c0 = np.asarray(s._origins.c0)
    b = hw.shape[0] // 2
    win_direct = mip[r0[b]:r0[b] + blocked.WIN_H, c0[b]:c0[b] + blocked.WIN_W]
    assert np.allclose(hw[b], win_direct, atol=1e-6)
