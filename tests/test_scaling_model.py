"""Pins the docs/SCALING.md ICI-volume model: the collectives each mesh
program traces, and their operand sizes, must match the closed-form
byte formulas (so real-hardware validation is plug-in-numbers).

Collectives are recorded at trace time by wrapping jax.lax.all_gather /
psum_scatter; jax.clear_caches() forces a fresh trace per case."""

from datetime import datetime, timezone

import jax
import numpy as np
import pytest

from moonrtx_tpu.config import RenderConfig
from moonrtx_tpu.data.synth import synthesize_moon
from moonrtx_tpu.engine import blocked
from moonrtx_tpu.engine.scene import MoonScene
from moonrtx_tpu.types import Observer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the virtual 8-device mesh")


def _cfg(**kw):
    base = dict(
        observer=Observer(50.06, 19.94, 219),
        dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
        width=128, height=128, shadow_accuracy=2, devices=8,
    )
    base.update(kw)
    return RenderConfig(**base).validate()


@pytest.fixture
def recorded(monkeypatch):
    """Record (collective, operand bytes) at trace time."""
    calls = []
    real_ag = jax.lax.all_gather
    real_ps = jax.lax.psum_scatter

    def ag(x, *a, **k):
        jax.tree_util.tree_map(
            lambda v: calls.append(("all_gather",
                                    int(np.prod(v.shape)) * v.dtype.itemsize)),
            x)
        return real_ag(x, *a, **k)

    def ps(x, *a, **k):
        jax.tree_util.tree_map(
            lambda v: calls.append(("psum_scatter",
                                    int(np.prod(v.shape)) * v.dtype.itemsize)),
            x)
        return real_ps(x, *a, **k)

    monkeypatch.setattr(jax.lax, "all_gather", ag)
    monkeypatch.setattr(jax.lax, "psum_scatter", ps)
    jax.clear_caches()  # force fresh traces so the wrappers run
    yield calls
    jax.clear_caches()  # drop programs traced through the wrappers


@pytest.fixture(scope="module")
def maps():
    elev, albedo = synthesize_moon(360, 720, seed=11, n_craters=100)
    rs = float(elev.max())
    return (elev / rs).astype(np.float32), rs, albedo


def test_scan_gather_bytes_match_formula(maps, recorded):
    """Shadow scan + bounce aux: 3 all_gathers of
    (n_theta, n_phi/n_dev) wedges each — total moved equals the
    replicated map bytes (SCALING.md row 2)."""
    from moonrtx_tpu.ops import shadow_scan

    elev, rs, albedo = maps
    s = MoonScene(_cfg(), elev, rs, albedo, None)
    s.shadows_on = True
    s.update_view()
    s.shadow_args()

    ncs, nf, nphi = shadow_scan._resolution(s.shadow_accuracy)
    n_dev = 8
    wedge_bytes = (ncs + nf) * (nphi // n_dev) * 4
    gathers = [b for kind, b in recorded if kind == "all_gather"]
    assert len(gathers) == 3, recorded  # factor, heights, albedo-lum
    assert all(b == wedge_bytes for b in gathers), (gathers, wedge_bytes)
    assert not [b for kind, b in recorded if kind == "psum_scatter"]


def test_replicated_pose_step_has_no_collectives(maps, recorded):
    """Pose program and cached re-accumulation on replicated maps: strips
    render locally, zero collectives (SCALING.md rows 3/6/7)."""
    elev, rs, albedo = maps
    s = MoonScene(_cfg(indirect_light=False, shadow_accuracy=1),
                  elev, rs, albedo, None)
    s.shadows_on = False
    s.update_view()
    s.render(1)              # pose program
    s.set_brightness(s.brightness + 10)
    s.render(1)              # cached accumulate burst
    assert recorded == [], recorded


def test_banded_pose_psum_scatter_matches_window_formula(recorded,
                                                         monkeypatch):
    """Banded (hfshard) pose: ONE reduce-scatter assembling the strip
    window caches — hwin + hmean + awin bytes exactly (SCALING.md row 4);
    subsequent cached steps add no further scatters."""
    # shrink the scan working-set cap so the small test map's fine levels
    # are banding candidates (same trick as test_hfshard's policy tests)
    monkeypatch.setattr("moonrtx_tpu.engine.scene.SHADOW_MAX_TEXELS", 65536)
    elev, albedo = synthesize_moon(512, 1024, seed=7, n_craters=120)
    rs = float(elev.max())
    elev = (elev / rs).astype(np.float32)
    s = MoonScene(_cfg(hbm_budget_gb=1e-6, quantize="i16",
                       indirect_light=False, shadow_accuracy=1),
                  elev, rs, albedo, None)
    assert s._band_levels or s._band_alb_levels, "banding must engage"
    s.shadows_on = False
    s.update_view()
    if not s.hf_sharded():
        pytest.skip("render level not banded at this working set")
    s.render(1)

    nblk = (s.height // blocked.BLOCK_H) * (s.width // blocked.BLOCK_W)
    hwin = nblk * blocked.WIN_H * blocked.WIN_W * 4
    hmean = nblk * 4
    awin = nblk * blocked.AWIN_H * (3 * blocked.AWIN_W) * 4
    scatters = [b for kind, b in recorded if kind == "psum_scatter"]
    assert sorted(scatters) == sorted([hwin, hmean, awin]), (
        scatters, (hwin, hmean, awin))

    # a cached re-accumulation must not touch the banded maps again
    n0 = len(recorded)
    s.set_brightness(s.brightness + 10)
    s.render(1)
    assert len(recorded) == n0, recorded[n0:]
