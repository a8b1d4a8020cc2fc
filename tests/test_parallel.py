"""Multi-device sharding on the 8-way virtual CPU mesh (conftest)."""

from datetime import datetime, timezone

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moonrtx_tpu.config import RenderConfig
from moonrtx_tpu.data.mips import pad_lon_wrap
from moonrtx_tpu.data.synth import synthesize_moon
from moonrtx_tpu.engine import blocked
from moonrtx_tpu.engine.camera import camera_basis
from moonrtx_tpu.engine.geometry import latlon_to_unit
from moonrtx_tpu.engine.scene import MoonScene, default_camera
from moonrtx_tpu.parallel import (
    build_shadow_map_sharded,
    make_mesh,
    render_frame_sharded,
)
from moonrtx_tpu.ops import shadow_scan
from moonrtx_tpu.types import Observer


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    elev, albedo = synthesize_moon(360, 720, seed=5, n_craters=150)
    rs = float(elev.max())
    elev = (elev / rs).astype(np.float32)
    cfg = RenderConfig(
        observer=Observer(50.06, 19.94, 219),
        dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
        width=128, height=128,
    ).validate()
    scene = MoonScene(cfg, elev, rs, albedo, None)
    scene.shadows_on = False
    scene.update_view()
    return scene


def test_sharded_frame_matches_single_device(setup):
    scene = setup
    mesh = make_mesh(8)
    level = scene.mip_level()
    h, w = scene.mip_shapes[level]
    alevel = min(level + blocked.ALB_DOWN, len(scene.albedo_mips) - 1)
    ah, aw = scene.mip_shapes[alevel]
    nlevel = min(level + 1, len(scene.mips) - 1)
    nalevel = min(alevel + 1, len(scene.albedo_mips) - 1)
    rgb, hitbuf = render_frame_sharded(
        mesh, scene.mips[level], scene.mips[nlevel],
        scene.albedo_mips[alevel], scene.albedo_mips[nalevel], scene.maxmap,
        scene.basis(), scene._fp, jnp.zeros(2, jnp.float32),
        scene.height, scene.width, h, w, ah, aw, scene.h_min)
    rgb = np.asarray(rgb)
    assert rgb.shape == (128, 128, 3)

    # single-device render of the same frame through the scene path
    img_single = np.asarray(scene.render_accumulation_frame())
    diff = np.abs(rgb - img_single)
    assert np.percentile(diff, 99) < 0.02
    # hit buffer center must agree
    assert np.allclose(np.asarray(hitbuf)[64, 64],
                       np.asarray(scene._hitbuf)[64, 64], atol=1e-3)


def test_sharded_shadow_map_matches_single(setup):
    scene = setup
    mesh = make_mesh(8)
    level = scene.mip_level()
    tex = scene.mips[level]
    h, w = scene.mip_shapes[level]
    sun = jnp.asarray(latlon_to_unit(5.0, -60.0), jnp.float32)

    smap_single, params = shadow_scan.build_shadow_map(tex, h, w, sun,
                                                       0.00465, accuracy=2)
    z = sun / jnp.linalg.norm(sun)
    basis = jnp.stack([params.axis_x, params.axis_y, params.axis_z])
    n_phi = smap_single.shape[1] - shadow_scan.PHI_PAD
    smap_sharded, bounce_none = build_shadow_map_sharded(
        mesh, tex, basis, jnp.float32(0.00465), h, w,
        int(params.n_coarse), int(params.n_fine), n_phi)
    assert bounce_none is None
    # PHI_PAD wrap convention matches the single-device map exactly
    assert smap_sharded.shape == smap_single.shape
    d = np.abs(np.asarray(smap_sharded) - np.asarray(smap_single))
    # wedge block boundaries differ from the full-grid ones, so the few
    # clamped subsolar-pole blocks (factor ~1 region) may resolve differently
    assert d.mean() < 1e-4
    assert np.percentile(d, 99.5) < 1e-5


def test_sharded_pallas_burst_matches_single_device(setup):
    """The FLAGSHIP (fused Pallas) path sharded over the mesh — windows,
    pack and kernel all inside shard_map — must match the single-device
    pallas frame (interpret mode on the virtual CPU mesh)."""
    from moonrtx_tpu.parallel import render_burst_pallas_sharded

    scene = setup
    mesh = make_mesh(8)
    level = scene.mip_level()
    h, w = scene.mip_shapes[level]
    alevel = scene.albedo_level(level)
    ah, aw = scene.mip_shapes[alevel]
    nlevel = min(level + 1, len(scene.mips) - 1)
    nalevel = min(alevel + 1, len(scene.albedo_mips) - 1)
    jitters = jnp.zeros((1, 2), jnp.float32)
    rgb_sh, hit_sh = render_burst_pallas_sharded(
        mesh, scene.mips[level], scene.mips[nlevel],
        scene.albedo_mips[alevel], scene.albedo_mips[nalevel], scene.maxmap,
        scene.basis(), scene._fp, jitters,
        scene.height, scene.width, h, w, ah, aw, scene.h_min,
        n_samples=1, use_shadow=False, interpret=True)

    geom = blocked.block_rays(scene.basis(), scene._fp.rotation,
                              jnp.zeros(2, jnp.float32),
                              scene.height, scene.width, scene.h_min,
                              maxmap=scene.maxmap)
    scene._ensure_blocked_caches(level, geom)
    out = blocked.render_frame_pallas(
        scene._wincache, scene._origins, geom, None, None,
        None, scene.basis(), scene._fp, scene.height, scene.width, h, w,
        ah=ah, aw=aw, n_coarse=12, use_shadow=False, interpret=True)
    d = np.abs(np.asarray(rgb_sh) - np.asarray(out.rgb))
    # strip-local ray origins and chord bounds differ only at fp rounding;
    # a handful of limb pixels may flip marching steps
    assert np.percentile(d, 99) < 0.02
    assert d.mean() < 1e-3
    hd = np.asarray(hit_sh)[..., 3] > 0
    hs = np.asarray(out.hitbuf)[..., 3] > 0
    assert (hd == hs).mean() > 0.995


def test_sharded_bounce_map_matches_single(setup):
    """Sharded scan with aux gather + replicated bounce pyramid == the
    single-device bounce map."""
    scene = setup
    mesh = make_mesh(8)
    level = scene.mip_level()
    tex = scene.mips[level]
    h, w = scene.mip_shapes[level]
    alb_lum = jnp.mean(scene.albedo_mips[level], axis=2)
    sun = jnp.asarray(latlon_to_unit(5.0, -60.0), jnp.float32)

    smap_single, params, bmap_single = shadow_scan.build_shadow_and_bounce(
        tex, alb_lum, h, w, sun, 0.00465, accuracy=2)
    basis = jnp.stack([params.axis_x, params.axis_y, params.axis_z])
    n_phi = smap_single.shape[1] - shadow_scan.PHI_PAD
    factor_sh, bounce_sh = build_shadow_map_sharded(
        mesh, tex, basis, jnp.float32(0.00465), h, w,
        int(params.n_coarse), int(params.n_fine), n_phi, alb_lum=alb_lum)
    assert bounce_sh.shape == bmap_single.shape
    db = np.abs(np.asarray(bounce_sh) - np.asarray(bmap_single))
    assert db.mean() < 1e-5
    assert np.percentile(db, 99.5) < 1e-4
    df = np.abs(np.asarray(factor_sh) - np.asarray(smap_single))
    assert df.mean() < 1e-4
