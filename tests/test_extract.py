"""DMA window extraction (ops.extract) vs the XLA reference path.

The TPU kernel runs here in Pallas interpret mode (same semantics as the
Mosaic-compiled path); recompaction must be bit-exact."""

import jax.numpy as jnp
import numpy as np

from moonrtx_tpu.ops import sampler
from moonrtx_tpu.ops.extract import extract_windows, extract_windows_tpu


def test_extract_tpu_matches_xla_bitexact():
    rng = np.random.default_rng(0)
    h, w = 160, 300
    tex = jnp.asarray(rng.random((h, w)).astype(np.float32))
    nblk = 37
    wh, ww = 40, 64
    r0 = jnp.asarray(rng.integers(0, h - wh, nblk).astype(np.int32))
    c0 = jnp.asarray(rng.integers(0, w - ww, nblk).astype(np.int32))
    ref = np.asarray(sampler.extract_windows(tex, r0, c0, wh, ww))
    got = np.asarray(extract_windows_tpu(tex, r0, c0, wh, ww,
                                         interpret=True))
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)


def test_extract_tpu_odd_sizes_and_edges():
    rng = np.random.default_rng(1)
    h, w = 53, 131
    tex = jnp.asarray(rng.random((h, w)).astype(np.float32))
    wh, ww = 7, 13
    # include extreme origins (0 and max)
    r0 = jnp.asarray(np.array([0, h - wh, 3, 17], np.int32))
    c0 = jnp.asarray(np.array([0, w - ww, w - ww, 5], np.int32))
    ref = np.asarray(sampler.extract_windows(tex, r0, c0, wh, ww))
    got = np.asarray(extract_windows_tpu(tex, r0, c0, wh, ww,
                                         interpret=True))
    assert np.array_equal(got, ref)


def test_extract_dispatch_falls_back_off_tpu():
    # on the CPU test backend the router must use the XLA path
    rng = np.random.default_rng(2)
    tex = jnp.asarray(rng.random((64, 200)).astype(np.float32))
    r0 = jnp.asarray(np.array([0, 8], np.int32))
    c0 = jnp.asarray(np.array([10, 100], np.int32))
    ref = np.asarray(sampler.extract_windows(tex, r0, c0, 16, 32))
    got = np.asarray(extract_windows(tex, r0, c0, 16, 32))
    assert np.array_equal(got, ref)


def test_extract_quantized_int16_decodes():
    """int16 storage (value = raw*scale+offset): kernel DMA of the raw
    dtype + decode must match decoding the whole map then slicing f32."""
    rng = np.random.default_rng(4)
    h, w = 96, 260
    scale, offset = 1.7e-6, 0.997
    raw = rng.integers(-32767, 32767, (h, w)).astype(np.int16)
    tex = jnp.asarray(raw)
    dec = raw.astype(np.float32) * scale + offset
    wh, ww = 24, 40
    r0 = jnp.asarray(np.array([0, h - wh, 11], np.int32))
    c0 = jnp.asarray(np.array([0, w - ww, 77], np.int32))
    ref = np.asarray(sampler.extract_windows(jnp.asarray(dec), r0, c0, wh, ww))
    got = np.asarray(extract_windows_tpu(tex, r0, c0, wh, ww,
                                         scale=scale, offset=offset,
                                         interpret=True))
    assert got.dtype == np.float32
    assert np.allclose(got, ref, atol=1e-7)
    # XLA fallback router decodes identically
    got2 = np.asarray(extract_windows(tex, r0, c0, wh, ww,
                                      scale=scale, offset=offset))
    assert np.allclose(got2, ref, atol=1e-7)


def test_extract_quantized_uint8_decodes():
    rng = np.random.default_rng(5)
    h, w = 64, 140
    raw = rng.integers(0, 256, (h, w)).astype(np.uint8)
    tex = jnp.asarray(raw)
    dec = raw.astype(np.float32) / 255.0
    wh, ww = 16, 32
    r0 = jnp.asarray(np.array([0, h - wh], np.int32))
    c0 = jnp.asarray(np.array([5, w - ww], np.int32))
    ref = np.asarray(sampler.extract_windows(jnp.asarray(dec), r0, c0, wh, ww))
    got = np.asarray(extract_windows_tpu(tex, r0, c0, wh, ww,
                                         scale=1.0 / 255.0, interpret=True))
    assert np.allclose(got, ref, atol=1e-7)


def test_extract_group_windows_paired_levels():
    """Grouped multi-map extraction (the fused shadow|bounce and pose-cache
    path): per-block level select, shared origins across maps, packed
    row-stacked layout, per-map affine decode, bf16 output cast."""
    from moonrtx_tpu.ops.extract import extract_group_windows_tpu

    rng = np.random.default_rng(7)
    shapes = ((128, 260), (64, 130), (32, 65))
    maps = tuple(
        tuple(jnp.asarray(rng.random((h, w)).astype(np.float32))
              for h, w in shapes)
        for _ in range(2))
    group, nblk, wh, ww = 4, 16, 8, 24
    lvl = jnp.asarray(rng.integers(0, 3, nblk).astype(np.int32))
    r0 = np.zeros(nblk, np.int32)
    c0 = np.zeros(nblk, np.int32)
    for b in range(nblk):
        k = int(lvl[b])
        r0[b] = rng.integers(0, shapes[k][0] - wh)
        c0[b] = rng.integers(0, shapes[k][1] - ww)
    got = np.asarray(extract_group_windows_tpu(
        maps, lvl, jnp.asarray(r0), jnp.asarray(c0), wh, ww,
        scales=(1.0, 2.0), offsets=(0.0, -0.5), group=group,
        interpret=True))
    assert got.shape == (nblk // group, group * wh, 2 * ww)
    flat = got.reshape(nblk // group, group, wh, 2 * ww).reshape(
        nblk, wh, 2 * ww)
    for b in range(nblk):
        k = int(lvl[b])
        for m, (sc, of) in enumerate(((1.0, 0.0), (2.0, -0.5))):
            ref = (np.asarray(maps[m][k])[r0[b]:r0[b] + wh,
                                          c0[b]:c0[b] + ww] * sc + of)
            assert np.allclose(flat[b, :, m * ww:(m + 1) * ww], ref,
                               atol=1e-6), (b, m)


def test_extract_group_windows_bf16_out():
    from moonrtx_tpu.ops.extract import extract_group_windows_tpu

    rng = np.random.default_rng(8)
    tex = jnp.asarray(rng.random((64, 200)).astype(np.float32))
    nblk, wh, ww = 8, 16, 32
    r0 = jnp.asarray(rng.integers(0, 64 - wh, nblk).astype(np.int32))
    c0 = jnp.asarray(rng.integers(0, 200 - ww, nblk).astype(np.int32))
    got = np.asarray(extract_group_windows_tpu(
        ((tex,),), jnp.zeros((nblk,), jnp.int32), r0, c0, wh, ww,
        group=8, out_dtype=jnp.bfloat16, interpret=True))
    assert got.dtype == jnp.bfloat16
    ref = np.asarray(sampler.extract_windows(tex, r0, c0, wh, ww))
    flat = got.astype(np.float32).reshape(1, 8, wh, ww).reshape(
        nblk, wh, ww)
    assert np.allclose(flat, ref, atol=4e-3)


def test_extract_group_windows_uint8_planes():
    """3 uint8 channel planes sharing origins (the pose albedo cache)."""
    from moonrtx_tpu.ops.extract import extract_group_windows_tpu

    rng = np.random.default_rng(9)
    raw = rng.integers(0, 256, (96, 140, 3)).astype(np.uint8)
    planes = tuple((jnp.asarray(raw[:, :, ch]),) for ch in range(3))
    nblk, wh, ww = 8, 8, 16
    r0 = jnp.asarray(rng.integers(0, 96 - wh, nblk).astype(np.int32))
    c0 = jnp.asarray(rng.integers(0, 140 - ww, nblk).astype(np.int32))
    got = np.asarray(extract_group_windows_tpu(
        planes, jnp.zeros((nblk,), jnp.int32), r0, c0, wh, ww,
        scales=(1 / 255.0,) * 3, group=8, interpret=True))
    flat = got.reshape(1, 8, wh, 3 * ww).reshape(nblk, wh, 3 * ww)
    for b in range(nblk):
        for ch in range(3):
            ref = raw[int(r0[b]):int(r0[b]) + wh,
                      int(c0[b]):int(c0[b]) + ww, ch] / 255.0
            assert np.allclose(flat[b, :, ch * ww:(ch + 1) * ww], ref,
                               atol=1e-6)


def test_extract_level_windows_matches_blend():
    """In-kernel per-block level selection == the XLA per-level blend."""
    from moonrtx_tpu.ops.extract import extract_level_windows_tpu

    rng = np.random.default_rng(3)
    levels = tuple(jnp.asarray(rng.random((h, w)).astype(np.float32))
                   for h, w in ((128, 260), (64, 130), (32, 65)))
    nblk, wh, ww = 23, 16, 24
    lvl = jnp.asarray(rng.integers(0, 3, nblk).astype(np.int32))
    r0 = np.zeros(nblk, np.int32)
    c0 = np.zeros(nblk, np.int32)
    for b in range(nblk):
        k = int(lvl[b])
        r0[b] = rng.integers(0, levels[k].shape[0] - wh)
        c0[b] = rng.integers(0, levels[k].shape[1] - ww)
    r0, c0 = jnp.asarray(r0), jnp.asarray(c0)
    got = np.asarray(extract_level_windows_tpu(levels, lvl, r0, c0, wh, ww,
                                               interpret=True))
    for b in range(nblk):
        k = int(lvl[b])
        ref = np.asarray(levels[k])[int(r0[b]):int(r0[b]) + wh,
                                    int(c0[b]):int(c0[b]) + ww]
        assert np.array_equal(got[b], ref), b


def test_scan_resample_grouped_matches_fallback(monkeypatch):
    """shadow_scan._resample_heights_blocked: fused resample kernel
    (forced on, interpret mode) == ungrouped XLA window path. Both sides
    run bf16 MXU mixes on mean-centered residuals, but with different
    centerings/orderings, so the comparison is tolerance-based at the
    bf16 residual scale."""
    import moonrtx_tpu.ops.extract as extract_ops
    from moonrtx_tpu.ops import shadow_scan

    rng = np.random.default_rng(11)
    h, w = 128, 256
    # height-like smooth field (random windows would be dominated by the
    # deliberate footprint clamping, not the sampling math)
    yy, xx = np.mgrid[0:h, 0:w + 4].astype(np.float32)
    base = (1.0 + 0.01 * np.sin(yy / 7.0) * np.cos(xx / 11.0)
            + 0.002 * rng.standard_normal((h, w + 4))).astype(np.float32)
    tex = jnp.asarray(base)
    n_theta, n_phi = 32, 256
    row = jnp.asarray(
        rng.uniform(0, h - 1, (n_theta, n_phi)).astype(np.float32))
    col = jnp.asarray(
        rng.uniform(0, w - 1, (n_theta, n_phi)).astype(np.float32))
    ref = np.asarray(shadow_scan._resample_heights_blocked(
        tex, h, w, row, col))
    orig = extract_ops.resample_group_windows_tpu
    monkeypatch.setattr(extract_ops, "_fast_ok", lambda: True)
    monkeypatch.setattr(
        extract_ops, "resample_group_windows_tpu",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    got = np.asarray(shadow_scan._resample_heights_blocked(
        tex, h, w, row, col))
    assert np.abs(got - ref).max() < 4e-3
    assert np.abs(got - ref).mean() < 2e-4


def test_resample_group_windows_kernel_exact_cases():
    """The fused resample kernel against an exact f32 reference on
    single-level windows: integer coordinates must be near-exact
    (one-hot rows), fractional ones within the bf16 residual budget;
    int16 inputs decode through scale/offset."""
    from moonrtx_tpu.ops.extract import resample_group_windows_tpu
    from moonrtx_tpu.ops import sampler

    rng = np.random.default_rng(3)
    h, w = 96, 512
    wh, ww = 24, 72
    nblk, b = 16, 128
    base = (1.0 + 0.05 * rng.standard_normal((h, w))).astype(np.float32)
    tex = jnp.asarray(base)
    r0 = jnp.asarray(rng.integers(0, h - wh, nblk), jnp.int32)
    c0 = jnp.asarray(rng.integers(0, w - ww, nblk), jnp.int32)
    lvl = jnp.zeros(nblk, jnp.int32)
    wy = jnp.asarray(rng.uniform(0, wh - 1.01, (nblk, b)), jnp.float32)
    wx = jnp.asarray(rng.uniform(0, ww - 1.01, (nblk, b)), jnp.float32)

    wins = np.stack([base[int(r0[k]):int(r0[k]) + wh,
                          int(c0[k]):int(c0[k]) + ww] for k in range(nblk)])
    ref = np.asarray(sampler.window_bilinear(jnp.asarray(wins), wy, wx))

    got = np.asarray(resample_group_windows_tpu(
        (tex,), lvl, r0, c0, wy, wx, wh, ww, group=8, interpret=True))
    assert np.abs(got - ref).max() < 4e-3

    # integer coords: weights are one-hot, residual path is exact in bf16
    wyi = jnp.floor(wy)
    wxi = jnp.floor(wx)
    got_i = np.asarray(resample_group_windows_tpu(
        (tex,), lvl, r0, c0, wyi, wxi, wh, ww, group=8, interpret=True))
    ref_i = np.asarray(sampler.window_bilinear(jnp.asarray(wins), wyi, wxi))
    assert np.abs(got_i - ref_i).max() < 1e-3

    # quantized int16 with affine decode
    scale, offset = 2.5e-5, 0.9
    raw = np.clip((base - offset) / scale, -32768, 32767).astype(np.int16)
    got_q = np.asarray(resample_group_windows_tpu(
        (jnp.asarray(raw),), lvl, r0, c0, wy, wx, wh, ww,
        scale=scale, offset=offset, group=8, interpret=True))
    wins_q = np.stack([
        (raw[int(r0[k]):int(r0[k]) + wh,
             int(c0[k]):int(c0[k]) + ww].astype(np.float32) * scale
         + offset) for k in range(nblk)])
    ref_q = np.asarray(sampler.window_bilinear(jnp.asarray(wins_q), wy, wx))
    assert np.abs(got_q - ref_q).max() < 4e-3
