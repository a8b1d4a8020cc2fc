"""Fast per-block window extraction.

The blocked backend's caches are thousands of small windows
``tex[r0[b]:r0[b]+wh, c0[b]:c0[b]+ww]`` gathered from HBM-resident maps.
The straightforward XLA formulation (vmapped ``dynamic_slice``,
sampler.extract_windows) lowers to a gather and crawls on TPU: measured
~0.6 GB/s (275 ms for one 1080p pose's height windows) — the dominant
cost of every pose change and time step.

TPU-native replacement, one Pallas program per block, no gathers and no
HBM intermediates:

1. **Aligned DMA fetch**: HBM arrays are tile-aligned ((8, 128) for f32,
   (16, 128) for 16-bit, (32, 128) for 8-bit types) and the DMA engine
   copies tile-aligned slabs at full bandwidth, so the program copies the
   aligned *superwindow* ``tex[ra:ra+SH, ca:ca+SW]`` (``ra/ca`` rounded
   down to the dtype's tile; SH/SW statically rounded up to cover any
   in-tile offset) into VMEM scratch, origins scalar-prefetched.
2. **In-VMEM one-hot recompaction**: the exact (wh, ww) window is cut
   from the superwindow by two small MXU contractions against one-hot
   shift matrices built from iota — selection rows have exactly one 1.0,
   so the result is bit-exact at a precision matched to the data's
   mantissa width (_mix_mode: one bf16 pass for bf16/uint8, bf16_3x for
   int16, HIGHEST for f32; verified against sampler.extract_windows in
   tests). Same "gather = one-hot matmul" move as the render sampler
   (ops/sampler.py), but VMEM-resident.
3. **Per-block mip-level select** (extract_level_windows): blocks carry a
   stride level q = 2^k (engine/blocked.py); a guarded DMA per level
   fetches each block's window from its own level in ONE pass over the
   block list — the XLA path extracted every block at every level and
   blended afterwards.

**Quantized storage**: maps may live in HBM as int16 or uint8 with an
affine decode ``value = raw * scale + offset`` (the full-resolution LOLA
LDEM is 4.2 Gtexels — 17 GB as f32 level 0, 2.1 GB as int16, reference
main.py:25-29). The kernel DMAs the raw dtype, converts in VMEM, and the
decode affine is applied to the recompacted f32 windows (one-hot rows sum
to 1, so decode commutes with the selection exactly). Windows always come
back as decoded float32.

Off TPU the module falls back to sampler.extract_windows (identical
semantics); tests exercise the kernel in Pallas interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moonrtx_tpu.ops import sampler

COL_TILE = 128


def _row_tile(dtype) -> int:
    """TPU sublane tile for a dtype: (8,128) f32, (16,128) 16-bit,
    (32,128) 8-bit."""
    return 8 * (4 // jnp.dtype(dtype).itemsize)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_level(lvl, sh: int, sw: int, row_tile: int):
    """Pad a pyramid level so any aligned superwindow is in range (dense
    copy at HBM bandwidth; keeps callers free of padding contracts).

    Pre-tiling CANNOT elide this copy as-is: origin clamps downstream
    use the level's (padded) shape, so the margin requirement chases any
    pre-pad — eliding it would need the LOGICAL shape threaded through
    every origin clamp. The round-5 amortized A/B therefore measured the
    pad's raw cost instead (tools/ab_amortized.py "pad copy"): it is
    bandwidth-bound and negligible at shadow-path shapes; see PERF.md
    for the pose-path extrapolation and verdict."""
    h, w = lvl.shape
    hp = _round_up(max(h, sh), row_tile) + row_tile
    wp = _round_up(max(w, sw), COL_TILE) + COL_TILE
    return jnp.pad(lvl, ((0, hp - h), (0, wp - w)))


def _mix_mode(dtype) -> str:
    """MXU strategy for EXACT one-hot recompaction of this data dtype.

    Every output element of a one-hot contraction is a single product
    ``1.0 * v`` accumulated in f32, so the MXU pass count only has to
    reproduce v's mantissa, not full f32 dot semantics:

    - "bf16" (bf16 / uint8 data, <= 8 significant bits): one DEFAULT
      bf16 pass is exact — 6x fewer MXU passes than HIGHEST;
    - "split16" (int16 data, <= 16 significant bits): v = hi + lo with
      both halves exact bf16; two DEFAULT passes (hi*1 + lo*1) rebuild v
      exactly (Mosaic rejects Precision.HIGH, so the split is manual);
    - "f32": full-mantissa HIGHEST as before.
    """
    d = jnp.dtype(dtype)
    if d == jnp.bfloat16 or d.itemsize == 1:
        return "bf16"
    if d == jnp.int16:
        return "split16"
    return "f32"


def _onehot_select(a, one, mode: str):
    """Contract dim 0 of ``a`` against an f32 one-hot matrix, exactly,
    with the cheapest MXU pass count for the data width (_mix_mode)."""
    dims = (((0,), (0,)), ((), ()))
    if mode == "bf16":
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), one.astype(jnp.bfloat16), dims,
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
    if mode == "split16":
        a = a.astype(jnp.float32)
        hi = a.astype(jnp.bfloat16)
        lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        ob = one.astype(jnp.bfloat16)
        return (jax.lax.dot_general(
                    hi, ob, dims, precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    lo, ob, dims, precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32))
    return jax.lax.dot_general(
        a.astype(jnp.float32), one, dims,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _make_kernel(n_levels: int, wh: int, ww: int, sh: int, sw: int,
                 row_tile: int):
    def kernel(ra_ref, ca_ref, offr_ref, offc_ref, lvl_ref, *refs):
        # refs: n_levels ANY tex refs, out_ref, scratch, sem
        texs = refs[:n_levels]
        out_ref = refs[n_levels]
        scratch = refs[n_levels + 1]
        sem = refs[n_levels + 2]
        i = pl.program_id(0)
        ra = pl.multiple_of(ra_ref[i], row_tile)
        ca = pl.multiple_of(ca_ref[i], COL_TILE)
        for k in range(n_levels):
            @pl.when(lvl_ref[i] == k)
            def _(k=k):
                cp = pltpu.make_async_copy(
                    texs[k].at[pl.ds(ra, sh), pl.ds(ca, sw)], scratch, sem)
                cp.start()
                cp.wait()

        # in-VMEM one-hot recompaction (bit-exact at the dtype's matched
        # MXU pass count, see _mix_mode)
        offr = offr_ref[i]
        offc = offc_ref[i]
        mode = _mix_mode(scratch.dtype)
        jr = jax.lax.broadcasted_iota(jnp.int32, (sh, wh), 0)
        ir = jax.lax.broadcasted_iota(jnp.int32, (sh, wh), 1)
        rone = jnp.where(jr == offr + ir, 1.0, 0.0).astype(jnp.float32)
        slab = scratch[...]
        if slab.dtype == jnp.uint8:
            # Mosaic has no uint8->f32 lowering; hop through int16
            slab = slab.astype(jnp.int16)
        if slab.dtype == jnp.int16:
            slab = slab.astype(jnp.float32)
        mix = _onehot_select(slab, rone, mode)           # (sw, wh)
        jc = jax.lax.broadcasted_iota(jnp.int32, (sw, ww), 0)
        ic = jax.lax.broadcasted_iota(jnp.int32, (sw, ww), 1)
        cone = jnp.where(jc == offc + ic, 1.0, 0.0).astype(jnp.float32)
        # mix holds exact one-term sums of data-width values, so the
        # second selection runs at the same reduced pass count
        out = _onehot_select(mix, cone, mode)            # (wh, ww)
        out_ref[0] = out

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("wh", "ww", "scale", "offset", "interpret"))
def _extract_impl(levels, lvl_idx, r0, c0, wh: int, ww: int,
                  scale: float = 1.0, offset: float = 0.0,
                  interpret: bool = False):
    n_levels = len(levels)
    nblk = r0.shape[0]
    row_tile = _row_tile(levels[0].dtype)
    sh = _round_up(wh + row_tile - 1, row_tile)
    sw = _round_up(ww + COL_TILE - 1, COL_TILE)
    # pad every level so any aligned superwindow is in range (dense copy
    # at HBM bandwidth; keeps callers free of padding contracts)
    padded = [_pad_level(lvl, sh, sw, row_tile) for lvl in levels]

    r0 = r0.astype(jnp.int32)
    c0 = c0.astype(jnp.int32)
    ra = (r0 // row_tile) * row_tile
    ca = (c0 // COL_TILE) * COL_TILE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_levels,
        out_specs=pl.BlockSpec((1, wh, ww), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((sh, sw), levels[0].dtype),
                        pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _make_kernel(n_levels, wh, ww, sh, sw, row_tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk, wh, ww), jnp.float32),
        interpret=interpret,
    )(ra, ca, r0 - ra, c0 - ca, lvl_idx.astype(jnp.int32), *padded)
    return decode_affine(out, scale, offset)


def decode_affine(raw, scale: float, offset: float):
    """value = raw * scale + offset in f32 (identity skipped at trace)."""
    out = raw if raw.dtype == jnp.float32 else raw.astype(jnp.float32)
    if scale != 1.0:
        out = out * jnp.float32(scale)
    if offset != 0.0:
        out = out + jnp.float32(offset)
    return out


def extract_windows_tpu(tex, r0, c0, wh: int, ww: int,
                        scale: float = 1.0, offset: float = 0.0,
                        interpret: bool = False):
    """Drop-in fast path for sampler.extract_windows on one 2-D map.

    r0/c0: (NBLK,) pre-clamped to [0, H-wh] x [0, W-ww] like the XLA
    path. Returns decoded float32 windows; bit-exact with
    sampler.extract_windows for f32 input.
    """
    lvl = jnp.zeros(r0.shape, jnp.int32)
    return _extract_impl((tex,), lvl, r0, c0, wh, ww,
                         scale=scale, offset=offset, interpret=interpret)


def extract_level_windows_tpu(levels, lvl_idx, r0, c0, wh: int, ww: int,
                              scale: float = 1.0, offset: float = 0.0,
                              interpret: bool = False):
    """Per-block windows from levels[lvl_idx[b]] in one pass.

    r0/c0 are in each block's OWN level coordinates, pre-clamped to that
    level's bounds (engine/blocked.py window_origins does this). Returns
    decoded float32.
    """
    return _extract_impl(tuple(levels), lvl_idx, r0, c0, wh, ww,
                         scale=scale, offset=offset, interpret=interpret)


def _make_group_kernel(n_levels: int, n_maps: int, wh: int, ww: int,
                       sh: int, sw: int, row_tile: int, group: int,
                       scales, offsets, out_dtype):
    def kernel(ra_ref, ca_ref, offr_ref, offc_ref, lvl_ref, *refs):
        # refs: n_maps*n_levels ANY tex refs, out_ref, scratch, sem array
        texs = refs[:n_maps * n_levels]
        out_ref = refs[n_maps * n_levels]
        scratch = refs[n_maps * n_levels + 1]
        sems = refs[n_maps * n_levels + 2]
        pid = pl.program_id(0)

        # issue ALL group*n_maps DMAs before waiting on any: per-copy
        # latency overlaps instead of serializing per grid iteration (the
        # one-block-per-program kernel above spends most of its time in
        # start->wait round trips)
        for g in range(group):
            i = pid * group + g
            ra = pl.multiple_of(ra_ref[i], row_tile)
            ca = pl.multiple_of(ca_ref[i], COL_TILE)
            for k in range(n_levels):
                @pl.when(lvl_ref[i] == k)
                def _(k=k, g=g, ra=ra, ca=ca):
                    for m in range(n_maps):
                        pltpu.make_async_copy(
                            texs[m * n_levels + k].at[pl.ds(ra, sh),
                                                      pl.ds(ca, sw)],
                            scratch.at[m * group + g],
                            sems.at[m * group + g]).start()
        for g in range(group):
            i = pid * group + g
            ra = pl.multiple_of(ra_ref[i], row_tile)
            ca = pl.multiple_of(ca_ref[i], COL_TILE)
            for m in range(n_maps):
                # wait descriptor: same dst/sem (and byte count) as the
                # one copy that fired for this (g, m); source level is
                # irrelevant to the wait
                pltpu.make_async_copy(
                    texs[m * n_levels].at[pl.ds(ra, sh), pl.ds(ca, sw)],
                    scratch.at[m * group + g],
                    sems.at[m * group + g]).wait()

        for g in range(group):
            i = pid * group + g
            offr = offr_ref[i]
            offc = offc_ref[i]
            mode = _mix_mode(scratch.dtype)
            jr = jax.lax.broadcasted_iota(jnp.int32, (sh, wh), 0)
            ir = jax.lax.broadcasted_iota(jnp.int32, (sh, wh), 1)
            rone = jnp.where(jr == offr + ir, 1.0, 0.0).astype(jnp.float32)
            jc = jax.lax.broadcasted_iota(jnp.int32, (sw, ww), 0)
            ic = jax.lax.broadcasted_iota(jnp.int32, (sw, ww), 1)
            cone = jnp.where(jc == offc + ic, 1.0, 0.0).astype(jnp.float32)
            outs = []
            for m in range(n_maps):
                slab = scratch[m * group + g]
                if slab.dtype == jnp.uint8:
                    slab = slab.astype(jnp.int16)
                if slab.dtype == jnp.int16:
                    slab = slab.astype(jnp.float32)
                mix = _onehot_select(slab, rone, mode)       # (sw, wh)
                # mix holds exact one-term sums of data-width values: the
                # second selection runs at the same reduced pass count
                out = _onehot_select(mix, cone, mode)        # (wh, ww)
                if scales[m] != 1.0:
                    out = out * jnp.float32(scales[m])
                if offsets[m] != 0.0:
                    out = out + jnp.float32(offsets[m])
                outs.append(out.astype(out_dtype))
            # one full-lane-extent store per block (lane-offset stores are
            # a Mosaic relayout hazard)
            row = outs[0] if n_maps == 1 else jnp.concatenate(outs, axis=1)
            out_ref[0, pl.ds(g * wh, wh), :] = row

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "wh", "ww", "scales", "offsets", "group", "out_dtype", "interpret"))
def _extract_group_impl(map_levels, lvl_idx, r0, c0, wh: int, ww: int,
                        scales, offsets, group: int, out_dtype,
                        interpret: bool = False):
    n_maps = len(map_levels)
    n_levels = len(map_levels[0])
    nblk = r0.shape[0]
    if nblk % group:
        # the grid would silently truncate the block list (round-5
        # harness finding: 1080p's 16200 blocks are not divisible by 32)
        raise ValueError(f"nblk {nblk} not divisible by group {group}")
    dtype = map_levels[0][0].dtype
    row_tile = _row_tile(dtype)
    sh = _round_up(wh + row_tile - 1, row_tile)
    sw = _round_up(ww + COL_TILE - 1, COL_TILE)
    padded = [_pad_level(lvl, sh, sw, row_tile)
              for levels in map_levels for lvl in levels]

    r0 = r0.astype(jnp.int32)
    c0 = c0.astype(jnp.int32)
    ra = (r0 // row_tile) * row_tile
    ca = (c0 // COL_TILE) * COL_TILE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nblk // group,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (n_maps * n_levels),
        out_specs=pl.BlockSpec((1, group * wh, n_maps * ww),
                               lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((n_maps * group, sh, sw), dtype),
                        pltpu.SemaphoreType.DMA((n_maps * group,))],
    )
    out = pl.pallas_call(
        _make_group_kernel(n_levels, n_maps, wh, ww, sh, sw, row_tile,
                           group, scales, offsets, out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (nblk // group, group * wh, n_maps * ww), out_dtype),
        interpret=interpret,
    )(ra, ca, r0 - ra, c0 - ca, lvl_idx.astype(jnp.int32), *padded)
    return out


def extract_group_windows_tpu(map_levels, lvl_idx, r0, c0, wh: int, ww: int,
                              scales=None, offsets=None, group: int = 8,
                              out_dtype=jnp.float32, interpret: bool = False):
    """Grouped multi-map per-block window extraction (the fast path for
    per-time-step shadow|bounce windows and per-pose height/albedo caches).

    map_levels: tuple of maps, each a tuple of n_levels same-dtype 2-D
    pyramid levels; all maps share lvl_idx/r0/c0 (block origins in the
    block's own level coordinates, pre-clamped to [0, H_k-wh]x[0, W_k-ww]).

    Returns (nblk // group, group*wh, n_maps*ww): `group` consecutive
    blocks stacked along rows (the fused render kernel's packed layout —
    group=engine.blocked.GROUP means zero repacking), map m in columns
    [m*ww, (m+1)*ww). Per-map affine decode via scales/offsets; output cast
    to out_dtype (bf16 for the shadow|bounce pack).

    vs extract_level_windows_tpu: one program handles `group` blocks and
    ALL maps, issuing every DMA before the first wait — per-copy latency
    overlaps instead of serializing across nblk grid iterations.
    """
    n_maps = len(map_levels)
    if scales is None:
        scales = (1.0,) * n_maps
    if offsets is None:
        offsets = (0.0,) * n_maps
    return _extract_group_impl(
        tuple(tuple(l) for l in map_levels), lvl_idx, r0, c0, wh, ww,
        tuple(scales), tuple(offsets), group, out_dtype, interpret)


def _fast_ok() -> bool:
    # evaluated per call (cheap at trace time): a process that mixes
    # backends must not pin the first backend it saw forever
    return jax.default_backend() in ("tpu", "axon")


_FAST_DTYPES = (jnp.float32, jnp.int16, jnp.uint8)


def extract_windows(tex, r0, c0, wh: int, ww: int,
                    scale: float = 1.0, offset: float = 0.0):
    """Per-block windows; DMA+MXU path on TPU, XLA path elsewhere.

    2-D f32/int16/uint8 maps (callers extract per-channel planes); always
    returns decoded float32 windows (value = raw * scale + offset).
    """
    if tex.ndim == 2 and tex.dtype in _FAST_DTYPES and _fast_ok():
        return extract_windows_tpu(tex, r0, c0, wh, ww,
                                   scale=scale, offset=offset)
    return decode_affine(sampler.extract_windows(tex, r0, c0, wh, ww),
                         scale, offset)


# ---- fused window resample (extraction + bilinear in one kernel) -----------

def _make_resample_kernel(n_levels: int, wh: int, ww: int, sh: int, sw: int,
                          row_tile: int, group: int, b: int,
                          scale: float, offset: float):
    def kernel(ra_ref, ca_ref, offr_ref, offc_ref, lvl_ref,
               wy_ref, wx_ref, *refs):
        texs = refs[:n_levels]
        out_ref = refs[n_levels]
        scratch = refs[n_levels + 1]
        sems = refs[n_levels + 2]
        pid = pl.program_id(0)

        # DMA phase: issue all copies, then wait (extract_group_windows)
        for g in range(group):
            i = pid * group + g
            ra = pl.multiple_of(ra_ref[i], row_tile)
            ca = pl.multiple_of(ca_ref[i], COL_TILE)
            for k in range(n_levels):
                @pl.when(lvl_ref[i] == k)
                def _(k=k, g=g, ra=ra, ca=ca):
                    pltpu.make_async_copy(
                        texs[k].at[pl.ds(ra, sh), pl.ds(ca, sw)],
                        scratch.at[g], sems.at[g]).start()
        for g in range(group):
            i = pid * group + g
            ra = pl.multiple_of(ra_ref[i], row_tile)
            ca = pl.multiple_of(ca_ref[i], COL_TILE)
            pltpu.make_async_copy(
                texs[0].at[pl.ds(ra, sh), pl.ds(ca, sw)],
                scratch.at[g], sems.at[g]).wait()

        for g in range(group):
            i = pid * group + g
            slab = scratch[g]
            if slab.dtype == jnp.uint8:
                slab = slab.astype(jnp.int16)
            if slab.dtype != jnp.float32:
                slab = slab.astype(jnp.float32)
            if scale != 1.0:
                slab = slab * jnp.float32(scale)
            if offset != 0.0:
                slab = slab + jnp.float32(offset)
            # mean-centering keeps the bf16 MXU mix exact to ~4e-3
            # relative on the RESIDUALS (same move as the render sampler
            # and the XLA blocked-resample path). The mean is taken over
            # the exact window, NOT the aligned slab — the slab can reach
            # into the maps' zero padding, which would push the mean off
            # by O(1) and blow the residual scale up
            ir = jax.lax.broadcasted_iota(jnp.int32, (sh, sw), 0)
            ic = jax.lax.broadcasted_iota(jnp.int32, (sh, sw), 1)
            offr = offr_ref[i]
            offc = offc_ref[i]
            inwin = ((ir >= offr) & (ir < offr + wh)
                     & (ic >= offc) & (ic < offc + ww))
            mean = jnp.sum(jnp.where(inwin, slab, 0.0)) / float(wh * ww)
            res = (slab - mean).astype(jnp.bfloat16)

            # clamp in WINDOW coordinates (the XLA window_bilinear
            # contract), then shift into the aligned slab
            wy = (jnp.clip(wy_ref[g], 0.0, wh - 1.001)
                  + offr_ref[i].astype(jnp.float32))          # (b,)
            wx = (jnp.clip(wx_ref[g], 0.0, ww - 1.001)
                  + offc_ref[i].astype(jnp.float32))
            y0 = jnp.floor(wy)
            x0 = jnp.floor(wx)
            fy = wy - y0
            fx = wx - x0
            y0i = y0.astype(jnp.int32)
            x0i = x0.astype(jnp.int32)

            # columns first: the (sh, b) intermediate is 6x smaller than
            # the (sw, b) row-first order at scan shapes
            jc = jax.lax.broadcasted_iota(jnp.int32, (sw, b), 0)
            wc = (jnp.where(jc == x0i[None, :], 1.0 - fx[None, :], 0.0)
                  + jnp.where(jc == x0i[None, :] + 1, fx[None, :], 0.0))
            mixc = jax.lax.dot_general(
                res, wc.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)           # (sh, b)
            jr = jax.lax.broadcasted_iota(jnp.int32, (sh, b), 0)
            wr = (jnp.where(jr == y0i[None, :], 1.0 - fy[None, :], 0.0)
                  + jnp.where(jr == y0i[None, :] + 1, fy[None, :], 0.0))
            out_ref[0, g, :] = jnp.sum(mixc * wr, axis=0) + mean

    return kernel


@functools.partial(jax.jit, static_argnames=("wh", "ww", "scale", "offset",
                                             "group", "interpret"))
def resample_group_windows_tpu(levels, lvl_idx, r0, c0, wy, wx,
                               wh: int, ww: int, scale: float = 1.0,
                               offset: float = 0.0, group: int = 8,
                               interpret: bool = False):
    """Fused per-block window extraction + bilinear resample.

    For workloads that only need SAMPLES from each window (the shadow
    scan's height/albedo resample onto the sun-frame grid), extracting
    windows to HBM and sampling them with the XLA one-hot window_bilinear
    wastes the dominant cost in (NBLK, B, WH/WW) weight/row-mix HBM
    traffic — measured 55 ms of a 77 ms scan at accuracy 10. This kernel
    keeps the whole thing in VMEM: aligned superwindow DMA per block
    (grouped, overlapped), one bf16 MXU one-hot contraction per axis on
    the mean-centered slab, and writes only the (NBLK, B) sampled values.

    levels: same-dtype pyramid; lvl_idx/r0/c0 as extract_level_windows_tpu
    (origins pre-clamped in each block's own level coords). wy/wx:
    (NBLK, B) float32 window-relative sample coords (clamped to the
    window like sampler.window_bilinear). Returns (NBLK, B) f32.
    """
    n_levels = len(levels)
    nblk, b = wy.shape
    if nblk % group:
        raise ValueError(f"nblk {nblk} not divisible by group {group}")
    dtype = levels[0].dtype
    row_tile = _row_tile(dtype)
    sh = _round_up(wh + row_tile - 1, row_tile)
    sw = _round_up(ww + COL_TILE - 1, COL_TILE)
    padded = [_pad_level(lvl, sh, sw, row_tile) for lvl in levels]

    r0 = r0.astype(jnp.int32)
    c0 = c0.astype(jnp.int32)
    ra = (r0 // row_tile) * row_tile
    ca = (c0 // COL_TILE) * COL_TILE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nblk // group,),
        in_specs=[pl.BlockSpec((group, b), lambda i, *_: (i, 0)),
                  pl.BlockSpec((group, b), lambda i, *_: (i, 0))]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_levels,
        out_specs=pl.BlockSpec((1, group, b), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((group, sh, sw), dtype),
                        pltpu.SemaphoreType.DMA((group,))],
    )
    out = pl.pallas_call(
        _make_resample_kernel(n_levels, wh, ww, sh, sw, row_tile, group,
                              b, scale, offset),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk // group, group, b),
                                       jnp.float32),
        interpret=interpret,
    )(ra, ca, r0 - ra, c0 - ca, lvl_idx.astype(jnp.int32),
      wy.astype(jnp.float32), wx.astype(jnp.float32), *padded)
    return out.reshape(nblk, b)
