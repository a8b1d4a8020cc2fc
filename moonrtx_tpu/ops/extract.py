"""Fast per-block window extraction.

The blocked backend's caches are thousands of small windows
``tex[r0[b]:r0[b]+wh, c0[b]:c0[b]+ww]`` gathered from HBM-resident maps.
The straightforward XLA formulation (vmapped ``dynamic_slice``,
sampler.extract_windows) lowers to a gather and crawls on TPU: measured
~0.6 GB/s (275 ms for one 1080p pose's height windows) — the dominant
cost of every pose change and time step.

TPU-native replacement, one Pallas program per block, no gathers and no
HBM intermediates:

1. **Aligned DMA fetch**: HBM arrays are (8, 128)-tiled and the DMA
   engine copies tile-aligned slabs at full bandwidth, so the program
   copies the aligned *superwindow* ``tex[ra:ra+SH, ca:ca+SW]``
   (``ra = r0 & ~7``, ``ca = c0 & ~127``; SH/SW statically rounded up to
   cover any in-tile offset) into VMEM scratch, origins scalar-prefetched.
2. **In-VMEM one-hot recompaction**: the exact (wh, ww) window is cut
   from the superwindow by two small MXU contractions against one-hot
   shift matrices built from iota — selection rows have exactly one 1.0,
   and HIGHEST precision makes the result bit-exact f32 (verified against
   sampler.extract_windows in tests). Same "gather = one-hot matmul"
   move as the render sampler (ops/sampler.py), but VMEM-resident.
3. **Per-block mip-level select** (extract_level_windows): blocks carry a
   stride level q = 2^k (engine/blocked.py); a guarded DMA per level
   fetches each block's window from its own level in ONE pass over the
   block list — the XLA path extracted every block at every level and
   blended afterwards.

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

ROW_TILE = 8
COL_TILE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(n_levels: int, wh: int, ww: int, sh: int, sw: int):
    def kernel(ra_ref, ca_ref, offr_ref, offc_ref, lvl_ref, *refs):
        # refs: n_levels ANY tex refs, out_ref, scratch, sem
        texs = refs[:n_levels]
        out_ref = refs[n_levels]
        scratch = refs[n_levels + 1]
        sem = refs[n_levels + 2]
        i = pl.program_id(0)
        ra = pl.multiple_of(ra_ref[i], ROW_TILE)
        ca = pl.multiple_of(ca_ref[i], COL_TILE)
        for k in range(n_levels):
            @pl.when(lvl_ref[i] == k)
            def _(k=k):
                cp = pltpu.make_async_copy(
                    texs[k].at[pl.ds(ra, sh), pl.ds(ca, sw)], scratch, sem)
                cp.start()
                cp.wait()

        # in-VMEM one-hot recompaction (bit-exact under HIGHEST)
        offr = offr_ref[i]
        offc = offc_ref[i]
        jr = jax.lax.broadcasted_iota(jnp.int32, (sh, wh), 0)
        ir = jax.lax.broadcasted_iota(jnp.int32, (sh, wh), 1)
        rone = jnp.where(jr == offr + ir, 1.0, 0.0).astype(jnp.float32)
        mix = jax.lax.dot_general(
            scratch[...], rone, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # (sw, wh)
        jc = jax.lax.broadcasted_iota(jnp.int32, (sw, ww), 0)
        ic = jax.lax.broadcasted_iota(jnp.int32, (sw, ww), 1)
        cone = jnp.where(jc == offc + ic, 1.0, 0.0).astype(jnp.float32)
        out = jax.lax.dot_general(
            mix, cone, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # (wh, ww)
        out_ref[0] = out

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("wh", "ww", "interpret"))
def _extract_impl(levels, lvl_idx, r0, c0, wh: int, ww: int,
                  interpret: bool = False):
    n_levels = len(levels)
    nblk = r0.shape[0]
    sh = _round_up(wh + ROW_TILE - 1, ROW_TILE)
    sw = _round_up(ww + COL_TILE - 1, COL_TILE)
    # pad every level so any aligned superwindow is in range (dense copy
    # at HBM bandwidth; keeps callers free of padding contracts)
    padded = []
    for lvl in levels:
        h, w = lvl.shape
        hp = _round_up(max(h, sh), ROW_TILE) + ROW_TILE
        wp = _round_up(max(w, sw), COL_TILE) + COL_TILE
        padded.append(jnp.pad(lvl, ((0, hp - h), (0, wp - w))))

    r0 = r0.astype(jnp.int32)
    c0 = c0.astype(jnp.int32)
    ra = (r0 // ROW_TILE) * ROW_TILE
    ca = (c0 // COL_TILE) * COL_TILE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_levels,
        out_specs=pl.BlockSpec((1, wh, ww), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((sh, sw), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _make_kernel(n_levels, wh, ww, sh, sw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk, wh, ww), jnp.float32),
        interpret=interpret,
    )(ra, ca, r0 - ra, c0 - ca, lvl_idx.astype(jnp.int32), *padded)


def extract_windows_tpu(tex, r0, c0, wh: int, ww: int,
                        interpret: bool = False):
    """Drop-in fast path for sampler.extract_windows on one 2-D map.

    r0/c0: (NBLK,) pre-clamped to [0, H-wh] x [0, W-ww] like the XLA
    path. Bit-exact with sampler.extract_windows.
    """
    lvl = jnp.zeros(r0.shape, jnp.int32)
    return _extract_impl((tex,), lvl, r0, c0, wh, ww,
                         interpret=interpret).astype(tex.dtype)


def extract_level_windows_tpu(levels, lvl_idx, r0, c0, wh: int, ww: int,
                              interpret: bool = False):
    """Per-block windows from levels[lvl_idx[b]] in one pass.

    r0/c0 are in each block's OWN level coordinates, pre-clamped to that
    level's bounds (engine/blocked.py window_origins does this).
    """
    return _extract_impl(tuple(levels), lvl_idx, r0, c0, wh, ww,
                         interpret=interpret).astype(levels[0].dtype)


def _fast_ok() -> bool:
    # evaluated per call (cheap at trace time): a process that mixes
    # backends must not pin the first backend it saw forever
    return jax.default_backend() in ("tpu", "axon")


def extract_windows(tex, r0, c0, wh: int, ww: int):
    """Per-block windows; DMA+MXU path on TPU, XLA path elsewhere.

    2-D f32 maps only (callers extract per-channel planes); same
    contract as sampler.extract_windows.
    """
    if tex.ndim == 2 and tex.dtype == jnp.float32 and _fast_ok():
        return extract_windows_tpu(tex, r0, c0, wh, ww)
    return sampler.extract_windows(tex, r0, c0, wh, ww)
