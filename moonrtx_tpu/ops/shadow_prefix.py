"""Single-pass Pallas shadow prefix-max + penumbra factor.

The shadow scan's core recurrence — every scan-grid point is lit iff its
sun-aligned cylindrical radius ``m = r·sinθ`` exceeds the running max of
``m`` along its sun meridian (ops/shadow_scan.py::scan_wedge) — lowers in
XLA as ``lax.associative_scan`` over (m, z) pairs: ~log₂(nθ) strided
passes over two full scan-grid f32 maps, plus materialized pads and the
factor elementwise tail. This kernel does the whole thing in ONE pass:

- grid (n_phi/LW, n_theta/LT), theta innermost; each program reads one
  (LT, LW) height tile, computes (m, z) in VMEM from per-row sinθ/cosθ
  tables, runs a Hillis-Steele inclusive prefix max-by-key along
  sublanes (log₂ LT shift/select passes, all VPU), converts to the
  exclusive scan, and merges a per-meridian carry kept in VMEM scratch
  across theta tiles.
- the penumbra factor (horizon elevation of the tallest blocker vs the
  solar angular radius) is computed in-register and is the only output:
  HBM traffic is exactly read-heights + write-factor.

Tie-breaking matches the XLA combine (strict ``bm > am`` keeps the
earlier element). Two numeric caveats vs the XLA formulation: the factor
tail uses the kernel-local atan2 polynomial (~1e-6 rad, i.e. ~1e-4 of a
penumbra width — ops/pallas_march.py::_atan2), and the m/z product
chains round differently inside the kernel's fusion context (measured
1 ulp), which can flip WHICH of two near-tied blockers wins a meridian —
both selections are physically valid; isolated penumbra texels may
differ by up to ~5e-3. tests/test_shadow_prefix.py pins the scan logic
exactly with rounding-free inputs.

Off TPU (or at incompatible shapes) callers keep the XLA formulation;
tests exercise the kernel in Pallas interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moonrtx_tpu.ops.pallas_march import _atan2


def _pick_tile(n: int, choices) -> int:
    for c in choices:
        if n % c == 0:
            return c
    return 0


def prefix_ok(n_theta: int, n_phi: int) -> bool:
    """True when the fused kernel supports this scan-grid shape."""
    return (_pick_tile(n_theta, (256, 128)) > 0
            and _pick_tile(n_phi, (512, 256, 128)) > 0)


def _shift_down(x, d: int, fill: float):
    """x[i] -> x[i-d] along sublanes; rows with no source get ``fill``."""
    pad = jnp.full((d,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:-d]], axis=0)


def _make_kernel(lt: int, moon_radius: float):
    # Preconditions the caller guarantees: heights > 0 and sinθ >= 0 on
    # the scan band (θ ∈ [0°, 105°]), so m >= 0 and the -1.0 shift fill
    # acts as the scan identity; the theta grid dim is LAST in `grid`,
    # so tiles of one meridian run consecutively and the VMEM carry
    # (row 0 of an (8, lw) scratch — sublane-tile-aligned) is valid.
    def kernel(sar_ref, hs_ref, st_ref, ct_ref, out_ref, cm_ref, cz_ref):
        t = pl.program_id(1)
        r = moon_radius * hs_ref[...]
        m = r * st_ref[...]
        z = r * ct_ref[...]

        @pl.when(t == 0)
        def _():
            cm_ref[...] = jnp.full_like(cm_ref[...], -1.0)
            cz_ref[...] = jnp.zeros_like(cz_ref[...])

        # inclusive prefix max-by-key along theta (sublanes); strict >
        # keeps the earlier element on ties, matching _argmax_combine
        im, iz = m, z
        d = 1
        while d < lt:
            sm = _shift_down(im, d, -1.0)
            sz = _shift_down(iz, d, 0.0)
            keep = im > sm
            im = jnp.where(keep, im, sm)
            iz = jnp.where(keep, iz, sz)
            d *= 2

        # exclusive scan = shift-by-1, then merge the carry from the
        # previous theta tiles of this meridian
        em = _shift_down(im, 1, -1.0)
        ez = _shift_down(iz, 1, 0.0)
        carry_m = cm_ref[0:1, :]
        carry_z = cz_ref[0:1, :]
        keep = em > carry_m
        m_max = jnp.where(keep, em, carry_m)
        z_at = jnp.where(keep, ez, carry_z)

        last_m = im[lt - 1:lt, :]
        last_z = iz[lt - 1:lt, :]
        keep = last_m > carry_m
        cm_ref[0:1, :] = jnp.where(keep, last_m, carry_m)
        cz_ref[0:1, :] = jnp.where(keep, last_z, carry_z)

        dz = jnp.maximum(z_at - z, 1e-6)
        alpha = _atan2(m_max - m, dz)
        sar = sar_ref[0]
        factor = jnp.clip(0.5 - alpha / (2.0 * sar), 0.0, 1.0)
        out_ref[...] = jnp.where(m_max < 0.0, 1.0, factor)

    return kernel


@functools.partial(jax.jit, static_argnames=("moon_radius", "interpret"))
def shadow_factor_tpu(hs, st, ct, sun_ang_radius,
                      moon_radius: float, interpret: bool = False):
    """Penumbra factor map from scan-grid heights, fused single pass.

    hs: (n_theta, n_phi) f32 heights on the sun-frame scan grid.
    st/ct: (n_theta, 1) f32 sinθ/cosθ per grid row.
    sun_ang_radius: scalar (radians). Returns (n_theta, n_phi) f32,
    equal to scan_wedge's XLA formulation (scan bit-identical; factor
    within the atan2 polynomial's ~1e-6 rad).
    """
    n_theta, n_phi = hs.shape
    lt = _pick_tile(n_theta, (256, 128))
    lw = _pick_tile(n_phi, (512, 256, 128))
    if not (lt and lw):
        raise ValueError(f"unsupported scan grid {hs.shape}")
    sar = jnp.reshape(sun_ang_radius, (1,)).astype(jnp.float32)
    grid = (n_phi // lw, n_theta // lt)
    return pl.pallas_call(
        _make_kernel(lt, float(moon_radius)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((lt, lw), lambda p, t, *_: (t, p)),
                pl.BlockSpec((lt, 1), lambda p, t, *_: (t, 0)),
                pl.BlockSpec((lt, 1), lambda p, t, *_: (t, 0)),
            ],
            out_specs=pl.BlockSpec((lt, lw), lambda p, t, *_: (t, p)),
            scratch_shapes=[
                pltpu.VMEM((8, lw), jnp.float32),
                pltpu.VMEM((8, lw), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_theta, n_phi), jnp.float32),
        interpret=interpret,
    )(sar, hs.astype(jnp.float32), st.astype(jnp.float32),
      ct.astype(jnp.float32))
