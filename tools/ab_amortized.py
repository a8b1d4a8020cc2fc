"""In-program amortization harness: settle sub-10 ms device effects.

Through the axon tunnel a single dispatch+sync carries a 25-55 ms tax
that DRIFTS between runs, so kernel effects under ~10 ms cannot be
attributed from one-dispatch A/Bs (docs/PERF.md "tunnel note"; hours
were lost in round 3 chasing a "9 ms" extraction cost that was noise).
The cure the 32-sample burst already proves: run the op-under-test N
times inside ONE jitted program, so a d-ms device effect measures as
d*N ms against a single dispatch. This tool is that harness (round-5
verdict item 1), built to settle the three hypotheses PERF.md had
parked for "local hardware":

  (a) bf16 vs f32 packing of the sun-window slice+repack body
      (engine/blocked.py build_shadow_windows + _pack_sun_parts —
      bf16 is the shipped choice; this measures what it buys);
  (b) extraction group 8 vs 32 (ops/extract.py grouped kernels), on
      both the swin extraction and the scan height resample;
  (c) pre-tiled levels: the extractor's whole-map pad copy — measured
      as raw per-call cost (a structural finding closed the original
      formulation: origin clamps use the padded shape, so a pre-pad
      can never satisfy the margin; see ops/extract.py _pad_level).

Method: each variant is a jitted ``lax.fori_loop`` whose body runs the
op with ITERATION-DEPENDENT inputs (a loop-index perturbation folded
into a float operand — without it XLA's loop-invariant code motion
hoists the whole body out and measures nothing) and threads the
reduced output through the carry (serializing iterations, defeating
CSE). The loop bound is a TRACED scalar, so one compile serves every
N; per-iteration time is the slope between N_LO and N_HI runs,
min-of-reps, one process. Sync is a 4-byte scalar readback
(block_until_ready does not synchronize through the tunnel).

The working set mirrors the bench's SHADOW-PATH shapes exactly
(1080p block grid, accuracy-10 scan, int16 shadow-level mip): all
three hypotheses live in the shadow-window build, whose maps are
small, so no multi-GiB pyramid upload is needed.

Usage:  python tools/ab_amortized.py            # on the TPU
        MOONRTX_PLATFORM=cpu python tools/ab_amortized.py --smoke
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
from datetime import datetime, timezone

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

N_LO, N_HI, REPS = 4, 16, 5


def _measure(name, make_body, operands, results, reps=REPS,
             n_lo=N_LO, n_hi=N_HI):
    """Per-iteration ms of a body, by the in-program slope method."""
    import jax
    import jax.numpy as jnp

    body = make_body()

    @jax.jit
    def run(n, *ops):
        def step(i, carry):
            # carry*1e-30 threads a data dependence through every
            # iteration (no two iterations can fuse or reorder); the
            # i-term makes each iteration's inputs unique (no hoisting)
            eps = (jnp.float32(1e-7) * i.astype(jnp.float32)
                   + carry * jnp.float32(1e-30))
            return carry + body(eps, i, *ops)
        return jax.lax.fori_loop(0, n, step, jnp.float32(0.0))

    n_lo_j = jnp.int32(n_lo)
    n_hi_j = jnp.int32(n_hi)
    t0 = time.time()
    float(run(n_lo_j, *operands))  # compile + first run; scalar sync
    compile_s = time.time() - t0
    times = {}
    for n in (n_lo, n_hi):
        nj = jnp.int32(n)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(run(nj, *operands))
            ts.append(time.time() - t0)
        times[n] = min(ts)
    per_iter_ms = (times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1000.0
    results[name] = dict(per_iter_ms=round(per_iter_ms, 2),
                         t_lo_ms=round(times[n_lo] * 1000.0, 1),
                         t_hi_ms=round(times[n_hi] * 1000.0, 1),
                         compile_s=round(compile_s, 1))
    print(f"{name:44s} {per_iter_ms:8.2f} ms/iter   "
          f"(lo {times[n_lo]*1e3:.1f} hi {times[n_hi]*1e3:.1f} "
          f"compile {compile_s:.0f}s)", flush=True)
    return per_iter_ms


def main():
    import jax

    plat = os.environ.get("MOONRTX_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    from moonrtx_tpu.utils.compilecache import enable
    enable()
    import jax.numpy as jnp

    from moonrtx_tpu.config import RenderConfig
    from moonrtx_tpu.data.synth import synthesize_moon
    from moonrtx_tpu.engine import blocked
    from moonrtx_tpu.engine.scene import MoonScene
    from moonrtx_tpu.ops import shadow_scan
    from moonrtx_tpu.types import Observer

    smoke = "--smoke" in sys.argv
    t0 = time.time()
    # bench-matched SHADOW-path working set: int16 shadow-level mip
    # (quantize forced — the bench's full-LDEM shadow level is int16),
    # 1080p block grid, accuracy-10 scan. Small synth (~66 MB up).
    th, tw = (360, 720) if smoke else (2880, 5760)
    elev, albedo = synthesize_moon(th, tw, seed=11, n_craters=200)
    rs = float(elev.max())
    cfg = RenderConfig(
        observer=Observer(50.06, 19.94, 219),
        dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
        width=256 if smoke else 1920, height=128 if smoke else 1080,
        shadow_accuracy=2 if smoke else 10,
        backend="pallas", quantize="i16",
    ).validate()
    scene = MoonScene(cfg, (elev / rs).astype(np.float32), rs, albedo, None)
    del elev, albedo
    scene.shadows_on = True
    scene.update_view()
    scene.render_accumulation_burst(1)  # stand the caches up
    print(f"# setup {time.time()-t0:.0f}s on {jax.devices()}; "
          f"storage {scene.mips[0].dtype}", flush=True)

    smap, sparams = scene.shadow_args()
    bmap = scene._bounce
    cache, org = scene._wincache, scene._origins
    geom = blocked.block_rays(scene.render_basis(), scene._fp.rotation,
                              jnp.zeros(2, jnp.float32), scene.height,
                              scene.width, scene.h_min, maxmap=scene.maxmap)
    slevel = scene.shadow_level()
    stex = scene.mips[slevel]
    sh_, sw_ = scene.mip_shapes[slevel]
    acc = scene.shadow_accuracy
    ncs, nf, nph = shadow_scan._resolution(acc)
    sun_unit, ang = scene._sun_state()
    bx, by, bz = shadow_scan.sun_frame_basis(
        jnp.asarray(sun_unit, jnp.float32))
    sun_basis = jnp.stack([bx, by, bz])

    results = {}

    # ---- (a) swin slice+repack body: bf16 (shipped) vs f32 -------------
    def make_swin_body(dtype, group):
        def body(eps, i, smap, sparams, geom, bmap, cache, org):
            sw = blocked.build_shadow_windows(
                smap + eps, sparams, geom, bounce_map=bmap,
                out_dtype=dtype, group=group)
            swin_p, scal = blocked._pack_sun_parts(cache, org, sw)
            return (jnp.sum(swin_p[0].astype(jnp.float32))
                    + jnp.sum(scal[0, 0, 0, :1]))
        return body

    ops_swin = (smap, sparams, geom, bmap, cache, org)
    a_bf16 = _measure("swin body bf16 group=8 (shipped)",
                      lambda: make_swin_body(jnp.bfloat16, 8),
                      ops_swin, results)
    a_f32 = _measure("swin body f32  group=8",
                     lambda: make_swin_body(jnp.float32, 8),
                     ops_swin, results)

    # ---- (b) swin extraction group 8 vs 24 -----------------------------
    # 32 cannot serve this path at all: the 1080p block grid is
    # (1080/8)*(1920/16) = 16200 blocks, not divisible by 32 (the
    # grouped kernel now rejects that loudly) — 24 is the largest
    # practical divisor in the same direction
    swin_hi_group = 24 if not smoke else 16
    b_32 = _measure(f"swin body bf16 group={swin_hi_group}",
                    lambda: make_swin_body(jnp.bfloat16, swin_hi_group),
                    ops_swin, results)

    # ---- (b') scan height-resample group 8 vs 32 -----------------------
    def make_scan_body(group):
        def body(eps, i, stex, sun_basis):
            # perturbing the BASIS makes every iteration's scan grid
            # (hence coords, origins, windows) unique; renormalized so
            # the geometry stays sane
            b0 = sun_basis + eps
            factor, hs = shadow_scan.scan_wedge(
                stex, b0, jnp.float32(ang), sh_, sw_,
                ncs, nf, nph, 0, nph, blocked_resample=True,
                h_scale=scene.h_scale, h_offset=scene.h_offset,
                return_heights=True, resample_group=group)
            return jnp.sum(factor[::97, ::97]) + jnp.sum(hs[0, :1])
        return body

    ops_scan = (stex, sun_basis)
    s_8 = _measure("scan factor+heights resample group=8 (shipped)",
                   lambda: make_scan_body(8), ops_scan, results)
    s_32 = _measure("scan factor+heights resample group=32",
                    lambda: make_scan_body(32), ops_scan, results)

    # ---- (c) whole-map pad copy: raw cost ------------------------------
    # Pre-tiling cannot elide the extractor's pad as-is (origin clamps
    # use the PADDED shape, so the margin requirement chases any
    # pre-pad — ops/extract.py _pad_level). Instead, measure the pad's
    # raw per-call cost at the shadow-level map and extrapolate to the
    # pose-path mips by bytes (pads are pure bandwidth). The int16
    # +0/+1 bump defeats loop-invariant hoisting; both variants pay the
    # same bump + full reduce, so the slope delta isolates the pad.
    from moonrtx_tpu.ops.extract import COL_TILE, _round_up, _row_tile
    rt = _row_tile(stex.dtype)
    hp = _round_up(stex.shape[0], rt) + rt
    wp = _round_up(stex.shape[1], COL_TILE) + COL_TILE

    def make_pad_cost_body(do_pad):
        def body(eps, i, x):
            y = x + (i % 2).astype(x.dtype)
            if do_pad:
                y = jnp.pad(y, ((0, hp - x.shape[0]),
                                (0, wp - x.shape[1])))
            return jnp.sum(y.astype(jnp.float32)) * jnp.float32(1e-9) + eps
        return body

    c_pad = _measure(f"map {stex.shape} bump+reduce WITH pad",
                     lambda: make_pad_cost_body(True), (stex,), results)
    c_pre = _measure(f"map {stex.shape} bump+reduce no pad",
                     lambda: make_pad_cost_body(False), (stex,), results)

    # ---- verdicts ------------------------------------------------------
    verdicts = {
        "bf16_swin_pack": dict(
            shipped="bf16", delta_ms=round(a_f32 - a_bf16, 2),
            verdict=("ADOPTED (bf16 confirmed faster)"
                     if a_f32 - a_bf16 > 0.5 else
                     "KEPT bf16 (difference below resolution; bf16 also "
                     "halves HBM residency)")),
        "extract_group_up": dict(
            shipped="group=8",
            note="group=32 cannot serve the swin path at 1080p at all "
                 "(16200 blocks % 32 != 0; kernel now rejects loudly); "
                 f"swin tested at {swin_hi_group}, scan at 32",
            swin_delta_ms=round(a_bf16 - b_32, 2),
            scan_delta_ms=round(s_8 - s_32, 2),
            verdict=("ADOPT larger group"
                     if (a_bf16 - b_32) + (s_8 - s_32) > 1.0
                     else "REJECT (no reliable win above group=8)")),
        "pretiled_levels": dict(
            shipped="in-program pad",
            pad_cost_ms=round(c_pad - c_pre, 2),
            map_bytes=int(np.prod(stex.shape)) * stex.dtype.itemsize,
            note="pads are pure bandwidth; scale pad_cost_ms by bytes "
                 "for the pose-path mips. Pre-tiling also cannot elide "
                 "the pad without threading logical shapes through "
                 "every origin clamp (ops/extract.py _pad_level).",
            verdict=("WORTH RESTRUCTURING" if c_pad - c_pre > 2.0
                     else "REJECT (pad cost marginal; the clamp "
                          "restructuring it would need is not paid for)")),
    }
    out = dict(config=dict(smoke=smoke, map=[th, tw], acc=acc,
                           n_lo=N_LO, n_hi=N_HI, reps=REPS,
                           device=str(jax.devices()[0])),
               measurements=results, verdicts=verdicts)
    print(json.dumps(out, indent=1))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "docs", "ab_amortized.json")
    if not smoke:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(out, f, indent=1)
        print(f"# wrote {path}")


if __name__ == "__main__":
    main()
