"""Stage-by-stage host-RSS anatomy of the COLD synthesis + pyramid path.

The first-ever run on a machine synthesizes the full working set
(23040x46080 by default); before the round-5 streaming work it peaked
~40 GB ru_maxrss in the bench. With the banded/spilled cold path
(data/{synth,loader,mips,pyramids}.py) the measured peaks are ~2.0 GB
for the synthesis stage and ~2.9 GB for the product-flow pyramid build
(docs/PERF.md) — this probe regression-checks that. Run with a SCRATCH
cache dir so the real caches stay warm:

    MOONRTX_PLATFORM=cpu MOONRTX_TPU_CACHE=/tmp/rss_probe_cache \
        python tools/rss_synth_probe.py [HxW]

Prints one line per stage: rss_now, ru_maxrss so far.
"""
import os
import resource
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 2**20
    return 0.0


def peak_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def stage(name):
    print(f"# {name}: rss {rss_gb():.2f} GB, peak {peak_gb():.2f} GB",
          flush=True)


def main():
    shape = os.environ.get("MOONRTX_BENCH_SHAPE", "23040x46080")
    if len(sys.argv) > 1:
        shape = sys.argv[1]
    th, tw = (int(v) for v in shape.split("x"))

    import jax

    jax.config.update("jax_platforms",
                      os.environ.get("MOONRTX_PLATFORM", "cpu"))
    from moonrtx_tpu.data.loader import load_color_data, load_elevation_data
    from moonrtx_tpu.data import pyramids

    stage("start")
    elevation, radius_scale = load_elevation_data(
        None, downscale=1, synth_shape=(th, tw))
    stage(f"elevation loaded {elevation.shape} {elevation.dtype} "
          f"(mmap={isinstance(elevation, np.memmap)})")
    albedo = load_color_data(
        None, 1, synth_shape=(max(th // 4, 2880), max(tw // 4, 5760)))
    stage(f"albedo loaded {albedo.shape} {albedo.dtype} "
          f"(mmap={isinstance(albedo, np.memmap)})")
    quantized = elevation.shape[0] * elevation.shape[1] \
        > pyramids.QUANTIZE_TEXELS
    # the product path (scene construction): cold build spills levels
    # into the cache dir and serves them memory-mapped
    ps = pyramids.load_or_build(np.asarray(elevation), np.asarray(albedo),
                                quantized, use_cache=True)
    stage(f"pyramids built (quantized={ps.quantized}, "
          f"{sum(m.nbytes for m in ps.mips) / 2**30:.2f} GiB mips, "
          f"mmap={isinstance(ps.mips[0], np.memmap)})")
    del elevation, albedo
    stage("sources dropped")


if __name__ == "__main__":
    main()
