"""Capture the interactive program set as a packaged precompiled seed.

Programs are shape-specialized to the map pyramids and frame size, so a
useful seed must be captured at the exact working sets first runs use.
This tool captures TWO sets into one archive, with the persistent
compile cache pointed at a FRESH staging directory (so exactly the
current program set's entries land there, none of the historical
variants):

1. the BENCH working set (1920x1080, shadow accuracy 10, full-LDEM-scale
   23040x46080 int16 pyramids) — by running ``bench.py`` itself, so the
   archive covers every program the benchmark (and an interactive
   session at that working set) dispatches, with bit-identical cache
   keys;
2. the app-DEFAULT first-run set (``python -m moonrtx_tpu`` with no data
   files: 2880x5760 synth at downscale 3) — via the warm-compile walk.

``utils/compilecache.enable()`` unpacks the archive on first run, so an
empty cache directory starts from deserialization instead of
compilation (cold-start item, docs/PERF.md). Run ON THE TARGET PLATFORM
(cache keys encode backend + jax version):

    python tools/pack_compile_cache.py [--skip-bench] [--skip-default]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tarfile
import tempfile
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
sys.path.insert(0, REPO)


def main():
    t0 = time.time()
    staging = tempfile.mkdtemp(prefix="moonrtx_jaxcache_")
    # MOONRTX_NO_SEED: the capture must hold exactly the freshly-compiled
    # set — seeding the committed archive into staging would make every
    # recapture a strictly-growing union of historical entries
    env = dict(os.environ, MOONRTX_JAXCACHE=staging, MOONRTX_NO_SEED="1")

    if "--skip-bench" not in sys.argv:
        print(f"capturing BENCH program set into {staging} ...", flush=True)
        subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, check=True)
    if "--skip-default" not in sys.argv:
        # the TRUE first-run defaults (no flags: 1920x1080, downscale 3,
        # shadow accuracy 1) — programs are specialized to accuracy's
        # scan resolution too, so warming at a non-default accuracy
        # would miss the actual first launch
        print("capturing app-default program set ...", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "warm_compile.py")],
            env=env, check=True)
        # plus the default set at exact-shadow accuracy 10 (the X key /
        # recommended setting): one more walk, scan variants only
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "warm_compile.py"),
             "--shadow-accuracy", "10"],
            env=env, check=True)

    entries = sorted(f for f in os.listdir(staging)
                     if not f.startswith("."))
    if not entries:
        print("no cache entries captured — nothing to pack", file=sys.stderr)
        sys.exit(1)

    # backend tag for the archive name (informational; keys self-select)
    plat = os.environ.get("MOONRTX_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    import jax
    tag = jax.default_backend()

    from moonrtx_tpu.utils.compilecache import seed_dir

    os.makedirs(seed_dir(), exist_ok=True)
    out = os.path.join(seed_dir(), f"jaxcache_seed_{tag}.tar.xz")
    total = 0
    with tarfile.open(out + ".tmp", "w:xz", preset=6) as tf:
        for name in entries:
            p = os.path.join(staging, name)
            total += os.path.getsize(p)
            tf.add(p, arcname=name)
    os.replace(out + ".tmp", out)
    print(f"packed {len(entries)} entries ({total / 2**20:.1f} MB raw) "
          f"-> {out} ({os.path.getsize(out) / 2**20:.1f} MB) "
          f"in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
