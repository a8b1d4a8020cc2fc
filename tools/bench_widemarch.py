"""In-process A/B of the wide coarse march (pallas_march field_multi)
vs the serial fori_loop reference, on the real TPU: 32-sample bursts,
(serial|wide) x (cold|warm), one process so device/tunnel variance
cannot masquerade as a kernel difference.

Usage:  python tools/bench_widemarch.py [HxW-map-shape | base]
"""

import os
import sys
import time
from datetime import datetime, timezone

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    import jax

    cache_dir = os.path.join(
        os.environ.get("MOONRTX_TPU_CACHE",
                       os.path.expanduser("~/.cache/moonrtx_tpu")), "jaxcache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from moonrtx_tpu.config import RenderConfig
    from moonrtx_tpu.data.loader import load_color_data, load_elevation_data
    from moonrtx_tpu.engine import blocked
    from moonrtx_tpu.engine.scene import MoonScene
    from moonrtx_tpu.types import Observer

    shape_env = sys.argv[1] if len(sys.argv) > 1 else "23040x46080"
    if shape_env == "base":
        synth_shape = alb_shape = None
    else:
        th, tw = (int(v) for v in shape_env.split("x"))
        synth_shape = (th, tw)
        alb_shape = (max(th // 4, 2880), max(tw // 4, 5760))
    t0 = time.time()
    elevation, radius_scale = load_elevation_data(None, downscale=1,
                                                  synth_shape=synth_shape)
    albedo = load_color_data(None, 1, synth_shape=alb_shape)
    cfg = RenderConfig(
        observer=Observer(50.06, 19.94, 219),
        dt_local=datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc),
        width=1920, height=1080, shadow_accuracy=10, backend="pallas",
    ).validate()
    scene = MoonScene(cfg, elevation, radius_scale, albedo, None)
    del elevation, albedo
    scene.shadows_on = True
    scene.update_view()
    scene.render_accumulation_burst(1)  # stand the pipeline up

    def sync():
        v = jax.lax.dynamic_slice(
            scene._hitbuf, (scene.height // 2, scene.width // 2, 0),
            (1, 1, 4))
        np.asarray(v)

    sync()
    print(f"# setup {time.time()-t0:.0f}s on {jax.devices()}")

    level = scene.mip_level()
    h, w = scene.mip_shapes[level]
    alevel = scene.albedo_level(level)
    ah, aw = scene.mip_shapes[alevel]
    _, sparams = scene.shadow_args()
    n = 32
    rng = np.random.default_rng(0)
    jitters = jnp.concatenate([
        jnp.zeros((1, 2), jnp.float32),
        jnp.asarray(rng.random((n - 1, 2)) - 0.5, jnp.float32)])

    results = {}
    for label, wd, ws in (("serial cold", False, False),
                          ("serial warm", False, True),
                          ("wide   cold", True, False),
                          ("wide   warm", True, True)):
        def burst():
            rgb, hb = blocked.render_accumulate_pallas(
                scene._packed, sparams, scene.background(), scene.maxmap,
                scene.basis(), scene._fp, jitters, scene.height,
                scene.width, h, w, scene.h_min, ah=ah, aw=aw, n_samples=n,
                use_shadow=True, hbound=scene._hbound, warm_start=ws,
                wide=wd)
            scene._hitbuf = hb
            return rgb

        t0 = time.time()
        out = burst()
        sync()
        print(f"# {label} compile {time.time()-t0:.0f}s")
        ts = []
        for _ in range(3):
            t0 = time.time()
            burst()
            sync()
            ts.append(time.time() - t0)
        ms = sorted(ts)[1] / n * 1000.0
        results[label] = (ms, np.asarray(out))
        print(f"{label}  {ms:6.2f} ms/sample   ({1000.0/ms:5.1f} FPS)")

    for pair in (("serial cold", "wide   cold"),
                 ("serial warm", "wide   warm")):
        a, b = results[pair[0]], results[pair[1]]
        d = float(np.abs(a[1] - b[1]).max())
        print(f"{pair[0]} / {pair[1]}: speedup {a[0]/b[0]:.2f}x, "
              f"max abs img diff {d:.3e}")


if __name__ == "__main__":
    main()
