"""Regenerate the golden images under tests/goldens/.

Run on CPU (`MOONRTX_PLATFORM=cpu python tools/make_goldens.py`) after an
INTENDED change to rendering output, then review the diff visually before
committing. The golden test (tests/test_goldens.py) renders the same
deterministic scenes and compares within a small tolerance — it catches
unintended image drift that the analytic/cross-backend tests cannot see.

Scenes are small (192x108), fully deterministic (seeded synthesis, seeded
antialias jitter via MoonScene's rng), and run on the XLA blocked backend
(bit-stable across CPU hosts; the pallas and gather backends are already
cross-validated against it elsewhere in the suite).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), os.pardir,
                          "tests", "goldens")


def golden_scenes():
    """name -> freshly built MoonScene, deterministic, ready to render."""
    from datetime import datetime, timezone

    import numpy as np

    from moonrtx_tpu.config import RenderConfig
    from moonrtx_tpu.data.synth import synthesize_moon
    from moonrtx_tpu.engine.scene import MoonScene
    from moonrtx_tpu.types import Observer

    obs = Observer(50.06, 19.94, 219)
    elev, albedo = synthesize_moon(360, 720, seed=11, n_craters=250)
    rs = float(elev.max())
    elev = (elev / rs).astype(np.float32)

    def scene(dt, photometric="lambert", indirect=True):
        cfg = RenderConfig(
            observer=obs, dt_local=dt, width=192, height=108,
            shadow_accuracy=4, photometric=photometric,
            indirect_light=indirect,
        ).validate()
        s = MoonScene(cfg, elev, rs, albedo, None)
        s.backend = "blocked"
        s.shadows_on = True
        s.update_view()
        return s

    quarter = datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc)
    full = datetime(2024, 4, 23, 23, 49, tzinfo=timezone.utc)
    crescent = datetime(2024, 4, 11, 19, 30, tzinfo=timezone.utc)
    # mid-totality of the 2025-03-14 lunar eclipse: pins the umbra
    # coverage geometry + copper tint that only analytic tests cover
    # elsewhere (tests/test_eclipse.py)
    eclipse = datetime(2025, 3, 14, 6, 59, tzinfo=timezone.utc)
    return {
        "quarter_shadows": scene(quarter),
        "full_lunar_photometric": scene(full, photometric="lunar"),
        "crescent_no_bounce": scene(crescent, indirect=False),
        "eclipse_totality": scene(eclipse),
    }


def main():
    # pin the platform BEFORE the first device touch — some PJRT plugins
    # (tunneled TPU backends) ignore the JAX_PLATFORMS env var
    plat = os.environ.get("MOONRTX_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    import numpy as np
    from PIL import Image

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, s in golden_scenes().items():
        img = s.render(2)
        path = os.path.join(GOLDEN_DIR, f"{name}.png")
        Image.fromarray(np.asarray(img)).save(path)
        print(f"wrote {path} {img.shape} mean={img.mean():.2f}")


if __name__ == "__main__":
    main()
