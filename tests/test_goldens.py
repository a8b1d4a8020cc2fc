"""Golden-image regression tests (SURVEY.md sec. 4).

The analytic and cross-backend tests pin down physics and backend
agreement; these pin down the actual pixels. Each scene is deterministic
(seeded synthesis + seeded antialias jitter) and compared against a
committed PNG within a tolerance wide enough for XLA version-to-version
instruction-order drift but far too tight for any real rendering change
(a light-direction, shadow, tonemap or photometric regression moves whole
regions by many levels).

Regenerate after an INTENDED change: `MOONRTX_PLATFORM=cpu python
tools/make_goldens.py`, review visually, commit.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from tools.make_goldens import GOLDEN_DIR, golden_scenes  # noqa: E402


@pytest.fixture(scope="module")
def scenes():
    return golden_scenes()


@pytest.mark.parametrize("name", ["quarter_shadows",
                                  "full_lunar_photometric",
                                  "crescent_no_bounce",
                                  "eclipse_totality"])
def test_golden(name, scenes):
    from PIL import Image

    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    golden = np.asarray(Image.open(path)).astype(np.int16)
    img = np.asarray(scenes[name].render(2)).astype(np.int16)
    assert img.shape == golden.shape
    d = np.abs(img - golden)
    # uint8 display space: tiny float drift rounds to <=1 level on a few
    # pixels; real regressions shift whole regions by many levels
    assert float(d.mean()) < 0.5, f"{name}: mean |diff| {d.mean():.3f}"
    assert float((d > 8).mean()) < 0.001, (
        f"{name}: {(d > 8).mean():.4%} of pixels off by >8 levels")
