"""RenderConfig validation ranges (reference main.py:298-332)."""

import dataclasses

import pytest

from moonrtx_tpu.config import ConfigError, RenderConfig
from moonrtx_tpu.types import Observer


def test_defaults_valid():
    RenderConfig().validate()


@pytest.mark.parametrize(
    "field,value",
    [
        ("downscale", 0),
        ("brightness", 501),
        ("brightness", -1),
        ("gamma", 0.4),
        ("gamma", 5.1),
        ("time_step_minutes", 0),
        ("time_step_minutes", 1441),
        ("shadow_accuracy", 0),
        ("shadow_accuracy", 21),
        ("view_orientation", "ABCD"),
        ("backend", "cuda"),
        ("synth_shape", (100, 150)),   # W must be 2*H
        ("synth_shape", (0, 0)),
        ("synth_shape", (2880.5, 5761.0)),
    ],
)
def test_out_of_range_rejected(field, value):
    cfg = dataclasses.replace(RenderConfig(), **{field: value})
    with pytest.raises(ConfigError):
        cfg.validate()


@pytest.mark.parametrize("backend",
                         ["auto", "blocked", "reference", "mxu", "pallas"])
def test_every_advertised_backend_accepted(backend):
    """--backend blocked is advertised by the CLI/launcher and must validate
    (round-1 regression: config rejected 'blocked')."""
    cfg = dataclasses.replace(RenderConfig(), backend=backend).validate()
    assert cfg.backend == backend


@pytest.mark.parametrize(
    "lat,lon,elev",
    [(91.0, 0.0, 0), (-91.0, 0.0, 0), (0.0, 181.0, 0), (0.0, 0.0, -1),
     (0.0, 0.0, 100001)],
)
def test_observer_ranges(lat, lon, elev):
    cfg = RenderConfig(observer=Observer(lat, lon, elev))
    with pytest.raises(ConfigError):
        cfg.validate()


def test_synth_shape_accepted():
    cfg = dataclasses.replace(RenderConfig(),
                              synth_shape=(23040, 46080)).validate()
    assert cfg.synth_shape == (23040, 46080)
