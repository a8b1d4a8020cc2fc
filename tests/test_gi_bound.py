"""Indirect-light error bound pinned against Monte-Carlo ground truth
(round-3 verdict item 4; tools/gi_ground_truth.py, docs/GI.md).

The fast configuration re-measures the deterministic one-bounce field
against a cosine-weighted 2-bounce path-traced reference on steep
crafted-crater terrain (wall slopes ~25-30 deg — the regime the round-4
fix targeted: the earlier isotropic-horizon model overestimated ~10x
there; round 5 moved to 8 sectors + two horizon taps per level).
Bounds are the measured round-5 numbers with ~50% headroom."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "tools"))


@pytest.fixture(scope="module")
def gi():
    from gi_ground_truth import run

    return run(fast=True)


def test_bounce_error_bound(gi):
    o = gi["overall"]
    # absolute error in bounce units (fraction added to n.l*lit)
    assert o["bounce_abs_err"]["mean"] < 0.005, o["bounce_abs_err"]
    assert o["bounce_abs_err"]["max"] < 0.03, o["bounce_abs_err"]
    # the model-importance half (steepest cells): the isotropic model
    # measured mean 0.163 here — the sector model must stay ~10x below
    assert o["bounce_abs_err_model_top"]["mean"] < 0.01, \
        o["bounce_abs_err_model_top"]
    # uniform cells (the model cannot hide errors from these)
    assert o["bounce_abs_err_uniform"]["mean"] < 0.0005, \
        o["bounce_abs_err_uniform"]


def test_display_quanta_bound(gi):
    o = gi["overall"]
    assert o["display_quanta"]["mean"] < 0.6, o["display_quanta"]
    # shadowed floors — the visually critical case (crater floor lit
    # only by its walls). Sub-quantum at p95 AT THIS SAMPLING only: the
    # committed full-config artifact (docs/gi_bound.json) measures p95
    # ~4.7 for the same metric — the full config's denser cells reach
    # deeper into the dark-floor gamma tail, where a fixed bounce error
    # spans more display quanta. The product guarantee is GI.md's table.
    assert o["display_quanta_shadowed"]["p95"] < 1.0, \
        o["display_quanta_shadowed"]


def test_model_tracks_ground_truth(gi):
    o = gi["overall"]
    # round-5 8-sector + two-tap model measures 0.911 at this config
    assert o["corr"] > 0.85, o["corr"]
    # amplitude sanity: the least-squares fit stays within the held-out
    # wander band (docs/GI.md: +-~25% across seeds; isotropic sat at ~9x)
    assert 0.6 < o["amplitude_fit"] < 1.6, o["amplitude_fit"]
    assert o["mc_mean"] > 0.003, "ground truth degenerate (no hits?)"
