"""Synthetic-generalization regression pin (VERDICT r1 item 7).

scripts/syngen.py trains PoP-Net on a fixed procedural mp-aug set (seed 0)
and scores a FROZEN val benchmark built from a disjoint seed (777) — a
repeatable number that detects accuracy regressions, which overfit-to-1.0
cannot. The chip run commits its summary to examples/results/syngen_r2.json;
this test pins the committed metrics (re-run the script to refresh).
"""

import json
import os

import pytest

SUMMARY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "results", "syngen_r2.json",
)

# Floors with regression margin below the recorded bounded-budget run
# (1280 steps, constant lr 0.05 — train loss 0.059 and still descending;
# the committed JSON has the exact values). PopNet-from-scratch needs far
# more steps than one round affords (the reference trains ~1M steps), so
# the detector has not crossed the PCK matcher's IoU>=0.5 gate yet: PCK is
# ~0 and is NOT pinned. mAP2D ~0.46 IS pinned — a broken encoder, decoder,
# or training step drops it to ~0, so the pin still catches catastrophic
# regressions while remaining achievable in-budget.
FLOORS = {"map2d": 0.35}


def test_syngen_summary_pinned():
    if not os.path.exists(SUMMARY):
        pytest.skip("syngen summary not generated yet (run scripts/syngen.py)")
    s = json.load(open(SUMMARY))
    assert s["train_seed"] != s["val_seed"], "val must be disjoint from train"
    assert s["val_images"] >= 32
    for readout in ("gated", "universe"):
        m = s[readout]
        for k, floor in FLOORS.items():
            assert m[k] >= floor, (readout, k, m[k], floor)
