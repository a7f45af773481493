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

# floors with regression margin below the recorded run (see the JSON for
# the exact values achieved)
FLOORS = {"pck2d": 0.80, "pck3d": 0.70, "map2d": 0.70, "map3d": 0.55}


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
