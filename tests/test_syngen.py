"""Synthetic-generalization regression pin (VERDICT r2 items 1 + 2).

scripts/syngen.py trains PoP-Net from scratch on a procedural mp-aug set
(seed 0, kinematic-template people) and scores a FROZEN val benchmark built
from a disjoint seed (777) — a repeatable number that detects accuracy
regressions, which overfit-to-1.0 cannot. The chip run commits its summary
(with the full metric-vs-step curve) to examples/results/syngen_r3.json;
this test pins the committed metrics (re-run the script to refresh).

History: the round-2 pin could floor mAP2D only — the old generator
scattered joints i.i.d., so joint identity was unlearnable and held-out
PCK plateaued ~0.085 regardless of steps (curve preserved in
examples/results/syngen_r3_scatter.json). With kinematic people the same
recipe clears PCK2D 0.98 by 5k steps, so all four metrics are pinned, per
readout. The universe readout dominates gated on the 3D metrics — the
measured delta that settled the flagship decode's default.
"""

import json
import os

import pytest

SUMMARY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "results", "syngen_r3.json",
)

# Floors with regression margin below the recorded 50k-step run
# (universe final: 0.996 / 0.966 / 0.994 / 0.944 — the committed JSON has
# the exact values and the full metric-vs-step curve).
FLOORS = {
    "universe": {"pck2d": 0.95, "pck3d": 0.88, "map2d": 0.95, "map3d": 0.85},
    "gated": {"pck2d": 0.95, "pck3d": 0.65, "map2d": 0.95, "map3d": 0.55},
}


def test_syngen_summary_pinned():
    if not os.path.exists(SUMMARY):
        pytest.skip("syngen summary not generated yet (run scripts/syngen.py)")
    s = json.load(open(SUMMARY))
    assert s["train_seed"] != s["val_seed"], "val must be disjoint from train"
    assert s["val_images"] >= 32
    for readout, floors in FLOORS.items():
        m = s[readout]
        for k, floor in floors.items():
            assert m[k] >= floor, (readout, k, m[k], floor)
    # the default-readout decision is evidence-based: universe must keep
    # beating gated on the 3D metrics by a real margin
    assert s["universe"]["map3d"] >= s["gated"]["map3d"]
