"""Pins the committed four-method benchmark table (scripts/method_table.py).

The table is the framework twin of the reference's headline instrument
(README.md:118-122 / figs/evaluation_results.png): four method families
scored with the four best-match metrics on a shared frozen mp-aug val set.
The committed artifact (examples/results/method_table.json) is produced on
TPU at a bounded, recorded budget; this test pins its integrity — budget
provenance, metric sanity, curve monotonicity, and the popnet row's
citation of the syngen run — so a regenerated table can't silently change
meaning. Floors are pinned only for rows trained to completion ("done"),
and scale with the recorded budget.
"""

import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(ROOT, "examples", "results", "method_table.json")

METRICS = ("pck2d", "pck3d", "map2d", "map3d")


@pytest.fixture(scope="module")
def table():
    if not os.path.exists(PATH):
        pytest.skip("method_table.json not generated in this checkout")
    with open(PATH) as f:
        return json.load(f)


def test_budget_provenance(table):
    b = table["budget"]
    assert b["train_seed"] != b["val_seed"], "val must be disjoint from train"
    assert b["train_images"] >= 256
    assert b["epochs"] * b["steps_per_epoch"] >= 2000


def test_metric_sanity_and_curves(table):
    assert table["methods"], "empty table"
    for name, rec in table["methods"].items():
        # in-progress rows carry "latest"; only completed rows carry "final"
        # (a consumer reading "final" must never see a half-trained score)
        is_citation = name == "popnet" and not rec.get("trained_here")
        assert ("final" in rec) == bool(rec.get("done", is_citation)), name
        final = rec.get("final") or rec["latest"]
        for k in METRICS:
            assert 0.0 <= final[k] <= 1.0, (name, k, final[k])
        steps = [p["step"] for p in rec.get("curve", [])]
        assert steps == sorted(steps), (name, "curve steps must be monotone")


def test_popnet_row_cites_syngen(table):
    if "popnet" not in table["methods"]:
        pytest.skip("popnet row not present at this budget")
    rec = table["methods"]["popnet"]
    if rec.get("trained_here"):
        # trained under the table harness itself (TABLE_METHODS=...,popnet):
        # provenance is the curve + done flag, not a syngen citation
        assert rec.get("done"), "trained popnet row must run to completion"
        assert rec["curve"], "trained popnet row must carry its curve"
        assert rec.get("readout") == "universe"
        return
    assert "syngen" in rec["source"]
    syn = json.load(open(os.path.join(ROOT, "examples", "results",
                                      "syngen_r3.json")))
    points = {p["step"]: p["universe"] for p in syn["curve"]}
    assert rec["final"] == points[rec["steps"]]
    assert rec["steps"] <= table["budget"]["epochs"] * \
        table["budget"]["steps_per_epoch"]


def test_completed_rows_learned(table):
    """Any method trained to completion at >= 4992 steps must clearly beat
    chance on the held-out set (the syngen curve reads PCK2D ~0.99 at this
    budget for popnet; detector-based rows are given generous floors)."""
    for name, rec in table["methods"].items():
        if not rec.get("done") or rec.get("steps", 0) < 4992:
            continue
        assert rec["final"]["pck2d"] >= 0.5, (name, rec["final"])
        assert rec["final"]["map2d"] >= 0.3, (name, rec["final"])
