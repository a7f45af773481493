"""Rehearse docs/RUNBOOK.md §1-§4 end-to-end (VERDICT r2 item 10).

Executes the runbook's exact CLI command chain — freeze eval set -> train
-> evaluate-with-checkpoint -> offline benchmark — on the synthetic set,
so the documented real-data procedure cannot rot. Accuracy is NOT asserted
here (2 epochs of training predicts nothing); the assertions are that every
command succeeds, the artifacts land where the runbook says, and the
benchmark scorer consumes the prediction JSON the evaluator wrote.
"""

import json
import os

import pytest

from popnet_tpu.cli.main import main as cli

from tests import synthetic_data

pytestmark = pytest.mark.slow


def test_runbook_command_chain(tmp_path):
    data = str(tmp_path / "data")
    synthetic_data.build(data, n_images=8, n_locations=2, seed=0)

    # §1 freeze the mp-aug evaluation set
    frozen = str(tmp_path / "test_mpaug")
    cli(["generate-augset", "--kind", "mpaug", "--data-root", data,
         "--out-dir", frozen, "--seed", "42"])
    assert os.path.exists(os.path.join(frozen, "labels_test.json"))

    # §2 train PoP-Net (bounded-budget variant, tiny)
    run = str(tmp_path / "runs" / "popnet")
    cli(["train", "--model", "popnet", "--data-root", data, "--mp-aug",
         "--transfer", "u16mm", "--epochs", "2", "--batch-size", "8",
         "--optimizer", "adam", "--schedule", "cosine", "--lr", "1e-3",
         "--warmup-epochs", "1", "--val-labels", "labels.json",
         "--cache-images", "--out-dir", run])
    assert os.path.exists(os.path.join(run, "ckpt_best"))
    assert os.path.exists(os.path.join(run, "history.jsonl"))

    # §3 evaluate with the trained checkpoint on the frozen set
    preds = str(tmp_path / "preds")
    cli(["evaluate", "--model", "popnet", "--data-root", frozen,
         "--labels", "labels_test.json", "--ckpt", os.path.join(run, "ckpt_best"),
         "--batch-size", "8", "--out-dir", preds])
    pred_json = os.path.join(preds, "popnet_results.json")
    assert os.path.exists(pred_json)
    contract = json.load(open(pred_json))
    for key in ("human_pred_set_2d", "human_pred_set_2d_aligned",
                "human_pred_set_3d", "human_pred_set_3d_aligned",
                "human_pred_set_part_conf", "human_gt_set_2d",
                "human_gt_set_3d"):
        assert key in contract, key

    # §4 offline scoring of the written prediction JSON
    cli(["benchmark", "--gt", os.path.join(frozen, "labels_test.json"),
         "--pred", pred_json, "--aligned"])
