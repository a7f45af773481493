"""CLI smoke tests on synthetic data."""

import json
import os

import numpy as np
import pytest

from popnet_tpu.cli.main import main

from tests import synthetic_data


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    return str(root), synthetic_data.build(str(root), n_images=4)


def test_cli_train_yolo_one_epoch(data, tmp_path):
    root, _ = data
    out = str(tmp_path / "run")
    main([
        "train", "--data-root", root, "--model", "yolo", "--epochs", "1",
        "--batch-size", "4", "--lr", "0.01", "--out-dir", out,
    ])
    assert os.path.exists(os.path.join(out, "history.jsonl"))


def test_cli_benchmark(data, tmp_path):
    root, paths = data
    # predictions = GT (perfect score)
    labels = json.load(open(paths["labels"]))
    gt2d = [[a["2d_joints"] for a in anns] for k, anns in labels.items() if k != "intrinsics"]
    gt3d = [[a["3d_joints"] for a in anns] for k, anns in labels.items() if k != "intrinsics"]
    pred = {
        "human_pred_set_2d": gt2d,
        "human_pred_set_3d": gt3d,
        "human_pred_set_part_conf": [[[1.0] * 15 for _ in img] for img in gt2d],
    }
    pred_path = str(tmp_path / "perfect_results.json")
    json.dump(pred, open(pred_path, "w"))
    main(["benchmark", "--gt", paths["labels"], "--pred", pred_path])


def test_cli_visualize_gt(data, tmp_path):
    root, _ = data
    out = str(tmp_path / "vis")
    main([
        "visualize-gt", "--data-root", root, "--out-dir", out, "--limit", "2",
    ])
    assert len(os.listdir(out)) == 2


def test_cli_generate_augset(data, tmp_path):
    root, _ = data
    out = str(tmp_path / "frozen")
    main([
        "generate-augset", "--data-root", root, "--kind", "bgaug",
        "--out-dir", out, "--n-images", "3",
    ])
    assert len(os.listdir(os.path.join(out, "depth_maps"))) == 3


def test_cli_evaluate_untrained_yolo(data, tmp_path):
    """The evaluate command runs end to end (random weights -> valid JSON +
    metrics, however poor)."""
    root, _ = data
    out = str(tmp_path / "preds")
    main([
        "evaluate", "--data-root", root, "--model", "yolo",
        "--input-size", "64", "--batch-size", "4", "--out-dir", out,
    ])
    res = json.load(open(os.path.join(out, "yolo_results.json")))
    assert "human_pred_set_2d" in res and "human_gt_set_2d" in res
    assert len(res["human_pred_set_2d"]) == len(res["human_gt_set_2d"])


def test_cli_evaluate_a2j_fold_bn(data, tmp_path):
    """evaluate --model a2j honors --fold-bn (ADVICE r3: the flag used to be
    silently dropped on the two-stage path); gt-boxes ablation mode, random
    weights — the run must complete and emit the contract JSON."""
    root, _ = data
    out = str(tmp_path / "preds_a2j")
    main([
        "evaluate", "--data-root", root, "--model", "a2j", "--gt-boxes",
        "--fold-bn", "--input-size", "64", "--batch-size", "4",
        "--out-dir", out,
    ])
    res = json.load(open(os.path.join(out, "a2j_results.json")))
    assert "human_pred_set_2d" in res and "human_gt_set_2d" in res
