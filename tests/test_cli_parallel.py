"""TP / PP / SP as PRODUCT features: the CLI train/evaluate entry points
drive every parallel layout on the virtual CPU mesh (VERDICT r3 weak #7 /
item 6). Library-level numeric parity lives in test_tensor_parallel.py,
test_pipeline.py, test_spatial_parallel.py; these tests pin the wiring:
each layout trains/evaluates end-to-end from the command line.
"""

import json
import os

import numpy as np
import pytest

import jax

from popnet_tpu.cli.main import main

from tests import synthetic_data

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("clip_ds"))
    synthetic_data.build(root, n_images=8, n_locations=2, seed=7)
    return root


def _history(out):
    with open(os.path.join(out, "history.jsonl")) as f:
        return [json.loads(l) for l in f]


def test_cli_train_tensor_parallel(data, tmp_path):
    """train --mesh data=2,model=4: channel-sharded params + moments."""
    out = str(tmp_path / "tp")
    main([
        "train", "--model", "yolo", "--data-root", data,
        "--out-dir", out, "--epochs", "1", "--batch-size", "4",
        "--input-size", "64", "--mesh", "data=2,model=4",
    ])
    h = _history(out)
    assert len(h) == 1 and np.isfinite(h[0]["train_loss"])
    assert os.path.isdir(os.path.join(out, "ckpt"))


def test_cli_train_spatial(data, tmp_path):
    """train --mesh data=2,spatial=4: NHWC heights sharded in the step."""
    out = str(tmp_path / "sp")
    main([
        "train", "--model", "yolo", "--data-root", data,
        "--out-dir", out, "--epochs", "1", "--batch-size", "4",
        "--input-size", "64", "--mesh", "data=2,spatial=4",
    ])
    h = _history(out)
    assert len(h) == 1 and np.isfinite(h[0]["train_loss"])


def test_cli_train_pipelined_then_evaluate(data, tmp_path):
    """train --model openpose --mesh data=1,pipe=2 saves a SEQUENTIAL-layout
    checkpoint that the standard evaluate path restores and scores."""
    out = str(tmp_path / "pp")
    main([
        "train", "--model", "openpose", "--data-root", data,
        "--out-dir", out, "--epochs", "1", "--batch-size", "4",
        "--input-size", "64", "--mesh", "data=1,pipe=2", "--n-micro", "2",
        "--lr", "0.05",
    ])
    h = _history(out)
    assert len(h) == 1 and np.isfinite(h[0]["train_loss"])

    pred = str(tmp_path / "pp_preds")
    main([
        "evaluate", "--model", "openpose", "--data-root", data,
        "--ckpt", os.path.join(out, "ckpt"), "--input-size", "64",
        "--batch-size", "4", "--out-dir", pred,
    ])
    res = json.load(open(os.path.join(pred, "openpose_results.json")))
    assert "human_pred_set_2d" in res


def test_cli_evaluate_spatial_matches_plain(data, tmp_path):
    """evaluate --spatial 2 produces the SAME predictions as the plain
    path — sharding is layout, not semantics."""
    out_a = str(tmp_path / "plain")
    out_b = str(tmp_path / "spatial")
    for out, extra in ((out_a, []), (out_b, ["--spatial", "2"])):
        main([
            "evaluate", "--model", "yolo", "--data-root", data,
            "--input-size", "64", "--batch-size", "4", "--out-dir", out,
        ] + extra)
    a = json.load(open(os.path.join(out_a, "yolo_results.json")))
    b = json.load(open(os.path.join(out_b, "yolo_results.json")))
    for ia, ib in zip(a["human_pred_set_2d"], b["human_pred_set_2d"]):
        np.testing.assert_allclose(
            np.asarray(ia, np.float64), np.asarray(ib, np.float64), atol=1e-4
        )


def test_cli_train_stream_bank(data, tmp_path):
    """train --mp-aug --stream-bank N streams the scene bank in shards."""
    out = str(tmp_path / "stream")
    main([
        "train", "--model", "yolo", "--data-root", data, "--mp-aug",
        "--stream-bank", "4", "--out-dir", out, "--epochs", "1",
        "--batch-size", "4", "--input-size", "64",
    ])
    h = _history(out)
    assert len(h) == 1 and np.isfinite(h[0]["train_loss"])
