"""A2J training recipe: crop dataset -> Adam/StepLR trainer -> decode.

Mirror of test_learnability for the Yolo-A2J benchmark row (VERDICT r1
item 5): GT-box crops from the synthetic set, the reference recipe's
optimizer (Adam 3.5e-4 + L2, StepLR(10, 0.2), reference:
train_a2j_mpaug_new.py:443-444), overfit, then a2j_post_process must
put joints within a few pixels. A small crop size keeps the ResNet-50
affordable on the CPU mesh; the recipe code path is size-agnostic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from popnet_tpu.core.config import EncoderConfig
from popnet_tpu.data.a2j_crops import A2JCropDataset
from popnet_tpu.data.datasets import KDH3DDataset
from popnet_tpu.decode.a2j import a2j_post_process
from popnet_tpu.models import A2J
from popnet_tpu.models.a2j import generate_anchors, shift_anchors
from popnet_tpu.train.schedule import StepLR
from popnet_tpu.train.steps import make_a2j_train_step
from popnet_tpu.train.state import create_train_state, get_learning_rate, set_learning_rate

from tests import synthetic_data

ECFG = EncoderConfig(max_people=6)
SIZE = 96  # small crop: same recipe, affordable ResNet-50 on CPU


@pytest.fixture(scope="module")
def crop_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("kdh3d_a2j_train")
    paths = synthetic_data.build(str(root), n_images=4)
    inner = KDH3DDataset(
        paths["img_dir"], paths["labels"], ecfg=ECFG, is_train=True,
    )
    inner.augment = False  # deterministic crops for the overfit
    return A2JCropDataset(inner, augment=False, erase=False, out_size=SIZE)


def test_steplr_matches_torch_semantics():
    """lr = lr0 * gamma^(epoch // step_size), counting epochs."""
    s = StepLR(3.5e-4, step_size=10, gamma=0.2)
    lrs = [s.step(1.0) for _ in range(25)]
    assert lrs[8] == pytest.approx(3.5e-4)
    assert lrs[9] == pytest.approx(3.5e-4 * 0.2)       # after epoch 10
    assert lrs[18] == pytest.approx(3.5e-4 * 0.2)
    assert lrs[19] == pytest.approx(3.5e-4 * 0.2**2)   # after epoch 20
    assert s.best == 1.0


def test_a2j_recipe_overfits_to_gt(crop_dataset):
    anchors = jnp.asarray(
        shift_anchors((SIZE // 16, SIZE // 16), 16, generate_anchors()),
        jnp.float32,
    )
    model = A2J()
    batch = crop_dataset.get_batch([0, 1])
    # the recipe optimizer (Adam + L2) at an overfit-friendly lr; StepLR's
    # epoch-scale decay is asserted separately above
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 1)),
        learning_rate=2e-3, weight_decay=1e-4, optimizer="adam",
    )
    step = jax.jit(make_a2j_train_step(anchors))

    losses = []
    for _ in range(300):
        state, logs = step(state, batch)
        losses.append(float(logs["loss"]))
    assert losses[-1] < losses[0] * 0.1, (losses[0], losses[-1])

    heads = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["crops"], train=False,
    )
    pred = np.asarray(a2j_post_process(heads, anchors))  # (N, K, 3) (y, x, z)
    lbl = np.asarray(batch["labels"])
    err2d = np.sqrt(
        (pred[..., 0] - lbl[..., 0]) ** 2 + (pred[..., 1] - lbl[..., 1]) ** 2
    )
    assert np.median(err2d) < 5.0, np.median(err2d)
    assert np.abs(pred[..., 2] - lbl[..., 2]).mean() < 0.2


def test_a2j_cli_train_smoke(tmp_path):
    """The full CLI recipe end-to-end for one epoch: mp-aug composite ->
    crops -> Adam/StepLR -> per-epoch checkpoint on disk."""
    from popnet_tpu.cli.main import main

    paths = synthetic_data.build(str(tmp_path / "ds"), n_images=2)
    out = str(tmp_path / "run")
    main([
        "train", "--model", "a2j", "--data-root", str(tmp_path / "ds"),
        "--labels", "labels.json", "--out-dir", out,
        "--epochs", "1", "--batch-size", "2",
        "--val-labels", "labels.json",
    ])
    import os

    assert os.path.isdir(os.path.join(out, "ckpt"))
    hist = open(os.path.join(out, "history.jsonl")).read().strip().splitlines()
    assert len(hist) == 1
