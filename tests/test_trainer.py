"""Trainer smoke test: fit on synthetic data, checkpoint, resume."""

import numpy as np

from popnet_tpu.core.config import EncoderConfig
from popnet_tpu.data.datasets import KDH3DDataset
from popnet_tpu.losses import yolo_loss
from popnet_tpu.models import YoloPoseNet
from popnet_tpu.train.loop import Trainer
from popnet_tpu.train.steps import make_yolo_train_step

from tests import synthetic_data

ECFG = EncoderConfig(max_people=4)


def make_eval_loss(state, batch):
    pred = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["image"], train=False,
    )
    loss, _ = yolo_loss(
        pred, batch["prior_map"], batch["prior_mask_conf"],
        batch["prior_mask_coord"], 15, weight_map=batch["prior_weight_map"],
    )
    return loss


def test_trainer_fit_checkpoint_resume(tmp_path):
    paths = synthetic_data.build(str(tmp_path / "data"), n_images=8)
    ds = KDH3DDataset(
        paths["img_dir"], paths["labels"], bg_aug=False, ecfg=ECFG,
        pose_align=False, seed=0,
    )
    val = KDH3DDataset(
        paths["img_dir"], paths["labels"], bg_aug=False, ecfg=ECFG,
        pose_align=False, augment=False, seed=1,
    )
    out = str(tmp_path / "run")
    trainer = Trainer(
        YoloPoseNet(), make_yolo_train_step(),
        make_eval_loss, learning_rate=0.02, out_dir=out, print_freq=100,
    )
    hist = trainer.fit(ds, val, epochs=2, batch_size=8)
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["val_loss"])

    # resume restores full state
    t2 = Trainer(
        YoloPoseNet(), make_yolo_train_step(),
        make_eval_loss, learning_rate=0.02, out_dir=out, print_freq=100,
    ).resume()
    assert t2.epoch >= 1
    assert np.isfinite(t2.best_val)
    # params actually restored (differ from fresh init)
    import jax

    fresh = Trainer(
        YoloPoseNet(), make_yolo_train_step(),
        make_eval_loss, learning_rate=0.02, out_dir=str(tmp_path / "run2"),
    )
    diff = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        t2.state.params, fresh.state.params,
    )
    assert max(jax.tree.leaves(diff)) > 0
