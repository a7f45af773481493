"""Full-system proof: train PoP-Net on synthetic depth scenes, then run the
complete evaluation pipeline (decode -> prediction JSON -> benchmark metrics).

No real MP-3DHP data is available in this environment, so this trains on
procedurally generated blob-people (tests/synthetic_data.py) — enough to
exercise every stage end to end on real TPU hardware and verify that
training moves the benchmark metrics far above chance.

Run:  python examples/synthetic_e2e.py [--epochs 60] [--out runs/synth_e2e]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from popnet_tpu.core.config import DecodeConfig, EncoderConfig
from popnet_tpu.cli import evaluate as ev
from popnet_tpu.data.datasets import KDH3DDataset, MPRealDataset
from popnet_tpu.losses import popnet_loss
from popnet_tpu.models import PopNet
from popnet_tpu.train.loop import Trainer
from popnet_tpu.train.steps import make_popnet_train_step

from tests import synthetic_data


def make_eval_loss(state, batch):
    (_, saved) = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["image"], train=False,
    )
    loss, _ = popnet_loss(
        saved, batch["heatmaps"], batch["zmaps"], batch["fg_masks_z"],
        batch["align_maps"], batch["fg_masks_align"], batch["prior_map"],
        batch["prior_mask_conf"], batch["prior_mask_coord"], 15,
        prior_weight_map=batch["prior_weight_map"],
    )
    return loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--n-train", type=int, default=96)
    ap.add_argument("--out", default="runs/synth_e2e")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    data_root = os.path.join(args.out, "data")
    paths = synthetic_data.build(data_root, n_images=args.n_train, seed=0)

    ecfg = EncoderConfig(max_people=4)
    train_ds = KDH3DDataset(
        paths["img_dir"], paths["labels"], bg_aug=True,
        bg_file=paths["labels_bg"], bg_dir=paths["bg_dir"],
        seg_dir=paths["seg_dir"], ecfg=ecfg, render_max=1.1, seed=0,
    )
    eval_ds = MPRealDataset(paths["img_dir"], paths["labels"], ecfg=ecfg)

    trainer = Trainer(
        PopNet(), make_popnet_train_step(), make_eval_loss,
        learning_rate=args.lr, out_dir=args.out, print_freq=5,
    )
    # train loss is noisy on tiny synthetic sets; don't let the plateau
    # controller starve the lr (it reacts to val loss in real runs)
    trainer.scheduler.patience = 10**9
    t0 = time.time()
    trainer.fit(train_ds, None, epochs=args.epochs, batch_size=args.batch_size)
    train_time = time.time() - t0
    print(f"trained {args.epochs} epochs in {train_time:.0f}s")

    model = trainer.model
    variables = {"params": trainer.state.params, "batch_stats": trainer.state.batch_stats}

    def infer(images):
        (heat, z, align, prior), _ = model.apply(variables, images, train=False)
        return heat, z, align, prior

    data = ev.run_popnet_eval(infer, eval_ds, batch_size=16, ecfg=ecfg, dcfg=DecodeConfig())
    res = ev.evaluate_eval_data(data, verbose=False)
    summary = {
        "epochs": args.epochs,
        "train_seconds": round(train_time, 1),
        "final_train_loss": trainer.history[-1]["train_loss"] if trainer.history else None,
        **{k: round(v, 4) for k, v in res.items() if not k.startswith("per_")},
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
